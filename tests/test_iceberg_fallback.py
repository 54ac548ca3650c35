from intent_classifier_service_spark.sources import iceberg


def test_fallback_paths(spark, tmp_path):
    from intent_classifier_service_spark import datagen

    assert iceberg.iceberg_available(spark) in (True, False)
    p = str(tmp_path / "docs")
    datagen.documents_spans(spark, 50).write.parquet(p)
    df = iceberg.read_snapshot(spark, p)
    assert df.count() == 50
    assert iceberg.current_snapshot_id(spark, p).startswith("parquet:") or \
        iceberg.current_snapshot_id(spark, p).isdigit()


def test_catalog_conf_shape():
    conf = iceberg.catalog_conf("/warehouse")
    assert conf["spark.sql.catalog.lake"].endswith("SparkCatalog")
    assert conf["spark.sql.catalog.lake.warehouse"] == "/warehouse"


def test_manifest_snapshot_pinning(spark, tmp_path):
    """The parquet fallback's manifest snapshots give REAL pinning:
    files appended after the snapshot never leak into a pinned read,
    and the checkpointable snapshot id is stable and discoverable."""
    from intent_classifier_service_spark import datagen
    from intent_classifier_service_spark.sources import tables

    p = str(tmp_path / "docs")
    datagen.documents_spans(spark, 50).write.parquet(p)
    sid = iceberg.write_snapshot_manifest(p)
    assert iceberg.current_snapshot_id(spark, p) == sid

    # append more data AFTER the snapshot
    datagen.documents_spans(spark, 30).write.mode("append").parquet(p)
    assert iceberg.read_snapshot(spark, p).count() == 80          # live
    assert iceberg.read_snapshot(spark, p, sid).count() == 50     # pinned
    # declared-schema pinned read used by the validate job
    assert tables.read_documents_spans(spark, p, snapshot_id=sid).count() == 50

    # freezing again captures the appended files under a NEW id;
    # re-freezing an unchanged dir is idempotent
    sid2 = iceberg.write_snapshot_manifest(p)
    assert sid2 != sid
    assert iceberg.read_snapshot(spark, p, sid2).count() == 80
    assert iceberg.write_snapshot_manifest(p) == sid2
    # an EXPLICIT unknown snapshot id must RAISE (matching Iceberg's
    # VERSION AS OF), never silently read the live mutable directory
    import pytest
    with pytest.raises(ValueError, match="unknown snapshot"):
        iceberg.read_snapshot(spark, p, "deadbeef")
    with pytest.raises(ValueError, match="unknown snapshot"):
        tables.read_documents_spans(spark, p, snapshot_id="deadbeef")


def test_manifest_detects_inplace_rewrite(spark, tmp_path):
    """A data file rewritten IN PLACE (same name, different bytes) must
    fail a pinned read: the manifest stores per-file (size, mtime_ns)
    and verifies them, so a 'pinned' snapshot can never silently serve
    changed content."""
    import glob
    import os

    import pytest

    from intent_classifier_service_spark import datagen

    p = str(tmp_path / "docs")
    datagen.documents_spans(spark, 20).write.parquet(p)
    sid = iceberg.write_snapshot_manifest(p)
    assert iceberg.read_snapshot(spark, p, sid).count() == 20

    victim = sorted(glob.glob(os.path.join(p, "*.parquet")))[0]
    data = open(victim, "rb").read()
    with open(victim, "wb") as f:          # same name, same bytes + pad
        f.write(data + b"\x00")
    os.utime(victim, ns=(os.stat(victim).st_atime_ns,
                         os.stat(victim).st_mtime_ns + 1))
    with pytest.raises(ValueError, match="rewritten in place"):
        iceberg.manifest_files(p, sid)
    # deleted pinned file → loud failure too
    with open(victim, "wb") as f:
        f.write(data)                       # restore size…
    os.remove(victim)
    with pytest.raises(FileNotFoundError):
        iceberg.manifest_files(p, sid)


def test_mtime_only_drift_warns_not_fails(spark, tmp_path):
    """Byte-identical files whose mtime changed (backup restore,
    cp/rsync without preserved timestamps, touch) must NOT fail a
    pinned read — content digests verify; mtime drift alone warns.
    A same-size content rewrite (the case (size, mtime) verification
    could never catch when timestamps are preserved) must still raise.
    And re-manifesting byte-identical data yields the SAME snapshot id
    (the id derives from content, not mtime)."""
    import glob
    import os
    import warnings as _w

    import pytest

    from intent_classifier_service_spark import datagen

    p = str(tmp_path / "docs")
    datagen.documents_spans(spark, 20).write.parquet(p)
    sid = iceberg.write_snapshot_manifest(p)

    victim = sorted(glob.glob(os.path.join(p, "*.parquet")))[0]
    st = os.stat(victim)
    os.utime(victim, ns=(st.st_atime_ns, st.st_mtime_ns + 10_000_000))
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        files = iceberg.manifest_files(p, sid)      # no raise
    assert files and any("mtime drift" in str(c.message) for c in caught)
    # identical content (mtime differs) → SAME snapshot id
    assert iceberg.write_snapshot_manifest(p) == sid

    # same-size rewrite with preserved mtime → caught by the digest
    data = bytearray(open(victim, "rb").read())
    data[-5] ^= 0xFF                                # flip a footer byte
    with open(victim, "wb") as f:
        f.write(bytes(data))
    os.utime(victim, ns=(st.st_atime_ns, st.st_mtime_ns + 10_000_000))
    with pytest.raises(ValueError, match="rewritten in place"):
        iceberg.manifest_files(p, sid)
