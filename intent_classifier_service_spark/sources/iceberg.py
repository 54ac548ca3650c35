"""Iceberg integration (north rule: Iceberg tables, snapshot pinning,
checkpoint lineage).

The sandbox has no network and no iceberg-spark runtime jar, so this
module degrades gracefully: `iceberg_available()` probes for the
catalog class; `configure_catalog` returns the builder configs a real
deployment passes to spark-submit; readers fall back to parquet with
identical call shapes. The checkpoint store (streaming/checkpoint.py)
and sinks (sources/tables.py) are written against these same seams, so
swapping in a real catalog touches no operator code.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import json
import os
import warnings

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_CATALOG_CLASS)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def catalog_conf(warehouse: str, catalog: str = "lake") -> dict[str, str]:
    """spark-submit --conf set for a Hadoop-warehouse Iceberg catalog."""
    return {
        f"spark.sql.catalog.{catalog}": ICEBERG_CATALOG_CLASS,
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    }


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_snapshots")


def _data_files(path: str) -> list[str]:
    """All parquet data files under a table dir (recursive — covers
    hive-partitioned layouts), excluding the manifest dir itself."""
    files = _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    return sorted(f for f in files if "_snapshots" not in f)


def _file_digest(path: str, size: int, chunk: int = 65536) -> str:
    """Cheap content digest: sha256 over (size, first 64 KiB, last
    64 KiB). Reads ≤128 KiB per file regardless of file size — parquet
    footers (schema, row-group offsets, column stats) live in the tail
    and the header magic + first row group in the head, so any
    realistic rewrite perturbs one of them. A middle-only same-size
    splice slips through; the full-content hash that would catch it
    costs a full read per file per verify, the wrong trade at 100 TB."""
    h = hashlib.sha256(str(size).encode())
    with open(path, "rb") as f:
        h.update(f.read(chunk))
        if size > chunk:
            f.seek(max(size - chunk, chunk))
            h.update(f.read(chunk))
    return h.hexdigest()[:32]


def write_snapshot_manifest(path: str) -> str:
    """Freeze the CURRENT file set of a parquet table dir as a snapshot
    — the fallback's analog of an Iceberg snapshot commit. The manifest
    (JSON list of data files + (size, mtime_ns, content digest)) lives
    under ``<path>/_snapshots/<id>.json`` with a CONTENT-derived id
    (path|size|digest — deliberately NOT mtime, so a byte-identical
    restore/rsync re-manifests under the SAME snapshot id), so a
    pinned read is immutable: files appended later are simply not in
    the manifest, and an in-place rewrite of a data file (same name,
    different bytes) changes its digest — the id differs AND
    manifest_files detects the drift at read time instead of silently
    serving changed content under a 'pinned' snapshot. This is exactly
    the mechanism Iceberg uses (manifests of data files with
    file-level metadata), minus the catalog."""
    files = _data_files(path)
    stats = []
    for f in files:
        size = os.path.getsize(f)
        stats.append({"path": f, "size": size,
                      "mtime_ns": os.stat(f).st_mtime_ns,
                      "digest": _file_digest(f, size)})
    key = "\n".join(f"{s['path']}|{s['size']}|{s['digest']}" for s in stats)
    sid = hashlib.sha256(key.encode()).hexdigest()[:16]
    os.makedirs(_manifest_dir(path), exist_ok=True)
    mf = os.path.join(_manifest_dir(path), f"{sid}.json")
    if not os.path.exists(mf):
        with open(mf, "w") as f:
            json.dump({"snapshot_id": sid, "files": files, "stats": stats}, f)
    return sid


def manifest_files(path: str, snapshot_id: str,
                   verify: bool = True) -> list[str] | None:
    """Data files pinned by a manifest snapshot, or None if no such
    manifest exists (callers decide whether to fall back or fail).

    With ``verify`` (default), every pinned file is checked against the
    manifest: a missing file or a CONTENT change (size or head/tail
    digest drift) raises instead of letting a 'pinned' read serve
    different data than the checkpoint lineage records. mtime drift
    with matching content only warns — backup restores, cp/rsync
    without preserved timestamps, and touch all change mtime on
    byte-identical files, and hard-failing those made every pinned
    read a false positive. Manifests written before digests were
    recorded fall back to the (size, mtime_ns) hard check; pre-stats
    manifests verify existence only."""
    mf = os.path.join(_manifest_dir(path), f"{snapshot_id}.json")
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        m = json.load(f)
    if verify:
        for s in m.get("stats") or [{"path": p} for p in m["files"]]:
            p = s["path"]
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"snapshot {snapshot_id}: pinned data file vanished: {p}"
                )
            if "size" not in s:
                continue
            size_ok = os.path.getsize(p) == s["size"]
            if "digest" in s:
                if not size_ok or _file_digest(p, s["size"]) != s["digest"]:
                    raise ValueError(
                        f"snapshot {snapshot_id}: pinned data file rewritten "
                        f"in place (content drift): {p} — the snapshot no "
                        "longer describes the on-disk data"
                    )
                if os.stat(p).st_mtime_ns != s["mtime_ns"]:
                    warnings.warn(
                        f"snapshot {snapshot_id}: mtime drift on {p} with "
                        "matching content (restore/copy without preserved "
                        "timestamps?) — continuing with the pinned read",
                        stacklevel=2,
                    )
            elif not size_ok or os.stat(p).st_mtime_ns != s["mtime_ns"]:
                raise ValueError(
                    f"snapshot {snapshot_id}: pinned data file rewritten "
                    f"in place (size/mtime drift): {p} — the snapshot no "
                    "longer describes the on-disk data"
                )
    return m["files"]


def read_snapshot(spark: SparkSession, table_or_path: str,
                  snapshot_id: str | None = None) -> DataFrame:
    """Snapshot-pinned read. Iceberg: VERSION AS OF gives immutable
    lineage (the snapshot-id recorded in the checkpoint store). Parquet
    fallback: a manifest written by write_snapshot_manifest pins the
    exact data files — later appends to the directory don't leak into
    the read; without a manifest the path itself is the (mutable)
    snapshot."""
    if iceberg_available(spark) and "/" not in table_or_path:
        if snapshot_id:
            return spark.sql(
                f"SELECT * FROM {table_or_path} VERSION AS OF {snapshot_id}"
            )
        return spark.read.format("iceberg").load(table_or_path)
    if snapshot_id:
        # an EXPLICIT snapshot_id with no matching manifest raises — the
        # Iceberg branch (VERSION AS OF) throws on an unknown snapshot,
        # and silently reading the live mutable directory instead would
        # let a resumed run validate different data than its checkpoint
        # lineage records (round-3 ADVICE)
        files = manifest_files(table_or_path, snapshot_id)
        if files is None:
            raise ValueError(
                f"unknown snapshot {snapshot_id!r} for {table_or_path}: no "
                "manifest under _snapshots/ — refusing to read the live "
                "(mutable) directory in place of a pinned snapshot"
            )
        return spark.read.parquet(*files)
    return spark.read.parquet(table_or_path)


def current_snapshot_id(spark: SparkSession, table: str) -> str:
    """Iceberg: latest snapshot id from the metadata table; parquet
    fallback: the most recent manifest if one exists, else a
    content-independent marker (the path)."""
    if iceberg_available(spark) and "/" not in table:
        row = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return str(row["snapshot_id"]) if row else "none"
    manifests = _glob.glob(os.path.join(_manifest_dir(table), "*.json"))
    if manifests:
        latest = max(manifests, key=os.path.getmtime)
        return os.path.splitext(os.path.basename(latest))[0]
    return f"parquet:{table}"
