"""Schema-contract diff: metadata-only, recursive through nested
types, fail-fast wiring in the validate job."""

import pytest
from pyspark.sql import types as T

from intent_classifier_service_spark.operators import schema_check as SC
from intent_classifier_service_spark.sources.tables import DOCUMENTS_SPANS_SCHEMA


def _ddl(s):
    return T._parse_datatype_string(s)


def test_identical_schema_clean():
    assert SC.schema_violations(DOCUMENTS_SPANS_SCHEMA, DOCUMENTS_SPANS_SCHEMA) == []


def test_missing_and_type_and_unexpected(spark):
    actual = _ddl(
        "doc_id int, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, extra string"
    )
    got = {(v.rule_id, v.field)
           for v in SC.schema_violations(actual, DOCUMENTS_SPANS_SCHEMA)}
    assert ("R-SCHEMA-TYPE", "doc_id") in got          # int vs string
    assert ("R-SCHEMA-MISSING", "part_key") in got
    assert ("R-SCHEMA-UNEXPECTED", "extra") in got
    # allow_extra tolerates evolution-by-addition only
    got2 = {v.rule_id for v in SC.schema_violations(
        actual, DOCUMENTS_SPANS_SCHEMA, allow_extra=True)}
    assert "R-SCHEMA-UNEXPECTED" not in got2
    assert "R-SCHEMA-TYPE" in got2


def test_nested_struct_field_diff(spark):
    actual = _ddl(
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:int,offset:int>>, part_key int"
    )
    got = SC.schema_violations(actual, DOCUMENTS_SPANS_SCHEMA)
    assert [(v.rule_id, v.field) for v in got] == \
        [("R-SCHEMA-TYPE", "spans[].media_ref")]


def test_nested_missing_span_field(spark):
    actual = _ddl(
        "doc_id string, spans array<struct<kind:string,text:string,"
        "offset:int>>, part_key int"
    )
    got = SC.schema_violations(actual, DOCUMENTS_SPANS_SCHEMA)
    assert [(v.rule_id, v.field) for v in got] == \
        [("R-SCHEMA-MISSING", "spans[].media_ref")]


def test_assert_schema_raises_with_listing(spark):
    actual = _ddl("doc_id string, part_key int")
    with pytest.raises(ValueError, match="R-SCHEMA-MISSING spans"):
        SC.assert_schema(actual, DOCUMENTS_SPANS_SCHEMA)


def test_validate_job_gates_on_bad_input_schema(spark, tmp_path):
    """The CLI path fails fast (clear error, no data scanned) on an
    input table missing the spans column."""
    import subprocess
    import sys

    bad = str(tmp_path / "bad")
    spark.createDataFrame(
        [("a", 1)], "doc_id string, part_key int"
    ).write.parquet(bad)
    r = subprocess.run(
        [sys.executable, "jobs/validate.py", "--input", bad,
         "--output", str(tmp_path / "out")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode != 0
    assert "R-SCHEMA-MISSING spans" in (r.stderr + r.stdout)


def test_per_file_gate_catches_heterogeneous_directory(spark, tmp_path):
    """A directory where only SOME files carry a contract column: a
    merged (or lucky single-footer) directory schema contains the
    column, so the directory-level gate passes — while a forced-schema
    read yields all-null part_key for the old files. The per-file gate
    must name exactly the drifting file; a homogeneous directory must
    pass; hive partition columns must not false-positive."""
    from intent_classifier_service_spark import datagen

    p = str(tmp_path / "docs")
    good = datagen.documents_spans(spark, 50)
    good.write.parquet(p)
    assert SC.per_file_schema_violations(p, DOCUMENTS_SPANS_SCHEMA) == {}
    SC.assert_schema_per_file(p, DOCUMENTS_SPANS_SCHEMA)  # no raise

    # append a file MISSING part_key (schema drift by column removal)
    good.limit(10).drop("part_key").coalesce(1) \
        .write.mode("append").parquet(p)
    # the union-of-footers schema still shows part_key → directory-level
    # gate is blind to the drift...
    merged = spark.read.option("mergeSchema", "true").parquet(p).schema
    assert SC.schema_violations(merged, DOCUMENTS_SPANS_SCHEMA,
                                allow_extra=True) == []
    # ...the per-file gate is not
    bad = SC.per_file_schema_violations(p, DOCUMENTS_SPANS_SCHEMA)
    assert len(bad) == 1
    (vs,) = bad.values()
    assert [(v.rule_id, v.field) for v in vs] == [("R-SCHEMA-MISSING", "part_key")]
    with pytest.raises(ValueError, match="R-SCHEMA-MISSING part_key"):
        SC.assert_schema_per_file(p, DOCUMENTS_SPANS_SCHEMA)

    # hive-partitioned layout: part_key lives in the directory name,
    # not the footer — excluded per file, so no false positive
    p2 = str(tmp_path / "docs_hive")
    good.write.partitionBy("part_key").parquet(p2)
    assert SC.per_file_schema_violations(p2, DOCUMENTS_SPANS_SCHEMA) == {}
