"""Schema-contract validation: the actual on-disk schema diffed
against the declared contract BEFORE any data is read.

The engine declares fixed schemas everywhere (the reference never
infers; SURVEY §1.2) and its readers FORCE the declared schema, which
makes a mismatched input fail late and confusingly — a missing column
reads as all-null (then floods the null-rate rules), a type change
throws mid-scan from some executor. This operator is the fail-fast
front door: a pure METADATA diff (parquet footers / JSON sample — no
data scan) producing violation rows in the engine's (rule_id,
observed, expected) idiom, recursively through nested struct / array /
map types (the spans column is array<struct<...>>).

Rules:
  R-SCHEMA-MISSING     declared field absent from the actual schema
  R-SCHEMA-TYPE        same path, different (non-struct) type
  R-SCHEMA-UNEXPECTED  actual field not in the contract (reported,
                       and optionally tolerated: evolution-by-addition
                       is the one compatible schema change)
  R-SCHEMA-NULLABILITY nullable-where-contract-requires-non-null —
                       opt-in (parquet writers routinely mark
                       everything optional, so this is noise unless
                       the writer is trusted to preserve requiredness)

Reference analog: the positional fixed-name TSV contract
(gpt_intent_classifier.py:368-369) — names and arity are asserted by
construction there; this generalizes it to nested types.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


@dataclass(frozen=True)
class SchemaViolation:
    rule_id: str
    field: str        # dotted path, [] marks array elements
    observed: str
    expected: str


def _walk(expected: T.DataType, actual: T.DataType, path: str,
          out: list[SchemaViolation], check_nullability: bool,
          allow_extra: bool) -> None:
    if isinstance(expected, T.StructType) and isinstance(actual, T.StructType):
        act = {f.name: f for f in actual.fields}
        for f in expected.fields:
            p = f"{path}.{f.name}" if path else f.name
            a = act.get(f.name)
            if a is None:
                out.append(SchemaViolation(
                    "R-SCHEMA-MISSING", p, "<absent>", f.dataType.simpleString()))
                continue
            if check_nullability and a.nullable and not f.nullable:
                out.append(SchemaViolation(
                    "R-SCHEMA-NULLABILITY", p, "nullable", "not null"))
            _walk(f.dataType, a.dataType, p, out, check_nullability, allow_extra)
        for name in act:
            if name not in {f.name for f in expected.fields}:
                p = f"{path}.{name}" if path else name
                out.append(SchemaViolation(
                    "R-SCHEMA-UNEXPECTED", p,
                    act[name].dataType.simpleString(), "<not in contract>"))
        return
    if isinstance(expected, T.ArrayType) and isinstance(actual, T.ArrayType):
        _walk(expected.elementType, actual.elementType, path + "[]",
              out, check_nullability, allow_extra)
        return
    if isinstance(expected, T.MapType) and isinstance(actual, T.MapType):
        _walk(expected.keyType, actual.keyType, path + "{key}",
              out, check_nullability, allow_extra)
        _walk(expected.valueType, actual.valueType, path + "{value}",
              out, check_nullability, allow_extra)
        return
    if expected.simpleString() != actual.simpleString():
        out.append(SchemaViolation(
            "R-SCHEMA-TYPE", path or "<root>",
            actual.simpleString(), expected.simpleString()))


def schema_violations(actual: T.StructType, expected: T.StructType,
                      check_nullability: bool = False,
                      allow_extra: bool = False) -> list[SchemaViolation]:
    """Diff ``actual`` against the ``expected`` contract. With
    ``allow_extra``, R-SCHEMA-UNEXPECTED rows are suppressed
    (evolution-by-addition tolerated)."""
    out: list[SchemaViolation] = []
    _walk(expected, actual, "", out, check_nullability, allow_extra)
    if allow_extra:
        out = [v for v in out if v.rule_id != "R-SCHEMA-UNEXPECTED"]
    return out


def assert_schema(actual: T.StructType, expected: T.StructType,
                  allow_extra: bool = True) -> None:
    """Fail-fast gate: raise with every violation listed. Used by the
    validate job before forcing the declared schema onto the input —
    a missing column would otherwise read as all-null and fail LATE as
    a mysterious flood of null-rate violations."""
    v = schema_violations(actual, expected, allow_extra=allow_extra)
    if v:
        lines = "\n".join(
            f"  {x.rule_id} {x.field}: got {x.observed}, want {x.expected}"
            for x in v
        )
        raise ValueError(
            f"input schema violates the declared contract "
            f"({len(v)} issue(s)):\n{lines}"
        )


def per_file_schema_violations(path: str, expected: T.StructType,
                               allow_extra: bool = True,
                               ) -> dict[str, list[SchemaViolation]]:
    """Diff EVERY data file's footer against the contract — the check a
    directory-level schema cannot do. A single-footer read consults one
    arbitrary file; a mergeSchema read unions all footers — either way
    a column present in only SOME files looks present for the whole
    directory, and a forced-schema read then silently yields all-null
    values for the files that lack it. One pyarrow footer read per file
    (pure metadata, no Spark job, no data scan); hive partition columns
    (key=value path segments) are excluded from the contract per file —
    they are directory-encoded, not footer-encoded. At very large file
    counts this driver loop is the same per-file metadata pass an
    Iceberg manifest would amortize; distribute it with
    sc.parallelize(files) if it ever dominates."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    files = sorted(
        f for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                             recursive=True)
        if "_snapshots" not in f
    )
    bad: dict[str, list[SchemaViolation]] = {}
    for f in files:
        part_cols = {
            seg.split("=", 1)[0]
            for seg in os.path.relpath(f, path).split(os.sep)[:-1]
            if "=" in seg
        }
        exp = T.StructType(
            [fld for fld in expected.fields if fld.name not in part_cols]
        )
        actual = from_arrow_schema(pq.read_schema(f))
        v = schema_violations(actual, exp, allow_extra=allow_extra)
        if v:
            bad[f] = v
    return bad


def assert_schema_per_file(path: str, expected: T.StructType,
                           allow_extra: bool = True) -> None:
    """Fail-fast per-file gate (see per_file_schema_violations): raises
    naming each drifting file and its violations."""
    bad = per_file_schema_violations(path, expected, allow_extra)
    if bad:
        lines = "\n".join(
            f"  {f}:\n" + "\n".join(
                f"    {x.rule_id} {x.field}: got {x.observed}, want {x.expected}"
                for x in vs
            )
            for f, vs in bad.items()
        )
        raise ValueError(
            f"{len(bad)} input file(s) violate the declared contract "
            f"(per-file footer diff):\n{lines}"
        )
