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
