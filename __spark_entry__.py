"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full span-rule verdicts over spans derived
                from sf0.001 documents (the engine's single-scan fused
                rule pass).
queries()     — one entry per implemented operator family
                (SURVEY.md §2); see intent_classifier_service_spark/
                driver_queries.py for the implementations.
oracle_sql()  — DuckDB-equivalent SQL per query. Every registered
                query carries an oracle (seeded-ANN queries via the
                exact planted-duplicate top-1 invariant).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from intent_classifier_service_spark import driver_queries as DQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return DQ.q_span_rule_verdicts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in DQ.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in DQ.QUERIES.items() if sql is not None}
