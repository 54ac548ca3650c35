"""Bucketed tables — co-located joins without shuffles.

At 100 TB, repeated joins/aggregations on doc_id should not re-shuffle
the corpus every run. Writing the table bucketed by doc_id fixes the
physical layout once; any equi-join or aggregation on the bucket key
then reads co-partitioned data with NO Exchange on either side (for
same-bucket-count tables) — the parquet/warehouse analog of Iceberg's
bucket partition transform that the production deployment would use.

Demonstrated + plan-asserted in tests/test_bucketed.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str = "doc_id",
                   n_buckets: int = 16) -> None:
    """Persist as a bucketed managed table (sorted within buckets so
    merge-joins need no sort either)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
