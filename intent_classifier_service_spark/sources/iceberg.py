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


def read_snapshot(spark: SparkSession, table_or_path: str,
                  snapshot_id: str | None = None) -> DataFrame:
    """Snapshot-pinned read. Iceberg: VERSION AS OF gives immutable
    lineage (the snapshot-id recorded in the checkpoint store). Parquet
    fallback: the path IS the snapshot (append-only directories)."""
    if iceberg_available(spark) and "/" not in table_or_path:
        if snapshot_id:
            return spark.sql(
                f"SELECT * FROM {table_or_path} VERSION AS OF {snapshot_id}"
            )
        return spark.read.format("iceberg").load(table_or_path)
    return spark.read.parquet(table_or_path)


def current_snapshot_id(spark: SparkSession, table: str) -> str:
    """Iceberg: latest snapshot id from the metadata table; parquet
    fallback: a content-independent marker (the path)."""
    if iceberg_available(spark) and "/" not in table:
        row = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return str(row["snapshot_id"]) if row else "none"
    return f"parquet:{table}"
