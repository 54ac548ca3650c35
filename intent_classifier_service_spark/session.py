"""SparkSession factory.

One place to set the configs that matter at 100 TB and in local mode:
AQE (runtime re-plan + skew-join splitting), Arrow for the pandas-UDF
boundary, shuffle partitions sized to the parallelism actually available
(local mode: cores; cluster: executors*cores*2-3), and broadcast-join
threshold so small dims never shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "intent-classifier-service-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` controls ``local[N]``; defaults to $SPARK_GRAFT_CPUS or all
    cores. ``shuffle_partitions`` defaults to the same N — on a real
    cluster this is overridden by spark-submit conf, and AQE coalesces
    down from whatever initial number is set, so the initial value only
    needs to be "not absurdly small".
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: coalesce post-shuffle partitions, split skewed ones at runtime.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batches for every pandas_udf / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Dims (class dim, valid media_refs) must broadcast, never shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate adds `size(e)>0 AND e IS NOT NULL`
        # below every non-outer explode. When the generator input is a
        # DERIVED array (the span derivation, shingle construction),
        # predicate pushdown then drags that filter below projections
        # and exchanges, INLINING the whole array-construction
        # expression into the filter — the heavy derivation runs twice
        # more, in the narrow pre-shuffle stage (measured 4-5.5x on the
        # span/referential family). The filter is semantically
        # redundant (Generate already drops null/empty arrays); for
        # stored-array scans it prunes nothing list stats could not
        # (A/B: no regression). Excluded session-wide.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Local-mode: keep partition files readable-sized for pushdown tests.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
