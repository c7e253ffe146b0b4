"""SparkSession lifecycle (SURVEY.md §2.10 O2).

The reference provisions an ephemeral Dataproc cluster per run
(``spark-bq-dag.py:40-49`` create, ``:242-247`` delete). Our engine's
equivalent is session lifecycle management: one tuned ``SparkSession``
per process, with scale-aware defaults.

Config rationale (100 TB design notes):
- ``spark.sql.adaptive.enabled`` — AQE re-plans at runtime: dynamic
  shuffle-partition coalescing, skew-join splitting, broadcast demotion.
  Mandatory at scale where static planning misjudges cardinalities.
- ``spark.sql.shuffle.partitions`` — sized to local cores here; on a
  1000-executor cluster this would be ~2-3× total cores (AQE coalesces
  down, never up, so err high).
- Arrow enabled so any ``toPandas``/Pandas-UDF boundary is columnar.
- ``timeParserPolicy=CORRECTED`` — strict (non-lenient) date parsing so
  the multi-format parser (operators/cleaning.py) is deterministic
  (SURVEY.md §4.3; reference bug surface at spark_etl_job.py:33-34).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "automated_etl_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    In local mode one JVM hosts driver+executors, so
    ``spark.driver.memory`` is the only memory knob; on a real cluster
    the same configs apply per-executor.
    """
    cpus = int(DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Python Data Source API (io/pysource.py): let authored
        # connectors receive Catalyst predicates via pushFilters
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
        .config("spark.ui.enabled", "false")
    )
    # Deployment-specific overrides without code edits (the scale knob
    # contract): SPARK_GRAFT_CONF="key=value;key2=value2" overrides the
    # defaults above; an explicit extra_conf from the caller still wins.
    for pair in filter(None, os.environ.get("SPARK_GRAFT_CONF", "").split(";")):
        k, _, v = pair.partition("=")
        if k.strip() and v.strip():
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark(spark: SparkSession) -> None:
    """Teardown — the engine analog of cluster deletion (O2)."""
    spark.stop()
