"""SparkSession factory tuned for this engine.

Local-mode settings mirror what a cluster deployment would set per
executor; the scale story is in the *plan shape* (broadcasts, partial
aggs, pushdown), which is identical on a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "mspr2_back_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - AQE on: runtime coalescing, skew-join splitting, dynamic
      broadcast decisions survive a 100x scale-up better than static
      plans.
    - shuffle.partitions sized to cores locally; on a real cluster
      AQE coalesces the 32-partition default upward/downward from
      runtime stats anyway.
    - Arrow on: every toPandas()/applyInPandas crossing is batched.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r18 (guide §2.2): respect the advisory partition size when
        # coalescing instead of stopping at defaultParallelism — the
        # default (parallelismFirst=true) keeps every KB-sized
        # post-shuffle stage at `cores` tasks, pure task-launch
        # overhead locally and exactly the many-tiny-blocks shape
        # §2.2 warns about at cluster scale. Data-adaptive by
        # construction: partition count follows bytes, not the box.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # r18 second cut: the advisory target is the scale-dependent
        # half of the pair above, so it is parameterised (env seam)
        # with a LOCAL default of 1m instead of Spark's 64m. Measured
        # at 64x sf0.1 (SCALING.md r18-optimization addendum): with
        # 64m, corpus-scale shuffles in the 64 MB..cores×64 MB band
        # coalesce to bytes/64m ≪ cores and serialize the box
        # (event_association_rules 4.4 → 19.2 s, percentile family
        # ~2×). The 1m/2m/4m sweep found 1m dominant at BOTH scales:
        # at 64× every probe recovers to (or beats) the
        # parallelism-first numbers (ml_forecast_ar_exact 5.0 → 3.5,
        # skewed_join_topk 3.1 → 2.1), and at sf0.1 the alternating
        # adjacent-window A/B has 1m ≤ 4m on every top mover — the
        # KB-sized stages still collapse to one task (the task-launch
        # win that motivated the pair) while low-MB shuffles keep 2–4
        # tasks of parallelism. Production clusters should set
        # SPARK_GRAFT_ADVISORY_PARTITION_BYTES to the guide's
        # 64m-256m (§2.2/§9): there the shuffle is network-bound and
        # per-partition overheads amortize, and the mid band moves to
        # total_cores×advisory — far below any 100 TB shuffle.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "1m"),
        )
        # r18: let AQE (incl. partition coalescing) apply to the
        # plans that FILL persisted relations, so a users-sized
        # cached relation is stored in data-proportional partitions
        # instead of a fixed spark.sql.shuffle.partitions fan-out
        # that every downstream stage inherits. Caches that encode
        # COMPUTE density rather than bytes (the shingle projection,
        # the packed BLAS blocks — Python/interpreted work per row)
        # pin their partition count with explicit-N repartitions,
        # which AQE never rewrites (REPARTITION_BY_NUM).
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Read un-adjusted parquet timestamps as session-TZ TIMESTAMP,
        # not TIMESTAMP_NTZ: watermarks and unix_micros require
        # TIMESTAMP, and the session TZ is pinned UTC so values are
        # identical. load_table additionally normalizes NTZ for
        # sessions built outside this factory (sources/readers.py).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
