"""SparkSession factory tuned for this engine.

Local mode here, but every knob is chosen for cluster scale:
- AQE on (runtime skew-join splitting + partition coalescing) — the reference's
  dynamic batch sizing (monitor.py:200-238) becomes Spark-native adaptivity.
- Arrow enabled — all Python-side compute is pandas/Arrow batched.
- zstd parquet codec — replaces the reference's zstd blob sink (storage.py:91-135).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deepcrawl4ai_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # guide §3.1/§9: allow shuffled-hash join where its size conditions
        # hold instead of always sort-merge — the band/postings self-joins
        # are equi-joins whose sides fit per-partition hash maps, and SHJ
        # skips both sorts; AQE may also rewrite SMJ->SHJ at runtime when
        # every post-shuffle partition is under the threshold (scale-safe:
        # oversized partitions keep sort-merge)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
        # turn silent python-worker deaths into tracebacks (negligible
        # overhead; a crashed worker otherwise reports only "exited
        # unexpectedly" with no stack on either side)
        .config("spark.python.worker.faulthandler.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
