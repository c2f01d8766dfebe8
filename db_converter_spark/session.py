"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]`` but every conf here is chosen to also be
the right default on a large cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), shuffle partitions sized explicitly,
session timezone pinned to UTC for deterministic timestamp semantics
(the reference pins ``timezone=UTC`` per session too —
reference: db_converter.py:82).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "db_converter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata parquet carries TIMESTAMP(NANOS) which Spark has no type
        # for; read as long + convert in catalog.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # 24g, pre-touched, ParallelGC (r7): the original 90g G1 heap paid
        # first-touch page-zeroing + G1 concurrent-thread futex churn as
        # SYSTEM time throughout the suite — on this round's kernel the
        # bench JVM burned a 9:1 system:user CPU ratio and shuffle-heavy
        # queries stalled 3-5x (dq05 isolated: [8.1, 5.2, 26.8] on 90g G1
        # vs [5.2, 3.0, 2.5] pre-touched). 24g is 1.5x the heap the ENTIRE
        # heavy family survived on at the sf100 memory-pressure decade
        # (SCALE_PROBE_R6_MEM.json) with two orders of magnitude more data
        # than any local suite run; AlwaysPreTouch moves the zeroing to
        # boot (~5 s); ParallelGC drops G1's concurrent refinement threads
        # (throughput GC is the right choice for a batch suite).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:+UseParallelGC -XX:+AlwaysPreTouch",
            ),
        )
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
