"""SparkSession factory with the engine's standard configuration.

Local-mode defaults are sized for the sandbox (local[N] single JVM); on a
real cluster the same knobs are passed via spark-submit --conf.  AQE is on
(runtime re-plan + skew-join splitting), Arrow is on (vectorized pandas UDF
transport), timezone pinned UTC for oracle comparison.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "graphlite_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """``master`` overrides the default ``local[cores]`` — pass
    ``local-cluster[N,cores,mem_mb]`` to spawn N separate executor JVMs
    (the sandbox stand-in for a real N-executor cluster: per-executor
    heaps, real serialized shuffle fetches, no shared-JVM scheduling).
    Env override: ``SPARK_GRAFT_MASTER``."""
    cores = cores or default_parallelism()
    shuffle_partitions = shuffle_partitions or cores
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cores}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Optional override for shuffle scratch dirs (cluster: NVMe scratch).
    # Measured here: tmpfs (/dev/shm) is consistently SLOWER than the
    # default disk path — writes land in page cache either way and tmpfs
    # competes with the JVM for memory — so the default is left alone.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if master.startswith("local-cluster"):
        # executor JVMs are separate processes: size their heap inside the
        # worker's memory bracket, make the repo importable for any pandas
        # UDF kernels, and don't let locality waits serialize the tiny-task
        # supersteps on a zero-latency localhost "network"
        mem_mb = int(master.rstrip("]").split(",")[-1])
        builder = (
            builder.config("spark.executor.memory", f"{max(1024, mem_mb - 512)}m")
            .config("spark.executorEnv.PYTHONPATH", "/root/repo")
            .config("spark.locality.wait", "0")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        # the engine releases per-superstep localCheckpoint blocks
        # deliberately (pregel loop / fixpoint discipline); Spark WARNs
        # once per released RDD that the truncated lineage cannot be
        # recomputed — which is the point.  Quiet that one logger.
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.rdd.MapPartitionsRDD",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass
    return spark
