"""SparkSession bootstrap tuned for the engine's workloads.

The defaults encode the scale posture from SURVEY.md §4: AQE on with
64 MB advisory partitions (the reference's explicit partition-size
target, ``functions/dask_pipeline.py:41`` ``repartition(
partition_size='64MB')``), Arrow transfers for the few Pandas-UDF
escape hatches, and a UTC session timezone so results are comparable
against UTC-naive engines (DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The reference tunes Dask partitions to ~64 MB
# (data/brca_undersample.py:20, functions/dask_pipeline.py:41);
# the same target is a good AQE advisory size on Spark.
PARTITION_BYTES = 64 * 1024 * 1024

DEFAULT_CONFIGS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(PARTITION_BYTES),
    "spark.sql.files.maxPartitionBytes": str(PARTITION_BYTES * 2),
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    # Local mode: one JVM; generous broadcast threshold — dims
    # (factors, labels, mappings) are tiny relative to the fact table.
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.driver.extraJavaOptions": "-Dderby.system.home=/tmp/derby",
    # Stable local warehouse so bucketed saveAsTable works from any
    # CWD (cluster deployments override with the shared catalog).
    "spark.sql.warehouse.dir": "/tmp/gexp_spark_warehouse",
    # Bucketed-table reads: join two same-bucketed tables without
    # exchanges (on by default; pinned here as load-bearing).
    "spark.sql.sources.bucketing.enabled": "true",
}


def get_spark(
    app_name: str = "gexp_ml_dask_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_configs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    ``local[*]``) so the same entry points run in tests, bench, and
    on a real cluster (where ``master`` is supplied by spark-submit
    and this argument stays ``None``).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_CONNECT_MODE_ENABLED"):
        # SPARK_GRAFT_MASTER overrides the master wholesale (e.g.
        # ``local-cluster[2,8,4096]`` for multi-executor smoke runs
        # that exercise real broadcast shipping + shuffle
        # serialization); otherwise local[$SPARK_GRAFT_CPUS].
        master = os.environ.get("SPARK_GRAFT_MASTER")
        if master is None:
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
            master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    configs = dict(DEFAULT_CONFIGS)
    if master and master.startswith("local-cluster"):
        # Multi-executor smoke mode: worker JVMs get the memory from
        # the master string (MB); the driver only holds collects and
        # broadcast builds. spark.executor.memory must fit inside the
        # per-worker allowance or the app hangs waiting for resources.
        try:
            worker_mb = int(master.rstrip("]").split(",")[-1])
        except ValueError:
            worker_mb = 1024
        configs.setdefault(
            "spark.executor.memory", f"{max(worker_mb - 512, 512)}m"
        )
        configs.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    elif master and master.startswith("local"):
        # Local mode: the driver JVM hosts all executor threads, but
        # Spark's default heap is 1g — 32 concurrent tasks OOM on any
        # real aggregate. -Xmx is a cap, not a reservation. On a real
        # cluster spark-submit owns this and the branch is skipped.
        configs.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        )
    if shuffle_partitions is not None:
        configs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    elif os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS"):
        # Scale-adaptive override: the 32 default is sized for the
        # local[32] bench box (AQE coalesces below it via the 64 MB
        # advisory). A cluster run sets this to ~2-3x total cores (or
        # lets AQE start high and coalesce) WITHOUT touching code —
        # shuffle width must never be a constant baked for one box.
        configs["spark.sql.shuffle.partitions"] = os.environ[
            "SPARK_GRAFT_SHUFFLE_PARTITIONS"
        ]
    if extra_configs:
        configs.update(extra_configs)
    for key, value in configs.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
