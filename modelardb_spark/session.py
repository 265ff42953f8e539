"""SparkSession factory with engine defaults.

UTC session time zone (all engine arithmetic is on epoch-millis longs,
so results are timezone-independent), AQE on (runtime coalescing +
skew-join handling — the Spark-native replacement for the reference's
CGA load balancing, Partitioner.java:219-252), Arrow on (all Python
UDFs are pandas/Arrow-vectorized, never per-row).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF: dict[str, str] = {
    # pyspark's in-process launch defaults to a 1g heap; in local mode
    # the driver hosts all executor state, so size it like an executor
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # keep Arrow batches large enough to amortize per-batch Python cost
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    "spark.sql.parquet.compression.codec": "zstd",
    # \r-terminated console progress fragments interleave with real
    # stdout lines and can clip captured output mid-line (this lost a
    # benchmark record once); no console bars anywhere in the engine
    "spark.ui.showConsoleProgress": "false",
    # Spark 4.1's ChecksumCheckpointFileManager awaits an async checksum
    # write that never completes for applyInPandasWithState's state
    # store on local filesystems — commits hang indefinitely. Checksums
    # off restores the (still atomic rename-based) checkpoint behavior.
    "spark.sql.streaming.checkpointFileChecksum.enabled": "false",
}


def get_spark(
    master: str | None = None,
    app_name: str = "modelardb-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # make the package importable in executor Python workers regardless
    # of the caller's cwd (the spark-submit equivalent is --py-files)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    # shuffle/spill scratch on tmpfs when available: on this class of
    # box the shared disk is the first scaling bottleneck for many
    # concurrent shuffle writers (production analogue: fast local NVMe
    # per executor)
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        conf.setdefault("spark.local.dir", local_dir)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions
        if shuffle_partitions is not None
        else os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    if master and master.startswith("local-cluster"):
        # local-cluster "executors" share one host: the 3s-per-wave
        # locality wait for blocks cached on a sibling executor is pure
        # stall (measured 55s -> 6s on the 2.1M-turn pipeline). A real
        # multi-host cluster keeps the default — locality is real there.
        conf.setdefault("spark.locality.wait", "0")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
