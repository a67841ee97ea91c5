"""SparkSession factory tuned for the crawl engine.

Local-mode defaults match the sandbox (local[32], single JVM); on a real
cluster the same builder is used minus the master override, and the job ships
via ``spark-submit --py-files ospo_ghcrawler_spark.zip``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ensure_shipped(spark: SparkSession) -> None:
    """Ship this package to the Python workers of an *externally created*
    SparkSession (the driver-contract path) — the runtime analog of
    ``spark-submit --py-files ospo_ghcrawler_spark.zip``."""
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "ospo_ghcrawler_spark_pyfiles.zip")
    tmp = zpath + ".tmp"
    with zipfile.ZipFile(tmp, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)


def get_spark(
    app_name: str = "ospo_ghcrawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    AQE is on so runtime stats re-plan skewed shuffles; shuffle partitions
    default to the core count (not 200) because superstep batches are small
    relative to a full warehouse scan.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    # ship this package to the python workers (local-mode analog of
    # `spark-submit --py-files ospo_ghcrawler_spark.zip`)
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_pp = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in env_pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{env_pp}" if env_pp else pkg_parent
        )
    # Master template seam: SPARK_GRAFT_MASTER="local-cluster[{cores},1,6144]"
    # swaps thread-based local[k] for REAL separate executor JVMs (the
    # closest in-sandbox shape to the north rule's "N and 4N executors");
    # "{cores}" is substituted with the requested parallelism. Production
    # deployments ignore this and size via spark-submit (scripts/run_crawl.py).
    master = os.environ.get("SPARK_GRAFT_MASTER", "local[{cores}]").format(
        cores=cores
    )
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
        # small Arrow batches: html rows are ~5-10 KB, and >10 MB batches
        # thrash the page allocator (73% sys-time measured at 10k rows/batch)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # heavy per-row Arrow/Python stages (fetch+extract) need enough input
        # splits to keep every core in steady-state waves: 128 MB splits of a
        # ~10 KB/row corpus quantize a 400k-page scan into <3 tasks/core and
        # the last wave idles most slots (measured: extract stage 76s→36s at
        # 8 cores going 128→24 MB splits, 2-core leg unchanged). 32 MB keeps
        # ~4 waves/core at bench scale; real clusters tune per table size.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config(
            "spark.executor.memory",
            os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "4g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
