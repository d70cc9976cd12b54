"""SparkSession factory tuned for the KG-construction workload.

Local-mode testing uses ``local[N]``; the same configuration object is what
a ``spark-submit`` deployment would ship (AQE + skew-join splitting for the
linking shuffle, Arrow for the extraction UDF boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "codeontology-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None -> local[*]. shuffle_partitions defaults to the parallelism
    level so small/medium local runs don't fan out into 200 empty tasks;
    a cluster deployment would raise it to ~2-3x total cores.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    # make this package importable in executor Python workers even when the
    # driver script runs from elsewhere (a cluster deployment ships it via
    # spark-submit --py-files instead)
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + pypath if pypath else "")
        )
    n = cores or (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        # fixed pre-touched heap + throughput GC: G1 with an elastic heap
        # spends most of its time in kernel page commit/uncommit churn on
        # this virtualized host (observed: 24% sys, executors at 33% CPU,
        # 40x slowdown); Xms=Xmx + AlwaysPreTouch + ParallelGC makes heavy
        # emission runs stable (831s -> ~20s on a 650k-file corpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "20g"))
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseParallelGC -XX:+AlwaysPreTouch -Xms"
            + os.environ.get("SPARK_DRIVER_MEM", "20g"),
        )
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.shuffle.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
