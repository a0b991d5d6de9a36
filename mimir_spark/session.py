"""SparkSession factory with scale-oriented defaults.

Local mode is a stand-in for a multi-executor cluster: every knob here
is chosen so the same plan shape survives a 1000-executor deployment
(AQE on, skew-join on, UTC timezone pinned for oracle comparison,
Arrow enabled for the pandas-UDF codec path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "mimir_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``shuffle_partitions`` defaults to ``2 * cpus`` — on a real cluster
    you would size this to total cores; AQE coalesces the excess.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or 2 * cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # zstd parquet output (guide §6): ~38% smaller than snappy on
        # the transcript corpus (625 -> 386 MB) at similar read speed
        # — less serial I/O per cold scan on the shared disk, smaller
        # tier stores at 100 TB. Read side is codec-agnostic.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # sporadic python-worker crashes on this host wedge a stage
        # otherwise silently; faulthandler makes them diagnosable
        .config("spark.python.worker.faulthandler.enabled", "true")
        # At 100 TB you want bounded scan partitions; 128 MiB is the
        # sweet spot for parquet row-group alignment.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Make mimir_spark importable in PYTHON WORKERS regardless of cwd:
    Arrow-UDF closures deserialize by importing their defining module
    on the worker, which sees only the worker's cwd/PYTHONPATH. Zips
    the package once per process and addPyFile()s it — the same
    mechanism spark-submit --py-files uses (no-op when already added)."""
    sc = spark.sparkContext
    if getattr(sc, "_mimir_spark_shipped", False):
        return
    import pathlib
    import shutil
    import tempfile

    pkg_dir = pathlib.Path(__file__).resolve().parent
    base = pathlib.Path(tempfile.gettempdir()) / f"mimir_spark_pyfiles_{os.getpid()}"
    zpath = shutil.make_archive(str(base), "zip", root_dir=str(pkg_dir.parent),
                                base_dir="mimir_spark")
    sc.addPyFile(zpath)
    sc._mimir_spark_shipped = True
