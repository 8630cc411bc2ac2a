"""SparkSession factory with scale-oriented defaults.

Local sandbox runs use ``local[N]``; on a real cluster the same confs
apply (AQE, Arrow, partition sizing). Nothing here is sandbox-specific
except the master default.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers.

    Equivalent to ``spark-submit --py-files inverted_index_spark.zip``:
    required whenever the driver's cwd is not the repo root and on any
    real multi-node cluster.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zip_base = os.path.join(tempfile.gettempdir(), "inverted_index_spark_pkg")
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        shutil.make_archive(
            zip_base, "zip", root_dir=root, base_dir="inverted_index_spark"
        )
    spark.sparkContext.addPyFile(zip_path)


def get_spark(
    app_name: str = "inverted-index-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or 8. Shuffle partitions
    default to 2x cores locally; on a cluster AQE coalesces them anyway.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
