"""SparkSession factory with scale-oriented defaults.

Local sandbox runs use ``local[N]``; on a real cluster the same confs
apply (AQE, Arrow, partition sizing). Nothing here is sandbox-specific
except the master default.
"""

from __future__ import annotations

import os
import shutil
import tempfile

# module-level so the warm-up UDF's stringified type hints (PEP 563 via
# ``from __future__ import annotations``) resolve against module globals
import pandas as pd
from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers.

    Equivalent to ``spark-submit --py-files inverted_index_spark.zip``:
    required whenever the driver's cwd is not the repo root and on any
    real multi-node cluster.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # the package itself was imported from an archive (spark-submit
        # --py-files): there is no source tree to zip, and spark-submit
        # already distributes the archive to every executor. Re-add the
        # containing zip if it is findable on disk (harmless when the
        # context came from spark-submit; necessary when a library user
        # built the SparkSession manually with the zip only on the
        # driver's sys.path), else no-op.
        p = pkg_dir
        while p not in ("", os.path.dirname(p)):
            if p.lower().endswith(".zip"):
                break
            p = os.path.dirname(p)
        if p.lower().endswith(".zip") and os.path.isfile(p):
            spark.sparkContext.addPyFile(p)
        else:
            # not silently: executors will ImportError far from here if
            # the runtime did NOT already distribute the archive
            import warnings

            warnings.warn(
                "ship_package: package imported from an archive that "
                f"could not be re-shipped ({pkg_dir!r}); relying on the "
                "runtime (spark-submit --py-files) having distributed "
                "it to executors",
                RuntimeWarning,
                stacklevel=2,
            )
        return
    root = os.path.dirname(pkg_dir)
    # the cache file is keyed on WHICH checkout it was built from: two
    # clones on one machine must not share a zip, or one clone's
    # executors silently import the other's code
    import hashlib
    import uuid

    tag = hashlib.md5(pkg_dir.encode()).hexdigest()[:10]
    zip_base = os.path.join(
        tempfile.gettempdir(), f"inverted_index_spark_pkg_{tag}"
    )
    zip_path = zip_base + ".zip"
    # rebuild when any package source is newer than the zip — a stale
    # cached zip makes executors silently run OLD code while the driver
    # runs new (the worst kind of skew); write-once + atomic replace
    # under a collision-proof tmp name (pid is NOT unique across
    # threads) so concurrent builders never corrupt each other
    newest = 0.0
    for dp, _, fs in os.walk(pkg_dir):
        for f in fs:
            if f.endswith(".py"):
                try:
                    newest = max(newest, os.path.getmtime(os.path.join(dp, f)))
                except OSError:
                    pass
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < newest:
        tmp_base = f"{zip_base}-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        shutil.make_archive(
            tmp_base, "zip", root_dir=root, base_dir="inverted_index_spark"
        )
        os.replace(tmp_base + ".zip", zip_path)
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
    # glibc malloc spawns up to 8 arenas/core; with one python worker
    # per task slot the mmap churn showed up as 50%+ kernel time at
    # 32-wide. Cap arenas before the JVM (and thus the forked python
    # worker daemon) starts. Harmless elsewhere.
    os.environ.setdefault("MALLOC_ARENA_MAX", "2")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE helps ad-hoc query plans but adds per-stage re-planning
        # latency; the build pipeline sets every partitioning explicitly,
        # so jobs dominated by fixed stage count can turn it off
        .config(
            "spark.sql.adaptive.enabled",
            os.environ.get("SPARK_GRAFT_AQE", "true"),
        )
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default 64m advisory coalesces a CPU-bound pandas-UDF stage
        # over a few-hundred-MB shuffle down to a handful of tasks —
        # cores idle while Python chews; 8m keeps those stages wide
        # without producing tiny-file writes at sandbox scale
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # split text-bearing parquet finely enough that the tokenizer
        # stage parallelizes even when the corpus is tens of MB
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # local mode: the driver heap IS the executor heap, so a fixed
        # size starves wide runs — 32 concurrent tasks sharing the 8 GB
        # that 8 tasks had means 1/4 the execution memory per task, and
        # shuffle-heavy ops (dedup's groupBys/self-join) collapse into
        # spill (measured: 6x aggregate task time at local[32] vs
        # local[8] on identical input). A real N->4N cluster brings 4x
        # executor memory with it, so the faithful local model keeps
        # PER-CORE memory constant: 1 GiB/core, floor 8 GiB.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", f"{max(cores, 8)}g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    evt_dir = os.environ.get("SPARK_GRAFT_EVENTLOG")
    if evt_dir:
        # scaling_bench parses these logs for aggregate task time (the
        # work-conserving scaling metric on a clock-throttled VM)
        os.makedirs(evt_dir, exist_ok=True)
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", evt_dir)
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.rolling.enabled", "false")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark


def warm_python_workers(spark: SparkSession, tasks: int | None = None) -> None:
    """Spin up executor Python workers (pandas/numpy import, Arrow runtime)
    with a trivial vectorized job — a per-JVM one-time cost callers may
    want excluded from throughput measurements."""
    from pyspark.sql.pandas.functions import pandas_udf

    if tasks is None:
        tasks = spark.sparkContext.defaultParallelism * 4

    @pandas_udf("long")
    def _warm(x: pd.Series) -> pd.Series:
        return x

    spark.range(tasks).repartition(tasks).select(_warm("id")).count()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
