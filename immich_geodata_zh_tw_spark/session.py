"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-vs-oracle (UTC session timezone — DuckDB timestamps are
UTC-naive) and for scale (AQE on, Arrow on, shuffle partitions sized to cores
in local mode; on a real cluster AQE coalesces post-shuffle partitions).
"""

from __future__ import annotations

import os
import zipfile
from pathlib import Path
from tempfile import gettempdir

from pyspark.sql import SparkSession


def get_spark(app_name: str = "immich-geodata-zh-tw-spark",
              parallelism: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(parallelism, 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{parallelism}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # 16g measured best AND tightest for the flagship on this box
        # (8g: 6.0-10.4 s across identical reps — GC-bound; 24g: fast best
        # case but a 27 s full-GC outlier; 16g: 4.6-5.4 s consistently)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the spark-submit --py-files story).

    Python workers unpickle UDFs by importing the module by name; on a real
    cluster the package must ride along as a zip.  ``addPyFile`` makes every
    entry point (pytest, bench.py, a bare script) deployment-correct without
    relying on an inherited PYTHONPATH.
    """
    pkg_dir = Path(__file__).resolve().parent
    zip_path = Path(gettempdir()) / f"{pkg_dir.name}-pyfiles.zip"
    sources = sorted(pkg_dir.rglob("*.py"))
    newest_src = max(p.stat().st_mtime for p in sources)
    if not zip_path.exists() or zip_path.stat().st_mtime <= newest_src:
        tmp = zip_path.with_suffix(".zip.tmp")
        with zipfile.ZipFile(tmp, "w") as zf:
            for py in sources:
                zf.write(py, f"{pkg_dir.name}/{py.relative_to(pkg_dir)}")
        tmp.replace(zip_path)  # atomic: concurrent sessions never see a partial zip
    spark.sparkContext.addPyFile(str(zip_path))
