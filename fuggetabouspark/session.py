"""SparkSession factory with the settings the pipeline relies on.

Local-mode defaults are tuned for the sandbox (local[N] on one JVM);
on a real cluster every config here is still correct — AQE, Arrow
batching, and shuffle-partition sizing are cluster-generic. See
SURVEY.md §4.2 for what we deliberately let Catalyst/AQE own.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "fuggetabouspark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 2048,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    arrow_batch_rows bounds the flattened-token transient per Arrow
    batch (SURVEY.md §4.3): ~2048 rows * avg 160 tokens * 4 B ≈ 1.3 MB (cache-friendlier for the per-batch dedup sort, measured faster than 4096/16384)
    per batch per worker — spill-free by construction.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> str:
    """Ship this package to executor Python workers — the programmatic
    equivalent of ``spark-submit --py-files`` (BASELINE.json:6).

    Without this, any driver whose sys.path (not PYTHONPATH) provides
    fuggetabouspark fails in the Arrow UDF workers with
    ModuleNotFoundError — observed live, so it is done unconditionally;
    addPyFile is idempotent per file name within a SparkContext.
    """
    import pathlib
    import tempfile
    import zipfile

    pkg_dir = pathlib.Path(__file__).resolve().parent
    zpath = pathlib.Path(tempfile.gettempdir()) / "fuggetabouspark_pyfiles.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for p in sorted(pkg_dir.rglob("*.py")):
            zf.write(p, arcname=str(pathlib.Path("fuggetabouspark") / p.relative_to(pkg_dir)))
    spark.sparkContext.addPyFile(str(zpath))
    return str(zpath)
