"""SparkSession factory with engine defaults (local mode for tests/bench)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# rows per Arrow batch fed to the encode UDF = the engine's chunk size knob,
# the analogue of the reference's row-group sizing (reference
# S3ParquetOutputPlugin.scala:125-127 block_size -> writer memory bound)
DEFAULT_CHUNK_ROWS = 32768


def get_spark(
    app: str = "columnar-encode-engine",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # enctable DataSource (sources/datasource.py): Catalyst filter
        # pushdown into Python data sources is opt-in in Spark 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(chunk_rows))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
