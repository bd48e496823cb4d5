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
        # scan-split sizing (guide section 6): the 4 MB openCostInBytes
        # default packs a whole small file into 1-2 splits, so a 5 MB
        # parquet table scans on 2 of 32 cores. 256 KB lets small-file
        # scans fan out (measured r6 at sf1.0: encode_documents -11%,
        # decode_documents -17%, minhash -13%); large files are governed
        # by maxPartitionBytes / bytes-per-core either way, so cluster
        # behaviour at scale is unchanged. Parameterised for production
        # (object stores with higher per-open latency may want it back up).
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", "262144"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
