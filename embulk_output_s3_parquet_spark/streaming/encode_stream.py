"""Structured-Streaming encode sink: micro-batch columnar encoding.

The reference is strictly batch ("Resume supported: no", reference
README.md:10-12); this is an engine extension: a ``foreachBatch`` sink that
runs the checkpointed ``encode_job`` per micro-batch.

Exactly-once: Spark's streaming checkpoint replays a failed batch with the
same ``batch_id`` and (for replayable sources) identical data; part_ids are
offset by ``batch_id * PART_STRIDE`` so a replayed batch re-plans the exact
same ids, and the manifest's completed-part skip turns the replay into a
no-op -- the same idempotence argument as batch resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..jobs import encode_job
from ..plans.policy import CodecPolicy

# max planned partitions per micro-batch; collision-free id space per batch
PART_STRIDE = 1 << 20


def encode_stream(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    policy: CodecPolicy | None = None,
    trigger: dict | None = None,
    bucket_by: tuple | None = None,
):
    """Start the streaming encode sink; returns the StreamingQuery.

    ``trigger`` defaults to availableNow (drain-and-stop, the batch-parity
    mode); pass e.g. {"processingTime": "10 seconds"} for continuous runs.

    ``bucket_by=(col, N)`` keeps the sink's table bucket-major (see
    encode_job): the first micro-batch records the spec, later batches --
    and any batch append against a pre-bucketed table -- inherit it, so a
    streamed table stays joinable via operators.bucketjoin.
    """
    policy = policy or CodecPolicy()
    spark = stream_df.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encode_job(
            spark,
            batch_df,
            table_path,
            policy,
            if_exists="skip",
            part_base=int(batch_id) * PART_STRIDE,
            bucket_by=bucket_by,
        )

    writer = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    trigger = trigger or {"availableNow": True}
    return writer.trigger(**trigger).start()
