"""Encode operator: DataFrame -> encoded-chunk rows, fully vectorized.

The Spark replacement for the reference's per-task data path
``open() -> add(page)* -> commit()`` (reference S3ParquetPageOutput.scala:
24-67): instead of a row-at-a-time visitor into parquet-mr column writers
(ParquetFileWriteSupport.scala:155-185), each task receives Arrow batches
and runs the engine's numpy/pyarrow codec kernels per column chunk -- no
per-row Python anywhere.

Two entry points sharing one kernel:

* ``encode_grouped``   -- one task per planned ``part_id`` via
  ``groupBy(part_id).applyInArrow`` (the checkpointable job path; a group is
  ~target_partition_bytes, the analogue of the reference's one-file-per-task).
* ``encode_map``       -- shuffle-free ``mapInArrow`` using the physical
  partition id (for in-memory round-trips and benchmarks).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..codecs import encode_array, meta_to_json
from ..plans.policy import CodecPolicy

ENCODED_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("chunk_seq", T.IntegerType(), False),
        T.StructField("col", T.StringType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("meta", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("raw_bytes", T.LongType(), False),
        T.StructField("enc_bytes", T.LongType(), False),
        T.StructField("payload_sha", T.StringType(), False),
    ]
)

_ENC_ARROW = pa.schema(
    [
        ("part_id", pa.int32()),
        ("chunk_seq", pa.int32()),
        ("col", pa.string()),
        ("codec", pa.string()),
        ("n", pa.int32()),
        ("meta", pa.string()),
        ("payload", pa.binary()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("payload_sha", pa.string()),
    ]
)


def _resolve_policy(schema: T.StructType, policy: CodecPolicy) -> dict[str, str]:
    return {
        f.name: policy.resolve(f.name, f.dataType)
        for f in schema.fields
        if f.name != "part_id"
    }


_RESELECT_EVERY = 8


def _encode_slices(
    part_id: int,
    table: pa.Table,
    colmap: dict[str, str],
    chunk_rows: int,
    seq0: int = 0,
    sticky: dict[str, str] | None = None,
) -> pa.Table:
    """Encode a table as column chunks.

    ``sticky`` caches the auto-selector's last choice per column across
    chunks (re-sampled every _RESELECT_EVERY chunks): within a planned
    partition the data distribution is homogeneous (the partitioner groups
    by lang/repo), so re-running sampled trials per chunk pays pure
    overhead. Pass a fresh dict per task."""
    cols: dict[str, list] = {name: [] for name in _ENC_ARROW.names}
    n_rows = table.num_rows
    seq = seq0
    sticky = sticky if sticky is not None else {}
    for off in range(0, max(n_rows, 1), chunk_rows):
        chunk = table.slice(off, chunk_rows)
        if chunk.num_rows == 0 and n_rows > 0:
            break
        for name, codec in colmap.items():
            arr = chunk.column(name)
            use = codec
            if codec == "auto":
                prev, uses = sticky.get(name, (None, 0))
                if prev is not None and uses % _RESELECT_EVERY != 0:
                    use = prev
                payload, meta = encode_array(arr, use)
                sticky[name] = (meta["c"] if use == "auto" else prev, uses + 1)
            else:
                payload, meta = encode_array(arr, codec)
            cols["part_id"].append(part_id)
            cols["chunk_seq"].append(seq)
            cols["col"].append(name)
            cols["codec"].append(meta["c"])
            cols["n"].append(chunk.num_rows)
            cols["meta"].append(meta_to_json(meta))
            cols["payload"].append(payload)
            cols["raw_bytes"].append(arr.nbytes)
            cols["enc_bytes"].append(len(payload))
            cols["payload_sha"].append(hashlib.sha256(payload).hexdigest())
        seq += 1
        if n_rows == 0:
            break
    return pa.table(cols, schema=_ENC_ARROW)


def encode_grouped(df_with_part: DataFrame, policy: CodecPolicy) -> DataFrame:
    """Encode a partition-planned DataFrame (must carry ``part_id``)."""
    schema = T.StructType([f for f in df_with_part.schema.fields if f.name != "part_id"])
    policy.validate(schema)
    colmap = _resolve_policy(df_with_part.schema, policy)
    chunk_rows = policy.chunk_rows

    def enc(key: tuple, table: pa.Table) -> pa.Table:
        k = key[0]
        part_id = k.as_py() if hasattr(k, "as_py") else int(k)
        data = table.drop_columns(["part_id"])
        return _encode_slices(part_id, data, colmap, chunk_rows)

    return df_with_part.groupBy("part_id").applyInArrow(enc, schema=ENCODED_SCHEMA)


def encode_map(df: DataFrame, policy: CodecPolicy) -> DataFrame:
    """Shuffle-free encode: chunk = Arrow batch, part_id = physical partition."""
    policy.validate(df.schema)
    colmap = _resolve_policy(df.schema, policy)
    chunk_rows = policy.chunk_rows

    def enc(batches):
        pid = TaskContext.get().partitionId()
        seq = 0
        sticky: dict[str, str] = {}
        for batch in batches:
            t = pa.Table.from_batches([batch])
            out = _encode_slices(pid, t, colmap, chunk_rows, seq0=seq, sticky=sticky)
            seq += max(1, -(-t.num_rows // chunk_rows))
            yield from out.to_batches()

    return df.mapInArrow(enc, schema=ENCODED_SCHEMA)
