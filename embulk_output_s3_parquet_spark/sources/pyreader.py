"""Spark-free EncodedTable reader: pyarrow + the codec kernels only.

The reference validates its output by re-reading with a *different* reader
(parquet-avro, reference EmbulkPluginTestHelper.scala:222-245); this module
is the engine's second reader -- no Spark session, just the manifest, the
parquet chunk files, and the numpy/pyarrow decode kernels. Used by tests and
usable by any Python consumer of an encoded table.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..codecs import decode_array, meta_from_json


def read_table(
    path: str,
    columns: list[str] | None = None,
    where: tuple | None = None,
) -> pa.Table:
    """Decode a committed EncodedTable directory into an arrow Table.

    ``where=(col, op, literal)`` applies the same zone-map chunk skipping as
    ``operators.decode.decode_table_scan``: chunks whose [min, max] proves
    no row can match are not decoded or returned (may-match contract; apply
    the exact filter on the result)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    schema_fields = json.loads(manifest["schema"])["fields"]
    names = [f["name"] for f in schema_fields]
    want = columns or names

    # committed parts = legacy inline entries + the current generation's
    # lineage shards (sources/tables.py commit protocol)
    parts: dict[str, dict] = dict(manifest.get("parts", {}))
    shard_dir = os.path.join(path, f"parts-{manifest.get('parts_gen', 0)}")
    if os.path.isdir(shard_dir):
        for name in os.listdir(shard_dir):
            if name.startswith("shard-") and name.endswith(".json"):
                with open(os.path.join(shard_dir, name)) as f:
                    parts.update(json.load(f))

    batches: list[pa.Table] = []
    for pid in sorted(int(k) for k in parts):
        part_dir = os.path.join(path, "data", f"part_id={pid}")
        files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"committed part {pid} missing at {part_dir}")
        enc = pa.concat_tables([pq.read_table(f) for f in files])
        by_chunk: dict[int, dict[str, tuple[bytes, dict]]] = {}
        for row in enc.to_pylist():
            by_chunk.setdefault(row["chunk_seq"], {})[row["col"]] = (
                row["payload"],
                meta_from_json(row["meta"]),
            )
        for seq in sorted(by_chunk):
            if where is not None:
                from ..codecs import zone_excludes

                w_col, w_op, w_val = where
                if zone_excludes(by_chunk[seq][w_col][1].get("mm"), w_op, w_val):
                    continue
            cols = {
                name: decode_array(*by_chunk[seq][name]) for name in want
            }
            batches.append(pa.table(cols))
    if batches:
        return pa.concat_tables(batches)
    # empty committed table: honor the manifest schema's types instead of
    # null-typed columns, so empty and non-empty tables decode alike
    by_name = {f["name"]: _arrow_type(f["type"]) for f in schema_fields}
    return pa.table(
        {n: pa.array([], type=by_name[n]) for n in want},
        schema=pa.schema([(n, by_name[n]) for n in want]),
    )


_SPARK_TO_ARROW = {
    "boolean": pa.bool_(),
    "byte": pa.int8(),
    "short": pa.int16(),
    "integer": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "binary": pa.binary(),
    "date": pa.date32(),
    "timestamp": pa.timestamp("us", tz="UTC"),
    "timestamp_ntz": pa.timestamp("us"),
}


def _arrow_type(spark_type) -> pa.DataType:
    """Spark schema-JSON type -> arrow type (Spark-free mirror of
    pyspark.sql.pandas.types.to_arrow_schema for the types the engine
    encodes). Handles nested array types so an empty committed table with an
    ``array<float>`` column decodes with the same schema as a non-empty one."""
    if isinstance(spark_type, str):
        if spark_type.startswith("decimal"):
            p, s = spark_type[len("decimal(") : -1].split(",")
            return pa.decimal128(int(p), int(s))
        if spark_type in _SPARK_TO_ARROW:
            return _SPARK_TO_ARROW[spark_type]
    if isinstance(spark_type, dict) and spark_type.get("type") == "array":
        elem = _arrow_type(spark_type["elementType"])
        return pa.list_(
            pa.field("element", elem, nullable=spark_type.get("containsNull", True))
        )
    raise NotImplementedError(f"no arrow mapping for spark type {spark_type!r}")
