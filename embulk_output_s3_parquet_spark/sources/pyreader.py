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


def read_table(path: str, columns: list[str] | None = None) -> pa.Table:
    """Decode a committed EncodedTable directory into an arrow Table."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    schema_fields = json.loads(manifest["schema"])["fields"]
    names = [f["name"] for f in schema_fields]
    want = columns or names

    batches: list[pa.Table] = []
    for pid in sorted(int(k) for k in manifest["parts"]):
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
            cols = {
                name: decode_array(*by_chunk[seq][name]) for name in want
            }
            batches.append(pa.table(cols))
    return pa.concat_tables(batches) if batches else pa.table({n: [] for n in want})
