"""Encoded-table storage: local warehouse dir + JSON manifest catalog.

Plays the role of the reference's S3 upload + Glue catalog registration
(reference S3ParquetPageOutput.scala:51-67, CatalogRegistrator.scala:92-178)
in an Iceberg-shaped way: a table directory with data files per partition
plus an atomic manifest that is simultaneously

* the catalog entry (schema + codec policy as table properties,
  ``operation_if_exists`` semantics {error, skip, delete} mirroring
  CatalogRegistrator.scala:104-111),
* the checkpoint (set of committed part_ids -- resume skips them; the
  reference explicitly cannot resume, README.md:11),
* the lineage store (per-partition rows/bytes/codecs/sha256 manifest/wall
  time -- the engine's ``TaskReport``, S3ParquetPageOutput.scala:61-67).

Commit protocol (crash-safe, at-least-once tasks -> exactly-once parts):
encode waves write to ``.staging-*``; on success each ``part_id=K`` dir is
atomically renamed into ``data/`` (clobbering any uncommitted leftover),
then the manifest is rewritten via temp-file + rename. Readers only see
parts listed in the manifest, so a kill at any point leaves either a
re-encodable hole or invisible garbage -- never duplicates.

When an Iceberg runtime is on the classpath this layer could delegate to
``DataFrameWriterV2.createOrReplace``; the sandbox has no Iceberg jar, so
the local format is the default (SURVEY.md section 7).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.policy import CodecPolicy, ConfigException

MANIFEST = "manifest.json"


class EncodedTable:
    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.manifest_path = os.path.join(path, MANIFEST)

    # -- catalog ------------------------------------------------------------

    @classmethod
    def create(
        cls,
        path: str,
        schema: T.StructType,
        policy: CodecPolicy,
        if_exists: str = "error",
    ) -> "EncodedTable":
        t = cls(path)
        if os.path.exists(t.manifest_path):
            if if_exists == "error":
                raise ConfigException(f"table already exists: {path}")
            if if_exists == "skip":
                existing = t.manifest()
                if existing["schema"] != schema.json():
                    raise ConfigException(
                        "existing table schema differs; use if_exists='delete'"
                    )
                return t
            if if_exists == "delete":
                shutil.rmtree(path)
            else:
                raise ConfigException(f"if_exists must be error|skip|delete, got {if_exists!r}")
        os.makedirs(t.data_dir, exist_ok=True)
        t._write_manifest(
            {
                "version": 1,
                "schema": schema.json(),
                "properties": {"codec-policy": asdict(policy)},
                "parts": {},
                "created_at": time.time(),
            }
        )
        return t

    def exists(self) -> bool:
        return os.path.exists(self.manifest_path)

    def manifest(self) -> dict:
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, prefix=".manifest-")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.manifest()["schema"]))

    def policy(self) -> CodecPolicy:
        return CodecPolicy(**self.manifest()["properties"]["codec-policy"])

    def completed_parts(self) -> set[int]:
        return {int(k) for k in self.manifest()["parts"]}

    def lineage(self) -> dict[int, dict]:
        return {int(k): v for k, v in self.manifest()["parts"].items()}

    def catalog_schema(self, overrides: dict[str, str] | None = None) -> list[dict]:
        """Hive/Glue-style column descriptors with per-column overrides --
        the analogue of the reference's Glue schema derivation
        (CatalogRegistrator.scala:180-191, type algebra GlueDataType.scala:5-57)."""
        type_map = {
            "boolean": "BOOLEAN", "tinyint": "TINYINT", "smallint": "SMALLINT",
            "int": "INT", "bigint": "BIGINT", "float": "FLOAT", "double": "DOUBLE",
            "string": "STRING", "binary": "BINARY", "date": "DATE",
            "timestamp": "TIMESTAMP", "timestamp_ntz": "TIMESTAMP",
        }
        overrides = overrides or {}
        out = []
        for f in self.schema().fields:
            simple = f.dataType.simpleString()
            if f.name not in overrides and simple.startswith("decimal"):
                glue = simple.upper()
            else:
                glue = overrides.get(f.name) or type_map.get(simple)
            if glue is None:
                raise ConfigException(f"no catalog type for column {f.name!r}: {simple}")
            out.append({"name": f.name, "type": glue, "nullable": f.nullable})
        return out

    def describe(self) -> dict:
        """Catalog-entry view: schema + properties + lineage summary."""
        m = self.manifest()
        parts = m["parts"].values()
        return {
            "location": self.path,
            "columns": self.catalog_schema(),
            "properties": m["properties"],
            "parts": len(parts),
            "rows": sum(p["rows"] for p in parts),
            "raw_bytes": sum(p["raw_bytes"] for p in parts),
            "enc_bytes": sum(p["enc_bytes"] for p in parts),
        }

    # -- commit protocol ----------------------------------------------------

    def new_staging(self) -> str:
        return os.path.join(self.path, f".staging-{uuid.uuid4().hex[:12]}")

    def clean_staging(self) -> None:
        for name in os.listdir(self.path):
            if name.startswith(".staging-"):
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    def commit_staging(self, staging_dir: str, lineage_rows: dict[int, dict]) -> None:
        for name in sorted(os.listdir(staging_dir)):
            if not name.startswith("part_id="):
                continue
            src = os.path.join(staging_dir, name)
            dst = os.path.join(self.data_dir, name)
            if os.path.exists(dst):
                shutil.rmtree(dst)  # uncommitted leftover from a killed run
            os.rename(src, dst)
        m = self.manifest()
        for pid, row in lineage_rows.items():
            m["parts"][str(pid)] = row
        self._write_manifest(m)
        shutil.rmtree(staging_dir, ignore_errors=True)

    # -- read ---------------------------------------------------------------

    def read_encoded(self, spark: SparkSession) -> DataFrame:
        done = self.completed_parts()
        if not done:
            raise ConfigException(f"table {self.path} has no committed partitions")
        df = spark.read.parquet(self.data_dir)
        committed = spark.createDataFrame(
            [(p,) for p in sorted(done)], "part_id int"
        )
        # left_semi broadcast keeps only committed parts (partition-pruned scan
        # would be even better; semi-join is the format-agnostic way)
        return df.join(F.broadcast(committed), "part_id", "left_semi")
