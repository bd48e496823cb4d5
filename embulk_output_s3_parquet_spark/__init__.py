"""PySpark-native per-column lightweight-compression engine.

A from-scratch rebuild of the *capability class* of
civitaspo/embulk-output-s3_parquet (reference: /root/reference, a row->Parquet
Embulk sink that delegates dictionary/RLE/bit-pack encodings to parquet-mr,
see reference S3ParquetOutputPlugin.scala:102-134): typed columnar encode with
per-column codec choice, codec metadata, catalog registration and
bit-identical round-trip -- re-expressed Spark-first.

The engine owns the codecs (dict, RLE, FSST-style symbol table, bit-pack,
frame-of-reference) as vectorized numpy/pyarrow kernels running inside
``mapInArrow`` / ``applyInPandas``, auto-selecting the cheapest codec per
column chunk from sampled statistics, over salted size-balanced partitions
with per-partition lineage and checkpointed resume.
"""

__version__ = "0.3.0"
