"""Multimodal column plumbing (task brief): image/audio/video as opaque
``binary`` columns + typed metadata, with decode / feature-extract /
frame-sample as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio libraries, so the *decode* kernels are
STUBBED: ``decode_image`` raises NotImplementedError unless
``deterministic_fake=True``, in which case a seeded, content-derived fake
(byte-histogram "features", hash-derived "dimensions") stands in. The Spark
plumbing -- schema, batching, UDF signatures, partition behavior -- is real
and tested; swapping the kernel for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta_width int, meta_height int, meta_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "entropy double, histogram array<int>, width int, height int"
)


def attach_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media table from any table: payload = utf8 bytes of a text
    column (a deterministic stand-in for real image bytes); metadata derived
    from content length. Exercises binary-column round-trip paths."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.length(payload)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        payload.alias("payload"),
        (F.pmod(F.xxhash64(text_col), F.lit(1920)) + 1).cast("int").alias("meta_width"),
        (F.pmod(F.xxhash64(text_col, F.lit(1)), F.lit(1080)) + 1).cast("int").alias("meta_height"),
        (n * 10).cast("int").alias("meta_ms"),
    )


def decode_image(payload: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/libjpeg (absent in this container)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; pass deterministic_fake=True for the test double"
        )
    h = hashlib.sha256(payload).digest()
    side = 4 + h[0] % 4
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.integers(0, 256, (side, side, 3), dtype=np.uint8)


def extract_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real per-batch work (histogram, entropy, sha256) + the stubbed decode for
    dimensions. Batch shape: pandas DataFrame per Arrow batch; scales by
    partition, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                arr = np.frombuffer(buf, np.uint8)
                hist = np.bincount(arr, minlength=256)
                p = hist[hist > 0] / max(len(arr), 1)
                entropy = float(-(p * np.log2(p)).sum()) if len(arr) else 0.0
                img = decode_image(buf, deterministic_fake=deterministic_fake)
                out.append(
                    (
                        int(mid),
                        kind,
                        len(buf),
                        hashlib.sha256(buf).hexdigest(),
                        round(entropy, 6),
                        hist[:16].astype(int).tolist(),
                        img.shape[1],
                        img.shape[0],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "n_bytes", "sha256",
                    "entropy", "histogram", "width", "height",
                ],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (video kind only); the frame decode itself is the stub above."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )
