"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched UDFs
over ``mapInPandas``. The container has no media libraries, so the DECODE
step is stubbed (``decoder='fake'`` produces a deterministic hash-seeded
pixel array with the declared shape; ``decoder='real'`` raises
``NotImplementedError`` until Pillow/ffmpeg are provisioned) — the Spark-side
plumbing (schema, batch shape, partitioning, UDF signatures) is real and
tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, payload binary, mime string, "
                "width int, height int, n_frames int")


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: seeded uint8 image of the declared
    shape (seed = md5 of the payload)."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width), dtype=np.uint8)


def decode_and_featurize(df: DataFrame, decoder: str = "fake",
                         patch: int = 8) -> DataFrame:
    """binary payload → decode → downsample to ``patch×patch`` mean-pooled
    float features (the plumbing for any real per-media feature extractor).

    Output: ``media_id, features array<float>`` with ``patch²`` entries.
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(pdf["payload"], pdf["width"],
                                     pdf["height"]):
                if decoder == "real":
                    raise NotImplementedError(
                        "real media decoding needs Pillow/ffmpeg — not in "
                        "this container; plumbing validated with the fake "
                        "decoder")
                img = _fake_decode(bytes(payload), int(w), int(h))
                # mean-pool to patch×patch
                ph = max(img.shape[0] // patch, 1)
                pw = max(img.shape[1] // patch, 1)
                pooled = img[:ph * patch, :pw * patch] \
                    .reshape(patch, ph, patch, pw).mean(axis=(1, 3)) \
                    if img.shape[0] >= patch and img.shape[1] >= patch \
                    else np.resize(img.astype(float), (patch, patch))
                feats.append(pooled.astype(np.float32).ravel())
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "features": feats})

    return df.mapInPandas(run, schema="media_id long, features array<float>")


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index
    (JVM-side explode over the frame-count metadata; the decode of each
    sampled frame would plug into :func:`decode_and_featurize`)."""
    return df.select(
        "media_id", "mime",
        F.explode(F.sequence(
            F.lit(0),
            F.greatest(F.col("n_frames") - 1, F.lit(0)),
            F.lit(every_n))).alias("frame_idx"))


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        rows.append((i, bytearray(payload), "image/fake", 32 + (i % 5) * 8,
                     24 + (i % 3) * 8, 30 + i))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
