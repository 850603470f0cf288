"""Multimodal column plumbing.

Media spans are opaque references/bytes with typed metadata.  The real
decode (image/audio libs) is NOT available in this container, so the
decode step is stubbed behind ``decode_media`` (raises
``NotImplementedError``) with a deterministic fake used instead — but the
Spark-side plumbing is real: schema, Arrow batch shape, ``mapInPandas``
partitioning, and a vectorized pandas kernel.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = (
    "doc_id string, media_ref string, off long, width long, height long, "
    "n_frames long, aspect double"
)


def decode_media(payload: bytes) -> dict:
    """Real decoder hook (PIL/ffmpeg at deployment).  Not available here."""
    raise NotImplementedError(
        "media decoding libraries are not installed in this sandbox; "
        "the pipeline uses fake_decode_features instead"
    )


def fake_decode_features(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for decode: vectorized pandas arithmetic on
    the media reference — same batch shape a real decoder would use."""
    ln = pdf["media_ref"].str.len().astype("int64")
    off = pdf["off"].astype("int64")
    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_ref": pdf["media_ref"],
            "off": off,
            "width": 64 + (ln % 7) * 16,
            "height": 48 + (ln % 5) * 24,
            "n_frames": 1 + (off % 5),
        }
    )
    out["aspect"] = out["width"] / out["height"]
    return out


RESIZED_SCHEMA = (
    "doc_id string, media_ref string, width long, height long, "
    "out_w long, out_h long, scale double"
)


def resize_media(
    features: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Letterbox-resize planning in Arrow batches (mapInPandas).

    The pixel work is the stubbed decoder's job at deployment; the
    geometry (fit-preserving scale, output dims) and the batch plumbing
    are real and vectorized.  Narrow: no shuffle.
    """
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].astype("float64")
            h = pdf["height"].astype("float64")
            scale = np.minimum(target_w / w, target_h / h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_w": np.floor(w * scale).astype("int64"),
                    "out_h": np.floor(h * scale).astype("int64"),
                    "scale": np.round(scale, 6),
                }
            )

    return features.select(
        "doc_id", "media_ref", "width", "height"
    ).mapInPandas(gen, RESIZED_SCHEMA)


def sample_frames(features: DataFrame, max_frames: int = 4) -> DataFrame:
    """Uniform frame sampling: at most ``max_frames`` per clip, every
    ceil(n/max)-th frame.  Pure built-in expressions (sequence +
    explode over tiny arithmetic); frame refs address the blob store.
    """
    stride = F.greatest(
        F.lit(1), F.ceil(F.col("n_frames") / F.lit(max_frames))
    ).cast("long")
    return (
        features.select(
            "doc_id", "media_ref", "n_frames",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1, stride)
            ).alias("frame_idx"),
        )
        .select(
            "doc_id", "media_ref", "frame_idx",
            F.concat_ws("#", "media_ref", F.col("frame_idx").cast("string"))
            .alias("frame_ref"),
        )
    )


def media_features(docs: DataFrame) -> DataFrame:
    """Explode media spans and feature-extract them in Arrow batches.

    Narrow pipeline: explode -> mapInPandas; no shuffle.  At scale, media
    bytes would live in the ``media_ref``-addressed blob store and the
    kernel would fetch+decode per batch.
    """
    media = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(
            "doc_id",
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").cast("long").alias("off"),
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fake_decode_features(pdf)

    return media.mapInPandas(gen, MEDIA_FEATURES_SCHEMA)
