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
