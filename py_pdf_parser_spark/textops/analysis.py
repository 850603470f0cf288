"""Text analysis: token counting, quality scoring, language ID,
document fingerprinting.

Every op is a pure Column-expression pipeline (JVM-side, codegen-friendly,
trivially scalable: narrow transformations only, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PUNCT_CLASS = "[.,!?;:]"

# Tiny deterministic stopword sets for the n-gram language heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "les", "et", "est", "un", "une"],
    "es": ["el", "los", "y", "es", "del", "las"],
}


def _tokens():
    return F.split(F.col("text"), " ")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count per document."""
    return docs.select(
        "doc_id", F.size(_tokens()).cast("long").alias("n_tokens")
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality signals."""
    n_chars = F.length("text").cast("long")
    n_punct = (
        F.length("text") - F.length(F.regexp_replace("text", PUNCT_CLASS, ""))
    ).cast("long")
    n_tokens = F.size(_tokens()).cast("long")
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    n_stop = F.expr(
        f"size(filter(split(text, ' '), x -> x in ({stop_list})))"
    ).cast("long")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        (n_punct / n_chars).alias("punct_ratio"),
        (n_stop / n_tokens).alias("stopword_ratio"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language heuristic with deterministic tie-break."""
    hit_cols = {}
    for lang, words in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        hit_cols[lang] = F.expr(
            f"size(filter(split(text, ' '), x -> x in ({lst})))"
        ).cast("long")
    h = hit_cols
    pred = (
        F.when(
            (h["en"] > 0)
            & (h["en"] >= F.greatest(h["de"], h["fr"], h["es"])),
            F.lit("en"),
        )
        .when((h["de"] > 0) & (h["de"] >= F.greatest(h["fr"], h["es"])), "de")
        .when((h["fr"] > 0) & (h["fr"] >= h["es"]), "fr")
        .when(h["es"] > 0, "es")
        .otherwise("unk")
    )
    return docs.select(
        "doc_id",
        h["en"].alias("hits_en"),
        h["de"].alias("hits_de"),
        h["fr"].alias("hits_fr"),
        h["es"].alias("hits_es"),
        pred.alias("lang_pred"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Bag-of-words document fingerprint: md5 over the sorted distinct
    token set — an order-insensitive content hash for shard-level dedup."""
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens())))
    )
    return docs.select("doc_id", fp.alias("fingerprint"))
