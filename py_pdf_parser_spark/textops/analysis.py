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


# GPT-2-style pre-tokenizer classes (no lookahead, so the same pattern
# runs on Java regex (Spark) and RE2 (DuckDB) with identical matches:
# the alternation branches are disjoint at any start position).
BPE_TOKEN_PATTERN = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    classes (word / number / punctuation runs with optional leading
    space, whitespace runs) — the cheap proxy for 'how many tokens will
    the tokenizer emit' that corpus budgeting needs."""
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_PATTERN))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


ROLL_K = 8  # rolling window width (chars)


def rolling_fingerprint(docs: DataFrame, k: int = ROLL_K) -> DataFrame:
    """Rolling-hash document fingerprint: min over all k-char windows of
    the md5-based window hash (the winnowing min-sketch with w = whole
    doc).  Position-robust: unlike a whole-text digest, a doc that
    shares its content with one edit still collides on most windows, so
    shard-level near-dup grouping can bucket on it.  Higher-order exprs
    run interpreted, but per-row over short texts — narrow, no shuffle.
    Short docs (< k chars) fall back to hashing the whole text."""
    h = (
        "cast(conv(substring(md5(substring(text, i, {k})), 1, 8), 16, 10) "
        "as bigint)"
    ).format(k=k)
    whole = (
        "cast(conv(substring(md5(text), 1, 8), 16, 10) as bigint)"
    )
    # Explicit length guard: sequence(1, 0) generates a DESCENDING
    # [1, 0] in Spark, so short docs must take the whole-text branch.
    expr = (
        f"IF(length(text) >= {k}, "
        f"array_min(transform(sequence(1, length(text) - {k - 1}), "
        f"i -> {h})), {whole})"
    )
    return docs.select(
        "doc_id", F.expr(expr).alias("roll_fp")
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
