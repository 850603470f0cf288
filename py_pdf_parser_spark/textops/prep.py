"""End-to-end training-corpus preparation: the composition the
individual textops exist for.

    raw docs
      -> exact dedup (one survivor per content digest)
      -> near-dup clustering over the deduped corpus (LSH candidates ->
         connected components) and keep one representative per cluster
      -> quality gate (token floor, punctuation-ratio ceiling)

Every stage is one of the already-oracle-verified operators; this
module only wires them: two digest/cluster aggregations + the iterative
CC rounds — no new shuffle shapes.  Output is the kept corpus with its
budgeting stats (token counts ride along for downstream sampling).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import analysis, dedup


def corpus_prep(
    docs: DataFrame,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    wide: Optional[DataFrame] = None,
    banded: Optional[DataFrame] = None,
) -> DataFrame:
    """-> (doc_id, n_tokens, n_chars) of the kept documents.

    ``wide``/``banded``: the corpus's shared MinHash signature and
    band-bucket tables; both are per-document (independent of which
    other docs survive exact dedup), so the deduped subset's rows are
    just a semi-join."""
    survivors = dedup.dedup_survivors(docs).select("doc_id")
    deduped = docs.join(survivors, "doc_id", "leftsemi")

    reps = (
        dedup.dup_clusters(
            deduped,
            wide=None if wide is None
            else wide.join(survivors, "doc_id", "leftsemi"),
            banded=None if banded is None
            else banded.join(survivors, "doc_id", "leftsemi"),
        )
        .where(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id")
    )
    kept = deduped.join(reps, "doc_id", "leftsemi")

    q = analysis.quality_score(kept)
    return (
        q.where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("punct_ratio") <= max_punct_ratio)
        )
        .select("doc_id", "n_tokens", "n_chars")
    )


def prep_scrub_score(
    docs: DataFrame,
    k: int = 5,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    wide: Optional[DataFrame] = None,
    banded: Optional[DataFrame] = None,
) -> DataFrame:
    """corpus_prep -> exact substring-span scrub -> unigram-LM scoring:
    the document-level prep chain a pretraining corpus actually runs
    (dedup + quality gate, then remove cross-document copied REGIONS
    from the survivors, then score what's left against a model trained
    on the scrubbed corpus itself).

    -> (doc_id, n_tokens, dup_tokens, bits_per_token) for each kept
    document: n_tokens counts the SCRUBBED text, dup_tokens what the
    span scrub removed, bits_per_token the LM quality signal a
    downstream band filter consumes.

    Composition of already-audited stages — corpus_prep's two
    aggregations + CC rounds, substring_dedup's skew-proof gram
    aggregate, lm_perplexity's broadcast-LM join; the only new piece
    is the final (tiny) doc_id join of scrub stats onto scores."""
    kept_ids = corpus_prep(
        docs, min_tokens, max_punct_ratio, wide=wide, banded=banded
    ).select("doc_id")
    kept = docs.join(kept_ids, "doc_id", "leftsemi").select(
        "doc_id", "text"
    )
    scrubbed = dedup.substring_dedup(kept, k=k)
    clean = scrubbed.select(
        "doc_id", F.col("clean_text").alias("text")
    )
    scored = analysis.lm_perplexity(clean)
    return (
        scrubbed.select("doc_id", "dup_tokens")
        .join(scored, "doc_id")
        .select("doc_id", "n_tokens", "dup_tokens", "bits_per_token")
    )
