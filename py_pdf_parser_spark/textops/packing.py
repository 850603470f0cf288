"""Training-shard packing: assign documents to fixed-token-budget
shards via a DISTRIBUTED prefix sum.

The operation a training-data pipeline runs right before writing
shards: every document gets a ``shard_id`` such that shard k holds the
contiguous (by ``doc_id``) run of documents whose exclusive cumulative
token count lands in ``[k * budget, (k+1) * budget)``.  Deterministic
— a function of the data only, never of partitioning — and exactly
reproducible in ANSI SQL as
``sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING AND
1 PRECEDING) // budget``.

Scale design — the naive Spark translation of that SQL is a global
window (``Window.orderBy("doc_id")`` with no partition key), which
Catalyst executes as ONE partition holding the whole corpus: the
classic prefix-sum scale killer.  Instead the cumsum is decomposed the
textbook parallel-scan way, entirely in JVM expressions:

1. bucket every row by VALUE range (``doc_id div bucket_width``) — a
   deterministic, order-preserving key derived from the data, not from
   physical partition ids (``spark_partition_id()`` would make the
   result depend on the split layout);
2. one hash shuffle on ``bucket`` computes the within-bucket exclusive
   cumsum (window) AND the per-bucket totals (groupBy reuses the same
   partitioning — ReusedExchange, no second corpus exchange);
3. the exclusive prefix over bucket TOTALS is a single-partition
   window over ``corpus_size / bucket_width`` rows — kilobytes at any
   corpus size (10^12 docs / 2^20-wide buckets = ~10^6 rows);
4. per-bucket offsets broadcast-join back on ``bucket``.

Net: exactly one corpus-sized exchange (the same one the per-bucket
window needs anyway), no Python in the plan, no single-partition stage
that scales with the corpus.  Shard ids use integer division
(``div``), never floating point — at 10^13+ cumulative tokens a double
floor() is one ULP from a wrong shard.

Ingest note: this keys on an int64 ``doc_id`` (the interleaved-corpus
ingest contract; ``TESTDATA.md`` tables ship one).  For string ids,
derive a monotone int64 at ingest — the operator deliberately does not
guess an order from strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Default value-range bucket width: 2^20, matching the module
# docstring's scale argument — at 10^12 docs the stage-3
# single-partition prefix runs over ~10^6 bucket-total rows
# (kilobytes), never corpus/64 (r4 ADVICE: a width-64 default
# recreates a corpus-scale single-partition stage at 10^10+ docs).
# Width only affects the decomposition, never the result; small-scale
# callers (queries.py, bench, tests) pass a small width explicitly so
# multi-bucket paths stay exercised at 500-doc corpora.
#
# The width is in KEY units, not row counts: it assumes ~dense int64
# ids (the ingest contract), giving ~2^20 ROWS per bucket.  For a
# SPARSE key space — e.g. the composed chunk key
# ``doc_id * 2^20 + chunk_idx`` (td_corpus_to_shards) — scale the
# width by the key stride (2^20 * 2^20 = 2^40 there), or the
# bucket-totals table degenerates to one row per source doc and the
# stage-3 prefix is corpus-sized again.
DEFAULT_BUCKET_WIDTH = 1 << 20


def token_shards(
    docs: DataFrame,
    budget: int = 2048,
    tokens: DataFrame | None = None,
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
    order_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, shard_id): fixed-budget contiguous packing.

    ``shard_id = (exclusive running sum of n_tokens in order_col
    order) div budget`` — shard k is the token-axis window
    ``[k*budget, (k+1)*budget)`` rounded to document boundaries: a
    document goes to the shard its FIRST token lands in.  A shard's
    actual token_sum therefore deviates from ``budget`` by at most the
    two straddling documents, and a document larger than ``budget``
    absorbs the shards it spans (those ids are absent).  Shard sums
    always reconcile exactly to the corpus total (``shard_stats``).

    ``tokens``: optional precomputed (doc_id, n_tokens) table (e.g.
    ``analysis.token_count`` or ``token_count_bpe`` output, renamed) —
    the materialized-table shape a deployment shares between budgeting
    and packing.  Without it, whitespace token counts are derived
    inline (narrow, codegen).

    ``order_col``: the ~dense int64 column defining the packing order
    (must exist in ``tokens`` when passed; ``doc_id`` by default).
    Pass ``corpus_shuffle``'s ``pos`` to pack shards in shuffled
    TRAINING order instead of ingest order — pos is dense 0..n-1, so
    the value-range bucket decomposition applies unchanged.
    """
    if tokens is None:
        from . import analysis

        tokens = analysis.token_count(docs)
    t = tokens.withColumn(
        "bucket", F.expr(f"{order_col} div {int(bucket_width)}")
    )

    # Stage 2: within-bucket exclusive cumsum + bucket totals on ONE
    # hashpartitioning(bucket) exchange.
    w_local = (
        Window.partitionBy("bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = t.withColumn(
        "local_before", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    bucket_totals = t.groupBy("bucket").agg(
        F.sum("n_tokens").alias("bucket_total")
    )

    # Stage 3: exclusive prefix over bucket totals — rows scale as
    # corpus_size / bucket_width, so the single partition here holds
    # kilobytes per terabyte of corpus.
    w_buckets = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_totals.select(
        "bucket",
        F.coalesce(F.sum("bucket_total").over(w_buckets), F.lit(0)).alias(
            "bucket_before"
        ),
    )

    # Stage 4: broadcast the tiny offsets table back onto the corpus.
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            F.expr(
                f"(bucket_before + local_before) div {int(budget)}"
            ).alias("shard_id"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-size training sequences with overlap
    — the doc→sequence op that runs between cleaning and packing.

    Chunk i of a document covers whitespace tokens
    ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the MINIMAL number of chunks
    covering every token is emitted —
    ``max(1, ceil((n_tokens - overlap) / stride))`` — so consecutive
    chunks share exactly ``overlap`` tokens, the last chunk always
    extends past the previous one's coverage (it is truncated at the
    document end, never redundant), and a document shorter than one
    chunk yields exactly one chunk.  Output: (doc_id, chunk_idx,
    n_chunk_tokens, chunk_text).

    Scale shape: one narrow projection — split, ``sequence`` +
    posexplode, ``slice``, ``array_join``, all JVM builtins; no
    shuffle, no Python.  Fan-out is bounded by
    ``n_tokens / stride + 1`` rows per document, each carrying only its
    own slice of text (never the whole document per chunk).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.col("text"), " ")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(stride)).cast(
            "int"
        ),
    )
    return (
        docs.select(
            "doc_id",
            toks.alias("_toks"),
            F.posexplode(
                F.sequence(F.lit(0), n_chunks - F.lit(1))
            ).alias("chunk_idx", "_i"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.slice(
                F.col("_toks"),
                F.col("_i") * stride + F.lit(1),
                F.lit(chunk_tokens),
            ).alias("_chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("_chunk").cast("long").alias("n_chunk_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )


def shard_stats(
    docs: DataFrame,
    budget: int = 2048,
    tokens: DataFrame | None = None,
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
    round_dp: int = 6,
) -> DataFrame:
    """Per-shard packing audit: (shard_id, n_docs, token_sum, fill).

    ``fill = token_sum / budget`` rounded to ``round_dp`` — the
    manifest row a shard writer records.  One map-side-combinable
    aggregation on shard_id over ``token_shards`` output; shard keys
    are dense small ints, so the shuffle is trivially balanced.
    """
    shards = token_shards(
        docs, budget=budget, tokens=tokens, bucket_width=bucket_width
    )
    return shards.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("token_sum"),
        F.round(F.sum("n_tokens") / F.lit(int(budget)), round_dp).alias(
            "fill"
        ),
    )


# Hash keyspace for corpus_shuffle sort keys: the first 8 md5 hex
# digits, so keys are uniform on [0, 2^32).
_SHUFFLE_KEYSPACE = 1 << 32


def corpus_shuffle(
    docs: DataFrame,
    seed: str = "s0",
    n_buckets: int = 1 << 20,
) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    a position 0..n-1 in the order of ``md5("<doc_id>:<seed>")`` — the
    reproducible permutation a training run records in its manifest
    (same seed => same order on any cluster size, any partitioning,
    any engine; change the seed to reshuffle between epochs).

    -> (doc_id, sort_key, pos).  ``sort_key`` is the int64 of the first
    8 md5 hex digits (ties broken by doc_id); ``pos`` is the exact
    global rank, ANSI-reproducible as
    ``ROW_NUMBER() OVER (ORDER BY sort_key, doc_id) - 1``.

    Scale design — the naive form is a global-ORDER window (one
    partition holding the corpus).  Because the keys are uniform on
    [0, 2^32), value-range bucketing decomposes the rank exactly like
    ``token_shards`` decomposes the cumsum: bucket = key div
    (2^32 / n_buckets); ONE hash exchange on bucket computes
    within-bucket ranks (window) and bucket counts (groupBy,
    ReusedExchange); the exclusive prefix over the <= n_buckets count
    rows is the only single-partition stage (10^6 rows at the 2^20
    default — kilobytes); offsets broadcast back.  Rows per bucket
    concentrate around corpus/n_buckets, so at 10^12 docs raise
    n_buckets (it only changes the decomposition, never the result).
    Small-scale callers pass a small n_buckets so the multi-bucket
    path stays exercised.
    """
    if n_buckets < 1 or n_buckets > _SHUFFLE_KEYSPACE:
        raise ValueError("n_buckets must be in [1, 2^32]")
    width = _SHUFFLE_KEYSPACE // int(n_buckets)
    key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(seed))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    t = docs.select("doc_id", key.alias("sort_key")).withColumn(
        "bucket", F.expr(f"sort_key div {width}")
    )
    w_local = Window.partitionBy("bucket").orderBy("sort_key", "doc_id")
    local = t.withColumn(
        "rk", F.row_number().over(w_local).cast("long") - F.lit(1)
    )
    bucket_counts = t.groupBy("bucket").agg(F.count("*").alias("n"))
    w_buckets = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bucket_counts.select(
        "bucket",
        F.coalesce(F.sum("n").over(w_buckets), F.lit(0)).alias("before"),
    )
    return local.join(F.broadcast(offsets), "bucket").select(
        "doc_id",
        "sort_key",
        (F.col("before") + F.col("rk")).cast("long").alias("pos"),
    )
