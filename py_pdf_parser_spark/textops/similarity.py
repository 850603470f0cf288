"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus; one narrow pass + per-query top-k window.  The
  correctness baseline.
* ``lsh_topk`` — random-hyperplane LSH bucketing: sign-bit sketch per
  vector, candidates = same bucket (optionally multi-probe), exact rerank
  inside buckets.  The scale path: the corpus is hashed once (narrow),
  the join shuffles on small bucket keys, rerank touches only candidates.
* ``embedding_dup_pairs`` — near-duplicate pairs by cosine >= threshold,
  LSH-bucketed so the pair join never goes quadratic.

All vector math is built-in higher-order functions (JVM-side): zip_with +
aggregate for dot products; elements cast to double for deterministic
precision (mirrors DuckDB's list_cosine_similarity on DOUBLE[]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)


def _norm(col: str) -> str:
    return f"sqrt({DOT.format(a=col, b=col)})"


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", F.expr(_norm(vec_col)))


def cosine_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Output: (q_id, vec_id, cos, rank) — cos rounded to 4dp, ties broken
    by vec_id for determinism.
    """
    corpus = with_norm(emb).select(
        "vec_id", "embedding", F.col("_norm").alias("n_c")
    )
    queries = with_norm(emb.where(F.col("vec_id") < n_queries)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_norm").alias("n_q"),
    )
    dot = F.expr(DOT.format(a="q_emb", b="embedding"))
    joined = (
        corpus.join(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", F.round(dot / (F.col("n_c") * F.col("n_q")), 4))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


N_HYPERPLANES = 8


def _hyperplane_sketch(vec_col: str) -> str:
    """Sign-bit sketch: hyperplane h has pseudo-random +-1 components
    derived from (h, dim) — deterministic, SQL-reproducible:
    sign = +1 if (dim * (h + 3) + h * 7) % 2 = 0 else -1."""
    bits = []
    for h in range(N_HYPERPLANES):
        proj = (
            f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1), "
            f"(x, d) -> cast(x as double) * IF((d * ({h} + 3) + {h} * 7) % 2 = 0, 1.0, -1.0)), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )
        bits.append(f"IF({proj} > 0, {2 ** h}, 0)")
    return " + ".join(bits)


def lsh_buckets(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn(
        "bucket", F.expr(_hyperplane_sketch(vec_col)).cast("long")
    )


def hashed_embeddings(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """The signature table: (vec_id, embedding, bucket, _norm).

    The sketch + norm are interpreted higher-order expressions — the
    most expensive per-row work in this module — and every LSH consumer
    (``lsh_topk`` both probe modes, ``embedding_dup_pairs``' counts AND
    both join sides) starts from exactly this projection.  A deployment
    materializes it ONCE per corpus as a bucketed table and shares it;
    callers here pass it via the ``hashed=`` parameter (the analogue of
    dedup's shared shingle-rows table).  Without sharing, a self-join
    consumer recomputes the sketch once per plan branch — 3x for
    ``embedding_dup_pairs`` (measured: the r4 md5-chunk cap made that
    visible as the emb_dup_pairs watch item).
    """
    return with_norm(lsh_buckets(emb, vec_col), vec_col)


N_IVF_CELLS = 16


def ivf_assign(emb: DataFrame, n_cells: int = N_IVF_CELLS) -> DataFrame:
    """IVF coarse quantization: nearest-centroid cell per vector.

    Centroids are the first ``n_cells`` corpus vectors — deterministic
    (SQL-reproducible) in place of a k-means fit; at deployment the
    centroid table is the trained codebook and the plan is identical:
    broadcast the (tiny) centroid set, one narrow argmax pass, no
    shuffle of the corpus.
    """
    cents = with_norm(emb.where(F.col("vec_id") < n_cells)).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("c_emb"),
        F.col("_norm").alias("n_cent"),
    )
    corpus = with_norm(emb)
    dot = F.expr(DOT.format(a="embedding", b="c_emb"))
    scored = corpus.join(F.broadcast(cents)).withColumn(
        "c_cos", dot / (F.col("_norm") * F.col("n_cent"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("c_cos"), F.asc("cell_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "_norm", "cell_id")
    )


def _ivf_scored(
    emb: DataFrame, n_cells: int, centroids: DataFrame = None
) -> DataFrame:
    """(vec_id, embedding, _norm, cell_id, rn) — every vector scored
    against every centroid, rn = 1-based nearest-cell rank.  Broadcast
    centroids + one narrow rank window; no corpus shuffle.

    ``centroids``: optional trained codebook ``(cell_id, centroid)``
    (kmeans_centroids); default = the deterministic first-n-vectors
    stand-in."""
    if centroids is not None:
        cents = (
            centroids.select(
                "cell_id", F.col("centroid").alias("c_emb")
            )
            .withColumn("n_cent", F.expr(_norm("c_emb")))
        )
    else:
        cents = with_norm(emb.where(F.col("vec_id") < n_cells)).select(
            F.col("vec_id").alias("cell_id"),
            F.col("embedding").alias("c_emb"),
            F.col("_norm").alias("n_cent"),
        )
    corpus = with_norm(emb)
    dot = F.expr(DOT.format(a="embedding", b="c_emb"))
    scored = corpus.join(F.broadcast(cents)).withColumn(
        "c_cos", dot / (F.col("_norm") * F.col("n_cent"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("c_cos"), F.asc("cell_id")
    )
    return scored.withColumn("rn", F.row_number().over(w)).select(
        "vec_id", "embedding", "_norm", "cell_id", "rn"
    )


def ivf_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5,
    n_cells: int = N_IVF_CELLS, n_probe: int = 1,
    centroids: DataFrame = None,
) -> DataFrame:
    """Approximate top-k: exact rerank within the query's ``n_probe``
    nearest IVF cells.  Multi-probe recovers most single-probe recall
    loss at the cost of probing n_probe buckets per query — the
    candidate set stays bucketed (never the whole corpus).  Pass
    ``centroids`` (kmeans_centroids output) to search against the
    trained codebook instead of the first-n-vectors stand-in."""
    scored = _ivf_scored(emb, n_cells, centroids=centroids)
    corpus = scored.where(F.col("rn") == 1).select(
        "vec_id", "embedding", "cell_id", F.col("_norm").alias("n_c")
    )
    queries = scored.where(
        (F.col("vec_id") < n_queries) & (F.col("rn") <= n_probe)
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cell_id").alias("q_cell"),
        F.col("_norm").alias("n_q"),
    )
    dot = F.expr(DOT.format(a="q_emb", b="embedding"))
    joined = (
        corpus.join(F.broadcast(queries), corpus["cell_id"] == queries["q_cell"])
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", F.round(dot / (F.col("n_c") * F.col("n_q")), 4))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def kmeans_centroids(
    emb: DataFrame,
    n_cells: int = N_IVF_CELLS,
    n_iters: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding column — a REAL
    trained codebook for IVF coarse quantization (upgrades ivf_assign's
    first-n-vectors stand-in; spherical variant: max-cosine assignment,
    per-cell component mean update).

    Deterministic and SQL-reproducible by construction:
    * init = the first ``n_cells`` corpus vectors,
    * assignment ranks ``round(cos, round_dp)`` descending with
      ``cell_id`` ascending tie-break (FP summation-order noise is
      ~1e-15 — nine orders below the rounding step),
    * updated centroid components are ``round()``ed, so successive
      iterations operate on identical values in any engine.

    Per iteration the ENTIRE centroid set rides as one broadcast array
    row and the argmax assignment is a pure projection (transform
    scores -> fold to best) — the corpus NEVER moves: no window, no
    per-vector shuffle (a Window.partitionBy(vec_id) form was plan-
    audited at a full corpus exchange per iteration and rejected,
    PLANS.md r4).  The update aggregates posexploded components on
    ``(cell_id, pos)`` keys with map-side partial combine, so each task
    exchanges at most cells x dim partial rows — bytes, not the corpus.
    At web scale k-means training additionally runs over a
    deterministic hash sample (dedup.hash_sample) and the codebook is
    reused corpus-wide.  A cell that captures no vectors drops out
    (classic Lloyd's; deterministic, identical in the SQL oracle).

    Returns ``(cell_id, centroid array<double>)``.
    """
    corpus = with_norm(emb).select("vec_id", "embedding", "_norm")
    cents = corpus.where(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"),
        F.expr(
            "transform(embedding, x -> cast(x as double))"
        ).alias("c_emb"),
    )
    dot = DOT.format(a="embedding", b="c.c_emb")
    best_cell = f"""
aggregate(
  transform(cells, c -> named_struct(
    'cell', cast(c.cell_id as bigint),
    'cos', round({dot} / (_norm * c.n_cent), {round_dp}))),
  named_struct('cell', cast(-1 as bigint), 'cos', cast(-2.0 as double)),
  (acc, s) -> IF(s.cos > acc.cos,
                 named_struct('cell', s.cell, 'cos', s.cos), acc)
).cell"""
    # scores are in cell_id-ascending order (array_sort on the struct's
    # leading field), so strict > keeps the LOWEST cell_id on ties —
    # identical to the rank(cos DESC, cell_id ASC) rule the oracle uses.
    for _ in range(n_iters):
        cents_row = (
            cents.withColumn("n_cent", F.expr(_norm("c_emb")))
            .agg(
                F.expr(
                    "array_sort(collect_list("
                    "struct(cell_id, c_emb, n_cent)))"
                ).alias("cells")
            )
        )
        assigned = corpus.join(F.broadcast(cents_row)).select(
            F.expr(best_cell).alias("cell_id"), "embedding"
        )
        means = (
            assigned.select(
                "cell_id", F.posexplode("embedding").alias("pos", "x")
            )
            .groupBy("cell_id", "pos")
            .agg(
                F.round(
                    F.avg(F.col("x").cast("double")), round_dp
                ).alias("m")
            )
        )
        cents = means.groupBy("cell_id").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))),"
                " s -> s.m)"
            ).alias("c_emb")
        )
    return cents.select("cell_id", F.col("c_emb").alias("centroid"))


def lsh_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5,
    multi_probe: bool = False, hashed: DataFrame = None,
) -> DataFrame:
    """Approximate top-k: exact rerank within the query's LSH bucket.

    ``multi_probe=True`` additionally probes every bucket at Hamming
    distance 1 from the query's sketch (flip each of the 8 sign bits) —
    the vectors most likely misplaced by a borderline hyperplane
    projection — recovering most single-probe recall loss for 9 bucket
    probes per query instead of 1.  The corpus is still hashed once and
    never shuffled; each corpus vector lives in exactly one bucket, so
    probes never duplicate candidates.

    ``hashed``: a precomputed/shared ``hashed_embeddings(emb)`` table;
    when given, ``emb`` is ignored and the sketch is not recomputed.
    """
    if hashed is None:
        hashed = hashed_embeddings(emb)
    corpus = hashed.select(
        "vec_id", "embedding", "bucket", F.col("_norm").alias("n_c")
    )
    queries = hashed.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
        F.col("_norm").alias("n_q"),
    )
    if multi_probe:
        probes = F.array(
            F.col("q_bucket"),
            *[
                F.col("q_bucket").bitwiseXOR(F.lit(1 << h))
                for h in range(N_HYPERPLANES)
            ],
        )
        queries = queries.withColumn(
            "q_bucket", F.explode(probes)
        )
    dot = F.expr(DOT.format(a="q_emb", b="embedding"))
    joined = (
        corpus.join(
            F.broadcast(queries), corpus["bucket"] == queries["q_bucket"]
        )
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", F.round(dot / (F.col("n_c") * F.col("n_q")), 4))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def semantic_dup_pairs(
    emb: DataFrame, threshold: float = 0.9, n_cells: int = N_IVF_CELLS,
    centroids: DataFrame = None, max_bucket: int = 256,
) -> DataFrame:
    """Semantic near-dup candidate pairs: cosine >= threshold WITHIN a
    vector's (trained) k-means cell — the SemDeDup shape (Abbas et al.
    2023, public): cluster with a coarse codebook, then compare only
    inside a cluster, so the candidate space is corpus x cell-size,
    never corpus x corpus.

    Same scale guards as ``embedding_dup_pairs``: per-cell counts are
    tiny (<= n_cells rows, broadcast) and oversized cells split into
    deterministic md5 chunks of ~``max_bucket``, bounding the
    worst-cell join at ~(n/cap)·C(cap,2).  Pass ``centroids``
    (kmeans_centroids output) to pair within the trained codebook's
    cells; default = the deterministic first-n-vectors stand-in.
    """
    assigned = (
        _ivf_scored(emb, n_cells, centroids=centroids)
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "_norm", "cell_id")
    )
    counts = assigned.groupBy("cell_id").agg(F.count("*").alias("_n"))
    chunk = F.expr(
        "cast(conv(substring(md5(cast(vec_id as string)), 1, 8), 16, 10) "
        "as bigint)"
    ) % F.ceil(F.col("_n") / F.lit(max_bucket))
    hashed = (
        assigned.join(F.broadcast(counts), "cell_id")
        .withColumn("chunk", chunk)
        .drop("_n")
    )
    a = hashed.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        F.col("_norm").alias("n_a"),
        "cell_id", "chunk",
    )
    b = hashed.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        F.col("_norm").alias("n_b"),
        "cell_id", "chunk",
    )
    dot = F.expr(DOT.format(a="emb_a", b="emb_b"))
    return (
        a.join(b, ["cell_id", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(dot / (F.col("n_a") * F.col("n_b")), 4))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def semantic_dedup(
    emb: DataFrame, threshold: float = 0.9, n_cells: int = N_IVF_CELLS,
    centroids: DataFrame = None, max_bucket: int = 256,
    max_iter: int = 25, stats: dict = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over the embedding column:
    (vec_id, cluster_id, is_rep) where cluster_id = min vec_id of the
    vector's within-cell near-dup component and a vector survives the
    dedup iff ``is_rep``.

    Composition of audited stages: trained-cell assignment (broadcast
    argmax — corpus never shuffles), chunk-capped within-cell pairs
    (``semantic_dup_pairs``), then the same pointer-jumping
    connected-components used by text dup_clusters (O(log diameter)
    rounds, each one join + aggregate on id keys).  Pairs alone don't
    compose — A~B and B~C must land one representative even when A~C
    was never scored.
    """
    from . import dedup

    pairs = semantic_dup_pairs(
        emb, threshold=threshold, n_cells=n_cells,
        centroids=centroids, max_bucket=max_bucket,
    )
    nodes = emb.select(F.col("vec_id").alias("doc_id")).distinct()
    edges = pairs.select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    cc = dedup.connected_components(
        nodes, edges, max_iter=max_iter, stats=stats
    )
    return cc.select(
        F.col("doc_id").alias("vec_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_rep"),
    )


def embedding_dup_pairs(
    emb: DataFrame, threshold: float = 0.95, max_bucket: int = 256,
    hashed: DataFrame = None,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold), LSH-bucketed.

    A degenerate bucket (zero vectors, a boilerplate embedding repeated
    across a crawl) would make the within-bucket join quadratic in that
    bucket, so oversized buckets are split into deterministic hash
    chunks of ~``max_bucket`` and pairs form only within a chunk —
    worst-bucket cost drops from C(n,2) to ~(n/cap)·C(cap,2).

    Chunks come from per-bucket COUNTS (tiny: ≤ 2^N_HYPERPLANES rows,
    broadcast) + ``md5(vec_id) % ceil(n/cap)`` — NOT a rank window:
    partitionBy(bucket) ranking would shuffle AND sort the full
    embedding arrays (measured 2.6x the query).  The md5 chunk is
    deterministic and SQL-reproducible; buckets at or under the cap get
    ceil(n/cap)=1 chunk, i.e. are untouched.

    ``hashed``: a precomputed/shared ``hashed_embeddings(emb)`` table.
    This query's plan scans the signature projection THREE times
    (counts + both join sides); without a shared table each scan
    re-evaluates the interpreted sketch over the corpus.
    """
    if hashed is None:
        hashed = hashed_embeddings(emb)
    counts = hashed.groupBy("bucket").agg(F.count("*").alias("_n"))
    chunk = F.expr(
        "cast(conv(substring(md5(cast(vec_id as string)), 1, 8), 16, 10) "
        "as bigint)"
    ) % F.ceil(F.col("_n") / F.lit(max_bucket))
    chunked = (
        hashed
        .join(F.broadcast(counts), "bucket")
        .withColumn("chunk", chunk)
        .drop("_n")
    )
    a = chunked.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        F.col("_norm").alias("n_a"),
        "bucket", "chunk",
    )
    b = chunked.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        F.col("_norm").alias("n_b"),
        "bucket", "chunk",
    )
    dot = F.expr(DOT.format(a="emb_a", b="emb_b"))
    return (
        a.join(b, ["bucket", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(dot / (F.col("n_a") * F.col("n_b")), 4))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# ---------------------------------------------------------------------------
# product quantization (PQ): subspace codebooks + ADC search
# ---------------------------------------------------------------------------
#
# The classic memory-bound ANN compression (Jegou et al. 2011, "Product
# Quantization for Nearest Neighbor Search"): split each D-dim vector
# into M contiguous subvectors, train an independent k-codeword
# codebook per subspace (Lloyd's, L2), and store each vector as M small
# integer codes.  Search is Asymmetric Distance Computation (ADC): the
# raw query builds an M x K lookup table of squared subspace distances
# once, and every database vector's approximate distance is M table
# lookups — no float math per candidate.  At 10^12 vectors the codes
# table is ~M bytes/vector (vs 4D), the codebook and per-query LUTs are
# kilobytes riding a broadcast, and both training and assignment keep
# the corpus stationary (same discipline as ``kmeans_centroids``: the
# only exchanges are the (sub_id, code, pos) mean updates — bytes).
#
# Determinism mirrors the k-means contract so a SQL oracle reproduces
# it bit-for-bit: init = subvectors of the first K corpus vectors,
# assignment ranks round(L2, 6) ascending with lowest-code tie-break,
# centroid components round to 6dp between iterations, LUT entries
# round to 6dp and ADC sums round to 4dp.

N_PQ_SUBS = 4
N_PQ_CODES = 8

_SUBVECS = (
    "transform(sequence(0, {m1}), s -> "
    "slice(transform({vec}, x -> cast(x as double)), "
    "s * (size({vec}) div {m}) + 1, size({vec}) div {m}))"
)

_SUB_D2 = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "cast(0.0 as double), (a2, v) -> a2 + v)"
)


def _pq_subvecs_expr(n_subs: int, vec_col: str = "embedding") -> str:
    return _SUBVECS.format(m1=n_subs - 1, m=n_subs, vec=vec_col)


def _pq_cells_row(codebook: DataFrame) -> DataFrame:
    """The whole codebook as ONE broadcastable row, code-ascending (so
    a strict-< fold keeps the LOWEST code on rounded-distance ties —
    identical to the oracle's rank(d ASC, code ASC))."""
    return codebook.select(
        "sub_id", "code", F.col("centroid").alias("c")
    ).agg(
        F.expr(
            "array_sort(collect_list(struct(sub_id, code, c)))"
        ).alias("cells")
    )


def _pq_best_code(sub_ref: str, sv_ref: str, round_dp: int) -> str:
    """Min-distance fold over this subspace's codewords (projection)."""
    d2 = _SUB_D2.format(a=sv_ref, b="cb.c")
    return f"""
aggregate(
  transform(filter(cells, cb -> cb.sub_id = {sub_ref}),
            cb -> named_struct(
                'd', round(sqrt({d2}), {round_dp}),
                'code', cb.code)),
  named_struct('d', cast('Infinity' as double),
               'code', cast(-1 as bigint)),
  (acc, t) -> IF(t.d < acc.d, t, acc)
)"""


def pq_train(
    emb: DataFrame,
    n_subs: int = N_PQ_SUBS,
    n_codes: int = N_PQ_CODES,
    n_iters: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Train the M-subspace PQ codebook (Lloyd's per subspace, run for
    all subspaces simultaneously with sub_id as a grouping key).

    Per iteration the corpus subvector table is a narrow posexplode
    (M rows per vector, no exchange), the whole codebook rides as one
    broadcast row, and the argmin assignment is a pure projection; the
    only shuffles are the (sub_id, code, pos) mean aggregations —
    M x K x (D/M) = D x K partial rows per task, bytes at any corpus
    size.  At web scale train over a deterministic ``hash_sample`` and
    reuse the codebook corpus-wide (same note as kmeans_centroids).

    Returns ``(sub_id, code, centroid array<double>)``.  A codeword
    that captures no subvectors drops out (classic Lloyd's; identical
    in the SQL oracle).
    """
    sv = emb.select(
        "vec_id",
        F.posexplode(F.expr(_pq_subvecs_expr(n_subs))).alias(
            "sub_id", "sv"
        ),
    ).select(
        "vec_id", F.col("sub_id").cast("long").alias("sub_id"), "sv"
    )
    cents = sv.where(F.col("vec_id") < n_codes).select(
        "sub_id",
        F.col("vec_id").alias("code"),
        F.col("sv").alias("centroid"),
    )
    best = _pq_best_code("sub_id", "sv", round_dp) + ".code"
    for _ in range(n_iters):
        assigned = sv.join(F.broadcast(_pq_cells_row(cents))).select(
            "sub_id", F.expr(best).alias("code"), "sv"
        )
        means = (
            assigned.select(
                "sub_id", "code", F.posexplode("sv").alias("pos", "x")
            )
            .groupBy("sub_id", "code", "pos")
            .agg(F.round(F.avg("x"), round_dp).alias("m"))
        )
        cents = means.groupBy("sub_id", "code").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))),"
                " s -> s.m)"
            ).alias("centroid")
        )
    return cents.select("sub_id", "code", "centroid")


def pq_assign(
    emb: DataFrame,
    codebook: DataFrame,
    n_subs: int = N_PQ_SUBS,
    round_dp: int = 6,
    keep: tuple = (),
) -> DataFrame:
    """Encode every vector as M codes in ONE projection — no explode,
    no shuffle: (vec_id, codes array<bigint> ordered by sub_id).  This
    is the table a deployment persists (M bytes/vector instead of the
    raw floats) and every ADC consumer scans.  ``keep`` names extra
    input columns to carry through (e.g. the IVF cell_id)."""
    best = _pq_best_code("s", "svs[cast(s as int)]", round_dp) + ".code"
    codes = (
        f"transform(sequence(0, {n_subs - 1}), s -> {best})"
    )
    return (
        emb.withColumn("svs", F.expr(_pq_subvecs_expr(n_subs)))
        .join(F.broadcast(_pq_cells_row(codebook)))
        .select("vec_id", *keep, F.expr(codes).alias("codes"))
    )


def pq_codes(
    emb: DataFrame,
    codebook: DataFrame = None,
    n_subs: int = N_PQ_SUBS,
    n_codes: int = N_PQ_CODES,
    n_iters: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """The exploded scalar view of ``pq_assign`` — one row per
    (vec_id, sub_id, code), all BIGINT (the oracle-comparable shape;
    trains the codebook first if one isn't supplied)."""
    if codebook is None:
        codebook = pq_train(emb, n_subs, n_codes, n_iters, round_dp)
    return (
        pq_assign(emb, codebook, n_subs, round_dp)
        .select("vec_id", F.posexplode("codes").alias("sub_id", "code"))
        .select(
            "vec_id", F.col("sub_id").cast("long").alias("sub_id"), "code"
        )
    )


def pq_adc_topk(
    emb: DataFrame,
    codebook: DataFrame,
    codes: DataFrame = None,
    n_queries: int = 10,
    k: int = 5,
    n_subs: int = N_PQ_SUBS,
    round_dp: int = 6,
) -> DataFrame:
    """ADC top-k: approximate nearest neighbors from the codes table
    alone.  Each query subvector is scored against the codebook ONCE
    (the M x K LUT of squared subspace distances, rounded to 6dp);
    every database vector's distance is then a 4-entry filter+sum over
    the broadcast LUT — zero vector math per candidate, the codes
    table never shuffles (the only exchange is the per-query top-k
    window over candidate rows, same shape as ``cosine_topk``).

    Output: (q_id, vec_id, adist, rank) — adist = the ADC
    approximation of squared L2, rounded to 4dp, ties broken by
    vec_id.
    """
    if codes is None:
        codes = pq_assign(emb, codebook, n_subs, round_dp)
    d2 = _SUB_D2.format(a="svs[cast(s as int)]", b="cb.c")
    lut = f"""
flatten(transform(sequence(0, {n_subs - 1}), s ->
  transform(filter(cells, cb -> cb.sub_id = s),
            cb -> named_struct(
                'sub_id', cb.sub_id, 'code', cb.code,
                'd2', round({d2}, {round_dp})))))"""
    q_lut = (
        emb.where(F.col("vec_id") < n_queries)
        .withColumn("svs", F.expr(_pq_subvecs_expr(n_subs)))
        .join(F.broadcast(_pq_cells_row(codebook)))
        .select(F.col("vec_id").alias("q_id"), F.expr(lut).alias("lut"))
    )
    qrow = q_lut.agg(
        F.expr("array_sort(collect_list(struct(q_id, lut)))").alias("qs")
    )
    adist = (
        "round(aggregate("
        "filter(q.lut, e -> e.code = codes[cast(e.sub_id as int)]), "
        "cast(0.0 as double), (acc, e) -> acc + e.d2), 4)"
    )
    scored = (
        codes.join(F.broadcast(qrow))
        .select("vec_id", "codes", F.explode("qs").alias("q"))
        .select(
            "vec_id",
            F.col("q.q_id").alias("q_id"),
            F.expr(adist).alias("adist"),
        )
        .where(F.col("vec_id") != F.col("q_id"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "adist", "rank")
    )


def pq_recon_stats(
    emb: DataFrame,
    codebook: DataFrame,
    n_subs: int = N_PQ_SUBS,
    round_dp: int = 6,
) -> DataFrame:
    """Codebook-quality manifest: per subspace, how many vectors and
    the mean quantization distance (the number a pipeline monitors to
    decide when to retrain).  Same stationary-corpus shape as
    assignment; the aggregate exchanges M rows."""
    best_d = _pq_best_code("sub_id", "sv", round_dp) + ".d"
    sv = emb.select(
        "vec_id",
        F.posexplode(F.expr(_pq_subvecs_expr(n_subs))).alias(
            "sub_id", "sv"
        ),
    ).select(F.col("sub_id").cast("long").alias("sub_id"), "sv")
    return (
        sv.join(F.broadcast(_pq_cells_row(codebook)))
        .select("sub_id", F.expr(best_d).alias("d"))
        .groupBy("sub_id")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("d"), 4).alias("mean_dist"),
        )
    )


def ivf_residuals(
    emb: DataFrame,
    n_cells: int = N_IVF_CELLS,
    centroids: DataFrame = None,
) -> DataFrame:
    """Coarse-quantize and subtract: (vec_id, cell_id, embedding =
    vector − its cell centroid).  The residual table IVF-PQ encodes —
    residuals are much tighter than raw vectors, so the same code
    budget quantizes them far more accurately (Jegou et al. 2011 §IV).
    Centroid subtraction is exact double arithmetic (no rounding
    needed for cross-engine parity); a deployment materializes this
    table once alongside the codes."""
    assigned = _ivf_scored(emb, n_cells, centroids=centroids).where(
        F.col("rn") == 1
    )
    if centroids is None:
        cents = emb.where(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell_id"),
            F.expr(
                "transform(embedding, x -> cast(x as double))"
            ).alias("c_emb"),
        )
    else:
        cents = centroids.select(
            "cell_id", F.col("centroid").alias("c_emb")
        )
    return assigned.join(F.broadcast(cents), "cell_id").select(
        "vec_id",
        "cell_id",
        F.expr(
            "zip_with(embedding, c_emb, (x, y) -> cast(x as double) - y)"
        ).alias("embedding"),
    )


def ivfpq_topk(
    emb: DataFrame,
    residuals: DataFrame = None,
    codebook: DataFrame = None,
    n_cells: int = N_IVF_CELLS,
    n_queries: int = 10,
    q_lo: int = None,
    k: int = 5,
    n_subs: int = N_PQ_SUBS,
    n_codes: int = N_PQ_CODES,
    n_iters: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """IVF-PQ search (the FAISS-style IVFADC index, end to end):
    coarse-assign every vector to a cell, PQ-encode its RESIDUAL with
    one codebook shared across cells, then answer queries by probing
    the query's own cell and ADC-scoring only that cell's compressed
    codes.  The web-scale serving shape for 10^12 vectors: the index
    is (cell_id, M codes) per vector — a few bytes — the codebook and
    per-query LUTs ride broadcasts, and a query touches ~1/n_cells of
    the codes table (partition the codes table by cell_id and the
    probe prunes partitions).

    Queries default to the ``n_queries`` vectors AFTER the coarse
    stand-in centroids (``q_lo = n_cells``): the first ``n_cells``
    vectors ARE the centroids, so their residuals are exactly zero and
    every query would build the identical LUT — a degenerate probe.

    Output: (q_id, vec_id, adist, rank) — ADC approximation of the
    residual-space squared L2 within the probed cell, 4dp, vec_id
    tie-break."""
    if residuals is None:
        residuals = ivf_residuals(emb, n_cells)
    if codebook is None:
        codebook = pq_train(
            residuals.select("vec_id", "embedding"),
            n_subs, n_codes, n_iters, round_dp,
        )
    codes = pq_assign(
        residuals, codebook, n_subs, round_dp, keep=("cell_id",)
    )
    d2 = _SUB_D2.format(a="svs[cast(s as int)]", b="cb.c")
    lut = f"""
flatten(transform(sequence(0, {n_subs - 1}), s ->
  transform(filter(cells, cb -> cb.sub_id = s),
            cb -> named_struct(
                'sub_id', cb.sub_id, 'code', cb.code,
                'd2', round({d2}, {round_dp})))))"""
    if q_lo is None:
        q_lo = n_cells
    q_lut = (
        residuals.where(
            (F.col("vec_id") >= q_lo)
            & (F.col("vec_id") < q_lo + n_queries)
        )
        .withColumn("svs", F.expr(_pq_subvecs_expr(n_subs)))
        .join(F.broadcast(_pq_cells_row(codebook)))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("cell_id").alias("q_cell"),
            F.expr(lut).alias("lut"),
        )
    )
    qrow = q_lut.agg(
        F.expr(
            "array_sort(collect_list(struct(q_id, q_cell, lut)))"
        ).alias("qs")
    )
    adist = (
        "round(aggregate("
        "filter(q.lut, e -> e.code = codes[cast(e.sub_id as int)]), "
        "cast(0.0 as double), (acc, e) -> acc + e.d2), 4)"
    )
    scored = (
        codes.join(F.broadcast(qrow))
        .select("vec_id", "cell_id", "codes", F.explode("qs").alias("q"))
        .where(
            (F.col("q.q_cell") == F.col("cell_id"))
            & (F.col("vec_id") != F.col("q.q_id"))
        )
        .select(
            "vec_id",
            F.col("q.q_id").alias("q_id"),
            F.expr(adist).alias("adist"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "adist", "rank")
    )
