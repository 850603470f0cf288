"""Round-3 experiment: cheapen td_ngram_jaccard_pairs at sf0.1.

Variants (all must produce IDENTICAL pair sets for A/B; C is the
LSH-prefiltered operator with its own semantics):
  A) current: both sides emit shingle rows at {blk, blk+1}, meet at
     greatest(oblk_a, oblk_b)
  B) asymmetric emit: probe side emits {blk, blk+1}, build side stays
     at {blk}; same-block orientation kept once via doc_id order
  C) LSH candidates (existing banding) -> exact Jaccard verify on
     candidates only

Interleaved rounds, median reported.
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from py_pdf_parser_spark.session import get_spark
from py_pdf_parser_spark.textops import dedup

SF_DIR = "/root/testdata/sf0.1"
N, THRESHOLD, BLOCK = 3, 0.5, 16


def variant_a(docs):
    return dedup.ngram_jaccard_pairs(docs)


def variant_b(docs):
    blocked = docs.withColumn(
        "oblk", (F.length("text") / BLOCK).cast("long")
    )
    rows = dedup.shingle_rows(blocked, N, keep=("oblk",), distinct=True)
    base = rows.withColumn(
        "nd", F.count("*").over(Window.partitionBy("doc_id"))
    )
    probe = base.withColumn(
        "blk",
        F.explode(F.array(F.col("oblk"), F.col("oblk") + F.lit(1))),
    )
    a = probe.alias("a")
    b = base.withColumn("blk", F.col("oblk")).alias("b")
    pairs = (
        a.join(b, ["blk", "h"])
        .where(
            (F.col("a.doc_id") != F.col("b.doc_id"))
            & (
                (F.col("a.oblk") != F.col("b.oblk"))
                | (F.col("a.doc_id") < F.col("b.doc_id"))
            )
        )
        .groupBy(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .agg(
            F.count("*").alias("ni"),
            F.first("a.nd").alias("na_"),
            F.first("b.nd").alias("nb_"),
        )
    )
    # na_/nb_ are per-orientation; recompute properly: na must belong to
    # doc_a.  first() per group is fine in A because doc_a is always the
    # 'a' side there; here least/greatest mixes sides, so join counts
    # back instead.
    counts = base.select("doc_id", "nd").dropDuplicates(["doc_id"])
    out = (
        pairs.drop("na_", "nb_")
        .join(counts.select(F.col("doc_id").alias("doc_a"),
                            F.col("nd").alias("na")), "doc_a")
        .join(counts.select(F.col("doc_id").alias("doc_b"),
                            F.col("nd").alias("nb")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni")), 4),
        )
        .where(F.col("jaccard") >= THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def variant_c(docs):
    cands = dedup.lsh_candidate_pairs(docs)
    rows = dedup.shingle_rows(docs, N, distinct=True)
    counts = rows.groupBy("doc_id").agg(F.count("*").alias("nd"))
    ra = rows.select(F.col("doc_id").alias("doc_a"), "h")
    rb = rows.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        cands.join(ra, "doc_a")
        .join(rb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ni"))
    )
    return (
        inter.join(counts.select(F.col("doc_id").alias("doc_a"),
                                 F.col("nd").alias("na")), "doc_a")
        .join(counts.select(F.col("doc_id").alias("doc_b"),
                            F.col("nd").alias("nb")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni")), 4),
        )
        .where(F.col("jaccard") >= THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def main():
    spark = get_spark(cores=32, app_name="exp-jaccard")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .repartition(32)
        .persist()
    )
    docs.count()

    variants = {"A": variant_a, "B": variant_b, "C": variant_c}
    # correctness first: A == B pair sets; C recall vs A
    sets = {}
    for k, fn in variants.items():
        sets[k] = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in fn(docs).collect()
        }
    print("A rows", len(sets["A"]), "B rows", len(sets["B"]),
          "C rows", len(sets["C"]))
    print("A==B:", sets["A"] == sets["B"])
    print("C recall vs A:", len(sets["C"] & sets["A"]) / max(len(sets["A"]), 1),
          "C extra:", len(sets["C"] - sets["A"]))

    times = {k: [] for k in variants}
    for _ in range(4):
        for k, fn in variants.items():
            t0 = time.time()
            fn(docs).count()
            times[k].append(time.time() - t0)
    for k, ts in times.items():
        print(k, "median", round(statistics.median(ts), 3),
              [round(t, 2) for t in ts])
    spark.stop()


if __name__ == "__main__":
    main()
