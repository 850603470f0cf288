"""The distributed extraction pipeline.

Design (SURVEY.md §3.1, §4):

* **Shuffle-free core.** Each input row is one complete document, so
  parse + extract is embarrassingly parallel ``mapInPandas`` — no groupBy,
  no join, no shuffle in the hot path.  At 100 TB the only data movement
  is the parquet scan and the partitioned write.
* **Vectorized kernels.** Arrow batches in, numpy per-document kernels
  inside (``kernel/``), Arrow batches out.  No per-row Python UDFs.
* **Per-document error containment.** Reference exceptions
  (exceptions.py:1-52) become ``status/error`` columns; a poisoned
  document never kills a stage.
* **Skew handling.** AQE covers shuffle skew, but pathological documents
  (bigdoc/bigmedia families) skew *kernel compute*, which AQE cannot see:
  heavy docs (``size(spans) > heavy_threshold``) are split off and
  round-robin repartitioned so no task gets two of them; light docs flow
  straight from file splits (no shuffle).
* **Checkpoint/resume.** Docs are routed to ``bucket =
  pmod(xxhash64(doc_id), num_buckets)``; the job runs in waves of
  buckets, each wave committed via dynamic partition overwrite (retries
  idempotent) plus a lineage row per bucket.  Resume anti-joins completed
  buckets — completed splits are never reprocessed (BASELINE.md).
"""

from __future__ import annotations

import time
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .errors import DocError
from .kernel.doc import Doc
from .kernel.parse import doc_from_spans
from .kernel.recipes import recipe_for
from .schema import (
    ELEMENTS_SCHEMA,
    EXTRACTED_BUCKETED_SCHEMA,
    EXTRACTED_SCHEMA,
    LINEAGE_SCHEMA,
)

# ---------------------------------------------------------------------------
# parse: documents(doc_id, spans) -> exploded elements
# ---------------------------------------------------------------------------


def _doc_to_element_columns(doc: Doc) -> dict:
    n = doc.n
    return {
        "doc_id": np.repeat(doc.doc_id, n),
        "idx": np.arange(n, dtype=np.int64),
        "page_number": doc.page,
        "page_width": np.asarray([doc.page_width(int(p)) for p in doc.page]),
        "page_height": np.asarray([doc.page_height(int(p)) for p in doc.page]),
        "x0": doc.x0,
        "x1": doc.x1,
        "y0": doc.y0,
        "y1": doc.y1,
        "text": doc.text_stripped,
        "font_name": doc.font_name,
        "font_size": doc.font_size,
        "font": doc.font,
        "kind": doc.kind,
        "media_ref": doc.media_ref,
    }


def parse_elements_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """One Arrow batch of (doc_id, spans) -> element rows (pure pandas)."""
    cols: dict = {name: [] for name in (
        "doc_id", "idx", "page_number", "page_width", "page_height",
        "x0", "x1", "y0", "y1", "text", "font_name", "font_size", "font",
        "kind", "media_ref",
    )}
    for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
        try:
            doc = doc_from_spans(doc_id, spans)
        except DocError:
            continue  # parse-stage errors surface via extract_spans status
        for k, v in _doc_to_element_columns(doc).items():
            cols[k].append(v)
    if not cols["doc_id"]:
        return pd.DataFrame(
            {f.name: pd.Series(dtype=object) for f in ELEMENTS_SCHEMA.fields}
        )
    out = {k: np.concatenate(v) for k, v in cols.items()}
    n = len(out["doc_id"])
    out["tags"] = [[] for _ in range(n)]
    out["ignored"] = np.zeros(n, dtype=bool)
    return pd.DataFrame(out)


def parse_elements(docs_df: DataFrame) -> DataFrame:
    """documents -> elements DataFrame (the §1.2 working table)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield parse_elements_batch(pdf)

    return docs_df.select("doc_id", "spans").mapInPandas(gen, ELEMENTS_SCHEMA)


# ---------------------------------------------------------------------------
# extract: documents -> output spans (the full per-doc recipe)
# ---------------------------------------------------------------------------


def extract_batch(pdf: pd.DataFrame, passthrough: List[str]) -> pd.DataFrame:
    rows = {
        "doc_id": [], "spans": [], "n_spans": [], "status": [], "error": [],
        **{c: [] for c in passthrough},
    }
    for pos, (doc_id, spans) in enumerate(zip(pdf["doc_id"], pdf["spans"])):
        try:
            doc = doc_from_spans(doc_id, spans)
            recipe = recipe_for(doc_id)
            out = recipe(doc)
            out_spans = [
                {"kind": k, "text": t, "media_ref": m, "order": o}
                for o, (k, t, m) in enumerate(out)
            ]
            rows["spans"].append(out_spans)
            rows["n_spans"].append(len(out_spans))
            rows["status"].append("ok")
            rows["error"].append(None)
        except DocError as err:
            rows["spans"].append([])
            rows["n_spans"].append(0)
            rows["status"].append("error")
            rows["error"].append(f"{type(err).__name__}: {err}")
        rows["doc_id"].append(doc_id)
        for c in passthrough:
            rows[c].append(pdf[c].iloc[pos])
    return pd.DataFrame(rows)


def extract_spans(
    spark: SparkSession, docs_df: DataFrame, with_bucket: bool = False
) -> DataFrame:
    """documents -> extracted(doc_id, spans, n_spans, status, error)."""
    passthrough = ["bucket"] if with_bucket else []
    schema = EXTRACTED_BUCKETED_SCHEMA if with_bucket else EXTRACTED_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_batch(pdf, passthrough)

    cols = ["doc_id", "spans"] + passthrough
    return docs_df.select(*cols).mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# skew: cost-aware rebalancing (AQE can't see kernel compute skew)
# ---------------------------------------------------------------------------


def rebalance(
    docs_df: DataFrame,
    heavy_threshold: int = 512,
    heavy_partitions: Optional[int] = None,
) -> DataFrame:
    """Split pathological documents onto their own tasks.

    Light docs keep their scan partitioning (no shuffle — at 100 TB a
    full-corpus repartition would dominate the job).  Heavy docs
    (span-count above threshold) are round-robin repartitioned so each
    lands on its own task; within a wave that bounds straggler time to
    ~one heavy doc.
    """
    cost = F.size("spans")
    parallelism = docs_df.sparkSession.sparkContext.defaultParallelism
    light = docs_df.where(cost <= heavy_threshold)
    # Small inputs (few scan splits) underuse the cluster: bump light-doc
    # partitions up to the parallelism floor.  At scale (splits >= cores)
    # this branch never triggers and light docs stay shuffle-free.
    if docs_df.rdd.getNumPartitions() < parallelism:
        light = light.repartition(parallelism * 2)
    heavy = docs_df.where(cost > heavy_threshold)
    if heavy_partitions is None:
        heavy_partitions = parallelism
    return light.unionByName(heavy.repartition(heavy_partitions))


# ---------------------------------------------------------------------------
# checkpointed job: waves of buckets + lineage + idempotent resume
# ---------------------------------------------------------------------------


def completed_buckets(spark: SparkSession, output_dir: str) -> List[int]:
    try:
        lineage = spark.read.parquet(f"{output_dir}/_lineage")
    except Exception:
        return []
    rows = lineage.where(F.col("status") == "ok").select("bucket").distinct()
    return [r["bucket"] for r in rows.collect()]


def _attempts_so_far(spark: SparkSession, output_dir: str) -> dict:
    try:
        lineage = spark.read.parquet(f"{output_dir}/_lineage")
    except Exception:
        return {}
    rows = (
        lineage.groupBy("bucket").agg(F.max("attempt").alias("a")).collect()
    )
    return {r["bucket"]: r["a"] for r in rows}


def run_job(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    num_buckets: int = 64,
    num_waves: int = 4,
    heavy_threshold: int = 512,
    fail_buckets: Optional[List[int]] = None,
) -> dict:
    """Checkpointed extraction: resume-safe, skew-aware.

    ``fail_buckets`` injects a failure for those buckets (testing only:
    proves failed waves don't poison completed ones and resume
    reprocesses only the failed buckets).

    Returns run stats {processed_buckets, skipped_buckets, docs, errors}.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    docs = spark.read.parquet(input_path).withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)).cast("int")
    )

    done = set(completed_buckets(spark, output_dir))
    attempts = _attempts_so_far(spark, output_dir)
    todo = [b for b in range(num_buckets) if b not in done]
    waves: List[List[int]] = [
        todo[w::num_waves] for w in range(num_waves) if todo[w::num_waves]
    ]

    stats = {"processed_buckets": 0, "skipped_buckets": len(done), "docs": 0,
             "errors": 0}
    for wave in waves:
        t0 = time.time()
        wave_docs = docs.where(F.col("bucket").isin(wave))
        wave_docs = rebalance(wave_docs, heavy_threshold=heavy_threshold)
        attempt_nums = {b: attempts.get(b, 0) + 1 for b in wave}
        try:
            if fail_buckets and set(wave) & set(fail_buckets):
                raise RuntimeError(f"injected failure in wave {wave}")
            extracted = extract_spans(spark, wave_docs, with_bucket=True)
            # Dynamic partition overwrite: re-running a wave replaces only
            # its own bucket partitions — idempotent retries.
            extracted.write.partitionBy("bucket").mode("overwrite").parquet(
                f"{output_dir}/extracted"
            )
            wall_ms = int((time.time() - t0) * 1000)
            summary = (
                spark.read.parquet(f"{output_dir}/extracted")
                .where(F.col("bucket").isin(wave))
                .groupBy("bucket")
                .agg(
                    F.count("*").alias("doc_count"),
                    F.sum("n_spans").alias("element_count"),
                    F.sum(
                        F.when(F.col("status") == "error", 1).otherwise(0)
                    ).alias("error_count"),
                )
                .collect()
            )
            lineage_rows = [
                (
                    int(r["bucket"]), int(r["doc_count"]),
                    int(r["element_count"]), int(r["error_count"]), "ok",
                    attempt_nums[int(r["bucket"])], wall_ms,
                )
                for r in summary
            ]
            stats["processed_buckets"] += len(wave)
            stats["docs"] += sum(r["doc_count"] for r in summary)
            stats["errors"] += sum(r["error_count"] for r in summary)
        except Exception:
            wall_ms = int((time.time() - t0) * 1000)
            lineage_rows = [
                (b, 0, 0, 0, "failed", attempt_nums[b], wall_ms) for b in wave
            ]
            spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(f"{output_dir}/_lineage")
            raise
        spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(f"{output_dir}/_lineage")
    return stats
