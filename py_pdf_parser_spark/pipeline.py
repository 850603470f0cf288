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
from typing import Iterator, List, Optional, Tuple

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .errors import DocError
from .kernel.parse import doc_from_arrays
from .kernel.recipes import recipe_for
from .schema import (
    ELEMENTS_SCHEMA,
    EXTRACTED_BUCKETED_SCHEMA,
    EXTRACTED_SCHEMA,
    LINEAGE_SCHEMA,
)

# ---------------------------------------------------------------------------
# Arrow batch plumbing.  The hot path is mapInArrow: span structs are
# flattened to columnar arrays ONCE per batch (C-level); per-document
# kernels get numpy slices; output span sequences are reassembled into a
# ListArray(StructArray) directly from flat arrays — zero per-span Python
# objects in either direction.
# ---------------------------------------------------------------------------


def _flatten_span_batch(batch: pa.RecordBatch):
    """-> (doc_ids, list_offsets, kind/text/ref/off flat arrays)."""
    doc_ids = batch.column(0).to_pylist()
    spans = batch.column(1)
    offs = spans.offsets.to_numpy()
    vals = spans.values
    kinds = vals.field("kind").to_numpy(zero_copy_only=False)
    texts = vals.field("text").to_numpy(zero_copy_only=False)
    refs = vals.field("media_ref").to_numpy(zero_copy_only=False)
    offsets = vals.field("offset").to_numpy(zero_copy_only=False)
    return doc_ids, offs, kinds, texts, refs, offsets


def _iter_docs(batch: pa.RecordBatch, config: dict = None):
    """Yield (pos, doc_id, Doc-or-DocError) per document in the batch."""
    doc_ids, offs, kinds, texts, refs, offsets = _flatten_span_batch(batch)
    for pos, doc_id in enumerate(doc_ids):
        lo, hi = offs[pos], offs[pos + 1]
        try:
            doc = doc_from_arrays(
                doc_id, kinds[lo:hi], texts[lo:hi], refs[lo:hi],
                offsets[lo:hi], config=config,
            )
        except DocError as err:
            yield pos, doc_id, err
            continue
        yield pos, doc_id, doc


# ---------------------------------------------------------------------------
# parse: documents(doc_id, spans) -> exploded elements
# ---------------------------------------------------------------------------

_ELEMENTS_ARROW = pa.schema(
    [
        ("doc_id", pa.string()),
        ("idx", pa.int64()),
        ("page_number", pa.int64()),
        ("page_width", pa.float64()),
        ("page_height", pa.float64()),
        ("x0", pa.float64()),
        ("x1", pa.float64()),
        ("y0", pa.float64()),
        ("y1", pa.float64()),
        ("text", pa.string()),
        ("text_raw", pa.string()),
        ("font_name", pa.string()),
        ("font_size", pa.float64()),
        ("font", pa.string()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("tags", pa.list_(pa.string())),
        ("ignored", pa.bool_()),
    ]
)


def pack_elements_batch(docs) -> pa.RecordBatch:
    """Pack (doc_id, Doc) pairs into one ELEMENTS_SCHEMA RecordBatch.

    Shared by the spans parse path (parse_elements) and the byte-stream
    loader (sources.pdf_bytes): any producer of kernel Docs gets the
    same Arrow element rows."""
    cols = {name: [] for name in (
        "doc_id", "idx", "page_number", "page_width", "page_height",
        "x0", "x1", "y0", "y1", "text", "text_raw", "font_name",
        "font_size", "font", "kind", "media_ref",
    )}
    for doc_id, doc in docs:
        n = doc.n
        pw, ph = doc._page_width, doc._page_height
        cols["doc_id"].append(np.full(n, doc_id, dtype=object))
        cols["idx"].append(np.arange(n, dtype=np.int64))
        cols["page_number"].append(doc.page)
        cols["page_width"].append(
            np.full(n, pw) if not isinstance(pw, dict)
            else np.asarray([pw[int(p)] for p in doc.page])
        )
        cols["page_height"].append(
            np.full(n, ph) if not isinstance(ph, dict)
            else np.asarray([ph[int(p)] for p in doc.page])
        )
        cols["x0"].append(doc.x0)
        cols["x1"].append(doc.x1)
        cols["y0"].append(doc.y0)
        cols["y1"].append(doc.y1)
        cols["text"].append(doc.text_stripped)
        cols["text_raw"].append(doc.text_raw)
        cols["font_name"].append(doc.font_name)
        cols["font_size"].append(doc.font_size)
        cols["font"].append(doc.font)
        cols["kind"].append(doc.kind)
        cols["media_ref"].append(doc.media_ref)
    if cols["doc_id"]:
        flat = {k: np.concatenate(v) for k, v in cols.items()}
        n_rows = len(flat["doc_id"])
    else:
        flat = {k: np.empty(0, dtype=object) for k in cols}
        n_rows = 0
    arrays = [
        pa.array(flat[f.name], type=f.type, from_pandas=True)
        for f in _ELEMENTS_ARROW
        if f.name not in ("tags", "ignored")
    ]
    empty_tags = pa.ListArray.from_arrays(
        pa.array(np.zeros(n_rows + 1, dtype=np.int32)),
        pa.array([], type=pa.string()),
    )
    arrays.append(empty_tags)
    arrays.append(pa.array(np.zeros(n_rows, dtype=bool)))
    return pa.RecordBatch.from_arrays(arrays, schema=_ELEMENTS_ARROW)


def parse_elements_arrow_batch(
    batch: pa.RecordBatch, config: dict = None
) -> pa.RecordBatch:
    return pack_elements_batch(
        (doc_id, doc)
        for _, doc_id, doc in _iter_docs(batch, config)
        # parse-stage errors surface via extract_spans status
        if not isinstance(doc, DocError)
    )


def parse_elements(docs_df: DataFrame, config: dict = None) -> DataFrame:
    """documents -> elements DataFrame (the §1.2 working table).

    ``config`` overrides per-document parse settings (components.py:386-397):
    ``element_ordering`` (preset name or callable — the reference's custom
    ordering UDF hook, components.py:409-413), ``font_mapping`` /
    ``font_mapping_is_regex`` / ``regex_flags`` / ``font_size_precision``.
    """

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            yield parse_elements_arrow_batch(batch, config)

    return docs_df.select("doc_id", "spans").mapInArrow(gen, ELEMENTS_SCHEMA)


# ---------------------------------------------------------------------------
# extract: documents -> output spans (the full per-doc recipe)
# ---------------------------------------------------------------------------

_EXTRACT_ARROW_FIELDS = [
    ("doc_id", pa.string()),
    (
        "spans",
        pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("order", pa.int32()),
                ]
            )
        ),
    ),
    ("n_spans", pa.int64()),
    ("status", pa.string()),
    ("error", pa.string()),
]


def extract_arrow_batch(
    batch: pa.RecordBatch, passthrough: List[str]
) -> pa.RecordBatch:
    return pack_extracted_batch(
        ((doc_id, doc) for _pos, doc_id, doc in _iter_docs(batch)),
        batch.num_rows,
        batch,
        passthrough,
    )


def pack_extracted_batch(
    pairs,
    num_rows: int,
    batch: Optional[pa.RecordBatch] = None,
    passthrough: Optional[List[str]] = None,
) -> pa.RecordBatch:
    """(doc_id, Doc-or-DocError) pairs -> EXTRACTED_SCHEMA RecordBatch.

    Shared by the spans path (extract_arrow_batch) and the byte-stream
    path (sources.pdf_bytes.extract_spans_from_pdf): one recipe run per
    document, per-doc error isolation, output order = position in the
    recipe's emitted sequence."""
    passthrough = passthrough or []
    doc_ids: List[str] = []
    statuses: List[str] = []
    errors: List[Optional[str]] = []
    out_kind: List[str] = []
    out_text: List[Optional[str]] = []
    out_ref: List[Optional[str]] = []
    list_offs = np.zeros(num_rows + 1, dtype=np.int32)
    counts = np.zeros(num_rows, dtype=np.int64)

    row = 0
    for doc_id, doc in pairs:
        doc_ids.append(doc_id)
        if isinstance(doc, Exception):  # DocError, or any byte-path error
            statuses.append("error")
            errors.append(f"{type(doc).__name__}: {doc}")
        else:
            try:
                out = recipe_for(doc_id)(doc)
                if out:
                    ks, ts, ms = zip(*out)
                    out_kind.extend(ks)
                    out_text.extend(ts)
                    out_ref.extend(ms)
                    counts[row] = len(out)
                statuses.append("ok")
                errors.append(None)
            except DocError as err:
                statuses.append("error")
                errors.append(f"{type(err).__name__}: {err}")
        list_offs[row + 1] = list_offs[row] + counts[row]
        row += 1

    total = int(list_offs[-1])
    # order = position within each document's output sequence.
    order = np.arange(total, dtype=np.int32) - np.repeat(
        list_offs[:-1].astype(np.int64), counts
    ).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(out_kind, type=pa.string()),
            pa.array(out_text, type=pa.string()),
            pa.array(out_ref, type=pa.string()),
            pa.array(order),
        ],
        names=["kind", "text", "media_ref", "order"],
    )
    spans_arr = pa.ListArray.from_arrays(pa.array(list_offs), struct)
    arrays = [
        pa.array(doc_ids, type=pa.string()),
        spans_arr,
        pa.array(counts),
        pa.array(statuses, type=pa.string()),
        pa.array(errors, type=pa.string()),
    ]
    names = [n for n, _ in _EXTRACT_ARROW_FIELDS]
    for col in passthrough:
        arrays.append(batch.column(batch.schema.get_field_index(col)))
        names.append(col)
    return pa.RecordBatch.from_arrays(arrays, names=names)


def extract_spans(
    spark: SparkSession, docs_df: DataFrame, with_bucket: bool = False
) -> DataFrame:
    """documents -> extracted(doc_id, spans, n_spans, status, error)."""
    passthrough = ["bucket"] if with_bucket else []
    schema = EXTRACTED_BUCKETED_SCHEMA if with_bucket else EXTRACTED_SCHEMA

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            yield extract_arrow_batch(batch, passthrough)

    cols = ["doc_id", "spans"] + passthrough
    return docs_df.select(*cols).mapInArrow(gen, schema)


def materialize_elements(
    spark: SparkSession, docs_path: str, out_path: str,
    bucket_by_doc: int = 0,
) -> str:
    """Parse once, query many: write the exploded elements table.

    Catalyst cannot prune columns or push filters through the mapInArrow
    parse kernel, so every ElementFrame query over raw documents re-runs
    the parse (twice for anchor joins).  The deployment-shape fix is a
    materialized elements table: filters and projections then push all
    the way into the parquet scan, and min/max row-group stats prune
    pages/fonts for free.  Optionally bucketed by doc_id so per-doc
    set-algebra joins co-locate without a shuffle.
    """
    tune_scan_splits(spark, docs_path)
    elements = parse_elements(spark.read.parquet(docs_path))
    if bucket_by_doc:
        (
            elements.write.mode("overwrite")
            .bucketBy(bucket_by_doc, "doc_id")
            .sortBy("doc_id", "idx")
            .option("path", out_path)
            .saveAsTable("elements_bucketed")
        )
    else:
        elements.write.mode("overwrite").parquet(out_path)
    return out_path


# ---------------------------------------------------------------------------
# skew: cost-aware rebalancing (AQE can't see kernel compute skew)
# ---------------------------------------------------------------------------


def tune_scan_splits(
    spark: SparkSession, input_path: str, tasks_per_core: int = 4,
    replicate: int = 1,
) -> None:
    """Size parquet scan splits so the job gets ~tasks_per_core tasks/core.

    Shuffle-free parallelism: measured on this box, repartitioning the
    corpus caps extraction at ~21k docs/s (disk shuffle) / ~37k (tmpfs)
    vs ~61k with fine scan splits and no shuffle.  At 100 TB the default
    128 MB split already yields ~1M tasks, so the adaptive value is
    capped there and this is a no-op; it only matters for small inputs.

    Local paths only use os.walk; on a cluster the same computation runs
    against the Hadoop FileSystem listing.
    """
    import os

    total = 0
    for root, _, files in os.walk(input_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    total *= max(replicate, 1)
    cores = spark.sparkContext.defaultParallelism
    split = max(1 << 20, min(128 << 20, total // max(cores * tasks_per_core, 1)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    spark.conf.set("spark.sql.files.openCostInBytes", str(min(split, 4 << 20)))


def rebalance(
    docs_df: DataFrame,
    heavy_threshold: int = 512,
    heavy_partitions: Optional[int] = None,
) -> DataFrame:
    """Split pathological documents onto their own tasks.

    Light docs ALWAYS keep their scan partitioning — a full-corpus
    repartition caps throughput at the shuffle, measured ~3x slower than
    shuffle-free scan splits (see tune_scan_splits).  Heavy docs
    (span-count above threshold) are a tiny fraction by count and are
    round-robin repartitioned so no task gets more than ~one of them.
    """
    cost = _doc_cost(docs_df)
    parallelism = docs_df.sparkSession.sparkContext.defaultParallelism
    light = docs_df.where(cost <= heavy_threshold)
    heavy = docs_df.where(cost > heavy_threshold)
    if heavy_partitions is None:
        heavy_partitions = parallelism
    return light.unionByName(heavy.repartition(heavy_partitions))


def _doc_cost(docs_df: DataFrame):
    """Per-document cost for the skew split.

    Prefer the ingest-persisted ``n_spans`` top-level column: it is a
    stats-prunable parquet predicate, so the light and heavy branch
    scans skip each other's files/row-groups (combined I/O ~= one
    corpus read).  ``size(spans)`` is the fallback for inputs without
    it — correct, but each branch then reads the full corpus.
    """
    if "n_spans" in docs_df.columns:
        return F.col("n_spans")
    return F.size("spans")


def extract_spans_rebalanced(
    spark: SparkSession,
    docs_df: DataFrame,
    heavy_threshold: int = 2048,
    heavy_partitions: Optional[int] = None,
    with_bucket: bool = False,
) -> DataFrame:
    """Skew-aware extraction: per-branch kernels, union AFTER extraction.

    ``rebalance()`` + one kernel puts the heavy branch's exchange UNDER
    the union, so the combined kernel stage cannot start until the heavy
    pre-scan finishes — the two corpus scans serialize (measured 4x
    slower than plain on a mildly-skewed corpus).  Extracting each
    branch separately keeps the stages independent: Spark runs the light
    scan+kernel CONCURRENTLY with the heavy scan+shuffle, so the second
    scan hides behind the first and only genuinely pathological docs
    (span count > threshold, ~0.5%% of a crawl) pay a (tiny) shuffle.

    With the ingest-persisted ``n_spans`` column (see ``_doc_cost``),
    the branch predicates push to parquet stats: the heavy scan opens
    only row-groups whose max(n_spans) exceeds the threshold and the
    light scan skips exactly those, so the two branches read DISJOINT
    bytes — combined I/O is one corpus read, not two.
    """
    cost = _doc_cost(docs_df)
    if heavy_partitions is None:
        heavy_partitions = spark.sparkContext.defaultParallelism
    light = docs_df.where(cost <= heavy_threshold)
    heavy = docs_df.where(cost > heavy_threshold).repartition(heavy_partitions)
    return extract_spans(spark, light, with_bucket=with_bucket).unionByName(
        extract_spans(spark, heavy, with_bucket=with_bucket)
    )


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
    heavy_threshold: int = 2048,
    fail_buckets: Optional[List[int]] = None,
) -> dict:
    """Checkpointed extraction: resume-safe, skew-aware.

    ``fail_buckets`` injects a failure for those buckets (testing only:
    proves failed waves don't poison completed ones and resume
    reprocesses only the failed buckets).

    Returns run stats {processed_buckets, skipped_buckets, docs, errors}.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tune_scan_splits(spark, input_path)
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
        attempt_nums = {b: attempts.get(b, 0) + 1 for b in wave}
        try:
            if fail_buckets and set(wave) & set(fail_buckets):
                raise RuntimeError(f"injected failure in wave {wave}")
            extracted = extract_spans_rebalanced(
                spark, wave_docs, heavy_threshold=heavy_threshold,
                with_bucket=True,
            )
            # Per-bucket lineage metrics ride on the write itself via
            # observe(): at 100 TB a read-back of everything just
            # written would be a second full corpus scan per wave.
            from pyspark.sql import Observation

            obs = Observation()
            aggs = []
            for b in wave:
                c = F.col("bucket") == b
                aggs.append(
                    F.sum(F.when(c, 1).otherwise(0)).alias(f"dc_{b}")
                )
                aggs.append(
                    F.sum(F.when(c, F.col("n_spans")).otherwise(0)).alias(
                        f"ec_{b}"
                    )
                )
                aggs.append(
                    F.sum(
                        F.when(c & (F.col("status") == "error"), 1)
                        .otherwise(0)
                    ).alias(f"er_{b}")
                )
            extracted = extracted.observe(obs, *aggs)
            # Dynamic partition overwrite: re-running a wave replaces only
            # its own bucket partitions — idempotent retries.
            extracted.write.partitionBy("bucket").mode("overwrite").parquet(
                f"{output_dir}/extracted"
            )
            wall_ms = int((time.time() - t0) * 1000)
            m = obs.get
            lineage_rows = [
                (
                    b, int(m[f"dc_{b}"] or 0), int(m[f"ec_{b}"] or 0),
                    int(m[f"er_{b}"] or 0), "ok", attempt_nums[b], wall_ms,
                )
                for b in wave
            ]
            stats["processed_buckets"] += len(wave)
            stats["docs"] += sum(r[1] for r in lineage_rows)
            stats["errors"] += sum(r[3] for r in lineage_rows)
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
