"""Structured Streaming wrapper around the extraction pipeline.

The reference has no streaming (SURVEY.md §2.10); the batch kernels are
pure, so the identical extraction runs under ``foreachBatch`` for
continuous ingestion of newly-landed document files.  Checkpointing is
Spark's own stream checkpoint (offsets) — per-batch output is appended,
and the batch kernel's per-document error containment carries over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .schema import DOCUMENTS_SCHEMA


def read_document_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of document parquet drops."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "ev_windowed_counts",
    watermark: str = "10 minutes",
):
    """Streaming tumbling-window aggregation with event-time watermark.

    The same ``events.windowed_counts`` transformation as batch, under a
    ``withWatermark`` prefix: Spark keeps window state only until the
    watermark passes the window end, so state is bounded however long
    the stream runs — the late-data/stateful-agg path of SURVEY.md §2.10.
    Results land in an in-memory sink table named ``query_name``
    (complete mode, so the test can compare against the batch run).
    """
    from .events import windowed_counts
    from .schema import EVENTS_SCHEMA

    from pyspark.sql import functions as F

    # Watermarks require TIMESTAMP (ltz); parquet naive timestamps read
    # as NTZ.  Session timezone is pinned UTC, so the cast is exact.
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        .withWatermark("ts", watermark)
    )
    return (
        windowed_counts(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, start_s long, end_s long"
)
SESSION_STATE_SCHEMA = "session_id long, n_events long, start_s double, last_s double"


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    gap_minutes: int = 30,
    query_name: str = "ev_sessions",
):
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` (SURVEY.md §2.10's custom-stateful path).

    State per user = the open session (id, count, start, last-seen).
    Each micro-batch folds its events into the state and emits a
    snapshot row per touched session; the LAST emission per
    (user, session) equals the batch ``events.sessionize`` result, which
    the test asserts.  Update-mode memory sink under ``query_name``.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from .schema import EVENTS_SCHEMA

    gap_s = gap_minutes * 60.0

    def fold(key, pdfs, state):
        (user_id,) = key
        if state.exists:
            session_id, n_events, start_s, last_s = state.get
        else:
            session_id, n_events, start_s, last_s = 0, 0, None, None
        out = []
        # ``pdfs`` is an ITERATOR of Arrow chunks in shuffle order, not
        # event-time order: a group spanning multiple chunks (more rows
        # than maxRecordsPerBatch, or several input partitions) would be
        # folded out of order if each chunk were sorted independently.
        # Buffer the whole group for this micro-batch, sort ONCE, fold.
        chunks = list(pdfs)
        whole = (
            pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            if chunks
            else pd.DataFrame({"ts": pd.Series([], dtype="datetime64[ns]")})
        )
        for ts in whole["ts"].astype("int64") / 1e9:  # epoch seconds
            if last_s is None or ts - last_s > gap_s:
                if n_events:
                    out.append(
                        (user_id, session_id, n_events, start_s, last_s)
                    )
                session_id += 1
                n_events, start_s = 0, ts
            n_events += 1
            last_s = ts
        out.append((user_id, session_id, n_events, start_s, last_s))
        state.update((session_id, n_events, start_s, last_s))
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_id", "n_events", "start_s", "end_s"],
        ).astype({"start_s": "int64", "end_s": "int64"})

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .start()
    )


DEDUP_OUT_SCHEMA = "doc_id string, digest string"
DEDUP_STATE_SCHEMA = "seen long"


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "doc_dedup",
    max_files_per_trigger: int = 4,
):
    """Streaming exact dedup at ingest: the FIRST document seen per
    content digest passes through; every later byte-identical copy —
    within a micro-batch or any later one — is dropped.

    ``applyInPandasWithState`` keyed by digest; state = a seen flag, so
    state size is one long per distinct document ever ingested (the
    minimal possible for exact streaming dedup; at larger horizons swap
    the flag store for a TTL'd state via GroupStateTimeout).  Within the
    first batch of a digest group, rows sort by doc_id so the survivor
    is deterministic.  Append-mode memory sink under ``query_name``.
    """
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .schema import DOCUMENTS_SCHEMA

    def keep_first(key, pdfs, state):
        (digest,) = key
        if not state.exists:
            chunks = [p[["doc_id"]] for p in pdfs]
            if chunks:
                whole = pd.concat(chunks, ignore_index=True)
                survivor = whole["doc_id"].sort_values().iloc[0]
                state.update((1,))
                yield pd.DataFrame(
                    {"doc_id": [survivor], "digest": [digest]}
                )
        else:
            for _ in pdfs:  # drain; all dups of an already-seen digest
                pass

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .withColumn(
            "digest",
            # Digest over RAW span fields with explicit separators —
            # NOT to_json, whose canonicalization is Spark-version-
            # dependent (digests must stay stable across engine
            # upgrades when checkpointed state outlives a deploy).
            # \x1f joins fields, \x1e joins spans, \x00 marks null.
            F.md5(
                F.concat_ws(
                    "\x1e",
                    F.transform(
                        "spans",
                        lambda s: F.concat_ws(
                            "\x1f",
                            F.coalesce(s["kind"], F.lit("\x00")),
                            F.coalesce(s["text"], F.lit("\x00")),
                            F.coalesce(s["media_ref"], F.lit("\x00")),
                            F.coalesce(
                                s["offset"].cast("string"), F.lit("\x00")
                            ),
                        ),
                    ),
                )
            ),
        )
        .select("doc_id", "digest")
    )
    deduped = stream.groupBy("digest").applyInPandasWithState(
        keep_first,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """readStream -> per-batch extract -> append parquet sink."""
    from .pipeline import extract_spans, rebalance

    stream = read_document_stream(spark, input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = extract_spans(spark, rebalance(batch_df))
        out.write.mode("append").parquet(output_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_html_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of crawled HTML page parquet drops."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("html", StringType()),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def write_html_batch(
    batch_df: DataFrame, batch_id: int, output_dir: str
) -> None:
    """Idempotent micro-batch writer for ``stream_html_extract``.

    Dynamic-partition-overwrite keyed on batch_id: a replayed batch N
    rewrites ONLY partition batch_id=N (byte-identical — the block
    pipeline is deterministic), never appends a second copy."""
    from pyspark.sql import functions as F

    from .textops.html import content_spans

    (
        content_spans(batch_df)
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(output_dir)
    )


def stream_html_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Continuous HTML main-content extraction: readStream → the exact
    batch span pipeline (textops.html.content_spans) → append sink.

    The block pipeline is stateless narrow Column expressions, so it
    runs unchanged under Structured Streaming; the only stateful piece
    (the per-doc row_number for span ``seq``) is computed per
    micro-batch under ``foreachBatch`` — correct because a page arrives
    whole in one file, never split across batches.

    Exactly-once: foreachBatch is at-least-once (a batch retried after
    a partial write, or replayed from the checkpoint before its commit,
    runs again), so a blind append would duplicate span rows.  The
    write is made idempotent by partitioning the output on ``batch_id``
    and using dynamic partition overwrite — a replay of batch N
    rewrites ONLY partition batch_id=N, byte-identical, instead of
    appending a second copy."""
    stream = read_html_stream(spark, input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_html_batch(batch_df, batch_id, output_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_pdf_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of (doc_id, pdf_bytes) parquet drops — raw
    crawled PDFs as they land."""
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("pdf_bytes", BinaryType()),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def stream_pdf_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    config=None,
    include_media: bool = False,
) -> StreamingQuery:
    """Continuous REAL-PDF ingestion: readStream of raw PDF bytes → the
    exact batch byte-path extraction (sources.pdf_bytes.
    extract_spans_from_pdf, minipdf parse + per-family recipes, corrupt
    documents isolated as error rows) → idempotent sink.

    Same exactly-once discipline as stream_html_extract: foreachBatch
    is at-least-once, so the write partitions on ``batch_id`` with
    dynamic partition overwrite — a replayed batch rewrites only its
    own partition (the parse is deterministic), never appends a
    duplicate."""
    from pyspark.sql import functions as F

    from .sources.pdf_bytes import extract_spans_from_pdf

    stream = read_pdf_stream(spark, input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            extract_spans_from_pdf(
                batch_df, config=config, include_media=include_media
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_pii_scrub(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "pii_scrub",
    max_files_per_trigger: int = 4,
):
    """Streaming PII scrubbing at ingest: the stateless per-document
    analysis.pii_scrub transformation applied to a file-source stream —
    detections counted and text redacted BEFORE documents land anywhere
    downstream, which is where a privacy gate belongs in a pipeline.
    Stateless narrow transformation: identical results to the batch
    operator on the same rows (asserted by test), no watermark or state
    store.  Append-mode memory sink under ``query_name``."""
    from .textops.analysis import pii_scrub

    # the documents-table shape (TESTDATA.md), not the spans schema
    doc_table_schema = (
        "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    stream = (
        spark.readStream.schema(doc_table_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        pii_scrub(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )


def stream_blocklist_gate(
    spark: SparkSession,
    input_dir: str,
    words: list,
    max_frac: float = 0.02,
    query_name: str = "blocklist_gate",
    max_files_per_trigger: int = 4,
):
    """Streaming C4-family blocklist gate at ingest: the stateless
    per-document analysis.blocklist_filter audit (bad-word count /
    fraction / keep decision) applied to a file-source stream, so a
    crawl is gated BEFORE documents land downstream.  The word list
    compiles into the plan as one literal alternation regex — no state
    store, no watermark — so results are identical to the batch
    operator on the same rows (asserted by test) and replayed files
    decide identically across stream restarts.  Append-mode memory
    sink under ``query_name``."""
    from .textops.analysis import blocklist_filter

    doc_table_schema = (
        "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    stream = (
        spark.readStream.schema(doc_table_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        blocklist_filter(stream, words, max_frac=max_frac)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )


def stream_mixture_sample(
    spark: SparkSession,
    input_dir: str,
    rates,
    default_pct: int = 0,
    query_name: str = "mixture_sample",
    max_files_per_trigger: int = 4,
):
    """Streaming mixture sampling at ingest: analysis.mixture_sample
    applied to a file-source stream — each arriving document is kept or
    dropped by its source's rate BEFORE landing downstream, the shape a
    continuously-ingesting training mix runs.  Stateless narrow
    transformation over a static broadcast rates table, so results are
    identical to the batch operator on the same rows (asserted by
    test), and because the md5 buckets are fixed, REPLAYED files decide
    identically — the sample stays consistent across stream restarts.
    Append-mode memory sink under ``query_name``."""
    from .textops.analysis import mixture_sample

    doc_table_schema = (
        "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    stream = (
        spark.readStream.schema(doc_table_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        mixture_sample(stream, rates, default_pct=default_pct)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )


def write_quality_batch(
    batch_df: DataFrame,
    batch_id: int,
    lm: DataFrame,
    thresholds: DataFrame,
    output_dir: str,
) -> None:
    """Idempotent micro-batch writer for ``stream_quality_gate``:
    score the batch under the FIXED pre-trained LM, label against the
    FIXED thresholds, dynamic-partition-overwrite on batch_id (a
    replayed batch rewrites only its own partition — the scoring is
    deterministic, so byte-identical)."""
    from pyspark.sql import functions as F

    from .textops.analysis import bucket_by_thresholds, lm_perplexity

    scores = lm_perplexity(batch_df.select("doc_id", "text"), lm=lm).join(
        batch_df.select("doc_id", "lang"), "doc_id"
    )
    (
        bucket_by_thresholds(scores, thresholds)
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(output_dir)
    )


def stream_quality_gate(
    spark: SparkSession,
    input_dir: str,
    lm: DataFrame,
    thresholds: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    """Continuous CCNet-style quality gating at ingest: each arriving
    document is scored (bits-per-token under a FIXED pre-trained
    unigram LM) and labelled head/middle/tail against FIXED per-language
    tercile thresholds — the deployment shape of
    ``analysis.perplexity_buckets``, where the model and gate are
    artifacts trained once on a reference corpus
    (``analysis.unigram_lm`` + ``analysis.perplexity_thresholds``) and
    every ingest batch is scored against them.

    Both artifacts are static broadcast tables, and the per-doc score
    aggregate runs per micro-batch under ``foreachBatch`` (a document
    arrives whole in one file, never split across batches), so results
    are identical to the batch operator with the same ``lm`` +
    ``thresholds`` on the same rows (asserted by test).  Exactly-once
    via batch_id dynamic partition overwrite, same as the other
    foreachBatch sinks here."""
    doc_table_schema = (
        "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    stream = (
        spark.readStream.schema(doc_table_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_quality_batch(batch_df, batch_id, lm, thresholds, output_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_gopher_gate(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "gopher_gate",
    max_files_per_trigger: int = 4,
    **rule_bounds,
):
    """Streaming Gopher-rule quality gate at ingest: the stateless
    per-document analysis.gopher_rules audit (per-rule flags + keep)
    applied to a file-source stream.  The rule thresholds compile into
    the plan as literals — no state store, no watermark — so results
    are identical to the batch operator on the same rows (asserted by
    test) and replayed files decide identically across restarts.
    Append-mode memory sink under ``query_name``; ``rule_bounds``
    forwards min_words/max_words/etc to gopher_rules."""
    from .textops.analysis import gopher_rules

    doc_table_schema = (
        "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    stream = (
        spark.readStream.schema(doc_table_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        gopher_rules(stream, **rule_bounds)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )


def write_dsir_batch(
    batch_df: DataFrame,
    batch_id: int,
    model: DataFrame,
    output_dir: str,
    n_buckets: int,
) -> None:
    """Idempotent micro-batch writer for ``stream_dsir_gate``: score
    the batch against the FIXED model, dynamic-partition-overwrite on
    batch_id (scoring is deterministic integer arithmetic, so a
    replayed batch rewrites its partition byte-identically)."""
    from pyspark.sql import functions as F

    from .textops.analysis import dsir_score

    (
        dsir_score(batch_df.select("doc_id", "text"), model, n_buckets)
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(output_dir)
    )


def stream_dsir_gate(
    spark: SparkSession,
    input_dir: str,
    model: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    n_buckets: int = None,
) -> StreamingQuery:
    """Streaming DSIR scoring at ingest: each arriving document is
    scored against a FIXED pre-trained (f, lr) model
    (``analysis.dsir_model``, trained once on a reference corpus +
    in-domain sample) — the deployment shape of importance
    resampling, where the model is a broadcast artifact and the
    stream only pays the score path (explode + broadcast join +
    per-doc sum).

    The model covers the whole finite feature space, so documents
    with tokens the training corpus never saw still score, and the
    gate never retrains mid-stream (the statistically correct
    shape).  The per-doc aggregate runs per micro-batch under
    ``foreachBatch`` (a document arrives whole in one file, never
    split across batches — the same contract as
    ``stream_quality_gate``), so results equal the batch
    ``dsir_score`` with the same model on the same rows (asserted by
    test).  Exactly-once via batch_id dynamic partition overwrite."""
    from .textops.analysis import DSIR_BUCKETS

    nb = n_buckets or DSIR_BUCKETS
    doc_table_schema = (
        "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    stream = (
        spark.readStream.schema(doc_table_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_dsir_batch(batch_df, batch_id, model, output_dir, nb)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_pq_encode(
    spark: SparkSession,
    input_dir: str,
    codebook: DataFrame,
    query_name: str = "pq_encode",
    max_files_per_trigger: int = 4,
):
    """Streaming PQ encoding at ingest: every arriving embedding is
    compressed to its M subspace codes against a FIXED pre-trained
    codebook (``similarity.pq_train``, trained once — over a hash
    sample at web scale) — the deployment shape of vector-index
    ingestion, where the codebook is a broadcast artifact and the
    stream pays only the one-projection encode path (no shuffle, no
    state).  Stateless narrow transformation: identical codes to the
    batch ``pq_assign`` with the same codebook on the same rows
    (asserted by test).  Append-mode memory sink under
    ``query_name``."""
    from .textops.similarity import pq_assign

    emb_schema = "vec_id long, embedding array<float>, label int"
    stream = (
        spark.readStream.schema(emb_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        pq_assign(stream, codebook)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )


def write_bm25_batch(
    batch_df: "DataFrame",
    batch_id: int,
    model: "DataFrame",
    output_dir: str,
) -> None:
    """Idempotent micro-batch writer for ``stream_bm25_gate``: score
    the batch against the FIXED model, dynamic-partition-overwrite on
    batch_id (scoring is deterministic integer arithmetic, so a
    replayed batch rewrites its partition byte-identically)."""
    from pyspark.sql import functions as F

    from .textops.analysis import bm25_score

    (
        bm25_score(batch_df.select("doc_id", "text"), model)
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(output_dir)
    )


def stream_bm25_gate(
    spark: SparkSession,
    input_dir: str,
    model: "DataFrame",
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    """Streaming BM25 scoring at ingest: every arriving document is
    scored against a FIXED retrieval model (``analysis.bm25_model``,
    trained once on a reference corpus) — the deployment shape of
    targeted curation, where the few-KB model broadcasts and each
    micro-batch pays only explode -> broadcast join -> exact integer
    per-(doc, query) sum.  df/idf/avgdl are frozen, so arriving
    documents never shift the ranking function and a replayed file
    scores identically.  The per-doc aggregate runs per micro-batch
    under ``foreachBatch`` (a document arrives whole in one file —
    the same contract as ``stream_quality_gate``), so results equal
    the batch ``bm25_score`` with the same model on the same rows
    (asserted by test).  Exactly-once via batch_id dynamic partition
    overwrite."""
    doc_table_schema = (
        "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    stream = (
        spark.readStream.schema(doc_table_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df: "DataFrame", batch_id: int) -> None:
        write_bm25_batch(batch_df, batch_id, model, output_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
