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
