"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship extraction pipeline on sf0.001 (smoke check).
``queries`` — every implemented operator from SURVEY.md §2 + the
              training-data ops (dedup/similarity/analysis/multimodal),
              each as (spark, sf_dir) -> DataFrame.
``oracle_sql`` — independent DuckDB SQL per query (synthetic-layout
              arithmetic mirrored 1:1 for the ora corpus; golden VALUES
              for memo/ordsum; driver views for documents/embeddings).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline over the mixed-family corpus —
    parse spans -> order -> classify -> per-doc recipes (memo fields,
    order-summary sections+tables, default re-emission) -> output spans."""
    from py_pdf_parser_spark.pipeline import extract_spans_rebalanced
    from py_pdf_parser_spark.synth import ensure_mixed_corpus

    docs = spark.read.parquet(ensure_mixed_corpus(0.001))
    return extract_spans_rebalanced(spark, docs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from py_pdf_parser_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from py_pdf_parser_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
