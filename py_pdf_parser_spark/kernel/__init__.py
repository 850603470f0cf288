"""Per-document vectorized kernels (pure numpy/pandas, no Spark imports).

These run inside pandas/Arrow UDF batches on executors; keeping them
Spark-free makes them unit-testable in-process and reusable under
Structured Streaming ``foreachBatch``.
"""

from .doc import BBox, Doc, Elems, ORDER_PRESETS, PageOrdering
from .parse import doc_from_spans
from .recipes import default_recipe, memo_recipe, ordsum_recipe, recipe_for

__all__ = [
    "BBox",
    "Doc",
    "Elems",
    "ORDER_PRESETS",
    "PageOrdering",
    "doc_from_spans",
    "default_recipe",
    "memo_recipe",
    "ordsum_recipe",
    "recipe_for",
]
