"""HTML main-content extraction: boilerplate stripping + DOM heuristics.

The north rule's third extraction surface (besides PDF/layout parse and
media passthrough): given crawled HTML pages, strip the boilerplate and
emit the main content as ordered spans of the engine's canonical
``(kind, text, media_ref, order)`` shape.

Two classic heuristic families, composed (cf. Boilerpipe / Arc90
readability, both public):

* **DOM-region heuristics** — structural chrome containers
  (``<script> <style> <nav> <header> <footer> <aside>`` and HTML
  comments) are removed wholesale before segmentation: their *position
  in the DOM*, not their text statistics, marks them as boilerplate.
* **Block text statistics** — the remaining HTML is segmented into
  blocks at block-level closing tags; a block is main content iff its
  visible text is long enough AND its link density (chars of anchor
  text / chars of text) is at most 1/3.  Link farms ("ads", related
  boxes) fail the density rule even when they sit inside the content
  region.

Every op is a pure Column-expression pipeline: Java-regex + string
builtins only, JVM-side, whole-stage-codegen, zero shuffle up to the
per-document aggregation.  Patterns avoid backreferences and lookahead
so the exact same regex text runs identically on Java regex (Spark) and
RE2 (DuckDB oracle).

At 100 TB: the block pipeline is a narrow map over the page scan —
scales with input splits; the only shuffle is the per-doc aggregate of
``main_text``/``content_spans`` on the small ``doc_id`` key, and even
that disappears if pages arrive one-per-row (partial aggregation is
map-side complete within a document).
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# DOM containers removed wholesale (with their contents).  ``head`` must
# precede ``header`` conceptually but the \b in the pattern keeps
# ``<head>`` from matching ``<header>`` regardless of order.
REGION_TAGS = ("head", "script", "style", "nav", "header", "footer", "aside")
COMMENT_RE = r"(?s)<!--.*?-->"
# Block segmentation boundary: closing tags of block-level elements.
BLOCK_SPLIT_RE = r"(?is)</(?:p|div|li|h[1-6]|blockquote|td|th|tr|table|ul|ol)>"
TAG_RE = r"(?s)<[^>]*>"
ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
IMG_SRC_RE = r'(?is)<img\b[^>]*\bsrc="([^"]*)"'
TITLE_RE = r"(?is)<title\b[^>]*>(.*?)</title>"
H1_RE = r"(?is)<h1\b[^>]*>(.*?)</h1>"
WS_RE = r"\s+"

# One entity decoded per occurrence, in this order (&amp; strictly last
# so already-escaped entities decode exactly once).
ENTITIES: List[Tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

MIN_CONTENT_CHARS = 30  # visible chars a block needs to count as content
# Max link density as an exact rational: content iff link_chars * LINK_DEN
# <= n_chars (integer math — no float threshold ambiguity).
LINK_DEN = 3


def region_strip_expr(col: Column) -> Column:
    """Remove comments and DOM chrome regions (contents included)."""
    out = F.regexp_replace(col, COMMENT_RE, "")
    for tag in REGION_TAGS:
        out = F.regexp_replace(
            out, rf"(?is)<{tag}\b[^>]*>.*?</{tag}>", ""
        )
    return out


def visible_text_expr(col: Column) -> Column:
    """Tags stripped, entities decoded (once), whitespace collapsed."""
    out = F.regexp_replace(col, TAG_RE, "")
    for ent, rep in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, WS_RE, " "))


def _link_chars(raw: Column) -> Column:
    anchors = F.regexp_extract_all(raw, F.lit(ANCHOR_RE), F.lit(1))
    return F.aggregate(
        F.transform(anchors, lambda a: F.length(visible_text_expr(a))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def html_blocks(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Segment pages into indexed blocks with text statistics.

    Output: (doc_id, block_idx, raw, text, n_chars, n_words, link_chars,
    link_density, is_content) — one row per block with non-empty visible
    text; ``block_idx`` indexes the pre-filter segmentation so it is
    stable under threshold changes.
    """
    stripped = region_strip_expr(F.col(html_col))
    blocks = pages.select(
        "doc_id",
        F.posexplode(F.split(stripped, BLOCK_SPLIT_RE, -1)).alias(
            "block_idx", "raw"
        ),
    )
    blocks = blocks.withColumn("text", visible_text_expr(F.col("raw")))
    blocks = blocks.filter(F.col("text") != "")
    blocks = blocks.withColumn(
        "n_chars", F.length("text").cast("long")
    ).withColumn(
        "n_words", F.size(F.split(F.col("text"), " ", -1)).cast("long")
    ).withColumn(
        "link_chars", _link_chars(F.col("raw")).cast("long")
    )
    return blocks.withColumn(
        "link_density",
        F.col("link_chars").cast("double") / F.col("n_chars"),
    ).withColumn(
        "is_content",
        (F.col("n_chars") >= MIN_CONTENT_CHARS)
        & (F.col("link_chars") * LINK_DEN <= F.col("n_chars")),
    )


def block_features(pages: DataFrame) -> DataFrame:
    """Per-block feature table (the classifier's evidence, exported)."""
    return html_blocks(pages).select(
        "doc_id",
        F.col("block_idx").cast("long").alias("block_idx"),
        "text",
        "n_chars",
        "n_words",
        "link_chars",
        "link_density",
        "is_content",
    )


def main_text(pages: DataFrame) -> DataFrame:
    """Per-document main content, block-ordered and newline-joined,
    plus the content/boilerplate block split and content size."""
    blocks = html_blocks(pages)
    content_struct = F.when(
        F.col("is_content"), F.struct("block_idx", "text")
    )  # null when boilerplate -> collect_list drops it
    return blocks.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(content_struct)),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("main_text"),
        F.sum(F.when(F.col("is_content"), 1).otherwise(0))
        .cast("long")
        .alias("n_content_blocks"),
        F.sum(F.when(F.col("is_content"), 0).otherwise(1))
        .cast("long")
        .alias("n_boilerplate_blocks"),
        F.sum(F.when(F.col("is_content"), F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("content_chars"),
    )


def content_spans(pages: DataFrame) -> DataFrame:
    """Main content as ordered spans — the engine's canonical output
    shape (kind, text, media_ref, order).

    Each content block contributes its ``<img>`` references (in order of
    appearance) as ``media`` spans followed by one ``text`` span;
    ``seq`` numbers the spans within the document.
    """
    blocks = html_blocks(pages).filter(F.col("is_content"))
    blocks = blocks.withColumn(
        "img_refs", F.regexp_extract_all(F.col("raw"), F.lit(IMG_SRC_RE), F.lit(1))
    )
    media = blocks.select(
        "doc_id",
        "block_idx",
        F.posexplode("img_refs").alias("intra", "media_ref"),
    ).select(
        "doc_id",
        "block_idx",
        "intra",
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        "media_ref",
    )
    texts = blocks.select(
        "doc_id",
        "block_idx",
        F.size("img_refs").alias("intra"),
        F.lit("text").alias("kind"),
        "text",
        F.lit(None).cast("string").alias("media_ref"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("block_idx", "intra")
    return (
        media.unionByName(texts)
        .withColumn("seq", (F.row_number().over(w) - 1).cast("long"))
        .select("doc_id", "seq", "kind", "text", "media_ref")
    )


def as_documents(pages: DataFrame) -> DataFrame:
    """Extracted pages as a (doc_id, text) documents table — the bridge
    from the extraction surface into the corpus-prep operators (dedup,
    quality, token counts run unchanged on crawled HTML)."""
    return main_text(pages).select("doc_id", F.col("main_text").alias("text"))


def titles(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """<title> and first <h1> per page (entity-decoded, normalized)."""

    def _one(pattern: str) -> Column:
        inner = F.regexp_extract(F.col(html_col), pattern, 1)
        return visible_text_expr(inner)

    return pages.select(
        "doc_id",
        _one(TITLE_RE).alias("title"),
        _one(H1_RE).alias("h1"),
    )


def link_stats(pages: DataFrame) -> DataFrame:
    """Per-document DOM/link statistics over all (non-empty) blocks."""
    blocks = html_blocks(pages)
    return blocks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.when(F.col("is_content"), 1).otherwise(0))
        .cast("long")
        .alias("n_content_blocks"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("link_chars").cast("long").alias("total_link_chars"),
        (
            F.sum("link_chars").cast("double") / F.sum("n_chars")
        ).alias("doc_link_density"),
    )
