"""Unit tests for HTML main-content extraction: DOM-region stripping,
block segmentation, link-density classification, entity decoding,
span emission — plus plan shape (narrow pipeline, no shuffle before
the per-doc aggregate)."""

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from py_pdf_parser_spark.textops import html as H  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from py_pdf_parser_spark.session import get_spark

    return get_spark(cores=4)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, html string")


def _blocks(spark, html):
    df = H.block_features(_pages(spark, [("d", html)]))
    return [r.asDict() for r in df.orderBy("block_idx").collect()]


class TestRegionStrip:
    def test_chrome_regions_removed_wholesale(self, spark):
        html = (
            "<head><title>T T T T T T T T T T</title></head>"
            "<nav><p>menu menu menu menu menu menu menu menu</p></nav>"
            "<p>alpha bravo charlie delta echo foxtrot golf hotel</p>"
            "<footer><p>legal legal legal legal legal legal legal</p></footer>"
        )
        rows = _blocks(spark, html)
        texts = [r["text"] for r in rows]
        assert texts == ["alpha bravo charlie delta echo foxtrot golf hotel"]

    def test_head_does_not_eat_header_tag(self, spark):
        # <head\b must not match <header...>: a page with ONLY a header
        # region and a content p — header stripped, content kept.
        html = (
            "<header><h1>chrome</h1></header>"
            "<p>alpha bravo charlie delta echo foxtrot golf hotel</p>"
        )
        texts = [r["text"] for r in _blocks(spark, html)]
        assert texts == ["alpha bravo charlie delta echo foxtrot golf hotel"]

    def test_uppercase_regions_and_comments(self, spark):
        html = (
            "<NAV><a href='/'>m</a></NAV><!-- note -->"
            "<P>alpha bravo charlie delta echo foxtrot golf hotel</P>"
        )
        texts = [r["text"] for r in _blocks(spark, html)]
        assert texts == ["alpha bravo charlie delta echo foxtrot golf hotel"]


class TestEntities:
    def test_entities_decode_exactly_once(self, spark):
        # &amp;lt; must decode to the literal text "&lt;", not to "<".
        html = "<p>a &amp;lt; b &amp; c &#39;d&#39; x y z padpadpad</p>"
        [row] = _blocks(spark, html)
        assert row["text"] == "a &lt; b & c 'd' x y z padpadpad"

    def test_nbsp_collapses_with_whitespace(self, spark):
        html = "<p>alpha&nbsp;&nbsp;bravo   charlie delta echo foxtrot</p>"
        [row] = _blocks(spark, html)
        assert row["text"] == "alpha bravo charlie delta echo foxtrot"

    def test_numeric_entities_decimal_and_hex(self, spark):
        html = (
            "<p>&#65;&#x41;&#X41; caf&#233; &#x1F4A9; snowman&#9731;"
            " padding words here</p>"
        )
        [row] = _blocks(spark, html)
        assert row["text"] == (
            "AAA café 💩 snowman☃ padding words here"
        )

    def test_numeric_entities_single_pass_and_invalid(self, spark):
        # &amp;#65; -> literal &#65;; &#38;lt; -> literal &lt; (the
        # decoded '&' is never rescanned).  NUL / surrogate / beyond
        # U+10FFFF -> U+FFFD; malformed refs stay literal.
        html = (
            "<p>&amp;#65; &#38;lt; &#0; &#xD800; &#1114112;"
            " &#; &#x; &#xg1; &#12345678; filler filler</p>"
        )
        [row] = _blocks(spark, html)
        assert row["text"] == (
            "&#65; &lt; � � �"
            " &#; &#x; &#xg1; &#12345678; filler filler"
        )


class TestLinkDensity:
    def test_link_farm_is_boilerplate(self, spark):
        html = (
            '<div><a href="/a">click here for more</a> '
            '<a href="/b">and here for even more</a></div>'
        )
        [row] = _blocks(spark, html)
        assert row["n_chars"] >= H.MIN_CONTENT_CHARS
        assert not row["is_content"]

    def test_long_text_with_inline_link_is_content(self, spark):
        html = (
            "<p>alpha bravo charlie delta echo foxtrot golf hotel india "
            'juliet kilo lima <a href="/x">notes</a></p>'
        )
        [row] = _blocks(spark, html)
        assert row["is_content"]
        assert row["link_chars"] == len("notes")

    def test_nested_tags_inside_anchor_counted_once(self, spark):
        html = (
            "<p>alpha bravo charlie delta echo foxtrot golf hotel india "
            'juliet <a href="/x"><b>bold</b> link</a></p>'
        )
        [row] = _blocks(spark, html)
        assert row["link_chars"] == len("bold link")

    def test_short_block_is_boilerplate(self, spark):
        [row] = _blocks(spark, "<p>too short</p>")
        assert not row["is_content"]


class TestSegmentation:
    def test_nested_divs_produce_clean_blocks(self, spark):
        html = (
            '<div class="outer"><div class="inner">'
            "<p>alpha bravo charlie delta echo foxtrot golf hotel</p>"
            "</div></div>"
        )
        texts = [r["text"] for r in _blocks(spark, html)]
        assert texts == ["alpha bravo charlie delta echo foxtrot golf hotel"]

    def test_block_idx_stable_under_empty_blocks(self, spark):
        html = (
            "<p></p><p>alpha bravo charlie delta echo foxtrot golf hotel</p>"
        )
        rows = _blocks(spark, html)
        assert len(rows) == 1
        assert rows[0]["block_idx"] == 1  # pre-filter index preserved


class TestMainText:
    def test_doc_with_no_content_gets_empty_string(self, spark):
        df = H.main_text(_pages(spark, [("d", "<p>tiny</p>")]))
        [row] = df.collect()
        assert row.main_text == ""
        assert row.n_content_blocks == 0
        assert row.n_boilerplate_blocks == 1

    def test_blocks_joined_in_document_order(self, spark):
        html = (
            "<p>alpha bravo charlie delta echo foxtrot golf hotel one</p>"
            "<p>alpha bravo charlie delta echo foxtrot golf hotel two</p>"
        )
        [row] = H.main_text(_pages(spark, [("d", html)])).collect()
        assert row.main_text.split("\n")[0].endswith("one")
        assert row.main_text.split("\n")[1].endswith("two")


class TestContentSpans:
    def test_media_spans_precede_text_within_block(self, spark):
        html = (
            '<p><img src="m://1"/>alpha bravo charlie delta echo foxtrot '
            "golf hotel</p>"
        )
        rows = H.content_spans(_pages(spark, [("d", html)])).orderBy(
            "seq"
        ).collect()
        assert [(r.seq, r.kind, r.media_ref) for r in rows] == [
            (0, "media", "m://1"),
            (1, "text", None),
        ]

    def test_boilerplate_images_are_dropped(self, spark):
        html = (
            '<div><a href="/x"><img src="m://ad"/>ad ad ad ad</a></div>'
            "<p>alpha bravo charlie delta echo foxtrot golf hotel</p>"
        )
        rows = H.content_spans(_pages(spark, [("d", html)])).collect()
        assert all(r.media_ref != "m://ad" for r in rows)


class TestPlanShape:
    def test_block_pipeline_is_shuffle_free(self, spark):
        """block_features is a narrow map over the page scan: no
        Exchange in the physical plan (scales with input splits)."""
        df = H.block_features(_pages(spark, [("d", "<p>x</p>")]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_main_text_single_small_key_shuffle(self, spark):
        df = H.main_text(_pages(spark, [("d", "<p>x</p>")]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") <= 1


class TestSharedBlocksTable:
    """Precomputed-blocks threading (the persisted html_blocks table the
    queries layer shares across the html_* consumers) must be
    result-identical to each consumer computing its own blocks — the
    same guarantee the shared shingle/signature tables carry."""

    def _corpus(self, spark):
        rows = []
        for i in range(12):
            body = (
                f"<head><title>T{i} &#8212; site</title></head>"
                f"<p>alpha{i} bravo charlie delta echo foxtrot golf "
                f"hotel india juliet kilo &#39;quoted&#39;</p>"
                f"<p><a href='/x'>nav nav nav nav nav nav nav nav</a></p>"
                + (f"<p>exotic snow&#x2603;man content with many filler "
                   f"words to pass the length gate {i}</p>"
                   if i % 3 == 0 else "")
            )
            rows.append((f"d{i}", body))
        return _pages(spark, rows)

    def test_consumers_match_with_and_without_shared_blocks(self, spark):
        pages = self._corpus(spark)
        blocks = H.html_blocks(pages).persist()
        try:
            for fn in (
                H.block_features,
                H.main_text,
                H.content_spans,
                H.link_stats,
                H.as_documents,
            ):
                alone = {tuple(x) for x in fn(pages).collect()}
                shared = {tuple(x) for x in fn(pages, blocks).collect()}
                assert alone == shared and alone
        finally:
            blocks.unpersist()
