"""Cross-engine differential for the HTML pipeline: Spark (Java regex)
vs DuckDB (RE2) on seeded-random pages drawn from a hostile grammar —
nested/unclosed/uppercase tags, entity soup, link farms, attribute
noise.  The html_* oracles assume the two regex engines match on the
shared patterns; this pins that assumption on shapes the synth corpus
doesn't produce."""

import os
import random

import pytest

pyspark = pytest.importorskip("pyspark")
import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from py_pdf_parser_spark.textops import html as H  # noqa: E402

WORDS = ["aqua", "brine", "coral", "dune", "ember", "fjord", "gale",
         "heath", "isle", "jetty"]
ENTS = ["&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;", "&amp;lt;",
        # numeric char refs: plain / hex / supplementary-plane /
        # double-escaped / invalid-codepoint / malformed-stays-literal
        "&#65;", "&#233;", "&#x41;", "&#X1F4A9;", "&#9731;",
        "&amp;#65;", "&#38;lt;", "&#0;", "&#xD800;", "&#1114112;",
        "&#;", "&#x;", "&#xg1;", "&#12345678;", "&# 65;"]
BLOCK_TAGS = ["p", "div", "li", "h1", "h2", "h3", "blockquote", "td",
              "table", "ul"]
REGION_TAGS = ["nav", "header", "footer", "aside", "script", "style"]


def _words(rng, lo, hi):
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(lo, hi)))


def _inline(rng, depth=0):
    r = rng.random()
    if r < 0.45 or depth > 2:
        return _words(rng, 1, 6)
    if r < 0.6:
        return rng.choice(ENTS)
    if r < 0.75:
        href = f"/{rng.choice(WORDS)}"
        return f'<a href="{href}">{_inline(rng, depth + 1)}</a>'
    if r < 0.85:
        return f'<img src="m://{rng.randint(0, 99)}" alt="{rng.choice(WORDS)}"/>'
    tag = rng.choice(["b", "i", "em", "span"])
    return f"<{tag}>{_inline(rng, depth + 1)}</{tag}>"


def _block(rng):
    r = rng.random()
    if r < 0.15:
        tag = rng.choice(REGION_TAGS)
        return f"<{tag}>{_words(rng, 1, 8)}</{tag}>"
    if r < 0.2:
        return f"<!-- {_words(rng, 1, 4)} -->"
    tag = rng.choice(BLOCK_TAGS)
    if rng.random() < 0.25:
        tag = tag.upper()
    body = " ".join(_inline(rng) for _ in range(rng.randint(0, 6)))
    if rng.random() < 0.1:
        return f"<{tag}>{body}"  # unclosed block tag
    return f"<{tag} class=\"{rng.choice(WORDS)}\">{body}</{tag}>"


def random_page(seed: int) -> str:
    rng = random.Random(seed)
    parts = ["<html>"]
    if rng.random() < 0.7:
        parts.append(f"<head><title>{_words(rng, 1, 5)}</title></head>")
    parts.append("<body>")
    for _ in range(rng.randint(1, 12)):
        parts.append(_block(rng))
    parts.append("</body></html>")
    return "\n".join(parts)


@pytest.fixture(scope="module")
def spark():
    from py_pdf_parser_spark.session import get_spark

    return get_spark(cores=4)


@pytest.fixture(scope="module")
def fuzz_parquet(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("htmlfuzz") / "pages.parquet")
    ids = [f"fuzz-{i:04d}" for i in range(300)]
    pages = [random_page(1000 + i) for i in range(300)]
    pq.write_table(pa.table({"doc_id": ids, "html": pages}), out)
    return out


def _oracle_rows(name: str, path: str):
    from py_pdf_parser_spark.queries import oracle_sql
    from py_pdf_parser_spark.synth import ensure_html_corpus

    sql = oracle_sql()[name].replace(
        f"read_parquet('{ensure_html_corpus(0.01)}/*.parquet')",
        f"read_parquet('{path}')",
    )
    con = duckdb.connect()  # named: a temporary would be GC'd mid-fetch
    return sorted(tuple(r) for r in con.sql(sql).fetchall())


def test_block_features_spark_equals_duckdb(spark, fuzz_parquet):
    got = sorted(
        tuple(r)
        for r in H.block_features(
            spark.read.parquet(fuzz_parquet)
        ).collect()
    )
    want = _oracle_rows("html_block_features", fuzz_parquet)
    assert len(got) == len(want) and got == want


def test_content_spans_spark_equals_duckdb(spark, fuzz_parquet):
    got = sorted(
        tuple(r)
        for r in H.content_spans(spark.read.parquet(fuzz_parquet)).collect()
    )
    want = _oracle_rows("html_content_spans", fuzz_parquet)
    assert len(got) == len(want) and got == want


def test_main_text_spark_equals_duckdb(spark, fuzz_parquet):
    got = sorted(
        tuple(r)
        for r in H.main_text(spark.read.parquet(fuzz_parquet)).collect()
    )
    want = _oracle_rows("html_main_text", fuzz_parquet)
    assert len(got) == len(want) and got == want
