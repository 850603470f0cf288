"""Per-document extraction recipes.

A recipe is ``Doc -> list[(kind, text, media_ref)]`` — the query that the
reference user would write as an ElementList method chain, executed here
per document inside the vectorized batch kernel.  The emitted list order
is the output span ``order`` (span-sequence equality key).

Recipes exercise the full operator stack:
  * ``default_recipe`` — ordered re-emission of all non-ignored elements
    (text stripped, media passed through): the span-equality baseline.
  * ``memo_recipe`` — the reference's simple-memo query
    (tests/test_doc_examples/test_simple_memo.py:22-57): text filter ->
    geometric join -> single-element extraction -> order op -> concat.
  * ``ordsum_recipe`` — the order-summary query (test_order_summary.py:16-71):
    font classify -> locate -> sections -> table grid -> header mapping.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

from .doc import Doc
from .layout import family_of
from .tables import add_header_to_table, extract_simple_table

OutSpan = Tuple[str, Optional[str], Optional[str]]  # kind, text, media_ref


def default_recipe(doc: Doc) -> List[OutSpan]:
    # Arrays are already in idx order; the non-ignored mask is almost
    # always all-true at parse time, so take the vectorized fast path.
    if doc.ignored.any():
        live = ~doc.ignored
        kinds = doc.kind[live]
        texts = doc.text_stripped[live]
        refs = doc.media_ref[live]
    else:
        kinds, texts, refs = doc.kind, doc.text_stripped, doc.media_ref
    return [
        (k, None, m) if k == "media" else (k, t, None)
        for k, t, m in zip(kinds, texts, refs)
    ]


def memo_recipe(doc: Doc) -> List[OutSpan]:
    elements = doc.elements
    fields = {}
    for label in ("TO:", "FROM:", "DATE:", "SUBJECT:"):
        anchor = elements.filter_by_text_equal(label).extract_single_element()
        value = elements.to_the_right_of(anchor).extract_single_element()
        fields[label] = (anchor, doc.text_of(value))
    subject_anchor = fields["SUBJECT:"][0]
    subject_value = elements.to_the_right_of(subject_anchor).extract_single_element()
    content = elements.after(subject_value)
    content_text = " ".join(t for t in content.texts() if t is not None)
    out: List[OutSpan] = [
        ("text", f"{label} {text}", None) for label, (_, text) in fields.items()
    ]
    out.append(("text", content_text, None))
    return out


def ordsum_recipe(doc: Doc) -> List[OutSpan]:
    elements = doc.elements
    sub_titles = elements.filter_by_font("sub_title")
    items_start = sub_titles.filter_by_text_equal(
        "Items ordered:"
    ).extract_single_element()
    totals_start = sub_titles.filter_by_text_equal("Totals:").extract_single_element()
    doc.sectioning.create_section(
        "items", items_start, totals_start, include_last_element=False
    )
    doc.sectioning.create_section("totals", totals_start, elements.last())

    out: List[OutSpan] = []
    items = (
        elements.filter_by_section("items_0")
        .filter_by_fonts("table_header", "table_text")
    )
    items_table = extract_simple_table(items, as_text=True)
    for row in add_header_to_table(items_table):
        out.append(
            ("text", "|".join(f"{k}={v}" for k, v in row.items()), None)
        )
    totals = (
        elements.filter_by_section("totals_0")
        .filter_by_fonts("table_header", "table_text")
    )
    totals_table = extract_simple_table(totals, as_text=True)
    for label, value in totals_table:
        out.append(("text", f"{label} {value}", None))
    return out


def bigtable_recipe(doc: Doc) -> List[OutSpan]:
    """Full-table extraction over a giant grid (tables.py:141-254) —
    superlinear in elements: the pathological compute-skew recipe."""
    from .tables import extract_table

    table = extract_table(doc.elements, as_text=True)
    return [("text", "|".join(row), None) for row in table]


RECIPES: dict = {
    "memo": memo_recipe,
    "ordsum": ordsum_recipe,
    "bigtable": bigtable_recipe,
}


def recipe_for(doc_id: str) -> Callable[[Doc], List[OutSpan]]:
    return RECIPES.get(family_of(doc_id), default_recipe)
