"""spans -> Doc parse kernel + extraction recipes on synthetic families."""

import numpy as np

from py_pdf_parser_spark.kernel.layout import (
    media_spans,
    memo_spans,
    ora_layout,
    ora_n_spans,
    ora_spans,
    ordsum_spans,
)
from py_pdf_parser_spark.kernel.parse import doc_from_spans
from py_pdf_parser_spark.kernel.recipes import (
    default_recipe,
    memo_recipe,
    ordsum_recipe,
    recipe_for,
)


class TestOraParse:
    def test_layout_shapes(self):
        i = 5
        spans = ora_spans(i)
        assert len(spans) == ora_n_spans(i) == 12
        doc = doc_from_spans(f"ora-{i:06d}", spans)
        assert doc.n == 12
        # Ordering invariant: idx sorted by (page, -y0, x0, offset).
        key = list(zip(doc.page.tolist(), (-doc.y0).tolist(), doc.x0.tolist()))
        assert key == sorted(key)
        # Every page has <= 6 elements; pages contiguous from 1.
        assert doc.page_numbers == [1, 2]

    def test_media_spans_pass_through(self):
        doc = doc_from_spans("ora-000003", ora_spans(3))
        media = [i for i in doc.elements if doc.kind[i] == "media"]
        assert len(media) == len([s for s in ora_spans(3) if s[0] == "media"])
        for i in media:
            assert doc.media_ref[i].startswith("m://3/")
            assert doc.text_raw[i] is None

    def test_anchors_present(self):
        doc = doc_from_spans("ora-000007", ora_spans(7))
        assert len(doc.elements.filter_by_text_equal("HDR:")) == 1
        assert len(doc.elements.filter_by_text_equal("END:")) == 1

    def test_fonts_match_formula(self):
        i, o = 9, 5
        doc = doc_from_spans(f"ora-{i:06d}", ora_spans(i))
        # element with offset 5: font f{(5+9)%3},{8+((5*(9%11))%4)} = f2,9
        pos = int(np.nonzero(doc.offset == o)[0][0])
        assert doc.font[pos] == "f2,9"


class TestRecipes:
    def test_default_recipe_order_and_kinds(self):
        doc = doc_from_spans("media-000002", media_spans(2))
        out = default_recipe(doc)
        assert len(out) == doc.n
        kinds = {k for k, _, _ in out}
        assert kinds == {"text", "media"}
        # media spans carry media_ref, text spans carry text.
        for k, t, m in out:
            assert (k == "media") == (m is not None)
            assert (k == "text") == (t is not None)

    def test_memo_recipe(self):
        doc = doc_from_spans("memo-000000", memo_spans(0))
        out = memo_recipe(doc)
        assert out[0] == ("text", "TO: Awesome Person", None)
        assert out[1] == ("text", "FROM: Email Sender", None)
        assert out[2] == ("text", "DATE: 1st January 2020", None)
        assert out[3] == ("text", "SUBJECT: A new PDF Parsing tool", None)
        assert "py-pdf-parser" in out[4][1]

    def test_ordsum_recipe(self):
        doc = doc_from_spans("ordsum-000000", ordsum_spans(0))
        out = ordsum_recipe(doc)
        texts = [t for _, t, _ in out]
        assert texts[0] == "Item=Apple|Unit Cost=1|Quantity=10|Cost=10"
        assert texts[3] == "Item=Date|Unit Cost=4|Quantity=3|Cost=12"
        assert texts[4] == "Subtotal: 122"
        assert texts[7] == "Total: 142"
        assert len(out) == 8

    def test_recipe_dispatch(self):
        assert recipe_for("memo-000001") is memo_recipe
        assert recipe_for("ora-000001") is default_recipe
        assert recipe_for("bigdoc-000001") is default_recipe

    def test_ora_default_recipe_matches_sql_order_semantics(self):
        # The flagship invariant: output order == idx order == the SQL
        # window ordering (page, y0 desc, x0, offset).
        i = 11
        doc = doc_from_spans(f"ora-{i:06d}", ora_spans(i))
        out = default_recipe(doc)
        lay = ora_layout(i, doc.offset)
        order = np.lexsort((doc.offset, lay["x0"], -lay["y0"], lay["page"]))
        assert list(order) == list(range(doc.n))  # already sorted
        assert len(out) == doc.n
