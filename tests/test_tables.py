"""Table extraction kernels (reference: tests/test_tables.py)."""

import pytest

from py_pdf_parser_spark.errors import (
    InvalidTableError,
    InvalidTableHeaderError,
    TableExtractionError,
)
from py_pdf_parser_spark.kernel.tables import (
    add_header_to_table,
    extract_simple_table,
    extract_table,
)

from .utils import make_doc, make_element


def grid_2x2():
    return make_doc(
        [
            make_element(box=(0, 5, 6, 10), text="one"),
            make_element(box=(6, 10, 6, 10), text="two"),
            make_element(box=(0, 5, 0, 5), text="three"),
            make_element(box=(6, 10, 0, 5), text="four"),
        ]
    )


def grid_gaps():
    """3 rows x 2 cols, bottom-right missing."""
    return make_doc(
        [
            make_element(box=(0, 5, 20, 24), text="r1c1"),
            make_element(box=(6, 10, 20, 24), text="r1c2"),
            make_element(box=(0, 5, 10, 14), text="r2c1"),
            make_element(box=(6, 10, 10, 14), text="r2c2"),
            make_element(box=(0, 5, 0, 4), text="r3c1"),
        ]
    )


class TestSimpleTable:
    def test_2x2(self):
        doc = grid_2x2()
        table = extract_simple_table(doc.elements, as_text=True)
        assert table == [["one", "two"], ["three", "four"]]

    def test_2x2_elements(self):
        doc = grid_2x2()
        table = extract_simple_table(doc.elements)
        assert [[doc.text_of(i) for i in row] for row in table] == [
            ["one", "two"],
            ["three", "four"],
        ]

    def test_gap_raises_without_allow_gaps(self):
        doc = grid_gaps()
        with pytest.raises(TableExtractionError):
            extract_simple_table(doc.elements, as_text=True)

    def test_gap_allowed(self):
        doc = grid_gaps()
        table = extract_simple_table(doc.elements, as_text=True, allow_gaps=True)
        assert table == [["r1c1", "r1c2"], ["r2c1", "r2c2"], ["r3c1", ""]]

    def test_bad_reference_element_raises(self):
        doc = grid_gaps()
        bottom_left = doc.elements.filter_by_text_equal(
            "r3c1"
        ).extract_single_element()
        with pytest.raises(TableExtractionError):
            extract_simple_table(
                doc.elements,
                as_text=True,
                allow_gaps=True,
                reference_element=bottom_left,
            )

    def test_multi_page_table(self):
        doc = make_doc(
            {
                1: [
                    make_element(box=(0, 5, 20, 24), text="a1"),
                    make_element(box=(6, 10, 20, 24), text="a2"),
                    make_element(box=(0, 5, 10, 14), text="b1"),
                    make_element(box=(6, 10, 10, 14), text="b2"),
                ],
                2: [
                    make_element(box=(0, 5, 20, 24), text="c1"),
                    make_element(box=(6, 10, 20, 24), text="c2"),
                ],
            }
        )
        table = extract_simple_table(doc.elements, as_text=True)
        assert table == [["a1", "a2"], ["b1", "b2"], ["c1", "c2"]]

    def test_multiple_elements_in_cell_raises(self):
        doc = make_doc(
            [
                make_element(box=(0, 5, 6, 10), text="one"),
                make_element(box=(6, 10, 6, 10), text="two"),
                make_element(box=(0, 2, 0, 5), text="three"),
                make_element(box=(3, 5, 0, 5), text="three-b"),
                make_element(box=(6, 10, 0, 5), text="four"),
            ]
        )
        with pytest.raises(TableExtractionError):
            extract_simple_table(doc.elements, as_text=True)

    def test_strip_text_false(self):
        doc = make_doc(
            [
                make_element(box=(0, 5, 6, 10), text=" one "),
                make_element(box=(6, 10, 6, 10), text="two"),
                make_element(box=(0, 5, 0, 5), text="three"),
                make_element(box=(6, 10, 0, 5), text="four"),
            ]
        )
        assert extract_simple_table(doc.elements, as_text=True)[0][0] == "one"
        assert (
            extract_simple_table(doc.elements, as_text=True, strip_text=False)[0][0]
            == " one "
        )

    def test_remove_duplicate_header_rows(self):
        doc = make_doc(
            [
                make_element(box=(0, 5, 30, 34), text="H1", font_name="hdr"),
                make_element(box=(6, 10, 30, 34), text="H2", font_name="hdr"),
                make_element(box=(0, 5, 20, 24), text="a"),
                make_element(box=(6, 10, 20, 24), text="b"),
                make_element(box=(0, 5, 10, 14), text="H1", font_name="hdr"),
                make_element(box=(6, 10, 10, 14), text="H2", font_name="hdr"),
                make_element(box=(0, 5, 0, 4), text="c"),
                make_element(box=(6, 10, 0, 4), text="d"),
            ]
        )
        table = extract_simple_table(
            doc.elements, as_text=True, remove_duplicate_header_rows=True
        )
        assert table == [["H1", "H2"], ["a", "b"], ["c", "d"]]
        # Same text but different font is NOT a duplicate.
        table_keep = extract_simple_table(doc.elements, as_text=True)
        assert len(table_keep) == 4


class TestExtractTable:
    def test_matches_simple_table_on_clean_grid(self):
        doc = grid_2x2()
        assert extract_table(doc.elements, as_text=True) == extract_simple_table(
            doc.elements, as_text=True
        )

    def test_gaps_become_none_cells(self):
        doc = grid_gaps()
        table = extract_table(doc.elements, as_text=True)
        assert table == [["r1c1", "r1c2"], ["r2c1", "r2c2"], ["r3c1", ""]]

    def test_element_in_multiple_rows_raises(self):
        doc = make_doc(
            [
                make_element(box=(0, 5, 10, 15), text="A"),
                make_element(box=(6, 10, 4, 14), text="B"),  # spans both rows
                make_element(box=(0, 5, 4, 8), text="C"),
            ]
        )
        with pytest.raises(TableExtractionError):
            extract_table(doc.elements, as_text=True)

    def test_fix_element_in_multiple_rows(self):
        doc = make_doc(
            [
                make_element(box=(0, 5, 10, 15), text="A"),
                make_element(box=(6, 10, 4, 14), text="B"),
                make_element(box=(0, 5, 4, 8), text="C"),
            ]
        )
        table = extract_table(
            doc.elements, as_text=True, fix_element_in_multiple_rows=True
        )
        assert table == [["A", "B"], ["C", ""]]

    def test_fix_element_in_multiple_cols(self):
        doc = make_doc(
            [
                make_element(box=(0, 5, 10, 14), text="A"),
                make_element(box=(6, 10, 10, 15), text="B"),
                make_element(box=(0, 10, 4, 8), text="C"),  # spans both cols
            ]
        )
        with pytest.raises(TableExtractionError):
            extract_table(doc.elements, as_text=True)
        table = extract_table(
            doc.elements, as_text=True, fix_element_in_multiple_cols=True
        )
        assert table == [["A", "B"], ["C", ""]]

    def test_colmerge_family_matches_reference_fixture(self):
        # The synthetic colmerge family mirrors the reference's own
        # fix_cols geometry (tests/test_tables.py:843-875); the expected
        # table is the reference's asserted output.
        from py_pdf_parser_spark.kernel.layout import colmerge_spans
        from py_pdf_parser_spark.kernel.parse import doc_from_spans

        spans = [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in colmerge_spans(0)
        ]
        doc = doc_from_spans("colmerge-0", spans)
        with pytest.raises(TableExtractionError):
            extract_table(doc.elements, as_text=True)
        table = extract_table(
            doc.elements, as_text=True, fix_element_in_multiple_cols=True
        )
        assert table == [["wide", ""], ["left", "right"]]


class TestHeaders:
    def test_add_header_default_first_row(self):
        table = [["h1", "h2"], ["a", "b"], ["c", "d"]]
        assert add_header_to_table(table) == [
            {"h1": "a", "h2": "b"},
            {"h1": "c", "h2": "d"},
        ]

    def test_add_header_explicit(self):
        table = [["a", "b"]]
        assert add_header_to_table(table, header=["x", "y"]) == [{"x": "a", "y": "b"}]

    def test_header_width_mismatch(self):
        with pytest.raises(InvalidTableHeaderError):
            add_header_to_table([["a", "b"]], header=["only_one"])

    def test_header_duplicates(self):
        with pytest.raises(InvalidTableHeaderError):
            add_header_to_table([["a", "b"]], header=["x", "x"])

    def test_non_rectangular_table(self):
        with pytest.raises(InvalidTableError):
            add_header_to_table([["a", "b"], ["c"]])
