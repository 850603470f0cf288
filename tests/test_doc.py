"""Doc construction: ordering, fonts, geometry predicates, page errors.

Expected values derive from the reference's test suite:
tests/test_components.py (ordering :290-341, geometry ddt :135-187),
tests/test_filtering.py, components.py:213-238 (font mapping).
"""

import numpy as np
import pytest

from py_pdf_parser_spark.errors import (
    InvalidCoordinatesError,
    NoElementsOnPageError,
    PageNotFoundError,
)
from py_pdf_parser_spark.kernel.doc import BBox, Doc

from .utils import make_doc, make_element

GRID = [
    make_element(box=(0, 5, 6, 10), text="one"),
    make_element(box=(6, 10, 6, 10), text="two"),
    make_element(box=(0, 5, 0, 5), text="three"),
    make_element(box=(6, 10, 0, 5), text="four"),
]


def texts(doc):
    return [doc.text_of(i) for i in doc.elements]


class TestOrdering:
    def test_left_to_right_top_to_bottom(self):
        doc = make_doc(GRID)  # default preset
        assert texts(doc) == ["one", "two", "three", "four"]

    def test_right_to_left_top_to_bottom(self):
        doc = make_doc(GRID, element_ordering="R2L_T2B")
        assert texts(doc) == ["two", "one", "four", "three"]

    def test_top_to_bottom_left_to_right(self):
        doc = make_doc(GRID, element_ordering="T2B_L2R")
        assert texts(doc) == ["one", "three", "two", "four"]

    def test_top_to_bottom_right_to_left(self):
        doc = make_doc(GRID, element_ordering="T2B_R2L")
        assert texts(doc) == ["two", "four", "one", "three"]

    def test_custom_ordering_two_columns(self):
        # Column split at x=50: everything left column first (top-down),
        # then right column (reference test_element_ordering.py:58-99).
        elems = [
            make_element(box=(0, 10, 90, 95), text="L1"),
            make_element(box=(60, 70, 90, 95), text="R1"),
            make_element(box=(0, 10, 80, 85), text="L2"),
            make_element(box=(60, 70, 80, 85), text="R2"),
        ]
        ordering = lambda x0, y0: (x0 >= 50, -y0, x0)
        doc = make_doc(elems, element_ordering=ordering)
        assert texts(doc) == ["L1", "L2", "R1", "R2"]


class TestPageOrderingCallable:
    """Arbitrary List->List per-page ordering (components.py:409-413),
    golden cases ported from the reference's
    tests/test_doc_examples/test_element_ordering.py:14-99 (grid.pdf /
    columns.pdf fixtures re-expressed as synthetic boxes).
    GRID: one=TopLeft two=TopRight three=BottomLeft four=BottomRight."""

    def test_custom_sorted_by_x0_y0(self):
        from py_pdf_parser_spark.kernel.doc import PageOrdering

        # reference: ordering_function = sorted(key=(x0, y0)) ->
        # [Bottom Left, Top Left, Bottom Right, Top Right]
        doc = make_doc(
            GRID,
            element_ordering=PageOrdering(
                lambda els: sorted(els, key=lambda e: (e.x0, e.y0))
            ),
        )
        assert texts(doc) == ["three", "one", "four", "two"]

    def test_reversed_is_expressible(self):
        from py_pdf_parser_spark.kernel.doc import PageOrdering

        # a pure permutation no geometric KEY function can express
        doc = make_doc(
            GRID,
            element_ordering=PageOrdering(lambda els: list(reversed(els))),
        )
        assert texts(doc) == ["four", "three", "two", "one"]

    def test_two_column_layout(self):
        from py_pdf_parser_spark.kernel.doc import PageOrdering

        # reference columns.pdf: sorted(key=(x0 > 300, -y0, x0)) — all
        # of column 1 (top-down) before column 2; split here at x=50
        elems = [
            make_element(box=(0, 10, 90, 95), text="C1 Title"),
            make_element(box=(60, 70, 90, 95), text="C2 Title"),
            make_element(box=(0, 10, 80, 85), text="C1 text"),
            make_element(box=(60, 70, 80, 85), text="C2 text"),
            make_element(box=(0, 4, 70, 75), text="C1 left"),
            make_element(box=(6, 10, 70, 75), text="C1 right"),
            make_element(box=(60, 64, 70, 75), text="C2 left"),
            make_element(box=(66, 70, 70, 75), text="C2 right"),
        ]
        doc = make_doc(
            elems,
            element_ordering=PageOrdering(
                lambda els: sorted(
                    els, key=lambda e: (e.x0 > 50, -e.y0, e.x0)
                )
            ),
        )
        assert texts(doc) == [
            "C1 Title", "C1 text", "C1 left", "C1 right",
            "C2 Title", "C2 text", "C2 left", "C2 right",
        ]

    def test_pages_ascend_and_callable_runs_per_page(self):
        from py_pdf_parser_spark.kernel.doc import PageOrdering

        seen_pages = []

        def fn(els):
            seen_pages.append(len(els))
            return list(reversed(els))

        doc = make_doc(
            {
                1: [
                    make_element(box=(0, 5, 6, 10), text="p1a"),
                    make_element(box=(6, 10, 6, 10), text="p1b"),
                ],
                2: [make_element(box=(0, 5, 6, 10), text="p2a")],
            },
            element_ordering=PageOrdering(fn),
        )
        assert texts(doc) == ["p1b", "p1a", "p2a"]
        assert seen_pages == [2, 1]

    def test_callable_may_drop_elements(self):
        from py_pdf_parser_spark.kernel.doc import PageOrdering

        # reference builds the doc from exactly what the callable
        # returns — dropped elements never become document elements
        doc = make_doc(
            GRID,
            element_ordering=PageOrdering(
                lambda els: [e for e in els if e.get_text() != "two"]
            ),
        )
        assert texts(doc) == ["one", "three", "four"]

    def test_multi_page_order_and_stable_ties(self):
        # Identical boxes keep input (offset) order; pages ascending first.
        doc = make_doc(
            {
                2: [make_element(text="p2a"), make_element(text="p2b")],
                1: [make_element(text="p1a"), make_element(text="p1b")],
            }
        )
        assert texts(doc) == ["p1a", "p1b", "p2a", "p2b"]
        assert doc.page.tolist() == [1, 1, 2, 2]


class TestFonts:
    def test_font_string_int_size(self):
        doc = make_doc([make_element(font_name="foo", font_size=10)])
        assert doc.font[0] == "foo,10"

    def test_font_string_float_size(self):
        doc = make_doc([make_element(font_name="foo", font_size=10.0)])
        assert doc.font[0] == "foo,10.0"

    def test_font_size_precision_python_round(self):
        # Python round: 2.25 -> 2.2 (half-to-even on the binary value).
        doc = make_doc(
            [make_element(font_size=2.25)], font_size_precision=1
        )
        assert doc.font_size[0] == round(2.25, 1)
        # round(x, 0) returns a float (7.0), unlike round(x) — the reference
        # passes precision explicitly (components.py:208-210), so "7.0".
        doc0 = make_doc([make_element(font_size=6.83)], font_size_precision=0)
        assert doc0.font[0] == "fake_font,7.0"

    def test_font_mapping_exact(self):
        doc = make_doc(
            [make_element(font_name="foo", font_size=2),
             make_element(font_name="bar", font_size=3)],
            font_mapping={"foo,2": "font_a"},
        )
        assert doc.font[0] == "font_a"
        assert doc.font[1] == "bar,3"

    def test_font_mapping_falsy_value_falls_back(self):
        # `.get(font) or font` — components.py:237.
        doc = make_doc(
            [make_element(font_name="foo", font_size=2)],
            font_mapping={"foo,2": ""},
        )
        assert doc.font[0] == "foo,2"

    def test_font_mapping_regex(self):
        doc = make_doc(
            [
                make_element(font_name="fake_font_1", font_size=10),
                make_element(font_name="other", font_size=10),
            ],
            font_mapping={r"^fake_font_\d,10$": "large_text"},
            font_mapping_is_regex=True,
        )
        assert doc.font[0] == "large_text"
        assert doc.font[1] == "other,10"

    def test_font_mapping_regex_flags(self):
        import re

        doc = make_doc(
            [make_element(font_name="FAKE_font_1", font_size=10)],
            font_mapping={r"^fake_font_\d,10$": "large_text"},
            font_mapping_is_regex=True,
            regex_flags=re.IGNORECASE,
        )
        assert doc.font[0] == "large_text"

    def test_font_mapping_regex_insertion_order_first_wins(self):
        doc = make_doc(
            [make_element(font_name="abc", font_size=1)],
            font_mapping={"^a": "first", "^ab": "second"},
            font_mapping_is_regex=True,
        )
        assert doc.font[0] == "first"

    def test_regex_mode_exact_fallthrough(self):
        # Non-matching regex still falls through to exact .get lookup.
        doc = make_doc(
            [make_element(font_name="zed", font_size=1)],
            font_mapping={"^nomatch$": "x", "zed,1": "mapped"},
            font_mapping_is_regex=True,
        )
        assert doc.font[0] == "mapped"

    def test_fonts_distinct(self):
        doc = make_doc(
            [
                make_element(font_name="a", font_size=1),
                make_element(font_name="a", font_size=1),
                make_element(font_name="b", font_size=2),
            ]
        )
        assert doc.fonts() == {"a,1", "b,2"}


# Geometry truth table: element (2,5,2,5) vs probe boxes — reference
# ddt cases tests/test_components.py:135-187; closed intervals, touching
# counts.
PARTIALLY_WITHIN_CASES = [
    ((0, 10, 0, 10), True),   # fully inside probe
    ((3, 4, 3, 4), True),     # probe inside element
    ((0, 2, 0, 2), True),     # touching corner counts
    ((5, 10, 5, 10), True),   # touching other corner
    ((0, 1.9, 0, 10), False),  # left of element
    ((5.1, 10, 0, 10), False),  # right of element
    ((0, 10, 0, 1.9), False),  # below
    ((0, 10, 5.1, 10), False),  # above
    ((2, 5, 2, 5), True),     # exact
]

ENTIRELY_WITHIN_CASES = [
    ((0, 10, 0, 10), True),
    ((2, 5, 2, 5), True),      # exact bounds count
    ((2.1, 5, 2, 5), False),
    ((2, 4.9, 2, 5), False),
    ((3, 4, 3, 4), False),
]


class TestGeometry:
    @pytest.mark.parametrize("box,expected", PARTIALLY_WITHIN_CASES)
    def test_partially_within(self, box, expected):
        doc = make_doc([make_element(box=(2, 5, 2, 5))])
        got = doc.elements.filter_partially_within_bounding_box(BBox(*box), 1)
        assert (len(got) == 1) is expected

    @pytest.mark.parametrize("box,expected", ENTIRELY_WITHIN_CASES)
    def test_entirely_within(self, box, expected):
        doc = make_doc([make_element(box=(2, 5, 2, 5))])
        got = doc.elements.filter_entirely_within_bounding_box(BBox(*box), 1)
        assert (len(got) == 1) is expected

    def test_invalid_bbox(self):
        with pytest.raises(InvalidCoordinatesError):
            BBox(5, 2, 0, 1)
        with pytest.raises(InvalidCoordinatesError):
            make_doc([make_element(box=(0, 1, 5, 2))])


class TestPages:
    def test_no_elements_on_page_error(self):
        with pytest.raises(NoElementsOnPageError):
            Doc(
                "t-000000",
                page=[1],
                x0=[0], x1=[1], y0=[0], y1=[1],
                text=["a"],
                all_page_numbers=[1, 2],
            )

    def test_page_not_found(self):
        doc = make_doc([make_element()])
        with pytest.raises(PageNotFoundError):
            doc.elements.filter_by_page(7)

    def test_page_dims(self):
        doc = make_doc([make_element()])
        assert doc.page_width(1) == 100.0
        assert doc.page_height(1) == 100.0


class TestCharFontMode:
    """Per-character font MODE (components.py:160-211): most common
    char fontname / raw height, Counter.most_common first-seen
    tie-break, round applied to the winning height."""

    def _doc(self, char_fonts=None, char_sizes=None, **config):
        return Doc(
            "test-000000",
            page=[1, 1],
            x0=[0, 0], x1=[5, 5], y0=[10, 0], y1=[15, 5],
            text=["ab", "cd"],
            font_name=["layoutF", "layoutF"],
            font_size=[7, 7],
            char_fonts=char_fonts,
            char_sizes=char_sizes,
            **config,
        )

    def test_mode_first_seen_matches_counter(self):
        from collections import Counter

        from py_pdf_parser_spark.kernel.doc import _mode_first_seen

        cases = [
            ["a", "b", "b", "a"],          # tie -> first seen ("a")
            ["b", "a", "a", "b"],          # tie -> "b"
            ["x"],
            ["p", "q", "q"],
            [3.0, 2.0, 3.0, 2.0, 1.0],
            [1.5, 2.5, 2.5],
        ]
        for vals in cases:
            assert _mode_first_seen(vals) == Counter(vals).most_common(1)[0][0]

    def test_font_name_is_mode(self):
        doc = self._doc(
            char_fonts=[["A", "B", "B"], ["C", "D", "C"]],
            char_sizes=[[10.0] * 3, [10.0] * 3],
        )
        assert list(doc.font_name) == ["B", "C"]

    def test_font_name_tie_breaks_first_seen(self):
        doc = self._doc(
            char_fonts=[["A", "B", "B", "A"], ["B", "A", "A", "B"]],
            char_sizes=[[10.0] * 4, [10.0] * 4],
        )
        assert list(doc.font_name) == ["A", "B"]

    def test_font_size_rounds_the_winning_mode(self):
        # mode of RAW heights (1.234) is computed first, THEN rounded —
        # not the mode of pre-rounded values.
        doc = self._doc(
            char_fonts=[["A", "A"], ["A", "A"]],
            char_sizes=[[1.234, 1.234, 9.0], [10.06, 10.06]],
        )
        assert list(doc.font_size) == [1.2, 10.1]

    def test_font_size_precision_applies_to_mode(self):
        doc = self._doc(
            char_fonts=[["A"], ["A"]],
            char_sizes=[[1.234], [1.234]],
            font_size_precision=0,
        )
        # round(1.234, 0) -> 1.0 (float stays float with ndigits given,
        # so the reference's f-string renders "1.0", components.py:208-231)
        assert list(doc.font_size) == [1.0, 1.0]
        assert all(f == "A,1.0" for f in doc.font)

    def test_empty_char_list_falls_back_to_layout(self):
        doc = self._doc(
            char_fonts=[[], ["Z"]],
            char_sizes=[[], [6.0]],
        )
        assert list(doc.font_name) == ["layoutF", "Z"]
        assert list(doc.font_size) == [7.0, 6.0]

    def test_char_lists_follow_element_reordering(self):
        # Element at y0=0 sorts AFTER y0=10 under L2R_T2B; char payloads
        # are supplied in INPUT order and must follow their element.
        doc = Doc(
            "test-000000",
            page=[1, 1],
            x0=[0, 0], x1=[5, 5], y0=[0, 10], y1=[5, 15],
            text=["low", "high"],
            char_fonts=[["L"], ["H"]],
            char_sizes=[[5.0], [9.0]],
        )
        assert list(doc.text_raw) == ["high", "low"]
        assert list(doc.font_name) == ["H", "L"]
        assert list(doc.font_size) == [9.0, 5.0]
