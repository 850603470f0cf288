"""ElementList-equivalent operators (reference: tests/test_filtering.py)."""

import re

import pytest

from py_pdf_parser_spark.errors import (
    ElementOutOfRangeError,
    MultipleElementsFoundError,
    NoElementFoundError,
)

from .utils import make_doc, make_element


def six_identical():
    return make_doc([make_element(text=f"e{i}") for i in range(6)])


class TestSetAlgebra:
    def test_chaining_equals_and(self):
        doc = six_identical()
        doc.add_tag(0, "a")
        doc.add_tag(1, "a")
        doc.add_tag(1, "b")
        both = doc.elements.filter_by_tag("a").filter_by_tag("b")
        anded = doc.elements.filter_by_tag("a") & doc.elements.filter_by_tag("b")
        assert both == anded
        assert list(both) == [1]

    def test_plural_equals_or(self):
        doc = six_identical()
        doc.add_tag(0, "a")
        doc.add_tag(1, "b")
        assert doc.elements.filter_by_tags("a", "b") == (
            doc.elements.filter_by_tag("a") | doc.elements.filter_by_tag("b")
        )

    def test_sub_xor(self):
        doc = six_identical()
        a = doc.elements.before(3)  # 0,1,2
        b = doc.elements.after(1)  # 2,3,4,5
        assert list(a - b) == [0, 1]
        assert list(a ^ b) == [0, 1, 3, 4, 5]
        assert list(a & b) == [2]
        assert list(a | b) == [0, 1, 2, 3, 4, 5]

    def test_add_remove_element(self):
        doc = six_identical()
        lst = doc.elements.before(2)  # 0,1
        assert list(lst.add_element(4)) == [0, 1, 4]
        assert list(lst.add_element(0)) == [0, 1]  # already present: no-op
        assert list(lst.remove_element(1)) == [0]
        assert list(lst.remove_elements(0, 1)) == []

    def test_contains_len_getitem(self):
        doc = six_identical()
        lst = doc.elements.after(2)  # 3,4,5
        assert 4 in lst and 1 not in lst
        assert len(lst) == 3
        assert lst[0] == 3 and lst[-1] == 5
        assert list(lst[1:]) == [4, 5]

    def test_ignore_drops_from_new_lists(self):
        doc = six_identical()
        kept = doc.elements  # constructed pre-ignore keeps its indexes
        doc.ignore(2)
        assert list(kept) == [0, 1, 2, 3, 4, 5]
        assert list(doc.elements) == [0, 1, 3, 4, 5]
        assert list(kept.filter_by_text_equal("e2")) == []  # new list re-drops

    def test_ignore_elements_bulk(self):
        doc = six_identical()
        doc.elements.before(2).ignore_elements()
        assert list(doc.elements) == [2, 3, 4, 5]


class TestTextFilters:
    def make(self):
        return make_doc(
            [
                make_element(text="foo"),
                make_element(text="bar"),
                make_element(text="foobar"),
                make_element(text="baz"),
                make_element(text="foo 1"),
                make_element(text="foo 987 "),
                make_element(text=" Foo 100"),
            ]
        )

    def test_text_equal_stripped(self):
        doc = self.make()
        got = doc.elements.filter_by_text_equal("foo 987")
        assert [doc.text_of(i, stripped=False) for i in got] == ["foo 987 "]

    def test_text_equal_unstripped(self):
        doc = self.make()
        assert len(doc.elements.filter_by_text_equal("foo 987", stripped=False)) == 0
        assert len(doc.elements.filter_by_text_equal("foo 987 ", stripped=False)) == 1

    def test_text_contains(self):
        doc = self.make()
        got = doc.elements.filter_by_text_contains("foo")
        assert [doc.text_of(i) for i in got] == ["foo", "foobar", "foo 1", "foo 987"]

    def test_regex_is_match_anchored_not_fullmatch(self):
        doc = self.make()
        got = doc.elements.filter_by_regex("foo")
        # re.match: anchored at start, prefix match — "foobar" included.
        assert [doc.text_of(i) for i in got] == ["foo", "foobar", "foo 1", "foo 987"]

    def test_regex_flags_and_stripped(self):
        doc = self.make()
        got = doc.elements.filter_by_regex(r"foo \d+$", regex_flags=re.IGNORECASE)
        assert [doc.text_of(i) for i in got] == ["foo 1", "foo 987", "Foo 100"]

    def test_media_elements_never_match_text_filters(self):
        doc = make_doc(
            [
                make_element(text="foo"),
                make_element(text=None, kind="media", media_ref="m://x"),
            ]
        )
        assert len(doc.elements.filter_by_text_contains("")) == 1
        assert len(doc.elements.filter_by_regex(".*")) == 1


class TestFontAndPageFilters:
    def test_filter_by_font_and_size(self):
        doc = make_doc(
            [
                make_element(font_name="foo", font_size=2, text="a"),
                make_element(font_name="bar", font_size=3, text="b"),
                make_element(font_name="baz", font_size=3, text="c"),
            ],
            font_mapping={"foo,2": "font_a"},
        )
        assert [doc.text_of(i) for i in doc.elements.filter_by_font("font_a")] == ["a"]
        got = doc.elements.filter_by_fonts("font_a", "baz,3")
        assert [doc.text_of(i) for i in got] == ["a", "c"]
        assert [doc.text_of(i) for i in doc.elements.filter_by_font_size(3)] == [
            "b",
            "c",
        ]

    def test_filter_by_pages(self):
        doc = make_doc(
            {
                1: [make_element(text="p1")],
                2: [make_element(text="p2")],
                3: [make_element(text="p3")],
            }
        )
        assert [doc.text_of(i) for i in doc.elements.filter_by_page(2)] == ["p2"]
        got = doc.elements.filter_by_pages(1, 3)
        assert [doc.text_of(i) for i in got] == ["p1", "p3"]

    def test_filter_out_header_footer(self):
        doc = make_doc(
            [
                make_element(box=(0, 10, 92, 98), text="header"),
                make_element(box=(0, 10, 50, 60), text="body"),
                make_element(box=(0, 10, 88, 93), text="straddles"),
                make_element(box=(0, 10, 2, 6), text="footer"),
            ]
        )
        no_header = doc.elements.filter_out_header(90)
        assert [doc.text_of(i) for i in no_header] == ["straddles", "body", "footer"]
        no_footer = doc.elements.filter_out_footer(8)
        assert [doc.text_of(i) for i in no_footer] == ["header", "straddles", "body"]


def anchor_doc():
    """Anchor at (50,51,50,51) on page 1 with directional peers
    (reference tests/test_filtering.py:344-996 geometry)."""
    return make_doc(
        {
            1: [
                make_element(box=(50, 51, 50, 51), text="anchor"),
                make_element(box=(60, 70, 50, 51), text="right"),
                make_element(box=(30, 40, 50, 51), text="left"),
                make_element(box=(50, 51, 60, 70), text="above"),
                make_element(box=(50, 51, 30, 40), text="below"),
                make_element(box=(60, 70, 50.5, 52), text="right-partial"),
                make_element(box=(80, 90, 80, 90), text="corner"),
            ],
            2: [
                make_element(box=(50, 51, 80, 90), text="p2-inline"),
                make_element(box=(10, 20, 10, 20), text="p2-off"),
            ],
        }
    )


def _anchor(doc):
    return doc.elements.filter_by_text_equal("anchor").extract_single_element()


class TestDirectional:
    def test_to_the_right_of(self):
        doc = anchor_doc()
        got = doc.elements.to_the_right_of(_anchor(doc))
        assert sorted(doc.text_of(i) for i in got) == ["right", "right-partial"]

    def test_to_the_right_of_inclusive(self):
        doc = anchor_doc()
        got = doc.elements.to_the_right_of(_anchor(doc), inclusive=True)
        assert "anchor" in [doc.text_of(i) for i in got]

    def test_to_the_left_of(self):
        doc = anchor_doc()
        got = doc.elements.to_the_left_of(_anchor(doc))
        assert [doc.text_of(i) for i in got] == ["left"]

    def test_above_below_same_page(self):
        doc = anchor_doc()
        a = _anchor(doc)
        assert [doc.text_of(i) for i in doc.elements.above(a)] == ["above"]
        assert [doc.text_of(i) for i in doc.elements.below(a)] == ["below"]

    def test_below_all_pages(self):
        doc = anchor_doc()
        got = doc.elements.below(_anchor(doc), all_pages=True)
        assert sorted(doc.text_of(i) for i in got) == ["below", "p2-inline"]

    def test_above_all_pages_from_page2(self):
        doc = anchor_doc()
        p2 = doc.elements.filter_by_text_equal("p2-inline").extract_single_element()
        got = doc.elements.above(p2, all_pages=True)
        texts = sorted(doc.text_of(i) for i in got)
        assert texts == ["above", "anchor", "below"]

    def test_vertically_in_line_with(self):
        doc = anchor_doc()
        got = doc.elements.vertically_in_line_with(_anchor(doc))
        assert sorted(doc.text_of(i) for i in got) == ["above", "below"]

    def test_vertically_in_line_with_all_pages(self):
        doc = anchor_doc()
        got = doc.elements.vertically_in_line_with(_anchor(doc), all_pages=True)
        assert sorted(doc.text_of(i) for i in got) == ["above", "below", "p2-inline"]

    def test_horizontally_in_line_with(self):
        doc = anchor_doc()
        got = doc.elements.horizontally_in_line_with(_anchor(doc))
        assert sorted(doc.text_of(i) for i in got) == ["left", "right", "right-partial"]

    def test_tolerance_excludes_partial_overlap(self):
        doc = anchor_doc()
        # anchor y in [50,51]; right-partial y in [50.5,52]: overlap 0.5.
        # tolerance 0.4 shrinks probe to [50.4,50.6] — still overlaps;
        # capping: tolerance=10 caps at height/2=0.5 -> probe [50.5,50.5],
        # still touching (closed intervals) -> included.
        got = doc.elements.to_the_right_of(_anchor(doc), tolerance=0.4)
        assert sorted(doc.text_of(i) for i in got) == ["right", "right-partial"]
        got_capped = doc.elements.to_the_right_of(_anchor(doc), tolerance=10)
        assert sorted(doc.text_of(i) for i in got_capped) == ["right", "right-partial"]

    def test_tolerance_cap_is_half_height(self):
        # Distinct overlap: peer overlaps anchor's y by only the top 0.2.
        doc = make_doc(
            [
                make_element(box=(0, 1, 50, 51), text="anchor"),
                make_element(box=(10, 20, 50.8, 52), text="peer"),
            ]
        )
        a = doc.elements.filter_by_text_equal("anchor").extract_single_element()
        assert len(doc.elements.to_the_right_of(a, tolerance=0.1)) == 1
        # tolerance 0.3 -> probe y [50.3, 50.7]; peer starts at 50.8 -> out.
        assert len(doc.elements.to_the_right_of(a, tolerance=0.3)) == 0


class TestOrderOps:
    def test_before_after_between(self):
        doc = six_identical()
        assert list(doc.elements.before(3)) == [0, 1, 2]
        assert list(doc.elements.before(3, inclusive=True)) == [0, 1, 2, 3]
        assert list(doc.elements.after(3)) == [4, 5]
        assert list(doc.elements.after(3, inclusive=True)) == [3, 4, 5]
        assert list(doc.elements.between(1, 4)) == [2, 3]
        assert list(doc.elements.between(1, 4, inclusive=True)) == [1, 2, 3, 4]

    def test_move_forwards_backwards(self):
        doc = six_identical()
        lst = doc.elements.filter_by_text_contains("e")  # all
        assert lst.move_forwards_from(2) == 3
        assert lst.move_backwards_from(2) == 1
        assert lst.move_forwards_from(2, count=0) == 2
        assert lst.move_forwards_from(2, count=-2) == 0
        with pytest.raises(ElementOutOfRangeError):
            lst.move_forwards_from(5)
        assert lst.move_forwards_from(5, capped=True) == 5
        with pytest.raises(ElementOutOfRangeError):
            lst.move_backwards_from(0)
        assert lst.move_backwards_from(0, capped=True) == 0

    def test_move_skips_filtered_out(self):
        doc = six_identical()
        lst = doc.elements.remove_elements(1, 2)  # 0,3,4,5
        assert lst.move_forwards_from(0) == 3

    def test_first_last_single(self):
        doc = six_identical()
        assert doc.elements.first() == 0
        assert doc.elements.last() == 5
        with pytest.raises(NoElementFoundError):
            doc.elements.filter_by_text_equal("nope").first()
        with pytest.raises(NoElementFoundError):
            doc.elements.filter_by_text_equal("nope").extract_single_element()
        with pytest.raises(MultipleElementsFoundError):
            doc.elements.extract_single_element()
        single = doc.elements.filter_by_text_equal("e3")
        assert single.extract_single_element() == 3


class TestSections:
    def test_create_and_lookup(self):
        doc = six_identical()
        s0 = doc.sectioning.create_section("sec", 0, 2)
        s1 = doc.sectioning.create_section("sec", 2, 4)
        assert s0.unique_name == "sec_0" and s1.unique_name == "sec_1"
        assert list(s0.elements()) == [0, 1, 2]
        assert [s.unique_name for s in doc.sectioning.get_sections_with_name("sec")] == [
            "sec_0",
            "sec_1",
        ]
        assert doc.sectioning.get_section("sec_1") is s1

    def test_include_last_element_false(self):
        doc = six_identical()
        s = doc.sectioning.create_section("s", 1, 4, include_last_element=False)
        assert list(s.elements()) == [1, 2, 3]

    def test_include_last_element_false_at_zero_raises(self):
        from py_pdf_parser_spark.errors import InvalidSectionError

        doc = six_identical()
        with pytest.raises(InvalidSectionError):
            doc.sectioning.create_section("s", 0, 0, include_last_element=False)

    def test_invalid_section(self):
        from py_pdf_parser_spark.errors import InvalidSectionError

        doc = six_identical()
        with pytest.raises(InvalidSectionError):
            doc.sectioning.create_section("s", 4, 1)

    def test_filter_by_section_name_and_missing(self):
        from py_pdf_parser_spark.errors import SectionNotFoundError

        doc = six_identical()
        doc.sectioning.create_section("sec", 0, 2)
        doc.sectioning.create_section("sec", 4, 5)
        doc.sectioning.create_section("other", 3, 3)
        got = doc.elements.filter_by_section_name("sec")
        assert list(got) == [0, 1, 2, 4, 5]
        assert list(doc.elements.filter_by_section("other_0")) == [3]
        assert list(doc.elements.filter_by_section("missing_9")) == []
        assert list(doc.elements.filter_by_sections("sec_1", "other_0")) == [3, 4, 5]
        with pytest.raises(SectionNotFoundError):
            doc.sectioning.get_section("missing_9")

    def test_elements_in_multiple_sections(self):
        doc = six_identical()
        doc.sectioning.create_section("a", 0, 3)
        doc.sectioning.create_section("b", 2, 5)
        in_both = doc.elements.filter_by_section_name("a") & (
            doc.elements.filter_by_section_name("b")
        )
        assert list(in_both) == [2, 3]
