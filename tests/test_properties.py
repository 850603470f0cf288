"""Property-based tests (hypothesis) for the per-document kernel.

The reference has no property tests (SURVEY.md §5); these pin the
algebraic laws its fixture tests only sample:

  * ElementList set algebra == Python frozenset algebra on the same
    index sets (filtering.py:1077-1100 semantics).
  * Directional filters == the naive O(n^2) geometric definition.
  * before/after/between are consistent with index order.
  * Ordering presets are total, stable, and a permutation.
"""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from py_pdf_parser_spark.kernel.doc import BBox, Doc  # noqa: E402

settings.register_profile("ci", max_examples=60, deadline=None)
settings.load_profile("ci")


def _mk_doc(boxes, pages=None, ordering="L2R_T2B"):
    n = len(boxes)
    x0 = np.asarray([b[0] for b in boxes], dtype=np.float64)
    y0 = np.asarray([b[1] for b in boxes], dtype=np.float64)
    x1 = x0 + np.asarray([b[2] for b in boxes], dtype=np.float64)
    y1 = y0 + np.asarray([b[3] for b in boxes], dtype=np.float64)
    page = np.asarray(pages if pages is not None else [1] * n, dtype=np.int64)
    return Doc(
        "prop-000000",
        page=page,
        x0=x0, x1=x1, y0=y0, y1=y1,
        text=np.asarray([f"t{i}" for i in range(n)], dtype=object),
        offset=np.arange(n, dtype=np.int64),
        font_name=np.asarray(["f"] * n, dtype=object),
        font_size=[10] * n,
        page_width=200.0, page_height=200.0,
        element_ordering=ordering,
    )


# boxes: (x0, y0, w, h) with small integral coords so touching edges
# (closed-interval overlap, components.py:297-304) actually occur.
box = st.tuples(
    st.integers(0, 30), st.integers(0, 30),
    st.integers(1, 10), st.integers(1, 10),
)
boxes_strategy = st.lists(box, min_size=1, max_size=12)


@given(boxes_strategy, st.data())
def test_set_algebra_matches_frozensets(boxes, data):
    doc = _mk_doc(boxes)
    n = doc.n
    idx_a = data.draw(st.sets(st.integers(0, n - 1)))
    idx_b = data.draw(st.sets(st.integers(0, n - 1)))
    a = doc.elements.filter(lambda i: i in idx_a)
    b = doc.elements.filter(lambda i: i in idx_b)
    assert set(a | b) == idx_a | idx_b
    assert set(a & b) == idx_a & idx_b
    assert set(a - b) == idx_a - idx_b
    assert set(a ^ b) == idx_a ^ idx_b
    assert len(a) == len(idx_a)
    for i in range(n):
        assert (i in a) == (i in idx_a)


@given(boxes_strategy, st.data())
def test_partially_within_matches_naive(boxes, data):
    doc = _mk_doc(boxes)
    bx = data.draw(box)
    probe = BBox(bx[0], bx[0] + bx[2], bx[1], bx[1] + bx[3])
    got = set(doc.elements.filter_partially_within_bounding_box(probe, 1))
    want = {
        i for i in range(doc.n)
        if probe.x0 <= doc.x1[i] and probe.x1 >= doc.x0[i]
        and probe.y0 <= doc.y1[i] and probe.y1 >= doc.y0[i]
    }
    assert got == want


@given(boxes_strategy, st.data())
def test_directional_ops_match_naive(boxes, data):
    doc = _mk_doc(boxes)
    anchor = data.draw(st.integers(0, doc.n - 1))
    els = doc.elements
    right = set(els.to_the_right_of(anchor))
    want_right = {
        i for i in range(doc.n) if i != anchor
        and doc.x1[i] >= doc.x1[anchor] and doc.x0[i] <= 200.0
        and doc.y0[anchor] <= doc.y1[i] and doc.y1[anchor] >= doc.y0[i]
    }
    assert right == want_right
    below = set(els.below(anchor))
    # Probe box is (x0, x1, 0, anchor.y0); partially_within of it means
    # the element's BOTTOM is at or below the anchor's bottom
    # (filtering.py:455-520 + components.py:286-304, touching counts).
    want_below = {
        i for i in range(doc.n) if i != anchor
        and doc.x0[anchor] <= doc.x1[i] and doc.x1[anchor] >= doc.x0[i]
        and doc.y0[i] <= doc.y0[anchor]
    }
    assert below == want_below


@given(boxes_strategy, st.data())
def test_order_ops_consistent(boxes, data):
    doc = _mk_doc(boxes)
    els = doc.elements
    k = data.draw(st.integers(0, doc.n - 1))
    assert set(els.before(k)) == set(range(0, k))
    assert set(els.after(k)) == set(range(k + 1, doc.n))
    if doc.n >= 2:
        s = data.draw(st.integers(0, doc.n - 2))
        e = data.draw(st.integers(s + 1, doc.n - 1))
        assert set(els.between(s, e)) == set(range(s + 1, e))
        assert set(els.between(s, e, inclusive=True)) == set(range(s, e + 1))
    assert els.first() == 0
    assert els.last() == doc.n - 1


@given(boxes_strategy, st.sampled_from(
    ["L2R_T2B", "R2L_T2B", "T2B_L2R", "T2B_R2L"]
))
def test_ordering_presets_are_stable_permutations(boxes, preset):
    from py_pdf_parser_spark.kernel.doc import ORDER_PRESETS

    doc = _mk_doc(boxes, ordering=preset)
    n = doc.n
    # A permutation: every offset appears exactly once.
    assert sorted(doc.offset.tolist()) == list(range(n))
    # Matches Python's stable sorted() with the same key.
    keyfn = ORDER_PRESETS[preset]
    x0 = np.asarray([b[0] for b in boxes], dtype=np.float64)
    y0 = np.asarray([b[1] for b in boxes], dtype=np.float64)
    keys = keyfn(x0, y0)
    want = sorted(
        range(n), key=lambda i: tuple(float(k[i]) for k in keys)
    )
    assert doc.offset.tolist() == want


class TestModeProperties:
    """Per-char font mode == collections.Counter semantics on arbitrary
    value streams (components.py:160-211)."""

    @given(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=30
        )
    )
    def test_mode_matches_counter(self, values):
        from collections import Counter

        from py_pdf_parser_spark.kernel.doc import _mode_first_seen

        assert (
            _mode_first_seen(values) == Counter(values).most_common(1)[0][0]
        )

    @given(
        st.lists(
            st.floats(
                min_value=1.0, max_value=20.0,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=1, max_size=20,
        ),
        st.integers(min_value=0, max_value=3),
    )
    def test_size_mode_rounds_the_winner(self, heights, precision):
        from collections import Counter

        from py_pdf_parser_spark.kernel.doc import _mode_first_seen

        # round applied AFTER the mode, not before (components.py:208)
        want = round(Counter(heights).most_common(1)[0][0], precision)
        assert round(_mode_first_seen(heights), precision) == want

    @given(
        st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c", "d"]), max_size=12
            ),
            min_size=1,
            max_size=10,
        )
    )
    def test_flat_modes_match_counter_per_group(self, groups):
        """The vectorized flat batch kernel == per-group Counter, for
        all three payload forms (list-of-lists, flat values, codes)."""
        import numpy as np
        from collections import Counter

        from py_pdf_parser_spark.kernel.doc import (
            _flatten_payload,
            _modes_first_seen_flat,
        )

        want = [
            Counter(g).most_common(1)[0][0] if g else None for g in groups
        ]

        lengths, kwargs = _flatten_payload(groups)
        assert list(_modes_first_seen_flat(lengths=lengths, **kwargs)) == want

        flat = [v for g in groups for v in g]
        lens = np.array([len(g) for g in groups], dtype=np.int64)
        assert list(_modes_first_seen_flat(flat, lens)) == want

        alphabet = ["a", "b", "c", "d"]
        codes = np.array([alphabet.index(v) for v in flat], dtype=np.int64)
        assert (
            list(
                _modes_first_seen_flat(
                    None, lens, codes=codes, decode=alphabet
                )
            )
            == want
        )

    @given(
        st.lists(
            st.lists(
                st.floats(
                    min_value=1.0, max_value=9.0,
                    allow_nan=False, allow_infinity=False,
                ),
                max_size=10,
            ),
            min_size=1,
            max_size=8,
        )
    )
    def test_flat_modes_match_counter_float_groups(self, groups):
        import numpy as np
        from collections import Counter

        from py_pdf_parser_spark.kernel.doc import _modes_first_seen_flat

        want = [
            Counter(g).most_common(1)[0][0] if g else None for g in groups
        ]
        flat = np.array(
            [v for g in groups for v in g], dtype=np.float64
        )
        lens = np.array([len(g) for g in groups], dtype=np.int64)
        assert list(_modes_first_seen_flat(flat, lens)) == want


class TestChunkCapProperty:
    """Chunked bucket self-joins: every within-chunk pair is a
    within-bucket pair, chunk sizes never exceed the cap, and
    small buckets are untouched (dedup._chunk_capped contract)."""

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),  # bucket
                st.integers(min_value=0, max_value=10_000),  # doc id
            ),
            min_size=1, max_size=60, unique=True,
        ),
        st.integers(min_value=1, max_value=8),
    )
    def test_chunk_sizes_bounded_and_deterministic(self, rows, cap):
        # pure-python mirror of the rank-chunk rule
        from collections import defaultdict

        by_bucket = defaultdict(list)
        for bucket, doc in rows:
            by_bucket[bucket].append(doc)
        for bucket, docs in by_bucket.items():
            docs.sort()
            chunks = defaultdict(list)
            for rank, d in enumerate(docs):
                chunks[rank // cap].append(d)
            assert all(len(c) <= cap for c in chunks.values())
            if len(docs) <= cap:
                assert len(chunks) == 1  # under the cap: untouched
