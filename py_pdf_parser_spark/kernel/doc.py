"""Per-document vectorized element model.

This is the in-kernel (inside a pandas/Arrow UDF batch) equivalent of the
reference's ``PDFDocument`` + ``PDFElement`` + ``ElementList``
(/root/reference/py_pdf_parser/components.py, filtering.py) — re-expressed
over numpy arrays for one document instead of a Python object graph.

Semantics intentionally preserved (see SURVEY.md §2, §7 "hard parts"):
  * element ordering: per-page stable sort by the preset key, pages in
    ascending page-number order; global ``idx`` assigned over the result
    (components.py:406-424, 30-43).  Stable ties keep input (offset) order.
  * ``font`` = ``f"{font_name},{round(font_size, precision)}"`` using
    *Python* round (half-to-even) and Python int/float repr, then mapped
    through ``font_mapping`` — regex mode tries ``re.match`` over mapping
    items in insertion order, first hit wins, with fall-through to the
    exact ``.get(font) or font`` lookup (components.py:213-238).
  * geometry predicates use closed intervals — touching counts
    (components.py:286-304).
  * directional operators shrink the probe box by ``tolerance`` capped at
    half the element's height/width (filtering.py:398,443,495,563,628,686).
  * every newly created element set re-drops ignored elements
    (filtering.py:95).
  * Python ``re.match`` (anchored, not fullmatch) and ``str.strip``
    (all unicode whitespace) semantics for text ops (filtering.py:198,
    components.py:318).

An ``Elems`` value is a sorted ``numpy.int64`` array of element indexes —
the columnar analogue of the reference's ``frozenset[int]``.
"""

from __future__ import annotations

import itertools
import re
from typing import Callable, Dict, List, Optional, Sequence, Union

import numpy as np

from ..errors import (
    ElementOutOfRangeError,
    InvalidCoordinatesError,
    MultipleElementsFoundError,
    NoElementFoundError,
    NoElementsOnPageError,
    PageNotFoundError,
)

# Ordering presets (components.py:30-43).  Keys are (primary, secondary)
# sort keys applied per page; stable sort keeps input order for ties.
ORDER_PRESETS = {
    "L2R_T2B": lambda x0, y0: (-y0, x0),
    "R2L_T2B": lambda x0, y0: (-y0, -x0),
    "T2B_L2R": lambda x0, y0: (x0, -y0),
    "T2B_R2L": lambda x0, y0: (-x0, -y0),
}

class _OrderView:
    """Lightweight per-element view handed to ``PageOrdering`` callables
    (the stand-in for the pdfminer objects the reference passes,
    components.py:357-361): geometry attributes + the span text."""

    __slots__ = ("x0", "x1", "y0", "y1", "text", "_i")

    def __init__(self, x0, x1, y0, y1, text, i):
        self.x0, self.x1, self.y0, self.y1 = x0, x1, y0, y1
        self.text = text
        self._i = i

    def get_text(self):
        return self.text


class PageOrdering:
    """Arbitrary per-page element ordering — the reference's callable
    form (components.py:409-413): a ``List -> List`` function called
    once per page with that page's elements (input order) and returning
    them in the desired order.  Unlike a geometric key function this
    expresses e.g. ``reversed`` or data-dependent column layouts.
    Elements the callable omits are dropped (reference semantics: the
    document is built from exactly what the callable returns).

    Use: ``Doc(..., element_ordering=PageOrdering(fn))`` or
    ``config={"element_ordering": PageOrdering(fn)}`` at parse level.
    """

    __slots__ = ("fn",)

    def __init__(self, fn: Callable[[list], list]):
        self.fn = fn


OrderingSpec = Union[
    str, Callable[[np.ndarray, np.ndarray], tuple], PageOrdering
]


class BBox:
    """Axis-aligned rectangle, y increases upward (common.py:4-57)."""

    __slots__ = ("x0", "x1", "y0", "y1")

    def __init__(self, x0: float, x1: float, y0: float, y1: float):
        if x1 < x0:
            raise InvalidCoordinatesError(f"x1 ({x1}) must be >= x0 ({x0})")
        if y1 < y0:
            raise InvalidCoordinatesError(f"y1 ({y1}) must be >= y0 ({y0})")
        self.x0, self.x1, self.y0, self.y1 = x0, x1, y0, y1

    @property
    def width(self) -> float:
        return self.x1 - self.x0

    @property
    def height(self) -> float:
        return self.y1 - self.y0

    def __repr__(self) -> str:
        return f"BBox(x0={self.x0}, x1={self.x1}, y0={self.y0}, y1={self.y1})"


def _python_format_size(value) -> str:
    """Format a rounded font size the way the reference's f-string does.

    ``round(10, 1)`` is the int 10 -> "10"; ``round(10.0, 1)`` -> "10.0".
    """
    return str(value)


def _mode_first_seen(values):
    """``Counter(values).most_common(1)[0][0]`` semantics
    (components.py:174-182,199-207): the most common value; ties broken
    by FIRST insertion order (Counter preserves first-seen order and
    ``nlargest``/``max`` return the earliest maximal item).

    Reference model only (differential tests); the batch path is
    :func:`_modes_first_seen_flat`."""
    counts: Dict = {}
    for v in values:
        counts[v] = counts.get(v, 0) + 1
    return max(counts.items(), key=lambda kv: kv[1])[0]


def _modes_first_seen_flat(values, lengths, codes=None, decode=None):
    """Vectorized per-group :func:`_mode_first_seen` over a FLAT payload.

    ``values``: the concatenated per-element char values (group g owns
    the slice ``[cum(lengths[:g]), cum(lengths[:g+1]))``).  Returns an
    object array of length ``len(lengths)`` holding each non-empty
    group's mode (``None`` for empty groups).  Tie-break matches
    Counter exactly: among max-count values, the one whose first
    occurrence in the group is earliest wins, and the returned object
    is that first-seen instance (Counter keeps the first-seen key).

    ``codes``/``decode``: optional pre-factorized form — ``codes`` are
    small non-negative ints and the winner is ``decode[code]``; skips
    the ``np.unique`` factorization (object-array sorts cost a Python
    compare per step, so callers that already know the alphabet, e.g.
    the synthetic char payload, pass codes directly).
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    n_groups = len(lengths)
    modes = np.full(n_groups, None, dtype=object)
    if codes is None:
        values = np.asarray(values)
        if len(values) == 0:
            return modes
        uniq, codes = np.unique(values, return_inverse=True)
    else:
        codes = np.asarray(codes, dtype=np.int64)
        if len(codes) == 0:
            return modes
    group = np.repeat(np.arange(n_groups, dtype=np.int64), lengths)
    # Stable sort by (group, code): runs of one (group, code) pair stay
    # in flat-position order, so a run's first element IS the pair's
    # first occurrence within its group.
    order = np.lexsort((codes, group))
    g_sorted = group[order]
    c_sorted = codes[order]
    is_start = np.empty(len(order), dtype=bool)
    is_start[0] = True
    is_start[1:] = (g_sorted[1:] != g_sorted[:-1]) | (
        c_sorted[1:] != c_sorted[:-1]
    )
    starts = np.flatnonzero(is_start)
    counts = np.diff(np.append(starts, len(order)))
    first_pos = order[starts]
    pair_group = g_sorted[starts]
    # Winner per group = max count, tie -> earliest first occurrence:
    # sort pairs by (group, -count, first_pos) and take each group's
    # leading pair.
    sel = np.lexsort((first_pos, -counts, pair_group))
    lead = np.empty(len(sel), dtype=bool)
    lead[0] = True
    lead[1:] = pair_group[sel][1:] != pair_group[sel][:-1]
    winners = sel[lead]
    if decode is not None:
        won = np.asarray(decode, dtype=object)[c_sorted[starts][winners]]
    else:
        won = values[first_pos[winners]]
    modes[pair_group[winners]] = won
    return modes


def _flatten_payload(payload):
    """Normalize a per-char payload to flat form.

    Accepts a list-of-lists (one char-value list per element, input
    order), ``(flat_values, lengths)``, or ``(codes, lengths, decode)``
    — the latter two are the zero-copy forms the Arrow/synthetic parse
    paths produce.  Returns ``(lengths, mode_kwargs)`` for
    :func:`_modes_first_seen_flat`.
    """
    if isinstance(payload, tuple):
        if len(payload) == 3:
            codes, lengths, decode = payload
            return np.asarray(lengths, dtype=np.int64), {
                "values": None,
                "codes": codes,
                "decode": decode,
            }
        flat, lengths = payload
        return np.asarray(lengths, dtype=np.int64), {"values": flat}
    lengths = np.fromiter(
        (len(v) for v in payload), dtype=np.int64, count=len(payload)
    )
    flat = np.asarray(
        list(itertools.chain.from_iterable(payload)), dtype=object
    )
    return lengths, {"values": flat}


class Doc:
    """One document's elements as parallel numpy arrays, sorted by idx.

    Construction applies per-page ordering and assigns the global ``idx``
    exactly like ``PDFDocument.__init__`` (components.py:406-438).
    """

    def __init__(
        self,
        doc_id: str,
        *,
        page: Sequence[int],
        x0: Sequence[float],
        x1: Sequence[float],
        y0: Sequence[float],
        y1: Sequence[float],
        text: Sequence[Optional[str]],
        kind: Optional[Sequence[str]] = None,
        media_ref: Optional[Sequence[Optional[str]]] = None,
        offset: Optional[Sequence[int]] = None,
        font_name: Optional[Sequence[str]] = None,
        font_size: Optional[Sequence[float]] = None,
        char_fonts: Optional[Sequence[Sequence[str]]] = None,
        char_sizes: Optional[Sequence[Sequence[float]]] = None,
        page_width: Union[float, Dict[int, float]] = 100.0,
        page_height: Union[float, Dict[int, float]] = 100.0,
        font_mapping: Optional[Dict[str, str]] = None,
        font_mapping_is_regex: bool = False,
        regex_flags: int = 0,
        font_size_precision: int = 1,
        element_ordering: OrderingSpec = "L2R_T2B",
        all_page_numbers: Optional[Sequence[int]] = None,
    ):
        self.doc_id = doc_id
        n = len(x0)
        page_arr = np.asarray(page, dtype=np.int64)
        x0a = np.asarray(x0, dtype=np.float64)
        x1a = np.asarray(x1, dtype=np.float64)
        y0a = np.asarray(y0, dtype=np.float64)
        y1a = np.asarray(y1, dtype=np.float64)
        if (x1a < x0a).any() or (y1a < y0a).any():
            raise InvalidCoordinatesError(f"doc {doc_id}: box with x1<x0 or y1<y0")
        offset_arr = (
            np.arange(n, dtype=np.int64)
            if offset is None
            else np.asarray(offset, dtype=np.int64)
        )

        if not isinstance(text, np.ndarray):
            text = np.asarray(list(text), dtype=object)

        order = self._order_indexes(
            page_arr, x0a, y0a, offset_arr, element_ordering,
            x1=x1a, y1=y1a, text=text,
        )

        self.page = page_arr[order]
        self.x0 = x0a[order]
        self.x1 = x1a[order]
        self.y0 = y0a[order]
        self.y1 = y1a[order]
        self.offset = offset_arr[order]
        self.text_raw = text[order]
        # a PageOrdering callable may DROP elements (reference: the doc
        # is built from exactly what the callable returns) — size the
        # default fills by the ordered length, not the input length.
        n_out = len(order)
        if kind is None:
            self.kind = np.full(n_out, "text", dtype=object)
        else:
            if not isinstance(kind, np.ndarray):
                kind = np.asarray(list(kind), dtype=object)
            self.kind = kind[order]
        if media_ref is None:
            self.media_ref = np.full(n_out, None, dtype=object)
        else:
            if not isinstance(media_ref, np.ndarray):
                media_ref = np.asarray(list(media_ref), dtype=object)
            self.media_ref = media_ref[order]

        # Fonts are computed lazily (most recipes never touch them) —
        # exactly like the reference's memoized properties
        # (components.py:171-183,197-211,228-238), but batched.
        self._order = order
        self._font_name_in = font_name
        self._font_size_in = font_size
        # Optional per-character payloads (input order, list per element):
        # when present, font_name/font_size are the per-element MODE over
        # characters (components.py:160-211), not the layout's value.
        self._char_fonts_in = char_fonts
        self._char_sizes_in = char_sizes
        self._font_mapping = font_mapping or {}
        self._font_mapping_is_regex = font_mapping_is_regex
        self._regex_flags = regex_flags
        self._font_size_precision = font_size_precision
        self._font_name = None
        self._font_size = None
        self._font_size_repr_memo = None
        self._font = None
        self._tags = None
        self._text_stripped = None
        self._sectioning = None
        self._page_numbers = None

        self.n = n_out  # == n unless a PageOrdering callable dropped rows
        self.ignored = np.zeros(n_out, dtype=bool)

        # Page registry: width/height per page + NoElementsOnPageError for
        # declared-but-empty pages (components.py:426-429).  The scan is
        # only needed when pages are declared explicitly.
        self._page_width = page_width
        self._page_height = page_height
        if all_page_numbers is not None:
            present = set(int(p) for p in self.page)
            for p in sorted(set(int(p) for p in all_page_numbers)):
                if p not in present:
                    raise NoElementsOnPageError(
                        f"No elements on page {p}, please exclude this page"
                    )

    # -- lazy memoized columns ------------------------------------------------

    @property
    def page_numbers(self) -> list:
        if self._page_numbers is None:
            self._page_numbers = [int(p) for p in np.unique(self.page)]
        return self._page_numbers

    @property
    def font_name(self) -> np.ndarray:
        if self._font_name is None:
            fn = self._font_name_in
            if fn is None:
                base = np.full(self.n, "fake_font", dtype=object)
            else:
                if not isinstance(fn, np.ndarray):
                    fn = np.asarray(list(fn), dtype=object)
                base = fn[self._order]
            cf = self._char_fonts_in
            if cf is not None:
                # Mode of per-char fontnames, first-seen tie-break
                # (components.py:174-182); empty char list (media spans)
                # falls back to the layout value.
                lengths, kwargs = _flatten_payload(cf)
                modes = _modes_first_seen_flat(lengths=lengths, **kwargs)
                base = np.where(
                    lengths[self._order] > 0, modes[self._order], base
                )
            self._font_name = base
        return self._font_name

    def _rounded_sizes(self) -> list:
        sizes = self._font_size_in
        if sizes is None:
            sizes = [10] * self.n
        else:
            sizes = list(sizes)
        sizes = [sizes[i] for i in self._order]
        cs = self._char_sizes_in
        if cs is not None:
            # Mode of RAW per-char heights first, THEN round the winner
            # (components.py:199-209) — not the mode of rounded values.
            lengths, kwargs = _flatten_payload(cs)
            modes = _modes_first_seen_flat(lengths=lengths, **kwargs)
            sizes = [
                modes[i] if lengths[i] else sizes[pos]
                for pos, i in enumerate(self._order)
            ]
        # Python round: half-to-even; int input stays int (load-bearing for
        # the font string, components.py:208-210,231).
        return [round(s, self._font_size_precision) for s in sizes]

    @property
    def font_size(self) -> np.ndarray:
        if self._font_size is None:
            self._font_size = np.asarray(
                [float(s) for s in self._rounded_sizes()], dtype=np.float64
            )
        return self._font_size

    @property
    def _font_size_repr(self) -> list:
        if self._font_size_repr_memo is None:
            self._font_size_repr_memo = [
                _python_format_size(s) for s in self._rounded_sizes()
            ]
        return self._font_size_repr_memo

    @property
    def font(self) -> np.ndarray:
        if self._font is None:
            self._font = self._map_fonts(
                self._font_mapping, self._font_mapping_is_regex, self._regex_flags
            )
        return self._font

    @property
    def tags(self) -> List[set]:
        if self._tags is None:
            self._tags = [set() for _ in range(self.n)]
        return self._tags

    @property
    def text_stripped(self) -> np.ndarray:
        # text(stripped=True): Python str.strip (unicode whitespace).
        if self._text_stripped is None:
            self._text_stripped = np.asarray(
                [t.strip() if isinstance(t, str) else t for t in self.text_raw],
                dtype=object,
            )
        return self._text_stripped

    @property
    def sectioning(self):
        if self._sectioning is None:
            from .sections import Sectioning  # local import avoids cycle

            self._sectioning = Sectioning(self)
        return self._sectioning

    # -- construction helpers -------------------------------------------------

    @staticmethod
    def _order_indexes(
        page, x0, y0, offset, ordering: OrderingSpec,
        x1=None, y1=None, text=None,
    ) -> np.ndarray:
        """Global element order: pages ascending, then per-page preset key,
        ties broken by input offset (stable, matches Python sorted).

        A ``PageOrdering`` spec instead runs an arbitrary per-page
        permutation callable (components.py:409-413): pages ascending,
        each page's elements handed over in input-offset order."""
        if isinstance(ordering, PageOrdering):
            in_order = np.lexsort((offset, page))
            pages_sorted = page[in_order]
            out: list = []
            start = 0
            m = len(in_order)
            for end in range(1, m + 1):
                if end == m or pages_sorted[end] != pages_sorted[start]:
                    views = [
                        _OrderView(
                            x0[j], x1[j], y0[j], y1[j],
                            None if text is None else text[j], int(j),
                        )
                        for j in in_order[start:end]
                    ]
                    out.extend(v._i for v in ordering.fn(views))
                    start = end
            return np.asarray(out, dtype=np.int64)
        if callable(ordering):
            keys = ordering(x0, y0)
        else:
            try:
                keys = ORDER_PRESETS[ordering](x0, y0)
            except KeyError:
                raise ValueError(f"unknown element_ordering preset: {ordering}")
        # np.lexsort: last key is primary.  Page is most significant (pages
        # ascending), then the per-page key tuple, then input offset (stable).
        lex_keys = (offset,) + tuple(np.asarray(k) for k in reversed(keys)) + (page,)
        return np.lexsort(lex_keys)

    def _map_fonts(
        self, mapping: Dict[str, str], is_regex: bool, flags: int
    ) -> np.ndarray:
        """font strings after font_mapping (components.py:213-238)."""
        raw = np.asarray(
            [
                f"{name},{size_repr}"
                for name, size_repr in zip(self.font_name, self._font_size_repr)
            ],
            dtype=object,
        )
        if not mapping:
            return raw
        out = raw.copy()
        resolved = np.zeros(len(raw), dtype=bool)
        if is_regex:
            # Ordered vectorized passes: one compiled regex per mapping entry,
            # applied only to not-yet-matched rows (first hit wins).
            for pattern, mapped in mapping.items():
                rx = re.compile(pattern, flags)
                todo = ~resolved
                if not todo.any():
                    break
                hits = np.asarray(
                    [bool(rx.match(f)) if t else False for f, t in zip(raw, todo)]
                )
                out[hits] = mapped
                resolved |= hits
        # Exact lookup for unresolved rows; falsy mapped value falls back to
        # the raw font (``.get(font) or font``, components.py:237).  Plain
        # dict lookups: per-document element counts are tens of rows, where
        # pandas Series construction costs more than the lookups themselves
        # (measured 2.6x on the ordsum family kernel path).
        todo = ~resolved
        if todo.any():
            idx = np.nonzero(todo)[0]
            out[idx] = [mapping.get(f) or f for f in out[idx]]
        return out

    # -- page info ------------------------------------------------------------

    def page_width(self, page_number: int) -> float:
        if page_number not in self.page_numbers:
            raise PageNotFoundError(f"Could not find page {page_number}")
        if isinstance(self._page_width, dict):
            return self._page_width[page_number]
        return self._page_width

    def page_height(self, page_number: int) -> float:
        if page_number not in self.page_numbers:
            raise PageNotFoundError(f"Could not find page {page_number}")
        if isinstance(self._page_height, dict):
            return self._page_height[page_number]
        return self._page_height

    # -- element access ---------------------------------------------------

    @property
    def elements(self) -> "Elems":
        """All (non-ignored) elements (components.py:444-452)."""
        return Elems(self, np.arange(self.n, dtype=np.int64), _presorted=True)

    def fonts(self) -> set:
        """Distinct fonts over non-ignored elements (components.py:464-472)."""
        return set(self.font[~self.ignored])

    def bbox(self, i: int) -> BBox:
        return BBox(self.x0[i], self.x1[i], self.y0[i], self.y1[i])

    def text_of(self, i: int, stripped: bool = True) -> Optional[str]:
        return self.text_stripped[i] if stripped else self.text_raw[i]

    def add_tag(self, i: int, tag: str) -> None:
        self.tags[i].add(tag)

    def ignore(self, i: int) -> None:
        self.ignored[i] = True


class Elems:
    """Sorted index array over one Doc — the reference's ElementList.

    Newly-ignored elements are dropped at construction (filtering.py:95).
    Hashable/immutable so table extraction can use sets of rows/columns.
    """

    __slots__ = ("doc", "idx")

    def __init__(self, doc: Doc, idx: np.ndarray, _presorted: bool = False):
        arr = np.asarray(idx, dtype=np.int64)
        if not _presorted:
            arr = np.unique(arr)
        live = ~doc.ignored[arr]
        if not live.all():
            arr = arr[live]
        self.doc = doc
        self.idx = arr
        self.idx.setflags(write=False)

    # -- internals ----------------------------------------------------------

    def _wrap(self, idx: np.ndarray) -> "Elems":
        return Elems(self.doc, idx)

    def _mask_to_elems(self, mask_over_self: np.ndarray) -> "Elems":
        return Elems(self.doc, self.idx[mask_over_self], _presorted=True)

    # -- set protocol (filtering.py:1024-1100) -------------------------------

    def __len__(self) -> int:
        return len(self.idx)

    def __contains__(self, i: int) -> bool:
        pos = np.searchsorted(self.idx, i)
        return pos < len(self.idx) and self.idx[pos] == i

    def __iter__(self):
        return iter(self.idx.tolist())

    def __eq__(self, other) -> bool:
        if not isinstance(other, Elems):
            raise NotImplementedError(f"Can't compare Elems with {type(other)}")
        return self.doc is other.doc and np.array_equal(self.idx, other.idx)

    def __hash__(self) -> int:
        return hash((id(self.doc), self.idx.tobytes()))

    # self.idx is invariantly sorted-unique, so every set op below may
    # assume uniqueness and hand its (sorted) result straight back via
    # _presorted — skipping numpy's internal re-sort/re-unique passes.
    # The ignored-drop in __init__ still applies (filtering.py:95).

    def __or__(self, other: "Elems") -> "Elems":
        return Elems(
            self.doc, np.union1d(self.idx, other.idx), _presorted=True
        )

    def __and__(self, other: "Elems") -> "Elems":
        return Elems(
            self.doc,
            np.intersect1d(self.idx, other.idx, assume_unique=True),
            _presorted=True,
        )

    def __sub__(self, other: "Elems") -> "Elems":
        return Elems(
            self.doc,
            np.setdiff1d(self.idx, other.idx, assume_unique=True),
            _presorted=True,
        )

    def __xor__(self, other: "Elems") -> "Elems":
        return Elems(
            self.doc,
            np.setxor1d(self.idx, other.idx, assume_unique=True),
            _presorted=True,
        )

    def __getitem__(self, key):
        if isinstance(key, slice):
            return self._wrap(self.idx[key])
        return int(self.idx[key])  # IndexError propagates like the reference

    def add_element(self, i: int) -> "Elems":
        return self._wrap(np.append(self.idx, i))

    def add_elements(self, *indexes: int) -> "Elems":
        return self._wrap(np.append(self.idx, np.asarray(indexes, dtype=np.int64)))

    def remove_element(self, i: int) -> "Elems":
        return self._mask_to_elems(self.idx != i)

    def remove_elements(self, *indexes: int) -> "Elems":
        return self._mask_to_elems(~np.isin(self.idx, list(indexes)))

    # -- scalar extraction (filtering.py:789-811,980-1010) -------------------

    def first(self) -> int:
        if len(self.idx) == 0:
            raise NoElementFoundError("There are no elements in the ElementList")
        return int(self.idx[0])

    def last(self) -> int:
        if len(self.idx) == 0:
            raise NoElementFoundError("There are no elements in the ElementList")
        return int(self.idx[-1])

    def extract_single_element(self) -> int:
        if len(self.idx) == 0:
            raise NoElementFoundError("There are no elements in the ElementList")
        if len(self.idx) > 1:
            raise MultipleElementsFoundError(
                f"There are {len(self.idx)} elements in the ElementList"
            )
        return int(self.idx[0])

    # -- tag / ignore bulk ops (filtering.py:97-105,358-364) -----------------

    def add_tag_to_elements(self, tag: str) -> None:
        for i in self.idx:
            self.doc.tags[i].add(tag)

    def ignore_elements(self) -> None:
        self.doc.ignored[self.idx] = True

    # -- text / font / page filters (filtering.py:107-269) -------------------

    def filter(self, predicate: Callable[[int], bool]) -> "Elems":
        mask = np.asarray([bool(predicate(int(i))) for i in self.idx], dtype=bool)
        return self._mask_to_elems(mask)

    def _texts(self, stripped: bool = True) -> np.ndarray:
        src = self.doc.text_stripped if stripped else self.doc.text_raw
        return src[self.idx]

    def filter_by_text_equal(self, text: str, stripped: bool = True) -> "Elems":
        mask = np.asarray([t == text for t in self._texts(stripped)], dtype=bool)
        return self._mask_to_elems(mask)

    def filter_by_text_contains(self, text: str) -> "Elems":
        mask = np.asarray(
            [isinstance(t, str) and text in t for t in self._texts(True)], dtype=bool
        )
        return self._mask_to_elems(mask)

    def filter_by_regex(
        self, regex: str, regex_flags: int = 0, stripped: bool = True
    ) -> "Elems":
        rx = re.compile(regex, regex_flags)  # re.match semantics: anchored start
        mask = np.asarray(
            [isinstance(t, str) and bool(rx.match(t)) for t in self._texts(stripped)],
            dtype=bool,
        )
        return self._mask_to_elems(mask)

    def filter_by_tag(self, tag: str) -> "Elems":
        mask = np.asarray([tag in self.doc.tags[i] for i in self.idx], dtype=bool)
        return self._mask_to_elems(mask)

    def filter_by_tags(self, *tags: str) -> "Elems":
        tagset = set(tags)
        mask = np.asarray(
            [bool(tagset & self.doc.tags[i]) for i in self.idx], dtype=bool
        )
        return self._mask_to_elems(mask)

    def filter_by_font(self, font: str) -> "Elems":
        return self.filter_by_fonts(font)

    def filter_by_fonts(self, *fonts: str) -> "Elems":
        mask = np.isin(self.doc.font[self.idx], list(fonts))
        return self._mask_to_elems(mask)

    def filter_by_font_size(self, font_size: float) -> "Elems":
        mask = self.doc.font_size[self.idx] == font_size
        return self._mask_to_elems(mask)

    def filter_by_page(self, page_number: int) -> "Elems":
        if page_number not in self.doc.page_numbers:
            raise PageNotFoundError(f"Could not find page {page_number}")
        mask = self.doc.page[self.idx] == page_number
        return self._mask_to_elems(mask)

    def filter_by_pages(self, *page_numbers: int) -> "Elems":
        for p in page_numbers:
            if p not in self.doc.page_numbers:
                raise PageNotFoundError(f"Could not find page {p}")
        mask = np.isin(self.doc.page[self.idx], list(page_numbers))
        return self._mask_to_elems(mask)

    def filter_by_section_name(self, name: str) -> "Elems":
        acc = np.empty(0, dtype=np.int64)
        for section in self.doc.sectioning.get_sections_with_name(name):
            acc = np.union1d(acc, section.elements().idx)
        return self._wrap(np.intersect1d(self.idx, acc))

    def filter_by_section_names(self, *names: str) -> "Elems":
        acc = np.empty(0, dtype=np.int64)
        for name in names:
            for section in self.doc.sectioning.get_sections_with_name(name):
                acc = np.union1d(acc, section.elements().idx)
        return self._wrap(np.intersect1d(self.idx, acc))

    def filter_by_section(self, unique_name: str) -> "Elems":
        section = self.doc.sectioning.sections_dict.get(unique_name)
        if section is None:
            return self._wrap(np.empty(0, dtype=np.int64))
        return self._wrap(np.intersect1d(self.idx, section.elements().idx))

    def filter_by_sections(self, *unique_names: str) -> "Elems":
        acc = np.empty(0, dtype=np.int64)
        for unique_name in unique_names:
            section = self.doc.sectioning.sections_dict.get(unique_name)
            if section is not None:
                acc = np.union1d(acc, section.elements().idx)
        return self._wrap(np.intersect1d(self.idx, acc))

    def filter_out_header(self, bottom_of_header_y: float) -> "Elems":
        return self._mask_to_elems(self.doc.y0[self.idx] < bottom_of_header_y)

    def filter_out_footer(self, top_of_footer_y: float) -> "Elems":
        return self._mask_to_elems(self.doc.y1[self.idx] > top_of_footer_y)

    # -- geometry (components.py:256-304, filtering.py:698-715) --------------

    def _geom(self):
        """(page, x0, x1, y0, y1) for this list's elements — the gather
        is skipped when the list covers the whole document (the common
        case in recipes: directional ops probe from doc.elements)."""
        d = self.doc
        if len(self.idx) == d.n:
            return d.page, d.x0, d.x1, d.y0, d.y1
        ii = self.idx
        return d.page[ii], d.x0[ii], d.x1[ii], d.y0[ii], d.y1[ii]

    def filter_partially_within_bounding_box(
        self, box: BBox, page_number: int
    ) -> "Elems":
        page, x0, x1, y0, y1 = self._geom()
        mask = (
            (page == page_number)
            & (box.x0 <= x1)
            & (box.x1 >= x0)
            & (box.y0 <= y1)
            & (box.y1 >= y0)
        )
        return self._mask_to_elems(mask)

    def filter_entirely_within_bounding_box(
        self, box: BBox, page_number: int
    ) -> "Elems":
        page, x0, x1, y0, y1 = self._geom()
        mask = (
            (page == page_number)
            & (x0 >= box.x0)
            & (x1 <= box.x1)
            & (y0 >= box.y0)
            & (y1 <= box.y1)
        )
        return self._mask_to_elems(mask)

    # -- directional operators (filtering.py:366-696) -------------------------

    def to_the_right_of(
        self, i: int, inclusive: bool = False, tolerance: float = 0.0
    ) -> "Elems":
        d = self.doc
        p = int(d.page[i])
        tolerance = min((d.y1[i] - d.y0[i]) / 2, tolerance)
        box = BBox(d.x1[i], d.page_width(p), d.y0[i] + tolerance, d.y1[i] - tolerance)
        out = self.filter_partially_within_bounding_box(box, p)
        return out if inclusive else out.remove_element(i)

    def to_the_left_of(
        self, i: int, inclusive: bool = False, tolerance: float = 0.0
    ) -> "Elems":
        d = self.doc
        p = int(d.page[i])
        tolerance = min((d.y1[i] - d.y0[i]) / 2, tolerance)
        box = BBox(0, d.x0[i], d.y0[i] + tolerance, d.y1[i] - tolerance)
        out = self.filter_partially_within_bounding_box(box, p)
        return out if inclusive else out.remove_element(i)

    def below(
        self,
        i: int,
        inclusive: bool = False,
        all_pages: bool = False,
        tolerance: float = 0.0,
    ) -> "Elems":
        d = self.doc
        p = int(d.page[i])
        tolerance = min((d.x1[i] - d.x0[i]) / 2, tolerance)
        box = BBox(d.x0[i] + tolerance, d.x1[i] - tolerance, 0, d.y0[i])
        out = self.filter_partially_within_bounding_box(box, p)
        if all_pages:
            for q in d.page_numbers:
                if q <= p:
                    continue
                box_q = BBox(
                    d.x0[i] + tolerance, d.x1[i] - tolerance, 0, d.page_height(q)
                )
                out = out | self.filter_partially_within_bounding_box(box_q, q)
        return out if inclusive else out.remove_element(i)

    def above(
        self,
        i: int,
        inclusive: bool = False,
        all_pages: bool = False,
        tolerance: float = 0.0,
    ) -> "Elems":
        d = self.doc
        p = int(d.page[i])
        tolerance = min((d.x1[i] - d.x0[i]) / 2, tolerance)
        box = BBox(
            d.x0[i] + tolerance, d.x1[i] - tolerance, d.y1[i], d.page_height(p)
        )
        out = self.filter_partially_within_bounding_box(box, p)
        if all_pages:
            for q in d.page_numbers:
                if q >= p:
                    continue
                box_q = BBox(
                    d.x0[i] + tolerance, d.x1[i] - tolerance, 0, d.page_height(q)
                )
                out = out | self.filter_partially_within_bounding_box(box_q, q)
        return out if inclusive else out.remove_element(i)

    def vertically_in_line_with(
        self,
        i: int,
        inclusive: bool = False,
        all_pages: bool = False,
        tolerance: float = 0.0,
    ) -> "Elems":
        d = self.doc
        p = int(d.page[i])
        tolerance = min((d.x1[i] - d.x0[i]) / 2, tolerance)
        box = BBox(d.x0[i] + tolerance, d.x1[i] - tolerance, 0, d.page_height(p))
        out = self.filter_partially_within_bounding_box(box, p)
        if all_pages and len(self.idx):
            # Page range bounded by this list's own first/last element
            # (filtering.py:637-650).
            first_p = int(d.page[self.idx[0]])
            last_p = int(d.page[self.idx[-1]])
            for q in range(first_p, last_p + 1):
                if q == p or q not in d.page_numbers:
                    continue
                box_q = BBox(
                    d.x0[i] + tolerance, d.x1[i] - tolerance, 0, d.page_height(q)
                )
                out = out | self.filter_partially_within_bounding_box(box_q, q)
        return out if inclusive else out.remove_element(i)

    def horizontally_in_line_with(
        self, i: int, inclusive: bool = False, tolerance: float = 0.0
    ) -> "Elems":
        d = self.doc
        p = int(d.page[i])
        tolerance = min((d.y1[i] - d.y0[i]) / 2, tolerance)
        box = BBox(0, d.page_width(p), d.y0[i] + tolerance, d.y1[i] - tolerance)
        out = self.filter_partially_within_bounding_box(box, p)
        return out if inclusive else out.remove_element(i)

    # -- order-based operators (filtering.py:717-942) -------------------------

    def before(self, i: int, inclusive: bool = False) -> "Elems":
        mask = self.idx < i
        if inclusive:
            mask = mask | (self.idx == i)
        return self._mask_to_elems(mask)

    def after(self, i: int, inclusive: bool = False) -> "Elems":
        mask = self.idx > i
        if inclusive:
            mask = mask | (self.idx == i)
        return self._mask_to_elems(mask)

    def between(self, start: int, end: int, inclusive: bool = False) -> "Elems":
        if inclusive:
            mask = (self.idx >= start) & (self.idx <= end)
        else:
            mask = (self.idx > start) & (self.idx < end)
        return self._mask_to_elems(mask)

    def move_forwards_from(self, i: int, count: int = 1, capped: bool = False) -> int:
        pos = np.searchsorted(self.idx, i)
        if pos >= len(self.idx) or self.idx[pos] != i:
            raise NoElementFoundError(f"element {i} is not in the list")
        new_pos = int(pos) + count
        if new_pos < 0 or new_pos >= len(self.idx):
            if capped:
                new_pos = max(min(new_pos, len(self.idx) - 1), 0)
                return int(self.idx[new_pos])
            raise ElementOutOfRangeError(
                f"Requested element is {'before' if new_pos < 0 else 'after'} the "
                f"{'start' if new_pos < 0 else 'end'} of the ElementList"
            )
        return int(self.idx[new_pos])

    def move_backwards_from(self, i: int, count: int = 1, capped: bool = False) -> int:
        return self.move_forwards_from(i, count=-count, capped=capped)

    # -- convenience -----------------------------------------------------------

    def texts(self, stripped: bool = True) -> List[Optional[str]]:
        return list(self._texts(stripped))
