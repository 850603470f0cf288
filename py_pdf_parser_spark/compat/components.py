"""PDFDocument / PDFElement / PDFPage over the engine kernel.

Semantics per reference components.py:19-525, but execution is the
kernel's: geometry/text/kind arrays, per-char font MODE with
Counter-first-seen tie-break and round-the-winner
(kernel/doc.py::_mode_first_seen), font_mapping (exact + ordered regex
with falsy fallback), shared tag/ignore state.  The object layer holds
identity (one PDFElement per index) and page registry only.
"""

from collections import defaultdict
from enum import Enum, auto
from itertools import chain
from typing import Callable, Dict, List, Optional, Set, Union

import numpy as np

from ..kernel.doc import Doc
from .common import BoundingBox
from .exceptions import NoElementsOnPageError, PageNotFoundError
from .filtering import ElementList
from .sectioning import Sectioning


class ElementOrdering(Enum):
    LEFT_TO_RIGHT_TOP_TO_BOTTOM = auto()
    RIGHT_TO_LEFT_TOP_TO_BOTTOM = auto()
    TOP_TO_BOTTOM_LEFT_TO_RIGHT = auto()
    TOP_TO_BOTTOM_RIGHT_TO_LEFT = auto()


# Per-page sort of the ORIGINAL (pdfminer-shaped) elements, exactly the
# reference's presets (components.py:29-43); Python sorted is stable, so
# ties keep input order — the same contract the kernel's lexsort keeps.
_ELEMENT_ORDERING_FUNCTIONS: Dict[ElementOrdering, Callable[[List], List]] = {
    ElementOrdering.LEFT_TO_RIGHT_TOP_TO_BOTTOM: lambda els: sorted(
        els, key=lambda e: (-e.y0, e.x0)
    ),
    ElementOrdering.RIGHT_TO_LEFT_TOP_TO_BOTTOM: lambda els: sorted(
        els, key=lambda e: (-e.y0, -e.x0)
    ),
    ElementOrdering.TOP_TO_BOTTOM_LEFT_TO_RIGHT: lambda els: sorted(
        els, key=lambda e: (e.x0, -e.y0)
    ),
    ElementOrdering.TOP_TO_BOTTOM_RIGHT_TO_LEFT: lambda els: sorted(
        els, key=lambda e: (-e.x0, -e.y0)
    ),
}


def _chars_of(original) -> list:
    """Per-character stream of a pdfminer-shaped element: iterate lines,
    then characters (components.py:174-182)."""
    return [c for line in original for c in line]


class PDFPage:
    def __init__(self, document, width, height, page_number, start_element,
                 end_element):
        self.document = document
        self.width = width
        self.height = height
        self.page_number = page_number
        self.start_element = start_element
        self.end_element = end_element

    @property
    def elements(self) -> "ElementList":
        return self.document.elements.between(
            self.start_element, self.end_element, inclusive=True
        )


class PDFElement:
    def __init__(self, document: "PDFDocument", original, index: int):
        self.document = document
        self.original_element = original
        self._index = index
        self.bounding_box = BoundingBox(
            x0=original.x0, x1=original.x1, y0=original.y0, y1=original.y1
        )

    # kernel-backed state ---------------------------------------------------

    @property
    def _kdoc(self) -> Doc:
        return self.document._kdoc

    @property
    def page_number(self) -> int:
        return int(self._kdoc.page[self._index])

    @property
    def tags(self) -> Set[str]:
        # THE kernel tag set (shared mutable state, like the reference's
        # per-element set the document also reads)
        return self._kdoc.tags[self._index]

    @property
    def ignored(self) -> bool:
        return bool(self._kdoc.ignored[self._index])

    def add_tag(self, new_tag: str) -> None:
        self._kdoc.add_tag(self._index, new_tag)

    def ignore(self) -> None:
        self._kdoc.ignore(self._index)

    @property
    def font_name(self) -> str:
        return self._kdoc.font_name[self._index]

    @property
    def font_size(self):
        # exact reference value semantics: round() of the char-height
        # mode preserves int-ness (round(2, 1) == 2, an int)
        return self.document._rounded_sizes()[self._index]

    @property
    def font(self) -> str:
        return self._kdoc.font[self._index]

    def text(self, stripped: bool = True) -> str:
        return self._kdoc.text_of(self._index, stripped)

    # geometry (components.py:256-304) — closed intervals; the directional
    # filters call partially_within per element, so tests may patch it

    def entirely_within(self, bounding_box: BoundingBox) -> bool:
        b = self.bounding_box
        return (
            b.x0 >= bounding_box.x0
            and b.x1 <= bounding_box.x1
            and b.y0 >= bounding_box.y0
            and b.y1 <= bounding_box.y1
        )

    def partially_within(self, bounding_box: BoundingBox) -> bool:
        b = self.bounding_box
        return (
            bounding_box.x0 <= b.x1
            and bounding_box.x1 >= b.x0
            and bounding_box.y0 <= b.y1
            and bounding_box.y1 >= b.y0
        )

    def __repr__(self) -> str:
        return (
            f"<PDFElement tags: {self.tags}, font: '{self.font}'"
            f"{', ignored' if self.ignored else ''}>"
        )


class PDFDocument:
    def __init__(
        self,
        pages: Dict[int, "Page"],  # noqa: F821
        pdf_file_path: Optional[str] = None,
        font_mapping: Optional[Dict[str, str]] = None,
        font_mapping_is_regex: bool = False,
        regex_flags: Union[int, "re.RegexFlag"] = 0,  # noqa: F821
        font_size_precision: int = 1,
        element_ordering: Union[
            ElementOrdering, Callable[[List], List]
        ] = ElementOrdering.LEFT_TO_RIGHT_TOP_TO_BOTTOM,
    ):
        if isinstance(element_ordering, ElementOrdering):
            sort_func = _ELEMENT_ORDERING_FUNCTIONS[element_ordering]
        else:
            sort_func = element_ordering

        ordered = []          # originals in final document order
        page_of: List[int] = []
        page_bounds: Dict[int, tuple] = {}  # page -> (start_idx, end_idx)
        page_dims: Dict[int, tuple] = {}
        idx = 0
        for page_number, page in sorted(pages.items()):
            start = idx
            for original in sort_func(page.elements):
                ordered.append(original)
                page_of.append(page_number)
                idx += 1
            if idx == start:
                raise NoElementsOnPageError(
                    f"No elements on page {page_number}, please exclude "
                    f"this page"
                )
            page_bounds[page_number] = (start, idx - 1)
            page_dims[page_number] = (page.width, page.height)

        n = len(ordered)
        # The kernel receives rows ALREADY in document order (the
        # ordering ran on the original objects above, to honor the
        # reference's callable contract); a constant key + stable offset
        # tiebreak keeps the kernel's order identical.
        self._kdoc = Doc(
            "compat",
            page=np.asarray(page_of, dtype=np.int64),
            x0=[o.x0 for o in ordered],
            x1=[o.x1 for o in ordered],
            y0=[o.y0 for o in ordered],
            y1=[o.y1 for o in ordered],
            text=np.asarray(
                [o.get_text() for o in ordered], dtype=object
            ),
            offset=np.arange(n, dtype=np.int64),
            char_fonts=[
                [c.fontname for c in _chars_of(o) if hasattr(c, "fontname")]
                for o in ordered
            ],
            char_sizes=[
                [c.height for c in _chars_of(o) if hasattr(c, "height")]
                for o in ordered
            ],
            font_mapping=font_mapping,
            font_mapping_is_regex=font_mapping_is_regex,
            regex_flags=regex_flags,
            font_size_precision=font_size_precision,
            element_ordering=lambda x0, y0: (np.zeros(len(x0)),),
            page_width={p: w for p, (w, h) in page_dims.items()},
            page_height={p: h for p, (w, h) in page_dims.items()},
        )
        self.sectioning = Sectioning(self)
        self._element_list = [
            PDFElement(self, o, i) for i, o in enumerate(ordered)
        ]
        self.__pages = {
            p: PDFPage(
                self, page_dims[p][0], page_dims[p][1], p,
                self._element_list[lo], self._element_list[hi],
            )
            for p, (lo, hi) in page_bounds.items()
        }
        self._pdf_file_path = pdf_file_path
        self.number_of_pages = len(pages)
        self.page_numbers = [pg.page_number for pg in self.pages]
        self._sizes_memo = None
        # font -> element indexes, built lazily while filtering by fonts
        # (components.py:377-378,492-525 cache contract, asserted by the
        # reference's own tests)
        self._element_indexes_by_font: Dict[str, Set[int]] = defaultdict(set)

    def _rounded_sizes(self) -> list:
        if self._sizes_memo is None:
            self._sizes_memo = self._kdoc._rounded_sizes()
        return self._sizes_memo

    @property
    def _ignored_indexes(self) -> Set[int]:
        return set(np.nonzero(self._kdoc.ignored)[0].tolist())

    @property
    def elements(self) -> "ElementList":
        return ElementList(self)

    @property
    def pages(self) -> List["PDFPage"]:
        return [self.__pages[p] for p in sorted(self.__pages)]

    @property
    def fonts(self) -> Set[str]:
        return set(element.font for element in self.elements)

    def get_page(self, page_number: int) -> "PDFPage":
        try:
            return self.__pages[page_number]
        except KeyError as err:
            raise PageNotFoundError(
                f"Could not find page {page_number}"
            ) from err

    def _element_indexes_with_fonts(self, *fonts: str) -> Set[int]:
        non_cached = [
            font
            for font in fonts
            if font not in self._element_indexes_by_font.keys()
        ]
        if non_cached:
            for element in self._element_list:
                if element.font not in non_cached:
                    continue
                self._element_indexes_by_font[element.font].add(
                    element._index
                )
        return set(
            chain.from_iterable(
                indexes
                for font, indexes in self._element_indexes_by_font.items()
                if font in fonts
            )
        )
