"""Layout analysis: chars -> text lines -> text boxes.

Re-implements the PUBLIC layout-analysis semantics of pdfminer.six
(the library the reference's loaders.py builds on — see reference
loaders.py:5-27) so that byte-stream-loaded documents produce the same
LTTextBox partitioning the reference's golden tests assert against:

- ``LAParams`` with the same defaults (line_overlap 0.5, char_margin
  2.0, line_margin 0.5, word_margin 0.1, boxes_flow — the reference
  passes None);
- chars group into horizontal lines when vertically overlapping by
  more than ``line_overlap`` of the smaller height and horizontally
  within ``char_margin`` of the wider char; a space Anno is inserted
  when the gap exceeds ``word_margin``; every line ends with a
  newline Anno;
- lines group into boxes by neighbor closure: same height and
  left/right/center aligned within ``line_margin`` * height, searched
  in a window expanded vertically by the same amount;
- with ``boxes_flow=None`` boxes are ordered top-to-bottom then
  left-to-right ((-y0, x0) sort) — though the reference re-orders
  elements itself, so only box CONTENTS are load-bearing.

This is a from-scratch implementation of those documented rules, not
a copy; it exists because the sandbox has no pdfminer and the engine
must parse real PDF bytes itself (sources/pdf_bytes.py).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Tuple

INF = float("inf")


class LAParams:
    """Layout parameters, same names/defaults as pdfminer's public API."""

    def __init__(
        self,
        line_overlap: float = 0.5,
        char_margin: float = 2.0,
        line_margin: float = 0.5,
        word_margin: float = 0.1,
        boxes_flow: Optional[float] = 0.5,
        detect_vertical: bool = False,
        all_texts: bool = False,
    ) -> None:
        self.line_overlap = line_overlap
        self.char_margin = char_margin
        self.line_margin = line_margin
        self.word_margin = word_margin
        self.boxes_flow = boxes_flow
        self.detect_vertical = detect_vertical
        self.all_texts = all_texts


class Box:
    """bbox mixin: x0/y0/x1/y1, width/height, overlap helpers."""

    x0 = y0 = x1 = y1 = 0.0

    def set_bbox(self, bbox: Tuple[float, float, float, float]) -> None:
        self.x0, self.y0, self.x1, self.y1 = bbox

    @property
    def width(self) -> float:
        return self.x1 - self.x0

    @property
    def height(self) -> float:
        return self.y1 - self.y0

    @property
    def bbox(self) -> Tuple[float, float, float, float]:
        return (self.x0, self.y0, self.x1, self.y1)

    def is_empty(self) -> bool:
        return self.width <= 0 or self.height <= 0

    def is_hoverlap(self, other: "Box") -> bool:
        return other.x0 <= self.x1 and self.x0 <= other.x1

    def is_voverlap(self, other: "Box") -> bool:
        return other.y0 <= self.y1 and self.y0 <= other.y1

    def voverlap(self, other: "Box") -> float:
        if self.is_voverlap(other):
            return min(abs(self.y0 - other.y1), abs(self.y1 - other.y0))
        return 0.0

    def hoverlap(self, other: "Box") -> float:
        if self.is_hoverlap(other):
            return min(abs(self.x0 - other.x1), abs(self.x1 - other.x0))
        return 0.0

    def hdistance(self, other: "Box") -> float:
        if self.is_hoverlap(other):
            return 0.0
        return min(abs(self.x0 - other.x1), abs(self.x1 - other.x0))

    def vdistance(self, other: "Box") -> float:
        if self.is_voverlap(other):
            return 0.0
        return min(abs(self.y0 - other.y1), abs(self.y1 - other.y0))


class Char(Box):
    """One rendered glyph (pdfminer LTChar surface: fontname, height,
    size, get_text)."""

    __slots__ = ("x0", "y0", "x1", "y1", "_text", "fontname", "size",
                 "adv", "upright")

    def __init__(
        self,
        bbox: Tuple[float, float, float, float],
        text: str,
        fontname: str,
        size: float,
        adv: float,
        upright: bool,
    ) -> None:
        self.set_bbox(bbox)
        self._text = text
        self.fontname = fontname
        self.size = size
        self.adv = adv
        self.upright = upright

    def set_bbox(self, bbox: Tuple[float, float, float, float]) -> None:
        # Box.set_bbox via explicit attrs (slots)
        self.x0, self.y0, self.x1, self.y1 = bbox

    def get_text(self) -> str:
        return self._text

    def is_compatible(self, other: Any) -> bool:
        return True


class Anno:
    """Virtual character (space / newline) inserted by layout."""

    __slots__ = ("_text",)

    def __init__(self, text: str) -> None:
        self._text = text

    def get_text(self) -> str:
        return self._text


class TextLine(Box):
    """A horizontal text line: chars + annos, word-margin spacing."""

    def __init__(self, word_margin: float) -> None:
        self.word_margin = word_margin
        self._objs: List[Any] = []
        self.set_bbox((INF, INF, -INF, -INF))
        self._last_x1 = INF

    def __iter__(self) -> Iterator[Any]:
        return iter(self._objs)

    def __len__(self) -> int:
        return len(self._objs)

    def add(self, obj: Char) -> None:
        if self.word_margin:
            margin = self.word_margin * max(obj.width, obj.height)
            if self._last_x1 < obj.x0 - margin:
                self._objs.append(Anno(" "))
        self._last_x1 = obj.x1
        self._objs.append(obj)
        self.set_bbox(
            (
                min(self.x0, obj.x0),
                min(self.y0, obj.y0),
                max(self.x1, obj.x1),
                max(self.y1, obj.y1),
            )
        )

    def close(self) -> None:
        self._objs.append(Anno("\n"))

    def get_text(self) -> str:
        return "".join(o.get_text() for o in self._objs)

    # --- box-grouping alignment predicates (pdfminer public rules)
    def margin_d(self, ratio: float) -> float:
        return ratio * self.height

    def neighbor_window(self, d: float) -> Tuple[float, float, float, float]:
        return (self.x0, self.y0 - d, self.x1, self.y1 + d)

    def is_neighbor(self, other: "TextLine", d: float) -> bool:
        return (
            type(other) is type(self)
            and abs(other.height - self.height) <= d
            and (
                abs(other.x0 - self.x0) <= d
                or abs(other.x1 - self.x1) <= d
                or abs(
                    (other.x0 + other.x1) / 2 - (self.x0 + self.x1) / 2
                )
                <= d
            )
        )


class VertTextLine(TextLine):
    """A vertical text line (pdfminer LTTextLineVertical surface):
    chars advance top-to-bottom; word-margin spaces track the y axis;
    box neighbors are same-WIDTH lines with y0/y1 alignment inside a
    horizontally-expanded window."""

    def __init__(self, word_margin: float) -> None:
        super().__init__(word_margin)
        self._last_y0 = -INF

    def add(self, obj: Char) -> None:
        if self.word_margin:
            margin = self.word_margin * max(obj.width, obj.height)
            if self._last_y0 > obj.y1 + margin and self._objs:
                self._objs.append(Anno(" "))
        self._last_y0 = obj.y0
        # bbox growth + append, without TextLine's x-axis word margin
        self._objs.append(obj)
        self.set_bbox(
            (
                min(self.x0, obj.x0),
                min(self.y0, obj.y0),
                max(self.x1, obj.x1),
                max(self.y1, obj.y1),
            )
        )

    def margin_d(self, ratio: float) -> float:
        return ratio * self.width

    def neighbor_window(self, d: float) -> Tuple[float, float, float, float]:
        return (self.x0 - d, self.y0, self.x1 + d, self.y1)

    def is_neighbor(self, other: "TextLine", d: float) -> bool:
        return (
            type(other) is type(self)
            and abs(other.width - self.width) <= d
            and (
                abs(other.y0 - self.y0) <= d
                or abs(other.y1 - self.y1) <= d
            )
        )


class TextBox(Box):
    """A group of neighbor-closed text lines (pdfminer LTTextBox
    surface: bbox, get_text, iterate lines)."""

    def __init__(self) -> None:
        self._objs: List[TextLine] = []
        self.set_bbox((INF, INF, -INF, -INF))
        self.index = -1

    def __iter__(self) -> Iterator[TextLine]:
        return iter(self._objs)

    def __len__(self) -> int:
        return len(self._objs)

    def add(self, line: TextLine) -> None:
        self._objs.append(line)
        self.set_bbox(
            (
                min(self.x0, line.x0),
                min(self.y0, line.y0),
                max(self.x1, line.x1),
                max(self.y1, line.y1),
            )
        )

    def analyze(self) -> None:
        # top line first (stable for ties)
        self._objs.sort(key=lambda line: -line.y1)

    def get_text(self) -> str:
        return "".join(line.get_text() for line in self._objs)


class TextBoxVertical(TextBox):
    """Vertical-writing text box: rightmost line first (CJK column
    reading order — pdfminer LTTextBoxVertical)."""

    def analyze(self) -> None:
        self._objs.sort(key=lambda line: -line.x1)


class Figure(Box):
    """Form-XObject container (pdfminer LTFigure surface: iterable; no
    get_text, so the loader's textbox predicates exclude it)."""

    def __init__(self, name: str, bbox: Tuple[float, float, float, float]) -> None:
        self.name = name
        self.set_bbox(bbox)
        self.chars: List[Char] = []
        self._objs: List[Any] = []  # textboxes after analyze()

    def __iter__(self) -> Iterator[Any]:
        return iter(self._objs)

    def add_char(self, ch: Char) -> None:
        self.chars.append(ch)

    def analyze(self, laparams: LAParams) -> None:
        # pdfminer only lays out figure text when all_texts is set
        if laparams.all_texts:
            self._objs = analyze_chars(self.chars, laparams)


class PageLayout(Box):
    """pdfminer LTPage surface: pageid, width, height, iterate
    textboxes + figures."""

    def __init__(self, pageid: int, bbox: Tuple[float, float, float, float]) -> None:
        self.pageid = pageid
        self.set_bbox(bbox)
        self.chars: List[Char] = []
        self.figures: List[Figure] = []
        self._objs: List[Any] = []

    def __iter__(self) -> Iterator[Any]:
        return iter(self._objs)

    def analyze(self, laparams: LAParams) -> None:
        for fig in self.figures:
            fig.analyze(laparams)
        textboxes = analyze_chars(self.chars, laparams)
        self._objs = list(textboxes) + list(self.figures)


def group_chars_into_lines(
    chars: List[Char], laparams: LAParams
) -> List[TextLine]:
    """Sequential char grouping (pdfminer group_objects).  Horizontal
    alignment always; vertical alignment only when
    ``laparams.detect_vertical`` (pdfminer's public gate — the
    reference never enables it, but a crawl corpus with rotated /
    CJK-column text does)."""
    lines: List[TextLine] = []
    line: Optional[TextLine] = None
    obj0: Optional[Char] = None
    for obj1 in chars:
        if obj0 is not None:
            halign = (
                obj0.is_compatible(obj1)
                and obj0.is_voverlap(obj1)
                and min(obj0.height, obj1.height) * laparams.line_overlap
                < obj0.voverlap(obj1)
                and obj0.hdistance(obj1)
                < max(obj0.width, obj1.width) * laparams.char_margin
            )
            valign = (
                laparams.detect_vertical
                and obj0.is_compatible(obj1)
                and obj0.is_hoverlap(obj1)
                and min(obj0.width, obj1.width) * laparams.line_overlap
                < obj0.hoverlap(obj1)
                and obj0.vdistance(obj1)
                < max(obj0.height, obj1.height) * laparams.char_margin
            )
            if (
                halign
                and line is not None
                and type(line) is TextLine
            ) or (valign and isinstance(line, VertTextLine)):
                line.add(obj1)
            elif line is not None:
                lines.append(line)
                line = None
            else:
                if valign and not halign:
                    line = VertTextLine(laparams.word_margin)
                    line.add(obj0)
                    line.add(obj1)
                elif halign and not valign:
                    line = TextLine(laparams.word_margin)
                    line.add(obj0)
                    line.add(obj1)
                else:
                    line = TextLine(laparams.word_margin)
                    line.add(obj0)
                    lines.append(line)
                    line = None
        obj0 = obj1
    if obj0 is not None:
        if line is None:
            line = TextLine(laparams.word_margin)
            line.add(obj0)
        lines.append(line)
    return lines


def group_lines_into_boxes(
    lines: List[TextLine], laparams: LAParams
) -> List[TextBox]:
    """Neighbor-closure box grouping (pdfminer group_textlines)."""
    live = [ln for ln in lines if not ln.is_empty()]
    boxes: Dict[int, TextBox] = {}  # id(line) -> box
    box_lines: Dict[int, List[TextLine]] = {}  # id(box) -> members
    for line in live:
        d = line.margin_d(laparams.line_margin)
        wx0, wy0, wx1, wy1 = line.neighbor_window(d)
        members = [line]
        for other in live:
            if other is line:
                continue
            # window intersection (exclusive, like pdfminer's Plane)
            if (
                other.x1 <= wx0
                or wx1 <= other.x0
                or other.y1 <= wy0
                or wy1 <= other.y0
            ):
                continue
            if not line.is_neighbor(other, d):
                continue
            members.append(other)
            prior = boxes.get(id(other))
            if prior is not None:
                members.extend(box_lines.pop(id(prior), []))
                for m in list(boxes):
                    if boxes[m] is prior:
                        del boxes[m]
        box = (
            TextBoxVertical()
            if isinstance(line, VertTextLine)
            else TextBox()
        )
        seen = set()
        mlist = []
        for m in members:
            if id(m) not in seen:
                seen.add(id(m))
                box.add(m)
                boxes[id(m)] = box
                mlist.append(m)
        box_lines[id(box)] = mlist
    out: List[TextBox] = []
    done = set()
    for line in live:
        box = boxes.get(id(line))
        if box is None or id(box) in done:
            continue
        done.add(id(box))
        if not box.is_empty():
            out.append(box)
    return out


def analyze_chars(chars: List[Char], laparams: LAParams) -> List[TextBox]:
    """chars -> analyzed, ordered textboxes."""
    if not chars:
        return []
    lines = group_chars_into_lines(chars, laparams)
    for line in lines:
        line.close()
    boxes = group_lines_into_boxes(
        [ln for ln in lines if not ln.is_empty()], laparams
    )
    for box in boxes:
        box.analyze()
    # boxes_flow=None ordering (pdfminer's getkey): vertical boxes
    # first, right-to-left then top-to-bottom; horizontal boxes
    # top-to-bottom then left-to-right.  (The reference re-orders
    # elements itself; only contents matter.)
    boxes.sort(
        key=lambda b: (
            (0, -b.x1, -b.y0)
            if isinstance(b, TextBoxVertical)
            else (1, -b.y0, b.x0)
        )
    )
    for i, box in enumerate(boxes):
        box.index = i
    return boxes
