"""Content-stream interpreter (ISO 32000-1 §8-9): bytes -> Chars.

Walks a page's content stream executing the text-positioning and
text-showing operators, producing one ``layout.Char`` per glyph with
the same geometry pdfminer's public LTChar math yields:

- text space: glyph advance = width(cid) * fontsize * (Tz/100) with
  Tc charspace between glyphs and Tw wordspace after single-byte cid
  32; TJ numbers displace by -v/1000 * fontsize * (Tz/100);
- char bbox = (0, descent + rise) .. (adv, descent + rise + fontsize)
  pushed through (textmatrix translated to the pen) x CTM;
- form XObjects (Do) recurse with /Matrix x CTM into Figure
  containers; image XObjects become empty figures (media is opaque
  to the extraction engine — textops/media.py owns decode).

Graphics-state ops that cannot move text (color, paths, clipping,
marked content) are skipped by operand-stack discipline.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

from .fonts import DEFAULT_FONT, Font, build_font
from .layout import Char, Figure, LAParams, PageLayout
from .objects import NULL, Name, Parser, PDFSyntaxError, Ref, Stream

Matrix = Tuple[float, float, float, float, float, float]
MATRIX_IDENTITY: Matrix = (1, 0, 0, 1, 0, 0)


def mult_matrix(m1: Matrix, m0: Matrix) -> Matrix:
    a1, b1, c1, d1, e1, f1 = m1
    a0, b0, c0, d0, e0, f0 = m0
    return (
        a1 * a0 + b1 * c0,
        a1 * b0 + b1 * d0,
        c1 * a0 + d1 * c0,
        c1 * b0 + d1 * d0,
        e1 * a0 + f1 * c0 + e0,
        e1 * b0 + f1 * d0 + f0,
    )


def translate_matrix(m: Matrix, v: Tuple[float, float]) -> Matrix:
    a, b, c, d, e, f = m
    x, y = v
    return (a, b, c, d, x * a + y * c + e, x * b + y * d + f)


def apply_matrix_pt(m: Matrix, v: Tuple[float, float]) -> Tuple[float, float]:
    a, b, c, d, e, f = m
    x, y = v
    return (x * a + y * c + e, x * b + y * d + f)


class TextState:
    __slots__ = (
        "font", "fontsize", "charspace", "wordspace", "scaling",
        "leading", "rise", "matrix", "linepos",
    )

    def __init__(self) -> None:
        self.font: Font = DEFAULT_FONT
        self.fontsize = 0.0
        self.charspace = 0.0
        self.wordspace = 0.0
        self.scaling = 100.0
        self.leading = 0.0  # stored NEGATED like pdfminer (T* adds it)
        self.rise = 0.0
        self.matrix: Matrix = MATRIX_IDENTITY
        self.linepos: Tuple[float, float] = (0.0, 0.0)


class Interpreter:
    """One page (or form XObject) execution context."""

    def __init__(
        self,
        resolve: Callable,
        get_stream_data: Callable,
        laparams: LAParams,
        page: PageLayout,
        font_cache: Dict[Any, Font],
    ) -> None:
        self.resolve = resolve
        self.get_stream_data = get_stream_data
        self.laparams = laparams
        self.page = page
        self.font_cache = font_cache
        self.figure_stack: List[Figure] = []

    # ------------------------------------------------------------ fonts
    def _get_font(self, resources: Dict[str, Any], name: Name) -> Font:
        fonts = self.resolve(resources.get("Font")) or {}
        spec = fonts.get(getattr(name, "value", str(name)))
        key = (spec.num, spec.gen) if isinstance(spec, Ref) else id(spec)
        hit = self.font_cache.get(key)
        if hit is not None:
            return hit
        spec = self.resolve(spec)
        if not isinstance(spec, dict):
            font = DEFAULT_FONT
        else:
            try:
                font = build_font(spec, self.resolve, self.get_stream_data)
            except Exception:  # noqa: BLE001 — bad font = metricless text
                font = DEFAULT_FONT
        self.font_cache[key] = font
        return font

    # ------------------------------------------------------------ chars
    def _show(self, ts: TextState, ctm: Matrix, seq: List[Any]) -> None:
        font = ts.font
        scaling = ts.scaling * 0.01
        charspace = ts.charspace * scaling
        wordspace = 0.0 if font.multibyte else ts.wordspace * scaling
        fontsize = ts.fontsize
        dxscale = 0.001 * fontsize * scaling
        rise = ts.rise
        # loop-invariant per show op: combined matrix, glyph-box y
        # extents, sink, uprightness, unicode/width lookups
        a, b, c, d, e, f = mult_matrix(ts.matrix, ctm)
        dy0 = font.get_descent() * fontsize + rise
        dy1 = dy0 + fontsize
        upright = 0 < a * d * scaling and b * c <= 0
        fontname = font.fontname
        to_unichr = font.to_unichr
        char_width = font.char_width
        sink = (
            self.figure_stack[-1].chars
            if self.figure_stack
            else self.page.chars
        )
        x, y = ts.linepos
        need_charspace = False
        for obj in seq:
            if isinstance(obj, (int, float)):
                x -= obj * dxscale
                need_charspace = True
            elif isinstance(obj, bytes):
                for cid in font.decode(obj):
                    if need_charspace:
                        x += charspace
                    try:
                        text = to_unichr(cid)
                    except Exception:  # noqa: BLE001
                        text = f"(cid:{cid})"
                    adv = char_width(cid) * fontsize * scaling
                    # bbox corners (0, dy0)..(adv, dy1) through the
                    # matrix translated to the pen position (x, y)
                    ex = x * a + y * c + e
                    ey = x * b + y * d + f
                    x0 = dy0 * c + ex
                    y0 = dy0 * d + ey
                    x1 = adv * a + dy1 * c + ex
                    y1 = adv * b + dy1 * d + ey
                    if x1 < x0:
                        x0, x1 = x1, x0
                    if y1 < y0:
                        y0, y1 = y1, y0
                    sink.append(
                        Char(
                            (x0, y0, x1, y1),
                            text,
                            fontname,
                            (y1 - y0) if upright else (x1 - x0),
                            adv,
                            upright,
                        )
                    )
                    x += adv
                    if cid == 32 and wordspace:
                        x += wordspace
                    need_charspace = True
        ts.linepos = (x, y)

    # ------------------------------------------------------- execution
    def execute(
        self,
        data: bytes,
        resources: Dict[str, Any],
        ctm: Matrix,
        depth: int = 0,
    ) -> None:
        parser = Parser(data, 0, refs=False)
        stack: List[Any] = []
        ts = TextState()
        gs_stack: List[Matrix] = []
        while True:
            try:
                obj = parser.parse_object()
            except PDFSyntaxError:
                break
            if obj is None:
                break
            if not (isinstance(obj, tuple) and obj and obj[0] == "kw"):
                stack.append(obj)
                if len(stack) > 128:
                    stack = stack[-32:]
                continue
            op = obj[1]
            try:
                if op == "q":
                    gs_stack.append(ctm)
                elif op == "Q":
                    if gs_stack:
                        ctm = gs_stack.pop()
                elif op == "cm" and len(stack) >= 6:
                    ctm = mult_matrix(tuple(stack[-6:]), ctm)
                elif op == "BT":
                    ts.matrix = MATRIX_IDENTITY
                    ts.linepos = (0.0, 0.0)
                elif op == "ET":
                    pass
                elif op == "Tc" and stack:
                    ts.charspace = float(stack[-1])
                elif op == "Tw" and stack:
                    ts.wordspace = float(stack[-1])
                elif op == "Tz" and stack:
                    ts.scaling = float(stack[-1])
                elif op == "TL" and stack:
                    ts.leading = -float(stack[-1])
                elif op == "Tf" and len(stack) >= 2:
                    ts.font = self._get_font(resources, stack[-2])
                    ts.fontsize = float(stack[-1])
                elif op == "Tr":
                    pass  # render mode: invisible text still extracts
                elif op == "Ts" and stack:
                    ts.rise = float(stack[-1])
                elif op == "Td" and len(stack) >= 2:
                    ts.matrix = translate_matrix(
                        ts.matrix, (float(stack[-2]), float(stack[-1]))
                    )
                    ts.linepos = (0.0, 0.0)
                elif op == "TD" and len(stack) >= 2:
                    tx, ty = float(stack[-2]), float(stack[-1])
                    ts.matrix = translate_matrix(ts.matrix, (tx, ty))
                    ts.leading = ty
                    ts.linepos = (0.0, 0.0)
                elif op == "Tm" and len(stack) >= 6:
                    ts.matrix = tuple(float(v) for v in stack[-6:])
                    ts.linepos = (0.0, 0.0)
                elif op == "T*":
                    ts.matrix = translate_matrix(ts.matrix, (0.0, ts.leading))
                    ts.linepos = (0.0, 0.0)
                elif op == "Tj" and stack:
                    self._show(ts, ctm, [stack[-1]])
                elif op == "TJ" and stack:
                    seq = stack[-1]
                    if isinstance(seq, list):
                        self._show(ts, ctm, seq)
                elif op == "'" and stack:
                    ts.matrix = translate_matrix(ts.matrix, (0.0, ts.leading))
                    ts.linepos = (0.0, 0.0)
                    self._show(ts, ctm, [stack[-1]])
                elif op == '"' and len(stack) >= 3:
                    ts.wordspace = float(stack[-3])
                    ts.charspace = float(stack[-2])
                    ts.matrix = translate_matrix(ts.matrix, (0.0, ts.leading))
                    ts.linepos = (0.0, 0.0)
                    self._show(ts, ctm, [stack[-1]])
                elif op == "Do" and stack:
                    self._do_xobject(stack[-1], resources, ctm, depth)
                elif op == "BI":
                    # inline image: skip to EI
                    pos = parser.pos
                    idx = data.find(b"EI", pos)
                    parser.pos = len(data) if idx < 0 else idx + 2
                elif op == "gs" and stack:
                    pass  # ExtGState: no text-geometry effect we track
            except (TypeError, ValueError, KeyError):
                pass  # malformed operands: spec says viewers skip
            stack = []

    def _do_xobject(
        self,
        name: Any,
        resources: Dict[str, Any],
        ctm: Matrix,
        depth: int,
    ) -> None:
        if depth > 8:
            return
        xobjects = self.resolve(resources.get("XObject")) or {}
        xobj = self.resolve(xobjects.get(getattr(name, "value", str(name))))
        if not isinstance(xobj, Stream):
            return
        subtype = self.resolve(xobj.dict.get("Subtype"))
        sub = getattr(subtype, "value", "")
        disp = getattr(name, "value", str(name))
        if sub == "Form" and "BBox" in xobj.dict:
            bbox = [
                float(self.resolve(v))
                for v in self.resolve(xobj.dict["BBox"])
            ]
            matrix = self.resolve(xobj.dict.get("Matrix")) or list(
                MATRIX_IDENTITY
            )
            matrix = tuple(float(self.resolve(v)) for v in matrix)
            inner_res = self.resolve(xobj.dict.get("Resources"))
            if not isinstance(inner_res, dict):
                inner_res = resources
            new_ctm = mult_matrix(matrix, ctm)
            # figure bbox = BBox corners through the combined matrix
            xs, ys = [], []
            for px in (bbox[0], bbox[2]):
                for py in (bbox[1], bbox[3]):
                    qx, qy = apply_matrix_pt(new_ctm, (px, py))
                    xs.append(qx)
                    ys.append(qy)
            fig = Figure(disp, (min(xs), min(ys), max(xs), max(ys)))
            parent_stack = self.figure_stack
            parent_stack.append(fig)
            try:
                self.execute(
                    self.get_stream_data(xobj), inner_res, new_ctm,
                    depth + 1,
                )
            finally:
                parent_stack.pop()
            if parent_stack:
                # nested form: fold chars upward (outer figure owns them)
                parent_stack[-1].chars.extend(fig.chars)
            else:
                self.page.figures.append(fig)
        elif sub == "Image":
            # opaque media: an empty figure at the image's placed rect
            # (the unit square through the CTM, spec §8.9.5) — the
            # byte-stream loader can surface these as media elements
            # (pdf_bytes include_media), keeping interleaved text+media
            # documents round-trippable through real PDF bytes.
            xs, ys = [], []
            for px in (0.0, 1.0):
                for py in (0.0, 1.0):
                    qx, qy = apply_matrix_pt(ctm, (px, py))
                    xs.append(qx)
                    ys.append(qy)
            self.page.figures.append(
                Figure(disp, (min(xs), min(ys), max(xs), max(ys)))
            )
