"""Font machinery (ISO 32000-1 §9): widths, decode, ToUnicode.

Covers what the extraction engine needs for char-exact layout parity
with pdfminer's public semantics:

- simple fonts (Type1 / TrueType / Type3): one byte per cid, /Widths
  indexed from /FirstChar, /MissingWidth fallback, text via the
  /ToUnicode CMap when present else a latin-1-ish fallback;
- composite Type0 fonts with Identity-H/V encodings: two-byte cids,
  /W + /DW widths on the descendant CIDFont;
- the ToUnicode CMap grammar (Adobe CMap spec, public): bfchar +
  bfrange (both scalar-increment and array forms), multi-char
  UTF-16BE destinations.

Glyph metrics used by layout: ``char_width(cid)`` in text space
(/1000), ``get_descent()`` from the FontDescriptor — both exactly the
quantities pdfminer feeds its LTChar bbox math, so boxes match.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, List, Optional

from .objects import NULL, Name, Parser, PDFSyntaxError, Stream


def _utf16be(dst: bytes) -> str:
    try:
        return dst.decode("utf-16-be", "replace")
    except Exception:  # noqa: BLE001
        return ""


def parse_tounicode(data: bytes) -> Dict[int, str]:
    """Parse a ToUnicode CMap stream into cid -> unicode string."""
    out: Dict[int, str] = {}
    parser = Parser(data, 0, refs=False)
    stack: List[Any] = []
    while True:
        try:
            obj = parser.parse_object()
        except PDFSyntaxError:
            break
        if obj is None:
            break
        if isinstance(obj, tuple) and obj[0] == "kw":
            kw = obj[1]
            if kw == "endbfchar":
                for i in range(0, len(stack) - 1, 2):
                    src, dst = stack[i], stack[i + 1]
                    if isinstance(src, bytes) and isinstance(dst, bytes):
                        out[int.from_bytes(src, "big")] = _utf16be(dst)
                stack = []
            elif kw == "endbfrange":
                for i in range(0, len(stack) - 2, 3):
                    lo, hi, dst = stack[i], stack[i + 1], stack[i + 2]
                    if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
                        continue
                    lo_i = int.from_bytes(lo, "big")
                    hi_i = int.from_bytes(hi, "big")
                    if isinstance(dst, list):
                        for j, d in enumerate(dst):
                            if isinstance(d, bytes) and lo_i + j <= hi_i:
                                out[lo_i + j] = _utf16be(d)
                    elif isinstance(dst, bytes):
                        base = _utf16be(dst)
                        if not base:
                            continue
                        # increment the LAST code unit (CMap spec)
                        head, last = base[:-1], ord(base[-1])
                        for j in range(hi_i - lo_i + 1):
                            out[lo_i + j] = head + chr(last + j)
                stack = []
            elif kw in (
                "begincodespacerange",
                "endcodespacerange",
                "beginbfchar",
                "beginbfrange",
                "begincmap",
                "endcmap",
                "def",
                "dict",
                "dup",
                "begin",
                "end",
                "pop",
                "currentdict",
                "findresource",
                "defineresource",
                "CMapName",
                "usecmap",
            ):
                stack = [] if kw.startswith("begin") else stack
            else:
                stack = []
        else:
            stack.append(obj)
            if len(stack) > 4096:  # runaway guard
                stack = stack[-64:]
    return out


# WinAnsiEncoding differences from latin-1 in 0x80-0x9F (spec appendix D,
# public).  Used only when a simple font has no ToUnicode.
_WINANSI_HIGH = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}

# The slice of Adobe's public glyph list that /Differences arrays in
# office-suite PDFs actually use; unknown names fall back to (cid:N).
_GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "endash": "–", "emdash": "—",
    "bullet": "•", "ellipsis": "…", "sterling": "£",
    "euro": "€", "degree": "°",
}
for _c in range(ord("A"), ord("Z") + 1):
    _GLYPH_NAMES[chr(_c)] = chr(_c)
for _c in range(ord("a"), ord("z") + 1):
    _GLYPH_NAMES[chr(_c)] = chr(_c)


class Font:
    """Base font: decode bytes to cids, cid metrics + unicode."""

    def __init__(
        self,
        fontname: str,
        descriptor: Dict[str, Any],
        widths: Dict[int, float],
        default_width: float,
        unicode_map: Optional[Dict[int, str]],
    ) -> None:
        self.fontname = fontname
        self.descent = float(descriptor.get("Descent", 0) or 0)
        self.widths = widths
        self.default_width = default_width
        self.unicode_map = unicode_map

    multibyte = False

    def decode(self, data: bytes) -> Iterator[int]:
        return iter(data)

    def char_width(self, cid: int) -> float:
        w = self.widths.get(cid)
        if w is None:
            w = self.default_width
        return w * 0.001

    def get_descent(self) -> float:
        return self.descent * 0.001

    def to_unichr(self, cid: int) -> str:
        if self.unicode_map is not None:
            hit = self.unicode_map.get(cid)
            if hit is not None:
                return hit
        return self.fallback_unichr(cid)

    def fallback_unichr(self, cid: int) -> str:
        return f"(cid:{cid})"


class SimpleFont(Font):
    """One-byte-cid font (Type1/TrueType/Type3)."""

    def __init__(self, *args: Any, encoding_map: Optional[Dict[int, str]] = None) -> None:
        super().__init__(*args)
        self._encoding_map = encoding_map or {}

    def fallback_unichr(self, cid: int) -> str:
        hit = self._encoding_map.get(cid)
        if hit is not None:
            return hit
        if 32 <= cid < 127:
            return chr(cid)
        if cid in _WINANSI_HIGH:
            return _WINANSI_HIGH[cid]
        if 0xA0 <= cid <= 0xFF:
            return chr(cid)
        return f"(cid:{cid})"


class CIDFont(Font):
    """Type0 composite font with an Identity two-byte encoding."""

    multibyte = True

    def decode(self, data: bytes) -> Iterator[int]:
        for i in range(0, len(data) - 1, 2):
            yield (data[i] << 8) | data[i + 1]

    def fallback_unichr(self, cid: int) -> str:
        return f"(cid:{cid})"


def _num(v: Any, default: float = 0.0) -> float:
    if isinstance(v, (int, float)):
        return float(v)
    return default


def build_font(spec: Dict[str, Any], resolve: Callable, get_stream_data: Callable) -> Font:
    """Build a Font from a /Font resource dict."""
    spec = {k: resolve(v) for k, v in spec.items()}
    subtype = spec.get("Subtype")
    subtype_name = getattr(subtype, "value", "")

    unicode_map: Optional[Dict[int, str]] = None
    tu = spec.get("ToUnicode")
    if isinstance(tu, Stream):
        try:
            unicode_map = parse_tounicode(get_stream_data(tu))
        except Exception:  # noqa: BLE001 — a bad CMap degrades text only
            unicode_map = None

    if subtype_name == "Type0":
        desc_fonts = resolve(spec.get("DescendantFonts")) or []
        sub = resolve(desc_fonts[0]) if desc_fonts else {}
        sub = {k: resolve(v) for k, v in (sub or {}).items()}
        descriptor = resolve(sub.get("FontDescriptor")) or {}
        descriptor = {k: resolve(v) for k, v in descriptor.items()}
        fontname = _font_name(spec, descriptor)
        dw = _num(sub.get("DW"), 1000.0)
        widths: Dict[int, float] = {}
        w_arr = resolve(sub.get("W")) or []
        i = 0
        while i < len(w_arr):
            c = resolve(w_arr[i])
            if i + 1 < len(w_arr) and isinstance(resolve(w_arr[i + 1]), list):
                run = [_num(resolve(x)) for x in resolve(w_arr[i + 1])]
                for j, wv in enumerate(run):
                    widths[int(_num(c)) + j] = wv
                i += 2
            elif i + 2 < len(w_arr):
                c2 = _num(resolve(w_arr[i + 1]))
                wv = _num(resolve(w_arr[i + 2]))
                for cid in range(int(_num(c)), int(c2) + 1):
                    widths[cid] = wv
                i += 3
            else:
                break
        return CIDFont(fontname, descriptor, widths, dw, unicode_map)

    # simple font
    descriptor = resolve(spec.get("FontDescriptor")) or {}
    descriptor = {k: resolve(v) for k, v in descriptor.items()}
    fontname = _font_name(spec, descriptor)
    first = int(_num(spec.get("FirstChar"), 0))
    widths_arr = resolve(spec.get("Widths")) or []
    widths = {
        first + i: _num(resolve(w)) for i, w in enumerate(widths_arr)
    }
    default_width = _num(descriptor.get("MissingWidth"), 0.0)
    # /Encoding /Differences -> glyph-name map (used only without
    # ToUnicode)
    encoding_map: Dict[int, str] = {}
    enc = resolve(spec.get("Encoding"))
    if isinstance(enc, dict):
        diffs = resolve(enc.get("Differences")) or []
        code = 0
        for item in diffs:
            item = resolve(item)
            if isinstance(item, (int, float)):
                code = int(item)
            elif isinstance(item, Name):
                glyph = _GLYPH_NAMES.get(item.value)
                if glyph is not None:
                    encoding_map[code] = glyph
                code += 1
    return SimpleFont(
        fontname, descriptor, widths, default_width, unicode_map,
        encoding_map=encoding_map,
    )


def _font_name(spec: Dict[str, Any], descriptor: Dict[str, Any]) -> str:
    # pdfminer takes the descriptor's /FontName, falling back to
    # /BaseFont — LTChar.fontname must match for font-mode parity.
    for source in (descriptor.get("FontName"), spec.get("BaseFont")):
        if isinstance(source, Name):
            return source.value
        if isinstance(source, str):
            return source
    return "unknown"


DEFAULT_FONT = SimpleFont("unknown", {}, {}, 500.0, None)
