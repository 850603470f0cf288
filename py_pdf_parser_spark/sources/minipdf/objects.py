"""PDF object model + tokenizer/parser (stdlib only).

A from-scratch implementation of the COS object layer of ISO 32000-1
(the public PDF specification, §7.2-7.3): booleans, numbers, strings
(literal + hex), names (#XX escapes), arrays, dictionaries, streams,
null, and indirect references.  This is the substrate for the
byte-stream PDF loader (sources/pdf_bytes.py) — the sandbox has no
pdfminer, so the engine parses real PDF bytes itself.

Nothing here is copied from any PDF library; the grammar is the spec's.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple


class PDFSyntaxError(Exception):
    """Raised for malformed PDF constructs (corrupt files)."""


class Name:
    """A PDF name object (/Foo).  Interned by value for fast compares."""

    __slots__ = ("value",)
    _interned: Dict[str, "Name"] = {}

    def __new__(cls, value: str) -> "Name":
        hit = cls._interned.get(value)
        if hit is None:
            hit = object.__new__(cls)
            hit.value = value
            cls._interned[value] = hit
        return hit

    def __repr__(self) -> str:
        return f"/{self.value}"

    def __eq__(self, other: object) -> bool:
        if isinstance(other, Name):
            return self.value == other.value
        if isinstance(other, str):
            return self.value == other
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self.value)


class Ref:
    """An indirect reference (N G R)."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int) -> None:
        self.num = num
        self.gen = gen

    def __repr__(self) -> str:
        return f"{self.num} {self.gen} R"

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Ref)
            and self.num == other.num
            and self.gen == other.gen
        )

    def __hash__(self) -> int:
        return hash((self.num, self.gen))


class Stream:
    """A PDF stream: dict + raw (still-encoded) bytes.

    Decoding (filters, predictors, decryption) lives in filters.py /
    document.py; ``rawdata`` is exactly the bytes between ``stream``
    and ``endstream``.
    """

    __slots__ = ("dict", "rawdata", "objid", "genno")

    def __init__(
        self,
        d: Dict[str, Any],
        rawdata: bytes,
        objid: Optional[int] = None,
        genno: int = 0,
    ) -> None:
        self.dict = d
        self.rawdata = rawdata
        self.objid = objid
        self.genno = genno

    def __repr__(self) -> str:
        return f"<Stream obj={self.objid} len={len(self.rawdata)} {self.dict}>"


NULL = object()  # PDF null sentinel (distinct from "key absent")

_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"
_REGULAR = bytes(
    b for b in range(256) if b not in _WHITESPACE and b not in _DELIMS
)

import re as _re

# One compiled scan per token instead of a per-char Python loop — the
# tokenizer dominates content-stream interpretation (profiled; see
# PLANS.md round 4).  Strings and hex strings keep the explicit parsers
# (escape/nesting state machines).
_SCAN_RE = _re.compile(
    rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)*"  # whitespace + comments
    rb"(?:"
    rb"(/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"  # 1: name
    rb"|(<<)|(>>)|(\[)|(\])"  # 2-5: dict/array delims
    rb"|([^\x00\t\n\x0c\r ()<>\[\]{}/%]+)"  # 6: number-or-keyword
    rb")"
)
_INT_RE = _re.compile(rb"[+-]?\d+$")
_WS_ONLY_RE = _re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)*")

_LITERAL_ESCAPES = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\x0c",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}


class Lexer:
    """Tokenizer over a bytes buffer.

    Tokens: int, float, bytes (strings), Name, bool, NULL, and bare
    keywords returned as ``Keyword`` strings (operators, obj/endobj,
    R, stream...).  The parser layers structure on top.
    """

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        data, n = self.data, len(self.data)
        pos = self.pos
        while pos < n:
            b = data[pos]
            if b in _WHITESPACE:
                pos += 1
            elif b == 0x25:  # '%' comment to EOL
                while pos < n and data[pos] not in b"\r\n":
                    pos += 1
            else:
                break
        self.pos = pos

    def next_token(self) -> Optional[Tuple[str, Any]]:
        """Return (kind, value) or None at EOF.

        kind in {'num', 'str', 'name', 'kw', 'arr_open', 'arr_close',
        'dict_open', 'dict_close'}.
        """
        data, n = self.data, len(self.data)
        m = _SCAN_RE.match(data, self.pos)
        if m is not None and m.end() > m.start() and m.lastindex:
            self.pos = m.end()
            g = m.lastindex
            tok = m.group(g)
            if g == 1:  # /Name
                raw = tok[1:]
                if b"#" in raw:
                    out = bytearray()
                    i, ln = 0, len(raw)
                    while i < ln:
                        c = raw[i]
                        if c == 0x23 and i + 2 < ln:
                            try:
                                out.append(int(raw[i + 1 : i + 3], 16))
                                i += 3
                                continue
                            except ValueError:
                                pass
                        out.append(c)
                        i += 1
                    raw = bytes(out)
                # pdfminer.six psparser decodes name bytes as UTF-8
                # when valid (falling back to the raw bytes); mirror
                # that with a latin-1 fallback so the result is always
                # str and byte-lossless.
                try:
                    return ("name", Name(raw.decode("utf-8")))
                except UnicodeDecodeError:
                    return ("name", Name(raw.decode("latin-1")))
            if g == 2:
                return ("dict_open", None)
            if g == 3:
                return ("dict_close", None)
            if g == 4:
                return ("arr_open", None)
            if g == 5:
                return ("arr_close", None)
            # number or keyword
            if _INT_RE.match(tok):
                return ("num", int(tok))
            first = tok[0]
            if first in b"+-.0123456789":
                try:
                    return ("num", float(tok))
                except ValueError:
                    try:
                        return (
                            "num", float(tok.split(b".")[0] or b"0")
                        )
                    except ValueError:
                        return ("kw", tok.decode("latin-1"))
            return ("kw", tok.decode("latin-1"))
        # not matched by the scan: string/hex/stray delimiters
        self._skip_ws()
        pos = self.pos
        if pos >= n:
            return None
        b = data[pos]
        if b == 0x28:  # ( literal string
            pos += 1
            depth = 1
            out = bytearray()
            while pos < n:
                c = data[pos]
                if c == 0x5C:  # backslash
                    pos += 1
                    if pos >= n:
                        break
                    e = data[pos]
                    if e in _LITERAL_ESCAPES:
                        out += _LITERAL_ESCAPES[e]
                        pos += 1
                    elif 0x30 <= e <= 0x37:  # octal up to 3 digits
                        oct_digits = bytearray()
                        while (
                            pos < n
                            and 0x30 <= data[pos] <= 0x37
                            and len(oct_digits) < 3
                        ):
                            oct_digits.append(data[pos])
                            pos += 1
                        out.append(int(oct_digits, 8) & 0xFF)
                    elif e == 0x0D:  # line continuation \CR[LF]
                        pos += 1
                        if pos < n and data[pos] == 0x0A:
                            pos += 1
                    elif e == 0x0A:
                        pos += 1
                    else:  # unknown escape: keep the char
                        out.append(e)
                        pos += 1
                    continue
                if c == 0x28:
                    depth += 1
                elif c == 0x29:
                    depth -= 1
                    if depth == 0:
                        pos += 1
                        break
                out.append(c)
                pos += 1
            self.pos = pos
            return ("str", bytes(out))
        if b == 0x3C:  # < — hex string or <<
            if pos + 1 < n and data[pos + 1] == 0x3C:
                self.pos = pos + 2
                return ("dict_open", None)
            pos += 1
            hx = bytearray()
            while pos < n and data[pos] != 0x3E:
                c = data[pos]
                if c not in _WHITESPACE:
                    hx.append(c)
                pos += 1
            self.pos = pos + 1
            if len(hx) % 2:
                hx.append(0x30)
            try:
                return ("str", bytes.fromhex(hx.decode("latin-1")))
            except ValueError as err:
                raise PDFSyntaxError(f"bad hex string at {self.pos}") from err
        if b == 0x3E:  # >>
            if pos + 1 < n and data[pos + 1] == 0x3E:
                self.pos = pos + 2
                return ("dict_close", None)
            raise PDFSyntaxError(f"lone '>' at {pos}")
        if b == 0x5B:
            self.pos = pos + 1
            return ("arr_open", None)
        if b == 0x5D:
            self.pos = pos + 1
            return ("arr_close", None)
        if b == 0x7B:  # { } appear in Type4 functions only
            self.pos = pos + 1
            return ("kw", "{")
        if b == 0x7D:
            self.pos = pos + 1
            return ("kw", "}")
        if b == 0x29:
            raise PDFSyntaxError(f"unbalanced ')' at {pos}")
        # number or keyword
        start = pos
        while pos < n and data[pos] in _REGULAR:
            pos += 1
        tok = data[start:pos]
        if pos == start:  # stray delimiter we don't know
            self.pos = pos + 1
            return ("kw", chr(b))
        self.pos = pos
        first = tok[0]
        if first in b"+-.0123456789":
            try:
                if b"." in tok:
                    return ("num", float(tok))
                return ("num", int(tok))
            except ValueError:
                # e.g. '1.-2' broken reals from buggy writers: salvage
                try:
                    return ("num", float(tok.split(b".")[0] or b"0"))
                except ValueError:
                    return ("kw", tok.decode("latin-1"))
        return ("kw", tok.decode("latin-1"))


class Parser:
    """Recursive-descent object parser over a Lexer.

    ``parse_object`` returns one complete object, resolving the
    ``N G R`` reference form with two-token lookahead (spec §7.3.10).
    Keywords other than true/false/null/R are returned as ('kw', s)
    tuples for the caller (content-stream interpreter, xref reader).
    """

    def __init__(self, data: bytes, pos: int = 0, refs: bool = True) -> None:
        # refs=False skips the "N G R" two-token lookahead — content
        # streams and CMaps are self-contained by spec (no indirect
        # references), and the lookahead costs two extra token pulls
        # per number in number-dominated streams.
        self.lexer = Lexer(data, pos)
        self.refs = refs
        self._pushback: List[Tuple[str, Any]] = []

    @property
    def pos(self) -> int:
        return self.lexer.pos

    @pos.setter
    def pos(self, value: int) -> None:
        self.lexer.pos = value
        self._pushback.clear()

    def _next(self) -> Optional[Tuple[str, Any]]:
        if self._pushback:
            return self._pushback.pop()
        return self.lexer.next_token()

    def _push(self, tok: Tuple[str, Any]) -> None:
        self._pushback.append(tok)

    def parse_object(self) -> Any:
        tok = self._next()
        if tok is None:
            raise PDFSyntaxError("unexpected EOF")
        kind, value = tok
        if kind == "num":
            if isinstance(value, int) and self.refs:
                # maybe "N G R"
                tok2 = self._next()
                if tok2 is not None and tok2[0] == "num" and isinstance(
                    tok2[1], int
                ):
                    tok3 = self._next()
                    if tok3 is not None and tok3 == ("kw", "R"):
                        return Ref(value, tok2[1])
                    if tok3 is not None:
                        self._push(tok3)
                if tok2 is not None:
                    self._push(tok2)
            return value
        if kind in ("str", "name"):
            return value
        if kind == "arr_open":
            out: List[Any] = []
            while True:
                tok2 = self._next()
                if tok2 is None:
                    raise PDFSyntaxError("EOF in array")
                if tok2[0] == "arr_close":
                    return out
                self._push(tok2)
                out.append(self.parse_object())
        if kind == "dict_open":
            d: Dict[str, Any] = {}
            while True:
                tok2 = self._next()
                if tok2 is None:
                    raise PDFSyntaxError("EOF in dict")
                if tok2[0] == "dict_close":
                    return d
                if tok2[0] != "name":
                    raise PDFSyntaxError(
                        f"dict key is {tok2!r}, not a name, at {self.pos}"
                    )
                d[tok2[1].value] = self.parse_object()
        if kind == "kw":
            if value == "true":
                return True
            if value == "false":
                return False
            if value == "null":
                return NULL
            return ("kw", value)
        raise PDFSyntaxError(f"unexpected token {tok!r}")
