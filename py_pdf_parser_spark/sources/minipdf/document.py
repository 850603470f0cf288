"""PDF document structure: xref, trailer chain, objects, page tree.

Implements ISO 32000-1 §7.5 from scratch: classic cross-reference
tables, cross-reference streams (/Type/XRef, /W field widths, /Index
subsections, PNG-predicted), compressed objects in object streams
(/Type/ObjStm), the trailer /Prev chain, and the standard security
handler hookup.  The page tree walk (§7.7.3) resolves inheritable
attributes (Resources, MediaBox, Rotate).

Design note for the Spark engine: one ``Document`` is built per PDF
byte string inside a ``mapInArrow`` batch — everything here is
driver-free, allocation-light, and exception-isolated per document by
the caller (sources/pdf_bytes.py).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterator, List, Optional, Tuple

from .crypto import PDFPasswordIncorrect, StandardSecurityHandler
from .filters import decode_stream
from .objects import (
    NULL,
    Name,
    Parser,
    PDFSyntaxError,
    Ref,
    Stream,
)

_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)", re.S)


class Page:
    """One page: number (1-based, like pdfminer's LTPage.pageid),
    resolved attributes, and the raw content-stream bytes."""

    __slots__ = ("pageid", "mediabox", "rotate", "resources", "contents")

    def __init__(
        self,
        pageid: int,
        mediabox: List[float],
        rotate: int,
        resources: Dict[str, Any],
        contents: bytes,
    ) -> None:
        self.pageid = pageid
        self.mediabox = mediabox
        self.rotate = rotate
        self.resources = resources
        self.contents = contents


class Document:
    """Parsed PDF: object store + page iterator."""

    def __init__(self, data: bytes, password: Optional[str] = None) -> None:
        self.data = data
        # xref: objid -> ("n", offset, gen) | ("o", objstm_num, index)
        self.xref: Dict[int, Tuple[str, int, int]] = {}
        self.trailer: Dict[str, Any] = {}
        self._cache: Dict[int, Any] = {}
        self._objstm_cache: Dict[int, Dict[int, Any]] = {}
        self.security: Optional[StandardSecurityHandler] = None
        self._load_xref()
        self._setup_encryption(password)

    # ------------------------------------------------------------ xref
    def _load_xref(self) -> None:
        m = None
        for m in _STARTXREF_RE.finditer(self.data[-2048:] if len(self.data) > 2048 else self.data):
            pass
        if m is None:
            for m in _STARTXREF_RE.finditer(self.data):
                pass
        if m is None:
            # no startxref: reconstruct by scanning "N G obj"
            self._reconstruct_xref()
            return
        offset = int(m.group(1))
        seen = set()
        try:
            while offset and offset not in seen:
                seen.add(offset)
                offset = self._load_xref_section(offset)
        except PDFSyntaxError:
            if not self.xref:
                self._reconstruct_xref()

    def _load_xref_section(self, offset: int) -> Optional[int]:
        """Parse one xref section (classic or stream); return /Prev."""
        parser = Parser(self.data, offset)
        tok = parser.parse_object()
        if tok == ("kw", "xref"):
            return self._load_classic_xref(parser)
        # else: "N G obj" with an XRef stream
        if not isinstance(tok, int):
            raise PDFSyntaxError(f"no xref at offset {offset}")
        parser.parse_object()  # gen
        kw = parser.parse_object()
        if kw != ("kw", "obj"):
            raise PDFSyntaxError(f"expected obj at xref stream {offset}")
        stream = self._parse_stream_body(parser, objid=tok, genno=0)
        if not isinstance(stream, Stream):
            raise PDFSyntaxError("xref offset points at a non-stream")
        return self._load_xref_stream(stream)

    def _load_classic_xref(self, parser: Parser) -> Optional[int]:
        data = self.data
        while True:
            # Subsection headers are PLAIN integers (spec §7.5.4) — the
            # "N G R" reference lookahead would pull entry bytes through
            # the lexer past the position we read entries from.
            parser.refs = False
            parser.lexer._skip_ws()
            pos = parser.pos
            tok = parser.parse_object()
            if tok == ("kw", "trailer"):
                parser.refs = True  # trailer holds references (/Root N G R)
                trailer = parser.parse_object()
                if not isinstance(trailer, dict):
                    raise PDFSyntaxError("trailer is not a dict")
                for k, v in trailer.items():
                    self.trailer.setdefault(k, v)
                # /XRefStm: hybrid files put compressed entries there
                if "XRefStm" in trailer:
                    try:
                        self._load_xref_section(int(trailer["XRefStm"]))
                    except PDFSyntaxError:
                        pass
                prev = trailer.get("Prev")
                return int(prev) if prev is not None else None
            if not isinstance(tok, int):
                raise PDFSyntaxError(f"bad xref subsection at {pos}")
            start = tok
            count = parser.parse_object()
            if not isinstance(count, int):
                raise PDFSyntaxError("bad xref subsection count")
            parser.lexer._skip_ws()
            pos = parser.pos
            for i in range(count):
                entry = data[pos : pos + 20]
                if len(entry) < 18:
                    raise PDFSyntaxError("truncated xref entry")
                try:
                    off = int(entry[0:10])
                    gen = int(entry[11:16])
                except ValueError as err:
                    raise PDFSyntaxError(f"bad xref entry {entry!r}") from err
                typ = entry[17:18]
                objid = start + i
                if typ == b"n" and objid not in self.xref:
                    self.xref[objid] = ("n", off, gen)
                pos += 20
                # tolerate 19-byte lines (lone \n) by resync
                if entry[18:20] not in (b"\r\n", b" \n", b" \r", b"\n", b"\r"):
                    while pos < len(data) and data[pos - 1] not in b"\r\n":
                        pos += 1
            parser.pos = pos

    def _load_xref_stream(self, stream: Stream) -> Optional[int]:
        d = stream.dict
        size = int(self.resolve(d.get("Size", 0)))
        index = self.resolve(d.get("Index")) or [0, size]
        w = [int(self.resolve(x)) for x in self.resolve(d["W"])]
        data = decode_stream(stream, self.resolve)
        entry_len = sum(w)
        pos = 0
        for i in range(0, len(index), 2):
            start = int(self.resolve(index[i]))
            count = int(self.resolve(index[i + 1]))
            for j in range(count):
                if pos + entry_len > len(data):
                    break
                fields = []
                for width in w:
                    if width == 0:
                        fields.append(1 if not fields else 0)
                    else:
                        fields.append(
                            int.from_bytes(data[pos : pos + width], "big")
                        )
                        pos += width
                objid = start + j
                ftype, f2, f3 = fields[0], fields[1], fields[2]
                if objid in self.xref:
                    continue
                if ftype == 1:
                    self.xref[objid] = ("n", f2, f3)
                elif ftype == 2:
                    self.xref[objid] = ("o", f2, f3)
        for k, v in d.items():
            if k not in ("Type", "W", "Index", "Length", "Filter",
                         "DecodeParms"):
                self.trailer.setdefault(k, v)
        prev = d.get("Prev")
        return int(prev) if prev is not None else None

    def _reconstruct_xref(self) -> None:
        """Last-resort: scan for ``N G obj`` headers (corrupt xref)."""
        for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", self.data):
            self.xref[int(m.group(1))] = ("n", m.start(), int(m.group(2)))
        tm = self.data.rfind(b"trailer")
        if tm >= 0:
            parser = Parser(self.data, tm + len(b"trailer"))
            try:
                trailer = parser.parse_object()
                if isinstance(trailer, dict):
                    for k, v in trailer.items():
                        self.trailer.setdefault(k, v)
            except PDFSyntaxError:
                pass
        if "Root" not in self.trailer:
            # xref-stream files: find the catalog by scanning objects
            for objid in list(self.xref):
                try:
                    obj = self.get_object(objid)
                except PDFSyntaxError:
                    continue
                d = obj.dict if isinstance(obj, Stream) else obj
                if isinstance(d, dict) and d.get("Type") == Name("Catalog"):
                    self.trailer["Root"] = Ref(objid, 0)
                    break

    # ------------------------------------------------------- encryption
    def _setup_encryption(self, password: Optional[str]) -> None:
        enc = self.trailer.get("Encrypt")
        if enc is None or enc is NULL:
            return
        enc = self.resolve(enc)
        filt = enc.get("Filter")
        if getattr(filt, "value", None) != "Standard":
            raise PDFSyntaxError(
                f"unsupported security handler {filt!r}"
            )
        ids = self.resolve(self.trailer.get("ID")) or [b""]
        id0 = bytes(self.resolve(ids[0])) if ids else b""
        self.security = StandardSecurityHandler(
            {k: self.resolve(v) for k, v in enc.items()},
            id0,
            password or "",
        )
        self._encrypt_ref = self.trailer.get("Encrypt")

    def _decrypt_object(self, obj: Any, objid: int, genno: int) -> Any:
        """Walk an object decrypting every string (streams handled at
        get_data time).  Objects inside object streams are NOT
        decrypted (the container stream already was)."""
        sec = self.security
        if sec is None:
            return obj
        if isinstance(obj, bytes):
            return sec.decrypt(objid, genno, obj)
        if isinstance(obj, list):
            return [self._decrypt_object(o, objid, genno) for o in obj]
        if isinstance(obj, dict):
            return {
                k: self._decrypt_object(v, objid, genno)
                for k, v in obj.items()
            }
        if isinstance(obj, Stream):
            obj.dict = self._decrypt_object(obj.dict, objid, genno)
            obj.rawdata = sec.decrypt(objid, genno, obj.rawdata)
            return obj
        return obj

    # ---------------------------------------------------------- objects
    def resolve(self, obj: Any, _depth: int = 0) -> Any:
        while isinstance(obj, Ref):
            if _depth > 32:
                raise PDFSyntaxError("reference cycle")
            obj = self.get_object(obj.num, obj.gen)
            _depth += 1
        return obj

    def get_object(self, objid: int, gen: int = 0) -> Any:
        if objid in self._cache:
            return self._cache[objid]
        entry = self.xref.get(objid)
        if entry is None:
            return NULL
        kind, f2, f3 = entry
        if kind == "n":
            obj = self._parse_indirect(objid, f2, f3)
        else:
            obj = self._get_from_objstm(f2, f3, objid)
        self._cache[objid] = obj
        return obj

    def _parse_indirect(self, objid: int, offset: int, gen: int) -> Any:
        parser = Parser(self.data, offset)
        try:
            num = parser.parse_object()
            g = parser.parse_object()
            kw = parser.parse_object()
        except PDFSyntaxError:
            return NULL
        if kw != ("kw", "obj") or num != objid:
            # bad offset: rescan for the header
            m = re.search(
                rb"(?m)^\s*%d\s+\d+\s+obj\b" % objid, self.data
            )
            if not m:
                return NULL
            parser = Parser(self.data, m.start())
            parser.parse_object()
            g = parser.parse_object()
            parser.parse_object()
        obj = self._parse_stream_body(
            parser, objid=objid, genno=g if isinstance(g, int) else 0
        )
        if self.security is not None and not self._is_encrypt_dict(objid):
            obj = self._decrypt_object(
                obj, objid, g if isinstance(g, int) else 0
            )
        return obj

    def _is_encrypt_dict(self, objid: int) -> bool:
        ref = self.trailer.get("Encrypt")
        return isinstance(ref, Ref) and ref.num == objid

    def _parse_stream_body(
        self, parser: Parser, objid: int, genno: int
    ) -> Any:
        obj = parser.parse_object()
        if not isinstance(obj, dict):
            return obj
        # stream?
        save = parser.pos
        try:
            nxt = parser.parse_object()
        except PDFSyntaxError:
            nxt = None
        if nxt != ("kw", "stream"):
            parser.pos = save
            return obj
        data = self.data
        pos = parser.pos
        # spec: 'stream' followed by CRLF or LF
        if data[pos : pos + 2] == b"\r\n":
            pos += 2
        elif data[pos : pos + 1] in (b"\n", b"\r"):
            pos += 1
        length = self.resolve(obj.get("Length"))
        raw = None
        if isinstance(length, (int, float)):
            end = pos + int(length)
            tail = data[end : end + 20]
            if re.match(rb"\s*endstream", tail):
                raw = data[pos:end]
        if raw is None:  # Length wrong/indirect-missing: scan
            m = re.compile(rb"endstream").search(data, pos)
            if m is None:
                raise PDFSyntaxError("unterminated stream")
            end = m.start()
            # strip the EOL the writer put before 'endstream'
            if data[end - 2 : end] == b"\r\n":
                end -= 2
            elif data[end - 1 : end] in (b"\n", b"\r"):
                end -= 1
            raw = data[pos:end]
        return Stream(obj, raw, objid=objid, genno=genno)

    def _get_from_objstm(self, stm_num: int, index: int, objid: int) -> Any:
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            objs = {}
            stream = self.resolve(self.get_object(stm_num))
            if isinstance(stream, Stream):
                data = decode_stream(stream, self.resolve)
                n = int(self.resolve(stream.dict.get("N", 0)))
                first = int(self.resolve(stream.dict.get("First", 0)))
                hdr = Parser(data, 0)
                pairs = []
                try:
                    for _ in range(n):
                        num = hdr.parse_object()
                        off = hdr.parse_object()
                        pairs.append((num, off))
                except PDFSyntaxError:
                    pass
                for num, off in pairs:
                    p = Parser(data, first + off)
                    try:
                        objs[num] = p.parse_object()
                    except PDFSyntaxError:
                        objs[num] = NULL
            self._objstm_cache[stm_num] = objs
        return objs.get(objid, NULL)

    def get_stream_data(self, stream: Stream) -> bytes:
        """Decoded (filtered) stream contents."""
        return decode_stream(stream, self.resolve)

    # ------------------------------------------------------------ pages
    _INHERITABLE = ("Resources", "MediaBox", "Rotate", "CropBox")

    def pages(self) -> Iterator[Page]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PDFSyntaxError("no document catalog")
        tree = self.resolve(root.get("Pages"))
        if not isinstance(tree, dict):
            raise PDFSyntaxError("no page tree")
        pageno = 0
        for node, inherited in self._walk_pages(tree, {}, set()):
            pageno += 1
            attrs = dict(inherited)
            for k in self._INHERITABLE:
                if k in node:
                    attrs[k] = node[k]
            mediabox = [
                float(self.resolve(v))
                for v in self.resolve(attrs.get("MediaBox", [0, 0, 612, 792]))
            ]
            rotate = int(self.resolve(attrs.get("Rotate", 0) or 0)) % 360
            resources = self.resolve(attrs.get("Resources", {})) or {}
            contents = self._page_content(node)
            yield Page(pageno, mediabox, rotate, resources, contents)

    def _walk_pages(
        self, node: Dict[str, Any], inherited: Dict[str, Any], seen: set
    ) -> Iterator[Tuple[Dict[str, Any], Dict[str, Any]]]:
        typ = self.resolve(node.get("Type"))
        if typ == Name("Page"):
            yield node, inherited
            return
        attrs = dict(inherited)
        for k in self._INHERITABLE:
            if k in node:
                attrs[k] = node[k]
        for kid_ref in self.resolve(node.get("Kids", [])) or []:
            key = (
                (kid_ref.num, kid_ref.gen)
                if isinstance(kid_ref, Ref)
                else id(kid_ref)
            )
            if key in seen:
                continue
            seen.add(key)
            kid = self.resolve(kid_ref)
            if isinstance(kid, dict):
                yield from self._walk_pages(kid, attrs, seen)

    def _page_content(self, node: Dict[str, Any]) -> bytes:
        contents = self.resolve(node.get("Contents"))
        if contents is None or contents is NULL:
            return b""
        if isinstance(contents, Stream):
            return self.get_stream_data(contents)
        if isinstance(contents, list):
            parts = []
            for ref in contents:
                s = self.resolve(ref)
                if isinstance(s, Stream):
                    parts.append(self.get_stream_data(s))
            return b"\n".join(parts)
        return b""


__all__ = [
    "Document",
    "Page",
    "PDFPasswordIncorrect",
    "PDFSyntaxError",
]
