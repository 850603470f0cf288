"""Deterministic PDF writer: synthetic span docs -> real PDF bytes.

Renders a synthetic document (the same ``(doc_id, spans)`` rows the
spans-path pipeline consumes, with layout from
``kernel.layout.layout_for`` — the exact geometry the spans path uses)
into a real, minimal, valid PDF:

- every text span becomes one text object (``Tf``/``Td``/``Tj``) at the
  layout position, with the layout's font name and font size;
- every media span becomes an Image XObject whose RESOURCE NAME is the
  span's ``media_ref`` (PDF name #XX-escaping keeps arbitrary refs
  round-trippable), placed at the layout rect via ``cm``;
- geometry is scaled by ``scale`` so that at real point sizes the
  layout-analysis margins (char_margin/line_margin) cannot merge
  distinct elements that the 100x100 synthetic coordinate space packs
  closely.

Purpose: the round-trip proof demanded by the north rule —
``extract(parse_pdf_bytes(render_pdf(doc)))`` must emit the same span
sequence (kind, text, media_ref, order) as the spans-path extraction,
on REAL bytes through the REAL from-scratch parser (sources/minipdf),
not just on synthetic span tables.  See tests/test_pdf_roundtrip.py
and the bench's pdf_roundtrip probe.

Writer output is spec-conformant PDF 1.4 (classic xref, uncompressed
streams) but deliberately minimal: fonts carry metrics only
(/MissingWidth, no embedded program) — extractors never rasterize.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..kernel.layout import config_for, layout_for

Span = Tuple[str, Optional[str], Optional[str], int]

# regular PDF name chars (ISO 32000-1 §7.3.5); everything else #XX
_NAME_OK = set(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    b"-_.!$&'*+@^`|~"
)


def _name_escape(value: str) -> str:
    out = []
    for b in value.encode("utf-8"):
        if b in _NAME_OK:
            out.append(chr(b))
        else:
            out.append(f"#{b:02X}")
    return "".join(out)


def _str_escape(text: str) -> bytes:
    raw = text.encode("latin-1", "replace")
    return (
        raw.replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
        .replace(b"\r", b"\\r")
        .replace(b"\n", b"\\n")
    )


def _fmt(v: float) -> str:
    """Shortest exact decimal for a float (PDF real)."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


class _PDFBuilder:
    def __init__(self) -> None:
        self.objs: List[bytes] = []  # 1-based object bodies

    def add(self, body: bytes) -> int:
        self.objs.append(body)
        return len(self.objs)

    def reserve(self) -> int:
        self.objs.append(b"")
        return len(self.objs)

    def set(self, num: int, body: bytes) -> None:
        self.objs[num - 1] = body

    def build(self) -> bytes:
        out = bytearray(b"%PDF-1.4\n%\xc2\xb5\xc2\xb6\n")
        offsets = [0] * (len(self.objs) + 1)
        for i, body in enumerate(self.objs, start=1):
            offsets[i] = len(out)
            out += b"%d 0 obj\n" % i
            out += body
            out += b"\nendobj\n"
        xref_at = len(out)
        out += b"xref\n0 %d\n" % (len(self.objs) + 1)
        out += b"0000000000 65535 f \n"
        for i in range(1, len(self.objs) + 1):
            out += b"%010d 00000 n \n" % offsets[i]
        out += b"trailer\n<</Size %d /Root 1 0 R>>\n" % (len(self.objs) + 1)
        out += b"startxref\n%d\n%%%%EOF\n" % xref_at
        return bytes(out)


def render_pdf(
    doc_id: str,
    spans: Sequence[Span],
    scale: float = 6.0,
    layout: Optional[Dict] = None,
) -> bytes:
    """One synthetic document -> real PDF bytes.

    Layout defaults to the SAME pure function the spans-path parse
    kernel uses, so the rendered geometry is the spans path's geometry
    times ``scale``; pass ``layout`` explicitly for ad-hoc documents
    (property-based round-trip tests).
    """
    offsets = np.asarray([s[3] for s in spans], dtype=np.int64)
    if layout is None:
        layout = layout_for(doc_id, offsets)
    page_of = np.asarray(layout["page"], dtype=np.int64)
    x0 = np.asarray(layout["x0"], dtype=np.float64) * scale
    y0 = np.asarray(layout["y0"], dtype=np.float64) * scale
    x1 = np.asarray(layout["x1"], dtype=np.float64) * scale
    y1 = np.asarray(layout["y1"], dtype=np.float64) * scale
    sizes = [float(s) for s in np.asarray(layout["font_size"], dtype=np.float64)]
    fonts = list(layout["font_name"])
    pw = float(layout.get("page_width", 100.0)) * scale
    ph = float(layout.get("page_height", 100.0)) * scale

    b = _PDFBuilder()
    catalog = b.reserve()
    pages_obj = b.reserve()

    # one font object per distinct layout font name; metrics-only
    font_objs: Dict[str, int] = {}
    font_keys: Dict[str, str] = {}
    for fn in fonts:
        if fn in font_objs:
            continue
        esc = _name_escape(str(fn))
        desc = b.add(
            (
                f"<</Type/FontDescriptor /FontName/{esc} /Flags 32 "
                f"/FontBBox[0 0 600 1000] /ItalicAngle 0 /Ascent 1000 "
                f"/Descent 0 /CapHeight 1000 /StemV 80 /MissingWidth 600>>"
            ).encode()
        )
        font_objs[fn] = b.add(
            (
                f"<</Type/Font /Subtype/TrueType /BaseFont/{esc} "
                f"/FontDescriptor {desc} 0 R>>"
            ).encode()
        )
        font_keys[fn] = f"F{len(font_keys)}"

    # one shared 1x1 gray image object for every media span
    img_obj = b.add(
        b"<</Type/XObject /Subtype/Image /Width 1 /Height 1 "
        b"/ColorSpace/DeviceGray /BitsPerComponent 8 /Length 1>>\n"
        b"stream\n\x7f\nendstream"
    )

    # Emit EVERY physical page 1..max, blank ones included: a real PDF
    # whose first content sits on page 2 still has a page 1, and the
    # loader's blank-page skip preserves physical page numbers
    # (page.pageid), so sparse layouts round-trip exactly.
    page_ids = list(range(1, int(page_of.max()) + 1)) if len(page_of) else []
    kids: List[int] = []
    for pid in page_ids:
        idxs = [i for i in range(len(spans)) if int(page_of[i]) == pid]
        content = bytearray()
        xobjects: Dict[str, int] = {}
        for i in idxs:
            kind, text, media_ref, _off = spans[i]
            if kind == "media":
                ref_name = _name_escape(media_ref or f"media-{i}")
                xobjects[ref_name] = img_obj
                w = x1[i] - x0[i]
                h = y1[i] - y0[i]
                content += (
                    f"q {_fmt(w)} 0 0 {_fmt(h)} {_fmt(x0[i])} "
                    f"{_fmt(y0[i])} cm /{ref_name} Do Q\n"
                ).encode()
            else:
                fk = font_keys[fonts[i]]
                content += (
                    f"BT /{fk} {_fmt(sizes[i])} Tf "
                    f"{_fmt(x0[i])} {_fmt(y0[i])} Td ("
                ).encode()
                content += _str_escape(text or "")
                content += b") Tj ET\n"
        stream = bytes(content)
        cont_obj = b.add(
            b"<</Length %d>>\nstream\n%s\nendstream"
            % (len(stream), stream)
        )
        res = "<</Font<<"
        res += " ".join(
            f"/{fk} {num} 0 R" for fn, num in font_objs.items()
            for fk in [font_keys[fn]]
        )
        res += ">>"
        if xobjects:
            res += "/XObject<<"
            res += " ".join(
                f"/{name} {num} 0 R" for name, num in xobjects.items()
            )
            res += ">>"
        res += ">>"
        kids.append(
            b.add(
                (
                    f"<</Type/Page /Parent {pages_obj} 0 R "
                    f"/MediaBox[0 0 {_fmt(pw)} {_fmt(ph)}] "
                    f"/Resources {res} /Contents {cont_obj} 0 R>>"
                ).encode()
            )
        )

    b.set(
        pages_obj,
        (
            "<</Type/Pages /Count %d /Kids[%s]>>"
            % (len(kids), " ".join(f"{k} 0 R" for k in kids))
        ).encode(),
    )
    b.set(catalog, b"<</Type/Catalog /Pages %d 0 R>>" % pages_obj)
    return b.build()


def render_pdfs(docs_df, scale: float = 6.0):
    """(doc_id, spans) DataFrame -> (doc_id, pdf_bytes) DataFrame.

    Distributed PDF rendering via one narrow ``mapInArrow`` — the
    fixture generator for byte-path round-trip tests and the
    pdf_roundtrip bench probe.  Not a hot path: spans decode via
    to_pylist per batch (the writer exists to produce REAL bytes for
    the parser to prove itself against, not to serve queries)."""
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            ids = batch.column("doc_id").to_pylist()
            spans_col = batch.column("spans").to_pylist()
            out = []
            for doc_id, rows in zip(ids, spans_col):
                spans = [
                    (
                        r["kind"],
                        r.get("text"),
                        r.get("media_ref"),
                        int(r["offset"]),
                    )
                    for r in rows
                ]
                out.append(render_pdf(doc_id, spans, scale=scale))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(out, type=pa.binary()),
                ],
                names=["doc_id", "pdf_bytes"],
            )

    return docs_df.select("doc_id", "spans").mapInArrow(
        gen, "doc_id string, pdf_bytes binary"
    )


def bytes_config_for(doc_id: str) -> dict:
    """Family Doc config adjusted for the byte-stream path.

    The spans path carries integer font sizes straight from the layout
    tables, so its font-mapping keys read ``"FontB,12"``; a real PDF
    parse measures char heights as floats and the same mode rounds to
    ``12.0`` — exactly like real pdfminer (the reference's own golden
    font mapping uses ``"...-Bold,12.0"``).  Re-key the mapping in
    float form; everything else passes through.
    """
    cfg = dict(config_for(doc_id))
    mapping = cfg.get("font_mapping")
    if mapping:
        cfg["font_mapping"] = {
            f"{key.rsplit(',', 1)[0]},{float(key.rsplit(',', 1)[1])}": v
            for key, v in mapping.items()
        }
    return cfg
