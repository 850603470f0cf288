"""Stream filters (ISO 32000-1 §7.4): FlateDecode + PNG/TIFF predictors.

Image-only filters (DCTDecode, JPXDecode, CCITTFaxDecode, JBIG2Decode)
are passed through untouched — the extraction engine never decodes
pixel data (media decode is an explicitly stubbed surface, see
textops/media.py).
"""

from __future__ import annotations

import zlib
from typing import Any, Dict, List

from .objects import NULL, Name, PDFSyntaxError, Stream

_IMAGE_FILTERS = {
    "DCTDecode",
    "DCT",
    "JPXDecode",
    "CCITTFaxDecode",
    "CCF",
    "JBIG2Decode",
}


def _apply_predictor(data: bytes, params: Dict[str, Any]) -> bytes:
    pred = params.get("Predictor", 1)
    if isinstance(pred, float):
        pred = int(pred)
    if pred in (None, 1, NULL):
        return data
    colors = int(params.get("Colors", 1))
    bpc = int(params.get("BitsPerComponent", 8))
    columns = int(params.get("Columns", 1))
    bpp = max(1, (colors * bpc + 7) // 8)  # bytes per pixel
    rowlen = (columns * colors * bpc + 7) // 8
    if pred == 2:  # TIFF horizontal differencing (8-bit only)
        if bpc != 8:
            raise PDFSyntaxError("TIFF predictor needs 8 bits/component")
        out = bytearray(data)
        for row in range(0, len(out), rowlen):
            for i in range(row + bpp, min(row + rowlen, len(out))):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    if pred < 10:
        raise PDFSyntaxError(f"unsupported predictor {pred}")
    # PNG predictors (spec defers to RFC 2083): each row is
    # [filter_type][rowlen bytes]
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    n = len(data)
    while pos < n:
        ft = data[pos]
        pos += 1
        row = bytearray(data[pos : pos + rowlen])
        pos += rowlen
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, len(row)):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(len(row)):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                row[i] = (row[i] + pr) & 0xFF
        else:
            raise PDFSyntaxError(f"bad PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def _as_list(obj: Any) -> List[Any]:
    if obj is None or obj is NULL:
        return []
    if isinstance(obj, list):
        return obj
    return [obj]


def decode_stream(stream: Stream, resolve) -> bytes:
    """Apply the stream's /Filter chain to (already decrypted) rawdata.

    ``resolve`` maps indirect refs to objects (filters/params may be
    indirect).  Unknown non-image filters raise; image filters return
    the still-encoded bytes (callers treat them as opaque media).
    """
    data = stream.rawdata
    filters = _as_list(resolve(stream.dict.get("Filter")))
    parms = _as_list(resolve(stream.dict.get("DecodeParms")))
    if not parms:
        parms = _as_list(resolve(stream.dict.get("DP")))
    for i, f in enumerate(filters):
        f = resolve(f)
        name = f.value if isinstance(f, Name) else str(f)
        par = resolve(parms[i]) if i < len(parms) else {}
        if not isinstance(par, dict):
            par = {}
        par = {k: resolve(v) for k, v in par.items()}
        if name in ("FlateDecode", "Fl"):
            try:
                data = zlib.decompress(data)
            except zlib.error:
                # salvage: some writers pad/truncate; decompress what's
                # there
                d = zlib.decompressobj()
                try:
                    data = d.decompress(data)
                except zlib.error as err:
                    raise PDFSyntaxError(f"bad Flate stream: {err}") from err
            data = _apply_predictor(data, par)
        elif name in ("ASCIIHexDecode", "AHx"):
            body = data.split(b">")[0]
            hx = bytes(c for c in body if c not in b"\x00\t\n\x0c\r ")
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode("latin-1"))
        elif name in ("RunLengthDecode", "RL"):
            out = bytearray()
            pos = 0
            while pos < len(data):
                ln = data[pos]
                pos += 1
                if ln == 128:
                    break
                if ln < 128:
                    out += data[pos : pos + ln + 1]
                    pos += ln + 1
                else:
                    out += bytes([data[pos]]) * (257 - ln)
                    pos += 1
            data = bytes(out)
        elif name in _IMAGE_FILTERS:
            return data  # opaque media payload
        else:
            raise PDFSyntaxError(f"unsupported filter /{name}")
    return data
