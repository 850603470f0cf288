"""High-level API: PDF bytes -> per-page layout (pdfminer-shaped).

``extract_pages(data, password=..., laparams=...)`` yields PageLayout
objects with ``pageid``/``width``/``height`` and iterating textboxes +
figures — the exact surface the reference's loaders.py consumes
(reference loaders.py:76-99) and the engine's byte-stream loader
duck-types (sources/pdf_bytes.py).

Stdlib-only, from scratch (see the sibling modules); one call parses
one document — inside Spark this runs per document within a
``mapInArrow`` batch, so per-call state is self-contained by design.
"""

from __future__ import annotations

import io
from typing import Any, Dict, Iterator, Optional, Union

from .content import Interpreter, apply_matrix_pt
from .crypto import PDFPasswordIncorrect
from .document import Document, PDFSyntaxError
from .layout import LAParams, PageLayout


def extract_pages(
    source: Union[bytes, bytearray, memoryview, io.IOBase],
    password: Optional[str] = None,
    laparams: Optional[LAParams] = None,
) -> Iterator[PageLayout]:
    """Parse a whole PDF and yield analyzed page layouts."""
    if isinstance(source, (bytes, bytearray, memoryview)):
        data = bytes(source)
    else:
        data = source.read()
        if isinstance(data, str):
            data = data.encode("latin-1")
    if laparams is None:
        laparams = LAParams()
    doc = Document(data, password=password)
    font_cache: Dict[Any, Any] = {}
    for page in doc.pages():
        x0, y0, x1, y1 = page.mediabox
        rotate = page.rotate % 360
        if rotate == 90:
            ctm = (0.0, -1.0, 1.0, 0.0, -y0, x1)
        elif rotate == 180:
            ctm = (-1.0, 0.0, 0.0, -1.0, x1, y1)
        elif rotate == 270:
            ctm = (0.0, 1.0, -1.0, 0.0, y1, -x0)
        else:
            ctm = (1.0, 0.0, 0.0, 1.0, -x0, -y0)
        px0, py0 = apply_matrix_pt(ctm, (x0, y0))
        px1, py1 = apply_matrix_pt(ctm, (x1, y1))
        layout = PageLayout(
            page.pageid, (0.0, 0.0, abs(px1 - px0), abs(py1 - py0))
        )
        interp = Interpreter(
            doc.resolve, doc.get_stream_data, laparams, layout, font_cache
        )
        interp.execute(page.contents, page.resources, ctm)
        layout.analyze(laparams)
        yield layout


__all__ = [
    "extract_pages",
    "LAParams",
    "PDFPasswordIncorrect",
    "PDFSyntaxError",
]
