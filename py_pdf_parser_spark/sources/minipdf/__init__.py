"""minipdf — a from-scratch, stdlib-only PDF layout extractor.

Exists because the sandbox ships no pdfminer: the engine's byte-stream
PDF path (sources/pdf_bytes.py) needs REAL parsing of real PDF bytes
to prove span-sequence parity with the reference on its own example
documents (reference docs/source/example_files/*.pdf,
tests/data/pdfs/*.pdf).  Implements the public ISO 32000-1 object /
xref / content layers plus pdfminer.six's publicly documented layout
rules; decrypts standard-security-handler documents (RC4 / AES-128).

Not a general-purpose PDF library: no rendering, no forms, image
payloads stay opaque.  Vertical text (rotated glyph runs / CJK
columns) is grouped when ``LAParams(detect_vertical=True)``, same
public gate as pdfminer.
"""

from .crypto import PDFPasswordIncorrect
from .document import PDFSyntaxError
from .high_level import LAParams, extract_pages

__all__ = [
    "extract_pages",
    "LAParams",
    "PDFPasswordIncorrect",
    "PDFSyntaxError",
]
