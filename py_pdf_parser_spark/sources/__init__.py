"""Input connectors beyond the canonical spans table."""

from .pdf_bytes import doc_from_pdf_bytes, parse_pdf_bytes  # noqa: F401
