"""Reference exception names (exceptions.py:1-52) — re-exported from the
engine's shared per-document error taxonomy (same class names)."""

from ..errors import (  # noqa: F401
    DocError as PDFParserError,
    ElementOutOfRangeError,
    InvalidCoordinatesError,
    InvalidSectionError,
    InvalidTableError,
    InvalidTableHeaderError,
    MultipleElementsFoundError,
    NoElementFoundError,
    NoElementsOnPageError,
    PageNotFoundError,
    SectionNotFoundError,
    TableExtractionError,
)
