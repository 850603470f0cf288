"""pdfminer.pdfdocument stand-in: the password error type.

The reference's test_loaders.py asserts ``PDFPasswordIncorrect`` is
raised for a wrong password; the engine's minipdf raises its own
exception of the same name — re-exported here so the unmodified test
catches it."""

from py_pdf_parser_spark.sources.minipdf.crypto import (  # noqa: F401
    PDFPasswordIncorrect,
)


class PDFSyntaxError(Exception):
    pass
