"""Loader-side Page shape (loaders.py:14-27).

``load``/``load_file`` need pdfminer's byte-stream layout parse, which
is outside this sandbox (see kernel/layout.py's documented stand-in) —
they raise rather than fake a parse.
"""

from typing import List, NamedTuple


class Page(NamedTuple):
    width: int
    height: int
    elements: List


def load(*args, **kwargs):
    raise NotImplementedError(
        "byte-stream PDF loading requires pdfminer, which is not available "
        "in this environment; construct PDFDocument from Page dicts instead"
    )


def load_file(*args, **kwargs):
    raise NotImplementedError(
        "byte-stream PDF loading requires pdfminer, which is not available "
        "in this environment; construct PDFDocument from Page dicts instead"
    )
