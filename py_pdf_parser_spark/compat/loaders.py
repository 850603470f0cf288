"""Byte-stream loading (reference loaders.py:29-102) over minipdf.

``load``/``load_file`` parse REAL PDF bytes with the engine's
from-scratch, stdlib-only PDF extractor (sources/minipdf) and build the
kernel-backed PDFDocument — no pdfminer required.  Semantics mirror the
reference exactly: ``la_params`` defaults to ``{"boxes_flow": None}``,
``all_texts`` also collects text boxes from inside figures, blank pages
are skipped with a warning, the password is forwarded (wrong password
raises ``PDFPasswordIncorrect``, same type name as pdfminer's), and all
other kwargs flow to ``PDFDocument``.
"""

import logging
from typing import IO, Any, Dict, List, NamedTuple, Optional, Union

from ..sources.minipdf import LAParams, extract_pages
from ..sources.minipdf.layout import TextBox
from .components import PDFDocument

logger = logging.getLogger("PDFParser")
DEFAULT_LA_PARAMS: Dict = {"boxes_flow": None}


class Page(NamedTuple):
    width: int
    height: int
    elements: List


def load_file(
    path_to_file: str, la_params: Optional[Dict] = None, **kwargs: Any
) -> PDFDocument:
    with open(path_to_file, "rb") as in_file:
        return load(
            in_file, pdf_file_path=path_to_file, la_params=la_params, **kwargs
        )


def load(
    pdf_file: Union[IO, bytes],
    pdf_file_path: Optional[str] = None,
    password: Optional[str] = None,
    la_params: Optional[Dict] = None,
    **kwargs: Any,
) -> PDFDocument:
    if la_params is None:
        la_params = {}
    la_params = {**DEFAULT_LA_PARAMS, **la_params}

    pages: Dict[int, Page] = {}
    for page in extract_pages(
        pdf_file, laparams=LAParams(**la_params), password=password
    ):
        elements = [el for el in page if isinstance(el, TextBox)]
        if la_params.get("all_texts"):
            figures = (el for el in page if not isinstance(el, TextBox))
            for figure in figures:
                elements += [
                    el for el in figure if isinstance(el, TextBox)
                ]
        if not elements:
            logger.warning(
                f"No elements detected on page {page.pageid}, "
                "skipping this page."
            )
            continue
        pages[page.pageid] = Page(
            width=page.width, height=page.height, elements=elements
        )

    return PDFDocument(pages=pages, pdf_file_path=pdf_file_path, **kwargs)
