"""Test fixture builders — the analogue of the reference's
FakePDFMinerTextElement / create_pdf_document (tests/utils.py:32-121):
explicit (bbox, text, font_name, font_size) specs on 100x100 pages.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

from py_pdf_parser_spark.kernel.doc import Doc

# (x0, x1, y0, y1) like the reference's BoundingBox ctor arg order.
Box = Tuple[float, float, float, float]


def make_element(
    box: Box = (0, 1, 0, 1),
    text: str = "fake_text",
    font_name: str = "fake_font",
    font_size: Union[int, float] = 10,
    kind: str = "text",
    media_ref: Optional[str] = None,
) -> dict:
    return dict(
        box=box,
        text=text,
        font_name=font_name,
        font_size=font_size,
        kind=kind,
        media_ref=media_ref,
    )


def make_doc(
    elements: Union[Sequence[dict], Dict[int, Sequence[dict]]],
    doc_id: str = "test-000000",
    **config,
) -> Doc:
    """Build a Doc from per-page element specs (default: all on page 1)."""
    if not isinstance(elements, dict):
        elements = {1: list(elements)}
    page: List[int] = []
    specs: List[dict] = []
    for p, elems in sorted(elements.items()):
        for e in elems:
            page.append(p)
            specs.append(e)
    return Doc(
        doc_id,
        page=page,
        x0=[e["box"][0] for e in specs],
        x1=[e["box"][1] for e in specs],
        y0=[e["box"][2] for e in specs],
        y1=[e["box"][3] for e in specs],
        text=[e["text"] for e in specs],
        kind=[e["kind"] for e in specs],
        media_ref=[e["media_ref"] for e in specs],
        font_name=[e["font_name"] for e in specs],
        font_size=[e["font_size"] for e in specs],
        **config,
    )
