"""Table extraction — thin adapters over kernel/tables.py (the engine's
grid-reconstruction kernels, tables.py:18-499 semantics incl. error
text): ElementList/PDFElement in, PDFElement (or text) grids out."""

from typing import Any, Dict, List, Optional

from ..kernel import tables as ktables
from ..kernel.doc import Elems


def _to_elems(element_list) -> Elems:
    return Elems(
        element_list.document._kdoc, sorted(element_list.indexes)
    )


def _wrap_grid(table: List[List[Optional[int]]], document) -> List[List]:
    return [
        [
            document._element_list[i] if i is not None else None
            for i in row
        ]
        for row in table
    ]


def extract_simple_table(
    elements,
    as_text: bool = False,
    strip_text: bool = True,
    allow_gaps: bool = False,
    reference_element=None,
    tolerance: float = 0.0,
    remove_duplicate_header_rows: bool = False,
) -> List[List]:
    out = ktables.extract_simple_table(
        _to_elems(elements),
        as_text=as_text,
        strip_text=strip_text,
        allow_gaps=allow_gaps,
        reference_element=(
            None if reference_element is None else reference_element._index
        ),
        tolerance=tolerance,
        remove_duplicate_header_rows=remove_duplicate_header_rows,
    )
    return out if as_text else _wrap_grid(out, elements.document)


def extract_table(
    elements,
    as_text: bool = False,
    strip_text: bool = True,
    fix_element_in_multiple_rows: bool = False,
    fix_element_in_multiple_cols: bool = False,
    tolerance: float = 0.0,
    remove_duplicate_header_rows: bool = False,
) -> List[List]:
    out = ktables.extract_table(
        _to_elems(elements),
        as_text=as_text,
        strip_text=strip_text,
        fix_element_in_multiple_rows=fix_element_in_multiple_rows,
        fix_element_in_multiple_cols=fix_element_in_multiple_cols,
        tolerance=tolerance,
        remove_duplicate_header_rows=remove_duplicate_header_rows,
    )
    return out if as_text else _wrap_grid(out, elements.document)


def add_header_to_table(
    table: List[List[str]], header: Optional[List[str]] = None
) -> List[Dict[str, str]]:
    return ktables.add_header_to_table(table, header)


def get_text_from_table(
    table: List[List], strip_text: bool = True
) -> List[List[str]]:
    _validate_table_shape(table)
    return [
        [el.text(strip_text) if el is not None else "" for el in row]
        for row in table
    ]


def _validate_table_shape(table: List[List[Any]]) -> None:
    ktables._validate_table_shape(table)


def _remove_duplicate_header_rows(table: List[List[Any]]) -> List[List[Any]]:
    if len(table) <= 1:
        return table
    header = table[0]
    kept = [
        row
        for row in table[1:]
        if any(
            not _are_elements_equal(el, header[i])
            for i, el in enumerate(row)
        )
    ]
    return [header] + kept


def _are_elements_equal(first_element, second_element) -> bool:
    if first_element is None and second_element is None:
        return True
    if first_element is None or second_element is None:
        return False
    return (
        first_element.text() == second_element.text()
        and first_element.font == second_element.font
    )
