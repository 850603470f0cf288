"""Sectioning — named contiguous index intervals per document.

Kernel equivalent of the reference's ``Section``/``Sectioning``
(/root/reference/py_pdf_parser/sectioning.py:12-187).  A section is a
``[start_idx, end_idx]`` interval; membership is a range predicate.
"""

from __future__ import annotations

from collections import defaultdict
from typing import TYPE_CHECKING, Dict, Iterator, List

from ..errors import InvalidSectionError, SectionNotFoundError

if TYPE_CHECKING:
    from .doc import Doc, Elems


class Section:
    __slots__ = ("doc", "name", "unique_name", "start_idx", "end_idx")

    def __init__(
        self, doc: "Doc", name: str, unique_name: str, start_idx: int, end_idx: int
    ):
        if start_idx > end_idx:
            raise InvalidSectionError("end_element must come after start_element")
        self.doc = doc
        self.name = name
        self.unique_name = unique_name
        self.start_idx = start_idx
        self.end_idx = end_idx

    def elements(self) -> "Elems":
        """Inclusive interval, via between (sectioning.py:57-67)."""
        return self.doc.elements.between(self.start_idx, self.end_idx, inclusive=True)

    def __contains__(self, i: int) -> bool:
        return i in self.elements()

    def __len__(self) -> int:
        return len(self.elements())

    def __eq__(self, other) -> bool:
        if not isinstance(other, Section):
            raise NotImplementedError(f"Can't compare Section with {type(other)}")
        return (
            self.doc is other.doc
            and self.unique_name == other.unique_name
            and self.start_idx == other.start_idx
            and self.end_idx == other.end_idx
        )

    def __hash__(self) -> int:
        return hash((id(self.doc), self.unique_name, self.start_idx, self.end_idx))


class Sectioning:
    """Per-document section registry (sectioning.py:99-187)."""

    def __init__(self, doc: "Doc"):
        self.doc = doc
        self.name_counts: Dict[str, int] = defaultdict(int)
        self.sections_dict: Dict[str, Section] = {}

    def create_section(
        self,
        name: str,
        start_idx: int,
        end_idx: int,
        include_last_element: bool = True,
    ) -> Section:
        current_count = self.name_counts[name]
        unique_name = f"{name}_{current_count}"
        self.name_counts[name] += 1

        if not include_last_element:
            if end_idx == 0:
                raise InvalidSectionError(
                    "Section would contain no elements as end_element is the first "
                    "element in the document and include_last_element is False"
                )
            end_idx = end_idx - 1  # the element before (sectioning.py:153)
        section = Section(self.doc, name, unique_name, start_idx, end_idx)
        self.sections_dict[unique_name] = section
        return section

    def get_sections_with_name(self, name: str) -> Iterator[Section]:
        return (
            self.sections_dict[f"{name}_{idx}"]
            for idx in range(0, self.name_counts[name])
        )

    def get_section(self, unique_name: str) -> Section:
        try:
            return self.sections_dict[unique_name]
        except KeyError as err:
            raise SectionNotFoundError(
                f"Could not find section with name {unique_name}"
            ) from err

    @property
    def sections(self) -> List[Section]:
        return list(self.sections_dict.values())
