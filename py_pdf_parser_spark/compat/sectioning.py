"""Section / Sectioning — named contiguous index intervals
(sectioning.py:12-187): per-name counters give unique_name =
f"{name}_{count}"; membership is `between(start, end, inclusive=True)`.
"""

from collections import defaultdict
from typing import Dict, Generator, List

from .exceptions import InvalidSectionError, SectionNotFoundError


class Section:
    def __init__(self, document, name, unique_name, start_element, end_element):
        if start_element._index > end_element._index:
            raise InvalidSectionError("end_element must come after start_element")
        self.document = document
        self.name = name
        self.unique_name = unique_name
        self.start_element = start_element
        self.end_element = end_element

    @property
    def elements(self):
        return self.document.elements.between(
            self.start_element, self.end_element, inclusive=True
        )

    def __contains__(self, element) -> bool:
        return element in self.elements

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Section):
            raise NotImplementedError(f"Can't compare Section with {type(other)}")
        return (
            self.document == other.document
            and self.unique_name == other.unique_name
            and self.start_element == other.start_element
            and self.end_element == other.end_element
            and self.__class__ == other.__class__
        )

    def __len__(self) -> int:
        return len(self.elements)

    def __repr__(self) -> str:
        return (
            f"<Section name: '{self.name}', unique_name: '{self.unique_name}', "
            f"number of elements: {len(self)}>"
        )


class Sectioning:
    def __init__(self, document):
        self.document = document
        self.name_counts: Dict[str, int] = defaultdict(int)
        self.sections_dict: Dict[str, Section] = {}

    def create_section(
        self, name, start_element, end_element, include_last_element: bool = True
    ) -> Section:
        current_count = self.name_counts[name]
        unique_name = f"{name}_{current_count}"
        self.name_counts[name] += 1

        if not include_last_element:
            if end_element._index == 0:
                raise InvalidSectionError(
                    "Section would contain no elements as end_element is the first "
                    "element in the document and include_last_element is False"
                )
            end_element = self.document._element_list[end_element._index - 1]
        section = Section(
            self.document, name, unique_name, start_element, end_element
        )
        self.sections_dict[unique_name] = section
        return section

    def get_sections_with_name(self, name: str) -> Generator[Section, None, None]:
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
