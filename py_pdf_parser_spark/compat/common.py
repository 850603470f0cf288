"""BoundingBox with the reference's exact construction/equality contract
(common.py:4-57): width/height as plain attributes, typed equality that
refuses comparison with other types."""

from .exceptions import InvalidCoordinatesError


class BoundingBox:
    def __init__(self, x0: float, x1: float, y0: float, y1: float):
        if x1 < x0:
            raise InvalidCoordinatesError(
                f"Invalid coordinates, x1 is smaller than x0 ({x1}<{x0})"
            )
        if y1 < y0:
            raise InvalidCoordinatesError(
                f"Invalid coordinates, y1 is smaller than y0 ({y1}<{y0})"
            )
        self.x0 = x0
        self.x1 = x1
        self.y0 = y0
        self.y1 = y1
        self.width = x1 - x0
        self.height = y1 - y0

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, BoundingBox):
            raise NotImplementedError(f"Can't compare BoundingBox with {type(other)}")
        return (
            self.x0 == other.x0
            and self.x1 == other.x1
            and self.y0 == other.y0
            and self.y1 == other.y1
        )

    def __repr__(self) -> str:
        return f"<BoundingBox x0={self.x0}, x1={self.x1}, y0={self.y0}, y1={self.y1}>"
