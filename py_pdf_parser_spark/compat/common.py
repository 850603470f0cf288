"""BoundingBox with the reference's construction/equality contract
(common.py:4-57): width/height as plain attributes, typed equality that
refuses comparison with other types, exact repr format."""

from .exceptions import InvalidCoordinatesError

_FIELDS = ("x0", "x1", "y0", "y1")


class BoundingBox:
    def __init__(self, x0: float, x1: float, y0: float, y1: float):
        for lo, hi, axis in ((x0, x1, "x"), (y0, y1, "y")):
            if hi < lo:
                raise InvalidCoordinatesError(
                    f"Invalid coordinates, {axis}1 is smaller than {axis}0 "
                    f"({hi}<{lo})"
                )
        self.x0, self.x1, self.y0, self.y1 = x0, x1, y0, y1
        self.width = x1 - x0
        self.height = y1 - y0

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, BoundingBox):
            raise NotImplementedError(
                f"Can't compare BoundingBox with {type(other)}"
            )
        return all(
            getattr(self, f) == getattr(other, f) for f in _FIELDS
        )

    def __repr__(self) -> str:
        coords = ", ".join(f"{f}={getattr(self, f)}" for f in _FIELDS)
        return f"<BoundingBox {coords}>"
