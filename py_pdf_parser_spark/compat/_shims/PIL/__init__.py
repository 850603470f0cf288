"""Stub: base.py imports PIL.Image for visualiser screenshot diffs."""
from . import Image  # noqa: F401
