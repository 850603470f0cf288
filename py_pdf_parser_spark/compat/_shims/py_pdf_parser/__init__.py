"""py_pdf_parser import alias -> this engine's compat facade.

Lets the reference's unmodified test suite (and any user code written
against the reference API) run on py_pdf_parser_spark's kernel.
"""

import sys

from py_pdf_parser_spark.compat import (  # noqa: F401
    common,
    components,
    exceptions,
    filtering,
    loaders,
    sectioning,
    tables,
)

for _name in (
    "common",
    "components",
    "exceptions",
    "filtering",
    "loaders",
    "sectioning",
    "tables",
):
    sys.modules[f"{__name__}.{_name}"] = globals()[_name]
