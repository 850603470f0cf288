"""Reference-API compatibility facade.

A drop-in ``py_pdf_parser``-shaped object API (PDFDocument / PDFElement /
ElementList / Sectioning / tables) backed by THIS engine's per-document
kernel (``kernel/doc.py``, ``kernel/tables.py``): ordering, geometry,
text, per-char font modes, font mapping, tags/ignores and table
extraction all execute on the kernel's numpy arrays — the object layer
is only identity + fluent chaining.

Purpose: the BASELINE.json north rule asks for span/element semantics
verified against the reference's OWN pytest suite (test_components,
test_filtering, test_sectioning, test_tables).  With this facade those
suites run unmodified against our engine — see
``tests/test_reference_suite.py`` and ``compat/_shims/``.

This is a single-document, driver-side convenience surface (exactly like
the reference's); the distributed surfaces (``pipeline``, ``frame``)
remain the deployment path.
"""
