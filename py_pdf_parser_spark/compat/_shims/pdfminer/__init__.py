"""Minimal pdfminer stand-in for running the reference's test suite
without the real dependency (the tests only need LTComponent's bbox
attribute surface; no parsing happens)."""
