"""Property-based round trip + corruption fuzz for the PDF byte path.

Beyond the synthetic families (tests/test_pdf_roundtrip.py), generate
ad-hoc documents — random lattice layouts, hostile-but-representable
text (PDF string delimiters, backslashes, name-escape chars, latin-1
high bytes), interleaved media with hostile media_refs — render them
to real PDF bytes and require the parsed element sequence to equal the
source, and mutate valid PDFs at random offsets requiring the parser
to TERMINATE (ok or isolated error; never hang, never crash the task).

Lattice spacing is chosen so pdfminer-semantics layout analysis cannot
merge distinct elements (row pitch 60pt vs max 12pt glyphs; column gap
at least 36pt vs 14.4pt char-margin reach), making element identity
well-defined.
"""

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from py_pdf_parser_spark.kernel.doc import Doc  # noqa: E402
from py_pdf_parser_spark.sources.pdf_bytes import (  # noqa: E402
    doc_from_pdf_bytes,
)
from py_pdf_parser_spark.sources.pdf_writer import render_pdf  # noqa: E402

# text alphabet: printable ASCII + latin-1 high range (exactly the set
# the metrics-only writer font maps 1:1 through the SimpleFont
# fallback; 0x7F-0x9F excluded — WinAnsi diverges from latin-1 there)
_TEXT_ALPHABET = st.sampled_from(
    [chr(c) for c in range(32, 127)] + [chr(c) for c in range(0xA0, 0x100)]
)
_TEXTS = st.text(_TEXT_ALPHABET, min_size=1, max_size=20)
_REF_ALPHABET = st.sampled_from(
    [chr(c) for c in range(33, 127)] + [chr(c) for c in range(0xA0, 0x100)]
)
_REFS = st.text(_REF_ALPHABET, min_size=1, max_size=12)

_SLOTS = st.lists(
    st.tuples(
        st.integers(1, 3),  # page
        st.integers(0, 7),  # row
        st.integers(0, 2),  # col
    ),
    min_size=1,
    max_size=16,
    unique=True,
)


@st.composite
def _documents(draw):
    slots = draw(_SLOTS)
    elements = []
    for page, row, col in slots:
        is_media = draw(st.booleans())
        if is_media:
            elements.append((page, row, col, "media", None, draw(_REFS)))
        else:
            text = draw(_TEXTS)
            font = draw(st.sampled_from(["Fa", "Fb"]))
            size = draw(st.sampled_from([8, 10, 12]))
            elements.append((page, row, col, "text", (text, font, size), None))
    return elements


def _layout_of(elements):
    sizes = [e[4][2] if e[3] == "text" else 10 for e in elements]
    return dict(
        page=[e[0] for e in elements],
        x0=[5.0 + 30.0 * e[2] for e in elements],
        x1=[25.0 + 30.0 * e[2] for e in elements],
        y0=[90.0 - 10.0 * e[1] for e in elements],
        y1=[90.0 - 10.0 * e[1] + s for e, s in zip(elements, sizes)],
        font_name=[e[4][1] if e[3] == "text" else "Fa" for e in elements],
        font_size=sizes,
        page_width=120.0,
        page_height=120.0,
    )


@settings(max_examples=60, deadline=None)
@given(_documents())
def test_random_document_roundtrips(elements):
    layout = _layout_of(elements)
    spans = [
        (e[3], e[4][0] if e[3] == "text" else None, e[5], o)
        for o, e in enumerate(elements)
    ]
    pdf = render_pdf("prop-000001", spans, layout=layout)
    parsed = doc_from_pdf_bytes("prop-000001", pdf, include_media=True)

    source = Doc(
        "prop-000001",
        page=layout["page"],
        x0=layout["x0"],
        x1=layout["x1"],
        y0=layout["y0"],
        y1=layout["y1"],
        text=[s[1] for s in spans],
        kind=[s[0] for s in spans],
        media_ref=[s[2] for s in spans],
        char_fonts=[
            [e[4][1]] * len(e[4][0]) if e[3] == "text" else []
            for e in elements
        ],
        char_sizes=[
            [float(e[4][2])] * len(e[4][0]) if e[3] == "text" else []
            for e in elements
        ],
        page_width=120.0,
        page_height=120.0,
    )

    def seq(doc):
        return [
            (
                doc.kind[i],
                doc.text_of(i),
                doc.media_ref[i],
                int(doc.page[i]),
                doc.font_name[i] if doc.kind[i] == "text" else None,
            )
            for i in range(doc.n)
        ]

    assert seq(parsed) == seq(source)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(0, 2**31 - 1),
    st.integers(1, 12),
)
def test_mutated_pdf_terminates(seed, n_mutations):
    """Random byte corruption must terminate fast: ok or an exception —
    the per-document isolation boundary, never a hang/crash."""
    import random

    base = open(
        "/root/reference/docs/source/example_files/simple_memo.pdf", "rb"
    ).read()
    rng = random.Random(seed)
    data = bytearray(base)
    for _ in range(n_mutations):
        kind = rng.randrange(3)
        if kind == 0:  # flip a byte
            data[rng.randrange(len(data))] = rng.randrange(256)
        elif kind == 1:  # truncate (no-op once shrunk to a single byte)
            if len(data) > 1:
                data = data[: rng.randrange(1, len(data))]
        else:  # splice garbage
            at = rng.randrange(len(data))
            data = data[:at] + bytes(
                rng.randrange(256) for _ in range(rng.randrange(1, 64))
            ) + data[at:]
    try:
        doc = doc_from_pdf_bytes("fuzz", bytes(data))
        assert doc.n >= 0
    except Exception:  # noqa: BLE001 — isolated per-doc error is the contract
        pass
