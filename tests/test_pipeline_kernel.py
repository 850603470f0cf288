"""Arrow-batch kernel plumbing: error containment, empty batches."""

import pyarrow as pa

from py_pdf_parser_spark.kernel.layout import memo_spans, ora_spans
from py_pdf_parser_spark.pipeline import (
    extract_arrow_batch,
    parse_elements_arrow_batch,
)
from py_pdf_parser_spark.synth import SPANS_ARROW_SCHEMA


def _batch(rows):
    if not rows:
        return pa.record_batch(
            [pa.array([], type=f.type) for f in SPANS_ARROW_SCHEMA],
            schema=SPANS_ARROW_SCHEMA,
        )
    return pa.Table.from_pydict(
        {
            "doc_id": [r[0] for r in rows],
            "spans": [
                [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for k, t, m, o in r[1]
                ]
                for r in rows
            ],
            "n_spans": [len(r[1]) for r in rows],
        },
        schema=SPANS_ARROW_SCHEMA,
    ).to_batches()[0]


def test_recipe_error_becomes_error_record():
    # memo doc missing its 'TO:' label: recipe raises NoElementFoundError,
    # which must become a status=error row, not a batch failure.
    truncated = [s for s in memo_spans(0) if s[1] != "TO:"]
    batch = _batch([
        ("ora-000001", ora_spans(1)),
        ("memo-000000", truncated),
    ])
    out = extract_arrow_batch(batch, [])
    statuses = out.column(3).to_pylist()
    errors = out.column(4).to_pylist()
    assert statuses == ["ok", "error"]
    assert errors[0] is None
    assert "NoElementFoundError" in errors[1]
    # Errored doc emits zero spans but keeps its row.
    assert out.column(2).to_pylist() == [len(ora_spans(1)), 0]


def test_empty_batch():
    batch = _batch([])
    out = extract_arrow_batch(batch, [])
    assert out.num_rows == 0
    pe = parse_elements_arrow_batch(batch)
    assert pe.num_rows == 0


def test_error_doc_does_not_poison_neighbors():
    rows = [(f"ora-{i:06d}", ora_spans(i)) for i in range(5)]
    truncated = [s for s in memo_spans(0) if s[1] != "SUBJECT:"]
    rows.insert(2, ("memo-000099", truncated))
    out = extract_arrow_batch(_batch(rows), [])
    statuses = out.column(3).to_pylist()
    assert statuses.count("ok") == 5 and statuses.count("error") == 1
