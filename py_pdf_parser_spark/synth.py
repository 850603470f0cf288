"""Deterministic synthetic corpora (seed-free: pure functions of doc_id).

Writes parquet tables of exactly the hinted input shape
``(doc_id string, spans array<struct<kind,text,media_ref,offset int>>)``.

Two corpora:
  * **oracle corpus** (``ora`` family only) — layout is mirrored in DuckDB
    SQL, so every pp_* query in ``__spark_entry__.py`` has an independent
    SQL oracle.
  * **mixed corpus** — all families (ora/memo/ordsum/media), optionally
    plus pathological skew docs (bigdoc/bigmedia), used by the pipeline
    tests and ``bench.py``.

Corpora are cached under ``synthdata/`` in the repo; content is a pure
function of (kind, scale) so regeneration is idempotent.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from .kernel.layout import SPAN_BUILDERS

REPO_ROOT = os.path.dirname(os.path.abspath(__file__)) + "/.."
SYNTH_DIR = os.path.join(os.path.abspath(REPO_ROOT), "synthdata")

SPANS_ARROW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        (
            "spans",
            pa.list_(
                pa.struct(
                    [
                        ("kind", pa.string()),
                        ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32()),
                    ]
                )
            ),
        ),
    ]
)


def _rows_for(family: str, count: int, start: int = 0) -> List[Tuple[str, list]]:
    builder = SPAN_BUILDERS[family]
    rows = []
    for i in range(start, start + count):
        doc_id = f"{family}-{i:06d}"
        spans = [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in builder(i)
        ]
        rows.append((doc_id, spans))
    return rows


def _write(rows: List[Tuple[str, list]], path: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table = pa.Table.from_pydict(
        {"doc_id": [r[0] for r in rows], "spans": [r[1] for r in rows]},
        schema=SPANS_ARROW_SCHEMA,
    )
    pq.write_table(table, path)
    return path


def oracle_corpus_path(sf: float) -> str:
    return os.path.join(SYNTH_DIR, f"ora_sf{sf}", "documents.parquet")


def mixed_corpus_path(sf: float, skew: bool = False) -> str:
    tag = "skew" if skew else "flat"
    return os.path.join(SYNTH_DIR, f"mixed_{tag}_sf{sf}", "documents.parquet")


def ensure_oracle_corpus(sf: float) -> str:
    """ora-only corpus: n_docs = 60000 * sf (sf0.01 -> 600 docs)."""
    path = oracle_corpus_path(sf)
    if os.path.exists(path):
        return path
    n_docs = max(50, int(60000 * sf))
    return _write(_rows_for("ora", n_docs), path)


def ensure_mixed_corpus(sf: float, skew: bool = False) -> str:
    """Mixed-family corpus: n_docs = 200000 * sf (sf0.1 -> 20000 docs).

    With ``skew=True``, 0.5% of docs are pathological (bigdoc: 900 spans
    over 300 pages; bigmedia: 200 spans with giant media payloads) — the
    AQE-invisible compute skew the pipeline's salting must absorb.
    """
    path = mixed_corpus_path(sf, skew)
    if os.path.exists(path):
        return path
    n_docs = max(100, int(200000 * sf))
    rows: List[Tuple[str, list]] = []
    rows += _rows_for("ora", int(n_docs * 0.70))
    rows += _rows_for("memo", int(n_docs * 0.15))
    rows += _rows_for("media", int(n_docs * 0.10))
    rows += _rows_for("ordsum", n_docs - len(rows) - (int(n_docs * 0.005) * 2 if skew else 0))
    if skew:
        n_patho = int(n_docs * 0.005) or 1
        rows += _rows_for("bigdoc", n_patho)
        rows += _rows_for("bigmedia", n_patho)
    # Interleave families deterministically so file row-groups aren't
    # family-sorted (mimics real ingestion order).  zlib.crc32, not hash():
    # str hash is salted per process.
    import zlib

    rows.sort(key=lambda r: zlib.crc32(r[0].encode()) % 1_000_003)
    return _write(rows, path)


def family_corpus_path(family: str, sf: float) -> str:
    return os.path.join(SYNTH_DIR, f"fam_{family}_sf{sf}", "documents.parquet")


def ensure_family_corpus(family: str, sf: float) -> str:
    """Single-family corpus (memo/ordsum/... golden-query inputs)."""
    path = family_corpus_path(family, sf)
    if os.path.exists(path):
        return path
    n_docs = max(20, int(20000 * sf))
    return _write(_rows_for(family, n_docs), path)


def sf_of_dir(sf_dir: str) -> float:
    """Parse the scale factor from a driver testdata dir name (…/sf0.01)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        return float(base[2:])
    return 0.01
