"""Structured Streaming path: same kernels under foreachBatch."""

import pytest

pyspark = pytest.importorskip("pyspark")

from py_pdf_parser_spark.streaming import stream_extract  # noqa: E402
from py_pdf_parser_spark.synth import ensure_mixed_corpus  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from py_pdf_parser_spark.session import get_spark

    return get_spark(cores=4)


def test_stream_extract_processes_files(spark, tmp_path):
    import os
    import shutil

    src = ensure_mixed_corpus(0.001)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for name in os.listdir(src):
        if name.endswith(".parquet"):
            shutil.copy(os.path.join(src, name), os.path.join(in_dir, name))

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    query = stream_extract(spark, in_dir, out_dir, ckpt)
    try:
        query.processAllAvailable()
    finally:
        query.stop()

    out = spark.read.parquet(out_dir)
    n_docs = spark.read.parquet(src).count()
    assert out.count() == n_docs
    assert out.where("status = 'ok'").count() == n_docs


def test_stream_windowed_counts_matches_batch(spark, tmp_path):
    """Watermarked streaming window agg == batch windowed_counts."""
    import shutil

    from py_pdf_parser_spark.events import windowed_counts
    from py_pdf_parser_spark.streaming import stream_windowed_counts

    src = "/root/testdata/sf0.001/events.parquet"
    in_dir = tmp_path / "events_in"
    in_dir.mkdir()
    shutil.copy(src, in_dir / "part-0.parquet")
    query = stream_windowed_counts(spark, str(in_dir), query_name="wc_test")
    try:
        query.processAllAvailable()
        streamed = {
            tuple(r)
            for r in spark.table("wc_test").collect()
        }
    finally:
        query.stop()

    batch = {
        tuple(r)
        for r in windowed_counts(spark.read.parquet(src)).collect()
    }
    assert streamed == batch
    assert len(batch) > 0
