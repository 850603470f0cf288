"""Spark-layer tests: parse stage, ElementFrame vs kernel differential,
extraction pipeline, checkpoint/resume."""

import os
import shutil

import pytest

from py_pdf_parser_spark.kernel.layout import ora_spans
from py_pdf_parser_spark.kernel.parse import doc_from_spans

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from py_pdf_parser_spark.frame import ElementFrame  # noqa: E402
from py_pdf_parser_spark.pipeline import (  # noqa: E402
    extract_spans,
    parse_elements,
    rebalance,
    run_job,
)
from py_pdf_parser_spark.synth import (  # noqa: E402
    ensure_mixed_corpus,
    ensure_oracle_corpus,
)


@pytest.fixture(scope="module")
def spark():
    from py_pdf_parser_spark.session import get_spark

    s = get_spark(cores=4)
    yield s


@pytest.fixture(scope="module")
def ora_docs(spark):
    path = ensure_oracle_corpus(0.001)
    return spark.read.parquet(path)


class TestParseElements:
    def test_schema_and_counts(self, spark, ora_docs):
        elements = parse_elements(ora_docs)
        total_spans = ora_docs.select(
            F.sum(F.size("spans")).alias("n")
        ).collect()[0]["n"]
        assert elements.count() == total_spans
        assert set(elements.columns) >= {
            "doc_id", "idx", "page_number", "x0", "x1", "y0", "y1",
            "text", "font", "kind", "media_ref",
        }

    def test_idx_dense_and_ordered(self, spark, ora_docs):
        elements = parse_elements(ora_docs)
        bad = (
            elements.groupBy("doc_id")
            .agg(
                F.count("*").alias("n"),
                F.max("idx").alias("mx"),
                F.min("idx").alias("mn"),
            )
            .where((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0))
            .count()
        )
        assert bad == 0

    def test_matches_kernel_exactly(self, spark, ora_docs):
        elements = parse_elements(ora_docs).orderBy("doc_id", "idx")
        rows = elements.collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, doc_rows in list(by_doc.items())[:20]:
            i = int(doc_id.split("-")[1])
            doc = doc_from_spans(doc_id, ora_spans(i))
            assert len(doc_rows) == doc.n
            for pos, r in enumerate(doc_rows):
                assert r["idx"] == pos
                assert r["page_number"] == doc.page[pos]
                assert r["x0"] == doc.x0[pos]
                assert r["text"] == doc.text_stripped[pos]
                assert r["font"] == doc.font[pos]


class TestElementFrameDifferential:
    """DataFrame-level operators must agree with the kernel per doc."""

    def _kernel_docs(self, n=15):
        return {
            f"ora-{i:06d}": doc_from_spans(f"ora-{i:06d}", ora_spans(i))
            for i in range(n)
        }

    def _collect_keys(self, ef):
        return {
            (r["doc_id"], r["idx"])
            for r in ef.df.select("doc_id", "idx").collect()
        }

    def test_text_and_font_filters(self, spark, ora_docs):
        ef = ElementFrame.from_documents(ora_docs.where("doc_id < 'ora-000015'"))
        docs = self._kernel_docs()
        got = self._collect_keys(ef.filter_by_text_equal("HDR:"))
        want = {
            (d, i)
            for d, doc in docs.items()
            for i in doc.elements.filter_by_text_equal("HDR:")
        }
        assert got == want
        got_f = self._collect_keys(ef.filter_by_font("f1,8"))
        want_f = {
            (d, i)
            for d, doc in docs.items()
            for i in doc.elements.filter_by_font("f1,8")
        }
        assert got_f == want_f

    def test_regex_parity(self, spark, ora_docs):
        ef = ElementFrame.from_documents(ora_docs.where("doc_id < 'ora-000015'"))
        docs = self._kernel_docs()
        got = self._collect_keys(ef.filter_by_regex(r"tok1\d$"))
        want = {
            (d, i)
            for d, doc in docs.items()
            for i in doc.elements.filter_by_regex(r"tok1\d$")
        }
        assert got == want

    def test_directional_join(self, spark, ora_docs):
        ef = ElementFrame.from_documents(ora_docs.where("doc_id < 'ora-000015'"))
        docs = self._kernel_docs()
        anchors = ef.filter_by_text_equal("HDR:")
        got = self._collect_keys(ef.to_the_right_of(anchors))
        want = set()
        for d, doc in docs.items():
            a = doc.elements.filter_by_text_equal("HDR:").extract_single_element()
            want |= {(d, i) for i in doc.elements.to_the_right_of(a)}
        assert got == want

    def test_below_all_pages(self, spark, ora_docs):
        ef = ElementFrame.from_documents(ora_docs.where("doc_id < 'ora-000015'"))
        docs = self._kernel_docs()
        anchors = ef.filter_by_text_equal("HDR:")
        got = self._collect_keys(ef.below(anchors, all_pages=True))
        want = set()
        for d, doc in docs.items():
            a = doc.elements.filter_by_text_equal("HDR:").extract_single_element()
            want |= {(d, i) for i in doc.elements.below(a, all_pages=True)}
        assert got == want

    def test_between_and_set_ops(self, spark, ora_docs):
        ef = ElementFrame.from_documents(ora_docs.where("doc_id < 'ora-000015'"))
        docs = self._kernel_docs()
        start = ef.filter_by_text_equal("HDR:")
        end = ef.filter_by_text_equal("END:")
        got = self._collect_keys(ef.between(start, end))
        want = set()
        for d, doc in docs.items():
            s = doc.elements.filter_by_text_equal("HDR:").extract_single_element()
            e = doc.elements.filter_by_text_equal("END:").extract_single_element()
            want |= {(d, i) for i in doc.elements.between(s, e)}
        assert got == want
        # xor of text vs media
        text_ef = ef.filter_by_kind("text")
        media_ef = ef.filter_by_kind("media")
        assert self._collect_keys(text_ef.xor(media_ef)) == self._collect_keys(
            text_ef.union(media_ef)
        )

    def test_first_last_per_doc(self, spark, ora_docs):
        ef = ElementFrame.from_documents(ora_docs.where("doc_id < 'ora-000015'"))
        firsts = ef.first_per_doc().df.select("doc_id", "idx").collect()
        assert all(r["idx"] == 0 for r in firsts)
        lasts = {
            r["doc_id"]: r["idx"]
            for r in ef.last_per_doc().df.select("doc_id", "idx").collect()
        }
        docs = self._kernel_docs()
        assert lasts == {d: doc.n - 1 for d, doc in docs.items()}


class TestMoveFrom:
    def test_capped_colliding_anchors_stay_key_unique(self, spark, ora_docs):
        """Two out-of-range anchors in one doc both clamp to the last
        element under capped=True — the output must carry that element
        ONCE (key-unique (doc_id, idx), the frame invariant)."""
        ef = ElementFrame.from_documents(
            ora_docs.where("doc_id = 'ora-000000'")
        )
        last_idx = ef.last_per_doc().df.select("idx").collect()[0]["idx"]
        # the last two elements: both + large count overshoot the end
        anchors = ElementFrame(ef.df.where(F.col("idx") >= last_idx - 1))
        out = ef.move_from(anchors, count=10, capped=True).df
        rows = out.select("doc_id", "idx").collect()
        assert len(rows) == 1
        assert rows[0]["idx"] == last_idx


class TestSectionsFrame:
    def test_counter_and_include_last_element(self, spark, ora_docs):
        from py_pdf_parser_spark.frame import sections_frame

        ef = ElementFrame.from_documents(ora_docs.where("doc_id < 'ora-000005'"))
        starts = ef.where(F.col("x0") == 5.0)
        ends = ef.where(F.col("x0") == 65.0)
        secs = sections_frame(starts, ends, "row").collect()
        assert secs
        per_doc = {}
        for r in secs:
            assert r["unique_name"] == f"row_{r['seq']}"
            assert r["start_idx"] <= r["end_idx"]
            per_doc.setdefault(r["doc_id"], []).append(r["seq"])
        for seqs in per_doc.values():
            # per-name counter: dense 0..k-1 per document
            assert sorted(seqs) == list(range(len(seqs)))
        incl = {(r["doc_id"], r["seq"]): r["end_idx"] for r in secs}
        excl = sections_frame(
            starts, ends, "row", include_last_element=False
        ).collect()
        for r in excl:
            assert r["end_idx"] == incl[(r["doc_id"], r["seq"])] - 1

    def test_membership_matches_kernel(self, spark, ora_docs):
        from py_pdf_parser_spark.frame import sections_frame

        ef = ElementFrame.from_documents(ora_docs.where("doc_id < 'ora-000010'"))
        sections = sections_frame(
            ef.filter_by_text_equal("HDR:"),
            ef.filter_by_text_equal("END:"),
            "body",
        )
        got = {
            (r["doc_id"], r["idx"])
            for r in ef.filter_by_section_name(sections, "body")
            .df.select("doc_id", "idx")
            .collect()
        }
        want = set()
        for i in range(10):
            doc_id = f"ora-{i:06d}"
            doc = doc_from_spans(doc_id, ora_spans(i))
            s = doc.elements.filter_by_text_equal("HDR:").extract_single_element()
            e = doc.elements.filter_by_text_equal("END:").extract_single_element()
            sec = doc.sectioning.create_section("body", s, e)
            want |= {(doc_id, int(j)) for j in sec.elements()}
        assert got == want
        # unknown unique_name -> empty, not an error
        assert (
            ef.filter_by_section(sections, "nope_0").df.count() == 0
        )


class TestExtract:
    def test_extract_statuses_and_spans(self, spark):
        path = ensure_mixed_corpus(0.001)
        docs = spark.read.parquet(path)
        out = extract_spans(spark, docs)
        agg = out.groupBy("status").count().collect()
        by_status = {r["status"]: r["count"] for r in agg}
        assert by_status.get("ok", 0) == docs.count()
        assert "error" not in by_status
        sample = out.where(F.col("doc_id").startswith("memo-")).first()
        spans = sample["spans"]
        assert spans[0]["text"].startswith("TO: ")
        assert [s["order"] for s in spans] == list(range(len(spans)))

    def test_rebalance_splits_heavy(self, spark):
        path = ensure_mixed_corpus(0.001, skew=True)
        docs = spark.read.parquet(path)
        balanced = rebalance(docs, heavy_threshold=512)
        assert balanced.count() == docs.count()
        out = extract_spans(spark, balanced)
        assert out.where(F.col("status") == "error").count() == 0

    def test_skew_split_pushes_n_spans_to_scan(self, spark):
        """The light/heavy cost split must reach the parquet scan as a
        stats-prunable n_spans predicate (one-corpus-read I/O), not a
        post-scan size(spans) filter."""
        from py_pdf_parser_spark.pipeline import extract_spans_rebalanced

        path = ensure_mixed_corpus(0.001, skew=True)
        docs = spark.read.parquet(path)
        assert "n_spans" in docs.columns
        out = extract_spans_rebalanced(spark, docs, heavy_threshold=512)
        plan = out._jdf.queryExecution().toString()
        assert "GreaterThan(n_spans,512)" in plan
        assert "LessThanOrEqual(n_spans,512)" in plan
        # and the split is lossless
        assert out.count() == docs.count()


class TestCheckpointResume:
    def test_resume_skips_completed_buckets(self, spark, tmp_path):
        path = ensure_mixed_corpus(0.001)
        out_dir = str(tmp_path / "job_out")
        # First run: inject failure for bucket 3 — waves containing it fail.
        with pytest.raises(RuntimeError):
            run_job(
                spark, path, out_dir, num_buckets=8, num_waves=4,
                fail_buckets=[3],
            )
        completed_first = (
            spark.read.parquet(f"{out_dir}/_lineage")
            .where(F.col("status") == "ok")
            .select("bucket")
            .distinct()
            .count()
        )
        assert 0 < completed_first < 8
        # Resume: no injection; must process only remaining buckets.
        stats = run_job(spark, path, out_dir, num_buckets=8, num_waves=4)
        assert stats["skipped_buckets"] == completed_first
        assert stats["processed_buckets"] == 8 - completed_first
        # Full output present exactly once per doc.
        extracted = spark.read.parquet(f"{out_dir}/extracted")
        n_docs = spark.read.parquet(path).count()
        assert extracted.count() == n_docs
        assert extracted.select("doc_id").distinct().count() == n_docs
        # Attempt counter advanced for retried buckets.
        lineage = spark.read.parquet(f"{out_dir}/_lineage")
        retried = lineage.where(
            (F.col("status") == "ok") & (F.col("attempt") > 1)
        ).count()
        assert retried > 0


class TestMaterializedElements:
    def test_parse_once_query_many_with_pushdown(self, spark, tmp_path):
        """materialize_elements: same rows as the live parse, and
        element-level filters reach the parquet scan (PushedFilters) —
        which the mapInArrow kernel can never offer."""
        from py_pdf_parser_spark.pipeline import (
            materialize_elements,
            parse_elements,
        )
        from py_pdf_parser_spark.synth import ensure_mixed_corpus

        src = ensure_mixed_corpus(0.001)
        out = materialize_elements(spark, src, str(tmp_path / "elements"))
        mat = spark.read.parquet(out)
        live = parse_elements(spark.read.parquet(src))
        assert mat.count() == live.count()

        q = mat.where("font = 'f1,8'").select("doc_id", "idx")
        plan = q._jdf.queryExecution().toString()
        assert "PushedFilters" in plan and "EqualTo(font,f1,8)" in plan

        got = sorted(map(tuple, q.collect()))
        want = sorted(
            map(
                tuple,
                live.where("font = 'f1,8'")
                .select("doc_id", "idx")
                .collect(),
            )
        )
        assert got == want and len(got) > 0

    def test_bucketed_anchor_join_no_exchange(self, spark, tmp_path):
        """The at-scale anchor-join path: over the bucketBy(doc_id)
        elements table, directional operators must plan as a co-located
        SortMergeJoin — no Exchange, and (crucially) no forced
        BroadcastExchange of the anchor side, which at 10^12 docs would
        be an O(corpus) driver OOM."""
        from py_pdf_parser_spark.pipeline import materialize_elements

        src = ensure_mixed_corpus(0.001)
        materialize_elements(
            spark, src, str(tmp_path / "elements_b"), bucket_by_doc=8
        )
        mat = spark.table("elements_bucketed")
        ef = ElementFrame(mat)
        anchors = ef.filter_by_kind("text").filter_by_page(1)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            q = ef.to_the_right_of(anchors).df
            plan = q._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            assert "Broadcast" not in plan
            assert q.count() > 0
            # order ops take the same path
            q2 = ef.before(anchors.first_per_doc()).df
            plan2 = q2._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan2 and "Broadcast" not in plan2
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
