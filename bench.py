#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line to stdout:
  {"metric": "...", "value": <flagship extraction sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "docs_per_sec": ...,
   "scaling": {...}, "skew": {...}}

Also writes BENCH/BASELINE.md with the measured throughput at two
parallelism levels (local[8] vs local[32]) and the scaling efficiency
(BASELINE.md criterion: efficiency >= 0.8), plus the skewed-corpus
comparison (rebalance on/off).

Scaling evidence runs in subprocesses (one JVM per parallelism level);
only in-process job time is measured (session startup excluded).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "pp_extract_spans",
    "pp_parse_elements",
    "pp_to_the_right_of",
    "pp_below_all_pages",
    "pp_between",
    "pp_set_xor",
    "pp_memo_extract",
    "pp_ordsum_table",
    "mm_media_features",
    "td_minhash_signatures",
    "td_simhash",
    "td_ngram_jaccard_pairs",
    "emb_cosine_topk",
    "emb_lsh_topk",
]


def _force(df) -> int:
    """Force full computation; return row count."""
    return df.count()


def _read_replicated(spark, corpus_path: str, replicate: int):
    docs = spark.read.parquet(corpus_path)
    out = docs
    for _ in range(replicate - 1):
        out = out.unionByName(spark.read.parquet(corpus_path))
    return out


def _run_extraction(spark, corpus_path: str, rebal: bool = True,
                    replicate: int = 1):
    from py_pdf_parser_spark.pipeline import (
        extract_spans,
        rebalance,
        tune_scan_splits,
    )
    from pyspark.sql import functions as F

    # Split sizing is per-branch; a replicated read multiplies task count
    # by itself, so one tuning call covers both cases.
    tune_scan_splits(spark, corpus_path)
    docs = _read_replicated(spark, corpus_path, replicate)
    if rebal:
        docs = rebalance(docs)
    out = extract_spans(spark, docs)
    t0 = time.time()
    row = out.agg(
        F.count("*").alias("docs"), F.sum("n_spans").alias("spans")
    ).collect()[0]
    sec = time.time() - t0
    return row["docs"], row["spans"], sec


def worker(cores: int, corpus_path: str, replicate: int) -> None:
    """Subprocess: run the extraction job at local[cores], print JSON.

    The corpus is read ``replicate`` times (unioned scans) so the job is
    long enough for throughput measurement to dominate task-scheduling
    noise; only the job wall time is reported (session startup excluded).
    """
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from py_pdf_parser_spark.session import get_spark

    spark = get_spark(cores=cores, app_name=f"bench-worker-{cores}")
    # Warm-up: the IDENTICAL job once (spins up every Python worker,
    # compiles codegen, initializes Arrow) — then the measured pass.
    _run_extraction(spark, corpus_path, replicate=replicate)
    docs, spans, sec = _run_extraction(spark, corpus_path,
                                       replicate=replicate)
    print(json.dumps({"cores": cores, "docs": docs, "spans": spans,
                      "sec": sec}))
    spark.stop()


# Target job length at the SMALL parallelism level, assuming the pipeline
# sustains roughly PIPE_DOCS_PER_SEC_CORE docs/sec/core end to end.
TARGET_SMALL_SEC = 25
PIPE_DOCS_PER_SEC_CORE = 5000


def _scaling(corpus_path: str, corpus_docs: int,
             n_small: int = 8, n_big: int = 32, rounds: int = 2) -> dict:
    target_docs = TARGET_SMALL_SEC * PIPE_DOCS_PER_SEC_CORE * n_small
    replicate = max(1, round(target_docs / max(corpus_docs, 1)))
    results = {}

    def run(cores: int) -> dict:
        # taskset pins the whole JVM+Python-worker tree to `cores` CPUs —
        # in unpinned local mode the "small" run would borrow free cores
        # for its Python workers, inflating the baseline (a real cluster
        # of N executors confines both JVM and Python).
        proc = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}",
             sys.executable, os.path.abspath(__file__), "--worker",
             str(cores), corpus_path, str(replicate)],
            capture_output=True, text=True, timeout=1800,
        )
        last = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
        if not last:
            raise RuntimeError(
                f"scaling worker {cores} failed: {proc.stderr[-2000:]}"
            )
        return json.loads(last[-1])

    # Interleave the two levels across rounds and keep the best pass per
    # level: host noise windows (shared VM) otherwise bias whichever level
    # happens to run during them.
    for _ in range(rounds):
        for cores in (n_small, n_big):
            r = run(cores)
            if cores not in results or r["sec"] < results[cores]["sec"]:
                results[cores] = r
    tp_small = results[n_small]["docs"] / results[n_small]["sec"]
    tp_big = results[n_big]["docs"] / results[n_big]["sec"]
    eff = tp_big / ((n_big / n_small) * tp_small)
    return {
        "n_small": n_small,
        "n_big": n_big,
        "docs": results[n_big]["docs"],
        "replicate": replicate,
        "sec_small": round(results[n_small]["sec"], 3),
        "sec_big": round(results[n_big]["sec"], 3),
        "docs_per_sec_small": round(tp_small, 1),
        "docs_per_sec_big": round(tp_big, 1),
        "efficiency": round(eff, 3),
    }


def _write_baseline_md(sf, flagship, scaling, skew, query_secs) -> None:
    os.makedirs("BENCH", exist_ok=True)
    lines = [
        "# BENCH/BASELINE.md — measured numbers",
        "",
        f"Corpus: mixed-family synthetic interleaved docs at sf={sf} "
        f"({flagship['docs']} docs, {flagship['spans']} output spans); "
        f"machine: local[{CPUS}].",
        "",
        "## Headline",
        "",
        f"- flagship extraction (parse→order→classify→recipe→spans): "
        f"**{flagship['sec']:.2f} s** = "
        f"**{flagship['docs'] / flagship['sec']:.0f} docs/sec** "
        f"at local[{CPUS}]",
        "",
        "## Scaling (BASELINE.json criterion: efficiency ≥ 0.8)",
        "",
        f"| parallelism | job sec | docs/sec |",
        f"|---|---|---|",
        f"| local[{scaling['n_small']}] | {scaling['sec_small']} | "
        f"{scaling['docs_per_sec_small']} |",
        f"| local[{scaling['n_big']}] | {scaling['sec_big']} | "
        f"{scaling['docs_per_sec_big']} |",
        "",
        f"**efficiency = throughput({scaling['n_big']}) / "
        f"({scaling['n_big'] // scaling['n_small']} × "
        f"throughput({scaling['n_small']})) = {scaling['efficiency']}**",
        "",
        "(identical job + input at two parallelism levels in separate JVMs;",
        "session startup excluded; warm-up pass before the measured pass —",
        "the sandbox substitute for N vs 4N executors per BASELINE.md.)",
        "",
        "## Skew (pathological docs: 300-page bigdoc / giant-media bigmedia)",
        "",
        f"| corpus | rebalance | sec |",
        f"|---|---|---|",
        f"| flat | on | {skew['flat_sec']:.2f} |",
        f"| skewed (0.5% pathological) | off | {skew['skew_plain_sec']:.2f} |",
        f"| skewed (0.5% pathological) | on | {skew['skew_rebal_sec']:.2f} |",
        "",
        "## Per-query seconds (sf={} at local[{}])".format(sf, CPUS),
        "",
        "| query | sec |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v:.2f} |" for k, v in query_secs.items()]
    lines.append("")
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines))


def main() -> None:
    from py_pdf_parser_spark.queries import queries as all_queries
    from py_pdf_parser_spark.session import get_spark
    from py_pdf_parser_spark.synth import ensure_mixed_corpus, sf_of_dir

    sf = sf_of_dir(SF_DIR)
    flat = ensure_mixed_corpus(sf)
    skewed = ensure_mixed_corpus(sf, skew=True)

    spark = get_spark(cores=CPUS, app_name="bench")

    # Flagship extraction (warm-up + measured).
    _run_extraction(spark, flat)
    docs, spans, sec = _run_extraction(spark, flat)
    flagship = {"docs": docs, "spans": spans, "sec": sec}

    # Skew comparison at a meaningful job length (~200k docs): the skew
    # corpus clusters pathological docs into their own files, so without
    # rebalance the tasks owning those files are stragglers.
    skew_rep = max(1, 200_000 // max(docs, 1))
    _run_extraction(spark, skewed, rebal=False, replicate=skew_rep)  # warm
    _, _, skew_plain = _run_extraction(
        spark, skewed, rebal=False, replicate=skew_rep
    )
    _, _, skew_rebal = _run_extraction(
        spark, skewed, rebal=True, replicate=skew_rep
    )
    _, _, flat_cmp = _run_extraction(spark, flat, replicate=skew_rep)
    skew = {
        "flat_sec": flat_cmp,
        "skew_plain_sec": skew_plain,
        "skew_rebal_sec": skew_rebal,
    }

    # Per-query timings.
    qs = all_queries()
    query_secs = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        df = fn(spark, SF_DIR)  # build (includes corpus synth on first run)
        t0 = time.time()
        _force(df)
        query_secs[name] = round(time.time() - t0, 3)

    spark.stop()

    # Scaling evidence in fresh JVMs.
    scaling = _scaling(flat, docs, n_small=max(2, CPUS // 4), n_big=CPUS)

    _write_baseline_md(sf, flagship, scaling, skew, query_secs)

    print(
        json.dumps(
            {
                "metric": "flagship extraction wall time (mixed corpus, "
                f"local[{CPUS}])",
                "value": round(sec, 3),
                "unit": "sec",
                "queries": query_secs,
                "sf": sf,
                "docs": docs,
                "docs_per_sec": round(docs / sec, 1),
                "scaling": scaling,
                "skew": {k: round(v, 3) for k, v in skew.items()},
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
    else:
        main()
