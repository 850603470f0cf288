"""Local replay of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over sf0.01, compare
row-count + name-sorted value multisets."""

import math

import pytest

pyspark = pytest.importorskip("pyspark")
import duckdb  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
DRIVER_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def spark():
    from py_pdf_parser_spark.session import get_spark

    return get_spark(cores=4)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if v is None:
        return "\0NULL"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )


def _spark_result(spark, fn):
    df = fn(spark, SF_DIR)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def _duck_result(duck, sql):
    cur = duck.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _entry_items():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    return qs, oracles


QS, ORACLES = _entry_items()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, duck, name):
    fn = QS[name]
    s_cols, s_rows = _spark_result(spark, fn)
    d_cols, d_rows = _duck_result(duck, ORACLES[name])
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column names differ: {s_cols} vs {d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [
            (a, b) for a, b in zip(sn, dn) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(QS) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QS[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "doc_id" in df.columns
