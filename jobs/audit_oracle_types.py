"""One-shot audit: numeric-class drift between every query's Spark
schema and its DuckDB oracle's DESCRIBE types (the r4 red-row failure
mode — HUGEINT etc. pandas-floatify at the driver).  Build-only on the
Spark side (no collect)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

sys.path.insert(0, "/root/repo")
from tests.test_oracle_parity import _type_class  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from py_pdf_parser_spark.session import get_spark  # noqa: E402

spark = get_spark(cores=8)
qs = e.queries()
oracles = e.oracle_sql()

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/{t}.parquet')"
    )

bad = []
for name, sql in sorted(oracles.items()):
    try:
        df = qs[name](spark, SF_DIR)
        s_types = dict(df.dtypes)
        d_types = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    except Exception as ex:
        bad.append((name, "ERROR", str(ex)[:200]))
        continue
    for col, st in s_types.items():
        dt = d_types.get(col)
        if dt is None:
            bad.append((name, col, f"missing in oracle (has {sorted(d_types)})"))
            continue
        if _type_class(st) != _type_class(dt):
            bad.append((name, col, f"spark={st} oracle={dt}"))

for row in bad:
    print("DRIFT", *row)
print(f"audited {len(oracles)} oracles, {len(bad)} drift findings")
