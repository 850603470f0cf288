"""Cross-engine differential for the PII scrubber: Spark (Java regex)
vs DuckDB (RE2) on seeded-random documents drawn from a hostile
grammar — valid and near-miss emails/phones/IPs, detector-overlap
shapes, boundary-hostile punctuation, digit soup.  The td_pii_scrub
oracle assumes the two regex engines match on EMAIL_RE/PHONE_RE/IP_RE
(character classes, bounded repeats, ASCII \\b); this pins that
assumption on shapes the planted corpus doesn't produce."""

import random

import pytest

pyspark = pytest.importorskip("pyspark")
import duckdb  # noqa: E402

from py_pdf_parser_spark.textops import analysis as A  # noqa: E402

WORDS = ["aqua", "brine", "coral", "dune", "ember", "fjord", "gale"]


def _email(rng):
    local = rng.choice([
        "user", "a.b", "a_b", "x+tag", "mixed.Case", "123", "1-2",
        "%odd%", "dots..twice", ".lead", "trail.",
    ])
    dom = rng.choice([
        "mail.example.com", "x.co", "a-b.net", "sub.do-main.org",
        "digits0.io", "one.x",
    ])
    return f"{local}@{dom}"


def _near_miss(rng):
    return rng.choice([
        "user@nodot", "user@.com", "@mail.example.com", "user@",
        "123-45-6789", "12-345-6789", "1234-567-8901x", "1.2.3",
        "300.300.300.300.300", "10..0.0.1", "v1.2.3.4beta",
        "user@@mail.example.com", "a@b.c1",  # TLD must be letters
        "555-0100", "212 555 1234",
    ])


def _phone(rng):
    sep = rng.choice(["-", "."])
    return (f"{rng.randint(100, 999)}{sep}{rng.randint(100, 999)}"
            f"{sep}{rng.randint(1000, 9999)}")


def _ip(rng):
    return ".".join(str(rng.randint(0, 999)) for _ in range(4))


def _overlap(rng):
    return rng.choice([
        f"{_phone(rng)}@mail.example.net",
        f"{_email(rng)},{_phone(rng)}",
        f"({_ip(rng)}){_phone(rng)}",
        f"{_phone(rng)}.{_phone(rng)}",
        f"x{_phone(rng)}",  # word char before: \b must reject
        f"{_ip(rng)}5",     # trailing digit: boundary shifts
    ])


def _token(rng):
    r = rng.random()
    if r < 0.35:
        return rng.choice(WORDS)
    if r < 0.5:
        return _email(rng)
    if r < 0.62:
        return _phone(rng)
    if r < 0.74:
        return _ip(rng)
    if r < 0.87:
        return _near_miss(rng)
    return _overlap(rng)


def _doc(rng):
    sep = lambda: rng.choice([" ", " ", " ", ", ", "; ", "("])  # noqa: E731
    out = []
    for _ in range(rng.randint(3, 20)):
        out.append(_token(rng))
        out.append(sep())
    return "".join(out)


@pytest.fixture(scope="module")
def spark():
    from py_pdf_parser_spark.session import get_spark

    return get_spark(cores=4)


def test_pii_scrub_spark_matches_duckdb_on_hostile_docs(spark):
    rng = random.Random(20260818)
    rows = [(i, _doc(rng)) for i in range(400)]

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ips"],
                      r["clean_text"])
        for r in A.pii_scrub(docs).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM "
        "(VALUES " + ", ".join(["(?, ?)"] * len(rows)) + ") t(doc_id, text)",
        [x for row in rows for x in row],
    )
    email, phone, ip = A.EMAIL_RE, A.PHONE_RE, A.IP_RE
    want = {
        doc_id: tuple(rest)
        for doc_id, *rest in con.execute(
            f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{email}')),
       len(regexp_extract_all(text, '{phone}')),
       len(regexp_extract_all(text, '{ip}')),
       regexp_replace(regexp_replace(regexp_replace(text,
           '{email}', '<EMAIL>', 'g'),
           '{phone}', '<PHONE>', 'g'),
           '{ip}', '<IP>', 'g')
FROM d""",
        ).fetchall()
    }
    assert len(got) == len(want) == 400
    mismatches = {
        k: (got[k], want[k]) for k in got if got[k] != want[k]
    }
    assert not mismatches, list(mismatches.items())[:3]
    # the grammar actually produced detections (not a vacuous pass)
    assert sum(g[0] + g[1] + g[2] for g in got.values()) > 200
