"""Event analytics: session-timezone independence.

events._epoch must treat naive timestamps as UTC wall clock by pure
field extraction — results may not depend on spark.sql.session.timeZone
and building the queries may not mutate it (round-2 advice: the old
_events_table pinned the caller's session to UTC as a side effect).
"""

import datetime

import pytest

pyspark = pytest.importorskip("pyspark")

from py_pdf_parser_spark import events  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from py_pdf_parser_spark.session import get_spark

    return get_spark(cores=4)


def _events_df(spark):
    rows = [
        # (event_id, user_id, ts, event_type, value, props)
        (1, 7, datetime.datetime(2024, 3, 10, 1, 58, 30, 500000), "a", 1.0, '{"k": 3}'),
        (2, 7, datetime.datetime(2024, 3, 10, 2, 1, 0), "a", 2.0, '{"k": 13}'),
        # 40-min gap -> new session at default 30-min gap
        (3, 7, datetime.datetime(2024, 3, 10, 2, 41, 0), "b", 3.0, '{"k": 5}'),
        (4, 8, datetime.datetime(2024, 3, 10, 2, 3, 0), "a", 4.0, '{"k": 25}'),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    )


def _collect(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("tz", ["America/Los_Angeles", "Asia/Kolkata"])
def test_results_identical_under_hostile_session_timezone(spark, tz):
    # 2024-03-10 is the US DST-spring-forward date: 02:xx wall times
    # don't exist in America/Los_Angeles, so any NTZ->LTZ leak would
    # shift (or corrupt) epochs here.
    df = _events_df(spark)
    prev = spark.conf.get("spark.sql.session.timeZone")
    baseline = {
        "win": _collect(events.windowed_counts(df)),
        "sess": _collect(events.sessionize(df)),
        "users": _collect(events.windowed_distinct_users(df)),
        "json": _collect(events.json_prop_stats(df)),
    }
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        assert _collect(events.windowed_counts(df)) == baseline["win"]
        assert _collect(events.sessionize(df)) == baseline["sess"]
        assert (
            _collect(events.windowed_distinct_users(df)) == baseline["users"]
        )
        assert _collect(events.json_prop_stats(df)) == baseline["json"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_epoch_is_naive_as_utc(spark):
    df = _events_df(spark)
    out = {
        (r["user_id"], r["session_id"]): (r["start_s"], r["end_s"])
        for r in events.sessionize(df).collect()
    }
    # user 7, session 1: events 1-2; floor(epoch) of 01:58:30.5 UTC
    start = int(
        datetime.datetime(
            2024, 3, 10, 1, 58, 30, tzinfo=datetime.timezone.utc
        ).timestamp()
    )
    end = int(
        datetime.datetime(
            2024, 3, 10, 2, 1, 0, tzinfo=datetime.timezone.utc
        ).timestamp()
    )
    assert out[(7, 1)] == (start, end)
    assert (7, 2) in out  # the 40-min gap split


def test_query_builders_do_not_mutate_session_timezone(spark):
    from py_pdf_parser_spark import queries as Q

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        Q._events_table(spark, "/root/testdata/sf0.001")
        assert (
            spark.conf.get("spark.sql.session.timeZone") == "Asia/Kolkata"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
