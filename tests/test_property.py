"""Property-based tests (hypothesis): query_logs vs a pure-Python
reference model on randomized inputs — the semantics of db.go:81-99
hold for ALL inputs, not just the fixture rows."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_observability_spark.operators.query_logs import query_logs
from clickhouse_observability_spark.schema import LOGS_SCHEMA

BASE = dt.datetime(2025, 9, 1)

services = st.sampled_from(["orders", "payments", "inventory"])
levels = st.sampled_from(["INFO", "WARN", "ERROR", "DEBUG"])
users = st.sampled_from(["alice", "bob", ""])


@st.composite
def logs_rows(draw):
    n = draw(st.integers(min_value=0, max_value=25))
    rows = []
    for i in range(n):
        ts = BASE + dt.timedelta(minutes=draw(st.integers(0, 600)))
        user = draw(users)
        attrs = f'{{"user": "{user}"}}' if user else draw(st.sampled_from(["{}", ""]))
        rows.append(
            (ts, draw(services), draw(levels), f"m{i}", attrs, f"t{i}", f"s{i}")
        )
    return rows


def _model(rows, service, frm, to, level, user, limit):
    """Pure-Python reference of the db.go:81-99 template."""
    import json

    out = []
    for r in rows:
        ts, svc, lvl, msg, attrs, tr, sp = r
        if svc != service or not (frm <= ts < to):
            continue
        if level and lvl != level:
            continue
        if user:
            try:
                if json.loads(attrs).get("user") != user:
                    continue
            except (ValueError, AttributeError):
                continue
        out.append(r)
    out.sort(key=lambda r: r[0], reverse=True)
    return out[:limit]


@pytest.mark.slow
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=logs_rows(),
    service=services,
    level=st.one_of(st.none(), levels),
    user=st.one_of(st.none(), st.sampled_from(["alice", "bob", "nobody"])),
    window=st.tuples(st.integers(0, 600), st.integers(0, 600)),
    limit=st.integers(1, 30),
)
def test_query_logs_matches_model(spark, rows, service, level, user, window, limit):
    frm = BASE + dt.timedelta(minutes=min(window))
    to = BASE + dt.timedelta(minutes=max(window))
    df = spark.createDataFrame(rows, LOGS_SCHEMA) if rows else spark.createDataFrame([], LOGS_SCHEMA)
    got = query_logs(df, service, frm, to, level=level, user=user, limit=limit).collect()
    want = _model(rows, service, frm, to, level, user, limit)
    # compare as multisets of (ts, msg) — equal-ts orderings are free
    assert sorted((r.ts, r.msg) for r in got) == sorted((w[0], w[3]) for w in want)
    # and the returned order is ts-descending
    ts_list = [r.ts for r in got]
    assert ts_list == sorted(ts_list, reverse=True)


@st.composite
def interval_fixture(draw):
    n_ev = draw(st.integers(min_value=0, max_value=30))
    n_iv = draw(st.integers(min_value=0, max_value=8))
    evs = [
        (i, BASE + dt.timedelta(minutes=draw(st.integers(0, 2000))))
        for i in range(n_ev)
    ]
    ivs = []
    for _ in range(n_iv):
        s = draw(st.integers(0, 2000))
        e = draw(st.integers(-30, 2000))  # may be degenerate/inverted
        ivs.append(
            (BASE + dt.timedelta(minutes=s), BASE + dt.timedelta(minutes=s + e))
        )
    width = draw(st.sampled_from([60, 600, 3600, 7200]))
    return evs, ivs, width


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fx=interval_fixture())
def test_interval_join_matches_python_model(spark, fx):
    # Binned rewrite == brute-force containment for ALL inputs, any
    # bin width, including empty sides and degenerate intervals.
    from clickhouse_observability_spark.operators.joins import interval_join

    evs, ivs, width = fx
    ev_df = spark.createDataFrame(evs or [(0, BASE)], "event_id long, ts timestamp")
    if not evs:
        ev_df = ev_df.filter("event_id < 0")
    iv_df = spark.createDataFrame(
        ivs or [(BASE, BASE)], "start_ts timestamp, end_ts timestamp"
    )
    if not ivs:
        iv_df = iv_df.filter("start_ts IS NULL")
    got = sorted(
        (r.event_id, r.start_ts, r.end_ts)
        for r in interval_join(ev_df, iv_df, bin_width_sec=width).collect()
    )
    expect = sorted(
        (eid, s, e)
        for eid, ts in evs
        for s, e in ivs
        if s <= ts < e
    )
    assert got == expect


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet="abc @.19-xyz_ ",
            min_size=0, max_size=60,
        ),
        min_size=1, max_size=8,
    )
)
def test_pii_counts_match_python_re(spark, texts):
    # Spark regexp_count == Python re on the same pattern class for
    # arbitrary noisy text (shared RE2/Java-compatible dialect).
    import re

    from clickhouse_observability_spark.operators.text_analysis import (
        PII_PATTERNS,
        pii_scrub,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in pii_scrub(df).collect()}
    for i, t in enumerate(texts):
        for name, pat in PII_PATTERNS.items():
            assert getattr(rows[i], f"n_{name}") == len(re.findall(pat, t)), (
                name, t
            )
