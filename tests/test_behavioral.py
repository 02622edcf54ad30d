"""Behavioral analytics: python-reference parity on crafted event
timelines (funnel window/ordering edges, non-overlapping sequence
pairs), plus DuckDB execution of the registered oracle SQL."""

from __future__ import annotations

import datetime as dt

import pytest

from clickhouse_observability_spark.operators import behavioral as B

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(uid, minutes, etype):
    return (uid * 1000 + minutes, BASE + dt.timedelta(minutes=minutes), uid,
            etype, 1.0, "{}")


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        # u1: full funnel inside the window
        _ev(1, 0, "view"), _ev(1, 5, "click"), _ev(1, 10, "purchase"),
        # u2: click BEFORE view -> stops at level 1
        _ev(2, 0, "click"), _ev(2, 5, "view"),
        # u3: purchase outside the 30-minute window -> level 2
        _ev(3, 0, "view"), _ev(3, 10, "click"), _ev(3, 50, "purchase"),
        # u4: anchor is the EARLIEST view; the second view must not
        # re-anchor, so the late click (25 < 30 from first view) counts
        _ev(4, 0, "view"), _ev(4, 20, "view"), _ev(4, 25, "click"),
        # u5: only step-2/3 events -> level 0
        _ev(5, 0, "click"), _ev(5, 1, "purchase"),
        # u6: same-timestamp click as view: strictly-after rule -> 1
        _ev(6, 0, "view"), _ev(6, 0, "click"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_window_funnel_semantics(funnel_events):
    got = {r.user: r.level for r in B.window_funnel(
        funnel_events, ["view", "click", "purchase"], 30 * 60
    ).collect()}
    assert got == {1: 3, 2: 1, 3: 2, 4: 2, 5: 0, 6: 1}


def test_window_funnel_single_step_and_empty(spark):
    df = spark.createDataFrame([_ev(1, 0, "view")], SCHEMA)
    got = {r.user: r.level for r in
           B.window_funnel(df, ["view"], 60).collect()}
    assert got == {1: 1}
    with pytest.raises(ValueError):
        B.window_funnel(df, [], 60)


def test_retention_semantics(spark):
    rows = [
        _ev(1, 0, "signup"), _ev(1, 1, "click"),
        _ev(2, 0, "click"), _ev(2, 1, "purchase"),  # no signup -> all 0
        _ev(3, 0, "signup"), _ev(3, 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.user: (r.r1, r.r2, r.r3) for r in B.retention(
        df, ["event_type = 'signup'", "event_type = 'click'",
             "event_type = 'purchase'"]
    ).collect()}
    assert got == {1: (1, 1, 0), 2: (0, 0, 0), 3: (1, 0, 1)}


def test_sequence_count_non_overlapping(spark):
    rows = [
        # u1: v v p p v p -> pairs: 3 (two opens closed, then one more)
        _ev(1, 0, "view"), _ev(1, 1, "view"), _ev(1, 2, "purchase"),
        _ev(1, 3, "purchase"), _ev(1, 4, "view"), _ev(1, 5, "purchase"),
        # u2: p v -> 0 (purchase before any view)
        _ev(2, 0, "purchase"), _ev(2, 1, "view"),
        # u3: v p p -> 1 (second purchase has no open view)
        _ev(3, 0, "view"), _ev(3, 1, "purchase"), _ev(3, 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.user: r.n_sequences for r in
           B.sequence_count(df, "view", "purchase").collect()}
    assert got == {1: 3, 2: 0, 3: 1}
    # python reference on the testdata shape: replay the fold
    for uid, evs in {
        1: ["view", "view", "purchase", "purchase", "view", "purchase"],
        2: ["purchase", "view"],
        3: ["view", "purchase", "purchase"],
    }.items():
        open_, pairs = 0, 0
        for e in evs:
            if e == "view":
                open_ += 1
            elif open_ > 0:
                open_ -= 1
                pairs += 1
        assert got[uid] == pairs


def test_behavioral_oracles_match_duckdb(spark, sf_small):
    """Executes the registered (outside-the-window) oracle SQL against
    DuckDB on real testdata — no dead oracle text."""
    import duckdb

    from clickhouse_observability_spark.registry import oracle_sql, queries

    qs, oracles = queries(), oracle_sql()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_small}/events.parquet'"
    )
    for name in ("behavior_window_funnel", "behavior_retention"):
        sdf = qs[name](spark, sf_small)
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        assert sorted(sdf.columns) == sorted(dcols), name
        idx = [dcols.index(c) for c in sdf.columns]
        drows = sorted(tuple(str(r[i]) for i in idx) for r in res.fetchall())
        srows = sorted(tuple(str(v) for v in r) for r in sdf.collect())
        assert srows == drows, name


def test_behavioral_single_shuffle_plans(spark, sf_small):
    """The scale claim: every behavioral aggregate is ONE shuffle on
    user_id — no self-joins, no per-user window Exchanges."""
    from clickhouse_observability_spark.plans.explain import shuffle_count
    from clickhouse_observability_spark.sources.parquet import load_table

    ev = load_table(spark, sf_small, "events")
    assert shuffle_count(B.window_funnel(ev, ["view", "click"], 3600)) == 1
    assert shuffle_count(B.retention(ev, ["event_type = 'signup'"])) == 1
    assert shuffle_count(B.sequence_count(ev, "view", "purchase")) == 1
