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
    # u6: same-timestamp click advances (ClickHouse default mode has
    # no strict-ordering constraint) -> level 2
    assert got == {1: 3, 2: 1, 3: 2, 4: 2, 5: 0, 6: 2}


def test_window_funnel_reanchors_at_later_step1(spark):
    """Review r4: ClickHouse re-anchors at EVERY step-1 event — a
    later view starts a fresh window, so a click outside the first
    view's window still reaches level 2. An earliest-anchor
    implementation returns 1 here."""
    rows = [_ev(1, 0, "view"), _ev(1, 17, "view"), _ev(1, 45, "click")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.user: r.level for r in
           B.window_funnel(df, ["view", "click"], 30 * 60).collect()}
    assert got == {1: 2}
    # and the chain START is what the window measures: the level-2
    # chain is anchored at view@17, so purchase@46 (within 30min of
    # 17) completes the funnel while purchase@49 would not
    rows = [_ev(2, 0, "view"), _ev(2, 17, "view"), _ev(2, 45, "click"),
            _ev(2, 46, "purchase")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.user: r.level for r in B.window_funnel(
        df, ["view", "click", "purchase"], 30 * 60).collect()}
    assert got == {2: 3}
    rows = [_ev(3, 0, "view"), _ev(3, 17, "view"), _ev(3, 45, "click"),
            _ev(3, 49, "purchase")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.user: r.level for r in B.window_funnel(
        df, ["view", "click", "purchase"], 30 * 60).collect()}
    assert got == {3: 2}  # 49 > 17 + 30: outside the chain's window


def _funnel_replay(evs, steps, window_s):
    """Python replay of the ClickHouse windowFunnel fold."""
    t = [None] * len(steps)
    lvl = 0
    for us, step in sorted(evs):
        if step == 0:
            t[0] = us
            lvl = max(lvl, 1)
        elif t[step - 1] is not None and us <= t[step - 1] + window_s * 1_000_000:
            t[step] = t[step - 1]
            lvl = max(lvl, step + 1)
    return lvl


def test_window_funnel_matches_replay_on_testdata(spark, sf_small):
    from clickhouse_observability_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    steps = ["view", "click", "purchase"]
    ev = load_table(spark, sf_small, "events")
    got = {r.user: r.level for r in
           B.window_funnel(ev, steps, 6 * 3600).collect()}
    rows = ev.filter(F.col("event_type").isin(steps)).select(
        "user_id", F.unix_micros("ts").alias("us"), "event_type"
    ).collect()
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(
            (r.us, steps.index(r.event_type))
        )
    expect = {u: _funnel_replay(evs, steps, 6 * 3600)
              for u, evs in per_user.items()}
    assert got == expect


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
        # u1: v v p p v p -> ClickHouse counts 2 (v@0..p@2 matches,
        # resume after p@2: p@3 has no armed view; v@4..p@5 matches).
        # Review r4: earliest-open bipartite matching would say 3.
        _ev(1, 0, "view"), _ev(1, 1, "view"), _ev(1, 2, "purchase"),
        _ev(1, 3, "purchase"), _ev(1, 4, "view"), _ev(1, 5, "purchase"),
        # u2: p v -> 0 (purchase before any view)
        _ev(2, 0, "purchase"), _ev(2, 1, "view"),
        # u3: v p p -> 1 (second purchase has no armed view)
        _ev(3, 0, "view"), _ev(3, 1, "purchase"), _ev(3, 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.user: r.n_sequences for r in
           B.sequence_count(df, "view", "purchase").collect()}
    assert got == {1: 2, 2: 0, 3: 1}
    # python replay of the greedy ClickHouse scan
    for uid, evs in {
        1: ["view", "view", "purchase", "purchase", "view", "purchase"],
        2: ["purchase", "view"],
        3: ["view", "purchase", "purchase"],
    }.items():
        armed, pairs = False, 0
        for e in evs:
            if not armed and e == "view":
                armed = True
            elif armed and e == "purchase":
                armed = False
                pairs += 1
        assert got[uid] == pairs


def test_behavioral_oracles_match_duckdb(spark, sf_small):
    """Executes the registered (outside-the-window) oracle SQL against
    DuckDB on real testdata — no dead oracle text. (windowFunnel is
    rows-only since the review: its ClickHouse-exact sequential fold
    has no clean SQL mirror — the replay test above is its gate.)"""
    import duckdb

    from clickhouse_observability_spark.registry import oracle_sql, queries

    qs, oracles = queries(), oracle_sql()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_small}/events.parquet'"
    )
    for name in ("behavior_retention",):
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


class TestSequenceMatch:
    def _run(self, spark, rows, pattern, conds):
        from clickhouse_observability_spark.operators.behavioral import (
            sequence_match,
        )
        import datetime as dt

        df = spark.createDataFrame(
            [(u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), t)
             for (u, s, t) in rows],
            "user_id bigint, ts timestamp, event_type string")
        out = sequence_match(df, pattern, conds)
        return {r.user: r.matched for r in out.collect()}

    def test_strict_adjacency_skips_unmatched(self, spark):
        # x matches no condition -> skipped, so v,p are adjacent (CH
        # documented behavior)
        got = self._run(spark, [(1, 0, "v"), (1, 5, "x"), (1, 9, "p"),
                                (2, 0, "p"), (2, 5, "v")],
                        "(?1)(?2)", ["v", "p"])
        assert got == {1: True, 2: False}

    def test_parallel_prefixes_no_greedy_trap(self, spark):
        # v,v,p: the SECOND v anchors the adjacent match — a greedy
        # single-chain scan would die on the middle v
        got = self._run(spark, [(1, 0, "v"), (1, 5, "v"), (1, 9, "p")],
                        "(?1)(?2)", ["v", "p"])
        assert got == {1: True}
        # an intervening event that matches SOME condition (here
        # cond3) is visible and breaks strict adjacency; `.*`
        # tolerates it. (Events matching NO condition are skipped —
        # previous test.)
        rows = [(1, 0, "v"), (1, 5, "p"), (1, 9, "q")]
        got2 = self._run(spark, rows, "(?1)(?2)", ["v", "q", "p"])
        assert got2 == {1: False}
        got3 = self._run(spark, rows, "(?1).*(?2)", ["v", "q", "p"])
        assert got3 == {1: True}

    def test_three_step_and_repeated_cond(self, spark):
        got = self._run(spark, [(1, 0, "a"), (1, 1, "a"), (1, 2, "b")],
                        "(?1)(?1)(?2)", ["a", "b"])
        assert got == {1: True}
        # one event cannot serve two references
        got2 = self._run(spark, [(1, 0, "a"), (1, 2, "b")],
                         "(?1)(?1)(?2)", ["a", "b"])
        assert got2 == {1: False}

    def test_time_constraints_le_and_gt(self, spark):
        rows = [(1, 0, "v"), (1, 30, "p"),
                (2, 0, "v"), (2, 3600, "p")]
        got = self._run(spark, rows, "(?1)(?t<=60)(?2)", ["v", "p"])
        assert got == {1: True, 2: False}
        got2 = self._run(spark, rows, "(?1)(?t>60)(?2)", ["v", "p"])
        assert got2 == {1: False, 2: True}
        # > uses the EARLIEST anchor: a later re-anchor must not
        # shadow an old-enough one
        got3 = self._run(spark, [(1, 0, "v"), (1, 50, "v"), (1, 70, "p")],
                         "(?1)(?t>60)(?2)", ["v", "p"])
        assert got3 == {1: True}
        # <= uses the LATEST anchor
        got4 = self._run(spark, [(1, 0, "v"), (1, 50, "v"), (1, 70, "p")],
                         "(?1)(?t<=30)(?2)", ["v", "p"])
        assert got4 == {1: True}

    def test_unsupported_shapes_raise(self, spark):
        import pytest as _pytest

        for pat, msg in [
            ("(?1)(?t<=5)(?2)(?t>5)(?3)", "mixed"),
            ("(?1)(?t<=5)(?2)(?3)", "strict adjacency combined"),
            (".*(?1)", "cannot start"),
            ("(?1).*", "cannot end"),
            ("(?9)", "exceeds"),
            ("(?1)x(?2)", "unsupported pattern token"),
        ]:
            with _pytest.raises(ValueError, match=msg):
                self._run(spark, [(1, 0, "v")], pat, ["v", "p", "q"])


def test_window_funnel_strict_modes(spark):
    """The three documented CH windowFunnel modes. Fixtures are the
    docs' own shapes: A->B->D->C stops at 2 under strict_order (D
    interleaves) but reaches 3 by default; equal timestamps advance
    by default but not under strict_increase; a repeated condition
    interrupts under strict_deduplication."""
    import datetime as dt

    import clickhouse_observability_spark.operators.behavioral as B

    def ev(rows):
        return spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 10, 0, s), t) for s, t in rows],
            "user_id long, ts timestamp, event_type string",
        )

    steps = ["A", "B", "C"]

    def lvl(df, **kw):
        out = B.window_funnel(df, steps, 3600, **kw).collect()
        return out[0].level if out else None

    # strict_order: interleaving condition event kills open chains
    inter = ev([(0, "A"), (1, "B"), (2, "D"), (3, "C")])
    steps4 = ["A", "B", "C", "D"]
    out_def = B.window_funnel(inter, steps4, 3600).collect()[0].level
    out_so = B.window_funnel(
        inter, steps4, 3600, modes=("strict_order",)).collect()[0].level
    assert out_def == 3  # default: D is just noise for A->B->C
    assert out_so == 2   # docs: stops at the D

    # ...and an event matching NO condition breaks chains too (the
    # docs' own example has D outside the conditions; default mode
    # filters non-matching events, strict_order must keep them)
    assert B.window_funnel(inter, steps, 3600).collect()[0].level == 3
    assert B.window_funnel(
        inter, steps, 3600, modes=("strict_order",)
    ).collect()[0].level == 2

    # strict_order still allows a fresh chain after the break
    redo = ev([(0, "A"), (1, "D"), (2, "A"), (3, "B"), (4, "C")])
    assert lvl(redo, modes=("strict_order",)) == 3

    # strict_increase: equal timestamps don't advance
    eq = ev([(0, "A"), (0, "B"), (1, "C")])
    assert lvl(eq) == 3
    assert lvl(eq, modes=("strict_increase",)) == 1
    inc = ev([(0, "A"), (1, "B"), (2, "C")])
    assert lvl(inc, modes=("strict_increase",)) == 3

    # strict_increase keeps the parallel re-anchor semantics: a later
    # faster chain still counts (the r4 single-chain trap)
    par = ev([(0, "A"), (1, "B"), (2, "A"), (3, "C")])
    assert lvl(par, modes=("strict_increase",)) == 3

    # strict_deduplication: repeating a matched condition interrupts
    dup = ev([(0, "A"), (1, "A"), (2, "B"), (3, "C")])
    assert lvl(dup) == 3
    assert lvl(dup, modes=("strict_dedup",)) == 1
    dup2 = ev([(0, "A"), (1, "B"), (2, "A"), (3, "C")])
    assert lvl(dup2, modes=("strict_deduplication",)) == 2

    # combined modes compose
    assert lvl(inc, modes=("strict_increase", "strict_order")) == 3

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown windowFunnel"):
        B.window_funnel(inc, steps, 60, modes=("bogus",))


def test_sequence_next_node_planted_timelines(spark):
    """Hand-built timelines for every base/direction pair, including
    the chain-at-the-edge NULL and the tie-break on equal ts."""
    import datetime as dt

    from clickhouse_observability_spark.operators.behavioral import (
        sequence_next_node,
    )

    T = lambda m: dt.datetime(2025, 5, 1, 10, m)  # noqa: E731
    rows = [
        # u1: view click purchase error
        (1, T(0), "view"), (1, T(1), "click"),
        (1, T(2), "purchase"), (1, T(3), "error"),
        # u2: click view click — chain matches but nothing follows
        (2, T(0), "click"), (2, T(1), "view"), (2, T(2), "click"),
        # u3: no match at all
        (3, T(0), "error"), (3, T(1), "signup"),
        # u4: signup click view — backward scan [view click signup]:
        # the node BEFORE the chain in real time is signup
        (4, T(0), "signup"), (4, T(1), "click"), (4, T(2), "view"),
        # u5: error view click purchase — fwd head fails (chain not
        # at the start) but first_match finds it
        (5, T(0), "error"), (5, T(1), "view"),
        (5, T(2), "click"), (5, T(3), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    chain = ["view", "click"]

    def got(direction, base):
        return {r.user: r.next_node for r in
                sequence_next_node(ev, chain, direction, base).collect()}

    assert got("forward", "first_match") == {
        1: "purchase", 2: None, 3: None, 4: None, 5: "purchase"}
    assert got("forward", "head") == {
        1: "purchase", 2: None, 3: None, 4: None, 5: None}
    assert got("backward", "tail") == {
        1: None, 2: None, 3: None, 4: "signup", 5: None}
    assert got("backward", "last_match") == {
        1: None, 2: None, 3: None, 4: "signup", 5: None}
    # the chain is given in SCAN order (CH-style): a real-time
    # view->click chain scanned backward is written (click, view) —
    # u5 (error view click purchase) then yields the pre-chain node
    bwd = {r.user: r.next_node for r in
           sequence_next_node(ev, ["click", "view"],
                              "backward", "last_match").collect()}
    # u1's chain starts at its very first event: nothing precedes it
    assert bwd[5] == "error" and bwd[1] is None
    # degenerate cross combos refuse instead of returning all-NULL
    import pytest as _pytest
    with _pytest.raises(ValueError, match="scans off"):
        sequence_next_node(ev, chain, "forward", "tail")
    with _pytest.raises(ValueError, match="scans off"):
        sequence_next_node(ev, chain, "backward", "head")
    with _pytest.raises(ValueError, match="non-empty"):
        sequence_next_node(ev, [], "forward", "head")
