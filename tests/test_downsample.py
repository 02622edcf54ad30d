"""LTTB downsampling (operators/downsample.py)."""

from __future__ import annotations

import math

from clickhouse_observability_spark.operators.downsample import (
    lttb_downsample,
)


def _lttb_exact(points, n_out):
    """Reference LTTB (Steinarsson 2013), any point selectable."""
    n = len(points)
    if n <= n_out:
        return list(points)
    out = [points[0]]
    every = (n - 2) / (n_out - 2)
    a = 0
    for i in range(n_out - 2):
        rs = int(math.floor((i + 0) * every) + 1)
        re_ = int(math.floor((i + 1) * every) + 1)
        nx_s = int(math.floor((i + 1) * every) + 1)
        nx_e = min(int(math.floor((i + 2) * every) + 1), n)
        if nx_s >= n:
            nx = points[-1]
        else:
            seg = points[nx_s:nx_e] or [points[-1]]
            nx = (sum(p[0] for p in seg) / len(seg),
                  sum(p[1] for p in seg) / len(seg))
        best, best_area = None, -1.0
        pa = points[a]
        for j in range(rs, min(re_, n)):
            px, py = points[j]
            area = abs((pa[0] - nx[0]) * (py - pa[1])
                       - (pa[0] - px) * (nx[1] - pa[1]))
            if area > best_area:
                best, best_area, a_new = (px, py), area, j
        out.append(best)
        a = a_new
    out.append(points[-1])
    return out


def test_lttb_invariants_and_extremes(spark):
    # a noisy series with sharp spikes: LTTB must keep the spikes
    pts = []
    for i in range(400):
        y = math.sin(i / 15.0) * 10
        if i in (57, 211, 340):
            y += 80  # spikes
        if i == 120:
            y -= 60  # dip
        pts.append((float(i), y))
    df = spark.createDataFrame(pts, "x double, y double")
    out = sorted(
        (r.x, r.y)
        for r in lttb_downsample(df, "x", "y", 60).collect()
    )
    assert len(out) == 60
    assert out[0] == pts[0] and out[-1] == pts[-1]  # endpoints kept
    xs = {x for x, _ in out}
    for spike in (57.0, 211.0, 340.0, 120.0):
        assert spike in xs, f"lost feature at x={spike}"
    # every selected point is a real input point
    pset = set(pts)
    assert all(p in pset for p in out)


def test_lttb_small_series_pass_through(spark):
    pts = [(float(i), float(i % 7)) for i in range(20)]
    df = spark.createDataFrame(pts, "x double, y double")
    out = sorted((r.x, r.y) for r in lttb_downsample(df, "x", "y", 50)
                 .collect())
    assert out == pts


def test_lttb_partitioned_and_timestamp_axis(spark):
    import datetime as dt

    rows = []
    for s in ("a", "b"):
        for i in range(300):
            rows.append((s, dt.datetime(2024, 1, 1) +
                         dt.timedelta(minutes=i),
                         float((i * 7) % 50 + (100 if s == "b" else 0))))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = lttb_downsample(df, "ts", "v", 40, partition_by=("k",))
    rowsc = out.collect()
    assert out.schema["ts"].dataType.typeName() == "timestamp"
    per = {}
    for r in rowsc:
        per.setdefault(r.k, []).append((r.ts, r.v))
    assert set(per) == {"a", "b"}
    assert all(len(v) == 40 for v in per.values())
    for s in ("a", "b"):
        sel = sorted(per[s])
        src = sorted((ts, v) for k, ts, v in rows if k == s)
        assert sel[0] == src[0] and sel[-1] == src[-1]


def _area(prev, nxt, p):
    return abs((prev[0] - nxt[0]) * (p[1] - prev[1])
               - (prev[0] - p[0]) * (nxt[1] - prev[1]))


def test_lttb_candidate_bound_property(spark):
    """Fuzz-backed approximation claim (r6 verdict #5). The triangle
    area is |A*cy + B*cx + C|, LINEAR in the candidate (A = prev.x -
    next.x spans ~two buckets, B = next.y - prev.y). The candidate
    set contains both y-extremes and both x-extremes of the bucket,
    so the best candidate's area is PROVABLY within
    |B| * (bucket x-range) of the exact per-bucket optimum — the
    y-extreme point loses at most the B*cx slack. Hypothesis hunts
    random series for a violation of that bound per FOLD DECISION
    (same prev/next the operator's own fold used), and for any
    structural break: endpoints exact, one point per bucket, every
    output a real input point. Corollary asserted too: a bucket whose
    optimum dominates by more than the slack (a feature spike) must
    be picked EXACTLY."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        ys=st.lists(
            st.floats(min_value=-100, max_value=100,
                      allow_nan=False, allow_infinity=False),
            min_size=20, max_size=120,
        ),
        n_out=st.integers(min_value=4, max_value=16),
        data=st.data(),
    )
    def prop(ys, n_out, data):
        n = len(ys)
        if n <= n_out:
            return
        # optionally plant a dominant spike so the equality corollary
        # is exercised, not just vacuously true
        spike_at = data.draw(
            st.one_of(st.none(),
                      st.integers(min_value=1, max_value=n - 2)))
        if spike_at is not None:
            ys = list(ys)
            ys[spike_at] += 10_000.0
        pts = [(float(i), float(v)) for i, v in enumerate(ys)]
        df = spark.createDataFrame(pts, "x double, y double")
        got = sorted((r.x, r.y) for r in
                     lttb_downsample(df, "x", "y", n_out).collect())
        assert len(got) == n_out
        assert got[0] == pts[0] and got[-1] == pts[-1]
        pset = set(pts)
        assert all(p in pset for p in got)

        # operator's bucket partition (index-based, see downsample.py)
        inner = n_out - 2

        def bucket(j):  # j = 0-based overall index
            if j == 0:
                return 0
            if j == n - 1:
                return n_out - 1
            return (j * inner - 1) // (n - 2) + 1

        buckets = {}
        for j, p in enumerate(pts):
            buckets.setdefault(bucket(j), []).append(p)
        assert sorted(buckets) == list(range(n_out))
        for i, sel in enumerate(got):
            assert sel in buckets[i], (i, sel)  # one point per bucket

        # per-decision bound, replaying the fold's own prev/next
        for i in range(1, n_out - 1):
            prev = got[i - 1]
            nb = buckets[i + 1]
            nxt = (sum(p[0] for p in nb) / len(nb),
                   sum(p[1] for p in nb) / len(nb))
            areas = [_area(prev, nxt, p) for p in buckets[i]]
            best = max(areas)
            xs = [p[0] for p in buckets[i]]
            slack = abs(nxt[1] - prev[1]) * (max(xs) - min(xs))
            eps = 1e-6 * max(1.0, best)
            sel_area = _area(prev, nxt, got[i])
            assert sel_area >= best - slack - eps, (
                i, sel_area, best, slack)
            # dominance corollary: a unique optimum clear of the
            # slack must be selected exactly
            rest = max((a for a in areas if a != best), default=0.0)
            if best - rest > slack + eps:
                assert sel_area == best, (i, sel_area, best, rest)

    prop()


def test_lttb_matches_exact_reference(spark):
    """Two fixtures, two claims. Feature-dominated series (visible
    spikes over mild structure — the shape dashboards downsample):
    the candidate-restricted distributed fold equals exact LTTB
    POINT-FOR-POINT. Pure-noise series (no dominant features; every
    bucket's optimum is noise): the documented approximation may pick
    a different same-bucket point occasionally — agreement stays
    high and endpoints/buckets identical."""
    import random

    # feature-dominated: spikes dwarf the noise
    rng = random.Random(7)
    pts = [(float(i),
            rng.uniform(-0.01, 0.01) + (50 if i % 37 == 0 else 0))
           for i in range(370)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = sorted((r.x, r.y) for r in
                 lttb_downsample(df, "x", "y", 30).collect())
    exact = sorted(_lttb_exact(pts, 30))
    assert got == exact

    # noise-dominated: bounded divergence, same buckets
    pts = [(float(i), rng.uniform(-1, 1)) for i in range(370)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = sorted((r.x, r.y) for r in
                 lttb_downsample(df, "x", "y", 30).collect())
    exact = sorted(_lttb_exact(pts, 30))
    gx, ex = [p[0] for p in got], [p[0] for p in exact]
    assert gx[0] == ex[0] and gx[-1] == ex[-1]
    same = sum(1 for a, b in zip(gx, ex) if a == b)
    assert same >= int(0.7 * len(ex)), (same, gx, ex)
