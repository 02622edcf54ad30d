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
