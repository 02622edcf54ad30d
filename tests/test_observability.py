"""Alerting/triage tier: anomaly scoring (operators/anomaly.py) and
log template mining (operators/templates.py), plus their post-window
oracle execution."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import clickhouse_observability_spark.operators.anomaly as AN
import clickhouse_observability_spark.operators.templates as TP


def test_zscore_flags_injected_spike(spark):
    # flat-ish series with one big spike at hour 40
    rows = []
    for h in range(48):
        rate = 0.10 + (0.001 * (h % 5))
        if h == 40:
            rate = 0.90
        rows.append(Row(bucket=f"2024-01-{1 + h // 24:02d} {h % 24:02d}:00:00",
                        error_rate=rate))
    df = spark.createDataFrame(rows).withColumn(
        "bucket", F.to_timestamp("bucket"))
    out = {r["bucket"].hour + 24 * (r["bucket"].day - 1): r
           for r in AN.trailing_zscores(df, "error_rate").collect()}
    spike = out[40]
    assert spike["is_anomaly"] and spike["zscore"] > 3
    # neighbors are not anomalous
    assert not out[39]["is_anomaly"] and not out[41]["is_anomaly"]
    # the first buckets are unscorable, not "normal with z=0"
    assert out[0]["zscore"] is None and out[1]["zscore"] is None
    assert out[0]["is_anomaly"] is False
    # seasonal delta: hour 40 vs hour 16 the previous day
    assert out[40]["seasonal_delta"] == pytest.approx(
        0.90 - out[16]["error_rate"], abs=1e-9)


def test_zscore_matches_python_reference(spark):
    vals = [0.1, 0.2, 0.15, 0.3, 0.12, 0.5, 0.22, 0.18, 0.35, 0.25]
    df = spark.createDataFrame(
        [Row(bucket=f"2024-01-01 {h:02d}:00:00", v=v)
         for h, v in enumerate(vals)]
    ).withColumn("bucket", F.to_timestamp("bucket"))
    got = [r["zscore"] for r in AN.trailing_zscores(
        df, "v", trailing=24).orderBy("bucket").collect()]
    for i, v in enumerate(vals):
        window = vals[max(0, i - 24):i]
        if len(window) < 3:
            assert got[i] is None
            continue
        m = sum(window) / len(window)
        s = math.sqrt(sum((x - m) ** 2 for x in window)
                      / (len(window) - 1))
        assert got[i] == pytest.approx(round((v - m) / s, 4), abs=1e-9)


def test_templates_collapse_log_lines(spark):
    lines = [
        "Order 12346 has pending items",
        "Order 99 has pending items",
        "Order 7 has pending items",
        "user jane@example.com logged in from 10.0.0.1",
        "user bob@corp.io logged in from 192.168.1.250",
        "trace deadbeefcafe1234 started",
        "trace 0123456789abcdef started",
        "something entirely constant",
    ]
    df = spark.createDataFrame([Row(text=t) for t in lines])
    out = {r["template"]: r for r in
           TP.mine_templates(df, "text").collect()}
    assert out["Order <NUM> has pending items"]["n_lines"] == 3
    # deterministic example: lexicographic min of the raw lines
    assert out["Order <NUM> has pending items"]["example"] == \
        "Order 12346 has pending items"
    assert out["user <EMAIL> logged in from <IP>"]["n_lines"] == 2
    assert out["trace <HEX> started"]["n_lines"] == 2
    assert out["something entirely constant"]["n_lines"] == 1


def test_observability_oracles_match_duckdb(spark, sf_med):
    import duckdb

    from clickhouse_observability_spark.registry import oracle_sql, queries

    qs, oracles = queries(), oracle_sql()
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_med}/{t}.parquet'")
    for name in ("agg_error_anomalies", "text_log_templates",
                 "agg_slo_burn_rate", "text_new_templates",
                 "pipeline_hybrid_retrieval"):
        sdf = qs[name](spark, sf_med)
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        assert sorted(sdf.columns) == sorted(dcols), name
        idx = [dcols.index(c) for c in sdf.columns]
        srows = sorted(tuple(str(v) for v in r) for r in sdf.collect())
        drows = sorted(tuple(str(r[i]) for i in idx)
                       for r in res.fetchall())
        assert srows == drows, name


def test_slo_burn_rate_pages_only_when_sustained_and_live(spark):
    import datetime as dt

    from clickhouse_observability_spark.operators import anomaly as AN

    base = dt.datetime(2025, 9, 1)
    rows = []
    # target 0.1: quiet hours run at 10% errors (burn 1.0); outage
    # hours at 100% (burn 10 >= the 6x threshold)
    for h in range(12):
        rows += [(base + dt.timedelta(hours=h, minutes=m % 60), "error")
                 for m in range(10)]
        rows += [(base + dt.timedelta(hours=h, minutes=m % 60), "view")
                 for m in range(90)]
    # hour 12: single-hour full outage (short burns hot, long diluted)
    rows += [(base + dt.timedelta(hours=12, minutes=m % 60), "error")
             for m in range(100)]
    # hours 13-18: sustained outage -> long window heats up too
    for h in range(13, 19):
        rows += [(base + dt.timedelta(hours=h, minutes=m % 60), "error")
                 for m in range(100)]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r.bucket.hour: r for r in AN.slo_burn_rates(
        AN.hourly_error_rates(ev), target=0.1,
        long_window_buckets=6, threshold=6.0,
    ).collect()}
    # quiet hours: burn ~1, no page
    assert not out[5].page and abs(out[5].burn_short - 1.0) < 0.01
    # first outage hour: short window hot (burn 10) but the 6h long
    # window still holds 5 quiet hours -> diluted below 6 -> NO page
    assert abs(out[12].burn_short - 10.0) < 0.01
    assert out[12].burn_long < 6.0 and not out[12].page
    # sustained outage: by hour 17 the long window is all-outage
    assert out[17].page and out[18].page
    # and after enough hot hours the page is already firing earlier
    assert any(out[h].page for h in (14, 15, 16))


def test_new_templates_flags_only_novel_shapes(spark):
    from clickhouse_observability_spark.operators import templates as TP

    base = spark.createDataFrame(
        [(1, "user 17 logged in from 10.0.0.1"),
         (2, "user 39 logged in from 10.0.0.2"),
         (3, "order 123 created")],
        "doc_id long, text string",
    )
    cur = spark.createDataFrame(
        [(10, "user 55 logged in from 10.9.9.9"),      # known shape
         (11, "order 999 created"),                    # known shape
         (12, "disk 1 failed with code 5"),            # NOVEL
         (13, "disk 2 failed with code 7")],           # same novel shape
        "doc_id long, text string",
    )
    got = {r.template: r.n_lines
           for r in TP.new_templates(cur, base).collect()}
    assert got == {"disk <NUM> failed with code <NUM>": 2}


def test_slo_burn_rate_zero_bucket_is_quiet_not_crash(spark):
    import datetime as dt

    base = dt.datetime(2025, 9, 1)
    rows = [(base, 10, 2), (base + dt.timedelta(hours=1), 0, 0),
            (base + dt.timedelta(hours=2), 10, 2)]
    rates = spark.createDataFrame(
        rows, "bucket timestamp, n_total long, n_errors long")
    out = {r.bucket.hour: r for r in AN.slo_burn_rates(
        rates, target=0.2, long_window_buckets=6, threshold=6.0
    ).collect()}
    assert out[1].burn_short is None and out[1].page is False
    # surrounding buckets still score (long window skips the empty one)
    assert out[2].burn_short == 1.0 and out[2].burn_long == 1.0
