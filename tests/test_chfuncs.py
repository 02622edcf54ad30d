"""ClickHouse aggregate-function family (operators/ch_functions.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

import clickhouse_observability_spark.operators.ch_functions as CH


def test_argmax_argmin_deterministic_ties(spark):
    # two rows tie on by-value: argMax picks the larger arg, argMin
    # the smaller, regardless of input order
    df = spark.createDataFrame(
        [Row(g="a", u=1, v=9.0), Row(g="a", u=7, v=9.0),
         Row(g="a", u=3, v=1.0), Row(g="b", u=5, v=2.0),
         Row(g="b", u=2, v=2.0)]
    )
    out = {r["g"]: r for r in df.groupBy("g").agg(
        CH.arg_max("u", "v").alias("amax"),
        CH.arg_min("u", "v").alias("amin")).collect()}
    assert out["a"]["amax"] == 7 and out["b"]["amax"] == 5
    assert out["a"]["amin"] == 3 and out["b"]["amin"] == 2
    # single aggregation: no Window operator in the plan
    plan = df.groupBy("g").agg(CH.arg_max("u", "v"))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_topk_freq_order_and_ties(spark):
    rows = ([Row(g="x", u=1)] * 3 + [Row(g="x", u=2)] * 3
            + [Row(g="x", u=3)] * 5 + [Row(g="x", u=4)]
            + [Row(g="y", u=9)] * 2)
    df = spark.createDataFrame(rows)
    out = {r["g"]: r["top_k"]
           for r in CH.top_k_by_freq(df, "g", "u", 3).collect()}
    # count desc, then value asc on the 3-vs-3 tie
    assert out["x"] == [3, 1, 2]
    assert out["y"] == [9]


def test_histogram_densifies_empty_bins(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=5.0), Row(g="a", v=455.0), Row(g="a", v=460.0),
         Row(g="a", v=-3.0), Row(g="a", v=999.0)])
    bucket, densify = CH.histogram_fixed("v", 0.0, 500.0, 10)
    out = (
        df.groupBy("g", bucket.alias("b")).agg(F.count("*").alias("c"))
        .groupBy("g")
        .agg(densify(F.collect_list(F.struct("b", "c"))).alias("h"))
    ).collect()[0]["h"]
    # bin1: 5.0 plus the clamped -3.0; bin10: 455/460 plus clamped 999
    assert out == [2, 0, 0, 0, 0, 0, 0, 0, 0, 3]


def test_summap_merges_keys(spark):
    df = spark.createDataFrame(
        [Row(g="a", m={"x": 1.0, "y": 2.0}),
         Row(g="a", m={"x": 10.0}),
         Row(g="b", m={"y": 5.0})])
    out = {(r["g"], r["map_key"]): r["map_sum"]
           for r in CH.sum_map(df, "g", F.col("m")).collect()}
    assert out == {("a", "x"): 11.0, ("a", "y"): 2.0, ("b", "y"): 5.0}


def test_chfuncs_oracles_match_duckdb(spark, sf_med):
    """Executes the agg_ch_* oracle strings against DuckDB at the
    driver's adjudication scale (post-window entries; the tpch_*
    pattern)."""
    import duckdb

    from clickhouse_observability_spark.registry import oracle_sql, queries

    qs, oracles = queries(), oracle_sql()
    names = sorted(n for n in oracles
                   if n.startswith(("agg_ch_", "ch_dialect_")))
    assert len(names) == 3
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_med}/events.parquet'")
    for name in names:
        sdf = qs[name](spark, sf_med)
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        assert sorted(sdf.columns) == sorted(dcols), name
        idx = [dcols.index(c) for c in sdf.columns]
        srows = sorted(tuple(str(v) for v in r) for r in sdf.collect())
        drows = sorted(tuple(str(r[i]) for i in idx)
                       for r in res.fetchall())
        assert srows == drows, name
