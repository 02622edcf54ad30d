"""Scale-mechanism tests: bucketed co-located joins, salted skew
joins/aggregations — the write-side and query-side conventions that
keep plans shuffle-light at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_observability_spark.operators.skew import salted_aggregate, salted_join
from clickhouse_observability_spark.plans.explain import executed_plan
from clickhouse_observability_spark.sources.bucketing import (
    cobucketed_join,
    write_bucketed,
)
from clickhouse_observability_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_small, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 4, path=str(base / "o"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 4, path=str(base / "l"),
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = cobucketed_join(spark, "b_lineitem", "b_orders", "o_orderkey")
        plan = executed_plan(df)
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_cobucketed_join_correct(bucketed, sf_small):
    spark = bucketed
    got = cobucketed_join(spark, "b_lineitem", "b_orders", "o_orderkey").count()
    lineitem = load_table(spark, sf_small, "lineitem")
    orders = load_table(spark, sf_small, "orders")
    expect = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).count()
    assert got == expect


def test_salted_join_matches_plain(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    dim = events.groupBy("event_type").agg(F.round(F.avg("value"), 4).alias("avg_v"))
    plain = events.join(dim, "event_type").select("event_id", "avg_v")
    salted = salted_join(events, dim, on="event_type", salt_by="event_id").select(
        "event_id", "avg_v"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    dim = spark.createDataFrame([("click", 1)], "event_type string, tag int")
    out = salted_join(events, dim, on="event_type", salt_by="event_id", n_salts=4)
    # the salted big side carries 4 distinct sub-keys for the hot key
    b = events.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(4))
    ).filter(F.col("event_type") == "click")
    assert b.select("_salt").distinct().count() == 4
    assert out.count() == events.filter("event_type = 'click'").count()


def test_salted_aggregate_matches_plain(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    got = salted_aggregate(
        events, "event_type", salt_by="event_id",
        agg_exprs=[
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        ],
    )
    expect = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_bucketed_corpus_curation_joins_zero_shuffle(spark, sf_small, tmp_path_factory):
    # The curation pipeline's doc_id joins (survivors ∩ quality ∩ ...)
    # go shuffle-free when the corpus and its per-doc score tables are
    # co-bucketed on doc_id at rest — the write-side convention for
    # running nightly curation over a 100 TB corpus.
    from clickhouse_observability_spark.operators.text_analysis import (
        quality_scores,
    )

    base = tmp_path_factory.mktemp("corpus_buckets")
    docs = load_table(spark, sf_small, "documents")
    write_bucketed(docs, "b_documents", "doc_id", 4, path=str(base / "d"))
    write_bucketed(
        quality_scores(docs), "b_doc_quality", "doc_id", 4, path=str(base / "q")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        d = spark.table("b_documents")
        q = spark.table("b_doc_quality").filter(F.col("passes_quality"))
        out = d.join(q.select("doc_id"), "doc_id", "left_semi")
        plan = executed_plan(out)
        assert "Exchange" not in plan, plan
        # parity with the unbucketed computation
        expect = {r.doc_id for r in quality_scores(docs).collect()
                  if r.passes_quality}
        assert {r.doc_id for r in out.select("doc_id").collect()} == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_documents")
        spark.sql("DROP TABLE IF EXISTS b_doc_quality")
