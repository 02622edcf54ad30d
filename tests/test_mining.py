"""Contrastive-pair mining (operators/mining.py)."""

from __future__ import annotations

from pyspark.sql import Row

import clickhouse_observability_spark.operators.mining as M
import clickhouse_observability_spark.operators.similarity as S
from clickhouse_observability_spark.sources.parquet import load_table


def test_labels_split_at_threshold(spark):
    # anchor 0; 100=dup (cos 1.0), 1..3 progressively less similar
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),
        Row(vec_id=100, embedding=[2.0, 0.0]),     # exact direction dup
        Row(vec_id=1, embedding=[1.0, 0.2]),
        Row(vec_id=2, embedding=[1.0, 0.8]),
        Row(vec_id=3, embedding=[0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows)
    out = M.mine_contrastive_exact(df, [0], n_pos=2, n_neg=2,
                                   dup_threshold=0.99)
    got = {(r["label"], r["rank"]): r["vec_id"] for r in out.collect()}
    assert got[("positive", 1)] == 100
    assert got[("hard_negative", 1)] == 1  # most similar non-dup
    assert got[("hard_negative", 2)] == 2
    assert ("hard_negative", 3) not in got  # n_neg caps the list


def test_lsh_candidates_recover_exact_labels(spark, sf_med):
    """Scale path: LSH candidates + label_candidates recovers the
    exact mining output for the oracle anchors with high recall."""
    emb = load_table(spark, sf_med, "embeddings")
    anchors = [0, 1, 2, 3, 4]
    exact = {
        (r["query_id"], r["label"], r["vec_id"])
        for r in M.mine_contrastive_exact(emb, anchors).collect()
    }
    cands = S.knn_join_lsh(emb, k=16, max_bucket_frac=0.25)
    approx = {
        (r["query_id"], r["label"], r["vec_id"])
        for r in M.label_candidates(cands).collect()
        if r["query_id"] in anchors
    }
    # positives (near-dups) cluster into the same buckets: full recall
    exact_pos = {t for t in exact if t[1] == "positive"}
    assert exact_pos <= approx
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, recall


def test_retrieval_pipeline_returns_snippets(spark, sf_med):
    from clickhouse_observability_spark.registry import queries

    out = queries()["pipeline_retrieval"](spark, sf_med).collect()
    assert len(out) == 25  # 5 anchors x top-5
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
        assert r["snippet"] and len(r["snippet"]) <= 80
        assert r["source"]
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        # ranked by similarity descending
        ordered = sorted(rs, key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in ordered]
        assert cosines == sorted(cosines, reverse=True)


def test_mining_oracle_matches_duckdb(spark, sf_med):
    import duckdb

    from clickhouse_observability_spark.registry import oracle_sql, queries

    qs, oracles = queries(), oracle_sql()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{sf_med}/embeddings.parquet'")
    name = "sim_contrastive_mining"
    sdf = qs[name](spark, sf_med)
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    idx = [dcols.index(c) for c in sdf.columns]
    srows = sorted(tuple(str(v) for v in r) for r in sdf.collect())
    drows = sorted(tuple(str(r[i]) for i in idx) for r in res.fetchall())
    assert srows == drows
