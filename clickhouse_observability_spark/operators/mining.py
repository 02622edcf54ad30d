"""Contrastive-pair mining over the embedding corpus.

Training a retriever/encoder needs, per anchor: POSITIVES (true
near-duplicates / same-content pairs) and HARD NEGATIVES — the most
similar vectors that are NOT duplicates, which carry nearly all the
gradient signal (public result: dense-retrieval training collapses
with random negatives; e.g. the DPR/ANCE line of work).

The mining rule here: rank the anchor's neighbors by cosine;
`cosine >= dup_threshold` -> positive, the highest-ranked remainder
-> hard negatives. Both labels come from ONE neighbor scan.

Exact path (small anchor sets / oracle anchor): broadcast the
anchors over the corpus scan — one pass, one window per anchor.
Scale path: feed any candidate generator (the LSH bucket join in
`operators/similarity.knn_join_lsh`) through `label_candidates` —
the labeling/ranking is identical, only candidate generation
changes. Recall is pinned against the exact path in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_observability_spark.operators.similarity import _cosine


def _rank_and_label(
    scored: DataFrame, n_pos: int, n_neg: int, dup_threshold: float
) -> DataFrame:
    """(query_id, vec_id, cosine) -> labeled, per-label ranked."""
    labeled = scored.withColumn(
        "label",
        F.when(F.col("cosine") >= dup_threshold, F.lit("positive"))
        .otherwise(F.lit("hard_negative")),
    )
    w = Window.partitionBy("query_id", "label").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    cap = (F.when(F.col("label") == "positive", F.lit(n_pos))
           .otherwise(F.lit(n_neg)))
    return (
        labeled.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cap)
        .select("query_id", "label", "rank", "vec_id",
                F.round("cosine", 6).alias("cosine"))
    )


def mine_contrastive_exact(
    embeddings: DataFrame,
    anchor_ids: list[int],
    n_pos: int = 3,
    n_neg: int = 5,
    dup_threshold: float = 0.95,
) -> DataFrame:
    """Exact mining for an explicit anchor set: anchors broadcast,
    corpus streams once."""
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = e.filter(
        F.col("vec_id").isin([int(i) for i in anchor_ids])
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", _cosine("qv", "v").alias("cosine"))
    )
    return _rank_and_label(scored, n_pos, n_neg, dup_threshold)


def label_candidates(
    candidates: DataFrame,
    n_pos: int = 3,
    n_neg: int = 5,
    dup_threshold: float = 0.95,
) -> DataFrame:
    """Scale path: label/rank whatever candidate pairs an ANN stage
    produced. Expects (query_id, vec_id, cosine) — e.g. the LSH
    bucket join's output re-keyed. Same semantics as the exact path
    on the candidate subset; recall = candidate-generation recall."""
    return _rank_and_label(
        candidates.select("query_id", "vec_id", "cosine"),
        n_pos, n_neg, dup_threshold)
