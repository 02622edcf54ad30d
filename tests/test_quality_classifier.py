"""Quality classifier (GPT-3/CCNet-style hashed-ngram logistic
regression): separability, determinism, scoring parity with a
pure-numpy replay, Pareto selection, and the no-BatchEvalPython lane
contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhouse_observability_spark.operators import quality_classifier as QC
from clickhouse_observability_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-quality-classifier")


GOOD_WORDS = ["theorem", "analysis", "rigorous", "citation", "method"]
BAD_WORDS = ["click", "buy", "cheap", "winner", "prize"]


def _corpus(spark, n=120, seed=3):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        good = i % 2 == 0
        pool = GOOD_WORDS if good else BAD_WORDS
        words = [pool[rng.randint(len(pool))] for _ in range(12)]
        rows.append((i, " ".join(words), good))
    return spark.createDataFrame(rows, "doc_id long, text string, good boolean")


def test_train_separates_and_is_deterministic(spark):
    df = _corpus(spark)
    pos, neg = df.filter("good"), df.filter("NOT good")
    clf = QC.train_quality_classifier(
        spark, pos, neg, dim=1 << 12, iters=40, lr=10.0)
    assert clf.n_train == 120
    # loss decreases and ends well below ln(2) (chance level)
    assert clf.losses[-1] < 0.15 < clf.losses[0]
    assert clf.losses[-1] < clf.losses[0]
    scored = QC.score_quality(df, clf, out_col="q").select(
        "doc_id", "good", "q").collect()
    acc = np.mean([(r.q > 0.5) == r.good for r in scored])
    assert acc >= 0.95
    # identical rerun -> bit-identical weights (w starts at 0; every
    # step is a pure function of the data)
    clf2 = QC.train_quality_classifier(
        spark, pos, neg, dim=1 << 12, iters=40, lr=10.0)
    assert np.array_equal(clf.w, clf2.w)


def test_score_matches_numpy_replay(spark):
    """The mapInPandas scorer must equal a driver-side numpy replay
    over the SAME JVM-computed feature indices — pins the
    train/score featurization contract."""
    df = _corpus(spark, n=30)
    pos, neg = df.filter("good"), df.filter("NOT good")
    clf = QC.train_quality_classifier(
        spark, pos, neg, dim=1 << 12, iters=5, lr=1.0)
    feats = df.select(
        "doc_id",
        QC.hashed_ngram_features("text", clf.dim).alias("idx")).collect()
    got = {r.doc_id: r.q for r in QC.score_quality(
        df, clf, out_col="q").select("doc_id", "q").collect()}
    for r in feats:
        ii = np.asarray(r.idx, dtype=np.int64)
        z = clf.w[clf.dim] + (clf.w[ii].sum() / max(len(ii), 1))
        want = 1.0 / (1.0 + np.exp(-z))
        assert got[r.doc_id] == pytest.approx(want, rel=1e-12)


def test_empty_and_single_token_docs(spark):
    """Empty docs ride the bias; single-token docs must not emit a
    descending bigram sequence()."""
    df = spark.createDataFrame(
        [(1, ""), (2, "word"), (3, "two words")],
        "doc_id long, text string")
    feats = {r.doc_id: list(r.f) for r in df.select(
        "doc_id",
        QC.hashed_ngram_features("text", 1 << 10).alias("f")).collect()}
    assert feats[1] == []
    assert len(feats[2]) == 1          # unigram only, no bigram arm
    assert len(feats[3]) == 3          # 2 unigrams + 1 bigram
    clf = QC.QualityClassifier(
        w=np.zeros((1 << 10) + 1), dim=1 << 10)
    rows = QC.score_quality(df, clf, out_col="q").collect()
    assert all(r.q == 0.5 for r in rows)   # zero weights -> sigmoid(0)


def test_pareto_keep_deterministic_and_monotone(spark):
    df = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(
            np.linspace(0.01, 0.99, 200))],
        "doc_id long, quality_score double")
    kept = df.select(
        "doc_id", "quality_score",
        QC.pareto_keep_col().alias("keep"))
    a = {r.doc_id: r.keep for r in kept.collect()}
    b = {r.doc_id: r.keep for r in kept.collect()}
    assert a == b                       # hash-derived noise, not RNG
    rows = kept.collect()
    hi = [r.keep for r in rows if r.quality_score > 0.9]
    lo = [r.keep for r in rows if r.quality_score < 0.1]
    # the filter is aggressive by design (GPT-3 kept ~10% of the
    # crawl): keep iff pareto(9) > 1 - score, so the rate is
    # (2 - score)^-9 — monotone in score, far from all-or-nothing
    assert np.mean(hi) > np.mean(lo)
    assert np.mean(lo) < 0.15


def test_pareto_keep_rate_matches_inverse_cdf(spark):
    """Large-sample rate check: P(keep | score = s) = (2 - s)^-alpha
    (keep iff (1-u)^(-1/a) - 1 > 1 - s with u uniform). Pins the
    inverse-CDF transform itself."""
    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(0.9).alias("quality_score"))
    rate = (
        df.select(QC.pareto_keep_col().alias("k"))
        .agg(F.avg(F.col("k").cast("double")))
        .collect()[0][0])
    want = (2.0 - 0.9) ** -9.0      # ~= 0.424
    assert rate == pytest.approx(want, abs=0.03)


def test_scoring_plan_is_arrow_lane(spark):
    """Scoring must go through MapInPandas (Arrow), never
    BatchEvalPython, and add no shuffle."""
    df = _corpus(spark, n=10)
    clf = QC.QualityClassifier(w=np.zeros(QC.DEFAULT_DIM + 1))
    plan = QC.score_quality(df, clf)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan       # map-only: the 100 TB path


def test_score_quality_repeated_calls_leave_input_schema_intact(spark):
    """Latent r9 bug (exposed r10): StructType.add mutates in place
    and DataFrame.schema is cached, so building the output schema
    with df.schema.add(...) corrupted the INPUT frame's schema on the
    second score_quality call over the same DataFrame object."""
    import numpy as np

    from clickhouse_observability_spark.operators import (
        quality_classifier as QC,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string")
    clf = QC.QualityClassifier(
        w=np.zeros((1 << 8) + 1), dim=1 << 8, bigrams=True)
    before = [f.name for f in df.schema.fields]
    for _ in range(3):
        out = QC.score_quality(df, clf)
        assert out.select("quality_score").count() == 2
    assert [f.name for f in df.schema.fields] == before
