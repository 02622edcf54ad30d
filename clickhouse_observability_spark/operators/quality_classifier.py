"""High-dimensional quality classifier + Pareto-noised selection.

The scale-path sibling of `text_analysis.train_quality_classifier` /
`score_quality_classifier` (the 512-bucket pyspark.ml model whose
weights ship as LITERAL expressions — the right call at 512 doubles,
where scoring is pure JVM arithmetic with no ML runtime). That
literal path has a hard ceiling: at fastText-scale widths (2^15+
buckets, the published quality-filter regime) the training frame's
dense per-doc vectors are 256 KB each and a 32k-element literal
array blows up codegen. This module keeps features SPARSE end to
end and ships weights by BROADCAST instead of by literal — same
recipe (GPT-3 appendix A: logistic regression over hashed features,
`np.random.pareto(9)` acceptance; CCNet §4.3 with a fastText model),
different width class. It also adds the selection step itself
(`pareto_keep_col`), which the 512-bucket path feeds equally well.
Everything here derives from those public descriptions and the
Spark API.

Spark-first split of the work:

- **Featurization is JVM-only SQL** (`hashed_ngram_features`):
  lowercase → split on non-alphanumerics → unigram + bigram hashing
  trick (`pmod(xxhash64(gram), dim)`), emitted as an `array<int>` of
  indices WITH repetition (each occurrence contributes 1/n weight,
  so the array itself is the sparse tf vector). Identical expression
  on the train and score paths — the two can never drift.
- **Training** (`train_quality_classifier`) is batch gradient
  descent where each iteration is ONE narrow Spark job: the weight
  vector (dim+1 doubles, ~256 KB at the default 2^15) is broadcast,
  an Arrow-batched `mapInPandas` computes one PARTIAL GRADIENT per
  partition (vectorized `np.add.reduceat` over the concatenated
  index arrays — no per-row Python), and the driver sums the
  O(#partitions) partials and steps. This is the treeAggregate
  pattern of every distributed linear model. No shuffle at any
  point; the featurized frame is cached across iterations and
  unpersisted after.
- **Scoring** (`score_quality`) is the 100 TB hot path: broadcast
  weights + map-only Arrow batches, linear in the corpus, no
  shuffle. Training is the cold path and runs on a bounded sample
  (the published recipes train on 10^5–10^6 docs and score the full
  crawl) — `sample_fraction` makes that explicit.
- **Pareto selection** (`pareto_keep_col`) is pure JVM SQL with
  DETERMINISTIC noise: the uniform draw is derived from
  `xxhash64(doc_id)`, so the kept set is reproducible and testable
  (GPT-3's `np.random.pareto` is the same inverse-CDF transform of
  a uniform: `(1-u)^(-1/alpha) - 1`).

Zero row-at-a-time Python UDFs (repo-wide CI lint); the two Python
lanes here are Arrow-batched mapInPandas.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField

DEFAULT_DIM = 1 << 15  # 32768 hashed feature buckets (~256 KB weights)


def ngram_tokens(text_col: str = "text") -> Column:
    """The tokenizer stage, projected SEPARATELY so downstream
    feature expressions reference one computed column — Spark does
    not CSE a textually repeated subtree across expressions, and the
    regex split is the expensive part (r10: the inlined form ran it
    ~4x per row)."""
    return F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), "
        f"__t -> __t != '')")


def hashed_ngram_features_from(
    tok_col: str, dim: int = DEFAULT_DIM, bigrams: bool = True
) -> Column:
    """`array<int>` of hashed unigram (+bigram) indices over an
    ALREADY-TOKENIZED column (ngram_tokens), repetition preserved.
    All JVM expressions; the sequence() guard matters —
    sequence(1, 0) DESCENDS, so single-token docs must short-circuit
    the bigram arm."""
    uni = (f"transform({tok_col}, "
           f"__t -> CAST(pmod(xxhash64(__t), {dim}) AS INT))")
    if not bigrams:
        return F.expr(uni)
    big = (
        f"CASE WHEN size({tok_col}) >= 2 THEN "
        f"transform(sequence(1, size({tok_col}) - 1), __i -> "
        f"CAST(pmod(xxhash64(concat(element_at({tok_col}, __i), ' ', "
        f"element_at({tok_col}, __i + 1))), {dim}) AS INT)) "
        f"ELSE CAST(array() AS ARRAY<INT>) END")
    return F.expr(f"concat({uni}, {big})")


def hashed_ngram_features(
    text_col: str = "text", dim: int = DEFAULT_DIM, bigrams: bool = True
) -> Column:
    """One-shot convenience form over raw text. Prefer projecting
    ngram_tokens first and calling hashed_ngram_features_from — this
    inline form re-runs the tokenizer inside each sub-expression
    (fine for tests/one-offs, wasteful on the scoring hot path)."""
    toks = (f"filter(split(lower({text_col}), '[^a-z0-9]+'), "
            f"__t -> __t != '')")
    uni = f"transform({toks}, __t -> CAST(pmod(xxhash64(__t), {dim}) AS INT))"
    if not bigrams:
        return F.expr(uni)
    big = (
        f"CASE WHEN size({toks}) >= 2 THEN "
        f"transform(sequence(1, size({toks}) - 1), __i -> "
        f"CAST(pmod(xxhash64(concat(element_at({toks}, __i), ' ', "
        f"element_at({toks}, __i + 1))), {dim}) AS INT)) "
        f"ELSE CAST(array() AS ARRAY<INT>) END")
    return F.expr(f"concat({uni}, {big})")


@dataclass
class QualityClassifier:
    """Trained weights. `w[:dim]` are feature weights, `w[dim]` is
    the bias. Picklable; ~256 KB at the default dim."""

    w: np.ndarray
    dim: int = DEFAULT_DIM
    bigrams: bool = True
    losses: list[float] = field(default_factory=list)
    n_train: int = 0


def _partial_gradient_fn(bc_w, dim: int):
    """Per-partition partial gradient of the L2-regularized logistic
    loss. Vectorized: one reduceat over the partition's concatenated
    index arrays; empty documents contribute through the bias only."""

    def fn(batches):
        w = bc_w.value
        grad = np.zeros(dim + 1, dtype=np.float64)
        loss = 0.0
        n = 0
        for pdf in batches:
            idx_lists = pdf["__qc_idx"]
            y = pdf["__qc_y"].to_numpy(dtype=np.float64)
            lens = np.fromiter(
                (len(a) for a in idx_lists), dtype=np.int64,
                count=len(idx_lists))
            if len(lens) == 0:
                continue
            scale = 1.0 / np.maximum(lens, 1)
            flat = (np.concatenate([np.asarray(a, dtype=np.int64)
                                    for a in idx_lists])
                    if lens.sum() else np.empty(0, dtype=np.int64))
            # reduceat mis-handles zero-length segments (it reads the
            # NEXT segment's first element): compute on the nonempty
            # mask and scatter back
            offsets = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            nonempty = lens > 0
            z = np.full(len(lens), w[dim], dtype=np.float64)
            if nonempty.any():
                sums = np.add.reduceat(w[flat], offsets[nonempty])
                z[nonempty] += sums * scale[nonempty]
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            # d(loss)/dw_i = sum over docs containing i of r * scale
            contrib = np.repeat(r * scale, lens)
            np.add.at(grad[:dim], flat, contrib)
            grad[dim] += float(r.sum())
            eps = 1e-12
            loss += float(-(y * np.log(p + eps)
                            + (1 - y) * np.log(1 - p + eps)).sum())
            n += len(lens)
        yield pd.DataFrame({
            "g": [grad.tobytes()], "loss": [loss], "n": [n]})

    return fn


def train_quality_classifier(
    spark: SparkSession,
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    bigrams: bool = True,
    iters: int = 25,
    lr: float = 1.0,
    l2: float = 1e-6,
    sample_fraction: float | None = None,
    seed: int = 7,
    train_partitions: int = 8,
) -> QualityClassifier:
    """Batch GD on the full (sampled) training frame: one narrow
    Spark job per iteration, partial gradients per partition, driver
    sums O(#partitions · dim) bytes. Deterministic: w starts at 0 and
    every step is a pure function of the data (the optional sample is
    seeded; coalesce preserves row order within partitions).

    The cached frame coalesces to `train_partitions`: training runs
    on a BOUNDED sample by design (the published recipes fit on
    10^5–10^6 docs and score the full crawl), so per-iteration cost
    is Arrow-worker dispatch × partitions, and fewer, fatter
    partitions amortize it — measured ~4x on the sf0.1 corpus."""
    pos = positive.select(
        F.lit(1.0).alias("__qc_y"),
        ngram_tokens(text_col).alias("__qc_tk")).select(
        "__qc_y",
        hashed_ngram_features_from("__qc_tk", dim, bigrams)
        .alias("__qc_idx"))
    neg = negative.select(
        F.lit(0.0).alias("__qc_y"),
        ngram_tokens(text_col).alias("__qc_tk")).select(
        "__qc_y",
        hashed_ngram_features_from("__qc_tk", dim, bigrams)
        .alias("__qc_idx"))
    train = pos.unionByName(neg)
    if sample_fraction is not None:
        train = train.sample(fraction=sample_fraction, seed=seed)
    if train_partitions:
        train = train.coalesce(train_partitions)
    train = train.persist()
    try:
        schema = "g binary, loss double, n long"
        w = np.zeros(dim + 1, dtype=np.float64)
        losses: list[float] = []
        n_total = 0
        for _ in range(iters):
            bc = spark.sparkContext.broadcast(w)
            try:
                parts = train.mapInPandas(
                    _partial_gradient_fn(bc, dim), schema).collect()
            finally:
                bc.destroy()
            if not parts:
                break
            grad = np.zeros(dim + 1, dtype=np.float64)
            loss = 0.0
            n = 0
            for row in parts:
                grad += np.frombuffer(row.g, dtype=np.float64)
                loss += row.loss
                n += row.n
            if n == 0:
                break
            n_total = n
            losses.append(loss / n)
            w = w - lr * (grad / n + l2 * w)
        return QualityClassifier(
            w=w, dim=dim, bigrams=bigrams, losses=losses, n_train=n_total)
    finally:
        train.unpersist()


def score_quality(
    df: DataFrame,
    clf: QualityClassifier,
    text_col: str = "text",
    out_col: str = "quality_score",
) -> DataFrame:
    """Map-only scoring: broadcast weights, Arrow batches, sigmoid of
    the mean feature weight + bias. The 100 TB path — no shuffle,
    linear in the corpus."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(clf.w)
    dim = clf.dim
    # build a FRESH StructType: StructType.add MUTATES in place and
    # DataFrame.schema is cached, so df.schema.add(...) corrupts the
    # input frame's schema on repeated score_quality calls (latent
    # since r9 — the second call on the same DataFrame object made
    # every column reference ambiguous)
    from pyspark.sql.types import StructType

    out_schema = StructType(
        df.schema.fields + [StructField(out_col, DoubleType())])
    # tokenize in its own projection so the regex split runs once per
    # row (Spark does not CSE across feature sub-expressions — r10)
    src = (df.withColumn("__qc_tk", ngram_tokens(text_col))
           .withColumn("__qc_idx", hashed_ngram_features_from(
               "__qc_tk", dim, clf.bigrams))
           .drop("__qc_tk"))

    def fn(batches):
        w = bc.value
        for pdf in batches:
            idx_lists = pdf.pop("__qc_idx")
            lens = np.fromiter(
                (len(a) for a in idx_lists), dtype=np.int64,
                count=len(idx_lists))
            z = np.full(len(lens), w[dim], dtype=np.float64)
            if len(lens) and lens.sum():
                flat = np.concatenate(
                    [np.asarray(a, dtype=np.int64) for a in idx_lists])
                offsets = np.zeros(len(lens), dtype=np.int64)
                np.cumsum(lens[:-1], out=offsets[1:])
                nonempty = lens > 0
                sums = np.add.reduceat(w[flat], offsets[nonempty])
                z[nonempty] += sums / lens[nonempty]
            pdf[out_col] = 1.0 / (1.0 + np.exp(-z))
            yield pdf

    return src.mapInPandas(fn, out_schema)


def pareto_keep_col(
    score_col: str = "quality_score",
    id_col: str = "doc_id",
    alpha: float = 9.0,
) -> Column:
    """GPT-3's acceptance rule with deterministic noise: keep iff
    `score > 1 - pareto(alpha)`, where the Pareto draw is the
    inverse-CDF transform `(1-u)^(-1/alpha) - 1` of a uniform u
    derived from xxhash64(id) — reproducible across runs and
    engines, unlike np.random. High scores always survive (the
    Pareto tail is unbounded below 1-x only when x small); low
    scores survive with probability ~alpha-tail mass, keeping some
    crawl diversity (the published rationale)."""
    u = (f"(CAST(pmod(xxhash64(CAST({id_col} AS STRING)), "
         f"4503599627370496) AS DOUBLE) / 4503599627370496.0)")
    pareto = f"(power(1.0 - {u}, {-1.0 / alpha}) - 1.0)"
    return F.expr(f"({score_col} > 1.0 - {pareto})")


# -- fixed-weights adjudicable scoring (r9 verdict #6) ----------------

#: Formula-generated fixed model for the ORACLE-ADJUDICATED scoring
#: entry: integer micro-units (1e-6 z per unit), Knuth-hash spread in
#: [-2e6, 2e6] so the per-doc mean lands across the whole sigmoid
#: range. Not trained — the point is adjudicating the SCORING +
#: SELECTION hot path with a bit-replayable model; GD training stays
#: rows-only (engine-specific trajectories).
FIXED_DIM = 512
FIXED_BIAS_I = -250_000  # -0.25 z


def fixed_weights_i(dim: int = FIXED_DIM) -> list[int]:
    """w_int[b] = ((b * 2654435761) mod 4000001) - 2000000 — the same
    literal array is embedded in the DuckDB oracle SQL."""
    return [((b * 2654435761) % 4000001) - 2000000 for b in range(dim)]


def md5_bucket_sql(tok_expr: str, dim: int) -> str:
    """Cross-engine feature bucket: the first 8 md5 hex chars as an
    integer, mod dim. Spark: conv(..., 16, 10); DuckDB mirrors with
    CAST('0x' || substr(md5(t),1,8) AS BIGINT) % dim. (xxhash64 —
    the trained classifiers' hasher — has no DuckDB twin; md5 does.)"""
    return (f"CAST(CAST(conv(substr(md5({tok_expr}), 1, 8), 16, 10) "
            f"AS BIGINT) % {dim} AS INT)")


def fixed_quality_select(
    documents: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = FIXED_DIM,
    alpha: int = 9,
    bias_i: int | None = None,
    weights_i: list[int] | None = None,
) -> "DataFrame":
    """Score + GPT-3-style Pareto selection over the FIXED literal
    model, every step cross-engine exact or floor-quantized — the
    oracle-adjudicable twin of score_quality + pareto_keep_col:

    - md5-bucketed unigram+bigram features (md5_bucket_sql);
    - z = (bias_i*n + Σ w_int[f]) / (n*1e6): integer numerator (an
      exact BIGINT fold on both engines), ONE IEEE division;
    - prob = sigmoid(z); published as prob_q6 = floor(prob*1e6) (the
      registry's accepted transcendental-floor residual risk);
    - uniform u = int(md5(doc_id)[:8], 16) / 2^32 — exact dyadic;
    - keep iff score > 1 - ((1-u)^(-1/alpha) - 1), evaluated WITHOUT
      power(): raising both sides to the alpha-th power gives
      (2 - q)^alpha * (1-u) < 1 with q = prob_q6/1e6, computed as an
      explicit multiplication tree ((x2=x*x, x4=x2*x2, x8=x4*x4,
      x9=x8*x)) — identical IEEE ops on identical inputs in both
      engines, so the DECISION depends only on the already-
      adjudicated prob_q6 and the exact u.

    Output: (doc_id, n_feats, prob_q6, kept). Map-only (broadcast
    literal weights, no shuffle) — the 100 TB scoring shape."""
    if alpha != 9:
        raise ValueError("the multiplication tree is written for alpha=9")
    # default: the formula-generated fixed model; callers may pass a
    # TRAINED integer-unit artifact instead (same scoring plan —
    # operators/quality_artifact.py, r11)
    b0_i = FIXED_BIAS_I if bias_i is None else int(bias_i)
    w = fixed_weights_i(dim) if weights_i is None else list(weights_i)
    if len(w) != dim:
        raise ValueError(f"weights_i must have dim={dim} entries")
    # STEPWISE projections: each stage lands in its own column so the
    # tokenizer / feature arrays are computed ONCE per row. The first
    # draft inlined `toks` textually into uni/big/size/aggregate —
    # Spark does not CSE across those subtrees, so the regex split
    # ran ~10x per row and the entry measured 32s at sf0.1 (r10 bench
    # run 8); this shape measures <1s.
    w_lit = "array(" + ", ".join(str(x) for x in w) + ")"
    df = documents.selectExpr(
        id_col,
        f"filter(split(lower(coalesce({text_col}, '')), "
        f"'[^a-z0-9]+'), __t -> __t != '') AS __tk",
    ).selectExpr(
        id_col,
        f"concat(transform(__tk, __t -> {md5_bucket_sql('__t', dim)}), "
        f"CASE WHEN size(__tk) >= 2 THEN "
        f"transform(sequence(1, size(__tk) - 1), __i -> "
        + md5_bucket_sql(
            "concat(element_at(__tk, __i), chr(32), "
            "element_at(__tk, __i + 1))", dim)
        + ") ELSE CAST(array() AS ARRAY<INT>) END) AS __fs",
    ).selectExpr(
        id_col,
        "size(__fs) AS n_feats",
        f"aggregate(__fs, CAST({b0_i} AS BIGINT) * "
        f"greatest(size(__fs), 1), "
        f"(acc, __f) -> acc + element_at({w_lit}, __f + 1)) AS __zn",
    ).selectExpr(
        id_col, "n_feats",
        "CAST(__zn AS DOUBLE) / (greatest(n_feats, 1) * 1e6) AS __z",
    ).selectExpr(
        id_col, "n_feats",
        "CAST(floor((1.0 / (1.0 + exp(-__z))) * 1e6) AS BIGINT) "
        "AS prob_q6",
    )
    u = (f"CAST(conv(substr(md5(CAST({id_col} AS STRING)), 1, 8), 16, "
         f"10) AS BIGINT) / 4294967296.0")
    q = "(prob_q6 / 1000000.0)"
    x = f"(2.0 - {q})"
    x2 = f"({x} * {x})"
    x4 = f"({x2} * {x2})"
    x8 = f"({x4} * {x4})"
    return df.selectExpr(
        id_col, "n_feats", "prob_q6",
        f"(({x8} * {x}) * (1.0 - {u})) < 1.0 AS kept",
    )
