"""Skew-mitigation joins (SURVEY.md §4 scale notes).

When one join key dominates (one service produces 90% of logs), a
hash-partitioned join puts 90% of the work in one task. Two remedies:

- AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  on in the engine session) — runtime, zero code.
- Explicit salting for the cases AQE can't split (e.g. skewed
  aggregations, or joins whose skewed side must stay streaming):
  the big side scatters each key over `salt` sub-keys, the small
  side replicates `salt`×, the join runs on (key, salt). Results are
  identical to the plain join; parallelism on the hot key improves
  `salt`-fold.

Salt assignment is DETERMINISTIC (hash of a caller-named unique
column, not rand()) so task retries and speculative execution cannot
produce duplicate or lost rows — rand()-salting is wrong under
retries, a real at-scale correctness trap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_by: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on column `on`, salted n_salts ways.

    `salt_by`: a column of `big` whose hash spreads rows uniformly
    (a row id or high-cardinality attribute). `small` is replicated
    n_salts times — keep it small (it usually broadcasts anyway; use
    salting when the small side is too big to broadcast but far
    smaller than the big side).
    """
    b = big.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_by)), F.lit(n_salts)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, [on, "_salt"], how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame, key: str, salt_by: str, agg_exprs: list, n_salts: int = 8
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial-aggregate on
    (key, salt), then final-aggregate on key. Only decomposable
    aggregates (sum/count/min/max) are valid here — the caller passes
    the PARTIAL exprs and the matching FINAL exprs are derived by
    re-applying sum/min/max over the partials.

    (Spark's hash aggregate already does map-side partials; explicit
    salting matters when upstream partitioning concentrates one key
    in few partitions, e.g. after a key-partitioned shuffle.)
    """
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_by)), F.lit(n_salts)))
        .groupBy(key, "_salt")
        .agg(*agg_exprs)
    )
    finals = []
    for c in partial.columns:
        if c in (key, "_salt"):
            continue
        if c.startswith("min_"):
            finals.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            finals.append(F.max(c).alias(c))
        else:  # sums and counts both combine by summation
            finals.append(F.sum(c).alias(c))
    return partial.groupBy(key).agg(*finals)
