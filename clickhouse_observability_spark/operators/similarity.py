"""EXT similarity search over `embeddings` (north-star surface).

Approximate-nearest-neighbor over an array<float> column:

- brute-force cosine top-k: the correctness baseline. Query vectors
  broadcast against the corpus; cosine is a JVM-side zip_with/
  aggregate expression (no Python); per-query top-k is a rank filter.
  Linear scan — exact, and at 100 TB exactly as fast as the scan.
- random-hyperplane LSH: signature = sign bits against H fixed
  hyperplanes -> Hamming buckets; candidates = bucket-mates (with
  multiprobe on 1-bit flips), exact cosine re-rank on candidates
  only. Sub-linear candidate sets at scale; recall tested vs brute
  force in pytest.
- IVF-style (label-partitioned) search: uses a precomputed coarse
  partition (the `label` column stands in for a k-means assignment);
  probe the nearest partitions only. Demonstrates the partition-
  pruned layout an ANN index would use at rest.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_observability_spark.session import local_df

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
_NORM = "sqrt(aggregate(transform({v}, x -> x * x), 0D, (acc, x) -> acc + x))"


def _cosine(a: str, b: str):
    dot = F.expr(_DOT.format(a=a, b=b))
    return dot / (F.expr(_NORM.format(v=a)) * F.expr(_NORM.format(v=b)))


def brute_force_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact cosine top-k per query vector (excluding self).

    The query side is a tiny filtered frame -> broadcast; the corpus
    side streams. One window per query_id ranks candidates; Catalyst
    runs the rank filter inside the window sort (no full materialize).
    """
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cs = _cosine("qv", "v")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cs.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
        )
    )


def knn_join_exact(embeddings: DataFrame, k: int = 10) -> DataFrame:
    """EXACT cosine k-NN self-join: top-k neighbors for EVERY vector.

    Documented O(n²) oracle anchor (like dedup_embedding_pairs): the
    cross-engine-provable form of `knn_join_lsh`, which is the
    registered scale path — at 100 TB the banded LSH join is the one
    to run; this exact form adjudicates the k-NN-join SEMANTICS
    (neighbor sets + ranks) against DuckDB's native
    list_cosine_similarity at the test scales.

    Ranking is over cosine ROUNDED to 6dp with a vec_id tie-break, so
    sub-1e-6 float summation differences between engines cannot flip
    a boundary rank — any 6dp tie resolves identically on both sides.
    """
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    cs = F.round(_cosine("qv", "v"), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cs.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_signature_col(v: str, planes: list[list[float]]):
    """Sign-bit signature of vector column `v` against fixed planes,
    packed into a long — pure expressions, evaluated per row JVM-side."""
    sig = F.lit(0).cast("long")
    for i in range(len(planes)):
        dot = F.expr(
            f"aggregate(zip_with({v}, _plane_{i}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        )
        sig = sig + F.when(dot > 0, F.lit(2**i).cast("long")).otherwise(0)
    return sig


def _bucketed_signatures(
    e0: DataFrame, n_planes: int, n_tables: int, dim: int, seed: int
) -> DataFrame:
    """(vec_id, v, tbl, sig) for all tables in ONE pass and ONE
    expression tree: all hyperplanes ship as a single nested-array
    literal, per-table signatures come from a nested aggregate, and
    posexplode replaces the former n_tables-way union. Cuts plan
    analysis from O(tables × planes) literal columns to one."""
    all_planes = [
        p
        for t in range(n_tables)
        for p in _hyperplanes(dim, n_planes, seed + 1000 * t)
    ]
    planes_sql = "array(" + ",".join(
        "array(" + ",".join(repr(x) + "D" for x in p) + ")" for p in all_planes
    ) + ")"
    sigs_sql = (
        f"transform(sequence(0, {n_tables - 1}), t -> "
        f"  aggregate(sequence(0, {n_planes - 1}), 0L, (acc, i) -> acc + "
        f"    IF(aggregate(zip_with(v, element_at({planes_sql}, t * {n_planes} + i + 1),"
        f"                 (x, y) -> x * y), 0D, (a, x) -> a + x) > 0,"
        f"       shiftleft(1L, i), 0L)))"
    )
    return e0.select(
        "vec_id", "v", F.posexplode(F.expr(sigs_sql)).alias("tbl", "sig")
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k: multi-table random-hyperplane LSH + 1-bit multiprobe
    + exact cosine re-rank of candidates only.

    L independent tables (seeded hyperplane sets) sharply boost recall
    on weakly-similar corpora: per-table collision prob p becomes
    1-(1-p)^L across tables. Candidate volume per query ~
    L × (1+planes) × n/2^planes — tunable sub-linear work; the
    re-rank join is a broadcast of the (tiny) probe list against the
    bucketed corpus, one shuffle on the bucket key.
    """
    e0 = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucketed = _bucketed_signatures(e0, n_planes, n_tables, dim, seed)

    probes = [F.col("sig")]
    if multiprobe:
        probes += [
            F.col("sig").bitwiseXOR(F.lit(2**i).cast("long")) for i in range(n_planes)
        ]
    q = (
        bucketed.filter(F.col("vec_id").isin([int(i) for i in query_ids]))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            "tbl",
            F.explode(F.array(*probes)).alias("sig"),
        )
    )
    cs = _cosine("qv", "v")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        bucketed.join(F.broadcast(q), ["tbl", "sig"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
        .select("query_id", "vec_id", cs.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
        )
    )


def embedding_neardup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = False,
) -> DataFrame:
    """Near-dup pairs via LSH bucketing — the scale-primary
    alternative to the brute-force O(n²) pair scan: only bucket-mates
    (any table) are compared; exact cosine filters the candidates, so
    output ⊆ brute force always.

    `multiprobe` extends pairing to buckets within Hamming distance 1
    (one side probes its signature's 1-bit flips): per-table collision
    probability rises from p^planes to p^planes + planes·p^(planes-1)
    ·(1-p) at ~(planes+1)× the candidate volume. For low-threshold
    regimes (weakly similar pairs — this testdata's 0.45 threshold
    sits at the corpus's max cosine) pair it with fewer planes and
    more tables; SCALING.md has the parameter rule."""
    e0 = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucketed = _bucketed_signatures(e0, n_planes, n_tables, dim, seed)
    a = bucketed
    if multiprobe:
        flips = [F.col("sig")] + [
            F.col("sig").bitwiseXOR(F.lit(2**i).cast("long"))
            for i in range(n_planes)
        ]
        a = bucketed.select(
            "vec_id", "v", "tbl", F.explode(F.array(*flips)).alias("sig")
        )
    a, b = a.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    cs = _cosine("va", "vb")
    return (
        cand.select("vec_a", "vec_b", F.round(cs, 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_centroids(
    embeddings: DataFrame,
    dim: int = 64,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """(label, cv) centroid per coarse partition — the INDEX-BUILD
    step, run once and persisted alongside the assignments (at rest:
    a tiny sidecar table next to the label-partitioned vectors).

    Element-wise mean as `dim` avg aggregates over the unexploded
    array column: partial aggregation collapses each task to one row
    of `dim` doubles per label BEFORE the shuffle — no posexplode row
    amplification, no per-query corpus pass once the result is saved.
    """
    if assignments is not None:
        embeddings = embeddings.drop("label").join(assignments, "vec_id")
    e = embeddings.select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return e.groupBy("label").agg(
        F.array(*[F.avg(F.col("v")[i]) for i in range(dim)]).alias("cv")
    )


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """(vec_id, scale, qv: array<smallint in [-127,127]>) — symmetric
    per-vector int8 quantization, the at-rest format for ANN at scale:
    4× smaller vectors means 4× more corpus per scan (and per
    executor-memory byte); search runs on the quantized corpus and
    re-scores survivors against full-precision vectors.

    scale = max|v|/127; q_i = round(v_i/scale). Pure expressions (one
    aggregate + one transform per row, no shuffle, no Python)."""
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    max_abs = F.expr("aggregate(v, 0D, (acc, x) -> greatest(acc, abs(x)))")
    scale = F.when(max_abs > 0, max_abs / 127.0).otherwise(F.lit(1.0))
    return e.select(
        "vec_id",
        scale.alias("scale"),
        F.expr(
            "transform(v, x -> cast(round(x / scale) AS smallint))"
        ).alias("qv"),
    ).select("vec_id", "scale", "qv")


def dequantize_embeddings(quantized: DataFrame) -> DataFrame:
    """(vec_id, v) back from the int8 form — lossy by design; cosine
    error is bounded by the per-component rounding (pytest bounds
    recall of quantized search against exact)."""
    return quantized.select(
        "vec_id",
        F.expr("transform(qv, q -> q * scale)").alias("v"),
    )


def brute_force_topk_quantized(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact-scan top-k over the QUANTIZED corpus with full-precision
    queries — the memory-bound configuration at 100 TB (int8 corpus
    streams, float queries broadcast). Note cosine is scale-invariant
    per vector, so the per-vector scale cancels for ranking; it still
    ships for dot-product/rescore use."""
    qz = dequantize_embeddings(quantize_embeddings(embeddings))
    q = (
        embeddings.filter(F.col("vec_id").isin([int(i) for i in query_ids]))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    cs = _cosine("qv", "v")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        qz.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cs.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
        )
    )


def build_kmeans_ivf(
    embeddings: DataFrame, n_clusters: int = 10, seed: int = 42
) -> DataFrame:
    """IVF index build: k-means coarse quantizer over the embedding
    column (pyspark.ml, fixed seed -> deterministic). Returns
    (vec_id, label) assignments in the same shape as the testdata's
    precomputed `label`, so `ivf_topk` consumes either.

    At rest the assignments become the partition column of the
    vector table: `df.write.partitionBy("label")` gives the
    directory-pruned ANN layout; rebuilds are periodic batch jobs.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(feats)
    return (
        model.transform(feats)
        .select("vec_id", F.col("prediction").cast("int").alias("label"))
    )


def kmeans_ivf_index(
    embeddings: DataFrame, n_clusters: int = 10, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Full IVF index build: (assignments, centroids). The centroids
    come straight from the fitted model's cluster centers — zero extra
    corpus passes — so queries probe a 10-row literal frame instead of
    recomputing means per call."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = embeddings.sparkSession
    feats = embeddings.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(feats)
    assignments = model.transform(feats).select(
        "vec_id", F.col("prediction").cast("int").alias("label")
    )
    centroids = local_df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "label int, cv array<double>",
    )
    return assignments, centroids


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 3,
    assignments: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style search over a coarse partition column (`label` here;
    a k-means assignment in a real index). The query probes its
    n_probe nearest centroids, and exact search runs only inside
    those partitions — the partition-pruning story for ANN at rest.

    `centroids` (label, cv) is the persisted index-build artifact
    (ivf_centroids / kmeans_ivf_index); pass it so queries touch only
    the probed partitions. When omitted, centroids are derived on the
    fly — one extra aggregate pass over the corpus, acceptable for
    ad-hoc exploration, wrong as a steady-state query path."""
    if assignments is not None:
        embeddings = embeddings.drop("label").join(assignments, "vec_id")
    e = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = centroids if centroids is not None else ivf_centroids(embeddings)
    q = e.filter(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    qc = q.join(F.broadcast(cent), F.lit(True)).select(
        "query_id", "qv", "label", _cosine("qv", "cv").alias("ccos")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc())
    probed = (
        qc.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "qv", "label")
    )
    cs = _cosine("qv", "v")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        e.join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cs.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ)
# ---------------------------------------------------------------------------

def pq_index(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 64,
    dim: int = 64,
    seed: int = 42,
) -> tuple[DataFrame, list[list[list[float]]]]:
    """PQ index build: (codes, codebooks).

    Vectors are L2-normalized, split into `m` subvectors of dim/m;
    each subspace gets its own `n_codes`-centroid k-means codebook
    (pyspark.ml, seeded -> deterministic). A vector compresses to m
    one-byte codes — 64 float64s (512 B) become 8 B, the 64× at-rest
    shrink that lets a 100 TB corpus fit a scan budget; search never
    touches the original vectors (asymmetric distance: full-precision
    query vs codes).

    codes: (vec_id, codes array<int> of length m). codebooks: python
    list [m][n_codes][dim/m] — index metadata (m·n_codes·dim floats
    total), shipped to queries as literals, NOT a DataFrame join.

    Index build is m independent k-means fits over one cached
    projection — a periodic batch job, like the IVF layout.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sub = dim // m
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).select(
        "vec_id",
        F.expr("transform(v, x -> x / " + _NORM.format(v="v") + ")").alias("nv"),
    )
    feats = e.select(
        "vec_id",
        *[
            array_to_vector(F.slice("nv", j * sub + 1, sub)).alias(f"s{j}")
            for j in range(m)
        ],
    ).persist()
    codebooks: list[list[list[float]]] = []
    coded = feats
    for j in range(m):
        model = KMeans(
            k=n_codes, seed=seed + j, featuresCol=f"s{j}", predictionCol=f"c{j}"
        ).fit(feats)
        codebooks.append([[float(x) for x in c] for c in model.clusterCenters()])
        coded = model.transform(coded)
    # persist the SMALL artifact (n x m ints) and release the big
    # normalized-subvector projection — otherwise the whole corpus
    # stays in storage memory for the session after the build.
    codes = coded.select(
        "vec_id",
        F.array(*[F.col(f"c{j}").cast("int") for j in range(m)]).alias("codes"),
    ).persist()
    codes.count()
    feats.unpersist()
    return codes, codebooks


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    codes: DataFrame | None = None,
    codebooks: list[list[list[float]]] | None = None,
    m: int = 8,
    n_codes: int = 64,
    dim: int = 64,
    seed: int = 42,
    rerank: int = 0,
) -> DataFrame:
    """ANN top-k by asymmetric PQ distance: the full-precision query
    builds an m×n_codes lookup table of subspace dot products against
    the codebooks (tiny, driver-side, embedded as a literal), and each
    corpus vector scores as m array lookups summed — no vector math
    per row, no shuffle of the corpus beyond the top-k.

    approx_cosine(q, x) = Σ_j dot(q_j, codebook[j][codes_j]) — exact
    cosine of the query against x's quantized reconstruction (both
    sides normalized at index time). With `rerank` > 0, the top
    `rerank` candidates per query re-score against the original
    vectors (the standard PQ + re-rank configuration).
    """
    if codes is None or codebooks is None:
        codes, codebooks = pq_index(embeddings, m, n_codes, dim, seed)
    q = embeddings.filter(
        F.col("vec_id").isin([int(i) for i in query_ids])
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("qv"))
    sub = dim // m
    rows = []
    for r in q.collect():
        v = r.qv
        nrm = sum(x * x for x in v) ** 0.5 or 1.0
        nq = [x / nrm for x in v]
        table = [
            sum(nq[j * sub + i] * codebooks[j][c][i] for i in range(sub))
            for j in range(m)
            for c in range(n_codes)
        ]
        rows.append((int(r.vec_id), table))
    spark = embeddings.sparkSession
    tables = spark.createDataFrame(rows, "query_id bigint, tbl array<double>")

    score = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0D, "
        f"(acc, j) -> acc + tbl[j * {n_codes} + codes[j]])"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("vec_id").asc()
    )
    scored = (
        codes.join(F.broadcast(tables), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", score.alias("approx_cosine"))
        .withColumn("rank", F.row_number().over(w))
    )
    if not rerank:
        return scored.filter(F.col("rank") <= k).select(
            "query_id", "rank", "vec_id",
            F.round(F.col("approx_cosine"), 6).alias("approx_cosine"),
        )
    cand = scored.filter(F.col("rank") <= max(rerank, k)).select(
        "query_id", "vec_id"
    )
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    qe = q.select(F.col("vec_id").alias("query_id"), "qv")
    cs = _cosine("qv", "v")
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.join(e, "vec_id")
        .join(F.broadcast(qe), "query_id")
        .select("query_id", "vec_id", cs.alias("cosine"))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round(F.col("cosine"), 6).alias("cosine"))
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 50,
    codes: DataFrame | None = None,
    codebooks: list[list[list[float]]] | None = None,
    centroids: DataFrame | None = None,
    m: int = 8,
    n_codes: int = 64,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """IVF × PQ — the full billion-vector layout: the query probes its
    n_probe nearest coarse partitions (directory pruning at rest),
    asymmetric PQ distance scans ONLY the probed partitions' 8-byte
    codes, and exact cosine re-ranks the top `rerank` survivors
    against original vectors. Cost per query =
    n_probe/n_partitions × corpus codes scanned + rerank vector reads
    — both dials independent of corpus size growth in the other
    partitions.

    `codes` rides with the partition label (index-time join); both
    index artifacts (codes, codebooks, centroids) are built once and
    persisted, exactly like the standalone IVF and PQ paths.
    """
    e = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    if codes is None or codebooks is None:
        codes, codebooks = pq_index(embeddings, m, n_codes, dim, seed)
    cent = centroids if centroids is not None else ivf_centroids(embeddings)
    labeled_codes = codes.join(e.select("vec_id", "label"), "vec_id")

    q = e.filter(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    qc = q.join(F.broadcast(cent), F.lit(True)).select(
        "query_id", "qv", "label", _cosine("qv", "cv").alias("ccos")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc())
    probed = (
        qc.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "label")
    )

    # per-query PQ lookup tables (tiny, driver-built literals)
    sub = dim // m
    rows = []
    for r in q.collect():
        v = r.qv
        nrm = sum(x * x for x in v) ** 0.5 or 1.0
        nq = [x / nrm for x in v]
        table = [
            sum(nq[j * sub + i] * codebooks[j][c][i] for i in range(sub))
            for j in range(m)
            for c in range(n_codes)
        ]
        rows.append((int(r.query_id), table))
    tables = embeddings.sparkSession.createDataFrame(
        rows, "query_id bigint, tbl array<double>"
    )
    score = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0D, "
        f"(acc, j) -> acc + tbl[j * {n_codes} + codes[j]])"
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("vec_id").asc()
    )
    cand = (
        labeled_codes.join(F.broadcast(probed), "label")
        .join(F.broadcast(tables), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", score.alias("approx_cosine"))
        .withColumn("r", F.row_number().over(wa))
        .filter(F.col("r") <= max(rerank, k))
        .select("query_id", "vec_id")
    )
    cs = _cosine("qv", "v")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.join(e.select("vec_id", "v"), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "vec_id", cs.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
        )
    )


def embedding_audit(embeddings: DataFrame, dim: int = 64) -> DataFrame:
    """One-row corpus health report for the vector table — the gate a
    pipeline runs before (re)building ANN indexes: row/dim counts,
    NaN/null/zero-norm vectors, norm distribution. One map-side
    aggregation, no shuffle beyond the single-row combine.

    Oracle-adjudicable (r10): each row's norm quantizes to integer
    1e-6 units (the per-row sqrt/sum float is absorbed by the
    quantization like every 6dp cosine entry), so min/max are exact
    integer selections, the mean is a floor-quantized ratio of an
    exact integer sum, and summation order can never move a
    reported digit."""
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.expr(
        "aggregate(transform(cast(embedding as array<double>), x -> x * x), "
        "0D, (acc, x) -> acc + x)"
    ))
    has_nan = F.exists(v, lambda x: F.isnan(x))
    nrm_i = F.when(
        v.isNotNull() & ~has_nan & (F.size(v) == dim),
        F.round(norm * F.lit(1e6)).cast("bigint"),
    )  # defective rows are counted, not folded into the norm stats
    return embeddings.select(
        v.alias("v"), has_nan.alias("bad"), nrm_i.alias("nrm_i"),
    ).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.count_if(F.col("v").isNull()).alias("n_null"),
        F.count_if(F.col("v").isNotNull() & (F.size("v") != dim)).alias(
            "n_wrong_dim"
        ),
        F.count_if(F.col("bad")).alias("n_nan"),
        F.count_if(F.col("nrm_i") == 0).alias("n_zero_norm"),
        (F.min("nrm_i") / F.lit(1000000.0)).alias("min_norm"),
        (F.floor(F.sum("nrm_i").cast("double") / F.lit(1000000.0)
                 / F.count("nrm_i") * F.lit(1e6)) / F.lit(1e6))
        .alias("avg_norm"),
        (F.max("nrm_i") / F.lit(1000000.0)).alias("max_norm"),
    )


def knn_join_lsh(
    embeddings: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
    max_bucket_frac: float | None = None,
) -> DataFrame:
    """Batch k-NN self-join: for EVERY vector, its approximate top-k
    neighbors — the all-vectors generalization of the per-query ANN
    (lsh_topk) and the ranked cousin of the thresholded near-dup pair
    scan. Feeds diversity sampling, cluster seeding, graph-based
    curation.

    Candidates are LSH bucket-mates (any of n_tables tables, optional
    1-bit multiprobe on the LEFT side so each direction of a pair can
    recover it), scored with exact cosine, ranked per source vector.
    Never all-pairs: candidate volume is the bucket collision volume,
    sub-quadratic at scale for spread-out corpora. A DEGENERATE corpus
    (near-identical vectors) collapses into mega-buckets and the join
    trends quadratic — `max_bucket_frac` is the guard: buckets holding
    more than that fraction of the corpus are dropped before the join
    (a mega-bucket carries no ranking signal, same spirit as the
    jaccard/contamination df-caps; prefer MORE PLANES to refine real
    corpora — the cap is the hostile-input bound, off by default
    because top-k needs candidates). Output columns (query_id, rank,
    vec_id, cosine) match brute_force_topk so recall is directly
    measurable (pytest)."""
    e0 = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucketed = _bucketed_signatures(e0, n_planes, n_tables, dim, seed)
    if max_bucket_frac is not None:
        # corpus size derived INSIDE the bucket-size aggregation
        # (sum of bucket counts / n_tables — every vector sits in
        # exactly one bucket per table), not via a separate count()
        # action: the cap must not cost an extra corpus pass per call.
        sizes = bucketed.groupBy("tbl", "sig").agg(
            F.count(F.lit(1)).alias("bn")
        )
        totals = sizes.agg(
            (F.sum("bn") / n_tables).alias("n_vec")
        )
        cap = F.greatest(
            F.lit(k + 1),
            F.floor(F.col("n_vec") * max_bucket_frac),
        ).cast("long")
        small = (
            sizes.crossJoin(F.broadcast(totals))
            .filter(F.col("bn") <= cap)
            .select("tbl", "sig")
        )
        bucketed = bucketed.join(small, ["tbl", "sig"], "left_semi")
    a = bucketed
    if multiprobe:
        flips = [F.col("sig")] + [
            F.col("sig").bitwiseXOR(F.lit(2**i).cast("long"))
            for i in range(n_planes)
        ]
        a = bucketed.select(
            "vec_id", "v", "tbl", F.explode(F.array(*flips)).alias("sig")
        )
    a, b = a.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("vec_id"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.select("query_id", "vec_id", _cosine("va", "vb").alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round(F.col("cosine"), 6).alias("cosine"))
    )


def semdedup_pairs(
    embeddings: DataFrame,
    assignments: DataFrame,
    threshold: float = 0.45,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs via
    CLUSTER-SCOPED exact cosine — partition the embedding space with a
    k-means coarse quantizer (the at-rest IVF assignments double as
    the SemDeDup partition), then compare pairs only WITHIN each
    cluster. The published trade-off: pairwise cost drops from O(n²)
    to Σ|cluster|², and pairs straddling a cluster boundary are
    missed (the paper accepts this; `embedding_neardup_lsh` is the
    complementary boundary-free path).

    Shape at scale: one co-partitioned self-join — both sides shuffle
    ONCE on the cluster label, each cluster's pairs are generated
    locally, nothing is broadcast. With k clusters sized n/k the work
    is n²/k, the paper's knob: scale k with the corpus.

    Output: (vec_a, vec_b, cosine) with vec_a < vec_b.
    """
    e = (
        embeddings.drop("label")
        .join(assignments, "vec_id")
        .select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
        )
    )
    a = e.select(
        F.col("label").alias("la"),
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
    )
    b = e.select(
        F.col("label").alias("lb"),
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
    )
    cs = _cosine("va", "vb")
    return (
        a.join(
            b,
            (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", cs.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


def binary_index(
    embeddings: DataFrame, dim: int = 64
) -> tuple[list[float], DataFrame]:
    """Binary (1-bit) quantization index build: (means, codes) — the
    Lucene/Elasticsearch-style BQ layout. Each dimension keeps one
    sign bit relative to the corpus per-dimension mean, packed into
    ``ceil(dim/64)`` bigints — 64 float64 dims (512 B) become 8 B,
    the same 64× at-rest shrink as PQ with a far cheaper build (one
    avg aggregate, no k-means) and a distance that is pure popcount.

    means: python list of `dim` doubles — index METADATA (one row),
    embedded in build/query expressions as literals. codes:
    (vec_id, bq array<bigint>) — corpus-sized, written to an at-rest
    sidecar by callers, never through the driver.

    Bit i of word w is set iff v[w*64+i] > mean[w*64+i]; packing is a
    JVM-side fold (bitwise OR of shifted bits — OR, not +, so the
    sign bit 63 needs no overflow carve-out under ANSI mode).
    """
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # Per-dimension means via Arrow-batched per-partition subtotals
    # (numpy column sum), reduced over #partitions rows driver-side —
    # the bounded-collect packing-subtotals pattern. One pass, same
    # as a hash aggregate at any scale, but WITHOUT generating and
    # janino-compiling `dim` separate avg(v[i]) aggregate expressions:
    # that compile cost dominated the whole index build (~3s of a
    # ~3.7s build at sf0.1, measured r5) and grows with dim.
    import numpy as np
    import pandas as pd

    def _part_sums(batches):
        tot, n = None, 0
        for pdf in batches:
            a = np.vstack(pdf["v"].to_numpy())
            n += a.shape[0]
            s = a.sum(axis=0)
            tot = s if tot is None else tot + s
        if n:
            yield pd.DataFrame({"s": [tot.tolist()], "n": [n]})

    parts = e.select("v").mapInPandas(
        _part_sums, "s array<double>, n long"
    ).collect()  # bounded: one row per non-empty partition
    if not parts:
        raise ValueError("binary_index: empty embeddings corpus")
    tot = np.zeros(dim)
    n = 0
    for r in parts:
        tot += np.array(r.s)
        n += r.n
    means = [float(x) for x in (tot / n)]
    codes = binary_codes(embeddings, means, dim=dim)
    return means, codes


def binary_codes(
    embeddings: DataFrame, means: list[float], dim: int = 64
) -> DataFrame:
    """(vec_id, bq array<bigint>) packed sign-bit codes against the
    given per-dimension means (index metadata, shipped as a literal —
    no join)."""
    nwords = (dim + 63) // 64
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("bqm", F.array(*[F.lit(float(x)) for x in means]))
    pack = F.expr(
        f"transform(sequence(0, {nwords - 1}), w -> "
        f"aggregate(sequence(0, 63), 0L, (acc, i) -> "
        f"CASE WHEN w * 64 + i < {dim} AND v[w * 64 + i] > bqm[w * 64 + i] "
        f"THEN acc | shiftleft(1L, i) ELSE acc END))"
    )
    return e.select("vec_id", pack.alias("bq"))


def _pack_bits_py(v: list[float], means: list[float], dim: int) -> list[int]:
    """Driver-side packing for QUERY vectors (bounded: len(query_ids)
    rows) — bit-identical to `binary_codes`, including the signed
    64-bit wrap of bit 63."""
    words = []
    for w in range((dim + 63) // 64):
        acc = 0
        for i in range(64):
            j = w * 64 + i
            if j < dim and v[j] > means[j]:
                acc |= 1 << i
        if acc >= 1 << 63:
            acc -= 1 << 64
        words.append(acc)
    return words


def binary_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    codes: DataFrame | None = None,
    means: list[float] | None = None,
    dim: int = 64,
    rerank: int = 50,
) -> DataFrame:
    """ANN top-k via binary-quantized hamming pre-rank + exact cosine
    re-rank. The corpus side is the 8-byte-per-vector codes frame —
    score = Σ_w bit_count(bq[w] XOR query_code[w]), one popcount per
    word inside whole-stage codegen, no vector math per row — and only
    the top `rerank` hamming candidates per query touch the
    full-precision vectors. With ``rerank`` ≥ corpus size the result
    degenerates to exact brute-force top-k (the oracle-adjudicated
    proof arm), independent of code quality.

    Hamming ties at the candidate cut break by vec_id ASC — stable,
    but which true neighbors survive the cut is the approximation;
    recall vs brute force is pytest-bounded on the testdata corpus.
    """
    if codes is None or means is None:
        means, codes = binary_index(embeddings, dim=dim)
    nwords = (dim + 63) // 64
    q = embeddings.filter(
        F.col("vec_id").isin([int(i) for i in query_ids])
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("qv"))
    rows = [
        (int(r.vec_id), _pack_bits_py(list(r.qv), means, dim))
        for r in q.collect()
    ]
    spark = embeddings.sparkSession
    qcodes = spark.createDataFrame(rows, "query_id bigint, qc array<bigint>")

    ham = F.expr(
        f"aggregate(sequence(0, {nwords - 1}), 0, "
        f"(acc, w) -> acc + bit_count(bq[w] ^ qc[w]))"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("vec_id").asc()
    )
    cand = (
        codes.join(F.broadcast(qcodes), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", ham.alias("hamming"))
        .withColumn("hrank", F.row_number().over(w))
        .filter(F.col("hrank") <= max(rerank, k))
        .select("query_id", "vec_id")
    )
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qe = q.select(F.col("vec_id").alias("query_id"), "qv")
    cs = _cosine("qv", "v")
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.join(e, "vec_id")
        .join(F.broadcast(qe), "query_id")
        .select("query_id", "vec_id", cs.alias("cosine"))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "vec_id",
            F.round(F.col("cosine"), 6).alias("cosine"),
        )
    )


def cross_neardup_exact(
    left: DataFrame, right: DataFrame, threshold: float = 0.45
) -> DataFrame:
    """Exact two-table semantic near-dup scan — every (left, right)
    pair with cosine >= threshold; the semantic-decontamination
    ground truth (benchmark side `left`, training corpus `right`).
    `left` is expected to be the small side (a benchmark suite) and
    broadcasts: the corpus streams once, no shuffle. Output:
    (left_id, right_id, cosine). O(|left|·|right|) comparisons — the
    small-sf oracle anchor; `cross_neardup_lsh` is the scale path."""
    a = left.select(
        F.col("vec_id").alias("left_id"),
        F.col("embedding").cast("array<double>").alias("va"),
    )
    b = right.select(
        F.col("vec_id").alias("right_id"),
        F.col("embedding").cast("array<double>").alias("vb"),
    )
    cs = F.round(_cosine("va", "vb"), 4)
    return (
        b.join(F.broadcast(a), F.lit(True))
        .select("left_id", "right_id", cs.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cross_neardup_lsh(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Two-table semantic near-dup via shared-plane LSH buckets — the
    scale path for semantic decontamination: both tables hash against
    the SAME hyperplanes, only (tbl, sig) bucket-mates compare, exact
    cosine confirms (output ⊆ cross_neardup_exact always). Multiprobe
    fans the LEFT (benchmark, small) side to its 1-bit flips, so the
    candidate blow-up lands on the side that is tiny by construction.
    Same parameter regime as embedding_neardup_lsh (low-threshold:
    few planes × many tables; SCALING.md)."""
    a0 = left.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    b0 = right.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ab = _bucketed_signatures(a0, n_planes, n_tables, dim, seed)
    bb = _bucketed_signatures(b0, n_planes, n_tables, dim, seed)
    if multiprobe:
        flips = [F.col("sig")] + [
            F.col("sig").bitwiseXOR(F.lit(2**i).cast("long"))
            for i in range(n_planes)
        ]
        ab = ab.select(
            "vec_id", "v", "tbl", F.explode(F.array(*flips)).alias("sig")
        )
    a, b = ab.alias("a"), bb.alias("b")
    cand = (
        b.join(
            F.broadcast(a),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig")),
        )
        .select(
            F.col("a.vec_id").alias("left_id"),
            F.col("b.vec_id").alias("right_id"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["left_id", "right_id"])
    )
    cs = F.round(_cosine("va", "vb"), 4)
    return cand.select("left_id", "right_id", cs.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def mmr_rerank(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_candidates: int = 50,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-marginal-relevance re-rank: per query, greedily pick k
    results maximizing λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s) —
    relevance tempered by redundancy, the diversification step a RAG
    serving path runs after top-k (near-duplicate passages waste the
    context budget).

    Greedy MMR is inherently sequential IN k, so it cannot be a join/
    window composition — this is the legitimate applyInPandas case:
    the exact top-`n_candidates` per query (a DataFrame stage) group
    by query_id into Arrow batches of n_candidates rows, and the
    per-group numpy loop is O(k·n_candidates) on a ~50-row matrix.
    Work scales with |queries|·n_candidates, never corpus size.

    Cross-engine-deterministic greedy (r9 verdict #4): relevance and
    pairwise similarities quantize to integer 1e-6 cosine units, and
    λ enters as the rational 7/10, so every selection compares the
    exact integer 10·s = 7·rel_i − 3·red_i (ties toward the lower
    vec_id) — bit-replayable by the DuckDB oracle's unrolled greedy
    (requires lam = 0.7; other λ keep the same integer scheme via
    round(10λ)). The only float ops left are the cosine dots
    themselves, absorbed by the 1e-6 quantization like every other
    sim_* oracle entry.

    Output: (query_id, mmr_rank, vec_id, cosine, mmr_score) with
    cosine = rel_i/1e6 and mmr_score = (7·rel_i − 3·red_i)/1e7 —
    single IEEE divisions of identical integers on both engines.
    """
    import pandas as pd

    lam_i = int(round(lam * 10))
    if abs(lam * 10 - lam_i) > 1e-12:
        raise ValueError("mmr_rerank quantizes lambda to tenths")

    cand = brute_force_topk(embeddings, query_ids, k=n_candidates)
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    with_vec = cand.join(e, "vec_id")

    schema = (
        "query_id long, mmr_rank int, vec_id long, "
        "cosine double, mmr_score double"
    )

    def _mmr(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(["rank"]).reset_index(drop=True)
        V = np.array([list(x) for x in pdf["v"]], dtype=np.float64)
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        # brute_force_topk ships cosine already rounded to 6dp; the
        # micro-unit int is exact
        rel_i = np.rint(pdf["cosine"].to_numpy() * 1e6).astype(np.int64)
        ids = pdf["vec_id"].to_numpy()
        n = len(pdf)
        selected: list[int] = []
        scores_i: list[int] = []
        remaining = list(range(n))
        int_min = np.iinfo(np.int64).min
        sim_to_sel_i = np.full(n, int_min, dtype=np.int64)
        for _ in range(min(k, n)):
            best_i, best_s = None, None
            for i in remaining:
                red = 0 if not selected else int(sim_to_sel_i[i])
                s = lam_i * int(rel_i[i]) - (10 - lam_i) * red
                if (
                    best_s is None
                    or s > best_s
                    or (s == best_s and ids[i] < ids[best_i])
                ):
                    best_i, best_s = i, s
            selected.append(best_i)
            scores_i.append(best_s)
            remaining.remove(best_i)
            # running max over selected, in the same integer units
            sims_i = np.rint((V @ V[best_i]) * 1e6).astype(np.int64)
            sim_to_sel_i = np.maximum(sim_to_sel_i, sims_i)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "mmr_rank": np.arange(1, len(selected) + 1, dtype="int32"),
                "vec_id": ids[selected],
                "cosine": rel_i[selected] / 1e6,
                "mmr_score": np.array(scores_i, dtype=np.float64) / 1e7,
            }
        )

    return with_vec.groupBy("query_id").applyInPandas(_mmr, schema)
