"""Similarity-search operator tests (EXT north-star)."""

from __future__ import annotations

import numpy as np
import pytest

from clickhouse_observability_spark.operators import similarity as S
from clickhouse_observability_spark.sources.parquet import load_table

QIDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return load_table(spark, sf_small, "embeddings")


@pytest.fixture(scope="module")
def bf_sets(emb):
    out = {}
    for r in S.brute_force_topk(emb, QIDS, k=10).collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_brute_force_matches_numpy(emb):
    rows = emb.orderBy("vec_id").collect()
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    got = S.brute_force_topk(emb, [0], k=5).orderBy("rank").collect()
    sims = Vn @ Vn[ids == 0][0]
    order = [
        int(ids[i]) for i in np.lexsort((ids, -sims)) if ids[i] != 0
    ][:5]
    assert [r.vec_id for r in got] == order
    # cosine values match numpy to 1e-6
    for r in got:
        i = int(np.where(ids == r.vec_id)[0][0])
        assert abs(r.cosine - sims[i]) < 1e-6


def test_brute_force_shapes(emb):
    out = S.brute_force_topk(emb, QIDS, k=10)
    rows = out.collect()
    assert len(rows) == 50
    assert out.columns == ["query_id", "rank", "vec_id", "cosine"]
    for q in QIDS:
        ranks = sorted(r.rank for r in rows if r.query_id == q)
        assert ranks == list(range(1, 11))


def test_lsh_recall(emb, bf_sets):
    got = {}
    for r in S.lsh_topk(emb, QIDS, k=10).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(bf_sets[q] & got.get(q, set())) for q in QIDS)
    recall = hits / sum(len(v) for v in bf_sets.values())
    assert recall >= 0.7, f"multi-table LSH recall {recall}"


def test_ivf_recall_and_pruning(emb, bf_sets):
    got = {}
    for r in S.ivf_topk(emb, QIDS, k=10, n_probe=4).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(bf_sets[q] & got.get(q, set())) for q in QIDS)
    recall = hits / sum(len(v) for v in bf_sets.values())
    assert recall >= 0.4, f"IVF recall {recall} (probes 4/10 partitions)"


def test_lsh_neardup_recall(emb):
    from clickhouse_observability_spark.operators.dedup import (
        embedding_neardup_pairs,
    )

    exact = {(r.vec_a, r.vec_b) for r in
             embedding_neardup_pairs(emb, threshold=0.45).collect()}
    lsh = {(r.vec_a, r.vec_b) for r in
           S.embedding_neardup_lsh(emb, threshold=0.45).collect()}
    assert lsh <= exact  # exact re-rank: no false positives
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.5, f"LSH near-dup recall {recall}"


def test_lsh_neardup_tuned_contains_bruteforce(emb):
    # The scale-primary configuration (registry sim_neardup_lsh):
    # 4 planes x 16 tables + 1-bit multiprobe. On the testdata corpus
    # it must reproduce the brute-force pair set EXACTLY — containment
    # both ways — which is what lets brute force be demoted to a
    # small-sf oracle anchor (VERDICT r1 item 3).
    from clickhouse_observability_spark.operators.dedup import (
        embedding_neardup_pairs,
    )

    exact = {(r.vec_a, r.vec_b) for r in
             embedding_neardup_pairs(emb, threshold=0.45).collect()}
    lsh = {(r.vec_a, r.vec_b) for r in
           S.embedding_neardup_lsh(
               emb, threshold=0.45, n_planes=4, n_tables=16, multiprobe=True
           ).collect()}
    assert exact, "fixture should contain near-dup pairs"
    assert lsh == exact


def test_ivf_with_persisted_centroids_no_corpus_reaggregation(emb):
    # Index-build artifact in, no posexplode/aggregate-over-corpus in
    # the query plan: the physical plan must contain no Generate node
    # (VERDICT r1 item 4).
    spark = emb.sparkSession
    cent = spark.createDataFrame(
        [(int(r.label), list(r.cv)) for r in S.ivf_centroids(emb).collect()],
        "label bigint, cv array<double>",
    )
    df = S.ivf_topk(emb, QIDS, k=10, n_probe=10, centroids=cent)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
    # and with n_probe = all partitions it stays the exact search
    got = {}
    for r in df.collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    bf = {}
    for r in S.brute_force_topk(emb, QIDS, k=10).collect():
        bf.setdefault(r.query_id, set()).add(r.vec_id)
    assert got == bf


def test_quantized_topk_recall(emb, bf_sets):
    import numpy as np

    # int8 round-trip error bound: |x - q*scale| <= scale/2 per component
    qz = S.quantize_embeddings(emb)
    rows = {r.vec_id: (r.scale, r.qv) for r in qz.collect()}
    orig = {r.vec_id: r.embedding for r in emb.collect()}
    for vid, (scale, qv) in rows.items():
        v = np.array(orig[vid], dtype=np.float64)
        back = np.array(qv, dtype=np.float64) * scale
        assert np.max(np.abs(v - back)) <= scale / 2 + 1e-9
        assert max(abs(q) for q in qv) <= 127
    # search over the quantized corpus stays near-exact
    got = {}
    for r in S.brute_force_topk_quantized(emb, QIDS, k=10).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(bf_sets[q] & got.get(q, set())) for q in QIDS)
    recall = hits / sum(len(v) for v in bf_sets.values())
    assert recall >= 0.9, f"quantized recall {recall}"


def test_kmeans_index_centroids_match_assignments(emb):
    assign, cent = S.kmeans_ivf_index(emb, n_clusters=10)
    assert cent.count() == 10
    got = {}
    for r in S.ivf_topk(
        emb, QIDS, k=10, n_probe=4, assignments=assign, centroids=cent
    ).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    assert all(len(v) == 10 for v in got.values())


def test_kmeans_ivf_recall(emb, bf_sets):
    assign = S.build_kmeans_ivf(emb, n_clusters=10)
    # assignments are a proper partition of the corpus
    assert assign.count() == emb.count()
    assert assign.select("label").distinct().count() <= 10
    got = {}
    for r in S.ivf_topk(emb, QIDS, k=10, n_probe=4, assignments=assign).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(bf_sets[q] & got.get(q, set())) for q in QIDS)
    recall = hits / sum(len(v) for v in bf_sets.values())
    # k-means partitions align with cosine structure better than the
    # testdata's labels; expect at least comparable recall
    assert recall >= 0.4, f"k-means IVF recall {recall}"


def test_lsh_candidates_subset_ranked_exactly(emb, bf_sets):
    # every (query, neighbor) LSH returns must carry the true cosine:
    # spot-check rank-1 rows agree with brute force when present.
    bf = {(r.query_id, r.vec_id): r.cosine
          for r in S.brute_force_topk(emb, QIDS, k=10).collect()}
    for r in S.lsh_topk(emb, QIDS, k=10).collect():
        if (r.query_id, r.vec_id) in bf:
            assert abs(r.cosine - bf[(r.query_id, r.vec_id)]) < 1e-9


def test_pq_topk_recall_with_rerank(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    codes, cbs = S.pq_index(emb)
    # codes really are m small ints (the 8-byte at-rest form)
    sample = codes.limit(5).collect()
    assert all(len(r.codes) == 8 and all(0 <= c < 64 for c in r.codes)
               for r in sample)
    exact = {}
    for r in S.brute_force_topk(emb, [0, 1, 2, 3, 4], k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    got = {}
    for r in S.pq_topk(emb, [0, 1, 2, 3, 4], k=10, codes=codes,
                       codebooks=cbs, rerank=50).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hit = sum(len(exact[q] & got.get(q, set())) for q in exact)
    recall = hit / sum(len(exact[q]) for q in exact)
    assert recall >= 0.85, f"PQ+rerank recall {recall}"
    # rerank output is exact cosine -> every returned (q, vec, cosine)
    # matches the brute-force value for the same pair
    bf = {(r.query_id, r.vec_id): r.cosine
          for r in S.brute_force_topk(emb, [0, 1, 2, 3, 4], k=10).collect()}
    for r in S.pq_topk(emb, [0, 1, 2, 3, 4], k=10, codes=codes,
                       codebooks=cbs, rerank=50).collect():
        if (r.query_id, r.vec_id) in bf:
            assert abs(r.cosine - bf[(r.query_id, r.vec_id)]) < 1e-9


def test_ivf_pq_recall_vs_probed_exact(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    codes, cbs = S.pq_index(emb)
    got = {}
    for r in S.ivf_pq_topk(emb, [0, 1, 2, 3, 4], k=10, n_probe=10,
                           rerank=10**9, codes=codes, codebooks=cbs).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    exact = {}
    for r in S.brute_force_topk(emb, [0, 1, 2, 3, 4], k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    # probe-all + rerank-all degenerates to exact — machinery proof
    assert got == exact
    # the pruned configuration still recalls most of the exact set
    pruned = {}
    for r in S.ivf_pq_topk(emb, [0, 1, 2, 3, 4], k=10, n_probe=4,
                           rerank=50, codes=codes, codebooks=cbs).collect():
        pruned.setdefault(r.query_id, set()).add(r.vec_id)
    hit = sum(len(exact[q] & pruned.get(q, set())) for q in exact)
    recall = hit / sum(len(exact[q]) for q in exact)
    # bounded by the coarse-partition probe (the standalone IVF test
    # asserts >= 0.4 for the same 4/10 probing) — PQ+rerank inside the
    # probed partitions loses almost nothing on top
    assert recall >= 0.4, f"IVF×PQ recall {recall}"


def test_embedding_audit_flags_defects(spark):
    rows = [
        (0, [1.0] * 64),
        (1, [0.0] * 64),            # zero norm
        (2, [float("nan")] * 64),   # NaN
        (3, [1.0] * 10),            # wrong dim
        (4, None),                  # null
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = S.embedding_audit(df).collect()[0]
    assert r.n_vectors == 5 and r.n_null == 1 and r.n_wrong_dim == 1
    assert r.n_nan == 1 and r.n_zero_norm == 1
    # norm stats exclude defective rows (NaN must not poison them)
    assert r.max_norm == 8.0 and r.min_norm == 0.0  # sqrt(64); zero vec


def test_knn_join_recall_vs_brute(spark, sf_small):
    # batch k-NN join: recall against the exact ranking, measured over
    # EVERY vector (sf0.001 keeps the brute reference tractable)
    from clickhouse_observability_spark.operators import similarity as S
    from clickhouse_observability_spark.sources.parquet import load_table

    emb = load_table(spark, sf_small, "embeddings")
    all_ids = [r.vec_id for r in emb.select("vec_id").collect()]
    knn = S.knn_join_lsh(emb, k=10)
    got = {(r.query_id, r.vec_id) for r in knn.collect()}
    exp = {(r.query_id, r.vec_id)
           for r in S.brute_force_topk(emb, all_ids, k=10).collect()}
    assert len({q for q, _ in got}) == len(all_ids)  # every vector served
    recall = len(got & exp) / len(exp)
    assert recall >= 0.9, recall
    # per-query k bound and rank sanity
    from collections import Counter

    per_q = Counter(q for q, _ in got)
    assert max(per_q.values()) <= 10


def test_knn_join_bucket_cap_bounds_degenerate_corpus(spark):
    # adversarial: every vector identical -> every table has ONE
    # mega-bucket. With the cap, candidate volume collapses instead of
    # going quadratic; without it, all pairs collide.
    from clickhouse_observability_spark.operators import similarity as S
    from pyspark.sql import types as T

    n = 120
    rows = [(i, [1.0] * 8 , 0) for i in range(n)]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])
    emb = spark.createDataFrame(rows, schema)
    uncapped = S.knn_join_lsh(emb, k=5, dim=8).count()
    assert uncapped == n * 5  # quadratic candidates, capped only by k
    capped = S.knn_join_lsh(emb, k=5, dim=8, max_bucket_frac=0.1)
    assert capped.count() == 0  # the one mega-bucket is dropped wholesale


def test_knn_join_registered_cap_keeps_real_corpus_recall(spark, sf_small):
    # the REGISTERED configuration (max_bucket_frac=0.25) on the real
    # corpus: the cap must drop no real bucket (measured worst real
    # bucket ~11%), so coverage and recall match the uncapped join.
    from clickhouse_observability_spark.operators import similarity as S
    from clickhouse_observability_spark.sources.parquet import load_table

    emb = load_table(spark, sf_small, "embeddings")
    all_ids = [r.vec_id for r in emb.select("vec_id").collect()]
    capped = {
        (r.query_id, r.vec_id)
        for r in S.knn_join_lsh(emb, k=10, max_bucket_frac=0.25).collect()
    }
    uncapped = {
        (r.query_id, r.vec_id) for r in S.knn_join_lsh(emb, k=10).collect()
    }
    assert capped == uncapped
    assert len({q for q, _ in capped}) == len(all_ids)


def test_semantic_cluster_keep_list(spark, sf_small):
    """sim_neardup_clusters: every LSH pair lands in one component,
    keepers are component minima, and unpaired vectors are singletons."""
    from clickhouse_observability_spark.operators import dedup as D
    from clickhouse_observability_spark.registry import queries
    from clickhouse_observability_spark.sources.parquet import load_table

    out = {r.component_id: r for r in
           queries()["sim_neardup_clusters"](spark, sf_small).collect()}
    emb = load_table(spark, sf_small, "embeddings")
    pairs = [
        (r.vec_a, r.vec_b)
        for r in S.embedding_neardup_lsh(
            emb, threshold=0.45, n_planes=4, n_tables=16, multiprobe=True
        ).collect()
    ]
    comps = {r.doc_id: r.component_id for r in D.neardup_components(
        spark.createDataFrame(pairs, "vec_a long, vec_b long"),
        a="vec_a", b="vec_b",
    ).collect()}
    for a, b in pairs:
        assert comps[a] == comps[b]
    # keepers: min id per component; total keep-list covers the corpus
    n_vecs = emb.count()
    assert sum(r.component_size for r in out.values()) == n_vecs
    by_comp: dict[int, list[int]] = {}
    for vid, cid in comps.items():
        by_comp.setdefault(cid, []).append(vid)
    for cid, members in by_comp.items():
        assert out[cid].keep_doc_id == min(members)


def test_semdedup_finds_planted_duplicates(spark):
    """Planted near-identical vectors co-cluster under k-means and
    must surface as SemDeDup pairs; the keep-list keeps exactly one
    per duplicate group."""
    import random

    from clickhouse_observability_spark.operators import dedup as D
    from clickhouse_observability_spark.operators import similarity as S

    rng = random.Random(7)
    rows = []
    # two tight duplicate groups far apart + background noise
    for gid, base in ((0, 1.0), (1, -1.0)):
        anchor = [base * (1.0 + 0.05 * d) for d in range(8)]
        for j in range(3):
            rows.append(
                (
                    gid * 10 + j,
                    [x + rng.uniform(-0.001, 0.001) for x in anchor],
                    0,
                )
            )
    for i in range(20):
        rows.append(
            (100 + i, [rng.uniform(-1, 1) for _ in range(8)], 0)
        )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    assign, cent = S.kmeans_ivf_index(emb, n_clusters=4)
    pairs = S.semdedup_pairs(emb, assign, threshold=0.999)
    got = {(r.vec_a, r.vec_b) for r in pairs.collect()}
    for g in (0, 10):
        for a, b in ((g, g + 1), (g, g + 2), (g + 1, g + 2)):
            assert (a, b) in got, (a, b, got)
    # keep-list: one keeper (the smallest id) per planted group
    from pyspark.sql import functions as F

    comps = D.neardup_components(pairs, a="vec_a", b="vec_b")
    keep = D.canonical_per_component(
        emb.select(F.col("vec_id").alias("doc_id")), comps
    )
    keepers = {r.keep_doc_id for r in keep.collect()}
    assert keepers & {0, 1, 2} == {0}
    assert keepers & {10, 11, 12} == {10}
    # noise vectors all survive as their own components
    assert all(100 + i in keepers for i in range(20))


def test_semdedup_agrees_with_brute_force_within_clusters(spark, sf_small):
    """Every SemDeDup pair is a true >=threshold pair, and every
    brute-force pair whose endpoints share a cluster is found."""
    from clickhouse_observability_spark.operators import dedup as D
    from clickhouse_observability_spark.operators import similarity as S
    from clickhouse_observability_spark.sources.parquet import load_table

    emb = load_table(spark, sf_small, "embeddings")
    assign, _ = S.kmeans_ivf_index(emb, n_clusters=5)
    labels = {r.vec_id: r.label for r in assign.collect()}
    sem = {
        (r.vec_a, r.vec_b)
        for r in S.semdedup_pairs(emb, assign, threshold=0.4).collect()
    }
    brute = {
        (r.vec_a, r.vec_b)
        for r in D.embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    same_cluster = {
        (a, b) for a, b in brute if labels[a] == labels[b]
    }
    assert sem == same_cluster
    assert sem <= brute


def test_binary_codes_bit_parity_with_python(emb):
    # Spark-side packing == driver-side packing (bit 63 sign wrap
    # included) for every corpus vector.
    means, codes = S.binary_index(emb)
    got = {r.vec_id: list(r.bq) for r in codes.collect()}
    for r in emb.collect():
        exp = S._pack_bits_py(
            [float(x) for x in r.embedding], means, len(means)
        )
        assert got[r.vec_id] == exp, r.vec_id


def test_binary_rerank_all_degenerates_to_exact(emb, bf_sets):
    got = {}
    for r in S.binary_topk(emb, QIDS, k=10, rerank=10**9).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    assert got == bf_sets


def test_binary_topk_recall_with_rerank(emb, bf_sets):
    # 64 sign bits + top-50 hamming rerank on the weakly-similar
    # testdata corpus: the approximation must keep most of the true
    # top-10 (bound measured on the seeded corpus with slack).
    got = {}
    for r in S.binary_topk(emb, QIDS, k=10, rerank=50).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(bf_sets[q] & got.get(q, set())) for q in QIDS)
    recall = hits / sum(len(v) for v in bf_sets.values())
    assert recall >= 0.5, f"binary-quantization recall {recall}"


def test_ann_recall_report_shape_and_anchors(spark, sf_small, tmp_path, monkeypatch):
    # One row per method, recalls in [0,1]; the int8 arm is a
    # (near-)exact scan, so it anchors the top of the report.
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    import __spark_entry__ as em

    rows = {r.method: r.recall_at_10
            for r in em.queries()["sim_ann_recall_report"](spark, sf_small).collect()}
    assert set(rows) == {
        "lsh_multiprobe", "ivf_probe3", "ivf_kmeans_probe4",
        "int8_quantized", "pq_rerank50", "ivf_pq_probe4_rerank50",
        "binary_rerank50",
    }
    assert all(0.0 <= v <= 1.0 for v in rows.values()), rows
    assert rows["int8_quantized"] >= 0.9, rows


def test_semantic_contamination_lsh_subset_and_recall(spark, sf_small):
    import pyspark.sql.functions as F

    emb = load_table(spark, sf_small, "embeddings")
    bench = emb.filter(F.col("vec_id") % 20 == 0)
    # plant paraphrase-grade leakage: perturbed copies of benchmark
    # vectors inside the corpus (the weakly-similar testdata alone
    # yields no cross pairs at this sf)
    planted = bench.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x + CASE WHEN i % 2 = 0 "
            "THEN 0.02 ELSE -0.02 END)"
        ).alias("embedding"),
    )
    corpus = emb.filter(F.col("vec_id") % 20 != 0).select(
        "vec_id", "embedding"
    ).unionByName(planted)
    exact = {(r.left_id, r.right_id): r.cosine
             for r in S.cross_neardup_exact(bench, corpus, 0.45).collect()}
    lsh = {(r.left_id, r.right_id): r.cosine
           for r in S.cross_neardup_lsh(
               bench, corpus, 0.45, n_planes=4, n_tables=16, multiprobe=True
           ).collect()}
    assert set(lsh) <= set(exact)  # cosine-confirmed: no false pairs
    # every benchmark vector's planted copy is in the ground truth
    n_bench = bench.count()
    assert len(exact) >= n_bench
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"semantic-contamination LSH recall {recall}"
    # the planted (bench, bench+100000) pairs specifically must be hit
    planted_hits = sum(1 for (a, b) in lsh if b == a + 100000)
    assert planted_hits >= 0.9 * n_bench
    for k, v in lsh.items():
        assert v == exact[k]


def test_semantic_contamination_oracle_matches_duckdb(spark, sf_small):
    import duckdb

    from clickhouse_observability_spark.registry import oracle_sql, queries

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_small}/embeddings.parquet'"
    )
    name = "sim_semantic_contamination"
    sdf = queries()[name](spark, sf_small)
    cols = sdf.columns
    got = sorted(tuple(str(r[c]) for c in cols) for r in sdf.collect())
    res = con.execute(oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    idx = [ocols.index(c) for c in cols]
    exp = sorted(tuple(str(r[i]) for i in idx) for r in res.fetchall())
    assert got == exp


def _mmr_reference(cands, k, lam):
    # cands: list of (vec_id, cosine, vec); pure-python greedy MMR
    import math

    def norm(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    vs = {i: norm(v) for i, (i_, c, v) in zip(
        [c[0] for c in cands], cands)}
    rel = {c[0]: c[1] for c in cands}
    remaining = [c[0] for c in cands]
    out = []
    while remaining and len(out) < k:
        best, best_s = None, None
        for i in remaining:
            red = max(
                (sum(a * b for a, b in zip(vs[i], vs[j])) for j, _ in out),
                default=0.0,
            )
            s = lam * rel[i] - (1 - lam) * red
            if best_s is None or s > best_s or (s == best_s and i < best):
                best, best_s = i, s
        out.append((best, best_s))
        remaining.remove(best)
    return [i for i, _ in out]


def test_mmr_matches_python_reference(emb):
    got = {}
    for r in S.mmr_rerank(emb, QIDS, k=8, n_candidates=30, lam=0.7).collect():
        got.setdefault(r.query_id, []).append((r.mmr_rank, r.vec_id))
    cand = S.brute_force_topk(emb, QIDS, k=30)
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    by_q = {}
    for r in cand.collect():
        by_q.setdefault(r.query_id, []).append(
            (r.vec_id, r.cosine, vecs[r.vec_id]))
    for q, cands in by_q.items():
        cands.sort(key=lambda c: c[1], reverse=True)
        ref = _mmr_reference(cands, k=8, lam=0.7)
        mine = [v for _, v in sorted(got[q])]
        assert mine == ref, q


def test_mmr_diversifies_clustered_candidates(spark):
    # query q = e0; cluster A hugs q AND itself; cluster B is slightly
    # less relevant but orthogonal to A. Pure relevance ranks all of A
    # first; MMR must interleave B early.
    import numpy as np

    rng = np.random.default_rng(7)
    q = np.zeros(8); q[0] = 1.0
    rows = [(0, q.tolist())]
    for i in range(1, 5):  # cluster A: ~q + e1 wiggle
        v = q + 0.08 * rng.standard_normal(8); v[1] += 0.3
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    for i in range(5, 9):  # cluster B: relevant via e0, spread on e2
        v = 0.8 * q; v[2] = 0.6 + 0.05 * rng.standard_normal()
        rows.append((100 + i, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pure = [r.vec_id for r in S.brute_force_topk(df, [0], k=4)
            .orderBy("rank").collect()]
    mmr = [r.vec_id for r in S.mmr_rerank(df, [0], k=4, n_candidates=8,
                                          lam=0.5)
           .orderBy("mmr_rank").collect()]
    a_ids = set(range(1, 5))
    assert set(pure[:3]) <= a_ids  # relevance-only: A dominates
    assert any(v > 100 for v in mmr[:2]), mmr  # MMR pulls B in early


def test_ann_recall_sweep_monotone_in_cost(spark, sf_small, tmp_path, monkeypatch):
    # the recall/cost curve an operator actually reads: within each
    # method, spending more (probes / re-ranks) never LOWERS recall,
    # and the generous end of each curve reaches the exact top-k on
    # this corpus.
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    import __spark_entry__ as em

    rows = em.queries()["sim_ann_recall_sweep"](spark, sf_small).collect()
    by_method = {}
    for r in rows:
        by_method.setdefault(r.method, []).append(r)
    assert set(by_method) == {"ivf_kmeans", "binary"}
    for method, rs in by_method.items():
        rs.sort(key=lambda r: r.setting)
        recalls = [r.recall_at_10 for r in rs]
        costs = [r.cost_frac for r in rs]
        assert all(0.0 <= v <= 1.0 for v in recalls), (method, recalls)
        assert recalls == sorted(recalls), (method, recalls)
        assert costs == sorted(costs), (method, costs)
    # full-probe IVF == exact partition-complete scan
    ivf = by_method["ivf_kmeans"]
    assert ivf[-1].recall_at_10 == 1.0, ivf
