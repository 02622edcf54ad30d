"""Data-selection tier (r5): DSIR weights, perplexity buckets, Gopher
rules — semantics on hand-built corpora + oracle execution + plan
shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_observability_spark.operators import text_analysis as TX
from clickhouse_observability_spark.plans import explain as P
from clickhouse_observability_spark.sources.parquet import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_ranks_target_like_docs_higher(spark):
    # target: fruit domain; raw corpus: fruit + code domains. The
    # fruit docs must out-score the code docs.
    fruit = [
        (i, "apple banana cherry apple banana plum pear", "en")
        for i in range(8)
    ]
    code = [
        (100 + i, "malloc pointer segfault kernel compile linker", "en")
        for i in range(8)
    ]
    docs = _docs(spark, fruit + code)
    target = _docs(spark, fruit)
    w = {
        r.doc_id: r.dsir_logratio
        for r in TX.dsir_importance(docs, target, n_buckets=256).collect()
    }
    worst_fruit = min(w[i] for i, *_ in fruit)
    best_code = max(w[i] for i, *_ in code)
    assert worst_fruit > best_code
    # weights are per-feature averages: bounded by the max |log ratio|
    assert all(abs(v) < 20 for v in w.values())


def test_dsir_importance_matches_python_reference(spark):
    import hashlib
    import math

    rows = [
        (1, "a b c a", "en"),
        (2, "b c d", "en"),
        (3, "x y z x y", "de"),
        (4, "a x b y", "fr"),
    ]
    docs = _docs(spark, rows)
    target = _docs(spark, rows[:2])
    B = 64

    def feats(text):
        toks = [t for t in " ".join(text.lower().split()).split(" ") if t]
        grams = toks + [
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        ]
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:14], 16) % B
            for g in grams
        ]

    raw = [b for _, text, _ in rows for b in feats(text)]
    tgt = [b for _, text, _ in rows[:2] for b in feats(text)]
    cr = {b: raw.count(b) for b in set(raw)}
    ct = {b: tgt.count(b) for b in set(tgt)}
    nr, nt = len(raw), len(tgt)

    def lam(b):
        return math.log((ct.get(b, 0) + 1) / (nt + B)) - math.log(
            (cr[b] + 1) / (nr + B)
        )

    expected = {}
    for doc_id, text, _ in rows:
        fs = feats(text)
        expected[doc_id] = round(sum(lam(b) for b in fs) / len(fs), 4)

    got = {
        r.doc_id: r.dsir_logratio
        for r in TX.dsir_importance(docs, target, n_buckets=B).collect()
    }
    assert got == expected


def test_perplexity_buckets_are_terciles_per_lang(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    out = TX.perplexity_buckets(docs)
    sizes = {
        (r.lang, r.bucket): r.n
        for r in out.groupBy("lang", "bucket").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    langs = {lang for lang, _ in sizes}
    for lang in langs:
        ns = [sizes.get((lang, b), 0) for b in ("head", "middle", "tail")]
        assert max(ns) - min(ns) <= 1, (lang, ns)
    # head must contain the best-scoring doc of each language
    rows = out.collect()
    for lang in langs:
        best = max(
            (r for r in rows if r.lang == lang),
            key=lambda r: (r.avg_logprob, -r.doc_id),
        )
        assert best.bucket == "head", (lang, best)


def test_gopher_rules_flags(spark):
    long_good = " ".join(
        ["the quick brown fox jumps over lazy dogs that have with"] * 6
    )  # 60 words, all alpha, stopwords {the, that, have, with} >= 2
    rows = [
        (1, long_good, "en"),
        (2, "short doc", "en"),  # fails word count
        (3, " ".join(["####"] * 60), "en"),  # symbol ratio + alpha fail
        (4, "\n".join(["- bullet point here"] * 10), "en"),  # all bullets
        (5, "\n".join(["trailing line..."] * 10), "en"),  # all ellipses
        (6, " ".join(["a"] * 60), "en"),  # mean word length < 3
    ]
    out = {
        r.doc_id: r
        for r in TX.gopher_rules(_docs(spark, rows)).collect()
    }
    assert out[1].passes_gopher
    assert not out[2].flag_word_count and not out[2].passes_gopher
    assert not out[3].flag_symbol_ratio and not out[3].flag_alpha_words
    assert not out[4].flag_bullet_lines
    assert not out[5].flag_ellipsis_lines
    assert not out[6].flag_mean_word_len
    # empty doc: every denominator guarded, no divide-by-zero
    empty = TX.gopher_rules(_docs(spark, [(9, "", "en")])).collect()[0]
    assert not empty.passes_gopher


def test_selection_plan_shapes(spark, sf_small):
    from clickhouse_observability_spark.registry import queries

    qs = queries()
    # gopher rules: pure map — zero shuffles
    assert P.shuffle_count(qs["text_gopher_rules"](spark, sf_small)) == 0
    # DSIR: the lambda table broadcasts into the per-doc aggregate
    assert P.has_broadcast_join(qs["text_dsir_weights"](spark, sf_small))


def test_selection_oracles_match_duckdb(spark, sf_small):
    """Execute the r5 selection oracle strings against DuckDB on real
    testdata (after-window entries: pytest is their oracle gate)."""
    import duckdb

    from clickhouse_observability_spark.registry import oracle_sql, queries

    qs, oracles = queries(), oracle_sql()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_small}/documents.parquet'"
    )
    for name in (
        "text_dsir_weights",
        "text_perplexity_buckets",
        "text_gopher_rules",
        "text_c4_filters",
    ):
        sdf = qs[name](spark, sf_small)
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        assert sorted(sdf.columns) == sorted(dcols), name
        idx = [dcols.index(c) for c in sdf.columns]

        def norm(v):
            return f"{v:.6g}" if isinstance(v, float) else str(v)

        drows = sorted(tuple(norm(r[i]) for i in idx) for r in res.fetchall())
        srows = sorted(tuple(norm(v) for v in r) for r in sdf.collect())
        assert srows == drows, name
        assert srows, name


def test_mixture_plan_semantics(spark):
    rows = [
        (1, "a b c d e f g h i j", "en", "big"),    # 10 tokens
        (2, "a b c d e f g h i j", "en", "big"),    # big: 20 tokens
        (3, "a b", "en", "small"),                  # small: 2 tokens
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {
        r.source: r
        for r in TX.mixture_plan(docs, token_budget=10).collect()
    }
    # uniform target: 5 tokens wanted per source
    big, small = out["big"], out["small"]
    assert big.n_tokens == 20 and small.n_tokens == 2
    assert abs(big.rate - 0.25) < 1e-9 and big.planned_tokens == 5
    assert not big.deficit
    # small can't fill its 5-token share: rate caps at 1, deficit set
    assert small.rate == 1.0 and small.planned_tokens == 2 and small.deficit
    # explicit target shares: all budget to one source
    out2 = {
        r.source: r
        for r in TX.mixture_plan(
            docs, token_budget=10, target_shares={"big": 1.0}
        ).collect()
    }
    assert out2["big"].planned_tokens == 10
    assert out2["small"].rate == 0.0 and out2["small"].planned_tokens == 0


def test_quality_classifier_separates_synthetic_classes(spark):
    rows = [(i, "good clean prose flows nicely here", "en") for i in range(30)]
    rows += [(100 + i, "zz qq xx vv kk jj ww yy", "xx") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    b0, w = TX.train_quality_classifier(
        docs, docs.filter("lang = 'en'"), n_buckets=64
    )
    assert len(w) == 64
    scores = {r.doc_id: r.quality_prob
              for r in TX.score_quality_classifier(docs, b0, w, 64).collect()}
    pos = [scores[i] for i in range(30)]
    neg = [scores[100 + i] for i in range(30)]
    assert min(pos) > max(neg)
    assert min(pos) > 0.9 and max(neg) < 0.1


def test_quality_classifier_orders_target_domain(spark, sf_small, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    import __spark_entry__ as em

    from clickhouse_observability_spark.sources.parquet import load_table

    out = em.queries()["text_quality_classifier"](spark, sf_small)
    docs = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    joined = out.join(docs, "doc_id")
    import pyspark.sql.functions as F

    means = {r.lang: r.m for r in joined.groupBy("lang").agg(
        F.avg("quality_prob").alias("m")).collect()}
    others = [v for k, v in means.items() if k != "en"]
    assert means["en"] > max(others), means
    # deterministic across calls (sidecar-cached model)
    a = sorted((r.doc_id, r.quality_prob) for r in out.collect())
    b = sorted((r.doc_id, r.quality_prob)
               for r in em.queries()["text_quality_classifier"](spark, sf_small).collect())
    assert a == b


def test_c4_filters_semantics(spark):
    # realistic pages (the sf corpus has no punctuation, so behavior
    # lives here): each C4 rule exercised, DuckDB cross-checked below
    pages = [
        # passes everything: 3 retained sentences of >= 5 words
        (1, "The quick brown fox jumps over dogs.\n"
            "A second proper sentence lives right here.\n"
            "And here is yet another full sentence!"),
        # line-level drops: short line, no terminal punct, javascript
        (2, "Too short line.\n"
            "this line has no terminal punctuation at all\n"
            "Please enable javascript to view this page.\n"
            "Only this one real sentence survives the line filters."),
        # page-level: lorem ipsum
        (3, "Lorem ipsum dolor sit amet consectetur adipiscing elit.\n"
            "A perfectly fine sentence follows the boilerplate here.\n"
            "Another good sentence with enough words appears here.\n"
            "And one more to clear the three sentence bar easily."),
        # page-level: code brace
        (4, "This sentence would otherwise be kept around here.\n"
            "function f() { return 1; }\n"
            "Another keepable sentence with plenty of words here.\n"
            "A third keepable sentence rounds out the page nicely."),
        # empty / null
        (5, ""),
        (6, None),
        # CRLF endings: must classify exactly like LF (Java $ vs RE2 $)
        (7, "A first proper sentence with enough words here.\r\n"
            "A second proper sentence with enough words too.\r\n"
            "A third proper sentence closes out the page now.\r\n"),
    ]
    docs = spark.createDataFrame(pages, "doc_id long, text string")
    from pyspark.sql import functions as F

    out = {r.doc_id: r for r in TX.c4_filters(
        docs.withColumn("text", F.coalesce("text", F.lit("")))
    ).collect()}
    assert out[1].passes_c4 and out[1].n_kept_lines == 3
    assert out[1].n_sentences == 3
    # doc 2: 'Too short line.' (<5 words), bare line (no punct),
    # javascript line all dropped; one survivor -> fails min-sentences
    assert out[2].n_kept_lines == 1 and not out[2].flag_min_sentences
    assert not out[2].passes_c4
    # doc 3: lines fine, page killed by lorem ipsum
    assert out[3].n_kept_lines == 4 and not out[3].flag_no_lorem
    assert not out[3].passes_c4
    # doc 4: brace kills the page; the brace line itself was dropped
    # (no terminal punctuation) but the page-level rule still fires
    assert not out[4].flag_no_brace and not out[4].passes_c4
    assert out[5].n_kept_lines == 0 and not out[5].passes_c4
    assert out[6].n_kept_lines == 0 and not out[6].passes_c4
    assert out[7].passes_c4 and out[7].n_kept_lines == 3

    # DuckDB cross-check of the same frame through the ORACLE SQL
    import duckdb

    import pandas as pd

    from clickhouse_observability_spark.registry import oracle_sql

    con = duckdb.connect()
    pdf = pd.DataFrame(pages, columns=["doc_id", "text"])
    con.register("documents", pdf)
    res = con.execute(oracle_sql()["text_c4_filters"])
    dcols = [d[0] for d in res.description]
    drows = {r[dcols.index("doc_id")]: dict(zip(dcols, r))
             for r in res.fetchall()}
    for d, row in out.items():
        for c in ("n_lines", "n_kept_lines", "n_sentences", "clean_len",
                  "flag_no_lorem", "flag_no_brace", "flag_min_sentences",
                  "passes_c4"):
            assert row[c] == drows[d][c], (d, c, row[c], drows[d][c])


def test_mixture_temperature_limits(spark):
    """T=1 reproduces natural token proportions; large T approaches
    uniform; shares always sum to ~1 and planned tokens respect the
    rate<=1 clamp."""
    import pytest

    from clickhouse_observability_spark.operators import (
        text_analysis as TX,
    )

    docs = spark.createDataFrame(
        [(i, "w " * (1 if i % 10 else 400), f"src{i % 2}")
         for i in range(20)],
        "doc_id long, text string, source string",
    )  # src0 holds the two 400-token docs -> ~98% of tokens
    nat = {r.source: r for r in TX.mixture_plan_temperature(
        docs, token_budget=100, temperature=1.0).collect()}
    hot = {r.source: r for r in TX.mixture_plan_temperature(
        docs, token_budget=100, temperature=100.0).collect()}
    tok = {r.source: r.n_tokens for r in nat.values()}
    total = sum(tok.values())
    # T=1: shares track the token fractions
    for s in nat:
        assert nat[s].target_share == pytest.approx(
            tok[s] / total, abs=1e-3)
    # T->inf: shares -> uniform
    for s in hot:
        assert hot[s].target_share == pytest.approx(0.5, abs=0.02)
    # upsampling direction: the small source's share strictly grows
    small = min(tok, key=tok.get)
    assert hot[small].target_share > nat[small].target_share
    for r in list(nat.values()) + list(hot.values()):
        assert 0.0 <= r.rate <= 1.0
        assert r.planned_tokens <= r.n_tokens


def test_fixed_quality_select_contract(spark, sf_small):
    """r9 verdict #6 pins for the oracle-adjudicated scoring+selection
    hot path: (a) the Pareto-keep decision replays the analytic rule
    over (prob_q6, md5-uniform) exactly — a pure-python reference
    agrees doc for doc; (b) keep rate is far from degenerate on real
    docs; (c) deterministic across calls; (d) map-only plan (no
    Exchange — the broadcast-literal scoring shape)."""
    import hashlib

    from clickhouse_observability_spark.operators.quality_classifier import (
        fixed_quality_select,
    )

    docs = load_table(spark, sf_small, "documents")
    out = fixed_quality_select(docs)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == docs.count()

    # (a) python replay of the keep rule
    for doc_id, r in list(rows.items())[:200]:
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) \
            / 4294967296.0
        q = r.prob_q6 / 1000000.0
        x = 2.0 - q
        x2 = x * x
        x4 = x2 * x2
        x8 = x4 * x4
        assert r.kept == ((x8 * x) * (1.0 - u) < 1.0), doc_id

    # (b) the acceptance is selective but non-degenerate
    kept = sum(1 for r in rows.values() if r.kept)
    assert 0 < kept < len(rows)

    # (c) bit-stable rerun
    again = {r.doc_id: (r.prob_q6, r.kept)
             for r in fixed_quality_select(docs).collect()}
    assert again == {k: (r.prob_q6, r.kept) for k, r in rows.items()}

    # (d) map-only: no shuffle anywhere in the scoring plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_trained_pareto_artifact_separates_and_replays(spark, sf_med):
    """r11 (r10 verdict #5): text_quality_pareto_select now scores
    with the FROZEN TRAINED artifact (operators/quality_artifact.py)
    through the fixed-select exact-integer plan. Pins: (a) the frozen
    weights are a real model, not noise — mean P(quality) orders the
    en slice above the rest on the CANONICAL corpus (sf0.01, the
    artifact's training input; 512 hashed buckets over 500 synthetic
    docs don't transfer lang signal to a DIFFERENT synthetic corpus,
    so the at-rest claim is training-corpus separation — the
    docstring's 0.93-vs-0.67); (b) the registry entry is the
    artifact-parameterized fixed-select (schema + keep-rule python
    replay on a sample); (c) map-only plan (broadcast-literal
    scoring, no Exchange)."""
    import hashlib

    from clickhouse_observability_spark.operators.quality_artifact import (
        TRAINED_BIAS_I,
        TRAINED_WEIGHTS_I,
    )
    from clickhouse_observability_spark.registry import queries

    assert len(TRAINED_WEIGHTS_I) == 512
    out = queries()["text_quality_pareto_select"](spark, sf_med)
    assert out.columns == ["doc_id", "n_feats", "prob_q6", "kept"]
    docs = load_table(spark, sf_med, "documents").select("doc_id", "lang")
    j = out.join(docs, "doc_id").collect()
    en = [r.prob_q6 for r in j if r.lang == "en"]
    other = [r.prob_q6 for r in j if r.lang != "en"]
    assert en and other
    # (a) target-vs-rest ordering under the frozen model
    assert sum(en) / len(en) > sum(other) / len(other)
    # (b) keep rule replay on a sample
    for r in j[:100]:
        u = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) \
            / 4294967296.0
        q = r.prob_q6 / 1000000.0
        x = 2.0 - q
        x9 = ((x * x) * (x * x)) * ((x * x) * (x * x)) * x
        assert r.kept == (x9 * (1.0 - u) < 1.0), r.doc_id
    # (c) map-only scoring plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pareto_artifact_provenance_canary(sf_med):
    """The frozen artifact claims 'trained on the canonical sf0.01
    corpus'. If testdata regenerates, the weights still hash green
    (the oracle replays the same literals) but the claim goes stale —
    this canary pins the corpus fingerprint so regeneration fails
    loudly and scripts/gen_pareto_artifact.py gets re-run."""
    import duckdb

    from clickhouse_observability_spark.operators.quality_artifact import (
        TRAINED_ON_DOCID_MD5,
        TRAINED_ON_N_DOCS,
    )

    n, fp = duckdb.sql(
        f"SELECT count(*), md5(string_agg(CAST(doc_id AS VARCHAR), ',' "
        f"ORDER BY doc_id)) FROM '{sf_med}/documents.parquet'"
    ).fetchone()
    assert (n, fp) == (TRAINED_ON_N_DOCS, TRAINED_ON_DOCID_MD5), (
        "testdata regenerated — re-run scripts/gen_pareto_artifact.py "
        "and refresh operators/quality_artifact.py")
