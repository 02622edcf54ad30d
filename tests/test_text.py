"""Text-analysis operator tests (EXT north-star)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from clickhouse_observability_spark.operators import text_analysis as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat and the dog of a house in the garden is big"),
        (1, "der hund und die katze das ist ein haus und der garten"),
        (2, "le chat et la maison les arbres des fleurs un jardin est"),
        (3, "el gato y los perros las casas es un jardin en madrid"),
        (4, "xyzzy plugh quux"),
        (5, "  Spaced   OUT    text  42 here  "),
    ]
    return spark.createDataFrame(
        [(i, t, "??", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_lang_id_heuristic(docs):
    got = {r.doc_id: r.lang_pred for r in TX.lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "es"
    assert got[4] == "und"


def test_token_stats(docs):
    r = {x.doc_id: x for x in TX.token_stats(docs).collect()}
    assert r[5].n_tokens == 5  # Spaced OUT text 42 here
    assert r[4].n_tokens == 3 and r[4].n_distinct_tokens == 3
    assert r[0].n_chars == 51


def test_quality_scores(docs):
    r = {x.doc_id: x for x in TX.quality_scores(docs).collect()}
    assert r[0].passes_quality  # normal prose
    assert not r[4].passes_quality  # only 3 tokens
    assert r[0].stopword_ratio > 0.3  # the/and/of/a/in/is heavy
    assert r[5].digit_ratio > 0


def test_fingerprint_invariance(spark):
    df = spark.createDataFrame(
        [
            (0, "Hello   World", "x", "s", 1),
            (1, "  hello world ", "x", "s", 1),
            (2, "hello world!", "x", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    fps = {r.doc_id: r.fp_md5 for r in TX.fingerprints(df).collect()}
    assert fps[0] == fps[1]  # case + whitespace normalize away
    assert fps[0] != fps[2]  # punctuation is content


def test_corpus_curation_pipeline(spark, sf_small):
    from clickhouse_observability_spark.operators import dedup as D
    from clickhouse_observability_spark.registry import queries

    out = queries()["text_corpus_curation"](spark, sf_small)
    rows = out.collect()
    ids = {r.doc_id for r in rows}
    # every surviving doc is an exact-dedup survivor...
    from clickhouse_observability_spark.sources.parquet import load_table

    docs = load_table(spark, sf_small, "documents")
    keep = {r.doc_id for r in D.dedup_keep_first(docs).select("doc_id").collect()}
    assert ids <= keep
    # ...and quality-passing and non-boilerplate, minus contaminated
    # train docs; nothing that passes every stage is missing
    qual = {r.doc_id for r in TX.quality_scores(docs).collect() if r.passes_quality}
    rep = {r.doc_id for r in TX.repetition_stats(docs).collect()
           if r.top_2gram_frac <= 0.2}
    from clickhouse_observability_spark.registry import queries as _qs
    contaminated = {r.train_id for r in
                    _qs()["text_contamination"](spark, sf_small).collect()}
    assert ids == (keep & qual & rep) - contaminated
    # tags well-formed; split is deterministic over reruns
    assert all(r.split in ("train", "val") and r.lang_pred for r in rows)
    again = {(r.doc_id, r.split) for r in
             queries()["text_corpus_curation"](spark, sf_small).collect()}
    assert again == {(r.doc_id, r.split) for r in rows}


def test_contamination_pairs_finds_planted_overlap(spark):
    mk = "doc_id long, text string"
    train = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (1, "one two three four five six seven"),  # < 8 tokens: no grams
            (2, "totally unrelated words with no benchmark overlap at all ok"),
        ],
        mk,
    )
    bench = spark.createDataFrame(
        [(100, "ALPHA beta gamma delta epsilon zeta eta theta kappa")], mk
    )
    got = {(r.train_id, r.bench_id): r.n_shared for r in
           TX.contamination_pairs(train, bench, n=8).collect()}
    # doc 0 and bench 100 share exactly one 8-gram (alpha..theta,
    # case-insensitive via normalization); nothing else overlaps
    assert got == {(0, 100): 1}
    # shorter grams find more overlap, never less
    got5 = {(r.train_id, r.bench_id): r.n_shared for r in
            TX.contamination_pairs(train, bench, n=5).collect()}
    assert got5[(0, 100)] > 1 and set(got5) == {(0, 100)}


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@example.org or bob@test.co today"),
            (1, "server 10.0.0.1 and 192.168.1.254 are down"),
            (2, "call 555-867-5309 or +1 555.867.5309 now"),
            (3, "clean text with no sensitive content"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in TX.pii_scrub(df, denylist=["server"]).collect()}
    assert rows[0].n_email == 2 and "<EMAIL>" in rows[0].clean_text
    assert "@" not in rows[0].clean_text
    assert rows[1].n_ipv4 == 2 and rows[1].clean_text.count("<IPV4>") == 2
    assert rows[1].n_denylist == 1 and "<TERM>" in rows[1].clean_text
    assert rows[2].n_phone == 2 and rows[2].clean_text.count("<PHONE>") == 2
    assert rows[3].clean_text == "clean text with no sensitive content"
    assert rows[3].n_email == rows[3].n_ipv4 == rows[3].n_phone == 0


def test_repetition_stats_flags_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (0, "buy now buy now buy now buy now"),   # heavy repetition
            (1, "all tokens here are fully distinct words"),
            (2, "one"),                                # <2 tokens: drops out
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in TX.repetition_stats(df).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].top_2gram == "buy now" and rows[0].top_2gram_n == 4
    assert rows[0].n_2grams == 7 and rows[0].top_2gram_frac > 0.5
    # dup-2gram fraction (Gopher): 7 occurrences over 2 distinct grams
    assert rows[0].n_distinct_2grams == 2
    assert rows[0].dup_2gram_frac == round(5 / 7, 4)
    assert rows[1].top_2gram_n == 1  # no repeated 2-gram
    assert rows[1].dup_2gram_frac == 0.0  # all 2-grams distinct
    # deterministic tie-break: all counts 1 -> lexicographically first
    assert rows[1].top_2gram == min(
        "all tokens,tokens here,here are,are fully,fully distinct,distinct words"
        .split(",")
    )


def test_domain_mix_sampling_deterministic_rates(spark):
    rows = [(i, f"doc {i}", "keep" if i % 2 else "down") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in TX.domain_mix_summary(
        TX.domain_mix_sample(df, {"down": 0.25})).collect()}
    assert out["keep"].rate == 1.0 and out["keep"].n_sampled == out["keep"].n_docs
    frac = out["down"].n_sampled / out["down"].n_docs
    assert 0.2 < frac < 0.3  # md5 buckets ~uniform
    again = {r.source: r.n_sampled for r in TX.domain_mix_summary(
        TX.domain_mix_sample(df, {"down": 0.25})).collect()}
    assert again == {s: r.n_sampled for s, r in out.items()}


def test_contamination_hits_matches_pairs_rollup(spark):
    mk = "doc_id long, text string"
    train = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),  # dup
            (2, "totally unrelated words with no benchmark overlap at all ok"),
        ],
        mk,
    )
    bench = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta eta theta kappa"),
            (101, "alpha beta gamma delta epsilon zeta eta theta kappa"),  # dup
        ],
        mk,
    )
    hits = {r.train_id: r.n_shared for r in
            TX.contamination_hits(train, bench, n=8).collect()}
    # per-doc DISTINCT grams vs the benchmark blocklist: dup bench
    # docs do NOT multiply the count (the t×v blowup the blocklist
    # form exists to avoid)
    assert hits == {0: 1, 1: 1}
    pairs = TX.contamination_pairs(train, bench, n=8).collect()
    assert {r.train_id for r in pairs} == set(hits)
    assert len(pairs) == 4  # attribution form: 2 train dups × 2 bench dups


def test_repetition_hash_mode_matches_string_mode(spark, sf_small):
    from clickhouse_observability_spark.sources.parquet import load_table

    docs = load_table(spark, sf_small, "documents")
    with_str = {(r.doc_id, r.n_2grams, r.top_2gram_n, r.top_2gram_frac,
                 r.n_distinct_2grams, r.dup_2gram_frac)
                for r in TX.repetition_stats(docs, with_gram=True).collect()}
    hashed = {(r.doc_id, r.n_2grams, r.top_2gram_n, r.top_2gram_frac,
               r.n_distinct_2grams, r.dup_2gram_frac)
              for r in TX.repetition_stats(docs, with_gram=False).collect()}
    assert hashed == with_str  # same stats, no gram strings in the plan


def test_corpus_audit_flags_defects(spark):
    df = spark.createDataFrame(
        [
            (0, "good text here", "en", "s", 14),
            (0, "dup id", "en", "s", 6),          # duplicate doc_id
            (1, "   ", "en", "s", 3),              # blank
            (2, None, "en", "s", 0),               # null text
            (3, "length lies", "de", "t", 99),     # n_chars mismatch
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = TX.corpus_audit(df).collect()[0]
    assert r.n_docs == 5 and r.n_null_text == 1 and r.n_blank_text == 1
    assert r.n_dup_ids == 1 and r.n_chars_mismatch == 1
    assert r.n_sources == 2 and r.n_langs == 2


def _py_bpe(word_freqs, n_merges):
    # pure-Python reference BPE (left-to-right non-overlapping merges,
    # lexicographic tie-break on (pair))
    words = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in words.items():
            for i in range(len(w) - 1):
                counts[(w[i], w[i + 1])] = counts.get((w[i], w[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        merges.append((best[0], best[1], counts[best]))
        new = {}
        for w, f in words.items():
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and (w[i], w[i + 1]) == best:
                    out.append(w[i] + w[i + 1]); i += 2
                else:
                    out.append(w[i]); i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        words = new
    return merges


def test_bpe_learn_matches_python_reference(spark):
    rows = [
        (0, "low low low lower lower newest newest newest newest widest"),
        (1, "low lower newest widest widest newest"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = TX.bpe_learn(df, n_merges=6)
    from collections import Counter

    freqs = Counter(
        w for _, t in rows for w in t.split()
    )
    expect = _py_bpe(freqs, 6)
    assert got == expect
    # segmentation with the learned merges shrinks piece counts and
    # stays deterministic
    seg = {r.doc_id: r.n_bpe_pieces for r in TX.bpe_segment(df, got).collect()}
    chars = {i: sum(len(w) for w in t.split()) for i, t in rows}
    assert all(seg[i] < chars[i] for i in seg)
    again = {r.doc_id: r.n_bpe_pieces for r in TX.bpe_segment(df, got).collect()}
    assert again == seg


def test_corpus_stats_rollup_totals(spark, sf_small):
    from clickhouse_observability_spark.registry import queries
    from clickhouse_observability_spark.sources.parquet import load_table

    all_rows = queries()["text_corpus_stats"](spark, sf_small).collect()
    # the r4 merged panel is section-tagged: 'corpus' rollup rows +
    # 'top_terms' rows (which also carry NULL source/lang)
    rows = [r for r in all_rows if r.section == "corpus"]
    docs = load_table(spark, sf_small, "documents").collect()
    grand = [r for r in rows if r.source is None and r.lang is None]
    assert len(grand) == 1 and grand[0].n_docs == len(docs)
    assert grand[0].total_chars == sum(d.n_chars for d in docs)
    # per-source subtotals sum to the grand total
    subs = [r for r in rows if r.source is not None and r.lang is None]
    assert sum(r.n_docs for r in subs) == len(docs)
    # top-terms arm == the standalone rows-only entry (row order
    # within a union is not meaningful; compare as sets)
    top = {(r.term, r.term_n) for r in all_rows if r.section == "top_terms"}
    standalone = {
        (r.tok, r.n)
        for r in queries()["text_top_terms"](spark, sf_small).collect()
    }
    assert len(top) == 20 and top == standalone


def test_contamination_df_cap_drops_boilerplate_gram(spark):
    mk = "doc_id long, text string"
    boiler = "all rights reserved by the example corp inc"
    train = spark.createDataFrame(
        [(i, boiler) for i in range(5)] + [(9, "alpha beta gamma delta "
                                              "epsilon zeta eta theta")],
        mk,
    )
    bench = spark.createDataFrame(
        [(100, boiler), (101, "alpha beta gamma delta epsilon zeta eta theta")],
        mk,
    )
    uncapped = {r.train_id for r in
                TX.contamination_hits(train, bench, n=8).collect()}
    assert uncapped == {0, 1, 2, 3, 4, 9}
    capped = {r.train_id for r in
              TX.contamination_hits(train, bench, n=8, max_df=2).collect()}
    # the 5x-duplicated boilerplate gram (df=5 > 2) is dropped; the
    # genuine unique leak survives
    assert capped == {9}


def test_contamination_hot_gram_in_every_doc_bounds_candidates(spark):
    # Adversarial corpus: ONE boilerplate gram in EVERY train doc.
    # Uncapped, the blocklist join touches every doc (candidate volume
    # O(corpus)); with the df cap the hot gram is dropped before the
    # join, so candidates collapse to the genuine leak set no matter
    # how large the corpus grows (SCALING.md decontamination note).
    from pyspark.sql import functions as F

    mk = "doc_id long, text string"
    boiler = "zero one two three four five six seven"  # exactly 8 tokens
    leak = "alpha beta gamma delta epsilon zeta eta theta"

    def corpus(n_docs):
        rows = [(i, f"{boiler} pad{i}x pad{i}y") for i in range(n_docs)]
        rows[3] = (3, f"{boiler} {leak}")
        return spark.createDataFrame(rows, mk)

    bench = spark.createDataFrame([(1000, boiler), (1001, leak)], mk)
    for n_docs in (20, 80):
        train = corpus(n_docs)
        uncapped = {r.train_id for r in
                    TX.contamination_hits(train, bench, n=8).collect()}
        assert len(uncapped) == n_docs  # hot gram implicates everyone
        capped = {r.train_id for r in
                  TX.contamination_hits(train, bench, n=8, max_df=5).collect()}
        assert capped == {3}  # independent of corpus size
        # candidate volume bound, measured at the join input: with the
        # cap, only rare-gram rows survive to meet the blocklist.
        tg = TX._doc_gram_hashes(train, 8).withColumnRenamed("doc_id", "train_id")
        rare = (tg.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
                .filter("df <= 5").select("gh"))
        bg = TX._doc_gram_hashes(bench, 8).select("gh").distinct()
        n_candidates = tg.join(rare, "gh").join(bg, "gh").count()
        assert n_candidates <= len(leak.split())  # bounded, not O(n_docs)


def test_winnowing_matches_python_reference(spark, sf_small):
    # map-only winnowing (no explode/window) == the direct per-doc
    # python computation, doc for doc, over real testdata
    import hashlib
    import re

    from clickhouse_observability_spark.sources.parquet import load_table

    docs = load_table(spark, sf_small, "documents")
    got = {r.doc_id: (r.n_fingerprints, r.min_fp)
           for r in TX.winnowing_fingerprints(docs, k=5, window=4).collect()}

    def pyref(text, k=5, window=4):
        norm = re.sub(r"\s+", " ", text.strip()).lower()
        if len(norm) < k:
            return None
        gs = [hashlib.md5(norm[i : i + k].encode()).hexdigest()
              for i in range(len(norm) - k + 1)]
        if len(gs) < window:
            return None
        fps = [min(gs[p - window + 1 : p + 1]) for p in range(window - 1, len(gs))]
        return (len(set(fps)), min(fps))

    rows = docs.select("doc_id", "text").collect()
    assert len(got) > 0
    for r in rows:
        assert got.get(r.doc_id) == pyref(r.text), r.doc_id


def test_domain_mix_rates_nest(spark):
    # md5-cutoff sampling nests: the 10% sample is a subset of the
    # 50% sample for the same source (reproducible sub-sampling).
    rows = [(i, "t", "s") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    take = lambda r: {x.doc_id for x in
                      TX.domain_mix_sample(df, {"s": r}).collect() if x.sampled}
    s10, s50 = take(0.1), take(0.5)
    assert s10 < s50
    assert 0.05 < len(s10) / 3000 < 0.15 and 0.45 < len(s50) / 3000 < 0.55


def test_empty_doc_ratio_parity_with_oracle(spark, tmp_path):
    """Zero-token docs: Spark emits NULL ratios; the NULLIF-guarded
    oracles must hash identically (DuckDB would otherwise produce
    inf/NaN from float division by zero). Guards ADVICE r2 item 4."""
    import duckdb

    from clickhouse_observability_spark.registry import oracle_sql, queries

    rows = [
        (0, "", "en", "s", 0),
        (1, "   \t  ", "en", "s", 6),
        (2, "the quick brown fox jumps over the lazy dog", "en", "s", 43),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    sf_dir = str(tmp_path / "sf_empty")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "docs_pq"))
    import glob
    import os
    import shutil

    os.makedirs(sf_dir)
    src = glob.glob(str(tmp_path / "docs_pq" / "*.parquet"))[0]
    shutil.copy(src, os.path.join(sf_dir, "documents.parquet"))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    qs, oracles = queries(), oracle_sql()
    for name in ("text_token_stats", "text_quality"):
        sdf = qs[name](spark, sf_dir)
        srows = {tuple(str(v) for v in r) for r in sdf.collect()}
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        assert sorted(sdf.columns) == sorted(dcols)
        # align column order to spark's before comparing
        idx = [dcols.index(c) for c in sdf.columns]
        drows = set()
        for r in res.fetchall():
            vals = []
            for i in idx:
                v = r[i]
                if isinstance(v, float):
                    v = round(v, 4)
                vals.append(str(v))
            drows.add(tuple(vals))
        assert srows == drows, f"{name}: {srows ^ drows}"


def test_pack_training_chunks_invariants_and_reference(spark, sf_small):
    # concat-and-chunk packing: token conservation, exact fill of all
    # non-final chunks, contiguous spans, python-reference parity
    import re

    from clickhouse_observability_spark.sources.parquet import load_table

    budget = 256
    docs = load_table(spark, sf_small, "documents")
    rows = TX.pack_training_chunks(docs, budget=budget).collect()

    # python reference: same deterministic doc order, one token stream
    stream = []
    for d in sorted(docs.select("doc_id", "text").collect(),
                    key=lambda r: r.doc_id):
        n = len([t for t in re.split(r"\s+", d.text.strip().lower()) if t])
        if n:
            stream.append((d.doc_id, n))
    exp = []
    pos = 0
    for doc_id, n in stream:
        start = pos
        for chunk in range(start // budget, (start + n - 1) // budget + 1):
            lo = max(start, chunk * budget)
            hi = min(start + n, (chunk + 1) * budget)
            exp.append((doc_id, chunk, lo - start, lo - chunk * budget, hi - lo))
        pos += n
    assert sorted((r.doc_id, r.chunk_id, r.doc_tok_start, r.chunk_tok_start,
                   r.n_toks) for r in rows) == sorted(exp)

    total = sum(n for _, n in stream)
    assert sum(r.n_toks for r in rows) == total  # conservation
    fill = {}
    for r in rows:
        fill[r.chunk_id] = fill.get(r.chunk_id, 0) + r.n_toks
    last = max(fill)
    assert all(v == budget for k, v in fill.items() if k != last)
    assert 0 < fill[last] <= budget


def test_pack_training_chunks_no_global_window(spark, sf_small):
    # the ROW-level cumsum must be a distributed prefix sum: it
    # windows on the range-partition id, never an unpartitioned
    # (single-task) global window over corpus rows. Since r13 the
    # per-partition OFFSETS are computed in-plan instead of a driver
    # collect: that subtree may legitimately use one single-partition
    # window, but only over the BOUNDED (<= nparts rows) subtotal
    # aggregate (_ptot), never over row-level data.
    from clickhouse_observability_spark.sources.parquet import load_table

    docs = load_table(spark, sf_small, "documents")
    plan = (
        TX.pack_training_chunks(docs, budget=512)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "windowspecdefinition(_pid" in plan
    # any SinglePartition exchange feeds the bounded offsets frame
    # (grouped by _pid), not corpus rows
    for seg in plan.split("Exchange SinglePartition")[1:]:
        assert "HashAggregate(keys=[_pid" in seg.split("Exchange", 1)[0] or \
               "HashAggregate(keys=[_gkey" in seg.split("Exchange", 1)[0], \
            "single-partition window must sit on the subtotal aggregate"


def test_token_distribution_drift_matches_python(spark):
    import math
    import re
    from collections import Counter

    a_rows = [(0, "the cat sat on the mat"), (1, "a dog and a cat play")]
    b_rows = [(10, "the cat ran to the dog"), (11, "birds fly high above")]
    mk = "doc_id long, text string"
    a = spark.createDataFrame(a_rows, mk)
    b = spark.createDataFrame(b_rows, mk)
    got = TX.token_distribution_drift(a, b).collect()[0]

    def toks(rows):
        c = Counter()
        for _, t in rows:
            c.update(x for x in re.split(r"\s+", t.strip().lower()) if x)
        return c

    ca, cb = toks(a_rows), toks(b_rows)
    vocab = set(ca) | set(cb)
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    pa = {t: (ca.get(t, 0) + 1) / (na + v) for t in vocab}
    pb = {t: (cb.get(t, 0) + 1) / (nb + v) for t in vocab}
    kl_ab = sum(pa[t] * math.log(pa[t] / pb[t]) for t in vocab)
    kl_ba = sum(pb[t] * math.log(pb[t] / pa[t]) for t in vocab)
    js = (sum(pa[t] * math.log(pa[t] / ((pa[t] + pb[t]) / 2)) for t in vocab)
          + sum(pb[t] * math.log(pb[t] / ((pa[t] + pb[t]) / 2)) for t in vocab)) / 2
    assert (got.n_tokens_a, got.n_tokens_b, got.vocab_joint) == (na, nb, v)
    assert got.kl_a_b == pytest.approx(kl_ab, abs=1e-5)
    assert got.kl_b_a == pytest.approx(kl_ba, abs=1e-5)
    assert got.js == pytest.approx(js, abs=1e-5)
    oov_b_mass = sum(n for t, n in ca.items() if t not in cb)
    assert got.oov_frac_b_in_a == pytest.approx(oov_b_mass / na, abs=1e-5)
    # identical corpora -> zero drift
    same = TX.token_distribution_drift(a, a).collect()[0]
    assert same.kl_a_b == same.kl_b_a == same.js == 0.0
    assert same.oov_frac_a_in_b == 0.0


def test_unigram_logprob_ranks_outliers_low(spark):
    rows = [(i, "the cat and the dog in the house") for i in range(8)]
    rows.append((100, "zqx jvw pfk qqq"))  # gibberish: all-rare tokens
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.avg_logprob for r in TX.unigram_logprob(df).collect()}
    common = got[0]
    assert got[100] < common  # outlier scores strictly lower
    assert all(got[i] == common for i in range(8))  # identical docs tie
    # python reference on the same corpus
    import math
    import re
    from collections import Counter

    c = Counter()
    docs = {i: [t for t in re.split(r"\s+", t.strip()) if t] for i, t in rows}
    for ts in docs.values():
        c.update(ts)
    n, v = sum(c.values()), len(c)
    for i, ts in docs.items():
        exp = sum(math.log((c[t] + 1) / (n + v)) for t in ts) / len(ts)
        assert got[i] == pytest.approx(round(exp, 4), abs=2e-4)


def test_pack_grouped_equals_per_group_global_pack(spark, sf_small):
    # per-source packing == running the global packer on each source's
    # sub-corpus independently
    from clickhouse_observability_spark.sources.parquet import load_table

    docs = load_table(spark, sf_small, "documents")
    got = sorted(
        (r.source, r.doc_id, r.chunk_id, r.doc_tok_start, r.chunk_tok_start,
         r.n_toks)
        for r in TX.pack_training_chunks_grouped(
            docs, budget=256, group_by="source").collect()
    )
    exp = []
    for src in [r.source for r in docs.select("source").distinct().collect()]:
        sub = docs.filter(F.col("source") == src)
        for r in TX.pack_training_chunks(sub, budget=256).collect():
            exp.append((src, r.doc_id, r.chunk_id, r.doc_tok_start,
                        r.chunk_tok_start, r.n_toks))
    assert got == sorted(exp)


def test_quality_weighted_sample_nests_and_is_deterministic(spark, sf_small):
    from clickhouse_observability_spark.sources.parquet import load_table

    docs = load_table(spark, sf_small, "documents")
    s1 = {r.doc_id: r.sampled for r in
          TX.quality_weighted_sample(docs, scale=0.5).collect()}
    s2 = {r.doc_id: r.sampled for r in
          TX.quality_weighted_sample(docs, scale=1.0).collect()}
    # raising scale strictly grows the sample (nested acceptance)
    assert all(s2[d] for d, kept in s1.items() if kept)
    assert sum(s2.values()) >= sum(s1.values()) > 0
    # deterministic across runs
    again = {r.doc_id: r.sampled for r in
             TX.quality_weighted_sample(docs, scale=0.5).collect()}
    assert again == s1
    # zero-weight docs (outside length window) never sampled
    w = {r.doc_id: r.weight for r in
         TX.quality_weighted_sample(docs, scale=1.0).collect()}
    assert all(not s2[d] for d, wt in w.items() if wt == 0.0)


def test_training_pipeline_composition_invariants(spark, sf_small):
    from clickhouse_observability_spark.operators import dedup as D
    from clickhouse_observability_spark.registry import queries
    from clickhouse_observability_spark.sources.parquet import load_table

    qs = queries()
    packed = qs["text_training_pipeline"](spark, sf_small).collect()
    assert len(packed) > 0
    packed_ids = {r.doc_id for r in packed}
    # every packed doc survived curation; exactly ONE survivor (the
    # min surviving doc_id) is kept per near-dup component — keeper
    # election runs over the curated-train survivors, so a cluster
    # whose raw-corpus minimum was curated away still keeps its best
    # surviving member
    curated = qs["text_corpus_curation"](spark, sf_small)
    train = {r.doc_id for r in curated.collect() if r.split == "train"}
    assert packed_ids <= train
    docs = load_table(spark, sf_small, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.9)
    comps = {r.doc_id: r.component_id for r in
             D.neardup_components(pairs, a="doc_a", b="doc_b").collect()}
    by_comp = {}
    for d in train:
        by_comp.setdefault(comps.get(d, d), []).append(d)
    expected = {min(ds) for ds in by_comp.values()}
    # r4: the span-removal stage sits between keeper election and
    # packing — survivors whose every token fell inside a duplicated
    # span pack zero chunks, so packed ⊆ keepers with the hollowed
    # docs (clean token count 0) as the only permitted gap
    assert packed_ids <= expected
    keepers = docs.join(
        spark.createDataFrame([(d,) for d in expected], "doc_id long"),
        "doc_id",
        "left_semi",
    )
    spans = D.duplicated_spans(keepers, k=8)
    cleaned = {
        r.doc_id: r.clean_text
        for r in D.remove_duplicated_spans(keepers, spans).collect()
    }
    hollow = {d for d, t in cleaned.items() if not t.strip()}
    assert packed_ids == expected - hollow
    # packed token budget per doc equals its CLEANED token count
    from collections import Counter

    per_doc = Counter()
    for r in packed:
        per_doc[r.doc_id] += r.n_toks
    for d, total in per_doc.items():
        assert total == len([t for t in cleaned[d].split(" ") if t]), d
    # chunk stream well-formed: full chunks except the last
    fill = {}
    for r in packed:
        fill[r.chunk_id] = fill.get(r.chunk_id, 0) + r.n_toks
    last = max(fill)
    assert all(v == 512 for k, v in fill.items() if k != last)


def test_pack_grouped_null_group_spanning_partitions(spark):
    # regression: NULL group values must get a real offset-map key —
    # concat_ws silently drops NULL columns, which previously reset
    # every NULL-group partition's cumsum to zero
    rows = [(i, "tok " * 20, None if i % 2 else "src") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = TX.pack_training_chunks_grouped(df, budget=64, group_by="source")
    rows_out = out.collect()
    null_rows = [r for r in rows_out if r.source is None]
    assert null_rows
    # token conservation + non-overlapping spans within the NULL group
    fill = {}
    for r in null_rows:
        fill[r.chunk_id] = fill.get(r.chunk_id, 0) + r.n_toks
    last = max(fill)
    assert all(v == 64 for k, v in fill.items() if k != last)
    assert sum(fill.values()) == 200 * 20  # every NULL-group token once


def test_chunk_documents_overlap_matches_reference(spark):
    # sliding-window chunking: python reference + coverage invariants
    import re

    rows = [
        (0, " ".join(f"t{i}" for i in range(57))),   # 3 windows
        (1, " ".join(f"t{i}" for i in range(32))),   # exactly budget
        (2, " ".join(f"t{i}" for i in range(33))),   # budget + 1
        (3, "one two"),                               # short doc
        (4, ""),                                      # empty: drops out
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.chunk_id, r.doc_tok_start, r.chunk_tok_start, r.n_toks)
        for r in TX.chunk_documents_overlap(df, budget=32, stride=24).collect()
    )
    exp = []
    for doc_id, text in rows:
        n = len([t for t in re.split(r"\s+", text.strip().lower()) if t])
        if not n:
            continue
        n_chunks = 1 if n <= 32 else -(-(n - 32) // 24) + 1
        for i in range(n_chunks):
            exp.append((doc_id, i, i * 24, 0, min(n, i * 24 + 32) - i * 24))
    assert got == sorted(exp)
    # invariants: every window non-empty, last window reaches doc end,
    # interior windows are full-budget so consecutive windows overlap
    # by exactly budget - stride tokens
    per_doc = {}
    for d, i, s, _, k in got:
        assert k > 0
        per_doc.setdefault(d, []).append((i, s, k))
    for d, ws in per_doc.items():
        ws.sort()
        n = max(s + k for _, s, k in ws)
        assert ws[-1][1] + ws[-1][2] == n
        for (i1, s1, k1), (i2, s2, k2) in zip(ws, ws[1:]):
            assert s2 == s1 + 24  # stride
            assert k1 == 32  # interior windows carry the full budget
            assert s1 + k1 - s2 == 8  # overlap = budget - stride


def test_chunk_documents_overlap_rejects_bad_stride(spark):
    import pytest

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        TX.chunk_documents_overlap(df, budget=8, stride=0)
    with pytest.raises(ValueError):
        TX.chunk_documents_overlap(df, budget=8, stride=9)


def test_epoch_shard_plan_invariants(spark):
    rows = [(i, f"doc {i} " + "tok " * (3 + i % 7)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = TX.pack_training_chunks(df, budget=16)
    n_chunks = chunks.count()
    plan = TX.epoch_shard_plan(chunks, n_epochs=3, n_shards=4).collect()
    # every chunk exactly once per epoch
    assert len(plan) == 3 * n_chunks
    per_epoch = {}
    for r in plan:
        per_epoch.setdefault(r.epoch, []).append(r)
    key = lambda r: (r.doc_id, r.chunk_id)
    base_keys = sorted(key(r) for r in per_epoch[0])
    for e, rs in per_epoch.items():
        assert sorted(key(r) for r in rs) == base_keys
        # positions contiguous 0..n-1 within each shard
        by_shard = {}
        for r in rs:
            by_shard.setdefault(r.shard, []).append(r.position)
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(len(ps))), (e, shard)
    # different epochs produce different orders (and shard maps)
    order = lambda e: [key(r) for r in sorted(per_epoch[e],
                                              key=lambda r: (r.shard, r.position))]
    assert order(0) != order(1) and order(1) != order(2)
    # deterministic across calls
    again = TX.epoch_shard_plan(chunks, n_epochs=3, n_shards=4).collect()
    assert sorted(map(tuple, plan)) == sorted(map(tuple, again))


def test_epoch_shards_oracle_matches_duckdb(spark, sf_small):
    import duckdb

    from clickhouse_observability_spark.registry import oracle_sql, queries

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_small}/documents.parquet'"
    )
    for name in ("text_epoch_shards", "text_shard_manifest",
                 "text_bm25_search"):
        sdf = queries()[name](spark, sf_small)
        cols = sdf.columns
        got = sorted(tuple(r[c] for c in cols) for r in sdf.collect())
        ores = con.execute(oracle_sql()[name]).fetchall()
        ocols = [d[0] for d in con.execute(oracle_sql()[name]).description]
        idx = [ocols.index(c) for c in cols]
        exp = sorted(tuple(r[i] for i in idx) for r in ores)
        assert got == exp, name


def test_pack_chunks_bpe_conserves_pieces(spark):
    rows = [(i, ("lowest newest widest " * (i + 1)).strip()) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = TX.bpe_learn(docs, n_merges=6)
    seg = {r.doc_id: r.n_bpe_pieces for r in TX.bpe_segment(docs, merges).collect()}
    counts = TX.bpe_segment(docs, merges).selectExpr(
        "doc_id", "n_bpe_pieces AS n_tokens"
    ).filter("n_tokens > 0")
    packed = TX.pack_training_chunks(docs, budget=7, counts=counts).collect()
    # token conservation: every doc's chunks cover exactly its pieces
    per_doc = {}
    for r in packed:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_toks
    assert per_doc == {k: v for k, v in seg.items() if v > 0}
    # the stream is contiguous: chunk fills sum to the corpus total
    total = sum(seg.values())
    by_chunk = {}
    for r in packed:
        by_chunk[r.chunk_id] = by_chunk.get(r.chunk_id, 0) + r.n_toks
    assert sum(by_chunk.values()) == total
    full, last = divmod(total, 7)
    for cid, fill in by_chunk.items():
        assert fill == (7 if cid < full else last), (cid, fill)


def test_shard_manifest_detects_any_layout_change(spark):
    import pyspark.sql.functions as F

    rows = [(i, "tok " * (4 + i % 5)) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = TX.pack_training_chunks(docs, budget=8)
    plan = TX.epoch_shard_plan(chunks, n_epochs=2, n_shards=3)
    m1 = {(r.epoch, r.shard): (r.n_chunks, r.n_toks, r.content_md5)
          for r in TX.shard_manifest(plan).collect()}
    # stable across calls
    m2 = {(r.epoch, r.shard): (r.n_chunks, r.n_toks, r.content_md5)
          for r in TX.shard_manifest(plan).collect()}
    assert m1 == m2
    # totals conserve the packed corpus per epoch
    total = sum(r.n_toks for r in chunks.collect())
    for e in (0, 1):
        assert sum(v[1] for k, v in m1.items() if k[0] == e) == total
    # tampering with ONE chunk's length flips exactly the digests of
    # the shards holding it (per epoch), nothing else
    tampered = plan.withColumn(
        "n_toks",
        F.when(F.col("doc_id") == 7, F.col("n_toks") + 1)
        .otherwise(F.col("n_toks")),
    )
    m3 = {(r.epoch, r.shard): v
          for r in TX.shard_manifest(tampered).collect()
          for v in [(r.n_chunks, r.n_toks, r.content_md5)]}
    hit_shards = {(r.epoch, r.shard)
                  for r in plan.filter(F.col("doc_id") == 7).collect()}
    assert hit_shards
    for k in m1:
        if k in hit_shards:
            assert m3[k][2] != m1[k][2], k
        else:
            assert m3[k] == m1[k], k


def test_bm25_matches_hand_computation(spark):
    import math

    docs = [
        (0, "cat dog"),
        (1, "cat cat cat fish"),
        (2, "dog dog bird"),
        (3, "fish"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.rank, r.bm25)
           for r in TX.bm25_search(df, ["cat"], k1=1.2, b=0.75).collect()}

    toks = {i: t.split() for i, t in docs}
    N, avgdl = 4, sum(len(t) for t in toks.values()) / 4
    dfreq = sum(1 for t in toks.values() if "cat" in t)
    idf = math.log(1 + (N - dfreq + 0.5) / (dfreq + 0.5))
    exp = {}
    for i, t in toks.items():
        tf = t.count("cat")
        if tf:
            s = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(t) / avgdl))
            exp[i] = round(s, 6)
    order = sorted(exp, key=lambda i: (-exp[i], i))
    assert set(got) == set(exp)
    for rank, i in enumerate(order, 1):
        assert got[i] == (rank, exp[i]), i


def test_dataset_card_internally_consistent(spark, sf_small):
    from clickhouse_observability_spark.registry import queries

    rows = queries()["text_dataset_card"](spark, sf_small).collect()
    by = {}
    for r in rows:
        by.setdefault(r.section, {})[r.key] = (r.n, r.frac)
    n_docs = by["corpus"]["docs"][0]
    assert n_docs > 0 and by["corpus"]["docs"][1] == 1.0
    assert by["corpus"]["tokens"][0] > n_docs  # multi-token docs
    for dim in ("lang", "source"):
        assert sum(n for n, _ in by[dim].values()) == n_docs
        assert abs(sum(f for _, f in by[dim].values()) - 1.0) < 1e-4
    qn, qf = by["quality"]["passes"]
    assert 0 < qn <= n_docs and abs(qf - qn / n_docs) < 1e-6
    kn, kf = by["dedup"]["exact_keepers"]
    assert 0 < kn <= n_docs and abs(kf - kn / n_docs) < 1e-6


def test_chunk_documents_windowing_contract(spark):
    """chunk_documents: every token covered, consecutive chunks share
    exactly `overlap` tokens (except a short tail), the final chunk
    always contributes new tokens, short docs yield one chunk and
    empty docs none."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(40))),  # 2 chunks
            (2, " ".join(f"u{i}" for i in range(32))),  # exactly one
            (3, " ".join(f"v{i}" for i in range(33))),  # short tail
            (4, "solo"),                                # tiny doc
            (5, "   "),                                 # empty -> none
        ],
        "doc_id long, text string",
    )
    out = TX.chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)
    rows = {r.doc_id: [] for r in out.collect()}
    for r in out.collect():
        rows[r.doc_id].append(r)
    assert set(rows) == {1, 2, 3, 4}  # empty doc produced no chunks
    for did, n_toks in ((1, 40), (2, 32), (3, 33)):
        chs = sorted(rows[did], key=lambda r: r.chunk_id)
        # stride 24, chunk ids dense from 0
        assert [c.chunk_id for c in chs] == list(range(len(chs)))
        assert [c.start_token for c in chs] == [
            i * 24 for i in range(len(chs))]
        # coverage: union of [start, start+n) is exactly [0, n_toks)
        covered = set()
        for c in chs:
            covered |= set(range(c.start_token, c.start_token + c.n_tokens))
        assert covered == set(range(n_toks)), did
        # overlap: consecutive full chunks share 8 tokens
        if len(chs) >= 2:
            assert chs[0].n_tokens == 32
            shared = (chs[0].start_token + chs[0].n_tokens
                      - chs[1].start_token)
            assert shared == 8 or chs[1].n_tokens < 32
            # the tail chunk contributes NEW tokens
            assert (chs[-1].start_token + chs[-1].n_tokens
                    > chs[-2].start_token + chs[-2].n_tokens)
    assert rows[4][0].n_tokens == 1 and rows[4][0].chunk_text == "solo"
    # chunk text round-trips the token slice
    c1 = sorted(rows[1], key=lambda r: r.chunk_id)[1]
    assert c1.chunk_text.split(" ") == [f"t{i}" for i in range(24, 40)]
    with pytest.raises(ValueError, match="overlap"):
        TX.chunk_documents(docs, chunk_tokens=8, overlap_tokens=8)


def test_chunked_bm25_finds_deep_term(spark):
    """The chunked-retrieval composition retrieves a term buried deep
    in a LONG document — the failure mode of whole-doc retrieval where
    the doc-level tf drowns in |d|/avgdl normalization; at chunk grain
    the hit is local and the provenance (doc, token offset) points at
    the right window."""
    filler = " ".join(f"w{i}" for i in range(500))
    needle_doc = filler + " magicterm " + " ".join(
        f"z{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, needle_doc)] + [
            (i, " ".join(f"w{j}" for j in range(80)))
            for i in range(2, 8)
        ],
        "doc_id long, text string",
    )
    chunks = TX.chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)
    keyed = chunks.select(
        F.concat_ws("#", "doc_id", "start_token").alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    hits = TX.bm25_search(keyed, ["magicterm"], top_n=3).collect()
    assert hits and hits[0].rank == 1
    src, start = hits[0].doc_id.split("#")
    assert int(src) == 1
    # the winning chunk's window actually contains the needle (token
    # index 500) — offset provenance is real
    assert int(start) <= 500 < int(start) + 32


def test_chunk_documents_property(spark):
    """Hypothesis: for random texts and (chunk, overlap) params, the
    distributed chunker equals a direct python model of the windowing
    contract — starts at i*stride, n_chunks = max(1, ceil((n-overlap)
    / stride)), slices clamped, empty docs dropped."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        texts=st.lists(
            st.text(alphabet="ab \t", min_size=0, max_size=120),
            min_size=1, max_size=6),
        chunk=st.integers(min_value=2, max_value=12),
        overlap=st.integers(min_value=0, max_value=11),
    )
    def prop(texts, chunk, overlap):
        if overlap >= chunk:
            return
        stride = chunk - overlap
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string")
        got = sorted(
            (r.doc_id, r.chunk_id, r.start_token, r.n_tokens,
             r.chunk_text)
            for r in TX.chunk_documents(
                docs, chunk_tokens=chunk, overlap_tokens=overlap
            ).collect())
        want = []
        for did, text in enumerate(texts):
            toks = [t for t in text.strip().lower().split() if t]
            n = len(toks)
            if n == 0:
                continue
            n_chunks = max(1, math.ceil((n - overlap) / stride))
            for i in range(n_chunks):
                s = i * stride
                sl = toks[s:s + chunk]
                want.append((did, i, s, len(sl), " ".join(sl)))
        assert got == sorted(want)

    prop()


def test_weighted_sample_topk_matches_python_aes(spark, sf_small):
    """A-ES exact-k weighted sampling vs a pure-Python model: the
    same md5 uniforms, the same -ln(u)/w keys, the same (rounded key,
    doc_id) order — the selected SET and every key must agree. Also
    pins the invariants: exactly k rows, no zero-weight doc sampled,
    deterministic across calls."""
    import hashlib
    import math as _m

    from clickhouse_observability_spark.operators import (
        text_analysis as TX,
    )
    from clickhouse_observability_spark.sources.parquet import load_table

    docs = load_table(spark, sf_small, "documents")
    k = 50
    got = TX.weighted_sample_without_replacement(docs, k=k).collect()
    assert len(got) == k
    assert all(r.weight > 0 for r in got)

    # python model over the same corpus
    sw = {"the", "a", "of", "and", "to", "in", "is"}
    keys = []
    for r in docs.select("doc_id", "text").collect():
        toks = [t for t in r.text.split() if t]
        n = len(toks)
        w = 0.0
        if 5 <= n <= 100000:
            ns = sum(1 for t in toks if t.lower() in sw)
            w = min(1.0, round(min(1.0, ns * 2.0 / n), 6))
        if w <= 0:
            continue
        frac = int(hashlib.md5(str(r.doc_id).encode())
                   .hexdigest()[:6], 16)
        u = (frac + 1) / 16777216.0
        keys.append((round(-_m.log(u) / w, 6), r.doc_id, w))
    keys.sort()
    want = {(d, w, key) for key, d, w in keys[:k]}
    assert {(r.doc_id, r.weight, r.es_key) for r in got} == want
    # deterministic: a second run selects the identical set
    again = TX.weighted_sample_without_replacement(docs, k=k).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in got}


def test_bloom_contamination_matches_exact(spark, sf_small):
    """The Bloom-prefiltered sweep is OUTPUT-IDENTICAL to the exact
    blocklist join on real corpus data — the filter only prunes join
    input (no false negatives by construction); survivors confirm
    against the exact gram set. Tiny m stresses the high-FPR regime:
    correctness must not depend on the filter's precision."""
    from clickhouse_observability_spark.sources.parquet import load_table

    docs = load_table(spark, sf_small, "documents")
    from pyspark.sql import functions as F

    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = docs.select("doc_id", "text", F.when(bucket < "20", "val")
                        .otherwise("train").alias("split"))
    train = split.filter(F.col("split") == "train")
    bench = split.filter(F.col("split") == "val")
    exact = {r.train_id: r.n_shared for r in
             TX.contamination_hits(train, bench, n=6).collect()}
    for m_bits in (1 << 10, 1 << 16):  # saturated and roomy filters
        got = {r.train_id: r.n_shared for r in
               TX.bloom_contamination_hits(
                   train, bench, n=6, m_bits=m_bits, k=4).collect()}
        assert got == exact


def test_bloom_prefilter_actually_prunes(spark):
    """With a roomy filter, non-benchmark grams are dropped BEFORE the
    confirm join: the planted disjoint doc contributes zero surviving
    grams (probabilistic but overwhelming: 9 grams x FPR ~1e-9 at
    m=2^20, k=4 over ~8 set bits... flake-free in practice)."""
    mk = "doc_id long, text string"
    train = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta iota"),
         (2, "totally unrelated words with no benchmark overlap at all")],
        mk)
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta kappa")], mk)
    got = {r.train_id: r.n_shared for r in
           TX.bloom_contamination_hits(
               train, bench, n=8, m_bits=1 << 20, k=4).collect()}
    assert got == {0: 1}


def test_bigram_logprob_backoff_arithmetic(spark):
    """Hand-computed Stupid Backoff: seen bigram = ln(c(prev cur) /
    c(prev)); unseen bigram between in-vocab tokens = ln(0.4) +
    ln((c(cur)+1)/(N+V)); OOV cur = ln(0.4) + ln(1/(N+V))."""
    import math

    mk = "doc_id long, text string"
    # model corpus: tokens a a b -> c(a)=2, c(b)=1, N=3, V=2, NV=5
    # bigrams: (a,a)=1, (a,b)=1
    model = spark.createDataFrame([(0, "a a b")], mk)
    # score doc: "a b a z" -> bigrams (a,b) seen, (b,a) unseen
    # in-vocab, (a,z) OOV cur
    score = spark.createDataFrame([(10, "a b a z")], mk)
    rows = {r.doc_id: (r.n_bigrams, r.avg_logprob) for r in
            TX.bigram_logprob(model, score, alpha=0.4).collect()}
    lp_ab = math.log(1 / 2)                       # c(a,b)/c(a)
    lp_ba = math.log(0.4) + math.log((2 + 1) / 5)  # backoff to c(a)=2
    lp_az = math.log(0.4) + math.log(1 / 5)        # OOV: 1/(N+V)
    want = round((lp_ab + lp_ba + lp_az) / 3, 4)
    assert rows == {10: (3, want)}
