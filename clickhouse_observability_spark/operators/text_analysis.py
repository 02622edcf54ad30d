"""EXT text-analysis operators over `documents` (north-star surface).

Language-ID, quality scoring, token stats, fingerprinting — all pure
pyspark.sql.functions (JVM-side, whole-stage codegen; zero Python
UDFs). Each has an exactly-equivalent ANSI-SQL formulation so the
DuckDB oracle can hash-match: ratios are integer/integer divisions
(bit-identical across engines) and hashes are md5 hex strings.

At 100 TB these are embarrassingly parallel map-only operators — no
shuffle at all; they scale with scan bandwidth.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword lists for the language-ID heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
    "es": ("el", "los", "las", "y", "es", "un", "en"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, empty strings dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def normalized_text(col: Column | str) -> Column:
    """Canonical form: trimmed, lowercased, whitespace collapsed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def fingerprint_md5(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (md5 emits
    identical lowercase hex in Spark and DuckDB)."""
    return F.md5(normalized_text(col))


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token statistics (token counting for training-data
    budgeting: whitespace tokens ~ BPE tokens × constant)."""
    toks = tokens("text")
    n_tokens = F.size(toks)
    n_nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        # NULL (not ANSI DIVIDE_BY_ZERO) for zero-token docs, like the
        # other ratio columns in this module
        F.round(F.when(n_tokens > 0, n_nonspace / n_tokens), 4).alias(
            "avg_token_len"
        ),
    )


def quality_pass_col() -> Column:
    """The passes_quality predicate as a reusable Column (map-only —
    pipelines inline it instead of semi-joining a score table)."""
    n_tokens = F.size(tokens("text"))
    # Zero-token docs: NULL avg_len (never a divide-by-zero under ANSI
    # mode); false & NULL = false, so empty docs fail quality cleanly.
    avg_len = F.when(
        n_tokens > 0,
        F.length(F.regexp_replace(F.col("text"), r"\s", "")) / n_tokens,
    )
    return (
        (n_tokens >= 5)
        & (n_tokens <= 100000)
        & (avg_len >= 2)
        & (avg_len <= 15)
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality signals: length bounds, token shape, stopword
    density, digit density — the standard pre-training filters."""
    toks = tokens("text")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    sw = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    n_digits = F.length(F.regexp_replace(F.col("text"), r"[^0-9]", ""))
    # NULL ratios (not divide-by-zero / NaN) for empty docs — mirrors
    # the oracle's NULLIF-guarded denominators so hashes stay parity.
    return documents.select(
        "doc_id",
        F.round(F.when(n_tokens > 0, n_stop / n_tokens), 4).alias("stopword_ratio"),
        F.round(F.when(n_chars > 0, n_digits / n_chars), 4).alias("digit_ratio"),
        quality_pass_col().alias("passes_quality"),
    )


# Let-bound lang scoring: the tokenization and the four stopword-hit
# counts are each evaluated ONCE per row via the single-element
# transform(array(...), var -> ...) binding (same trap as winnowing:
# plain Column composition duplicates the whole higher-order subtree
# into every consumer — 8 tokenizations per row in the old form, and a
# correspondingly large tree for Catalyst to analyze + codegen; the
# let-bound form measured 2x faster warm and 3.4x on first run at
# sf0.1).
def _lang_struct_sql() -> str:
    fields = []
    for lang, words in LANG_STOPWORDS.items():
        inlist = ", ".join("'" + w + "'" for w in words)
        fields.append(f"'{lang}', size(filter(toks, t -> t IN ({inlist})))")
    return "named_struct(" + ", ".join(fields) + ")"


# verdict CASE over the bound score struct `s` — written identically
# in the DuckDB oracle (queries/text.py), so keep the chains in sync.
_LANG_CASE_SQL = """CASE
    WHEN s.en = 0 AND s.de = 0 AND s.fr = 0 AND s.es = 0 THEN 'und'
    WHEN s.en >= s.de AND s.en >= s.fr AND s.en >= s.es THEN 'en'
    WHEN s.de >= s.fr AND s.de >= s.es THEN 'de'
    WHEN s.fr >= s.es THEN 'fr'
    ELSE 'es' END"""


def _lang_summary(out_fields_sql: str) -> Column:
    return F.expr(
        f"""transform(array(filter(split(lower(text), '\\\\s+'), t -> t != '')),
              toks -> transform(array({_lang_struct_sql()}),
                s -> named_struct({out_fields_sql})))[0][0]"""
    )


def lang_pred_col() -> Column:
    """The lang-ID verdict as a reusable Column (map-only)."""
    return _lang_summary(f"'lang_pred', {_LANG_CASE_SQL}").getField("lang_pred")


def lang_id(documents: DataFrame) -> DataFrame:
    """N-gram-free language ID: stopword-hit counts per language,
    deterministic argmax with fixed priority en>de>fr>es, 'und' when
    nothing matches. Pure expression — identical CASE chain runs in
    the oracle."""
    out = (
        "'score_en', s.en, 'score_de', s.de, 'score_fr', s.fr, "
        f"'score_es', s.es, 'lang_pred', {_LANG_CASE_SQL}"
    )
    return documents.select("doc_id", _lang_summary(out).alias("r")).select(
        "doc_id", "r.*"
    )


# BPE-ish pre-tokenization: word pieces OR single non-space symbols —
# the standard byte-pair pre-split (\w+ runs and isolated punctuation).
# Double-backslashed for embedding in SQL string literals.
_BPE_SPLIT_SQL = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"

# SQL fragment mirror of normalized_text for expr-string contexts.
_NORM_SQL = r"lower(regexp_replace(trim(text), '\\s+', ' '))"


def bpe_token_counts(documents: DataFrame) -> DataFrame:
    """Token counting for training budgets: whitespace tokens plus a
    BPE-ish regex pre-tokenization count (regexp_extract_all — pure
    JVM). Ratio of the two approximates subword inflation."""
    ws = F.size(tokens("text"))
    bpe = F.size(F.expr(f"regexp_extract_all(text, '{_BPE_SPLIT_SQL}', 0)"))
    return documents.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(F.when(ws > 0, bpe / ws), 4).alias("inflation"),
    )


def token_budget_stats(documents: DataFrame) -> DataFrame:
    """token_stats + bpe_token_counts as ONE single-pass projection —
    the per-doc token-budget panel. Merged so both stat families share
    a registry slot without a self-join (two separate frames joined on
    doc_id would scan the corpus twice and shuffle; this is map-only)."""
    toks = tokens("text")
    n_tokens = F.size(toks)
    n_nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    bpe = F.size(F.expr(f"regexp_extract_all(text, '{_BPE_SPLIT_SQL}', 0)"))
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(F.when(n_tokens > 0, n_nonspace / n_tokens), 4).alias("avg_token_len"),
        bpe.alias("bpe_tokens"),
        F.round(F.when(n_tokens > 0, bpe / n_tokens), 4).alias("inflation"),
    )


def winnowing_fingerprints(
    documents: DataFrame, k: int = 5, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al.): hash every
    k-gram of the normalized text, take the min hash of each sliding
    window of `window` consecutive k-grams, keep the distinct mins.

    Entirely per-doc array math — grams, window-mins, distinct and
    count all happen inside one projection, so the operator is
    MAP-ONLY: no explode, no window shuffle, no aggregation. (The
    explode + window-frame formulation this replaced shuffled ~|text|
    rows per doc AND tripped Spark's generator codegen into
    re-evaluating the gram array per emitted element — 0.4s vs 50s at
    sf0.1.) md5 hex strings compare lexicographically the same
    everywhere, so the DuckDB oracle can mirror the semantics with its
    own window formulation. Output: per doc with >= 1 fingerprint, the
    fingerprint count and the smallest fingerprint (stable digest of
    the selected set).
    """
    # sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty —
    # short docs must be guarded to an empty gram array explicitly.
    # `norm` and `gs` are let-bound via single-element
    # transform(array(expr), var -> ...): referencing the raw
    # expressions inside a nested lambda makes CollapseProject inline
    # and re-evaluate them PER ELEMENT (O(|text|^2) regexp calls per
    # doc — measured as a hang at sf0.1); a lambda variable is bound
    # once per row.
    # Compute-heavy map stage: ~|text| md5 + window-min evaluations
    # per doc. A small-file corpus (testdata: ONE parquet row group)
    # scans as a single task, serializing all that arithmetic; re-
    # spread it when the input has fewer partitions than the cluster
    # has slots. At real scale the corpus arrives in many files and
    # this is a no-op — no shuffle added.
    documents = respread_for_compute(documents)
    # 0/1-element explode: Generate evaluates the whole chain once per
    # row (a plain filter+select over the alias would re-evaluate it
    # per reference after CollapseProject) and drops too-short docs.
    return documents.select(
        "doc_id", F.explode(winnow_summary_expr(k, window)).alias("r")
    ).select("doc_id", "r.n_fingerprints", "r.min_fp")


def respread_for_compute(documents: DataFrame) -> DataFrame:
    """Re-spread a small-file scan across the cluster's slots for a
    compute-heavy map stage (~|text| md5/window-min evaluations per
    doc): a one-row-group corpus scans as a single task, serializing
    all that arithmetic. At real scale the corpus arrives in many
    files and this is a no-op — no shuffle added."""
    sc = documents.sparkSession.sparkContext
    slots = sc.defaultParallelism
    if documents.rdd.getNumPartitions() < max(2, slots // 2):
        documents = documents.repartition(slots)
    return documents


def winnow_summary_expr(k: int, window: int, keep_all: bool = False) -> Column:
    """The winnowing per-doc summary as a 0/1-element struct-array
    Column (explode it so Generate evaluates the chain exactly once
    per row). With keep_all=True, docs too short to yield a
    fingerprint emit a NULL-fields struct instead of an empty array —
    the fused fingerprint-panel form, where the LEFT-join semantics
    of the standalone operator are inlined as nullable columns."""
    empty = (
        f"array(named_struct('n_fingerprints', CAST(NULL AS bigint), "
        f"'min_fp', CAST(NULL AS string)))"
        if keep_all
        else "array()"
    )
    return F.expr(
        f"""flatten(transform(array({_NORM_SQL}), norm ->
            flatten(transform(array(CASE WHEN length(norm) >= {k} THEN
                transform(sequence(1, length(norm) - {k} + 1),
                          i -> md5(substring(norm, i, {k})))
                ELSE array() END), gs ->
              flatten(transform(array(CASE WHEN size(gs) >= {window} THEN
                  transform(sequence({window - 1}, size(gs) - 1),
                            p -> array_min(slice(gs, p - {window} + 2, {window})))
                ELSE array() END), fps ->
                CASE WHEN size(fps) > 0 THEN
                  array(named_struct(
                      'n_fingerprints', cast(size(array_distinct(fps)) AS bigint),
                      'min_fp', array_min(fps)))
                ELSE {empty} END))))))"""
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """md5 doc fingerprint + sorted-token-set fingerprint (the
    bag-of-words identity used by exact-after-normalization dedup)."""
    tok_sorted = F.array_sort(F.array_distinct(tokens(normalized_text("text"))))
    return documents.select(
        "doc_id",
        fingerprint_md5("text").alias("fp_md5"),
        F.md5(F.concat_ws(" ", tok_sorted)).alias("fp_tokenset"),
    )


def word_ngrams(n: int, distinct: bool = True) -> Column:
    """Word n-grams of the normalized text (empty array for docs
    shorter than n tokens); distinct by default.

    The tokenizer is LET-BOUND via transform(array(toks), tk -> ...)
    so it evaluates once per row — referencing the `toks` Column
    object in the gram/size/guard subtrees duplicated the
    normalize+split work 3x per row (the r10 CSE class; Spark does
    not eliminate repeated subtrees within a projection)."""
    toks = tokens(normalized_text("text"))

    def build(tk: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(tk) - n),
            lambda i: F.concat_ws(" ", F.slice(tk, i + 1, n)),
        )
        # sequence(0, -k) is DESCENDING, not empty — guard short docs
        g = F.when(F.size(tk) >= n, grams).otherwise(F.array())
        return F.array_distinct(g) if distinct else g

    return F.element_at(F.transform(F.array(toks), build), 1)


def _doc_gram_hashes(df: DataFrame, n: int) -> DataFrame:
    """(doc_id, gh): distinct word n-grams as 8-byte xxhash64 of the
    token SLICE — the gram string is never materialized (concat_ws
    over 5M slices measured 7× slower than hashing them at sf0.1),
    and the downstream distinct/broadcast/join all run on longs.
    Gram-hash equality stands in for gram equality (64-bit collisions
    are ~1e-9 at billions of grams)."""
    t = respread_for_compute(df).select(
        "doc_id", tokens(normalized_text("text")).alias("toks")
    ).filter(F.size("toks") >= n)
    hv = F.expr(
        f"array_distinct(transform(sequence(0, size(toks) - {n}), "
        f"i -> xxhash64(slice(toks, i + 1, {n}))))"
    )
    return t.select("doc_id", F.explode(hv).alias("gh"))


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(train_id, bench_id, n_shared): training docs sharing >= 1
    distinct word n-gram with a benchmark doc — the decontamination
    sweep a training mix runs before finalizing (n-gram overlap is the
    standard eval-leakage test; 8-13 grams in published pipelines).

    Inverted-index join on the n-gram, never all-pairs: only docs that
    actually share a gram meet, and n_shared falls out of the
    per-pair count. At 100 TB the benchmark side is an eval suite —
    thousands of docs against billions — so its exploded grams
    broadcast and the sweep is one map-side join over the corpus scan,
    no shuffle of the training side. Both sides expect (doc_id, text).
    """
    tg = train.select(
        F.col("doc_id").alias("train_id"), F.explode(word_ngrams(n)).alias("gram")
    )
    bg = bench.select(
        F.col("doc_id").alias("bench_id"), F.explode(word_ngrams(n)).alias("gram")
    )
    if broadcast_bench:
        bg = F.broadcast(bg)
    return (
        tg.join(bg, "gram")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def contamination_hits(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    broadcast_bench: bool = True,
    max_df: int | None = None,
) -> DataFrame:
    """(train_id, n_shared): how many of each training doc's distinct
    word n-grams appear ANYWHERE in the benchmark corpus — the scale
    form of the decontamination sweep. The benchmark side collapses to
    a DISTINCT gram blocklist before the join, so fan-out is bounded
    by the training side's own gram count: a doc duplicated t× in
    train and v× in the benchmark contributes t join rows, never t×v
    (the per-pair form blows up quadratically inside dup groups).
    Gram identity is the hashed token slice (_doc_gram_hashes) — no
    gram strings anywhere in the plan. Use contamination_pairs when
    per-benchmark-doc attribution is actually needed.

    `max_df` drops grams appearing in more than that many TRAIN docs
    before the join — the frequent-shingle cap for hostile corpora:
    a boilerplate gram shared by millions of train docs contributes
    millions of join rows while carrying no leakage signal."""
    tg = _doc_gram_hashes(train, n).withColumnRenamed("doc_id", "train_id")
    if max_df is not None:
        rare = (
            tg.groupBy("gh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("gh")
        )
        tg = tg.join(rare, "gh")
    bg = _doc_gram_hashes(bench, n).select("gh").distinct()
    if broadcast_bench:
        bg = F.broadcast(bg)
    return (
        tg.join(bg, "gh")
        .groupBy("train_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def _bloom_positions(k: int, m_bits: int) -> str:
    """SQL fragment: the k Bloom bit positions of gram hash `gh` —
    double hashing via Spark's multi-arg xxhash64(gh, i). MUST be
    textually identical on the build and probe sides (a drifted
    expression silently turns the no-false-negative guarantee off)."""
    return (f"transform(sequence(0, {k - 1}), "
            f"i -> pmod(xxhash64(gh, i), {m_bits}))")


def bloom_contamination_hits(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """(train_id, n_shared): EXACTLY `contamination_hits`, computed
    through a Bloom-filter prefilter — the shape that survives a
    benchmark set too large to broadcast as a join table but fine as
    bits (a 1e8-gram eval suite is ~3 GB as distinct 8-byte hashes vs
    128 MB as a 1e9-bit filter at ~1% FPR).

    Stage 1 BUILD (distributed, bounded collect): benchmark grams ->
    k bit positions each (double hashing over the gram's xxhash64) ->
    partial bit_or per 64-bit word -> collect ≤ m_bits/64 longs.
    Stage 2 PROBE (map-only): every train gram tests its k bits
    against the broadcast word array entirely in JVM expressions — a
    gram with any unset bit is PROVABLY absent from the benchmark
    (no false negatives), so the survivors are a superset of the true
    hits. Stage 3 CONFIRM: survivors — now a small fraction of the
    corpus's grams — join the exact distinct benchmark gram set, so
    the output is EXACT; the Bloom filter only prunes join input,
    never decides membership. False-positive rate for sizing:
    (1 - e^(-k·g/m))^k with g benchmark grams.
    """
    # -- build: one distributed aggregation, collect ≤ m_bits/64 rows
    words = (
        _doc_gram_hashes(bench, n)
        .select(F.explode(F.expr(_bloom_positions(k, m_bits)))
                .alias("pos"))
        .select(
            F.expr("CAST(pos DIV 64 AS INT)").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), "
                   "CAST(pmod(pos, 64) AS INT))").alias("b"),
        )
        .groupBy("w").agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    table = [0] * (m_bits // 64)
    for r in words:
        table[r.w] = r.bits
    spark = train.sparkSession
    bloom = spark.createDataFrame(
        [(table,)], "bloom array<bigint>").withColumn("__k", F.lit(1))

    # -- probe: map-only JVM bit tests against the broadcast array
    tg = (
        _doc_gram_hashes(train, n)
        .withColumnRenamed("doc_id", "train_id")
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(bloom), "__k")
        .filter(F.expr(
            f"forall({_bloom_positions(k, m_bits)}, "
            "p -> (shiftright(bloom[CAST(p DIV 64 AS INT)], "
            "CAST(pmod(p, 64) AS INT)) & 1) = 1)"))
        .select("train_id", "gh")
    )
    # -- confirm: exact join over the pruned survivor set
    bg = F.broadcast(_doc_gram_hashes(bench, n).select("gh").distinct())
    return (
        tg.join(bg, "gh")
        .groupBy("train_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


# PII patterns in the Java-regex/RE2 common dialect (no lookaround, no
# backrefs) so Spark and the DuckDB oracle compile them identically.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}",
}


def pii_scrub(documents: DataFrame, denylist: list[str] | None = None) -> DataFrame:
    """(doc_id, clean_text, n_email, n_ipv4, n_phone[, n_denylist]):
    per-doc PII counts (measured on the ORIGINAL text) and the
    redacted text with each match class replaced by its placeholder.

    Map-only JVM regexps — no shuffle, no Python; scales with scan
    bandwidth. Replacement order (email -> ipv4 -> phone -> denylist)
    is fixed so results are deterministic under overlapping patterns.
    `denylist` terms are scrubbed on word boundaries to <TERM>.
    """
    text = F.col("text")
    counts = [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    clean = text
    for name, pat in PII_PATTERNS.items():
        clean = F.regexp_replace(clean, pat, f"<{name.upper()}>")
    cols = ["doc_id"]
    if denylist:
        import re as _re

        # terms are literals — escape them so 'c++' or 'a.corp' can't
        # break (or over-match) the compiled pattern
        deny_pat = r"\b(?:" + "|".join(_re.escape(t) for t in denylist) + r")\b"
        counts.append(
            F.regexp_count(text, F.lit(deny_pat)).cast("long").alias("n_denylist")
        )
        clean = F.regexp_replace(clean, deny_pat, "<TERM>")
    return documents.select(*cols, clean.alias("clean_text"), *counts)


def repetition_stats(
    documents: DataFrame, with_gram: bool = True
) -> DataFrame:
    """(doc_id, n_2grams, top_2gram, top_2gram_n, top_2gram_frac,
    n_distinct_2grams, dup_2gram_frac): Gopher-style repetition
    signals — the share of a doc's word 2-grams taken by its single
    most frequent 2-gram (ties broken by gram string so the winner is
    deterministic), plus the duplicate-n-gram fraction (share of
    2-gram OCCURRENCES that are repeats of an earlier one, the Gopher
    dup-n-gram rule — catches diffuse repetition a single top gram
    misses). High values mark boilerplate/templated docs that
    repetition filters drop from training mixes; docs under 2 tokens
    drop out.

    Shape at scale: one explode, one (doc, gram) count, then ONE
    per-doc aggregation computing total, max and argmax together
    (min_by over (-n, gram) is the deterministic tie-broken argmax) —
    two keyed shuffles, no window, no self-join, no all-pairs.

    with_gram=False drops the gram string from the output AND the
    plan: gram identity becomes the hashed token slice (xxhash64 over
    longs, never concat_ws strings) — the form pipelines use when
    they only need the fraction, not the offending gram.
    """
    if not with_gram:
        t = documents.select(
            "doc_id", tokens(normalized_text("text")).alias("toks")
        ).filter(F.size("toks") >= 2)
        hv = F.expr(
            "transform(sequence(0, size(toks) - 2), "
            "i -> xxhash64(slice(toks, i + 1, 2)))"
        )
        grams = t.select("doc_id", F.explode(hv).alias("gram"))
    else:
        grams = documents.select(
            "doc_id", F.explode(word_ngrams(2, distinct=False)).alias("gram")
        )
    counts = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("n"))
    aggs = [
        F.sum("n").cast("long").alias("n_2grams"),
        F.max("n").alias("top_2gram_n"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_2grams"),
    ]
    if with_gram:
        aggs.insert(1, F.expr("min_by(gram, struct(-n, gram))").alias("top_2gram"))
    cols = ["doc_id", "n_2grams"] + (["top_2gram"] if with_gram else []) + [
        "top_2gram_n",
        F.round(F.col("top_2gram_n") / F.col("n_2grams"), 4).alias("top_2gram_frac"),
        "n_distinct_2grams",
        F.round(
            (F.col("n_2grams") - F.col("n_distinct_2grams")) / F.col("n_2grams"), 4
        ).alias("dup_2gram_frac"),
    ]
    return counts.groupBy("doc_id").agg(*aggs).select(*cols)


def stratified_sample(
    documents: DataFrame,
    group_col: str = "source",
    k: int = 100,
) -> DataFrame:
    """EXACT-k per-group sampling: keep the k docs per `group_col`
    with the smallest md5(doc_id) — a deterministic, seedless
    stand-in for per-stratum reservoir sampling. Where
    domain_mix_sample realizes a RATE per source (count varies with
    |source|), this realizes a COUNT: the balanced eval-set / probe-
    set constructor ("exactly 1000 docs per domain"). md5 rank is
    uniform over doc ids, so within a stratum this IS a uniform
    k-sample, stable under retries and cluster layout.

    One shuffle keyed by the group column; the rank window and the
    filter fuse into the same exchange. Groups smaller than k keep
    all their docs (rank never exceeds group size)."""
    from pyspark.sql import Window as W

    key = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy(group_col).orderBy(key, F.col("doc_id"))
    return (
        documents.select(
            "doc_id", group_col, key.alias("sample_key"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", group_col, F.col("rk").alias("sample_rank"))
    )


def domain_mix_sample(documents: DataFrame, rates: dict[str, float]) -> DataFrame:
    """(doc_id, source, rate, sampled): deterministic hash-based
    per-domain downsampling — how a training mixture reweights source
    domains without rand(): a doc survives iff the first 4 md5 hex
    chars of its stable id fall below the per-source cutoff
    (rate × 0x10000). No seed coordination; stable under retries,
    re-partitioning, and engine (md5 hex is identical everywhere).
    Sources not in `rates` keep everything (rate 1.0). Map-only."""
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    rate_c, keep_c = None, None
    for s, r in sorted(rates.items()):
        cond = F.col("source") == s
        keep = F.lit(True) if r >= 1 else bucket < format(int(r * 65536), "04x")
        rate_c = (F.when if rate_c is None else rate_c.when)(cond, F.lit(float(r)))
        keep_c = (F.when if keep_c is None else keep_c.when)(cond, keep)
    rate_c = rate_c.otherwise(F.lit(1.0)) if rate_c is not None else F.lit(1.0)
    keep_c = keep_c.otherwise(F.lit(True)) if keep_c is not None else F.lit(True)
    return documents.select(
        "doc_id", "source", rate_c.alias("rate"), keep_c.alias("sampled")
    )


def domain_mix_summary(sampled: DataFrame) -> DataFrame:
    """(source, rate, n_docs, n_sampled) — the realized mixture after
    deterministic downsampling; one shuffle on the tiny source key."""
    return sampled.groupBy("source", "rate").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("sampled")).alias("n_sampled"),
    )


def corpus_audit(documents: DataFrame) -> DataFrame:
    """One-row corpus health report for the document table — the gate
    a pipeline runs before curation: row count, null/empty/whitespace
    text, n_chars disagreements with the actual text, id duplication.
    One aggregation pass; the duplicate-id check is count - distinct
    count inside the same aggregate (no extra shuffle)."""
    t = F.col("text")
    return documents.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(t.isNull()).alias("n_null_text"),
        F.count_if(F.trim(t) == "").alias("n_blank_text"),
        F.count_if(F.length(t) != F.col("n_chars")).alias("n_chars_mismatch"),
        (F.count(F.lit(1)) - F.count_distinct("doc_id")).alias("n_dup_ids"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("lang").alias("n_langs"),
    )


def _apply_merge_sql(symbols_col: str, a: str, b: str) -> str:
    """SQL expr applying ONE BPE merge (a,b)->ab left-to-right,
    non-overlapping, over a symbols array — a single-pass aggregate
    with a one-symbol lookbehind accumulator."""
    qa, qb = a.replace("'", "''"), b.replace("'", "''")
    qm = (a + b).replace("'", "''")
    return (
        f"aggregate({symbols_col}, "
        f"named_struct('out', cast(array() as array<string>), "
        f"'p', cast(null as string)), "
        f"(acc, x) -> IF(acc.p IS NULL, "
        f"named_struct('out', acc.out, 'p', x), "
        f"IF(acc.p = '{qa}' AND x = '{qb}', "
        f"named_struct('out', concat(acc.out, array('{qm}')), "
        f"'p', cast(null as string)), "
        f"named_struct('out', concat(acc.out, array(acc.p)), 'p', x))), "
        f"acc -> IF(acc.p IS NULL, acc.out, concat(acc.out, array(acc.p))))"
    )


def bpe_learn(
    documents: DataFrame, n_merges: int = 10
) -> list[tuple[str, str, int]]:
    """Learn BPE merges ON-CORPUS — the iterative index-build job a
    tokenizer-training pipeline runs (the one genuinely iterative
    algorithm in this engine): start from characters, repeatedly count
    adjacent symbol pairs (frequency-weighted over distinct words) and
    merge the most frequent pair (ties break lexicographically, so the
    result is deterministic).

    Each iteration is two tiny jobs over the DISTINCT-WORD frame
    (vocab-sized, not corpus-sized — the corpus collapses to
    (word, freq) once): a pair-count aggregate and a merge-apply
    projection. Returns [(left, right, freq), ...] in merge order —
    the index artifact a tokenizer ships.
    """
    words = (
        documents.select(F.explode(tokens(normalized_text("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.expr("split(w, '')").alias("s"), "freq")
    ).persist()
    merges: list[tuple[str, str, int]] = []
    cur = words
    for _ in range(n_merges):
        pair = (
            cur.select(
                F.explode(
                    F.expr(
                        "zip_with(slice(s, 1, size(s) - 1), "
                        "slice(s, 2, size(s) - 1), "
                        "(x, y) -> named_struct('a', x, 'b', y))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not pair:
            break
        a, b, n = pair[0].p.a, pair[0].p.b, int(pair[0].n)
        merges.append((a, b, n))
        # materialize the merged frame, THEN release the previous one
        # (unpersisting first would recompute the whole merge chain);
        # without the release, n_merges frames stay cached for the
        # session lifetime.
        nxt = cur.select(
            F.expr(_apply_merge_sql("s", a, b)).alias("s"), "freq"
        ).persist()
        nxt.count()
        if cur is not words:
            cur.unpersist()
        cur = nxt
    words.unpersist()
    if cur is not words:
        cur.unpersist()
    return merges


def bpe_segment(documents: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """(doc_id, n_tokens, n_bpe_pieces): apply learned merges to every
    doc and count the resulting pieces — the real subword-budget
    counter (vs the regex approximation in bpe_token_counts). Merge
    application chains n_merges single-pass array aggregates; map-only."""
    toks = tokens(normalized_text("text"))
    d = documents.select(
        "doc_id", F.size(toks).alias("n_tokens"), F.explode(toks).alias("w")
    ).select("doc_id", "n_tokens", F.expr("split(w, '')").alias("s"))
    col = "s"
    for a, b, _ in merges:
        d = d.select("doc_id", "n_tokens", F.expr(_apply_merge_sql(col, a, b)).alias("s"))
    return d.groupBy("doc_id").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.sum(F.size("s")).cast("long").alias("n_bpe_pieces"),
    )


def pack_token_counts(
    documents: DataFrame, *extra_cols: str
) -> DataFrame:
    """(extra_cols..., doc_id, n_tokens) for the packers below, zero-
    token docs dropped. Compute ONCE (and localCheckpoint) when
    feeding several packing layouts: tokenization is the corpus-scan-
    dominant cost at scale, and the packers accept this frame via
    `counts=` so one scan serves every arm."""
    return documents.select(
        *extra_cols,
        "doc_id",
        F.size(tokens(normalized_text("text"))).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)


def pack_training_chunks(
    documents: DataFrame,
    budget: int = 2048,
    order_by: str = "doc_id",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay the corpus out as one
    deterministic token stream (docs in `order_by` order — must be a
    UNIQUE key for the layout to be well-defined) and cut it
    into fixed-`budget` training chunks — the standard packed-sequence
    layout (docs may span a chunk boundary; the trainer separates them
    with EOS). Output: one row per (doc, chunk) overlap with the
    token span each side contributes —

        doc_id, chunk_id, doc_tok_start, chunk_tok_start, n_toks

    The global cumsum is a DISTRIBUTED PREFIX SUM, not a global
    window: an unpartitioned `Window.orderBy(...)` funnels the whole
    corpus through one task. Instead, range-partition on the layout
    key, cumsum per partition in parallel, then add each partition's
    starting offset — computed from the per-partition subtotals, a
    #partitions-sized (bounded) driver list turned into a literal
    lookup map. The result depends only on the global `order_by`
    order, not on where the range boundaries land. A doc spanning
    chunks floor(start/budget)..floor((end-1)/budget) emits one row
    per spanned chunk via a bounded sequence/explode (fan-out =
    ceil(doc_tokens/budget) + 1, never corpus-sized).

    `counts` (pack_token_counts frame) substitutes a precomputed
    (doc_id, n_tokens) for the tokenization scan.
    """
    from pyspark.sql import Window as W

    sc = documents.sparkSession.sparkContext
    nparts = max(2, sc.defaultParallelism)
    toks = (
        counts.select("doc_id", "n_tokens")
        if counts is not None
        else pack_token_counts(documents)
    )
    t = (
        toks.repartitionByRange(nparts, F.col(order_by).asc())
        .withColumn("_pid", F.spark_partition_id())
        # one materialization pins partition ids for the offsets
        # subtree AND the row subtree; lineage truncated so neither
        # recomputes the sort
        .localCheckpoint(eager=True)
    )
    w_local = W.partitionBy("_pid").orderBy(F.col(order_by).asc())
    local = t.withColumn(
        "_local_start", F.sum("n_tokens").over(w_local) - F.col("n_tokens")
    )
    # per-partition offsets fully in-plan (r13, matching
    # pack_layout_panel): exclusive prefix sum over the <=nparts-row
    # subtotal frame, broadcast back — no driver collect, no literal
    # map; the unpartitioned window is bounded by cluster width
    off = (
        t.groupBy("_pid").agg(F.sum("n_tokens").alias("_ptot"))
        .select(
            "_pid",
            F.coalesce(
                F.sum("_ptot").over(
                    W.orderBy(F.col("_pid").asc()).rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("_off"),
        )
    )
    spans = local.join(F.broadcast(off), "_pid").select(
        "doc_id",
        "n_tokens",
        (F.col("_local_start") + F.col("_off")).alias("tok_start"),
    )
    chunk = F.explode(
        F.sequence(
            F.floor(F.col("tok_start") / budget),
            F.floor((F.col("tok_start") + F.col("n_tokens") - 1) / budget),
        )
    ).alias("chunk_id")
    out = spans.select("doc_id", "n_tokens", "tok_start", chunk)
    lo = F.greatest(F.col("tok_start"), F.col("chunk_id") * budget)
    hi = F.least(
        F.col("tok_start") + F.col("n_tokens"), (F.col("chunk_id") + 1) * budget
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (lo - F.col("tok_start")).cast("long").alias("doc_tok_start"),
        (lo - F.col("chunk_id") * budget).cast("long").alias("chunk_tok_start"),
        (hi - lo).cast("long").alias("n_toks"),
    )


def chunk_documents_overlap(
    documents: DataFrame,
    budget: int = 512,
    stride: int | None = None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-DOC sliding-window chunking with overlap — the third
    packing layout next to the global/grouped concat-and-chunk
    packers: each doc yields independent windows of up to `budget`
    tokens starting every `stride` tokens (consecutive windows share
    budget - stride tokens of context). The retrieval / long-doc-eval
    layout: chunks never cross doc boundaries and carry overlap so no
    span loses its left context.

        doc_id, chunk_id (0-based per doc), doc_tok_start,
        chunk_tok_start (always 0 — each window IS its own sequence),
        n_toks

    A doc of n tokens yields 1 window when n <= budget, else
    ceil((n - budget) / stride) + 1 — the last window may be short but
    always reaches the doc's end. MAP-ONLY: no shuffle anywhere, the
    per-doc fan-out is a bounded sequence/explode (ceil(n/stride)
    rows), so this scales with scan bandwidth alone. `counts` as in
    pack_training_chunks."""
    if stride is None:
        stride = budget // 2
    if not (0 < stride <= budget):
        raise ValueError(f"need 0 < stride({stride}) <= budget({budget})")
    toks = (
        counts.select("doc_id", "n_tokens")
        if counts is not None
        else pack_token_counts(documents)
    )
    n = F.col("n_tokens")
    n_chunks = F.when(n <= budget, F.lit(1)).otherwise(
        F.ceil((n - budget) / F.lit(stride)) + 1
    )
    i = F.explode(F.sequence(F.lit(0), n_chunks.cast("long") - 1)).alias("i")
    out = toks.select("doc_id", "n_tokens", i)
    start = F.col("i") * stride
    return out.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_id"),
        start.cast("long").alias("doc_tok_start"),
        F.lit(0).cast("long").alias("chunk_tok_start"),
        (F.least(F.col("n_tokens"), start + budget) - start)
        .cast("long")
        .alias("n_toks"),
    )


def token_distribution_drift(a: DataFrame, b: DataFrame) -> DataFrame:
    """One-row drift report between two corpora's token distributions
    — the data-quality gate a pipeline runs between corpus snapshots
    (did the crawl shift?) or between train and held-out splits (is
    the split representative?). Both inputs are (doc_id, text).

    Delegates to the tagged single-pass core: the two sides union
    with a side flag, so the joint (token, ca, cb) frame falls out of
    ONE conditional aggregation — one shuffle total instead of one
    per side plus a vocab full-outer join (r13, guide §2.3/§2.4:
    aggregate before you shuffle / remove shuffles outright). When
    both sides are filters of the same table, prefer
    token_distribution_drift_tagged directly — it runs off a single
    corpus scan.
    """
    tagged = a.select("text", F.lit(False).alias("_is_b")).unionByName(
        b.select("text", F.lit(True).alias("_is_b"))
    )
    return token_distribution_drift_tagged(tagged, "_is_b")


def token_distribution_drift_tagged(
    tagged: DataFrame, b_flag: str
) -> DataFrame:
    """Single-pass core of token_distribution_drift: `tagged` carries
    text plus a boolean `b_flag` column (False = side a, True = side
    b). One explode + one (token)-keyed conditional aggregation
    yields the joint vocab frame directly — identical (ca, cb)
    integer counts to the old per-side-aggregate + full-outer-join
    shape, with one corpus pass and one shuffle.

    Output: token totals and vocab sizes per side, out-of-vocabulary
    mass in each direction, and the add-one-smoothed KL divergences +
    Jensen-Shannon divergence over the joint vocabulary. log() is
    natural log in both Spark and DuckDB, but float summation order
    differs — divergences are floor-quantized for any cross-engine
    comparison.
    """
    a = tagged  # sparkSession owner for the bounded result frames
    flag = F.col(b_flag)
    # persisted WITHIN this invocation (released before returning):
    # the joint vocab frame feeds two aggregates — totals for
    # smoothing, then the divergence sums
    joint = (
        tagged.select(flag.alias("_b"),
                      F.explode(tokens(normalized_text("text"))).alias("tok"))
        .groupBy("tok")
        .agg(
            F.sum(F.when(~F.col("_b"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("_b"), 1).otherwise(0)).alias("cb"),
        )
        .select("ca", "cb")
    ).persist()
    # totals folded in the same aggregate pass via sum windows-free
    # arithmetic: smoothing needs vocab size + totals, so aggregate
    # twice over the (vocab-sized) joint frame — both jobs are tiny.
    tot = joint.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("v"),
        F.sum(F.when(F.col("cb") == 0, F.col("ca")).otherwise(0)).alias("oov_b_mass"),
        F.sum(F.when(F.col("ca") == 0, F.col("cb")).otherwise(0)).alias("oov_a_mass"),
    ).collect()[0]
    na, nb, v = tot.na or 0, tot.nb or 0, tot.v or 0
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("n_tokens_a", T.LongType()),
        T.StructField("n_tokens_b", T.LongType()),
        T.StructField("vocab_joint", T.LongType()),
        T.StructField("oov_frac_a_in_b", T.DoubleType()),
        T.StructField("oov_frac_b_in_a", T.DoubleType()),
        T.StructField("kl_a_b", T.DoubleType()),
        T.StructField("kl_b_a", T.DoubleType()),
        T.StructField("js", T.DoubleType()),
    ])
    if v == 0:
        joint.unpersist()
        return a.sparkSession.createDataFrame(
            [(0, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)], schema)
    pa = (F.col("ca") + 1) / F.lit(float(na + v))  # add-one smoothing
    pb = (F.col("cb") + 1) / F.lit(float(nb + v))
    pm = (pa + pb) / 2
    kl = joint.agg(
        F.sum(pa * F.log(pa / pb)).alias("kl_a_b"),
        F.sum(pb * F.log(pb / pa)).alias("kl_b_a"),
        (F.sum(pa * F.log(pa / pm)) / 2
         + F.sum(pb * F.log(pb / pm)) / 2).alias("js"),
    ).collect()[0]
    joint.unpersist()
    # the report is ONE bounded row — materialized so the persisted
    # joint frame can be released before returning

    def _r6(x: float) -> float:
        # floor-quantize at 6dp (moneydec policy for quotients /
        # log-sums: floor(x*1e6)/1e6 is the same IEEE op sequence on
        # Python, Spark, and DuckDB; round() algorithms differ)
        return math.floor(x * 1000000.0) / 1000000.0

    return a.sparkSession.createDataFrame(
        [(
            int(na), int(nb), int(v),
            _r6(tot.oov_a_mass / nb if nb else 0.0),
            _r6(tot.oov_b_mass / na if na else 0.0),
            _r6(kl.kl_a_b), _r6(kl.kl_b_a), _r6(kl.js),
        )],
        schema,
    )


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """CCNet-style unigram LM scoring: train an add-one-smoothed
    unigram model on the corpus itself, score every doc by its average
    token log-probability. Low scores = statistical outliers (gibberish,
    boilerplate, wrong-language) — the classic cheap perplexity filter
    run before an expensive model-based one.

    Shape: one explode -> (token, count) aggregate (vocab-sized, map-
    side combine); corpus totals ride along as a broadcast one-row
    frame (no driver collect); token probabilities join back to the
    exploded stream on the token key; one per-doc aggregate. Two
    shuffles total, both on bounded-width keys. (r13 note: the
    counts subtree feeds both the totals aggregate and the
    probability join and is evaluated twice — measured, a
    per-invocation persist of the vocab frame costs MORE here than
    the duplicated vocab-sized aggregate at bench scale; the double
    evaluation is one extra scan of the corpus + one vocab shuffle.)
    """
    tk = documents.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    )
    counts = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v")
    )
    probs = counts.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.log((F.col("c") + 1) / (F.col("n_total") + F.col("v"))).alias("lp"),
    )
    return (
        tk.join(probs, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lp") / F.count(F.lit(1)), 4).alias("avg_logprob"),
        )
    )


def bigram_logprob(
    model_docs: DataFrame,
    score_docs: DataFrame,
    alpha: float = 0.4,
) -> DataFrame:
    """Bigram LM scoring with Stupid Backoff (Brants et al. 2007,
    "Large Language Models in Machine Translation") — the rung above
    `unigram_logprob` on the CCNet-style perplexity-filter ladder,
    and the honest in-container analog of scoring a crawl with a
    KenLM n-gram model: the LM trains on `model_docs` (a reference
    corpus) and scores `score_docs`, so unseen bigrams and
    out-of-vocabulary tokens actually occur.

        S(cur | prev) = c(prev cur) / c(prev)        bigram seen
                      = alpha * (c(cur)+1)/(N+V)     backoff: add-one
                                                     unigram (OOV ->
                                                     1/(N+V))

    Per-doc output: n_bigrams, avg log score (4dp).

    Shape: bigram counts and the vocab aggregate map-side-combine on
    the model scan; the scoring stream LEFT-joins the bigram model on
    the (prev, cur) pair key — ONE pair-keyed shuffle, the only big
    one — then the vocab-sized unigram table (AQE broadcasts it), and
    the corpus totals ride along as a broadcast one-row frame. At
    100 TB the model side is a curated reference corpus (Wikipedia-
    class, ~1e9 bigrams), well inside shuffle-join territory, and the
    crawl side never shuffles more than its own pair stream."""
    def pair_stream(df):
        t = df.select(
            "doc_id", tokens(normalized_text("text")).alias("toks")
        ).filter(F.size("toks") >= 2)
        return t.select(
            "doc_id",
            F.expr("explode(transform(sequence(1, size(toks) - 1), "
                   "i -> struct(toks[i-1] AS prev, toks[i] AS cur)))")
            .alias("p"),
        ).select("doc_id", "p.prev", "p.cur")

    # The vocab frame feeds THREE consumers (totals, the bigram-model
    # join, the backoff table), so an unshared plan re-scans and
    # re-tokenizes the model corpus once per consumer. Eagerly
    # localCheckpointing the vocab-sized counts inside the invocation
    # runs the heavy string work once (r14, guide §2.3; interleaved
    # A/B pairwise-faster in 7/8 reps, exceptAll 0 both ways —
    # contrast unigram_logprob, where the same frame has only two
    # consumers and the materialization measured slower in r13).
    uc = (
        model_docs
        .select(F.explode(tokens(normalized_text("text"))).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    ).localCheckpoint(eager=True)
    tot = uc.agg(
        F.log(F.sum("c") + F.count(F.lit(1))).alias("log_nv"),
        (F.sum("c") + F.count(F.lit(1))).alias("nv"),
    )
    model = (
        pair_stream(model_docs)
        .groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))
        .join(uc.select(F.col("tok").alias("prev"),
                        F.col("c").alias("cp")), "prev")
        .select("prev", "cur",
                F.log(F.col("cb") / F.col("cp")).alias("lp_b"))
    )
    uprob = uc.crossJoin(F.broadcast(tot)).select(
        F.col("tok").alias("cur"),
        F.log((F.col("c") + 1) / F.col("nv")).alias("lp_u"),
    )
    scored = (
        pair_stream(score_docs)
        .join(model, ["prev", "cur"], "left")
        .join(uprob, "cur", "left")
        .crossJoin(F.broadcast(tot.select("log_nv")))
        .select(
            "doc_id",
            F.coalesce(
                F.col("lp_b"),
                F.log(F.lit(alpha))
                + F.coalesce(F.col("lp_u"), -F.col("log_nv")),
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum("lp") / F.count(F.lit(1)), 4).alias("avg_logprob"),
    )


def pack_training_chunks_grouped(
    documents: DataFrame,
    budget: int = 2048,
    group_by: str = "source",
    order_by: str = "doc_id",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-group sequence packing: an independent concat-and-chunk
    token stream per `group_by` value (per-source / per-shard packing
    — chunks never mix sources). Same distributed-prefix-sum shape as
    pack_training_chunks with the group key prepended everywhere:
    range-partition on (group, key), per-partition cumsum, offsets
    from the (groups x partitions)-row subtotal collect — bounded for
    a bounded group cardinality (sources, shards), which is the
    contract; don't pass a high-cardinality group.

    Output adds the group column; chunk_id counts from 0 WITHIN each
    group. `counts` (pack_token_counts frame carrying the group
    column) substitutes a precomputed frame for the tokenization
    scan."""
    from pyspark.sql import Window as W

    sc = documents.sparkSession.sparkContext
    nparts = max(2, sc.defaultParallelism)
    # NULL groups need an explicit sentinel on BOTH sides of the
    # lookup: concat_ws silently skips NULL columns, which would
    # collapse the runtime key to the bare pid while the driver map
    # says "None\x01pid" — every NULL-group partition would then fall
    # back to offset 0 and overlap.
    _NULL_GRP = "\x00<NULL>"
    toks = (
        counts.select(F.col(group_by).alias("grp"), "doc_id", "n_tokens")
        if counts is not None
        else pack_token_counts(documents, group_by).select(
            F.col(group_by).alias("grp"), "doc_id", "n_tokens"
        )
    )
    t = (
        toks.repartitionByRange(nparts, F.col("grp").asc(), F.col(order_by).asc())
        .withColumn("_pid", F.spark_partition_id())
        # the group-as-string lookup key is computed by SPARK's cast on
        # both sides (collected here for the driver map, reused below
        # for the runtime lookup) — a python str(g) would diverge from
        # Spark's rendering for booleans ('True' vs 'true'), floats in
        # scientific notation, timestamps, ..., silently coalescing
        # every lookup to offset 0 (the NULL-group bug generalized).
        .withColumn(
            "_gkey",
            F.coalesce(F.col("grp").cast("string"), F.lit(_NULL_GRP)),
        )
        .localCheckpoint(eager=True)
    )
    w_local = W.partitionBy("grp", "_pid").orderBy(F.col(order_by).asc())
    local = t.withColumn(
        "_local_start", F.sum("n_tokens").over(w_local) - F.col("n_tokens")
    )
    # per-(group, partition) offsets fully in-plan (r13, matching
    # pack_layout_panel): exclusive prefix sum per group over the
    # bounded (#groups x nparts) subtotal frame, broadcast back — no
    # driver collect, no string-keyed literal map (the _gkey sentinel
    # machinery survives only as the join key's NULL handling, which
    # the join on the real `grp` column now does natively via _gkey)
    off = (
        t.groupBy("_gkey", "_pid").agg(F.sum("n_tokens").alias("_ptot"))
        .select(
            "_gkey", "_pid",
            F.coalesce(
                F.sum("_ptot").over(
                    W.partitionBy("_gkey").orderBy(F.col("_pid").asc())
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("_off"),
        )
    )
    spans = local.join(F.broadcast(off), ["_gkey", "_pid"]).select(
        "grp",
        "doc_id",
        "n_tokens",
        (F.col("_local_start") + F.col("_off")).alias("tok_start"),
    )
    chunk = F.explode(
        F.sequence(
            F.floor(F.col("tok_start") / budget),
            F.floor((F.col("tok_start") + F.col("n_tokens") - 1) / budget),
        )
    ).alias("chunk_id")
    out = spans.select("grp", "doc_id", "n_tokens", "tok_start", chunk)
    lo = F.greatest(F.col("tok_start"), F.col("chunk_id") * budget)
    hi = F.least(
        F.col("tok_start") + F.col("n_tokens"), (F.col("chunk_id") + 1) * budget
    )
    return out.select(
        F.col("grp").alias(group_by),
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (lo - F.col("tok_start")).cast("long").alias("doc_tok_start"),
        (lo - F.col("chunk_id") * budget).cast("long").alias("chunk_tok_start"),
        (hi - lo).cast("long").alias("n_toks"),
    )


def pack_layout_panel(
    documents: DataFrame,
    budget: int = 512,
    group_by: str = "source",
    overlap_budget: int = 32,
    overlap_stride: int = 24,
) -> DataFrame:
    """All three packing layouts — 'global' concat-and-chunk,
    'by_source' (per-group streams), 'doc_overlap' sliding windows —
    off ONE tokenization scan, ONE range partitioning and ONE
    subtotal collect (r13, guide §2.4: two operations keyed the same
    way share one exchange).

    Bit-identical to composing pack_training_chunks +
    pack_training_chunks_grouped + chunk_documents_overlap (each
    layout depends only on its stream's global order, never on where
    partition boundaries land): range-partitioning by the layout key
    (doc_id) keeps pid order == doc_id order for the corpus AND for
    every group subset, so ONE (group × pid) subtotal aggregate
    yields the global offsets (sum over groups per pid, cumsum in
    pid order) and each group's offsets (cumsum over pids per group)
    at once. The offsets never visit the driver: the subtotal frame
    is bounded by (#groups × #partitions), its cumsum windows are
    bounded the same way, and it broadcast-joins back onto the
    checkpointed counts — no collect, no literal maps (vs the
    per-packer composition: 3 checkpoints + 2 driver collects -> 1
    checkpoint + 0). Both row-level cumsum windows run behind the
    same hash(_pid) exchange (HashPartitioning(_pid) satisfies the
    (grp,_pid) clustering — the second window re-sorts, never
    re-shuffles), and the two packed arms leave one Generate as a
    2-struct unpivot so the shared subtree is evaluated once. The
    overlap arm is map-only off the same checkpointed counts.

    Output: (mode, source, doc_id, chunk_id, doc_tok_start,
    chunk_tok_start, n_toks); chunk ids count from 0 per stream.
    """
    from pyspark.sql import Window as W

    sc = documents.sparkSession.sparkContext
    nparts = max(2, sc.defaultParallelism)
    _NULL_GRP = "\x00<NULL>"
    counts = pack_token_counts(documents, group_by).select(
        F.col(group_by).alias("grp"), "doc_id", "n_tokens"
    )
    t = (
        counts.repartitionByRange(nparts, F.col("doc_id").asc())
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_gkey",
            F.coalesce(F.col("grp").cast("string"), F.lit(_NULL_GRP)),
        )
        # one materialization pins partition ids for the offsets
        # subtree AND the row subtree (repartitionByRange samples per
        # execution; see pack_training_chunks)
        .localCheckpoint(eager=True)
    )
    # offsets, fully in-plan: exclusive prefix sums over the bounded
    # subtotal frame. The frames here are (#groups x nparts) rows at
    # most, so the unpartitioned pid-ordered window is bounded by
    # cluster width, not data.
    sub = t.groupBy("_gkey", "_pid").agg(F.sum("n_tokens").alias("tot"))
    w_gp = W.orderBy(F.col("_pid").asc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    w_sp = W.partitionBy("_gkey").orderBy(F.col("_pid").asc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    g_off = (
        sub.groupBy("_pid").agg(F.sum("tot").alias("ptot"))
        .select("_pid",
                F.coalesce(F.sum("ptot").over(w_gp), F.lit(0)).alias("g_off"))
    )
    off = (
        sub.select("_gkey", "_pid",
                   F.coalesce(F.sum("tot").over(w_sp), F.lit(0)).alias("s_off"))
        .join(g_off, "_pid")
    )

    w_g = W.partitionBy("_pid").orderBy(F.col("doc_id").asc())
    w_s = W.partitionBy("grp", "_pid").orderBy(F.col("doc_id").asc())
    both = t.join(F.broadcast(off), ["_gkey", "_pid"]).select(
        "grp",
        "doc_id",
        "n_tokens",
        (F.sum("n_tokens").over(w_g) - F.col("n_tokens")
         + F.col("g_off")).alias("g_start"),
        (F.sum("n_tokens").over(w_s) - F.col("n_tokens")
         + F.col("s_off")).alias("p_start"),
    )
    # 2-struct unpivot: one evaluation of the double-window subtree
    # serves both packed arms
    u = both.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.array(
                F.struct(
                    F.lit("global").alias("mode"),
                    F.lit(None).cast("string").alias("source"),
                    F.col("g_start").alias("tok_start"),
                ),
                F.struct(
                    F.lit("by_source").alias("mode"),
                    F.col("grp").cast("string").alias("source"),
                    F.col("p_start").alias("tok_start"),
                ),
            )
        ).alias("m"),
    ).select("doc_id", "n_tokens", "m.mode", "m.source", "m.tok_start")
    chunk = F.explode(
        F.sequence(
            F.floor(F.col("tok_start") / budget),
            F.floor((F.col("tok_start") + F.col("n_tokens") - 1) / budget),
        )
    ).alias("chunk_id")
    packed = u.select("mode", "source", "doc_id", "n_tokens", "tok_start", chunk)
    lo = F.greatest(F.col("tok_start"), F.col("chunk_id") * budget)
    hi = F.least(
        F.col("tok_start") + F.col("n_tokens"), (F.col("chunk_id") + 1) * budget
    )
    packed = packed.select(
        "mode",
        "source",
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (lo - F.col("tok_start")).cast("long").alias("doc_tok_start"),
        (lo - F.col("chunk_id") * budget).cast("long").alias("chunk_tok_start"),
        (hi - lo).cast("long").alias("n_toks"),
    )
    n = F.col("n_tokens")
    n_chunks = F.when(n <= overlap_budget, F.lit(1)).otherwise(
        F.ceil((n - overlap_budget) / F.lit(overlap_stride)) + 1
    )
    i = F.explode(F.sequence(F.lit(0), n_chunks.cast("long") - 1)).alias("i")
    ostart = F.col("i") * overlap_stride
    overlap = t.select("doc_id", "n_tokens", i).select(
        F.lit("doc_overlap").alias("mode"),
        F.lit(None).cast("string").alias("source"),
        "doc_id",
        F.col("i").cast("long").alias("chunk_id"),
        ostart.cast("long").alias("doc_tok_start"),
        F.lit(0).cast("long").alias("chunk_tok_start"),
        (F.least(F.col("n_tokens"), ostart + overlap_budget) - ostart)
        .cast("long")
        .alias("n_toks"),
    )
    return packed.unionByName(overlap)


def quality_weight(scale: float = 1.0) -> Column:
    """The [0,1] quality-proxy weight shared by the sampling
    operators: stopword share capped at 0.5 (×2), zeroed outside the
    sane length window, scaled and rounded to 6dp (the rounding makes
    the weight a cross-engine-exact rational)."""
    n_tokens = F.size(tokens("text"))
    sw = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(
        F.filter(tokens("text"), lambda t: F.array_contains(sw, F.lower(t)))
    )
    raw_w = F.when(
        (n_tokens >= 5) & (n_tokens <= 100000),
        F.least(F.lit(1.0), n_stop * 2.0 / n_tokens),
    ).otherwise(F.lit(0.0))
    return F.least(F.lit(1.0), F.round(raw_w * scale, 6))


def weighted_sample_without_replacement(
    documents: DataFrame, k: int, scale: float = 1.0
) -> DataFrame:
    """EXACT-k weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, algorithm A-ES): give every doc the key
    ``-ln(u)/w`` (u uniform in (0,1], w its weight) and keep the k
    SMALLEST keys — provably a weighted sample without replacement,
    and the standard distributed formulation (one pass, no reservoir
    state, no rejection loop; Bernoulli `quality_weighted_sample`
    can't hit an exact count and `stratified_sample` can't weight
    WITHIN a stratum — this is the third corner of the sampling
    triad).

    Deterministic across engines: u derives from the md5-fraction
    idiom ((frac+1)/16^6, exactly representable), the key is rounded
    to 6dp before ranking with a doc_id tie-break, so a sub-1e-6
    libm ln() difference cannot flip the selection. Zero-weight docs
    are excluded (they must never be sampled; -ln(u)/0 would be
    Inf/NaN-ordering trouble on both engines).

    Shape at scale: map-only key computation + ONE fused global
    top-k (TakeOrderedAndProject — k rows to the driver-side stage,
    never a full sort), identical to the engine's other top-k paths.
    """
    weight = quality_weight(scale)
    frac_int = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    u = (frac_int + F.lit(1)) / F.lit(float(16**6))
    keyed = documents.select(
        "doc_id",
        weight.alias("weight"),
        F.round(-F.log(u) / weight, 6).alias("es_key"),
    ).filter(F.col("weight") > 0)
    return keyed.orderBy("es_key", "doc_id").limit(k)


def quality_weighted_sample(
    documents: DataFrame, scale: float = 1.0
) -> DataFrame:
    """(doc_id, weight, sampled): per-DOC importance sampling — each
    doc survives with probability proportional to its quality weight
    (clamped to [0,1] after `scale`), decided by the same
    deterministic md5-fraction idiom as domain mixing (no rand(); a
    doc's fate is a pure function of its id, so retries, re-partitions
    and engines agree, and raising `scale` strictly GROWS the sample —
    nested like the domain-mix rates).

    The weight here is a simple quality proxy (stopword-coverage ×
    length window); swap in a model score column at will — the
    sampling math is the deliverable. Map-only."""
    weight = quality_weight(scale)
    # acceptance decided in INTEGER space on both engines: first 6 md5
    # hex chars as an int vs floor(weight * 16^6) — no float-compare
    # boundary ambiguity
    frac_int = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    cutoff = F.floor(weight * F.lit(float(16**6))).cast("long")
    return documents.select(
        "doc_id",
        weight.alias("weight"),
        (frac_int < cutoff).alias("sampled"),
    )


# ---------------------------------------------------------------------------
# r5: data-selection operators (DSIR, CCNet buckets, Gopher rules)
# ---------------------------------------------------------------------------

def _md5_bucket(col: Column, n_buckets: int) -> Column:
    """Portable hash bucket: first 14 md5 hex digits as an integer,
    mod n_buckets. 14 hex digits < 2^56 fit a signed BIGINT on both
    engines, so Spark and DuckDB compute the identical bucket
    (('0x' || substr(md5(x),1,14))::BIGINT % B on the DuckDB side)."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long") % n_buckets


def _hashed_gram_features(
    documents: DataFrame, n_buckets: int, extra_cols: tuple = ()
) -> DataFrame:
    """(doc_id, bucket) stream of hashed word uni+bigram features over
    the normalized text — the DSIR feature space. The token array is
    let-bound (evaluated once per row) before fanning into unigrams
    and bigrams."""
    def with_bigrams(t: Column) -> Column:
        bi = F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(t, bi)

    feats = F.element_at(
        F.transform(F.array(tokens(normalized_text("text"))), with_bigrams), 1
    )
    return documents.select(
        "doc_id", *extra_cols, F.explode(feats).alias("feat")
    ).select(
        "doc_id", *extra_cols, _md5_bucket(F.col("feat"), n_buckets).alias("b")
    )


def dsir_importance_tagged(
    documents: DataFrame, target_flag: Column, n_buckets: int = 1024
) -> DataFrame:
    """dsir_importance for the common case where the target domain is
    a FLAGGED SUBSET of the scored corpus (`target_flag` boolean
    column expression): both multinomials' bucket counts fall out of
    ONE conditional aggregation over one feature stream, so the plan
    tokenizes the corpus 3x (counts, totals, scoring join) instead of
    the two-frame form's 5x (r13, guide §2.4). Per-bucket log-ratios
    are the SAME expression over the same integer counts, so scores
    are identical to dsir_importance(documents, documents.filter(
    target_flag))."""
    feats = respread_for_compute(documents).select(
        "doc_id", target_flag.alias("_t"), "text"
    )
    feats = _hashed_gram_features(feats, n_buckets, extra_cols=("_t",))
    counts = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("ct"),
    )
    totals = counts.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    lam = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("ct") + 1) / (F.col("nt") + F.lit(float(n_buckets))))
            - F.log((F.col("cr") + 1) / (F.col("nr") + F.lit(float(n_buckets))))
        ).alias("lam"),
    )
    return (
        feats.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("lam") / F.count(F.lit(1)), 4).alias("dsir_logratio"),
        )
    )


def dsir_importance(
    documents: DataFrame, target: DataFrame, n_buckets: int = 1024
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    doc by how much more likely its hashed-n-gram features are under
    the TARGET distribution than under the RAW distribution —
    log p_target(doc)/p_raw(doc), length-normalized. Docs resembling
    the target domain score high; selecting by weight (or sampling
    through quality_weighted_sample) tilts the corpus toward the
    target without training a model.

    Both "LMs" are bag-of-hashed-feature multinomials with add-one
    smoothing over the n_buckets feature space — exactly the paper's
    estimator. Hashing makes the vocabulary a FIXED-width table.

    Shape at scale: two (bucket, count) aggregates — each at most
    n_buckets rows after map-side combine — merged into one
    log-ratio table that BROADCASTS (n_buckets ≤ a few thousand);
    the per-doc score is then one explode + broadcast-join + per-doc
    aggregate: a single corpus shuffle on doc_id, independent of
    corpus size. No driver collect anywhere.
    """
    raw_feats = _hashed_gram_features(documents, n_buckets)
    tgt_feats = _hashed_gram_features(target, n_buckets)
    # (r13 note: the counts subtrees repeat inside the plan — the
    # corpus is tokenized several times — but a per-invocation
    # persist of these <=n_buckets-row frames measured ~1.3s SLOWER
    # at sf0.1: the InMemoryRelation split costs more than the
    # repeated whole-stage-codegen'd aggregate. Left as one fused
    # plan on measurement.)
    raw_counts = raw_feats.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt_counts = tgt_feats.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    # every doc feature exists in raw_counts by construction (raw =
    # the scored corpus), so a left join loses nothing; target-only
    # buckets influence only the normalizer totals
    totals = raw_counts.agg(F.sum("cr").alias("nr")).crossJoin(
        tgt_counts.agg(F.sum("ct").alias("nt"))
    )
    lam = (
        raw_counts.join(tgt_counts, "b", "left_outer")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                    / (F.col("nt") + F.lit(float(n_buckets)))
                )
                - F.log((F.col("cr") + 1) / (F.col("nr") + F.lit(float(n_buckets))))
            ).alias("lam"),
        )
    )
    return (
        raw_feats.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("lam") / F.count(F.lit(1)), 4).alias("dsir_logratio"),
        )
    )


def perplexity_buckets(documents: DataFrame) -> DataFrame:
    """CCNet-style head/middle/tail bucketing (Wenzek et al. 2020):
    score each doc with the corpus-self-trained unigram LM
    (unigram_logprob — the cheap perplexity stand-in), then split each
    language into terciles: head = most-fluent third (highest average
    log-probability), tail = least. Downstream pipelines keep head+
    middle or reweight by bucket.

    Buckets are ntile(3) over the TOTAL order (score desc, doc_id) —
    row-count-exact and engine-independent, unlike interpolated
    percentile thresholds (Spark's percentile() and DuckDB's
    quantile_cont disagree in the last ulp around heavy score ties,
    flipping boundary docs). The per-language window sorts one
    language per partition — fine for real language cardinalities at
    this stage's input size (post-curation scores, one row per doc);
    at extreme scale swap the ntile for a two-pass approx-threshold
    assignment and accept approximate cut points.
    """
    from pyspark.sql import Window as W

    scored = unigram_logprob(documents).join(
        documents.select("doc_id", "lang"), "doc_id"
    )
    w = W.partitionBy("lang").orderBy(F.col("avg_logprob").desc(), F.col("doc_id"))
    return scored.select(
        "doc_id",
        "lang",
        "avg_logprob",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            F.ntile(3).over(w),
        ).alias("bucket"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(documents: DataFrame) -> DataFrame:
    """The Gopher quality-rule panel (Rae et al. 2021, §A1.1) — the
    rule family the paper applies BEFORE repetition filtering (which
    `text_repetition` already covers). Per doc, one flag per rule plus
    the conjunction:

    - word count in [50, 100000]
    - mean word length in [3, 10]
    - symbol-to-word ratio ≤ 0.1 (hash '#' and ellipsis '...')
    - ≤ 90% of lines start with a bullet ('-', '*', '•')
    - ≤ 30% of lines end with an ellipsis
    - ≥ 80% of words contain at least one alphabetic character
    - at least 2 distinct Gopher stopwords appear

    Pure column expressions (map-only, whole-stage codegen; the token
    array is let-bound once per row). Ratios are integer/integer so
    the DuckDB oracle hashes identically; zero-word/zero-line docs
    fail their flags via NULL-safe coalesce, never divide-by-zero.
    """
    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])

    def flags(t: Column) -> Column:
        n_words = F.size(t)
        total_wl = F.aggregate(
            F.transform(t, F.length), F.lit(0), lambda acc, x: acc + x
        )
        mean_wl = total_wl / n_words
        n_sym = F.size(
            F.filter(
                t,
                lambda w: w.contains("#") | w.contains("...") | w.contains("…"),
            )
        )
        n_alpha = F.size(F.filter(t, lambda w: w.rlike("[A-Za-z]")))
        # count DISTINCT stopwords present by filtering the 8-word
        # list (array_intersect's dedup semantics differ between
        # engines; this form is unambiguous on both)
        n_stop = F.size(
            F.filter(sw, lambda s: F.array_contains(F.transform(t, F.lower), s))
        )
        return F.struct(
            ((n_words >= 50) & (n_words <= 100000)).alias("flag_word_count"),
            F.coalesce(
                F.when(n_words > 0, (mean_wl >= 3.0) & (mean_wl <= 10.0)),
                F.lit(False),
            ).alias("flag_mean_word_len"),
            F.coalesce(
                F.when(n_words > 0, n_sym / n_words <= 0.1), F.lit(False)
            ).alias("flag_symbol_ratio"),
            (n_stop >= 2).alias("flag_stopwords"),
            F.coalesce(
                F.when(n_words > 0, n_alpha / n_words >= 0.8), F.lit(False)
            ).alias("flag_alpha_words"),
        )

    def line_flags(lines: Column) -> Column:
        nonblank = F.filter(lines, lambda ln: F.trim(ln) != "")
        n_lines = F.size(nonblank)
        n_bullet = F.size(
            F.filter(
                nonblank,
                lambda ln: F.trim(ln).rlike("^[-*•]"),
            )
        )
        n_ellipsis = F.size(
            F.filter(
                nonblank,
                lambda ln: F.trim(ln).rlike("(\\.\\.\\.|…)$"),
            )
        )
        return F.struct(
            F.coalesce(
                F.when(n_lines > 0, n_bullet / n_lines <= 0.9), F.lit(True)
            ).alias("flag_bullet_lines"),
            F.coalesce(
                F.when(n_lines > 0, n_ellipsis / n_lines <= 0.3), F.lit(True)
            ).alias("flag_ellipsis_lines"),
        )

    wf = F.element_at(F.transform(F.array(tokens("text")), flags), 1)
    lf = F.element_at(
        F.transform(F.array(F.split(F.col("text"), "\n")), line_flags), 1
    )
    out = documents.select("doc_id", wf.alias("w"), lf.alias("l"))
    cols = [
        F.col("w.flag_word_count").alias("flag_word_count"),
        F.col("w.flag_mean_word_len").alias("flag_mean_word_len"),
        F.col("w.flag_symbol_ratio").alias("flag_symbol_ratio"),
        F.col("w.flag_stopwords").alias("flag_stopwords"),
        F.col("w.flag_alpha_words").alias("flag_alpha_words"),
        F.col("l.flag_bullet_lines").alias("flag_bullet_lines"),
        F.col("l.flag_ellipsis_lines").alias("flag_ellipsis_lines"),
    ]
    passes = cols[0]
    for c in cols[1:]:
        passes = passes & c
    return out.select("doc_id", *cols, passes.alias("passes_gopher"))


def c4_filters(documents: DataFrame) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020, §2.2) — the other
    canonical public web-curation recipe beside Gopher. Line level:
    retain only lines that end in a terminal punctuation mark, carry
    at least 5 words, and do not mention 'javascript'. Page level:
    drop pages containing 'lorem ipsum' or a '{' (code), and pages
    left with fewer than 3 sentences after line cleaning.

    Output per doc: line/sentence counters, the retained-text length,
    one flag per page rule, and the conjunction `passes_c4`. Map-only
    column expressions (let-bound arrays, whole-stage codegen), same
    shape as gopher_rules; integer/integer arithmetic only, so the
    DuckDB mirror hashes identically.

    (The sf testdata corpus carries no punctuation or newlines, so
    every doc degenerates to kept=0 there — the behavioral coverage
    lives in pytest over realistic synthetic pages, cross-checked
    against DuckDB on the same frame.)"""

    def per_doc(lines: Column) -> Column:
        nonblank = F.filter(lines, lambda ln: F.trim(ln) != "")
        kept = F.filter(
            nonblank,
            lambda ln: F.trim(ln).rlike('[.!?"]$')
            & (
                F.size(
                    F.filter(
                        F.split(F.trim(ln), r"\s+"), lambda w: w != ""
                    )
                )
                >= 5
            )
            & ~F.lower(ln).contains("javascript"),
        )
        clean = F.array_join(kept, "\n")
        n_sentences = F.size(
            F.filter(F.split(clean, r"[.!?]"), lambda s: F.trim(s) != "")
        )
        return F.struct(
            F.size(nonblank).alias("n_lines"),
            F.size(kept).alias("n_kept_lines"),
            n_sentences.alias("n_sentences"),
            F.length(clean).alias("clean_len"),
        )

    # CRLF normalize before splitting: Java's default `$` matches
    # BEFORE a trailing '\r' while DuckDB's RE2 `$` is end-of-string,
    # so a Windows-lineending corpus would classify differently here
    # vs the proven oracle — strip the divergence at the source.
    norm_text = F.regexp_replace(F.col("text"), "\r\n?", "\n")
    stats = F.element_at(
        F.transform(F.array(F.split(norm_text, "\n")), per_doc), 1
    )
    low = F.lower(F.col("text"))
    out = documents.select(
        "doc_id",
        stats.alias("s"),
        (~low.contains("lorem ipsum")).alias("flag_no_lorem"),
        (~low.contains("{")).alias("flag_no_brace"),
    )
    return out.select(
        "doc_id",
        F.col("s.n_lines").alias("n_lines"),
        F.col("s.n_kept_lines").alias("n_kept_lines"),
        F.col("s.n_sentences").alias("n_sentences"),
        F.col("s.clean_len").alias("clean_len"),
        "flag_no_lorem",
        "flag_no_brace",
        (F.col("s.n_sentences") >= 3).alias("flag_min_sentences"),
        (
            F.col("flag_no_lorem")
            & F.col("flag_no_brace")
            & (F.col("s.n_sentences") >= 3)
            & (F.col("s.n_kept_lines") > 0)
        ).alias("passes_c4"),
    )


def mixture_plan(
    documents: DataFrame,
    token_budget: int = 30000,
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Mixture planning: per-source sampling rates that realize a
    target domain mixture under a token budget — the planning step in
    front of `domain_mix`/`quality_weighted_sample` (which EXECUTE
    rates; this one derives them). For each source:

        alloc  = target_share × budget         (tokens wanted)
        rate   = min(1, alloc / n_tokens)      (can't sample above 1)
        planned_tokens = floor(rate × n_tokens)
        deficit = alloc > n_tokens             (source can't fill its share)

    Default target is the uniform mixture over observed sources.
    Deficit redistribution (water-filling) is a planner-loop concern —
    a production planner reruns this frame with shares renormalized
    over non-deficit sources; the frame is source-cardinality-sized,
    so iterating it costs nothing.

    Shape at scale: one per-source aggregate over the corpus (the
    only shuffle; map-side combined), then pure arithmetic on the
    #sources-row frame with the source count broadcast as one row.
    """
    per_src = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
    )
    if target_shares is None:
        n_src = per_src.agg(F.count(F.lit(1)).alias("n_sources"))
        share = F.lit(1.0) / F.col("n_sources")
        planned = per_src.crossJoin(F.broadcast(n_src))
    else:
        share_map = F.create_map(
            *[F.lit(x) for kv in target_shares.items() for x in kv]
        )
        share = F.coalesce(share_map[F.col("source")], F.lit(0.0))
        planned = per_src
    alloc = share * F.lit(float(token_budget))
    rate = F.least(F.lit(1.0), alloc / F.col("n_tokens"))
    return planned.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("target_share"),
        F.round(rate, 6).alias("rate"),
        F.floor(rate * F.col("n_tokens")).cast("long").alias("planned_tokens"),
        (alloc > F.col("n_tokens")).alias("deficit"),
    ).orderBy("source")


def mixture_plan_temperature(
    documents: DataFrame,
    token_budget: int = 30000,
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-based mixture planning (the mT5/multilingual-BERT
    recipe): target_share_i ∝ p_i^(1/T) with p_i the source's token
    fraction — T > 1 upsamples low-resource sources toward uniform,
    T = 1 reproduces natural proportions. The derived rates feed the
    same executors as `mixture_plan`.

    Cross-engine exactness: the unnormalized weights are quantized
    to INTEGER 1e-9 units BEFORE normalizing, so the normalizer is
    an order-independent integer sum and every downstream value is a
    chain of single IEEE ops over bit-identical inputs. At the
    default T=2 the power is emitted as sqrt — correctly rounded by
    IEEE 754, hence bit-identical across engines (other T values use
    pow, which engines round within an ulp of each other — fine for
    planning, not oracle-grade).

    Shape at scale: one per-source aggregate over the corpus (the
    only shuffle), then two one-row broadcasts (total tokens, weight
    normalizer) and pure arithmetic on the #sources-row frame."""
    inv = 1.0 / float(temperature)
    per_src = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
    )
    tot = per_src.agg(F.sum("n_tokens").alias("total_tokens"))
    p = "n_tokens / total_tokens"
    powed = f"sqrt({p})" if inv == 0.5 else f"power({p}, {inv})"
    w = per_src.crossJoin(F.broadcast(tot)).withColumn(
        "w_int", F.expr(f"CAST(floor({powed} * 1e9) AS BIGINT)"))
    z = w.agg(F.sum("w_int").alias("z"))
    share = F.col("w_int") / F.col("z")
    alloc = share * F.lit(float(token_budget))
    rate = F.least(F.lit(1.0), alloc / F.col("n_tokens"))
    rate_q = F.floor(rate * F.lit(1e6)) / F.lit(1e6)
    return w.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.floor(share * F.lit(1e6)) / F.lit(1e6)).alias("target_share"),
        rate_q.alias("rate"),
        F.floor(rate_q * F.col("n_tokens")).cast("long")
        .alias("planned_tokens"),
        (alloc > F.col("n_tokens")).alias("deficit"),
    ).orderBy("source")


def epoch_shard_plan(
    chunks: DataFrame,
    n_epochs: int = 2,
    n_shards: int = 4,
    key_cols: tuple[str, ...] = ("doc_id", "chunk_id"),
    carry_cols: tuple[str, ...] = ("n_toks",),
) -> DataFrame:
    """Multi-epoch training data order: for every epoch, a
    DETERMINISTIC reshuffle of the chunk set into `n_shards` reader
    shards with a per-shard consumption order —

        epoch, shard, position, *key_cols, *carry_cols

    Trainers need a different order each epoch, reproducible across
    job restarts and engines: the order key is md5(key..:epoch), so
    epoch e's permutation is a pure function of the chunk identity —
    no rand(), no zipWithIndex. The shard is an independent salt
    ('shard:'-prefixed hash) mod n_shards, so a chunk's shard ALSO
    changes per epoch (shard-local overfitting noise doesn't repeat).
    Positions are contiguous 0..n-1 within each (epoch, shard).

    Scale shape: epochs fan out via one bounded explode (n_epochs×
    rows); positions come from a window partitioned by (epoch, shard)
    — at production shard counts each partition is corpus/n_shards,
    never a global funnel. Everything is hash arithmetic inside
    codegen; one shuffle (the window's) total.
    """
    from pyspark.sql import Window

    keys = [F.col(c) for c in key_cols]
    e = chunks.select(
        *key_cols, *carry_cols,
        F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch"),
    )
    okey = F.md5(F.concat_ws(":", *keys, F.col("epoch")))
    skey = F.md5(F.concat_ws(":", F.lit("shard"), *keys, F.col("epoch")))
    shard = (
        F.conv(F.substring(skey, 1, 14), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("epoch", "shard").orderBy(
        F.col("_okey").asc(), *[k.asc() for k in keys]
    )
    return (
        e.withColumn("_okey", okey)
        .withColumn("shard", shard)
        .withColumn("position", F.row_number().over(w) - 1)
        .select("epoch", "shard", "position", *key_cols, *carry_cols)
    )


def _doc_feature_entries(documents: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, entries array<struct<b int, frac double>>, n_feats):
    per-doc hashed-gram bucket frequencies, length-normalized — the
    shared input of classifier training and scoring. One shuffle
    (per-doc aggregate over the feature stream)."""
    counts = (
        _hashed_gram_features(documents, n_buckets)
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("b", "c")).alias("raw"),
            F.sum("c").alias("n_feats"),
        )
        .select(
            "doc_id",
            "n_feats",
            F.expr(
                "transform(raw, e -> named_struct("
                "'b', e.b, 'frac', e.c / CAST(n_feats AS DOUBLE)))"
            ).alias("entries"),
        )
    )


def train_quality_classifier(
    documents: DataFrame,
    target: DataFrame,
    n_buckets: int = 512,
    seed: int = 42,
) -> tuple[float, list[float]]:
    """GPT-3-style quality classifier, trained on weak domain labels:
    positives = docs in `target` (the reference/high-quality slice),
    negatives = the rest of the corpus. Features are the same hashed
    uni+bigram buckets as DSIR, length-normalized; the model is
    pyspark.ml LogisticRegression — the INDEX-BUILD job, run once per
    corpus. Returns (intercept, weights[n_buckets]) — bounded model
    metadata (513 doubles) that scoring embeds as literals, so the
    steady-state score path is pure expression arithmetic with no ML
    runtime at all."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    entries = _doc_feature_entries(documents, n_buckets)
    tgt_ids = target.select("doc_id").distinct().withColumn(
        "_is_t", F.lit(1.0)
    )
    dense = F.expr(
        f"transform(sequence(0, {n_buckets - 1}), i -> "
        f"coalesce(element_at(mp, i), 0D))"
    )
    labeled = (
        entries.join(tgt_ids, "doc_id", "left")
        .withColumn(
            "mp", F.expr("map_from_entries(transform(entries, e -> (e.b, e.frac)))")
        )
        .select(
            "doc_id",
            F.coalesce(F.col("_is_t"), F.lit(0.0)).alias("label"),
            array_to_vector(dense).alias("features"),
        )
    )
    lr = LogisticRegression(
        maxIter=50, regParam=1e-3, featuresCol="features", labelCol="label"
    )
    model = lr.fit(labeled)
    return float(model.intercept), [float(w) for w in model.coefficients]


def score_quality_classifier(
    documents: DataFrame,
    intercept: float,
    weights: list[float],
    n_buckets: int = 512,
) -> DataFrame:
    """(doc_id, n_feats, quality_prob): P(target-quality | doc) under
    the trained classifier — the resampling weight feed
    (quality_weighted_sample accepts any score column). Map-shaped
    after the one per-doc feature aggregate: the fold visits only the
    doc's OWN feature entries (never the n_buckets array), weights
    ship as one literal array."""
    w_lit = F.array(*[F.lit(float(x)) for x in weights])
    z = F.expr(
        f"aggregate(entries, {float(intercept)}D, "
        f"(acc, e) -> acc + element_at(_w, CAST(e.b + 1 AS INT)) * e.frac)"
    )
    return (
        _doc_feature_entries(documents, n_buckets)
        .withColumn("_w", w_lit)
        .select(
            "doc_id",
            "n_feats",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
            .alias("quality_prob"),
        )
    )


def retrieval_eval(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """IR evaluation of ranked retrieval output against relevance
    judgments — the standard P@k / recall@k / MRR / NDCG@k panel
    (binary gains), computed the house's cross-engine-exact way:
    every metric is a RATIO OF INTEGERS. The NDCG discount weights
    round(1e6 / log2(rank+1)) ship as literal integer arrays, DCG
    and IDCG are integer sums (order-independent, exact), and the
    final divisions are single IEEE ops over bit-identical inputs,
    floor-quantized at 6dp — no transcendental evaluated at query
    time, so Spark and an oracle engine agree bit-for-bit.

    `ranked`: (query, rank, doc_id) with rank 1-based per query.
    `qrels`:  (query, doc_id) — the relevant set.
    Queries with zero relevant docs drop (recall/NDCG undefined);
    both sides of an oracle comparison share that inner-join rule.

    Shape at scale: ranked lists are per-query bounded (<= k rows
    survive the filter), so the relevance join and the per-query
    aggregate move O(#queries x k) rows — evaluation cost is
    independent of corpus size."""
    import itertools
    import math

    w = [round(1e6 / math.log2(i + 1)) for i in range(1, k + 1)]
    cum = list(itertools.accumulate(w))
    w_arr = "array(" + ", ".join(f"{x}L" for x in w) + ")"
    cum_arr = "array(" + ", ".join(f"{x}L" for x in cum) + ")"

    def q6(c):
        return F.floor(c * F.lit(1e6)) / F.lit(1e6)

    hits = (
        ranked.filter(F.col("rank") <= k)
        .join(
            qrels.select("query", "doc_id").distinct()
            .withColumn("__rel", F.lit(1)),
            ["query", "doc_id"], "left")
        .withColumn("__hit", F.coalesce("__rel", F.lit(0)))
    )
    per_q = hits.groupBy("query").agg(
        F.sum("__hit").alias("n_hits"),
        F.min(F.when(F.col("__hit") == 1, F.col("rank"))).alias("__first"),
        F.sum(
            F.when(
                F.col("__hit") == 1,
                F.expr(f"element_at({w_arr}, CAST(rank AS INT))"),
            ).otherwise(F.lit(0))
        ).alias("__dcg_int"),
    )
    n_rel = qrels.select("query", "doc_id").distinct().groupBy(
        "query").agg(F.count(F.lit(1)).alias("n_rel"))
    idcg = F.expr(
        f"element_at({cum_arr}, CAST(least({k}, n_rel) AS INT))")
    return (
        per_q.join(n_rel, "query")
        .select(
            "query",
            "n_rel",
            "n_hits",
            q6(F.col("n_hits") / F.lit(float(k))).alias("p_at_k"),
            q6(F.col("n_hits") / F.col("n_rel")).alias("recall_at_k"),
            F.coalesce(
                q6(F.lit(1.0) / F.col("__first")), F.lit(0.0)
            ).alias("mrr"),
            q6(F.col("__dcg_int") / idcg).alias("ndcg_at_k"),
        )
        .orderBy("query")
    )


def shard_manifest(
    plan: DataFrame,
    key_cols: tuple[str, ...] = ("doc_id", "chunk_id"),
    size_col: str = "n_toks",
) -> DataFrame:
    """(epoch, shard, n_chunks, n_toks, content_md5) — the manifest a
    trainer validates before consuming a shard: the md5 runs over the
    position-ordered "key..:len" lines, so any missing, extra,
    re-ordered or re-sized chunk changes the digest. One per-shard
    aggregate over the (already shard-partitioned) plan; the digest
    folds a sorted collect_list per key — shard-sized, bounded by the
    packing layout, never corpus-concatenated.

    `key_cols`/`size_col` mirror epoch_shard_plan's key_cols/
    carry_cols, so manifests work for any plan the sharder can emit.
    """
    line = F.concat_ws(
        ":", *[F.col(c) for c in key_cols], F.col(size_col)
    )
    return (
        plan.select(
            "epoch", "shard", "position",
            F.col(size_col).alias("_size"), line.alias("line"),
        )
        .groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("_size").alias("n_toks"),
            F.md5(
                F.concat_ws(
                    "\n",
                    F.expr(
                        "transform(array_sort(collect_list("
                        "named_struct('p', position, 'l', line))), e -> e.l)"
                    ),
                )
            ).alias("content_md5"),
        )
        .orderBy("epoch", "shard")
    )


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
    emit_tokens: bool = False,
) -> DataFrame:
    """Sliding-window RAG chunking: split each document's normalized
    token stream into windows of `chunk_tokens` with `overlap_tokens`
    shared between consecutive windows (stride = chunk − overlap) —
    the retrieval-granularity step between a raw corpus and a chunk
    index (BM25 or vector). Output one row per chunk:
    (doc_id, chunk_id, start_token, n_tokens, chunk_text).

    Windowing contract: chunk i covers tokens [i·stride, i·stride +
    chunk); n_chunks = max(1, ceil((n − overlap) / stride)), so every
    token lands in ≥1 chunk, the final chunk always contributes at
    least one new token, and a short document yields exactly one
    (possibly short) chunk. Zero-token documents yield zero chunks.

    Map-only JVM expressions end to end: tokenize once (let-bound
    array), generate the start sequence, posexplode, slice — no
    shuffle, no UDF; scales linearly with corpus bytes.
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap_tokens}) < chunk "
            f"({chunk_tokens})")
    stride = chunk_tokens - overlap_tokens
    d = documents.select(
        "doc_id", tokens(normalized_text("text")).alias("__toks")
    ).filter(F.size("__toks") > 0)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size("__toks") - F.lit(overlap_tokens))
               / F.lit(float(stride))).cast("int"),
    )
    starts = F.sequence(
        F.lit(0), (n_chunks - 1) * F.lit(stride), F.lit(stride))
    return (
        d.select(
            "doc_id", "__toks",
            F.posexplode(starts).alias("chunk_id", "start_token"),
        )
        .select(
            "doc_id", "chunk_id", "start_token",
            F.slice(
                "__toks", F.col("start_token") + 1, chunk_tokens
            ).alias("__c"),
        )
        .select(
            "doc_id", "chunk_id", "start_token",
            F.size("__c").alias("n_tokens"),
            F.array_join("__c", " ").alias("chunk_text"),
            # opt-in (schema-preserving when absent): the chunk's
            # token array, for consumers that would otherwise
            # re-normalize + re-split chunk_text (r14, guide §2.3).
            # Tokens are whitespace-free lowercase normal forms, so
            # tokens(normalized(array_join(c, ' '))) == c — the
            # identity the chunked-BM25 oracle already proves by
            # slicing token lists directly.
            *([F.col("__c").alias("chunk_toks")] if emit_tokens else []),
        )
    )


def bm25_search(
    documents: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    tokens_col: str | None = None,
) -> DataFrame:
    """BM25 ranking of the corpus for a bag-of-words query — the
    LEXICAL retrieval arm (Robertson/Lucene scoring):

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
        idf(t)   = ln(1 + (N − df_t + 0.5) / (df_t + 0.5))

    Corpus statistics (N, avgdl, per-term document frequencies) come
    from ONE tiny aggregate — |terms|+2 numbers — broadcast onto the
    scoring scan; tf per (doc, term) is an array filter over the
    let-bound token array. Zero shuffles beyond the stats row and the
    fused top-N. Output: (rank, doc_id, bm25), score rounded to 6 and
    ties broken by doc_id so the ranking is a total order both
    engines agree on.

    r14 (guide §2.3/§8 — decide with small rows): the stats aggregate
    and the scoring pass are two consumers of the tokenize subtree,
    and Spark evaluates an unshared subtree once PER consumer — the
    corpus was normalized + tokenized twice. Both consumers only need
    (doc_id, doc length, per-term tf): that reduced frame (a few ints
    per doc) is computed once and eagerly localCheckpointed inside
    this invocation, so the heavy string work runs exactly once. The
    arithmetic consumes the same integers the inline expressions
    produced (df == count of tf>0 == count of array_contains), so
    scores are bit-identical. `tokens_col` lets a pre-tokenized
    caller (the chunked pipeline) skip the re-tokenize entirely.
    """
    from pyspark.sql import Window

    if tokens_col is not None:
        d = documents.select("doc_id", F.col(tokens_col).alias("t"))
    else:
        d = documents.select(
            "doc_id", tokens(normalized_text("text")).alias("t"))

    def _tf(term: str) -> Column:
        # single-arg lambda: a two-arg one would receive (x, index)
        return F.size(F.filter(F.col("t"), lambda x: x == F.lit(term)))

    reduced = d.select(
        "doc_id",
        F.size("t").alias("__dl"),
        *[_tf(term).alias(f"tf_{i}") for i, term in enumerate(query_terms)],
    ).localCheckpoint(eager=True)
    stats = reduced.agg(
        F.count(F.lit(1)).alias("N"),
        F.avg("__dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = reduced.crossJoin(F.broadcast(stats))

    parts = []
    for i, _term in enumerate(query_terms):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("N") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        denom = tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("avgdl"))
        parts.append(idf * tf * (k1 + 1.0) / denom)
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    ranked = (
        scored.select("doc_id", F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return ranked.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "bm25"
    )
