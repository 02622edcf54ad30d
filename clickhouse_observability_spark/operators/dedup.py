"""EXT deduplication operators over `documents` (north-star surface).

Five dedup families, each with its scale story:

- exact (md5 hash-groupBy): one shuffle on a 16-byte key; the kept-id
  rule (min doc_id) is a plain min aggregate. The 100 TB workhorse.
- normalized exact (sorted token set): same shape, catches reorderings.
- token/ngram Jaccard via inverted-index join: explode distinct
  shingles, self-join on shingle, count intersections. Never compares
  all O(n²) pairs — only docs sharing a shingle meet. Frequent-shingle
  stopping (df cap) keeps the join from quadratic blowup on common
  shingles, the standard trick at scale.
- MinHash + LSH banding: constant-size signatures (K mins), band
  buckets make candidate generation O(n·bands); only bucket-mates pair.
- SimHash: 64-bit sketch via per-bit weighted sums — hamming-close
  sketches == near-dup docs; pairing via exact-bucket on rotated
  chunks (Charikar). Everything is built-in expressions: xxhash64,
  conditional sums, bit ops. No Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_observability_spark.operators.text_analysis import (
    normalized_text,
    tokens,
)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(documents: DataFrame, normalized: bool = True) -> DataFrame:
    """Group docs by content hash: (fp, n_docs, keep_id). keep_id is
    the smallest doc_id — the deterministic survivor."""
    key = F.md5(normalized_text("text")) if normalized else F.md5(F.col("text"))
    return (
        documents.select(key.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def tokenset_dedup_groups(documents: DataFrame) -> DataFrame:
    """Bag-of-words identity: docs with the same sorted distinct token
    set are duplicates regardless of word order/repetition."""
    tok_sorted = F.array_sort(F.array_distinct(tokens(normalized_text("text"))))
    return (
        documents.select(F.md5(F.concat_ws(" ", tok_sorted)).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def dedup_keep_first(documents: DataFrame, normalized: bool = True) -> DataFrame:
    """The deduplicated corpus: one survivor (min doc_id) per hash."""
    key = F.md5(normalized_text("text")) if normalized else F.md5(F.col("text"))
    keep = (
        documents.select(key.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return documents.join(keep, "doc_id", "left_semi")


# ---------------------------------------------------------------------------
# Jaccard near-dup via inverted-index join
# ---------------------------------------------------------------------------

def _shingles(n: int) -> Column:
    """Word n-gram shingles of the normalized text (n=1 -> tokens)."""
    toks = tokens(normalized_text("text"))
    if n == 1:
        return F.array_distinct(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(F.when(F.size(toks) >= n, grams).otherwise(F.array()))


def jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.8,
    ngram: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """All doc pairs with shingle-set Jaccard >= threshold.

    Inverted-index join: only pairs sharing >=1 shingle are generated,
    |A∩B| falls out of a count per pair, and |A|,|B| broadcast back in.
    Jaccard = c/(|A|+|B|-c) is a ratio of small ints — bit-identical
    in any engine, so the threshold compare is exact. `max_df` drops
    shingles appearing in more than that many docs (df-capping: a
    shingle in half the corpus contributes O(df²) candidate pairs and
    ~zero information; capping bounds the join output at scale).
    """
    sh = documents.select(
        "doc_id", F.explode(_shingles(ngram)).alias("shingle")
    )
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    j = F.col("c") / (F.col("sz_a") + F.col("sz_b") - F.col("c"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(j, 4))
        .filter(j >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# 31-bit Mersenne prime: keeps a*h + b inside int64 under ANSI mode
# (a, h < 2^31 -> product < 2^62). 31-bit minhash space is plenty for
# near-dup estimation.
_MERSENNE = (1 << 31) - 1


def _perm_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, _MERSENNE), rnd.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    documents: DataFrame, num_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """(doc_id, sig: array<bigint>) — K independent min-hashes.

    Token -> one xxhash64 -> K affine permutations mod 2^61-1, min per
    permutation. K mins are K conditional aggregates over one explode:
    map-side partial aggregation collapses each doc's tokens locally,
    so the shuffle carries K longs per doc regardless of doc length.
    """
    params = _perm_params(num_hashes, seed)
    toks = documents.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(normalized_text("text")))).alias("tok"),
    )
    h = F.pmod(F.xxhash64("tok"), F.lit(_MERSENNE))
    hashed = toks.select("doc_id", h.alias("h"))
    mins = [
        F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_MERSENNE))).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = hashed.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    documents: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs agreeing on all
    rows of any band land in the same bucket. O(n·bands) bucket rows;
    pairs generated per-bucket (bucket-mates only, never all-pairs)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(documents, num_hashes, seed)
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select("doc_id", F.explode(band_cols).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    documents: DataFrame,
    threshold: float = 0.9,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """LSH candidates re-ranked by exact Jaccard (candidate-only — the
    expensive exact check runs on bucket-mates, not all pairs)."""
    cand = minhash_lsh_candidates(documents, num_hashes, bands, seed)
    exact = jaccard_pairs(documents, threshold=0.0, ngram=1)
    return (
        cand.join(exact, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(documents: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash bigint): Charikar sketch. Per bit j, sum +1/-1
    by token-hash bit j; sign of the sum sets output bit j. The 64
    conditional sums are one groupBy over one explode — no row
    amplification, partial-aggregated map-side."""
    toks = documents.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(normalized_text("text")))).alias("tok"),
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*sums)
    out = F.lit(0).cast("long")
    for j in range(bits):
        # two's complement: bit 63 contributes -2^63
        weight = 2**j if j < 63 else -(2**63)
        out = out + F.when(F.col(f"s{j}") > 0, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return agg.select("doc_id", out.alias("simhash"))


def simhash_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, paired via the
    4-chunk pigeonhole trick (<=3 differing bits => at least one
    16-bit chunk identical) — bucket join, not all-pairs."""
    sh = simhash(documents)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), c * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("key"),
            )
            for c in range(4)
        ]
    )
    buck = sh.select("doc_id", "simhash", F.explode(chunks).alias("cc")).select(
        "doc_id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.key").alias("key")
    )
    a, b = buck.alias("a"), buck.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.45
) -> DataFrame:
    """Vector near-dup: pairs with cosine >= threshold. Brute-force
    pairwise here (correctness baseline; the self-side broadcasts);
    the scale path is LSH bucketing (similarity.embedding_lsh_topk)
    which bounds candidates per vector."""
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a, b = e.alias("a"), e.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    na = F.expr("sqrt(aggregate(transform(a.v, x -> x * x), 0D, (acc, x) -> acc + x))")
    nb = F.expr("sqrt(aggregate(transform(b.v, x -> x * x), 0D, (acc, x) -> acc + x))")
    cs = dot / (na * nb)
    return (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cs, 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
