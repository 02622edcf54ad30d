"""EXT incremental EMBEDDING ingestion with online index maintenance.

The third modality's streaming admission path (docs: corpus_ingest,
media: media_ingest): vectors arrive continuously, and the ANN index
artifacts the query layer depends on (IVF assignments, binary-
quantization codes) must stay queryable WITHOUT a full rebuild per
batch — at 100 TB a k-means refit per micro-batch is absurd, and an
unindexed backlog silently degrades every search until the nightly
build.

Per micro-batch (foreachBatch):
  1. AUDIT GATE — rows with NULL/wrong-dim/non-finite/zero-norm
     embeddings are diverted to a quarantine table with a reason
     column (the embedding_audit defect classes, applied at the
     door instead of after the corruption spreads);
  2. within-batch keep-first on vec_id;
  3. anti-join against the at-rest id index (full-history exact
     dedup — same shape as corpus_ingest's fingerprint index);
  4. INDEX MAINTENANCE against the FROZEN build artifacts: each
     admitted vector gets its IVF label by nearest-centroid
     assignment (the k-means centroids sidecar as a literal — a
     broadcast-free 10x64 constant folded into codegen) and its
     packed sign-bit code against the frozen per-dimension means
     (operators/similarity.binary_codes);
  5. append id index FIRST, then assignments + codes + vectors.

Write order (mirrors corpus_ingest's delivery note): ids land first,
so a crash between appends can lose a batch's vectors but can never
admit a duplicate; a retried batch anti-joins into a no-op. The
assignments/codes/vectors appends share the same batch frame
(localCheckpoint cuts the index scan out of the lineage, so the
id-index append cannot re-trigger the anti-join via recacheByPath —
the corpus_ingest bug class).

Index staleness: incremental assignment against frozen centroids is
exact IVF maintenance (the partition of space doesn't move), but the
centroids slowly stop being the k-means optimum of the GROWN corpus
and recall drifts. `staleness()` reports admitted-since-build vs
total so an operator (or a scheduler) can trigger `rebuild()` — a
full refit + sidecar swap, the periodic batch job — on a threshold
instead of a timer.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from clickhouse_observability_spark.operators import similarity as S

VEC_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
    ]
)


class VectorIngest:
    """File-fed streaming embedding ingestion with at-rest-index
    dedup and incremental ANN-index maintenance."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        inbox_dir: str,
        checkpoint_dir: str,
        dim: int = 64,
        n_clusters: int = 10,
        max_files_per_trigger: int = 8,
        trigger_ms: int = 100,
        neardup_hamming: int | None = None,
    ):
        self.spark = spark
        self.dim = dim
        self.n_clusters = n_clusters
        # optional SEMANTIC admission: reject vectors whose 64-bit BQ
        # code is within this hamming radius of anything already
        # admitted (probe = pigeonhole chunk-index bucket join, like
        # media_ingest's pHash path; None = id dedup only)
        self.neardup_hamming = neardup_hamming
        self.vectors_dir = os.path.join(store_dir, "vectors")
        self.reject_dir = os.path.join(store_dir, "rejected")
        ix = os.path.join(store_dir, "_index")
        self.ids_dir = os.path.join(ix, "ids")
        self.assign_dir = os.path.join(ix, "assignments")
        self.codes_dir = os.path.join(ix, "bq_codes")
        self.cent_dir = os.path.join(ix, "centroids")
        self.chunks_dir = os.path.join(ix, "bq_chunks")
        self.means_dir = os.path.join(ix, "bq_means")
        self.meta_path = os.path.join(ix, "build_meta.json")
        self.inbox_dir = inbox_dir
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.trigger_ms = trigger_ms
        self.query: StreamingQuery | None = None
        os.makedirs(inbox_dir, exist_ok=True)

    # -- producer side --------------------------------------------------
    def submit_many(self, vecs: Iterable[Mapping]) -> int:
        vecs = list(vecs)
        if not vecs:
            return 0
        name = uuid.uuid4().hex
        tmp = os.path.join(self.inbox_dir, f".{name}.jsonl.tmp")
        dst = os.path.join(self.inbox_dir, f"{name}.jsonl")
        with open(tmp, "w") as f:
            for v in vecs:
                f.write(json.dumps(dict(v)) + "\n")
        os.rename(tmp, dst)  # atomic publish
        return len(vecs)

    # -- index build / rebuild ------------------------------------------
    def bootstrap(self, embeddings: DataFrame) -> None:
        """Initial build from a seed corpus: k-means centroids + BQ
        means (the frozen artifacts), assignments + codes for the
        seed vectors, id index, and the vectors themselves."""
        emb = embeddings.select("vec_id", "embedding")
        assign, cent = S.kmeans_ivf_index(emb, n_clusters=self.n_clusters)
        means, codes = S.binary_index(emb, dim=self.dim)
        cent.coalesce(1).write.mode("overwrite").parquet(self.cent_dir)
        self.spark.createDataFrame(
            [(means,)], "mv array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(self.means_dir)
        emb.select("vec_id").write.mode("append").parquet(self.ids_dir)
        if self.neardup_hamming is not None:
            # seed the near-dup probe index so near-dups of SEED
            # vectors are rejected from the very first batch
            self._append_chunk_index(
                codes.select(F.col("bq")[0].alias("code")))
        assign.write.mode("append").parquet(self.assign_dir)
        codes.write.mode("append").parquet(self.codes_dir)
        emb.write.mode("append").parquet(self.vectors_dir)
        self._write_meta(n_at_build=emb.count())

    def rebuild(self) -> None:
        """Periodic full refit over everything admitted so far, then
        sidecar swap: assignments/codes are rewritten for the WHOLE
        corpus under the new artifacts (overwrite), the id index and
        vectors are untouched. Resets staleness to 0."""
        emb = self.read()
        assign, cent = S.kmeans_ivf_index(emb, n_clusters=self.n_clusters)
        means, codes = S.binary_index(emb, dim=self.dim)
        # materialize BEFORE overwriting the inputs they derive from
        assign = assign.localCheckpoint(eager=True)
        codes = codes.localCheckpoint(eager=True)
        cent.coalesce(1).write.mode("overwrite").parquet(self.cent_dir)
        self.spark.createDataFrame(
            [(means,)], "mv array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(self.means_dir)
        assign.write.mode("overwrite").parquet(self.assign_dir)
        codes.write.mode("overwrite").parquet(self.codes_dir)
        if self.neardup_hamming is not None:
            # refit moves the BQ means, so every chunk key changes:
            # rewrite the probe index from the new codes whole
            self._append_chunk_index(
                codes.select(F.col("bq")[0].alias("code")),
                mode="overwrite",
            )
        self._write_meta(n_at_build=emb.count())

    def _write_meta(self, n_at_build: int) -> None:
        os.makedirs(os.path.dirname(self.meta_path), exist_ok=True)
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_at_build": int(n_at_build)}, f)
        os.replace(tmp, self.meta_path)

    def staleness(self) -> dict:
        """{'n_total', 'n_at_build', 'stale_frac'}: share of the
        corpus admitted since the frozen artifacts were (re)built —
        the rebuild-policy signal."""
        n_total = self.read().count()
        with open(self.meta_path) as f:
            n_at_build = json.load(f)["n_at_build"]
        return {
            "n_total": n_total,
            "n_at_build": n_at_build,
            "stale_frac": round(1.0 - n_at_build / max(1, n_total), 6),
        }

    # -- admission ------------------------------------------------------
    def _frozen_artifacts(self) -> tuple[list[list[float]], list[float]]:
        cent_rows = sorted(
            self.spark.read.parquet(self.cent_dir).collect(),
            key=lambda r: r.label,
        )
        centroids = [list(r.cv) for r in cent_rows]
        means = list(self.spark.read.parquet(self.means_dir).collect()[0].mv)
        return centroids, means

    def _admit(self, batch_df: DataFrame, batch_id: int) -> None:
        v = F.col("embedding")
        # three-valued-logic trap: forall/isnan over a NULL element
        # yields NULL, not false, which would skip every when() branch
        # and ADMIT the row — so null elements get their own check
        # first, and the finite check runs on a null-free array
        has_null_elem = F.exists(v, lambda x: x.isNull())
        finite = F.forall(v, lambda x: ~F.isnan(x) & ~x.isin(
            float("inf"), float("-inf")
        ))
        norm2 = F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
        reason = (
            F.when(F.col("vec_id").isNull(), "null_id")
            .when(v.isNull(), "null_embedding")
            .when(F.size(v) != self.dim, "wrong_dim")
            .when(has_null_elem, "null_element")
            .when(~finite, "non_finite")
            .when(norm2 == 0.0, "zero_norm")
        )
        gated = batch_df.withColumn("reject_reason", reason)
        bad = gated.filter(F.col("reject_reason").isNotNull())
        # quarantine keyed by batch dir + OVERWRITE: a Spark retry of
        # the same batch replaces its own rejects instead of
        # double-counting them (admission is already idempotent via
        # the id/chunk indexes; the reject side must match)
        ok = gated.filter(F.col("reject_reason").isNull()).drop("reject_reason")

        # within-batch collapse on vec_id (one winner per id; a batch
        # frame has no arrival order, so the winner is the
        # deterministic array-min — same id + same payload, the common
        # case, is unaffected), then full-history anti-join
        first = ok.groupBy("vec_id").agg(F.min("embedding").alias("embedding"))
        if os.path.exists(self.ids_dir):
            known = self.spark.read.parquet(self.ids_dir)
            first = first.join(known, "vec_id", "left_anti")

        centroids, means = self._frozen_artifacts()
        coded = S.binary_codes(
            first.select("vec_id", "embedding"), means, dim=self.dim
        )

        # -- SEMANTIC admission (optional): reject vectors whose BQ
        # code sits within `neardup_hamming` of anything already
        # admitted — within this batch (greedy, smaller id wins) or
        # in the at-rest chunk index (pigeonhole bucket probe, the
        # media_ingest pHash shape; never a scan)
        if self.neardup_hamming is not None:
            from clickhouse_observability_spark.operators.dedup import (
                hamming_pairs,
                pigeonhole_chunk_key,
            )

            r = self.neardup_hamming
            n_chunks = r + 1
            c64 = coded.withColumn("code", F.col("bq")[0])
            batch_dups = hamming_pairs(
                c64, "vec_id", "code", r, out_a="keep", out_b="drop"
            ).select(F.col("drop").alias("vec_id")).distinct()
            dup_ids = batch_dups
            if os.path.exists(self.chunks_dir):
                idx = self.spark.read.parquet(self.chunks_dir)
                probes = c64.select(
                    "vec_id", "code",
                    F.explode(F.array(*[
                        F.struct(
                            F.lit(c).alias("chunk"),
                            pigeonhole_chunk_key("code", c, n_chunks)
                            .alias("key"),
                        )
                        for c in range(n_chunks)
                    ])).alias("cc"),
                ).select(
                    "vec_id", "code",
                    F.col("cc.chunk").alias("chunk"),
                    F.col("cc.key").alias("key"),
                )
                ham = F.bit_count(
                    F.col("code").bitwiseXOR(F.col("idx_code")))
                hist_dups = (
                    probes.join(
                        idx.withColumnRenamed("code", "idx_code"),
                        ["chunk", "key"],
                    )
                    .filter(ham <= r)
                    .select("vec_id")
                    .distinct()
                )
                dup_ids = dup_ids.unionByName(hist_dups).distinct()
            dup_ids = dup_ids.localCheckpoint(eager=True)
            bad = bad.unionByName(
                first.join(dup_ids, "vec_id", "left_semi")
                .withColumn("reject_reason", F.lit("near_duplicate"))
                .select(*bad.columns)
            )
            first = first.join(dup_ids, "vec_id", "left_anti")
            coded = coded.join(dup_ids, "vec_id", "left_anti")

        bad.write.mode("overwrite").parquet(
            os.path.join(self.reject_dir, f"batch={int(batch_id)}")
        )

        cents = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
        )
        k = len(centroids)
        dist = (
            "aggregate(zip_with(embedding, _cents[c], "
            "(x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)"
        )
        label = F.expr(
            f"aggregate(sequence(0, {k - 1}), "
            f"named_struct('d', double('Infinity'), 'l', -1), "
            f"(acc, c) -> CASE WHEN {dist} < acc.d "
            f"THEN named_struct('d', {dist}, 'l', c) ELSE acc END).l"
        ).cast("int")
        admitted = (
            first.withColumn("_cents", cents)
            .withColumn("label", label)
            .drop("_cents")
            .join(coded, "vec_id")
            # cut the id-index scan out of the lineage BEFORE the
            # index append (recacheByPath would re-run the anti-join
            # against this batch's own ids — corpus_ingest bug class)
            .localCheckpoint(eager=True)
        )
        # ids first, then the near-dup chunk index, then payloads:
        # duplicates (exact OR semantic) unadmittable even on
        # crash-retry
        admitted.select("vec_id").write.mode("append").parquet(self.ids_dir)
        if self.neardup_hamming is not None:
            from clickhouse_observability_spark.operators.dedup import (
                pigeonhole_chunk_key,
            )

            self._append_chunk_index(
                admitted.select(F.col("bq")[0].alias("code")))
        admitted.select("vec_id", "label").write.mode("append").parquet(
            self.assign_dir
        )
        admitted.select("vec_id", "bq").write.mode("append").parquet(
            self.codes_dir
        )
        admitted.select("vec_id", "embedding").write.mode("append").parquet(
            self.vectors_dir
        )

    def _append_chunk_index(
        self, codes64: DataFrame, mode: str = "append"
    ) -> None:
        """(chunk, key, code) rows for the at-rest near-dup probe
        index — one row per pigeonhole chunk per admitted code."""
        from clickhouse_observability_spark.operators.dedup import (
            pigeonhole_chunk_key,
        )

        n_chunks = self.neardup_hamming + 1
        rows = codes64.select(
            "code",
            F.explode(F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    pigeonhole_chunk_key("code", c, n_chunks).alias("key"),
                )
                for c in range(n_chunks)
            ])).alias("cc"),
        ).select(
            F.col("cc.chunk").alias("chunk"),
            F.col("cc.key").alias("key"),
            "code",
        )
        rows.write.mode(mode).parquet(self.chunks_dir)

    # -- stream lifecycle ----------------------------------------------
    def start(self) -> StreamingQuery:
        src = (
            self.spark.readStream.schema(VEC_WIRE_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .option("mode", "DROPMALFORMED")
            .json(self.inbox_dir)
        )
        self.query = (
            src.writeStream.trigger(
                processingTime=f"{self.trigger_ms} milliseconds"
            )
            .option("checkpointLocation", self.checkpoint_dir)
            .foreachBatch(self._admit)
            .start()
        )
        return self.query

    def stop(self, drain: bool = True) -> None:
        if self.query is None:
            return
        if drain:
            self.query.processAllAvailable()
        self.query.stop()
        self.query = None

    # -- read side ------------------------------------------------------
    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.vectors_dir)

    def assignments(self) -> DataFrame:
        return self.spark.read.parquet(self.assign_dir)

    def codes(self) -> DataFrame:
        return self.spark.read.parquet(self.codes_dir)

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(self.cent_dir)

    def rejected(self) -> DataFrame:
        return self.spark.read.option("basePath", self.reject_dir).parquet(
            self.reject_dir + "/batch=*"
        ).drop("batch")
