"""Driver-adjudicated storage-lifecycle entries (r7).

The r6 verdict's two open adjudication gaps were the PROJECTION
serving path and the MUTATION rewrite path — both pytest-proven but
never checked by the driver's independent DuckDB oracle. These two
entries close that: each builds a real partitioned logs table from
the `events` testdata at a scratch warehouse path (the same
artifacts-at-rest pattern the ANN index entries use), drives the CH
statement surface against it through ``ch_sql``, and returns a read
whose oracle is plain SQL over `events` with the lifecycle operation
folded in algebraically.

- ``projection_served_panel``: ADD PROJECTION + MATERIALIZE
  PROJECTION, then serve two GROUP BY grains. The callable RAISES
  unless every input file of both arms is a projection-state file
  (``_mv/``), so a green CORRECTNESS row proves the ROUTED answer —
  served from mergeable states, including the coarser-grain re-merge —
  equals the direct aggregate (reference context: ClickHouse
  projection optimizer; routing lives in
  functions/ch_dialect.py:_route_projection).
- ``mutation_post_read``: ALTER TABLE DELETE WHERE + ALTER TABLE
  UPDATE WHERE (sources/mutations.py — predicate-pruned partition
  rewrites), then the full post-mutation table; the oracle applies
  the delete predicate and folds the update assignment as a CASE.

Scale note: the builds are sf-sized by construction (one insert of
the events block); the served read is O(state rows) and the mutation
is one pruned scan + one partitioned overwrite — the same plans the
pytest layer pins, now value-adjudicated cross-engine.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from clickhouse_observability_spark.registry import register, table
from clickhouse_observability_spark.sources import index_store as IX

# events -> logs column mapping, shared VERBATIM between the Spark
# build below and the DuckDB oracles (any drift breaks both entries
# loudly): service=event_type, level derived deterministically from
# user_id, msg/attrs=props, trace_id/span_id = stringified ids.
_LOGS_CTE = """
    SELECT ts, event_type AS service,
           CASE WHEN user_id % 5 = 0 THEN 'ERROR' ELSE 'INFO' END AS level,
           props AS msg, user_id::VARCHAR AS trace_id,
           event_id::VARCHAR AS span_id
    FROM events
"""


def _build_logs_from_events(spark, sf_dir: str, name: str):
    """Materialize a fresh logs table from `events` at a scratch
    warehouse path. Rebuilt on EVERY call: mutations are destructive
    and projections carry state, so serving a cached table would make
    the entry's result depend on run history."""
    from clickhouse_observability_spark.sources.writer import LogsTable

    path = IX.artifact_path(sf_dir, name, source_table="events")
    shutil.rmtree(path, ignore_errors=True)
    t = LogsTable(spark, path)
    t.init_schema()
    ev = table(spark, sf_dir, "events")
    t.insert(
        ev.select(
            F.col("ts"),
            F.col("event_type").alias("service"),
            F.when(F.col("user_id") % 5 == 0, "ERROR")
            .otherwise("INFO")
            .alias("level"),
            F.col("props").alias("msg"),
            F.col("props").alias("attrs"),
            F.col("user_id").cast("string").alias("trace_id"),
            F.col("event_id").cast("string").alias("span_id"),
        )
    )
    return t


def _assert_served_from_states(df, what: str):
    """The panel's contract is that the answer came FROM the
    projection's mergeable states — a silent fallback to the base
    scan would still produce equal values, so the proof must fail
    loudly instead of degrading."""
    files = df.inputFiles()
    if not files or not all("_mv" in f for f in files):
        raise RuntimeError(
            f"projection_served_panel: {what} was NOT served from "
            f"projection states (inputFiles={files[:3]}...)"
        )


@register(
    "projection_served_panel",
    oracle=f"""
    WITH logs AS ({_LOGS_CTE})
    SELECT 'hour_service' AS op, date_trunc('hour', ts) AS h, service,
           count(*) AS n, sum(length(msg))::BIGINT AS sum_len,
           round(avg(length(msg)), 4) AS avg_len,
           CAST(NULL AS VARCHAR) AS min_span,
           CAST(NULL AS VARCHAR) AS max_span
    FROM logs GROUP BY 2, 3
    UNION ALL
    SELECT 'service', CAST(NULL AS TIMESTAMP), service,
           count(*), sum(length(msg))::BIGINT,
           CAST(NULL AS DOUBLE), min(span_id), max(span_id)
    FROM logs GROUP BY 3
    """,
)
def projection_served_panel(spark, sf_dir):
    """CH projections end-to-end under the driver's gate: attach an
    aggregate projection, MATERIALIZE it (backfill to states), then
    answer (1) the projection-grain GROUP BY and (2) the coarser
    service-only grain — the states re-merge: counts/sums add, avg
    re-divides its sum+count, min/max fold. Both arms assert they
    were served from state files; the oracle is the plain aggregate
    over the same source rows, so green = routed ≡ direct."""
    from clickhouse_observability_spark.functions.ch_dialect import ch_sql

    t = _build_logs_from_events(spark, sf_dir, "ch_logs_proj")
    ch_sql(
        spark,
        "ALTER TABLE logs ADD PROJECTION hour_svc ("
        "SELECT toStartOfHour(ts) AS h, service, count() AS n, "
        "sum(length(msg)) AS sum_len, avg(length(msg)) AS avg_len, "
        "min(span_id) AS min_span, max(span_id) AS max_span "
        "FROM logs GROUP BY h, service)",
        logs=t,
    )
    ch_sql(spark, "ALTER TABLE logs MATERIALIZE PROJECTION hour_svc", logs=t)

    fine = ch_sql(
        spark,
        "SELECT toStartOfHour(ts) AS h, service, count() AS n, "
        "sum(length(msg)) AS sum_len, avg(length(msg)) AS avg_len "
        "FROM logs GROUP BY h, service",
        logs=t,
    )
    _assert_served_from_states(fine, "hour_service grain")
    coarse = ch_sql(
        spark,
        "SELECT service, count() AS n, sum(length(msg)) AS sum_len, "
        "min(span_id) AS min_span, max(span_id) AS max_span "
        "FROM logs GROUP BY service",
        logs=t,
    )
    _assert_served_from_states(coarse, "service re-merge grain")

    fine = fine.select(
        F.lit("hour_service").alias("op"),
        "h",
        "service",
        "n",
        "sum_len",
        F.round("avg_len", 4).alias("avg_len"),
        F.lit(None).cast("string").alias("min_span"),
        F.lit(None).cast("string").alias("max_span"),
    )
    coarse = coarse.select(
        F.lit("service").alias("op"),
        F.lit(None).cast("timestamp").alias("h"),
        "service",
        "n",
        "sum_len",
        F.lit(None).cast("double").alias("avg_len"),
        "min_span",
        "max_span",
    )
    return fine.unionByName(coarse)


@register(
    "mutation_post_read",
    oracle=f"""
    WITH logs AS ({_LOGS_CTE}),
    m1 AS (SELECT * FROM logs WHERE NOT (service = 'error')),
    m2 AS (
        SELECT ts, service, level,
               CASE WHEN service = 'click' AND level = 'ERROR'
                    THEN msg || '#mut' ELSE msg END AS msg,
               trace_id, span_id
        FROM m1
    )
    SELECT ts, service, level, msg, trace_id, span_id FROM m2
    """,
)
def mutation_post_read(spark, sf_dir):
    """CH mutations end-to-end under the driver's gate: DELETE WHERE
    drops one service, UPDATE ... WHERE rewrites matching msg rows in
    place (both as predicate-pruned partition rewrites), then the
    whole table reads back. The oracle re-derives the post-mutation
    table algebraically — delete as NOT(pred), update as a CASE — so
    a green row proves the rewrite changed exactly the matched rows
    and nothing else."""
    from clickhouse_observability_spark.functions.ch_dialect import ch_sql

    t = _build_logs_from_events(spark, sf_dir, "ch_logs_mut")
    ch_sql(spark, "ALTER TABLE logs DELETE WHERE service = 'error'", logs=t)
    ch_sql(
        spark,
        "ALTER TABLE logs UPDATE msg = concat(msg, '#mut') "
        "WHERE service = 'click' AND level = 'ERROR'",
        logs=t,
    )
    return ch_sql(
        spark,
        "SELECT ts, service, level, msg, trace_id, span_id FROM logs",
        logs=t,
    )


@register(
    "lifecycle_partition_panel",
    oracle="""
    WITH logs AS (
        SELECT ts + to_days((32 * (user_id % 3))::INT) AS ts,
               event_type AS service, props AS msg
        FROM events
    ),
    agg AS (SELECT CAST(strftime(ts, '%Y%m') AS BIGINT) AS month,
                   service, count(*) AS n,
                   sum(length(msg))::BIGINT AS sum_len
            FROM logs GROUP BY 1, 2)
    SELECT 'detached' AS op, month, service, n, sum_len FROM agg
    WHERE month > (SELECT min(month) FROM agg)
    UNION ALL
    SELECT 'attached' AS op, month, service, n, sum_len FROM agg
    """,
)
def lifecycle_partition_panel(spark, sf_dir):
    """CH partition lifecycle end-to-end under the driver's gate (r8,
    verdict #6): DETACH PARTITION parks the earliest month under
    `_detached/` (a metadata directory move — no data rewritten),
    the 'detached' arm reads the table WITHOUT that month, ATTACH
    restores it byte-identically and the 'attached' arm reads the
    full set. The oracle folds the lifecycle algebraically: the
    detached arm is the plain aggregate minus the min month, the
    attached arm the full aggregate — green = the metadata-move
    layer preserves exactly the parked rows (and ONLY those: the
    surviving months' values must match the oracle byte-for-byte).

    The testdata's events span a single month, so this build spreads
    ts across three months deterministically (+32 days x user_id%3 —
    day arithmetic on both sides; month arithmetic would invite
    end-of-month clamp divergence). Each arm is eagerly materialized
    BEFORE the next statement runs (the reads are lazy; without the
    checkpoint both arms would see the final attached state), and
    each arm RAISES if the detached month is (still/already)
    visible — a silent no-op DETACH/ATTACH must fail loudly, not
    hash-match by accident."""
    from clickhouse_observability_spark.functions.ch_dialect import ch_sql
    from clickhouse_observability_spark.sources import index_store as IX
    from clickhouse_observability_spark.sources.writer import LogsTable

    path = IX.artifact_path(sf_dir, "ch_logs_lifecycle",
                            source_table="events")
    shutil.rmtree(path, ignore_errors=True)
    t = LogsTable(spark, path)
    t.init_schema()
    ev = table(spark, sf_dir, "events")
    t.insert(
        ev.select(
            F.expr("timestampadd(DAY, 32 * CAST(user_id % 3 AS INT), ts)")
            .alias("ts"),
            F.col("event_type").alias("service"),
            F.lit("INFO").alias("level"),
            F.col("props").alias("msg"),
            F.col("props").alias("attrs"),
            F.col("user_id").cast("string").alias("trace_id"),
            F.col("event_id").cast("string").alias("span_id"),
        )
    )
    # live months from the partition directories (CH system.parts is
    # metadata, not a scan) — the insert's partitionBy creates exactly
    # one dir per non-empty month, so this equals the old
    # distinct().collect() minus one Spark job (r14, guide §5)
    from clickhouse_observability_spark.sources.tiering import (
        partition_months,
    )

    first = int(partition_months(t.path)[0])

    def arm(tag):
        df = ch_sql(
            spark,
            "SELECT month, service, count() AS n, "
            "sum(length(msg)) AS sum_len FROM logs "
            "GROUP BY month, service",
            logs=t,
        ).select(
            F.lit(tag).alias("op"),
            F.col("month").cast("long").alias("month"),
            "service", "n", "sum_len",
        )
        return df.localCheckpoint(eager=True)

    ch_sql(spark, f"ALTER TABLE logs DETACH PARTITION {first}", logs=t)
    det = arm("detached")
    if det.filter(F.col("month") == first).count() != 0:
        raise RuntimeError(
            f"lifecycle_partition_panel: month {first} still visible "
            "after DETACH PARTITION")
    ch_sql(spark, f"ALTER TABLE logs ATTACH PARTITION {first}", logs=t)
    att = arm("attached")
    if att.filter(F.col("month") == first).count() == 0:
        raise RuntimeError(
            f"lifecycle_partition_panel: month {first} missing "
            "after ATTACH PARTITION")
    return det.unionByName(att)


@register(
    "lifecycle_schema_evolution_panel",
    oracle=f"""
    WITH logs AS ({_LOGS_CTE}),
    evolved AS (
        SELECT service, level, 'e-' || service AS env FROM logs
        UNION ALL
        SELECT 'ingest-2' AS service, 'INFO' AS level, 'fresh' AS env
        FROM events WHERE event_type = 'click'
    ),
    mutated AS (
        SELECT service,
               CASE WHEN level = 'ERROR' THEN 'mut' ELSE env END AS env
        FROM evolved
    )
    SELECT service, env AS environment, count(*) AS n
    FROM mutated GROUP BY 1, 2
    """,
)
def lifecycle_schema_evolution_panel(spark, sf_dir):
    """CH schema evolution end-to-end under the driver's gate (r8):
    ALTER TABLE ADD COLUMN with a DEFAULT referencing another column
    (old files serve it on READ — metadata-only, zero rewrite), an
    INSERT that writes the evolved column explicitly, an UPDATE
    mutation that both ASSIGNS the evolved column and MATERIALIZES
    it into the rewritten files, then RENAME COLUMN (old physical
    names keep serving through the alias chain). The oracle folds
    the whole sequence algebraically over `events`, so a green row
    proves default-on-read, explicit write, mutation
    materialization, and rename continuity all at once
    (sources/schema_evolution.py; CH ADD COLUMN semantics)."""
    from clickhouse_observability_spark.functions.ch_dialect import ch_sql

    t = _build_logs_from_events(spark, sf_dir, "ch_logs_schema_evo")
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT "
           "concat('e-', service)", logs=t)
    t = _reload(spark, t)  # metadata round-trips through the sidecar
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click")
    t.insert(
        ev.select(
            F.col("ts"),
            F.lit("ingest-2").alias("service"),
            F.lit("INFO").alias("level"),
            F.col("props").alias("msg"),
            F.col("props").alias("attrs"),
            F.col("user_id").cast("string").alias("trace_id"),
            F.col("event_id").cast("string").alias("span_id"),
            F.lit("fresh").alias("env"),
        )
    )
    ch_sql(spark, "ALTER TABLE logs UPDATE env = 'mut' "
           "WHERE level = 'ERROR'", logs=t)
    ch_sql(spark, "ALTER TABLE logs RENAME COLUMN env TO environment",
           logs=t)
    t = _reload(spark, t)
    return ch_sql(
        spark,
        "SELECT service, environment, count() AS n FROM logs "
        "GROUP BY service, environment",
        logs=t,
    )


def _reload(spark, t):
    from clickhouse_observability_spark.sources.writer import LogsTable

    return LogsTable(spark, t.path)


@register(
    "lifecycle_cross_table_panel",
    oracle="""
    WITH logs AS (
        SELECT ts + to_days((32 * (user_id % 3))::INT) AS ts,
               event_type AS service, props AS msg
        FROM events
    ),
    agg AS (SELECT CAST(strftime(ts, '%Y%m') AS BIGINT) AS month,
                   service, count(*) AS n,
                   sum(length(msg))::BIGINT AS sum_len
            FROM logs GROUP BY 1, 2),
    m AS (SELECT min(month) AS lo,
                 (SELECT DISTINCT month FROM agg
                  ORDER BY month LIMIT 1 OFFSET 1) AS mid
          FROM agg)
    SELECT 'src_after_move' AS op, month, service, n, sum_len
    FROM agg, m WHERE month > lo
    UNION ALL
    SELECT 'dst_after_move', month, service, n, sum_len
    FROM agg, m WHERE month = lo
    UNION ALL
    SELECT 'dirty', month, service, n,
           CASE WHEN month = mid THEN sum_len + 6 * n ELSE sum_len END
    FROM agg, m WHERE month <= mid
    UNION ALL
    SELECT 'replaced', month, service, n, sum_len
    FROM agg, m WHERE month <= mid
    UNION ALL
    SELECT 'exchanged', month, service, n, sum_len
    FROM agg, m WHERE month <= mid
    """,
)
def lifecycle_cross_table_panel(spark, sf_dir):
    """Cross-table partition movement under the driver's gate (r8
    wave 4): two tables built at scratch paths, then

    1. ``MOVE PARTITION lo TO TABLE b`` — directory rename between
       tables; arms read the source (lost the month) and the
       destination (gained exactly it).
    2. ``ATTACH PARTITION mid FROM a`` — HARDLINK copy, source
       untouched.
    3. an UPDATE mutation dirties b's copy of mid (`msg || '#dirty'`,
       6 chars -> the oracle's `sum_len + 6*n` fold). Because the
       attach hardlinked a's files, this arm also adjudicates the
       replace-never-modify invariant: the mutation must REWRITE
       b's files, leaving a's shared bytes clean.
    4. ``REPLACE PARTITION mid FROM a`` — swaps b's dirty month for
       a's clean one; values revert, proving the replace actually
       installed the source files (a no-op would keep the dirty
       sums and hash-mismatch).
    5. ``EXCHANGE TABLES a AND b`` — the read routes through the
       swapped name mapping; the 'exchanged' arm queries name `a`
       and must see b's physical content.

    Every arm is eagerly checkpointed before the next statement (the
    reads are lazy), and steps with an invariant RAISE instead of
    returning wrong-but-plausible rows."""
    from clickhouse_observability_spark.functions.ch_dialect import ch_sql
    from clickhouse_observability_spark.sources.writer import LogsTable

    paths = {}
    for nm in ("a", "b"):
        p = IX.artifact_path(sf_dir, f"ch_logs_xtab_{nm}",
                             source_table="events")
        shutil.rmtree(p, ignore_errors=True)
        paths[nm] = p
    ta = LogsTable(spark, paths["a"])
    ta.init_schema()
    tb = LogsTable(spark, paths["b"])
    tb.init_schema()
    ev = table(spark, sf_dir, "events")
    ta.insert(
        ev.select(
            F.expr("timestampadd(DAY, 32 * CAST(user_id % 3 AS INT), ts)")
            .alias("ts"),
            F.col("event_type").alias("service"),
            F.lit("INFO").alias("level"),
            F.col("props").alias("msg"),
            F.col("props").alias("attrs"),
            F.col("user_id").cast("string").alias("trace_id"),
            F.col("event_id").cast("string").alias("span_id"),
        )
    )
    # months from the partition layout (metadata, no Spark job — same
    # rationale as lifecycle_partition_panel, r14)
    from clickhouse_observability_spark.sources.tiering import (
        partition_months,
    )

    months = partition_months(ta.path)
    lo, mid = months[0], months[1]
    tables = {"a": ta, "b": tb}

    def arm(tag, t):
        df = ch_sql(
            spark,
            "SELECT month, service, count() AS n, "
            "sum(length(msg)) AS sum_len FROM logs "
            "GROUP BY month, service",
            logs=t,
        ).select(
            F.lit(tag).alias("op"),
            F.col("month").cast("long").alias("month"),
            "service", "n", "sum_len",
        )
        return df.localCheckpoint(eager=True)

    ch_sql(spark, f"ALTER TABLE a MOVE PARTITION {lo} TO TABLE b",
           tables=tables)
    src_arm = arm("src_after_move", ta)
    dst_arm = arm("dst_after_move", tb)
    # physical-layout check straight off the destination's partition
    # dirs (stronger than re-collecting the checkpointed arm, and one
    # Spark job less — the arm's VALUES are what the oracle gates)
    if partition_months(tb.path) != [lo]:
        raise RuntimeError(
            f"cross_table_panel: destination should hold exactly {lo} "
            "after MOVE PARTITION")

    ch_sql(spark, f"ALTER TABLE b ATTACH PARTITION {mid} FROM a",
           tables=tables)
    ch_sql(spark, "ALTER TABLE logs UPDATE msg = concat(msg, '#dirty') "
           f"WHERE month = {mid}", logs=tb)
    dirty_arm = arm("dirty", tb)
    # the attach hardlinked a's files: the mutation must have
    # REPLACED b's files, never modified the shared bytes — only
    # month `mid`'s files are shared, so the check prunes to that
    # partition (same invariant, 1/2 the scan; r14 guide §6)
    a_dirty = LogsTable(spark, paths["a"]).read().filter(
        (F.col("month") == mid) & F.col("msg").contains("#dirty")).count()
    if a_dirty:
        raise RuntimeError(
            "cross_table_panel: mutation on the hardlinked copy "
            "leaked into the source table (replace-never-modify "
            "invariant broken)")

    ch_sql(spark, f"ALTER TABLE b REPLACE PARTITION {mid} FROM a",
           tables=tables)
    replaced_arm = arm("replaced", LogsTable(spark, paths["b"]))

    ch_sql(spark, "EXCHANGE TABLES a AND b", tables=tables)
    if tables["a"] is not tb:
        raise RuntimeError("cross_table_panel: EXCHANGE did not swap "
                           "the name mapping")
    exch = ch_sql(
        spark,
        "SELECT month, service, count() AS n, "
        "sum(length(msg)) AS sum_len FROM a GROUP BY month, service",
        tables=tables,
    ).select(
        F.lit("exchanged").alias("op"),
        F.col("month").cast("long").alias("month"),
        "service", "n", "sum_len",
    ).localCheckpoint(eager=True)

    return (src_arm.unionByName(dst_arm).unionByName(dirty_arm)
            .unionByName(replaced_arm).unionByName(exch))


@register(
    "lifecycle_skip_index_panel",
    oracle="""
    WITH logs AS (
        SELECT ts + to_days((32 * (user_id % 3))::INT) AS ts,
               event_type AS service, props AS msg
        FROM events
    )
    SELECT CAST(strftime(ts, '%Y%m') AS BIGINT) AS month,
           count(*) AS n, sum(length(msg))::BIGINT AS sum_len
    FROM logs WHERE service = 'click' GROUP BY 1
    """,
)
def lifecycle_skip_index_panel(spark, sf_dir):
    """CH data-skipping indexes end-to-end under the driver's gate
    (r8): build a 3-month logs table REPARTITIONED BY SERVICE before
    insert (single-service files — index effectiveness depends on
    layout locality, exactly as in CH, where a set index on a column
    scattered through every granule skips nothing), ADD INDEX ... 
    TYPE set(10) via the dialect, MATERIALIZE INDEX (one job builds
    per-file summaries), then answer `service = 'click'` through the
    index-pruned read. The callable RAISES unless files were
    actually skipped AND the skipped fraction matches the layout
    (other services' files); the oracle is the plain filtered
    aggregate — green = pruning lost nothing and kept nothing extra.
    (sources/skip_index.py; pytest pins the conservative paths.)"""
    from clickhouse_observability_spark.functions.ch_dialect import ch_sql
    from clickhouse_observability_spark.sources.skip_index import (
        read_pruned,
    )
    from clickhouse_observability_spark.sources.writer import LogsTable

    path = IX.artifact_path(sf_dir, "ch_logs_skipidx",
                            source_table="events")
    shutil.rmtree(path, ignore_errors=True)
    t = LogsTable(spark, path)
    t.init_schema()
    ev = table(spark, sf_dir, "events")
    t.insert(
        ev.select(
            F.expr("timestampadd(DAY, 32 * CAST(user_id % 3 AS INT), ts)")
            .alias("ts"),
            F.col("event_type").alias("service"),
            F.lit("INFO").alias("level"),
            F.col("props").alias("msg"),
            F.col("props").alias("attrs"),
            F.col("user_id").cast("string").alias("trace_id"),
            F.col("event_id").cast("string").alias("span_id"),
        ).repartition(8, "service")
        # explicit numPartitions: AQE coalesces a bare
        # repartition(col) on small inputs, merging services back
        # into shared files and leaving nothing to skip
    )
    ch_sql(spark, "ALTER TABLE logs ADD INDEX svc service TYPE set(10)",
           logs=t)
    n_files = ch_sql(spark, "ALTER TABLE logs MATERIALIZE INDEX svc",
                     logs=t)
    df, st = read_pruned(spark, t.path, "svc", "click")
    if st["files_skipped"] == 0 or st["files_unindexed"]:
        raise RuntimeError(
            f"skip_index_panel: expected real pruning over {n_files} "
            f"indexed files, got {st}")
    return (
        df.filter(F.col("service") == "click")
        .groupBy(F.col("month").cast("long").alias("month"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.length("msg")).alias("sum_len"))
    )


@register(
    "lifecycle_index_evolution_panel",
    oracle="""
    WITH logs AS (
        SELECT ts + to_days((32 * (user_id % 3))::INT) AS ts,
               event_type AS service, props AS msg,
               CASE WHEN event_type = 'click' THEN 'hot' ELSE 'std' END
                 AS tier
        FROM events
    )
    SELECT 'hot_by_month' AS op,
           CAST(strftime(ts, '%Y%m') AS BIGINT) AS month,
           CAST(NULL AS VARCHAR) AS tier,
           count(*) AS n, sum(length(msg))::BIGINT AS sum_len
    FROM logs WHERE tier = 'hot' GROUP BY 2
    UNION ALL
    SELECT 'tier_counts', CAST(NULL AS BIGINT), tier,
           count(*), CAST(NULL AS BIGINT)
    FROM logs GROUP BY 3
    """,
)
def lifecycle_index_evolution_panel(spark, sf_dir):
    """The r8 seam no driver row crossed: skip indexes x schema
    evolution x mutations, end-to-end (r9 verdict #6).

    Flow: build a 3-month service-local logs table; ADD COLUMN tier
    DEFAULT 'std' (metadata-only evolution — zero rewrites, layout
    intact); ADD INDEX svc ... set(10) + MATERIALIZE and PROVE it
    prunes; ALTER TABLE UPDATE tier='hot' WHERE service='click' (the
    mutation MATERIALIZES the evolved column into rewritten files and
    must surface the index as stale); prove the stale window is
    conservative (rewritten files scan unindexed); incrementally
    re-materialize (O(new files) — appends a delta shard, r9 sidecar);
    prove pruning works again post-refresh. Every checkpoint RAISES on
    failure, so a green driver row adjudicates the whole chain; the
    oracle is the plain algebraic result (tier folded as a CASE).

    Scale notes: the evolution is metadata-only (no rewrite), the
    mutation is one pruned scan + partitioned overwrite, the refresh
    touches only replaced files — each step O(affected data), never
    O(table history)."""
    from clickhouse_observability_spark.functions.ch_dialect import ch_sql
    from clickhouse_observability_spark.sources.skip_index import (
        SkipIndex,
        read_pruned,
    )
    from clickhouse_observability_spark.sources.mutations import (
        apply_mutation,
    )
    from clickhouse_observability_spark.sources.writer import LogsTable

    path = IX.artifact_path(sf_dir, "ch_logs_idx_evo",
                            source_table="events")
    shutil.rmtree(path, ignore_errors=True)
    t = LogsTable(spark, path)
    t.init_schema()
    ev = table(spark, sf_dir, "events")
    t.insert(
        ev.select(
            F.expr("timestampadd(DAY, 32 * CAST(user_id % 3 AS INT), ts)")
            .alias("ts"),
            F.col("event_type").alias("service"),
            F.lit("INFO").alias("level"),
            F.col("props").alias("msg"),
            F.col("props").alias("attrs"),
            F.col("user_id").cast("string").alias("trace_id"),
            F.col("event_id").cast("string").alias("span_id"),
        ).repartition(8, "service")  # service-local files (see
        # lifecycle_skip_index_panel on why the count is explicit)
    )
    # 1. metadata-only schema evolution: no files rewritten
    files_before = set(t.read().inputFiles())
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN tier String DEFAULT 'std'",
           logs=t)
    if set(t.read().inputFiles()) != files_before:
        raise RuntimeError("ADD COLUMN rewrote files (must be "
                           "metadata-only)")
    # 2. index on the ORIGINAL column; prove it prunes pre-mutation
    ch_sql(spark, "ALTER TABLE logs ADD INDEX svc service TYPE set(10)",
           logs=t)
    ch_sql(spark, "ALTER TABLE logs MATERIALIZE INDEX svc", logs=t)
    _, st0 = read_pruned(spark, t.path, "svc", "click")
    if st0["files_skipped"] == 0 or st0["files_unindexed"]:
        raise RuntimeError(f"pre-mutation pruning failed: {st0}")
    # 3. mutation materializes the evolved column AND staleness
    #    surfaces (the rewrite replaced every indexed file)
    res = apply_mutation(
        spark, t.path, "service = 'click'",
        assignments={"tier": "'hot'"})
    if res["stale_indexes"] != ["svc"]:
        raise RuntimeError(f"stale index not surfaced: {res}")
    # 4. conservative meanwhile: replaced files are unindexed -> scan
    _, st1 = read_pruned(spark, t.path, "svc", "click")
    if st1["files_unindexed"] == 0:
        raise RuntimeError(f"rewritten files should be unindexed: {st1}")
    # 5. incremental refresh (delta shard, O(new files)) -> pruning
    #    works again
    SkipIndex.load(t.path, "svc").materialize(spark, incremental=True)
    df, st2 = read_pruned(spark, t.path, "svc", "click")
    if st2["files_unindexed"] or st2["files_skipped"] == 0:
        raise RuntimeError(f"post-refresh pruning failed: {st2}")
    hot = (
        df.filter(F.col("service") == "click")
        .groupBy(F.col("month").cast("long").alias("month"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.length("msg")).alias("sum_len"))
        .select(
            F.lit("hot_by_month").alias("op"), "month",
            F.lit(None).cast("string").alias("tier"), "n", "sum_len",
        )
    )
    # the default-on-read path AND the materialized path in one arm:
    # non-click rows in rewritten months carry a physical 'std', rows
    # in... every month was rewritten (clicks are everywhere), so
    # defaults are materialized; the CASE oracle is exact either way
    tiers = (
        t.read().groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("tier_counts").alias("op"),
            F.lit(None).cast("long").alias("month"),
            "tier", "n", F.lit(None).cast("long").alias("sum_len"),
        )
    )
    return hot.unionByName(tiers)


@register(
    "lifecycle_ttl_rollup_panel",
    # Registered after the 50-slot window; the oracle runs under the
    # CI registry gate every run (tests/test_oracle_registry.py) and
    # scripts/selfcheck.py at sf0.01.
    oracle="""
    WITH logs AS (
        SELECT ts + to_days((32 * (user_id % 3))::INT) AS ts,
               event_type AS service,
               CASE WHEN user_id % 5 = 0 THEN 'ERROR' ELSE 'INFO' END
                   AS level,
               props AS msg, user_id::VARCHAR AS trace_id
        FROM events
    ),
    aged AS (SELECT * FROM logs
             WHERE ts < TIMESTAMP '2024-02-05 00:00:00'),
    young AS (SELECT * FROM logs
              WHERE ts >= TIMESTAMP '2024-02-05 00:00:00'),
    rolled AS (
        SELECT service, min(ts) AS ts, max(msg) AS msg,
               (list(level ORDER BY ts, level))[1] AS level,
               (list(trace_id ORDER BY ts, trace_id))[1] AS trace_id
        FROM aged GROUP BY service, date_trunc('day', ts)
    )
    SELECT 'rolled' AS op, service, ts, msg, level, trace_id FROM rolled
    UNION ALL
    SELECT 'raw' AS op, service, ts, msg, level, trace_id FROM young
    """,
)
def lifecycle_ttl_rollup_panel(spark, sf_dir):
    """CH TTL GROUP BY end-to-end (r9): arm `MODIFY TTL ts + INTERVAL
    30 DAY GROUP BY service, toStartOfDay(ts) SET msg = max(msg)`
    through the dialect, run the retention job at a pinned `now`, and
    read the table back — aged rows must have COLLAPSED to one row
    per (service, day) while young rows stay raw. Column semantics
    under adjudication: SET column takes its aggregate (max), the
    grouped-through-expression ts takes min(ts), implicit columns
    (level, trace_id) take the group's earliest row's value — the
    deterministic `any` the oracle re-derives with ordered-list
    heads. The build spreads events ts across four months (+32 days
    x user_id%3, day arithmetic on both sides), so the pass
    exercises whole-month collapse (202401), the boundary split
    (202402: aged side collapses, young side raw) and untouched
    young months (202403/202404). The arm RAISES unless the row
    count actually shrank — a silent no-op retention can't
    hash-match by accident."""
    import datetime as dt

    from clickhouse_observability_spark.functions.ch_dialect import ch_sql
    from clickhouse_observability_spark.sources.retention import (
        apply_retention,
    )
    from clickhouse_observability_spark.sources.writer import LogsTable

    path = IX.artifact_path(sf_dir, "ch_logs_ttl_rollup",
                            source_table="events")
    shutil.rmtree(path, ignore_errors=True)
    t = LogsTable(spark, path)
    t.init_schema()
    ev = table(spark, sf_dir, "events")
    t.insert(
        ev.select(
            F.expr("timestampadd(DAY, 32 * CAST(user_id % 3 AS INT), ts)")
            .alias("ts"),
            F.col("event_type").alias("service"),
            F.when(F.col("user_id") % 5 == 0, "ERROR")
            .otherwise("INFO")
            .alias("level"),
            F.col("props").alias("msg"),
            F.col("props").alias("attrs"),
            F.col("user_id").cast("string").alias("trace_id"),
            F.col("event_id").cast("string").alias("span_id"),
        )
    )
    # assertion inputs from the parquet footers (exact num_rows, zero
    # Spark jobs — system.parts-class metadata; r14 guide §5). The
    # adjudicated VALUES still come from the full read below.
    before = sum(p["rows"] for p in t.parts())
    ch_sql(
        spark,
        "ALTER TABLE logs MODIFY TTL ts + INTERVAL 30 DAY "
        "GROUP BY service, toStartOfDay(ts) SET msg = max(msg)",
        logs=t,
    )
    res = apply_retention(
        spark, t.path,
        now=dt.datetime(2024, 3, 6, tzinfo=dt.timezone.utc),
    )
    after = sum(p["rows"] for p in t.parts())
    if after >= before or not res.get("collapsed_months"):
        raise RuntimeError(
            f"lifecycle_ttl_rollup_panel: collapse did not happen "
            f"(before={before}, after={after}, res={res})")
    cutoff = F.lit(dt.datetime(2024, 2, 5))
    return t.read().select(
        F.when(F.col("ts") < cutoff, "rolled").otherwise("raw").alias("op"),
        "service", "ts", "msg", "level", "trace_id",
    )


@register(
    "lifecycle_column_ttl_panel",
    # Registered after the 50-slot window; adjudicated by the CI
    # registry gate every run + scripts/selfcheck.py at sf0.01.
    oracle="""
    WITH logs AS (
        SELECT ts + to_days((32 * (user_id % 3))::INT) AS ts,
               event_type AS service,
               CASE WHEN user_id % 5 = 0 THEN 'ERROR' ELSE 'INFO' END
                   AS level,
               props AS msg, user_id::VARCHAR AS trace_id
        FROM events
    )
    SELECT CASE WHEN ts < TIMESTAMP '2024-02-05 00:00:00'
                THEN 'aged' ELSE 'raw' END AS op,
           service, ts,
           CASE WHEN ts < TIMESTAMP '2024-02-05 00:00:00'
                THEN '' ELSE msg END AS msg,
           CASE WHEN ts < TIMESTAMP '2024-02-02 00:00:00'
                THEN '' ELSE trace_id END AS trace_id,
           level
    FROM logs
    """,
)
def lifecycle_column_ttl_panel(spark, sf_dir):
    """CH COLUMN TTL end-to-end (r11): arm `MODIFY COLUMN msg String
    TTL ts + INTERVAL 30 DAY` and `MODIFY COLUMN trace_id String TTL
    ts + INTERVAL 33 DAY` through the dialect, run the retention job
    at a pinned `now` (2024-03-06) with NO table TTL armed, and read
    the table back: every row survives, but aged cells reverted to
    the type default '' — TWO different horizons inside the same
    boundary month (msg cutoff 02-05, trace_id 02-02), so the pass
    exercises per-column cutoffs in one partition rewrite. The
    oracle re-derives the revert as plain CASE expressions over the
    same spread-out events. Raises unless cells actually reverted
    AND the row count is unchanged — a silent no-op or an accidental
    delete can't hash-match."""
    import datetime as dt

    from clickhouse_observability_spark.functions.ch_dialect import ch_sql
    from clickhouse_observability_spark.sources.retention import (
        apply_retention,
    )
    from clickhouse_observability_spark.sources.writer import LogsTable

    path = IX.artifact_path(sf_dir, "ch_logs_column_ttl",
                            source_table="events")
    shutil.rmtree(path, ignore_errors=True)
    t = LogsTable(spark, path)
    t.init_schema()
    ev = table(spark, sf_dir, "events")
    t.insert(
        ev.select(
            F.expr("timestampadd(DAY, 32 * CAST(user_id % 3 AS INT), ts)")
            .alias("ts"),
            F.col("event_type").alias("service"),
            F.when(F.col("user_id") % 5 == 0, "ERROR")
            .otherwise("INFO")
            .alias("level"),
            F.col("props").alias("msg"),
            F.col("props").alias("attrs"),
            F.col("user_id").cast("string").alias("trace_id"),
            F.col("event_id").cast("string").alias("span_id"),
        )
    )
    before = sum(p["rows"] for p in t.parts())  # footer metadata, no job (r14)
    ch_sql(spark, "ALTER TABLE logs MODIFY COLUMN msg String "
                  "TTL ts + INTERVAL 30 DAY", logs=t)
    ch_sql(spark, "ALTER TABLE logs MODIFY COLUMN trace_id String "
                  "TTL ts + INTERVAL 33 DAY", logs=t)
    res = apply_retention(
        spark, t.path,
        now=dt.datetime(2024, 3, 6, tzinfo=dt.timezone.utc),
    )
    after = sum(p["rows"] for p in t.parts())
    if after != before or not res.get("column_ttl"):
        raise RuntimeError(
            f"lifecycle_column_ttl_panel: expected a row-preserving "
            f"column revert (before={before}, after={after}, "
            f"res={res})")
    cutoff = F.lit(dt.datetime(2024, 2, 5))
    return t.read().select(
        F.when(F.col("ts") < cutoff, "aged").otherwise("raw").alias("op"),
        "service", "ts", "msg", "trace_id", "level",
    )


@register(
    "lifecycle_conditional_ttl_panel",
    oracle="""
    WITH logs AS (
        SELECT ts + to_days((32 * (user_id % 3))::INT) AS ts,
               event_type AS service,
               CASE WHEN user_id % 5 = 0 THEN 'ERROR' ELSE 'INFO' END
                   AS level,
               user_id::VARCHAR AS trace_id
        FROM events
    )
    SELECT CAST(strftime(ts, '%Y%m') AS BIGINT) AS month,
           CASE WHEN CAST(strftime(ts, '%Y%m') AS BIGINT) < 202402
                THEN 'cold' ELSE 'default' END AS volume,
           service, ts, level, trace_id
    FROM logs
    WHERE NOT (ts < TIMESTAMP '2024-02-15 00:00:00'
               AND level = 'ERROR')
    """,
)
def lifecycle_conditional_ttl_panel(spark, sf_dir):
    """CH conditional TTL end-to-end (r13): the last member of the
    table-TTL grammar — `TTL ts + INTERVAL n DAY DELETE WHERE
    <pred>` — under the driver's gate, COMPOSED with a move rule.
    Two passes: first arm `TTL ... TO VOLUME 'cold'` and run
    retention at a pinned `now` (2024-03-06) so month 202401
    genuinely relocates under `_tiers/cold/`; then re-arm the move
    rule PLUS `ts + INTERVAL 20 DAY DELETE WHERE level = 'ERROR'`
    (multi-clause MODIFY TTL replaces the whole expression, like CH)
    and run retention again — aged ERROR rows (ts < 2024-02-15)
    delete everywhere they live, INFO rows and young ERROR rows
    stay, and the cold month rewrites IN PLACE on its volume (the
    r12 tiering seam, now adjudicated: sources/retention.py
    _apply_delete_where goes per-location through month_dirs).

    The read returns every surviving row tagged with its month's
    ACTUAL filesystem residency; the oracle folds both arms
    algebraically (predicate+horizon as a WHERE, residency as a
    month CASE). A green row therefore proves the conditional delete
    fired exactly (extra/missing deletions hash-mismatch), the
    non-matching rows survived byte-identically, AND the tiered
    month stayed cold through its rewrite. Raises unless rows
    actually deleted, the count never grew, and 202401 is still
    tiered — a silent no-op or a move-back can't hash-match."""
    import datetime as dt

    from clickhouse_observability_spark.functions.ch_dialect import ch_sql
    from clickhouse_observability_spark.sources.retention import (
        apply_retention,
    )
    from clickhouse_observability_spark.sources.tiering import (
        month_volume,
        partition_months,
    )
    from clickhouse_observability_spark.sources.writer import LogsTable

    path = IX.artifact_path(sf_dir, "ch_logs_conditional_ttl",
                            source_table="events")
    shutil.rmtree(path, ignore_errors=True)
    t = LogsTable(spark, path)
    t.init_schema()
    ev = table(spark, sf_dir, "events")
    t.insert(
        ev.select(
            F.expr("timestampadd(DAY, 32 * CAST(user_id % 3 AS INT), ts)")
            .alias("ts"),
            F.col("event_type").alias("service"),
            F.when(F.col("user_id") % 5 == 0, "ERROR")
            .otherwise("INFO")
            .alias("level"),
            F.col("props").alias("msg"),
            F.col("props").alias("attrs"),
            F.col("user_id").cast("string").alias("trace_id"),
            F.col("event_id").cast("string").alias("span_id"),
        )
    )
    before = sum(p["rows"] for p in t.parts())  # footer metadata, no job (r14)
    now = dt.datetime(2024, 3, 6, tzinfo=dt.timezone.utc)
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL ts + INTERVAL 30 DAY "
                  "TO VOLUME 'cold'", logs=t)
    res1 = apply_retention(spark, t.path, now=now)
    if not (res1.get("tiered") or {}).get("cold"):
        raise RuntimeError(
            f"lifecycle_conditional_ttl_panel: tier pass did not "
            f"move months (res={res1})")
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL "
                  "ts + INTERVAL 30 DAY TO VOLUME 'cold', "
                  "ts + INTERVAL 20 DAY DELETE WHERE level = 'ERROR'",
           logs=t)
    res2 = apply_retention(spark, t.path, now=now)
    after = sum(p["rows"] for p in t.parts())
    fired = res2.get("delete_where") or []
    if (after >= before or not fired
            or 202401 not in fired[0]["months"]
            or month_volume(t.path, 202401) != "cold"):
        raise RuntimeError(
            f"lifecycle_conditional_ttl_panel: expected a row-"
            f"deleting pass with 202401 rewritten in place on its "
            f"volume (before={before}, after={after}, res={res2}, "
            f"volume={month_volume(t.path, 202401)})")
    residency = spark.createDataFrame(
        [(m, month_volume(t.path, m)) for m in partition_months(t.path)],
        "month int, volume string",
    )
    return (
        t.read()
        .withColumn("month", F.col("month").cast("long"))
        .join(F.broadcast(residency.select(
            F.col("month").cast("long").alias("month"), "volume")),
            on="month", how="left")
        .select("month", "volume", "service", "ts", "level", "trace_id")
    )


@register(
    "lifecycle_tiering_panel",
    oracle="""
    WITH logs AS (
        SELECT ts + to_days((32 * (user_id % 3))::INT) AS ts,
               event_type AS service, props AS msg
        FROM events
    )
    SELECT CAST(strftime(ts, '%Y%m') AS BIGINT) AS month,
           CASE WHEN CAST(strftime(ts, '%Y%m') AS BIGINT) < 202402
                THEN 'cold' ELSE 'default' END AS volume,
           service, count(*) AS n, sum(length(msg))::BIGINT AS sum_len
    FROM logs GROUP BY 1, 2, 3
    """,
)
def lifecycle_tiering_panel(spark, sf_dir):
    """CH storage tiering end-to-end under the driver's gate (r12
    flagship): arm `MODIFY TTL ts + INTERVAL 30 DAY TO VOLUME 'cold'`
    through the dialect, run the retention pass at a pinned `now`
    (2024-03-06, cutoff month 202402) — months strictly older MOVE
    under `_tiers/cold/` as metadata-only renames
    (sources/tiering.py) — then read the WHOLE table back through the
    tier-transparent scan, each month tagged with its ACTUAL serving
    volume from the filesystem (system.parts attribution, not a
    replay of the rule). The oracle folds the expected residency
    algebraically (month < cutoff -> 'cold'), so a green row proves
    BOTH directions at once: every tiered row still reads back
    byte-identically (a cold row missing from the pruned union =
    hash mismatch) AND the mover actually relocated exactly the aged
    months (a silent no-op would tag them 'default' and mismatch).
    Raises unless months actually moved with the row count unchanged.

    Scale shape: the move is O(aged months) directory renames, zero
    data bytes; the read is the same per-volume-root pruned scan the
    seam tests pin (tests/test_tiering.py)."""
    import datetime as dt

    from clickhouse_observability_spark.functions.ch_dialect import ch_sql
    from clickhouse_observability_spark.sources.retention import (
        apply_retention,
    )
    from clickhouse_observability_spark.sources.tiering import (
        month_volume,
        partition_months,
    )
    from clickhouse_observability_spark.sources.writer import LogsTable

    path = IX.artifact_path(sf_dir, "ch_logs_tiering",
                            source_table="events")
    shutil.rmtree(path, ignore_errors=True)
    t = LogsTable(spark, path)
    t.init_schema()
    ev = table(spark, sf_dir, "events")
    t.insert(
        ev.select(
            F.expr("timestampadd(DAY, 32 * CAST(user_id % 3 AS INT), ts)")
            .alias("ts"),
            F.col("event_type").alias("service"),
            F.lit("INFO").alias("level"),
            F.col("props").alias("msg"),
            F.col("props").alias("attrs"),
            F.col("user_id").cast("string").alias("trace_id"),
            F.col("event_id").cast("string").alias("span_id"),
        )
    )
    before = sum(p["rows"] for p in t.parts())  # footer metadata, no job (r14)
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL ts + INTERVAL 30 DAY "
                  "TO VOLUME 'cold'", logs=t)
    res = apply_retention(
        spark, t.path,
        now=dt.datetime(2024, 3, 6, tzinfo=dt.timezone.utc),
    )
    after = sum(p["rows"] for p in t.parts())
    moved = res.get("tiered") or {}
    if after != before or not moved.get("cold"):
        raise RuntimeError(
            f"lifecycle_tiering_panel: expected a row-preserving "
            f"month move (before={before}, after={after}, res={res})")
    # ACTUAL residency per month, read from the filesystem — the
    # adjudicated claim, joined onto the tier-transparent scan
    residency = spark.createDataFrame(
        [(m, month_volume(t.path, m)) for m in partition_months(t.path)],
        "month int, volume string",
    )
    return (
        t.read()
        .groupBy(F.col("month").cast("long").alias("month"), "service")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.length("msg")).alias("sum_len"))
        .join(F.broadcast(residency.select(
            F.col("month").cast("long").alias("month"), "volume")),
            on="month", how="left")
        .select("month", "volume", "service", "n", "sum_len")
    )
