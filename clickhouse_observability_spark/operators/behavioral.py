"""Behavioral analytics — the ClickHouse-signature functions a user
of the reference (a ClickHouse-backed service) reaches for:
windowFunnel, retention and sequence counting, re-expressed as
Spark aggregations.

Scale shapes: every operator here is ONE shuffle on user_id with
map-side partial aggregation — no self-joins, no per-user window
Exchanges. windowFunnel and sequenceCount are SEQUENTIAL algorithms
(ClickHouse's own implementations fold over each user's time-sorted
events), so they run as `aggregate()` folds over a per-user collected
event list; the list is bounded per user by their event count — for
observability data (thousands of events per user, not billions) that
is the standard trade, the same one ClickHouse makes by buffering
each user's events in memory during aggregation. retention is plain
conditional-max aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    modes: tuple[str, ...] = (),
) -> DataFrame:
    """ClickHouse windowFunnel (default mode): per user, the deepest
    funnel level reached. The REAL ClickHouse algorithm is a
    sequential fold over the time-sorted events — for each level k it
    tracks the chain-start timestamp of the best chain reaching k,
    RE-ANCHORING at every step-1 event (the latest one wins), and a
    step-k event advances a chain when it falls within
    `window_seconds` of that chain's start (no strict-ordering
    constraint between equal timestamps; ties sort by step index, so
    a same-timestamp later step still advances — deterministic where
    ClickHouse's same-timestamp order is unspecified). A single
    earliest-anchor pass (conditional mins) UNDERREPORTS levels when
    a later step-1 event starts a faster chain — review r4 found the
    first draft doing exactly that. Output: (user, level); users with
    no funnel-step events do not appear.

    `modes` (r6) — ClickHouse's three documented strict modes, any
    combination, implemented per the docs' semantics over the same
    per-level parallel-chain state:

    - 'strict_order': condition events may not interleave — an event
      that neither anchors nor advances kills every open chain, and
      an advance/anchor keeps ONLY its own chain alive (CH's
      A->B->D->C example stops at level 2).
    - 'strict_increase': consecutive chain steps need strictly
      increasing timestamps (per-level last-event ts tracked).
    - 'strict_deduplication' (alias 'strict_dedup'): an event whose
      condition was already matched by an open chain INTERRUPTS the
      user's further processing (level so far is kept) — the docs'
      "repeating event interrupts further processing".

    The default (no modes) path is the unchanged adjudicated fold."""
    if not steps:
        raise ValueError("windowFunnel needs at least one step")
    canon = {"strict_dedup": "strict_deduplication"}
    flags = {canon.get(m, m) for m in modes}
    bad = flags - {"strict_order", "strict_increase",
                   "strict_deduplication"}
    if bad:
        raise ValueError(f"unknown windowFunnel modes: {sorted(bad)}")
    step_idx = F.array(*[F.lit(s) for s in steps])
    ev = events.select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        (F.array_position(step_idx, F.col(type_col)) - 1).alias("step"),
    )
    if "strict_order" not in flags:
        ev = ev.filter(F.col("step") >= 0)
    # strict_order keeps NON-condition events as step = -1: CH's own
    # docs example (A->B->D->C stops at the D) has D matching no
    # condition, so dropping non-matching events before the fold
    # would silently un-break chains (review r6). Cost: the per-user
    # list holds the full event stream in this mode — the price of
    # the semantics, and only paid when the flag is set.
    per_user = ev.groupBy("user").agg(
        F.sort_array(F.collect_list(F.struct("us", "step"))).alias("evs")
    )
    win_us = window_seconds * 1_000_000
    k = len(steps)
    if flags:
        fold = _window_funnel_moded_fold(k, win_us, flags)
        return per_user.select("user", fold.cast("int").alias("level"))
    # accumulator: chain-start timestamp per level (NULL = unreached)
    # + best level so far; the fold is the ClickHouse
    # AggregateFunctionWindowFunnel loop verbatim
    init_fields = ", ".join(
        f"'t{i}', CAST(NULL AS BIGINT)" for i in range(k)
    )
    def set_fields(assign: dict[int, str], lvl: str) -> str:
        parts = []
        for i in range(k):
            parts.append(f"'t{i}', {assign.get(i, f'acc.t{i}')}")
        parts.append(f"'lvl', {lvl}")
        return "named_struct(" + ", ".join(parts) + ")"

    branches = [
        "WHEN e.step = 0 THEN "
        + set_fields({0: "e.us"}, "greatest(acc.lvl, 1)")
    ]
    for i in range(1, k):
        branches.append(
            f"WHEN e.step = {i} AND acc.t{i - 1} IS NOT NULL "
            f"AND e.us <= acc.t{i - 1} + {win_us}L THEN "
            + set_fields({i: f"acc.t{i - 1}"}, f"greatest(acc.lvl, {i + 1})")
        )
    fold = F.expr(
        f"""aggregate(evs,
              named_struct({init_fields}, 'lvl', 0),
              (acc, e) -> CASE {' '.join(branches)} ELSE acc END,
              acc -> acc.lvl)"""
    )
    return per_user.select("user", fold.cast("int").alias("level"))


def _window_funnel_moded_fold(k: int, win_us: int, flags: set):
    """The strict-mode variant of the windowFunnel fold. Same
    parallel per-level chain state as the default, extended with the
    per-level LAST-event timestamp (u{i}, for strict_increase) and a
    dead flag (strict_deduplication's interrupt). Still a
    backtracking-free single pass inside codegen."""
    so = "strict_order" in flags
    si = "strict_increase" in flags
    sd = "strict_deduplication" in flags

    init = ", ".join(
        [f"'t{i}', CAST(NULL AS BIGINT), 'u{i}', CAST(NULL AS BIGINT)"
         for i in range(k)]
    )

    def state(assign: dict[int, tuple[str, str]], lvl: str,
              dead: str = "acc.dead", clear_others: bool = False) -> str:
        parts = []
        for i in range(k):
            if i in assign:
                t, u = assign[i]
            elif clear_others:
                t, u = "CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)"
            else:
                t, u = f"acc.t{i}", f"acc.u{i}"
            parts.append(f"'t{i}', {t}, 'u{i}', {u}")
        parts.append(f"'lvl', {lvl}")
        parts.append(f"'dead', {dead}")
        return "named_struct(" + ", ".join(parts) + ")"

    branches = ["WHEN acc.dead THEN acc"]
    if sd:
        # the docs' interrupt: a condition already matched by an open
        # chain repeats -> stop processing this user, keep the level
        for i in range(k):
            branches.append(
                f"WHEN e.step = {i} AND acc.t{i} IS NOT NULL THEN "
                + state({}, "acc.lvl", dead="true")
            )
    # anchor
    branches.append(
        "WHEN e.step = 0 THEN "
        + state({0: ("e.us", "e.us")}, "greatest(acc.lvl, 1)",
                clear_others=so)
    )
    # advance
    for i in range(1, k):
        cond = (f"e.step = {i} AND acc.t{i - 1} IS NOT NULL "
                f"AND e.us <= acc.t{i - 1} + {win_us}L")
        if si:
            cond += f" AND e.us > acc.u{i - 1}"
        branches.append(
            f"WHEN {cond} THEN "
            + state({i: (f"acc.t{i - 1}", "e.us")},
                    f"greatest(acc.lvl, {i + 1})", clear_others=so)
        )
    if so:
        # an interleaving condition event (no anchor, no advance)
        # kills every open chain; the best level survives
        branches.append("WHEN true THEN " + state({}, "acc.lvl",
                                                  clear_others=True))
    return F.expr(
        f"""aggregate(evs,
              named_struct({init}, 'lvl', 0, 'dead', false),
              (acc, e) -> CASE {' '.join(branches)} ELSE acc END,
              acc -> acc.lvl)"""
    )


def retention(
    events: DataFrame,
    conditions: list[str],
    user_col: str = "user_id",
) -> DataFrame:
    """ClickHouse retention: per user, r1 = condition 1 held, rK =
    condition 1 AND condition K held (K >= 2) — the cohort-retention
    primitive. Conditions are SQL boolean expressions over the event
    row. Output: (user, r1 ... rN as ints). One conditional-max
    aggregate per condition, one shuffle."""
    if not conditions:
        raise ValueError("retention needs at least one condition")
    aggs = [
        F.max(F.when(F.expr(cond), 1).otherwise(0)).alias(f"c{i}")
        for i, cond in enumerate(conditions)
    ]
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(*aggs)
    cols = [F.col("c0").alias("r1")]
    for i in range(1, len(conditions)):
        cols.append(
            (F.col("c0") * F.col(f"c{i}")).alias(f"r{i + 1}")
        )
    return per_user.select("user", *cols)


def sequence_count(
    events: DataFrame,
    first_type: str,
    then_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """ClickHouse sequenceCount('(?1)(?2)'): per user, the number of
    NON-OVERLAPPING first->then matches, scanning the sorted timeline
    greedily — find a first-event, then the next then-event after it,
    count one match, resume AFTER the then-event. (An earliest-open
    bipartite matching overcounts: v,v,p,p is ONE ClickHouse match,
    not two — review r4 caught the first draft doing that.) Computed
    with a per-user sorted fold."""
    ev = events.select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(type_col).alias("etype"),
    ).filter(F.col("etype").isin([first_type, then_type]))
    per_user = ev.groupBy("user").agg(
        F.sort_array(F.collect_list(F.struct("us", "etype"))).alias("evs")
    )
    f = first_type.replace("'", "''")
    t = then_type.replace("'", "''")
    fold = F.expr(
        f"""aggregate(evs,
              named_struct('armed', false, 'pairs', 0),
              (acc, e) -> CASE
                  WHEN NOT acc.armed AND e.etype = '{f}' THEN
                      named_struct('armed', true, 'pairs', acc.pairs)
                  WHEN acc.armed AND e.etype = '{t}' THEN
                      named_struct('armed', false,
                                   'pairs', acc.pairs + 1)
                  ELSE acc END,
              acc -> acc.pairs)"""
    )
    return per_user.select("user", fold.cast("int").alias("n_sequences"))


def sequence_next_node(
    events: DataFrame,
    chain: list[str],
    direction: str = "forward",
    base: str = "first_match",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """ClickHouse sequenceNextNode(direction, base)(ts, event, ...):
    per user, the event value ADJACENT to a CONSECUTIVE chain match
    e1..eN on the time-sorted event list — the next event after the
    chain when ``direction='forward'``, the event before it when
    ``'backward'`` — or NULL when the chain never matches / nothing
    is adjacent. The flow-analysis primitive ("after view->click,
    where do users go next?").

    Bases, defined relative to the scan direction as in CH:
    ``head`` (chain must sit at the very start of the scan),
    ``tail`` (at the very end), ``first_match`` / ``last_match``
    (first/last index where the consecutive chain occurs).

    Ties on identical timestamps break by event value (the struct
    sort), mirrored exactly in the oracle's ORDER BY (ts, event).
    One shuffle (the per-user collect); the chain scan is a JVM array
    fold over each user's bounded timeline — same cost class as
    windowFunnel/sequenceMatch.

    Output: (user, next_node nullable string)."""
    if direction not in ("forward", "backward"):
        raise ValueError(f"bad direction {direction!r}")
    if base not in ("head", "tail", "first_match", "last_match"):
        raise ValueError(f"bad base {base!r}")
    if not chain:
        raise ValueError("sequenceNextNode needs a non-empty chain")
    # head/tail are ABSOLUTE (first/last event of the timeline); the
    # scan moves in `direction` from there. The cross combos
    # (forward+tail, backward+head) can never have a node beyond the
    # chain — refuse rather than return an always-NULL column
    # (honest-refusal policy).
    if (direction, base) in (("forward", "tail"), ("backward", "head")):
        raise ValueError(
            f"{direction}+{base} scans off the timeline immediately "
            "(no node can follow the chain); use the matching "
            "direction for that base")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(type_col).alias("etype"),
    )
    per_user = ev.groupBy("user").agg(
        F.sort_array(F.collect_list(F.struct("us", "etype"))).alias("evs")
    )
    # normalize to a FORWARD scan over `sq`: backward = reversed
    # timeline (CH gives the chain in scan order, so the chain and
    # the "next node" are both scan-relative and need no flip). In
    # scan order, base tail-with-backward lands on position 0 —
    # i.e. an effective head.
    seq_expr = ("reverse(transform(evs, e -> e.etype))"
                if direction == "backward"
                else "transform(evs, e -> e.etype)")
    eff = "head" if base in ("head", "tail") else base
    n = len(chain)
    lits = ", ".join("'" + c.replace("'", "''") + "'" for c in chain)
    match_i = (f"filter(sequence(0, size(sq) - {n}), i -> "
               f"forall(sequence(0, {n - 1}), "
               f"j -> sq[i + j] = ch[j]))")
    pick = {"head": "IF(size(ix) > 0 AND ix[0] = 0, 0, NULL)",
            "first_match": "IF(size(ix) > 0, ix[0], NULL)",
            "last_match": "IF(size(ix) > 0, element_at(ix, -1), NULL)",
            }[eff]
    return per_user.select(
        "user",
        F.expr(f"array({lits})").alias("ch"),
        F.expr(seq_expr).alias("sq"),
    ).select(
        "user", "ch", "sq",
        F.expr(f"IF(size(sq) >= {n}, {match_i}, "
               "CAST(array() AS ARRAY<INT>))").alias("ix"),
    ).select(
        "user",
        F.expr(f"""
            CASE WHEN ({pick}) IS NOT NULL
                      AND ({pick}) + {n} < size(sq)
                 THEN sq[({pick}) + {n}]
            END""").alias("next_node"),
    )


def _parse_sequence_pattern(pattern: str, n_conds: int):
    """CH sequenceMatch pattern -> (refs, seps).

    refs: 1-based condition indices in match order. seps[i]: the
    separator between refs[i] and refs[i+1] — ('strict',) for bare
    concatenation (the next condition-matching event must follow
    DIRECTLY; CH skips events matching no condition), ('any',) for
    `.*`, or ('t', op, seconds) for `(?t op N)`.
    """
    import re as _re

    toks = _re.findall(
        r"\(\?(\d+)\)|\(\?t\s*(<=|>=|<|>)\s*(\d+)\)|(\.\*)|(\S)",
        pattern.replace(" ", ""),
    )
    refs, seps, pending = [], [], None
    for ref, op, secs, star, bad in toks:
        if bad:
            raise ValueError(f"unsupported pattern token {bad!r} in "
                             f"{pattern!r}")
        if ref:
            k = int(ref)
            if not 1 <= k <= n_conds:
                raise ValueError(f"(?{k}) exceeds the {n_conds} "
                                 f"conditions given")
            if refs:
                seps.append(pending or ("strict",))
            elif pending:
                raise ValueError("pattern cannot start with .* or a "
                                 "time constraint")
            refs.append(k)
            pending = None
        elif star:
            if pending:
                raise ValueError("stacked separators in pattern")
            pending = ("any",)
        else:
            if pending:
                raise ValueError("stacked separators in pattern")
            pending = ("t", op, int(secs))
    if pending:
        raise ValueError("pattern cannot end with a separator")
    if not refs:
        raise ValueError("pattern has no (?N) references")
    return refs, seps


def sequence_match(
    events: DataFrame,
    pattern: str,
    conds: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """ClickHouse sequenceMatch(pattern)(ts, cond1, ...): per user,
    whether the event chain matches. Conditions here are event-type
    equalities (cond k = `type_col == conds[k-1]`); events matching
    NO condition are skipped, exactly CH's documented behavior.

    Two sound regimes, chosen by the pattern (mixes raise):

    * no time constraints — a bitmask NFA folded over the per-user
      sorted matched events: bit p = "prefix p matched and still
      extensible". Strict-concatenation bits live exactly one event
      (the next matched event advances them or they die); `.*` bits
      persist. Exact for every strict/.* pattern, no backtracking
      needed because ALL viable prefixes advance in parallel.
    * `(?t op N)` constraints (with `.*` edges allowed) — per-prefix
      anchor DP: for all-`<=`/`<` chains the LATEST event completing
      each prefix dominates (any chain through an older anchor is
      also within bound of the newest), for all-`>`/`>=` chains the
      EARLIEST dominates; the fold tracks that one anchor per
      prefix. Mixing directions (or strict adjacency with time
      bounds) has no single dominating anchor — raises rather than
      approximates.

    One shuffle on user_id, map-side combined; the fold is the same
    collected-per-user shape as windowFunnel (bounded by a user's
    event count). Returns (user, matched).
    """
    refs, seps = _parse_sequence_pattern(pattern, len(conds))
    k = len(refs)
    if k > 16:
        raise ValueError("patterns beyond 16 references are "
                         "unsupported (bitmask fold)")
    timed = [s for s in seps if s[0] == "t"]
    cond_arr = F.array(*[F.lit(c) for c in conds])
    ev = events.select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        (F.array_position(cond_arr, F.col(type_col))).alias("cond"),
    ).filter(F.col("cond") >= 1)
    per_user = ev.groupBy("user").agg(
        F.sort_array(F.collect_list(F.struct("us", "cond"))).alias("evs")
    )

    if not timed:
        # bitmask NFA: bit 0 (empty prefix) always on; bit k sticky
        persists = [seps[p][0] == "any" if p < len(seps) else True
                    for p in range(k)]  # persistence of bit p+1
        terms = ["1"]
        for p in range(1, k + 1):
            prev = f"((acc div {2 ** (p - 1)}) % 2) = 1"
            adv = f"({prev} AND e.cond = {refs[p - 1]})"
            keep = (f" OR ((acc div {2 ** p}) % 2) = 1"
                    if persists[p - 1] else "")
            terms.append(f"(CASE WHEN {adv}{keep} THEN {2 ** p} "
                         f"ELSE 0 END)")
        fold = F.expr(
            f"""aggregate(evs, 1,
                  (acc, e) -> {' + '.join(terms)},
                  acc -> ((acc div {2 ** k}) % 2) = 1)""")
        return per_user.select("user", fold.alias("matched"))

    if any(s[0] == "strict" for s in seps):
        raise ValueError(
            "strict adjacency combined with (?t...) constraints is "
            "not supported; separate timed references with .*")
    ops = {s[1] for s in timed}
    if ops <= {"<=", "<"}:
        best = "greatest"
    elif ops <= {">", ">="}:
        best = "least"
    else:
        raise ValueError(
            "mixed <=/> time-constraint directions have no single "
            "dominating anchor; split the pattern")
    # acc: array of k anchors (BIGINT us, NULL = prefix unreached)
    sets = []
    for p in range(1, k + 1):
        if p == 1:
            ok = "true"
        else:
            s = seps[p - 2]
            if s[0] == "any":
                ok = f"acc[{p - 2}] IS NOT NULL"
            else:
                _, op, secs = s
                ok = (f"acc[{p - 2}] IS NOT NULL AND "
                      f"(e.us - acc[{p - 2}]) {op} {secs * 1_000_000}")
        sets.append(
            f"""CASE WHEN e.cond = {refs[p - 1]} AND {ok}
                THEN coalesce({best}(acc[{p - 1}], e.us), e.us)
                ELSE acc[{p - 1}] END""")
    nulls = ", ".join(["CAST(NULL AS BIGINT)"] * k)
    fold = F.expr(
        f"""aggregate(evs,
              array({nulls}),
              (acc, e) -> array({', '.join(sets)}),
              acc -> acc[{k - 1}] IS NOT NULL)""")
    return per_user.select("user", fold.alias("matched"))
