"""CH storage tiering: `TTL ts + INTERVAL n DAY TO VOLUME 'cold'`
(and `TO DISK`) as metadata-only month moves (S4 EXT; r12 flagship).

Reference context: the reference arms only the DELETE form
(internal/db/db.go:59-66), but its ClickHouse backing store's TTL
family includes move rules: aged parts RELOCATE to a colder volume of
the table's storage policy while staying fully queryable. The Spark
analog moves whole month directories under

    <table>/_tiers/<volume>/<PARTITION>=<month>/

- underscore-prefixed, so plain partition discovery of the base path
  can NEVER double-read a tiered month (the same Hadoop PathFilter
  rule `_detached/` and swap debris rely on);
- a move is `os.rename` when the target month is absent (atomic,
  zero data bytes) and a per-file collision-safe rename when late
  writes re-created the month at a warmer tier — both crash-safe:
  every file exists in exactly one location at every instant, and
  all locations are enumerated by every reader, so a crash mid-merge
  loses nothing and a rerun completes the move.

READ TRANSPARENCY is the CH contract and the one unacceptable failure
mode is a cold file invisible to a pruned read (silent data loss).
Every path consumer in this package therefore enumerates through the
helpers here — `tier_roots` (base ∪ tiers), `partition_months`,
`month_dirs`, `live_files`, `read_files` — instead of listing the
base path directly: `LogsTable.read`/`parts`, retention (row TTL,
TTL GROUP BY, COLUMN TTL, compaction), mutations (DELETE/UPDATE,
DROP/DETACH/FREEZE/TRUNCATE/MOVE/REPLACE, CHECK TABLE), the three
skip-index file enumerations, OPTIMIZE's month enumeration, and the
HTTP API's table-change fingerprint. Seam tests pin each consumer
against a tiered table (tests/test_tiering.py).

Scale shape: the mover is O(aged months) directory renames — zero
Spark jobs, zero data bytes, exactly CH's background move cost class.
Reads union one file-listing root per volume; partition pruning and
footer stats apply per root unchanged.

Residency semantics (CH parity): rules fire at month granularity
(month strictly older than the horizon's cutoff month moves); with
several applicable rules the LONGEST-expired horizon wins (CH moves
a part by the most-aged satisfied rule); removing a rule leaves
parts where they are (CH does not move parts back when the policy
shrinks); mutations/compactions of a tiered month rewrite IN PLACE
on its volume; new inserts land on the default volume and age out on
the next pass.
"""

from __future__ import annotations

import os
import re
import shutil

from clickhouse_observability_spark.schema import PARTITION_COLUMN

TIERS_DIR = "_tiers"

#: the base path's volume name in enumerations (CH's default volume)
DEFAULT_VOLUME = "default"

# volume names come out of user SQL (TO VOLUME '...'); constrain to a
# single safe path segment like backup names (sources/mutations.py)
_VOLUME_NAME_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9_.-]*")


def _check_volume_name(name: str) -> str:
    if (name == DEFAULT_VOLUME or not _VOLUME_NAME_RE.fullmatch(name)
            or ".." in name):
        raise ValueError(
            f"invalid volume name {name!r}: must match "
            "[A-Za-z0-9][A-Za-z0-9_.-]*, not contain '..', and not "
            f"shadow the base volume {DEFAULT_VOLUME!r}")
    return name


# -- enumeration: base ∪ tiers ------------------------------------------

def tier_roots(path: str) -> list[tuple[str, str]]:
    """Every file-listing root of the table: [(volume, root_dir)],
    the base path first (volume 'default'), then armed/occupied tier
    volumes sorted by name. One listdir of `<path>/_tiers` (one stat
    when absent — the common untieered-table case costs nothing)."""
    roots = [(DEFAULT_VOLUME, path)]
    tdir = os.path.join(path, TIERS_DIR)
    if os.path.isdir(tdir):
        for v in sorted(os.listdir(tdir)):
            full = os.path.join(tdir, v)
            if os.path.isdir(full) and not v.startswith((".", "_")):
                roots.append((v, full))
    return roots


def partition_months(path: str) -> list[int]:
    """All live months across every volume, sorted, deduplicated
    (a month split across base + a tier by a late write counts
    once)."""
    out: set[int] = set()
    for _, root in tier_roots(path):
        for d in os.listdir(root) if os.path.isdir(root) else []:
            if d.startswith(f"{PARTITION_COLUMN}="):
                try:
                    out.add(int(d.split("=", 1)[1]))
                except ValueError:
                    pass
    return sorted(out)


def month_locations(path: str, month: int) -> list[tuple[str, str]]:
    """Every (volume, dir) currently holding `month`, warmest first
    and POLICY-coldest last: the base volume leads, then tier volumes
    ordered by their armed move rule's horizon ascending (a 90-day
    'archive' rule is colder than a 30-day 'cold' rule regardless of
    name order), with a name-order fallback for volumes no armed rule
    covers (manual MOVE targets). Usually one entry; transiently two
    when a late write re-created the month warmer, or mid-crash of a
    tier-to-tier move. The armed-rule read happens only on a split
    month, so the common single-location case stays one listdir."""
    locs = []
    for v, root in tier_roots(path):
        d = os.path.join(root, f"{PARTITION_COLUMN}={int(month)}")
        if os.path.isdir(d):
            locs.append((v, d))
    if len(locs) > 1:
        horizon = {r["volume"]: int(r["days"])
                   for r in read_storage_tiers(path)}
        locs.sort(key=lambda vd: (vd[0] != DEFAULT_VOLUME,
                                  horizon.get(vd[0], 0), vd[0]))
    return locs


def month_dirs(path: str, month: int) -> list[str]:
    """Every directory currently holding `month`, base volume first,
    policy-coldest last (`month_locations`). Usually one; transiently
    two when a late write re-created the month on the default volume
    after a move."""
    return [d for _, d in month_locations(path, month)]


def month_volume(path: str, month: int) -> str:
    """The volume serving `month` (the POLICY-coldest location when
    split mid-move: the tier with the longest armed horizon beats a
    shorter one beats base, matching where the month belongs)."""
    locs = month_locations(path, month)
    return locs[-1][0] if locs else DEFAULT_VOLUME


def live_files(path: str) -> dict[str, str]:
    """Root-relative path -> absolute path of every at-rest parquet
    file across every volume. The relative key is
    `<PARTITION>=<m>/<file>.parquet` REGARDLESS of volume — a move
    preserves both components, so skip-index sidecar entries keyed on
    it stay valid across tier moves with zero re-materialization."""
    import glob as _glob

    out: dict[str, str] = {}
    for _, root in tier_roots(path):
        for f in _glob.glob(os.path.join(
                root, f"{PARTITION_COLUMN}=*", "*.parquet")):
            out[os.path.relpath(f, root)] = f
    return out


def read_files(spark, path: str, rels: list[str], schema):
    """Read a subset of at-rest files (root-relative paths from
    `live_files`) with the table's physical schema — one scan per
    volume root (each gets its own basePath so the month partition
    value resolves), unioned. Shared by the skip-index pruned-read
    and incremental-materialize paths."""
    from functools import reduce

    from pyspark.sql import DataFrame

    live = live_files(path)
    by_root: dict[str, list[str]] = {}
    for rel in rels:
        f = live.get(rel)
        if f is None:
            continue  # dead entry: replaced since the verdict
        root = os.path.dirname(os.path.dirname(f))
        by_root.setdefault(root, []).append(f)
    scans = [
        spark.read.option("basePath", root).schema(schema)
        .parquet(*sorted(files))
        for root, files in sorted(by_root.items())
    ]
    if not scans:
        return None
    return reduce(DataFrame.unionByName, scans)


def consolidate_month(path: str, month: int) -> str:
    """Merge a month split across volumes into ONE directory (the
    POLICY-coldest current location — a split month means the move
    rule already fired and a late write re-created it warmer, or a
    tier-to-tier move crashed mid-way). Used by whole-month rewrites
    (TTL GROUP BY collapse, compaction) whose group semantics must
    span every row of the month. Metadata-only: per-file renames with
    collision-safe names; crash mid-merge leaves every file in
    exactly one enumerated location, and the next call completes.
    Returns the single surviving directory."""
    dirs = month_dirs(path, month)
    if not dirs:
        raise ValueError(f"no partition {int(month)}")
    if len(dirs) == 1:
        return dirs[0]
    target = dirs[-1]  # policy-coldest last (month_locations ordering)
    from clickhouse_observability_spark.sources.mutations import (
        _place_files,
    )

    for d in dirs[:-1]:
        _place_files(d, target, link=False)
        shutil.rmtree(d)
    return target


# -- armed move rules (the _ttl.json `to_volume` key) --------------------

def read_storage_tiers(path: str) -> list[dict]:
    """The armed move rules, sorted by horizon: [{"days": n,
    "volume": v, "kind": "VOLUME"|"DISK"}]."""
    from clickhouse_observability_spark.sources.retention import (
        read_table_ttl_spec,
    )

    spec = read_table_ttl_spec(path) or {}
    return sorted(spec.get("to_volume") or [],
                  key=lambda r: int(r["days"]))


def validate_tiers(tiers: list[dict]) -> list[dict]:
    out = []
    for r in tiers:
        days = int(r["days"])
        if days <= 0:
            raise ValueError("TTL ... TO VOLUME horizon must be "
                             "a positive day count")
        kind = str(r.get("kind") or "VOLUME").upper()
        if kind not in ("VOLUME", "DISK"):
            raise ValueError(f"unknown tier kind {kind!r}")
        out.append({"days": days,
                    "volume": _check_volume_name(str(r["volume"])),
                    "kind": kind})
    return sorted(out, key=lambda r: r["days"])


def plan_tiering(
    path: str,
    now,
    tiers: list[dict] | None = None,
) -> dict[str, list[int]]:
    """Which months WOULD move where under the armed rules —
    {volume: [months...]}, excluding months already resident at
    their target (idempotence). Pure cutoff math + residency probes,
    zero renames: this IS the mover's plan (`apply_tiering` executes
    exactly it) and the dry-run preview (`apply_retention`
    dry_run=True reports it)."""
    import datetime as dt

    if tiers is None:
        tiers = read_storage_tiers(path)
    tiers = validate_tiers(tiers)
    plan: dict[str, list[int]] = {}
    if not tiers:
        return plan
    cutoff_months = [
        ((now - dt.timedelta(days=r["days"])).year * 100
         + (now - dt.timedelta(days=r["days"])).month, r["volume"])
        for r in tiers
    ]
    for m in partition_months(path):
        target_vol = None
        for cm, vol in cutoff_months:  # ascending days: last hit wins
            if m < cm:
                target_vol = vol
        if target_vol is None:
            continue
        tdir = os.path.join(path, TIERS_DIR, target_vol,
                            f"{PARTITION_COLUMN}={m}")
        if any(d != tdir for d in month_dirs(path, m)):
            plan.setdefault(target_vol, []).append(m)
    return plan


def apply_tiering(
    path: str,
    now,
    tiers: list[dict] | None = None,
) -> dict:
    """The mover: relocate every month whose age satisfies a move
    rule to that rule's volume (longest-expired rule wins). Month
    granularity mirrors retention's DROP boundary: a month moves when
    it is STRICTLY older than the horizon's cutoff month (the
    boundary month stays — its young rows still belong to the warm
    tier; CH likewise moves whole parts only once fully expired).
    Metadata-only; idempotent (months already in place are skipped).
    Returns {"moved": {volume: [months...]}}."""
    from clickhouse_observability_spark.sources.mutations import (
        _place_files,
    )

    moved: dict[str, list[int]] = {}
    for target_vol, months in plan_tiering(path, now, tiers).items():
        troot = os.path.join(path, TIERS_DIR, target_vol)
        os.makedirs(troot, exist_ok=True)
        for m in months:
            tdir = os.path.join(troot, f"{PARTITION_COLUMN}={m}")
            srcs = [d for d in month_dirs(path, m) if d != tdir]
            for src in srcs:
                if not os.path.isdir(tdir):
                    os.rename(src, tdir)  # atomic whole-month move
                else:
                    _place_files(src, tdir, link=False)
                    shutil.rmtree(src)
            moved.setdefault(target_vol, []).append(m)
    return {"moved": moved}


def move_partition_to_volume(path: str, month: int, volume: str) -> dict:
    """CH `ALTER TABLE logs MOVE PARTITION <p> TO VOLUME 'v'` (and
    TO DISK): the MANUAL move statement — same metadata-only rename
    as the TTL mover, operator-initiated. `volume='default'` moves a
    tiered month back to the base path (CH: back to the policy's
    first volume). The ARMED POLICY stays authoritative: the next
    retention pass relocates every aged month to its matching rule's
    volume (multi-tier aging requires tier-to-tier moves, so an
    off-policy manual placement of an aged month is overridden —
    deterministic; the manual statement is the tool for tables
    without move rules, or for young months the rules don't cover).
    Returns {"op", "month", "volume", "moved"} — moved=False when
    already resident."""
    locs = month_dirs(path, month)
    if not locs:
        raise ValueError(f"no partition {int(month)} to move")
    if volume == DEFAULT_VOLUME:
        tdir = os.path.join(path, f"{PARTITION_COLUMN}={int(month)}")
    else:
        _check_volume_name(volume)
        troot = os.path.join(path, TIERS_DIR, volume)
        os.makedirs(troot, exist_ok=True)
        tdir = os.path.join(troot, f"{PARTITION_COLUMN}={int(month)}")
    srcs = [d for d in locs if d != tdir]
    if not srcs:
        return {"op": "move_partition_to_volume", "month": int(month),
                "volume": volume, "moved": False}
    from clickhouse_observability_spark.sources.mutations import (
        _place_files,
    )

    for src in srcs:
        if not os.path.isdir(tdir):
            os.rename(src, tdir)
        else:
            _place_files(src, tdir, link=False)
            shutil.rmtree(src)
    return {"op": "move_partition_to_volume", "month": int(month),
            "volume": volume, "moved": True}
