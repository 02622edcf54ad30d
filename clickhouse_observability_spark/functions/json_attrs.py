"""attrs JSON helpers (F1/F4/F5 in SURVEY.md §2.8).

The reference stores `attrs` as a JSON object serialized to a string
(internal/db/db.go:46), marshals map->string on insert (db.go:160-165)
and unmarshals string->map with an empty-map fallback on read
(db.go:122-131). Its only query-side use is
`JSONExtractString(attrs,'user') = ?` (db.go:93-96).

ClickHouse `JSONExtractString` returns "" for a missing key while
`get_json_object` returns NULL; under the reference's only usage —
equality against a non-empty literal — the two behave identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MAP_TYPE = "map<string,string>"


def attrs_get(col: Column | str, key: str) -> Column:
    """JSONExtractString(attrs, key) (db.go:94) -> string value or NULL."""
    c = F.col(col) if isinstance(col, str) else col
    # $['k'] form keeps keys with dots/spaces intact.
    return F.get_json_object(c, f"$['{key}']")


def attrs_map(col: Column | str) -> Column:
    """String->map view with empty-map fallback (db.go:122-131)."""
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.from_json(c, _MAP_TYPE)
    return F.coalesce(parsed, F.expr("map()").cast(_MAP_TYPE))


def attrs_to_json(col: Column | str) -> Column:
    """map->JSON string for the at-rest form (db.go:160-165).

    Keys are sorted first (Go's json.Marshal emits sorted keys), so
    the at-rest bytes are deterministic and comparable.
    """
    c = F.col(col) if isinstance(col, str) else col
    canonical = F.map_from_entries(F.array_sort(F.map_entries(c)))
    return F.when(c.isNull(), F.lit("{}")).otherwise(F.to_json(canonical))
