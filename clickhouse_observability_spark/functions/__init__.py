from clickhouse_observability_spark.functions.json_attrs import (
    attrs_get,
    attrs_map,
    attrs_to_json,
)
from clickhouse_observability_spark.functions.timeparse import (
    format_rfc3339,
    month_of,
    parse_ts_with_fallback,
)

__all__ = [
    "attrs_get",
    "attrs_map",
    "attrs_to_json",
    "format_rfc3339",
    "month_of",
    "parse_ts_with_fallback",
]
