from clickhouse_observability_spark.api.http import ApiError, LogsApi

__all__ = ["ApiError", "LogsApi"]
