from clickhouse_observability_spark.operators.query_logs import query_events, query_logs

__all__ = ["query_events", "query_logs"]
