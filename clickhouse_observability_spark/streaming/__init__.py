from clickhouse_observability_spark.streaming.batcher import IngestStream

__all__ = ["IngestStream"]
