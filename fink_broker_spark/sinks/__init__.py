from fink_broker_spark.sinks.parquet import compact_night, stream_to_parquet

__all__ = ["compact_night", "stream_to_parquet"]
