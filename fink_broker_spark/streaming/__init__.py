from fink_broker_spark.streaming.replay import replay_to_table, run_stream

__all__ = ["replay_to_table", "run_stream"]
