from fink_broker_spark.distribute.fanout import FilterRegistry, fan_out

__all__ = ["FilterRegistry", "fan_out"]
