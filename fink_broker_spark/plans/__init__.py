from fink_broker_spark.plans.partitioning import estimate_coalesce_partitions

__all__ = ["estimate_coalesce_partitions"]
