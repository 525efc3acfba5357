from fink_broker_spark.schema.registry import SchemaRegistry

__all__ = ["SchemaRegistry"]
