from fink_broker_spark.enrich.pipeline import EnrichmentPipeline, Processor

__all__ = ["EnrichmentPipeline", "Processor"]
