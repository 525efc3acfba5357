"""fink_broker_spark — a PySpark-native streaming analytics engine.

A brand-new engine with the query and data-processing capabilities of an
astronomical alert broker (reference: astrolabsoftware/fink-broker), built
idiomatically on Spark DataFrame / SQL / Structured Streaming and extended
with large-scale training-data pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Layout (see SURVEY.md §7):
- ``core``      session factory, time (jd/mjd) utilities
- ``schema``    schema registry, select-with-defaults, flatten/cast planner
- ``operators`` relational operators (joins, dedup, window, salting, arrays)
- ``functions`` scalar column-expression libraries (text, vector, spatial)
- ``sources``   kafka + parquet batch/stream sources
- ``sinks``     parquet/kafka/memory sinks, compaction
- ``plans``     statistics-driven physical planning helpers
- ``streaming`` trigger policy, replay, multi-query management
- ``enrich``    enrichment-operator framework (science-module pipeline)
- ``ext``       extensions: dedup (minhash/simhash), ANN, multimodal
"""

__version__ = "0.1.0"
