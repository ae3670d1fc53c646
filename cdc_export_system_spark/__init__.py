"""cdc_export_system_spark — a PySpark-native analytics/CDC-export engine.

Re-implements the query and data-processing capabilities of the reference
``SaitejaSpidy18/CDC-Export-System`` (a FastAPI + PostgreSQL timestamp-CDC
export service) as an idiomatic Apache Spark engine:

* batch CDC exports (full / incremental / delta) with per-consumer
  watermark state   -> :mod:`cdc_export_system_spark.cdc`
* the general relational query surface (joins, aggregates, windows,
  set ops, sorts)    -> :mod:`cdc_export_system_spark.operators`
* scalar/text/JSON function surface -> :mod:`cdc_export_system_spark.functions`
* LLM-data-pipeline extensions (dedup, similarity search, multimodal
  columns, text analysis) -> :mod:`cdc_export_system_spark.dedup`,
  :mod:`.similarity`, :mod:`.multimodal`
* Structured Streaming CDC -> :mod:`cdc_export_system_spark.streaming`

Everything is expressed through the DataFrame/SQL API so Catalyst does
pushdown/pruning/join-selection; Python UDFs appear only as Arrow-batched
pandas UDFs on paths the built-ins cannot express.
"""

__version__ = "0.1.0"
