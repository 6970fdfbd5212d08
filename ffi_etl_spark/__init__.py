"""ffi_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference pipeline (`dhariniramaswamy/ffi-etl`): a
medallion-style survey ETL (clean → recode → score → validity-split →
demographic roll-up → census merge → export), plus the large-scale
training-data operators a 100 TB pipeline needs (dedup, similarity
search, text analysis, multimodal column plumbing, event-time windows).

Design rules (see SURVEY.md §4/§7):
  * Everything is a lazy DataFrame plan — no mid-pipeline ``collect()``;
    driver scalars from the reference become windows over an empty
    partition spec or broadcast 1-row aggregates.
  * Built-in ``pyspark.sql.functions`` only in hot paths (JVM codegen);
    Pandas UDFs solely where semantics genuinely require Python.
  * Small dimension/config tables are broadcast; large joins/aggs rely
    on AQE + explicit repartitioning where the key is known.
"""

__version__ = "0.1.0"
