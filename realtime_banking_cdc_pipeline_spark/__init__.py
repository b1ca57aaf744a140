"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference banking CDC pipeline
(JeffWilliams2/realtime-banking-cdc-pipeline), re-expressed Spark-first.

Layers (mirroring the reference's medallion architecture, SURVEY.md):

- ``sources``   — batch/stream readers, CDC envelope fixtures, parquet IO.
- ``operators`` — relational operator library (dedup-latest, SCD2 apply,
  incremental merge, quality assertions, window analytics).
- ``functions`` — scalar/vector function surface (text analysis,
  similarity & dedup hashing, embedding math).
- ``plans``     — the medallion model DAG (silver staging, gold star
  schema) as plain DataFrame-returning functions.
- ``streaming`` — Structured Streaming ingestion and analytics.

Everything is declarative DataFrame/SQL so Catalyst can push filters,
prune columns, and pick join strategies; Python UDFs are confined to
the few vectorized (Arrow) paths that built-ins cannot express.
"""

__version__ = "0.1.0"
