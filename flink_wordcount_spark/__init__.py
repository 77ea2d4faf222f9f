"""flink_wordcount_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``stephanie-wang/flink-wordcount`` (a Flink streaming word-count benchmark,
surveyed in SURVEY.md) on Apache Spark:

- Structured Streaming word count with stateful running counts, rate-controlled
  sentence source, latency/throughput instrumentation and checkpoint recovery
  (reference parity — see ``streaming/``).
- A full batch relational operator surface (scans, joins, aggregations, window
  functions, sorts, set ops, scalar/array/map/JSON functions) exercised against
  the TPC-H-ish driver fixtures and verified against a DuckDB oracle
  (see ``plans/``).
- LLM-data-pipeline operators: exact/near deduplication, similarity search
  over embeddings, text analysis, multimodal column plumbing
  (see ``operators/``).

Design stance: DataFrame/SQL-first. Every operator is declared with built-in
``pyspark.sql.functions`` expressions so Catalyst plans pushdown/pruning/join
strategy and Tungsten keeps the hot path in whole-stage codegen. Python UDFs
appear only where semantics require them, always Arrow-vectorized.
"""

__version__ = "0.1.0"
