"""map_reduce_implementation_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``ssathyanaray2/Map-Reduce-Implementation`` (a single-node, fork-based C
MapReduce framework; see SURVEY.md) on Apache Spark, plus the extension
surface mandated by BASELINE.json: full relational operators, LLM-data-
pipeline operators (dedup, similarity search, multimodal columns, text
analysis) and a Structured Streaming surface — every operator designed
for 100 TB / 1000-executor scale even though tests run on local[32].

Layout
------
- ``session``     SparkSession factory (AQE on, sane shuffle partitions)
- ``jobs``        the two reference-parity jobs: letter_counter, word_finder
- ``core``        the generic MapReduce surface (reference mapreduce.h API)
- ``operators``   relational + dedup + similarity + text + multimodal ops
- ``sources``     readers/writers (text/csv/json/parquet) with scale notes
- ``functions``   scalar/text helper column functions
- ``plans``       plan-introspection helpers (explain audits)
- ``streaming``   Structured Streaming windows/watermark surface
"""

__version__ = "0.1.0"
