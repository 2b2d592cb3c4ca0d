"""formula_1_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing capabilities of
the reference lakehouse ETL project (``uwe-uffuchs/formula-1``): medallion
bronze→silver→gold pipelines (JSON flatten → typed silver tables → joined /
aggregated / window-ranked gold marts → reporting SQL), plus large-scale
training-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing, streaming windows).

Everything is expressed Spark-first: declarative DataFrame / SQL plans that
Catalyst can optimize (predicate pushdown, broadcast joins, partial
aggregation, AQE), with Pandas UDFs only where built-ins genuinely cannot
express the semantics.
"""

__version__ = "0.1.0"
