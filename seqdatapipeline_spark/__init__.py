"""seqdatapipeline_spark — a PySpark-native analytics engine.

A ground-up re-expression of the data-processing capabilities of the
reference pipeline (``awnimo/seqDataPipeline``) as native Spark
DataFrame operators, plus large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal
column plumbing).

Design principles (see SURVEY.md):

* DataFrame / SQL first — let Catalyst pick physical strategies.
* Explicit ``StructType`` schemas for every data abstraction the
  reference left implicit (SURVEY.md §1, D1-D9).
* Broadcast small dimension tables; bin big-big interval joins;
  partition alignment-shaped tables by (chrom, pos) range.
* Python UDFs only where built-ins genuinely can't express the
  semantics, and then always Arrow-batched (pandas_udf /
  applyInPandas / mapInPandas).
"""

from seqdatapipeline_spark.session import get_spark, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]

__version__ = "0.1.0"
