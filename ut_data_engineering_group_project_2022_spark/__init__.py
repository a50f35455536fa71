"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference (KeaKohv/UT-Data-Engineering-Group-Project-2022),
re-expressed Spark-first per SURVEY.md.

Subpackages:
  - ``session``:   SparkSession factory tuned for the target cluster profile.
  - ``catalog``:   table loaders / temp-view registration for the test tables.
  - ``plans``:     the query surface — every SURVEY §2 operator as a named
                   query with a DuckDB oracle (the correctness contract).
  - ``operators``: composite operators (star loader, dedup, graph, similarity).
  - ``functions``: scalar/aggregate function library (text, metrics).
  - ``sources``:   readers/sinks (JSON/CSV/parquet, dead-letter channel).
  - ``streaming``: incremental micro-batch pipeline (Structured Streaming).
"""

__version__ = "0.1.0"
