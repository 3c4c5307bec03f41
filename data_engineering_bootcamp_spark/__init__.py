"""PySpark-native analytics engine with the query & data-processing
capabilities of phudekar/data-engineering-bootcamp.

Everything here is idiomatic Spark: declarative DataFrame/SQL plans that
Catalyst optimizes; no custom execution engine. The reference is a corpus
of analytic SQL + tested PySpark jobs + PyFlink streaming jobs — its
capability surface (dimensional modeling, fact modeling, physical tuning,
analytical patterns, streaming, experimentation metrics) is re-expressed
as a library of operators over DataFrames.

Layout:
  session     SparkSession factory tuned for local[32] testing and for
              1000-executor clusters (AQE, adaptive skew joins).
  schemas     explicit StructType registry for every table.
  sources     readers/writers (parquet, csv, bucketed/partitioned sinks).
  functions   scalar/array/bitmask/text function layer.
  operators   cumulation kernel, SCD, dedup, graph, growth, funnel,
              windows, grouping sets, similarity search.
  plans       the query catalog bound to the driver's testdata tables.
  streaming   Structured Streaming jobs (tumbling/session windows,
              enrichment UDF, foreachBatch sinks).
"""

__version__ = "0.1.0"
