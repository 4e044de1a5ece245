"""mpg_data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the ``samsoe/mpg_data_warehouse`` reference (an
operational BigQuery + pandas/dplyr ETL toolkit) as an idiomatic
Apache Spark engine:

* declarative DataFrame/SQL plans optimized by Catalyst (the reference
  hand-pushes aggregates/filters into warehouse SQL — here the whole
  pipeline is one distributed lazy plan),
* explicit schemas for every warehouse table (``schemas.py``),
* engine-level operators the DataFrame API lacks natively
  (``operators/``: tidyr-style ``complete`` grid-fill, idempotent
  anti-join append, dedup families, similarity search),
* reference pipeline parity (``plans/``: ground-cover %,
  plant-functional-groups, species-richness wrangles and the
  CSV-ingest flows),
* large-scale training-data extensions (exact/MinHash/SimHash dedup,
  ANN search over embeddings, text-quality analysis, multimodal
  column plumbing, Structured Streaming ingest).

Designed for a 1000-executor cluster at ~100 TB: broadcast hints on
dimension tables, partition-by-year layout, AQE on, no Python UDFs in
hot paths (Arrow-batched pandas UDFs only where semantics require).
"""

from mpg_data_warehouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
