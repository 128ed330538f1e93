"""vector_database_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference vector-database project
(Bikram2055/vector_database), re-expressed Spark-first.

The reference is a Qdrant client + transformer data pipelines; this package
provides the same *semantics* (collections of fixed-dim vectors + payload,
top-k similarity search, upsert, tokenizer/vocab dataflow) as declarative
DataFrame plans optimized by Catalyst, plus the large-scale-pipeline
extensions (dedup, ANN, multimodal plumbing, text analysis, streaming).

Layout:
  functions/   column-level helpers (vector math, portable hashing, text)
  operators/   query operators (knn, ann, upsert, dedup, text ops, relational)
  sources/     multimodal binary-column plumbing
  streaming/   Structured Streaming ingest/aggregation over events
  catalog.py   collection DDL (create/exists/drop) on Parquet + JSON catalog
  session.py   SparkSession builder tuned for local[...] testing
"""

from vector_database_spark.session import get_spark
from vector_database_spark.catalog import Catalog, VectorCollection

__all__ = ["get_spark", "Catalog", "VectorCollection"]
__version__ = "0.1.0"
