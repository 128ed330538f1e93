"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``vector_database_spark`` (see SURVEY.md §2 for the
operator inventory this registry covers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: batch k-NN — top-3 cosine
    neighbors for each of 10 query vectors, with payload (SURVEY B5,
    generalizing vector_db_query.py:78-89)."""
    from vector_database_spark.queries import q_knn_batch

    return q_knn_batch(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from vector_database_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query. Approximate operators
    (q_knn_lsh, q_knn_ivf) are intentionally absent → rows-only check."""
    from vector_database_spark.queries import ORACLES

    return dict(ORACLES)
