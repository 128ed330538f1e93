"""Exact k-NN operators (SURVEY §2.B) — the reference's core query surface.

Reference semantics: ``client.search(collection, query_vector, limit=k)``
returns the top-k points by the collection's metric with id + score +
payload (vector_db_query.py:78-89, text_img.py:74-85). Qdrant answers this
with a server-side HNSW index; the Spark-first answer is a declarative
scoring projection + ``orderBy().limit(k)``, which Catalyst compiles to
``TakeOrderedAndProject`` — each partition keeps a local k-heap and the
driver merges k*P candidates. No global sort, no index build, scales
linearly with executors. The approximate path for 100 TB is in ``ann.py``.

Determinism: scores rounded to 6dp (DOUBLE math), ordering on
(rounded score, id) in both engines (FIXTURES.md rules 1-2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_database_spark.functions.vector import cosine, dot, l2_dist, round6

_METRICS = {
    "cosine": (cosine, False),
    "dot": (dot, False),
    "euclid": (l2_dist, True),
}


def score_col(metric: str, emb: Column, query: Column) -> tuple[Column, bool]:
    """(rounded score column, ascending?) for a metric name."""
    fn, asc = _METRICS[metric]
    return round6(fn(emb, query)), asc


def knn(
    collection: DataFrame,
    query: Column | list[float],
    k: int = 5,
    metric: str = "cosine",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    payload_cols: tuple[str, ...] = ("label",),
    pre_filter: Column | None = None,
) -> DataFrame:
    """Exact top-k similarity search (B1/B2/B4/B6).

    ``query`` may be a Column (e.g. from a 1-row DataFrame crossJoin) or a
    Python list literal (B4 raw-vector query, vector_db_query.py:93-171).
    ``pre_filter`` applies a payload predicate *before* scoring (B6
    filtered k-NN) so Catalyst pushes it into the Parquet scan.
    """
    if isinstance(query, (list, tuple)):
        query = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    df = collection
    if pre_filter is not None:
        df = df.filter(pre_filter)
    score, asc = score_col(metric, F.col(emb_col), query)
    scored = df.select(id_col, *payload_cols, score.alias("score"))
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col(id_col).asc()]
    return scored.orderBy(*order).limit(k)


def knn_batch(
    queries: DataFrame,
    collection: DataFrame,
    k: int = 3,
    metric: str = "cosine",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    q_id_col: str = "qid",
    q_emb_col: str = "qv",
    payload_cols: tuple[str, ...] = ("label",),
    exclude_self: bool = True,
) -> DataFrame:
    """B5: N query vectors × top-k each.

    Plan: broadcast the (small) query side onto every collection partition
    — the collection is scanned ONCE with no shuffle of the big side — then
    a window ranks per query id. The only shuffle is of the scored
    candidate set on qid; at scale, pre-prune candidates with ann.py so the
    window input is k·P per query, not the whole collection.
    """
    q = F.broadcast(queries)
    joined = collection.crossJoin(q)
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(q_id_col))
    score, asc = score_col(metric, F.col(emb_col), F.col(q_emb_col))
    scored = joined.select(q_id_col, id_col, *payload_cols, score.alias("score"))
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col(id_col).asc()]
    w = Window.partitionBy(q_id_col).orderBy(*order)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def similarity_self_join(
    collection: DataFrame,
    k: int = 1,
    metric: str = "cosine",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    payload_cols: tuple[str, ...] = (),
    left_filter: Column | None = None,
) -> DataFrame:
    """B7: nearest neighbor(s) per point (similarity self-join).

    ``left_filter`` optionally restricts which points get neighbors (the
    right side is always the full collection). The left side is broadcast
    when small; for the full N×N case at scale use ann.py's LSH
    approxSimilarityJoin instead — this operator is the exact engine.
    """
    left = collection.select(
        F.col(id_col).alias("qid"), F.col(emb_col).alias("qv")
    )
    if left_filter is not None:
        left = left.filter(left_filter)
    return knn_batch(
        left,
        collection,
        k=k,
        metric=metric,
        id_col=id_col,
        emb_col=emb_col,
        payload_cols=payload_cols,
        exclude_self=True,
    )
