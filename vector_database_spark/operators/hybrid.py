"""Hybrid search: lexical (BM25) + vector (cosine) fused by Reciprocal
Rank Fusion (Cormack et al. 2009: score = Σ 1/(rrf_k + rank_i)).

Modern vector databases (Qdrant included, via its Query API prefetch +
fusion) expose exactly this shape: a keyword leg and an embedding leg,
each truncated to a bounded prefetch pool, fused on rank rather than on
incomparable raw scores. The reference's search surface is the vector leg
(vector_db_query.py:78-82); BM25 (operators/textanalysis.py) is the
lexical leg; this module is the fusion.

Scale shape: the candidate set is the BM25-scored docs (docs containing at
least one query term — explode + filter prunes everything else at the
scan), joined 1:1 to their embeddings, and pinned once (localCheckpoint)
so both legs read it without re-running BM25. Each leg is a
TakeOrderedAndProject top-``prefetch_n`` — per-partition heaps, never a
global sort — and the pool is O(prefetch_n) BY DEFINITION (Qdrant's
``prefetch.limit`` materializes the same bounded list), so ranking it
with an unpartitioned row_number window is a ≤100-row single-partition
exchange inside ONE plan — no driver collect, no createDataFrame
re-upload, one Spark job fewer per query. A doc absent from one leg's pool
contributes nothing from that leg (the standard prefetch-RRF convention).
Determinism: round6 scores, id tie-breaks, ranks as BIGINT, RRF terms
added in fixed expression order (the fusion arithmetic stays a Spark
expression over the literal rank table, identical to the oracle's).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_database_spark.functions.vector import cosine, micro6, round6
from vector_database_spark.operators.textanalysis import bm25_search

RRF_K = 60
PREFETCH_N = 100


def hybrid_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec: list[float] | Column,
    k: int = 10,
    doc_id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    emb_col: str = "embedding",
    rrf_k: int = RRF_K,
    prefetch_n: int = PREFETCH_N,
) -> DataFrame:
    """Top-k docs by RRF over (BM25 rank, cosine rank).

    Output: (doc_id, rank_lex, rank_vec, rrf) ordered by rrf desc, id.
    Each rank is computed over the shared candidate set (BM25-scored docs
    that have an embedding) and truncated to the leg's top-``prefetch_n``;
    a doc outside one leg's pool has a NULL rank there and a 0 RRF term.
    """
    if isinstance(query_vec, (list, tuple)):
        query_vec = F.array(*[F.lit(float(x)) for x in query_vec]).cast(
            "array<double>"
        )
    cos = cosine(F.col(emb_col), query_vec)
    lex = bm25_search(docs, query_terms, k=None, id_col=doc_id_col)
    cand = lex.join(
        embeddings.select(
            F.col(emb_id_col).alias(doc_id_col),
            round6(cos).alias("cos"),
        ),
        doc_id_col,
    )
    # pin the scored candidate set ONCE: both leg top-Ns read the
    # materialized candidates instead of re-evaluating the BM25 plan
    cand = cand.select(doc_id_col, "score", "cos").localCheckpoint(eager=True)
    # each leg: TakeOrderedAndProject top-N (partial heaps) → a bounded
    # O(prefetch_n) pool, then rank IN-PLAN with a row_number window. The
    # window has no partitionBy, which is only safe because the input is
    # the already-limited pool — ≤ prefetch_n rows by construction (the
    # single-partition exchange moves ≤100 rows, like Qdrant materializing
    # prefetch.limit). No driver collect / re-upload round-trip.
    def _leg_rank(order_col: Column, rank_name: str) -> DataFrame:
        from pyspark.sql.window import Window

        pool = cand.orderBy(
            order_col.desc(), F.col(doc_id_col).asc()
        ).limit(prefetch_n)
        w = Window.orderBy(order_col.desc(), F.col(doc_id_col).asc())
        return pool.select(
            doc_id_col,
            F.row_number().over(w).cast("long").alias(rank_name),
        )

    fused = _leg_rank(F.col("score"), "rank_lex").join(
        _leg_rank(F.col("cos"), "rank_vec"), doc_id_col, "full_outer"
    )
    # micro6, not round6: RRF is a sum of integer reciprocals, which CAN
    # land exactly on .5e-6 boundaries (e.g. 1/128 = 7812.5 micro) where
    # Spark's and DuckDB's round() disagree — micro6 is the repo rule for
    # integer-ratio outputs
    rrf = micro6(
        F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_lex")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_vec")), F.lit(0.0))
    )
    return (
        fused.select(doc_id_col, "rank_lex", "rank_vec", rrf.alias("rrf_micro"))
        .orderBy(F.col("rrf_micro").desc(), F.col(doc_id_col).asc())
        .limit(k)
    )
