"""Approximate nearest neighbor (SURVEY B8) — the 100 TB scale path.

Qdrant answers k-NN with a server-side HNSW graph (compose.yaml:1-22,
outside the reference repo). A graph index doesn't map to Spark's
shared-nothing execution; the Spark-native equivalents are:

  1. Random-hyperplane LSH (signed projections → bit signature): bucket by
     signature prefix, search only the query's bucket(s), exact re-rank.
     Pure DataFrame ops — the hyperplanes are literal arrays, the signature
     is a codegen'd expression, NO Python in the scoring path.
  2. IVF-style coarse quantization via MLlib KMeans: partition by nearest
     centroid, probe the closest `nprobe` centroids, exact re-rank inside.

Both trade recall for scan fraction; recall is measured against the exact
operator (tests/test_ann_recall.py). Approximate by design → rows-only
correctness check, no DuckDB oracle (SURVEY §5.2).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_database_spark.functions.vector import cosine, round6

LSH_SEED = 42
LSH_BITS = 6
LSH_TABLES = 4


def _hyperplanes(dim: int, bits: int, seed: int = LSH_SEED) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim)


def lsh_signature_col(emb: Column, planes: np.ndarray) -> Column:
    """Bit signature: bit j = 1 iff emb . plane_j > 0 — as one expression."""
    from vector_database_spark.functions.vector import dot

    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        d = dot(emb, F.array(*[F.lit(float(v)) for v in plane]))
        sig = sig + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return sig


def with_lsh_signature(
    embeddings: DataFrame,
    dim: int = 64,
    bits: int = LSH_BITS,
    tables: int = LSH_TABLES,
    emb_col: str = "embedding",
) -> DataFrame:
    """Materialize one signature column per LSH table (``sig_0..sig_{L-1}``).

    Done once at ingest at scale; the collection is then partitioned by
    ``sig_0`` (primary table) with the others as pruning columns.
    """
    out = embeddings
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed=LSH_SEED + t)
        out = out.withColumn(f"sig_{t}", lsh_signature_col(F.col(emb_col), planes))
    return out


def lsh_knn(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 5,
    bits: int = LSH_BITS,
    tables: int = LSH_TABLES,
    max_hamming: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    payload_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """Approximate top-k: candidate = row matching ANY table's query bucket
    (within ``max_hamming``), then exact cosine re-rank of candidates.

    Multi-table OR is the classic recall lever for random-hyperplane LSH
    (P[miss] = Π_t P[miss table t]); multiprobe (hamming-1 neighbors of the
    query bucket) recovers quantization-boundary losses cheaply. The whole
    candidate predicate is one codegen'd filter — a single scan, no joins;
    with signatures materialized at ingest it becomes partition pruning.
    """
    dim = len(query_vector)
    tagged = with_lsh_signature(embeddings, dim=dim, bits=bits, tables=tables, emb_col=emb_col)
    pred = None
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed=LSH_SEED + t)
        qsig = int(
            sum((1 << j) for j, p in enumerate(planes) if float(np.dot(p, query_vector)) > 0)
        )
        probes = [qsig] + (
            [qsig ^ (1 << j) for j in range(bits)] if max_hamming >= 1 else []
        )
        term = F.col(f"sig_{t}").isin(probes)
        pred = term if pred is None else (pred | term)
    cands = tagged.filter(pred)
    q = F.array(*[F.lit(float(x)) for x in query_vector]).cast("array<double>")
    scored = cands.select(
        id_col, *payload_cols, round6(cosine(F.col(emb_col), q)).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def lsh_similarity_join(
    embeddings: DataFrame,
    threshold_l2: float = 0.5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_length: float = 0.5,
    num_hash_tables: int = 3,
    seed: int = LSH_SEED,
) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH approxSimilarityJoin (SURVEY B8's
    MLlib path): all pairs within an L2 distance threshold, found via
    hash-bucket co-location instead of the N² cross join.

    ARRAY<FLOAT> ↔ VectorUDT conversion happens only at this boundary
    (SURVEY §7.3). Output: (id_a, id_b, dist) with id_a < id_b.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        id_col, array_to_vector(F.col(emb_col).cast("array<double>")).alias("features")
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, threshold_l2, distCol="dist")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            round6(F.col("dist")).alias("dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .orderBy("id_a", "id_b")
    )


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = LSH_SEED,
):
    """IVF coarse index: KMeans centroids + per-row nearest-centroid
    assignment. Returns (assigned_df, centroids ndarray).

    The MLlib boundary is the only place arrays convert to VectorUDT
    (SURVEY §7.3); the assignment column is then plain relational state.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    vecs = embeddings.withColumn("features", array_to_vector(F.col(emb_col).cast("array<double>")))
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(vecs)
    assigned = model.transform(vecs).withColumnRenamed("prediction", "centroid_id").drop(
        "features"
    )
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centroids


def ivf_write_partitioned(assigned: DataFrame, path: str) -> None:
    """Materialize the IVF index as a centroid-partitioned Parquet layout —
    the physical form that turns nprobe into partition pruning (only
    nprobe/n_centroids of the files are even listed at query time)."""
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivf_knn_pruned(
    spark,
    path: str,
    centroids: np.ndarray,
    query_vector: list[float],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    payload_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """ivf_knn against the partitioned layout: the centroid filter is a
    partition predicate (verify: PartitionFilters in .explain)."""
    assigned = spark.read.parquet(path)
    return ivf_knn(
        assigned, centroids, query_vector, k=k, nprobe=nprobe,
        id_col=id_col, emb_col=emb_col, payload_cols=payload_cols,
    )


def ivf_knn(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vector: list[float],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    payload_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """Probe the ``nprobe`` nearest centroids, exact re-rank inside them.

    At scale ``centroid_id`` is the partition column → partition pruning
    reads nprobe/n_centroids of the data.
    """
    q = np.asarray(query_vector, dtype=float)
    cnorm = np.linalg.norm(centroids, axis=1) * np.linalg.norm(q)
    sims = centroids @ q / np.where(cnorm == 0, 1.0, cnorm)
    probe = [int(i) for i in np.argsort(-sims)[:nprobe]]
    cands = assigned.filter(F.col("centroid_id").isin(probe))
    qcol = F.array(*[F.lit(float(x)) for x in query_vector]).cast("array<double>")
    scored = cands.select(
        id_col, *payload_cols, round6(cosine(F.col(emb_col), qcol)).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
