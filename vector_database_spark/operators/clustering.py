"""Distributed Lloyd's k-means in exact integer micro-unit arithmetic.

Cluster-based curation is a first-class pretraining-pipeline primitive:
SemDeDup (Abbas et al. 2023) dedupes within k-means clusters, cluster
balance drives data-mixing decisions, and IVF routing (operators/ann.py)
is a k-means coarse quantizer. MLlib's KMeans is float-based and
seed-dependent, so it can only ever be a rows-only operator. This one is
different: every quantity is an exact integer, so Spark and DuckDB compute
IDENTICAL clusterings and the operator carries a FULL oracle
(FIXTURES.md rules 6/8 applied to an iterative algorithm).

Determinism contract (mirrored line-for-line by the unrolled-CTE oracle in
queries.py::_sql_kmeans):
  * vectors → micro ints: ``floor(x * 1e6 + 0.5)`` per element (micro6).
  * init: the k smallest ids, in id order, are centroids 0..k-1.
  * assignment: argmin of EXACT integer squared distance, ties → smaller
    cluster id (array_min over (dist, cid) structs).
  * update: element-wise floor division sum//count (Python ``//`` ==
    the ``(s - ((s%n+n)%n)) / n`` SQL formula — true floor, not trunc).
  * empty cluster: keeps its previous centroid.
  * rounds is fixed and part of the declared semantics; because the
    arithmetic is exact, round r is bit-identical across engines, so the
    fixpoint rule (FIXTURES.md rule 9) is not needed here.

Scale shape (the plan a 1000-executor cluster wants):
  * assignment is MAP-SIDE: centroids are k×dim literals folded into a
    whole-stage-codegen'd expression — no join, no shuffle over the data.
  * the update shuffles only (cluster, dim) partial sums — k*dim rows
    after map-side partial aggregation, independent of data size.
  * driver state is k*dim ints per round (same bounded collect MLlib does).

Reference parity: the reference clusters implicitly through Qdrant's IVF
config surface; this implements the algorithm Spark-first
(vector_db.py:85-91 stores the points this would cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vector_database_spark.functions.vector import computed_once, round6
from vector_database_spark.operators.dedup import (
    COSINE_NEARDUP_THRESHOLD,
    _pair_sides,
)

KMEANS_K = 8
KMEANS_ROUNDS = 3


def _micro_vec(emb_col):
    """array<float> → array<bigint> micro units, the micro6 contract."""
    return F.transform(
        emb_col,
        lambda x: F.floor(x.cast("double") * F.lit(1000000.0) + F.lit(0.5)).cast(
            "long"
        ),
    )


def _dist_sq(mv_col, centroid: list[int]):
    """Exact integer squared L2 distance to a literal centroid.

    Deliberately an aggregate/zip_with fold: unrolling the k per-row
    distance chains into static expressions was measured 3x SLOWER
    (50k rows 5.5s -> 20.2s) — the generated straight-line method
    exceeds HotSpot's JIT bytecode ceiling and the stage drops to the
    bytecode interpreter (functions/vector.py module docstring)."""
    lit = F.array(*[F.lit(int(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(mv_col, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _argmin_struct(mv_col, centroids: list[list[int]]):
    """(dist_sq, cid) struct of the nearest centroid; ties → smaller cid."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _dist_sq(mv_col, c).alias("d"), F.lit(cid).alias("c")
                )
                for cid, c in enumerate(centroids)
            ]
        )
    )


def kmeans_micro(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = KMEANS_K,
    rounds: int = KMEANS_ROUNDS,
    storage_level=None,
) -> DataFrame:
    """Exact-integer Lloyd's k-means; returns (id, cluster, dist_sq).

    ``cluster``/``dist_sq`` are w.r.t. the centroids AFTER `rounds`
    assign+update iterations. Cross-engine-deterministic by construction.

    ``storage_level`` controls how the per-round micro projection is
    persisted. Default MEMORY_AND_DISK (PySpark's SERIALIZED level — the
    java-object form of wide long-arrays is ~4x the raw bytes). Pass
    ``False`` to skip persisting entirely and recompute the projection
    from the source each round: DataFrame caching builds in-memory
    columnar batches per task even at disk-backed levels
    (ColumnBuilder.ensureFreeSpace doubles ByteBuffers), and at high
    local task concurrency (local[32], 10M wide-array rows) those
    transient builders alone can OOM a default 8g single-JVM heap. The
    projection is a map-only pass over the source scan, so recompute
    costs one linear read per round — the trade a 100 TB run would make
    anyway rather than dedicate executor storage to a derivable
    intermediate (tools/stress_kmeans.py runs this shape at 10M rows on
    the default heap).
    """
    if k < 1:
        raise ValueError(f"kmeans_micro requires k >= 1, got {k}")
    pts = df.select(F.col(id_col).alias("_id"), _micro_vec(F.col(vec_col)).alias("mv"))
    # Re-scanned once per round; persist the micro projection
    # (deterministic, so cache-vs-recompute cannot change results — this
    # is purely a cost call). See the docstring for the level choice.
    persisted = storage_level is not False
    if persisted:
        from pyspark.storagelevel import StorageLevel

        pts = pts.persist(
            storage_level if storage_level is not None else StorageLevel.MEMORY_AND_DISK
        )

    init_rows = pts.orderBy("_id").limit(k).collect()
    centroids = [list(r["mv"]) for r in init_rows]
    if not centroids:
        if persisted:
            pts.unpersist()
        raise ValueError("kmeans_micro requires at least one input row")
    # fewer points than k: cluster ids stay 0..len-1 (matches the oracle,
    # whose c0 CTE also yields only the existing rows)
    k = len(centroids)
    dim = len(centroids[0])

    for _ in range(rounds):
        assigned = pts.select(
            _argmin_struct(F.col("mv"), centroids)["c"].alias("cluster"), "mv"
        )
        # k*dim partial-agg rows to the driver — bounded, like MLlib.
        sums = (
            assigned.select("cluster", F.posexplode("mv").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, list[tuple[int, int, int]]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], []).append((r["pos"], r["s"], r["n"]))
        new_centroids = []
        for cid in range(k):
            if cid in by_cluster:
                vals = sorted(by_cluster[cid])
                assert len(vals) == dim
                new_centroids.append([s // n for _, s, n in vals])
            else:
                new_centroids.append(centroids[cid])  # empty cluster: keep
        centroids = new_centroids

    # computed_once: the k-fold argmin is the expensive expression here.
    # Without the pin, CollapseProject substitutes it into BOTH field
    # extractions below, and a downstream equi-join on `cluster` infers
    # an isnotnull filter that Catalyst pushes down with a THIRD
    # substituted copy (caught by test_physical_plans' round-4 tripwire
    # on q_semdedup_kmeans). Pinned, the struct is evaluated once and
    # the extractions/filters read the attribute.
    final = pts.select(
        F.col("_id").alias(id_col),
        computed_once(_argmin_struct(F.col("mv"), centroids)).alias("am"),
    ).select(
        id_col, F.col("am.c").alias("cluster"), F.col("am.d").alias("dist_sq")
    )
    # Unpersist eagerly: the returned (lazy) final pass recomputes the
    # micro projection from the source in ONE map-side scan — cheaper than
    # holding rounds-worth of cached state hostage to the caller's
    # DataFrame lifetime.
    if persisted:
        pts.unpersist()
    return final.orderBy(id_col)


def semdedup_kmeans_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = KMEANS_K,
    rounds: int = KMEANS_ROUNDS,
    # shared with dedup + the DuckDB oracle (_sql_semdedup_kmeans) so the
    # two engines can't drift apart on independent copies of the constant
    threshold: float = COSINE_NEARDUP_THRESHOLD,
) -> DataFrame:
    """Paper-faithful SemDeDup (Abbas et al. 2023): k-means clusters, then
    cosine verified ONLY within clusters. The sign-bucket variant
    (dedup.semdedup_pairs) trades cluster quality for a cheap key; this
    one uses the actual k-means partition — and because kmeans_micro is
    exact-integer deterministic, it STILL carries a full DuckDB oracle
    (queries.py::q_semdedup_kmeans), which no float k-means could.

    Identical vectors always share a cluster (identical distances →
    identical argmin), so verbatim copies are never missed. Scale shape:
    the k-means rounds (map-side + k·dim shuffles) then ONE shuffle of
    (id, embedding) on the cluster key; pairs materialize per cluster.
    Output: (id_a, id_b, cos), id_a < id_b, cos >= threshold.
    """
    asgn = kmeans_micro(embeddings, emb_col, id_col, k, rounds).select(
        id_col, "cluster"
    )
    tagged = embeddings.select(id_col, emb_col).join(asgn, id_col)
    # per-row norms + single fold per pair, computed_once so the
    # threshold reads the projected cos (see dedup._pair_sides)
    a, b, ver_cos = _pair_sides(tagged, id_col, emb_col, extra=("cluster",))
    scored = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", round6(computed_once(ver_cos)).alias("cos"))
    )
    return scored.filter(F.col("cos") >= threshold).orderBy("id_a", "id_b")
