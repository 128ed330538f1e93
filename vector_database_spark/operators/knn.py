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

from vector_database_spark.functions.vector import (
    cosine,
    dot,
    l2_dist,
    l2_norm,
    micro6,
    round6,
)

# HOF folds, deliberately: unrolled expression chains were measured
# SLOWER everywhere (HotSpot JIT method ceiling — functions/vector.py
# module docstring). The pair-scoring optimization that does pay is
# per-row norm tagging (one fold per pair), applied in knn_batch and
# similarity_self_join below.
_METRICS = {
    "cosine": (cosine, False),
    "dot": (dot, False),
    "euclid": (l2_dist, True),
}


def with_min_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin split a narrow input so per-row vector math engages
    every core. Higher-order-function folds (cosine/dot over arrays) are
    interpreted, not codegen'd — on a single-row-group file the whole
    scoring pass would otherwise run on one task. Only applies when the
    scan yields fewer partitions than ``defaultParallelism``; at cluster
    scale inputs already exceed that and no shuffle is added.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def score_col(metric: str, emb: Column, query) -> tuple[Column, bool]:
    """(rounded score column, ascending?) for a metric name.

    ``query`` may be a Column or a Python list (folded in as an array
    literal; its norm constant-folds at plan time for cosine).

    Zero-norm cosine is NULL (functions/vector.py::cosine, try_divide) and
    desc ordering is nulls-last, so zero vectors never outrank real
    candidates. The nanvl is belt-and-braces for any residual NaN (e.g.
    inf components): Spark sorts NaN FIRST under desc, which would rank
    garbage rows #1.
    """
    if isinstance(query, (list, tuple)):
        query = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    fn, asc = _METRICS[metric]
    score = round6(fn(emb, query))
    if metric == "cosine":
        score = F.nanvl(score, F.lit(None).cast("double"))
    return score, asc


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
    df = collection
    if pre_filter is not None:
        df = df.filter(pre_filter)
    score, asc = score_col(metric, F.col(emb_col), query)
    scored = df.select(id_col, *payload_cols, score.alias("score"))
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col(id_col).asc()]
    return scored.orderBy(*order).limit(k)


def matryoshka_knn(
    collection: DataFrame,
    query: list[float],
    k: int = 5,
    prefix_dim: int = 16,
    shortlist: int = 50,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    payload_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """Matryoshka two-stage search (Kusupati et al. 2022 MRL): score the
    FIRST ``prefix_dim`` components to build a ``shortlist``, then re-rank
    the shortlist by full-dimension cosine — the adaptive-retrieval
    pattern MRL embeddings are trained for (cheap prefix pass, exact
    final order).

    Both stages are deterministic expressions (slice + cosine +
    TakeOrdered), so unlike the LSH/IVF/PQ family this approximate index
    keeps a FULL DuckDB oracle. At scale the prefix stage reads
    prefix_dim/dim of the vector bytes when embeddings are stored
    column-chunked (or a materialized prefix column); the full vectors
    are touched only for the constant-size shortlist.
    Output: (id, *payload, score) — full-dim cosine, top-k.
    """
    pre_score, _ = score_col(
        "cosine",
        F.slice(F.col(emb_col).cast("array<double>"), 1, prefix_dim),
        list(query[:prefix_dim]),
    )
    short = (
        collection.select(id_col, *payload_cols, emb_col, pre_score.alias("pre"))
        .orderBy(F.col("pre").desc(), F.col(id_col).asc())
        .limit(shortlist)
    )
    full_score, _ = score_col("cosine", F.col(emb_col), list(query))
    return (
        short.select(id_col, *payload_cols, full_score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


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
    pair_filter: Column | None = None,
) -> DataFrame:
    """B5: N query vectors × top-k each.

    Plan: broadcast the (small) query side onto every collection partition
    — the collection is scanned ONCE with no shuffle of the big side — then
    a window ranks per query id. The only shuffle is of the scored
    candidate set on qid; at scale, pre-prune candidates with ann.py so the
    window input is k·P per query, not the whole collection.

    ``pair_filter`` is an extra (query, candidate) predicate applied
    map-side before scoring (e.g. hard_negatives' cross-label rule).
    """
    coll = with_min_parallelism(collection)
    norm_pre = metric == "cosine"
    if norm_pre:
        # norms once per ROW on each side — the per-pair score is then a
        # single fold instead of three; bit-identical to cosine(emb, qv)
        # since the denominator is the same sqrt(a·a)*sqrt(b·b) doubles
        # (functions/vector.py::l2_norm; 2.7x on 64M pairs, STRESS.md)
        coll = coll.withColumn("__cn", l2_norm(F.col(emb_col)))
        queries = queries.withColumn("__qn", l2_norm(F.col(q_emb_col)))
    joined = coll.crossJoin(F.broadcast(queries))
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(q_id_col))
    if pair_filter is not None:
        joined = joined.filter(pair_filter)
    if norm_pre:
        score = F.nanvl(
            round6(
                F.try_divide(
                    dot(F.col(emb_col), F.col(q_emb_col)),
                    F.col("__cn") * F.col("__qn"),
                )
            ),
            F.lit(None).cast("double"),
        )
        asc = False
    else:
        score, asc = score_col(metric, F.col(emb_col), F.col(q_emb_col))
    scored = joined.select(q_id_col, id_col, *payload_cols, score.alias("score"))
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col(id_col).asc()]
    w = Window.partitionBy(q_id_col).orderBy(*order)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def hard_negatives(
    anchors: DataFrame,
    collection: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
    q_id_col: str = "qid",
    q_emb_col: str = "qv",
    q_label_col: str = "qlabel",
) -> DataFrame:
    """Hard-negative mining — the embedding-model training-data op
    (DPR / SimCSE / contrastive fine-tuning): for each anchor, the k
    most-similar points with a DIFFERENT label, i.e. the negatives
    closest to the decision boundary that make contrastive batches
    informative.

    A thin wrapper over knn_batch: the cross-label predicate rides its
    ``pair_filter`` hook, applied BEFORE ranking (map-side, no wasted
    candidates). An anchor's own row has its own label, so self-matches
    are excluded by the label rule itself. At scale, pre-prune with
    ann.py buckets exactly like batch k-NN.
    Output: (qid, id, label, score) — top-k per anchor.
    """
    return knn_batch(
        anchors,
        collection,
        k=k,
        id_col=id_col,
        emb_col=emb_col,
        q_id_col=q_id_col,
        q_emb_col=q_emb_col,
        payload_cols=(label_col,),
        exclude_self=False,
        pair_filter=F.col(label_col) != F.col(q_label_col),
    )


def knn_batch_local_topk(
    queries: list[tuple[int, list[float]]],
    collection: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """B5 at scale: two-phase batch k-NN (SURVEY §4.3).

    Phase 1 (map-only, mapInPandas): each partition keeps a k-heap per
    query, scoring with one BLAS matmul per Arrow batch — nothing but
    k·P·|queries| candidate rows ever leave the executors. Phase 2: global
    top-k per query over those candidates (a tiny window).

    Compare with :func:`knn_batch`, which shuffles every scored row: at
    100 TB that shuffle is the bottleneck; here the shuffle is O(k·P).

    Determinism (round-6 directive 4, FULL-oracle upgrade): phase 1 keys
    every heap with ``py_micro6`` of the numpy score — the SAME half-up
    micro-unit rule the exact operator ranks by — and the EMITTED score is
    ``micro / 1e6``, i.e. exactly the double ``round6`` would produce for
    the fold-based score (IEEE division of an exact integer by the exact
    1e6 is correctly rounded; cosine scores have no exact decimal
    half-boundaries, see functions/vector.py::round6). The raw numpy
    float64 (which drifts ~1e-15 from the fold by summation order) never
    leaves the executor, so the output hash-matches :func:`knn_batch` /
    the q_knn_batch SQL oracle bit-for-bit.
    """
    import pandas as pd

    if not queries:
        return collection.select(
            F.lit(0).cast("bigint").alias("qid"),
            id_col,
            *payload_cols,
            F.lit(0.0).alias("score"),
        ).limit(0)
    q_ids = [int(q[0]) for q in queries]
    q_vecs = [[float(x) for x in q[1]] for q in queries]
    pay_fields = [collection.schema[c] for c in payload_cols]
    pay_ddl = "".join(f", {f.name} {f.dataType.simpleString()}" for f in pay_fields)

    def local_topk(batches):
        import heapq

        import numpy as np

        Q = np.asarray(q_vecs, dtype=np.float64)  # (nq, dim)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        heaps: list[list] = [[] for _ in q_ids]
        no_pay = ()
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            E = np.asarray([list(e) for e in pdf[emb_col]], dtype=np.float64)
            norms = np.linalg.norm(E, axis=1, keepdims=True)
            # zero-norm rows have no direction: score them -inf so they sort
            # behind every real candidate (the exact operator's null-score
            # rows sort last the same way) instead of emitting NaN, which
            # heap comparisons would silently drop.
            En = E / np.where(norms == 0.0, 1.0, norms)
            S = En @ Qn.T  # (batch, nq) cosine in one matmul
            S[norms[:, 0] == 0.0, :] = -np.inf
            # heap key: (micro6 score, -id) — the SAME half-up micro-unit
            # rule the global phase ranks by, so phase 1 never prunes a
            # candidate the global round would keep. Computed VECTORIZED:
            # np.floor(s*1e6+0.5) is the identical IEEE double expression
            # as functions/vector.py::py_micro6 (Python round()'s half-even
            # would disagree exactly on the .xxxxxx5 tie boundaries).
            # Non-finite (−inf zero-norm, NaN zero-norm query) → −1e18,
            # matching the old per-element isfinite guard.
            M = np.where(
                np.isfinite(S), np.floor(S * 1e6 + 0.5), -1.0e18
            ).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            pays = [pdf[c].tolist() for c in payload_cols]
            for qi, qid in enumerate(q_ids):
                col = M[:, qi]
                # the per-(row × query) Python loop is the phase-1 cost at
                # 1M rows; prune with one np.partition to the rows whose
                # key can still enter the top-k: everything >= the
                # (k+1)-th largest micro (k+1, not k, so an excluded self
                # row can't starve the candidate set; >= keeps ALL ties at
                # the boundary, so id tie-breaks stay exact)
                if n > k + 8:
                    kth = np.partition(col, n - (k + 1))[n - (k + 1)]
                    cand_idx = np.nonzero(col >= kth)[0]
                else:
                    cand_idx = range(n)
                heap = heaps[qi]
                for ri in cand_idx:
                    rid = int(ids[ri])
                    if exclude_self and rid == qid:
                        continue
                    item = (
                        int(col[ri]),
                        -rid,
                        tuple(p[ri] for p in pays) if pays else no_pay,
                    )
                    if len(heap) < k:
                        heapq.heappush(heap, item)
                    elif item[:2] > heap[0][:2]:
                        heapq.heapreplace(heap, item)
        rows: dict[str, list] = {
            "qid": [], id_col: [], **{c: [] for c in payload_cols}, "score": []
        }
        for qi, qid in enumerate(q_ids):
            for micro, negid, pay in heaps[qi]:
                rows["qid"].append(qid)
                rows[id_col].append(-negid)
                for c, v in zip(payload_cols, pay):
                    rows[c].append(v)
                # micro/1e6: exactly the round6 double of the fold score
                rows["score"].append(None if micro == -(10**18) else micro / 1e6)
        yield pd.DataFrame(rows).astype({"qid": "int64", id_col: "int64"})

    cands = collection.select(id_col, emb_col, *payload_cols).mapInPandas(
        local_topk, f"qid bigint, {id_col} bigint{pay_ddl}, score double"
    )
    # global rank over already-micro-quantized scores: tie-breaks at the k
    # boundary agree with the exact operator by construction
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .select("qid", id_col, *payload_cols, "score")
    )


def knn_batch_auto(
    queries: list[tuple[int, list[float]]],
    collection: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
    payload_cols: tuple[str, ...] = (),
    pair_row_budget: int = 2_000_000,
    rows_hint: int | None = None,
) -> DataFrame:
    """Batch k-NN with ADAPTIVE plan choice — the dispatcher a 100 TB
    deployment actually wants, instead of the caller hand-picking between
    :func:`knn_batch` (window plan) and :func:`knn_batch_local_topk`
    (two-phase heap plan).

    Cost model: the window plan shuffles every scored candidate —
    ``n_rows × n_queries`` rows — before ranking; the two-phase plan
    shuffles only ``k × P × n_queries`` heap survivors but pays a
    Python/Arrow pass over the collection. Measured crossover on this
    host (BENCH.json, STRESS.md): at 60k×10 = 0.6M pairs the window plan
    wins (1.0s vs 1.9s — the Arrow pass dominates); at 500k×16 = 8M pairs
    the two-phase plan wins 9× (3.9s vs 35.8s — the shuffle dominates, and
    it only gets worse with scale). The default budget of 2M pair-rows
    sits between those measured points.

    ``rows_hint`` skips the sizing job — production callers pass the
    table-metadata row count. Without it, ``collection.count()`` is used:
    for a parquet scan Spark answers that from footer row counts without
    reading data (sub-0.1s at sf0.1), and for derived inputs it is the
    price of an informed plan choice, paid once.

    Both branches emit identical rows (FULL-oracle determinism contract of
    each plan — asserted equal in tests), so the dispatch is purely a
    physical-plan decision, exactly like Catalyst choosing broadcast vs
    shuffle join on size estimates.
    """
    if not queries:
        return collection.select(
            F.lit(0).cast("bigint").alias("qid"),
            id_col,
            *payload_cols,
            F.lit(0.0).alias("score"),
        ).limit(0)
    # Round-trip query vectors through the collection's ELEMENT type
    # before dispatching: the window branch casts its query literals to
    # that type anyway (so Spark folds e.g. float32 doubles), but the
    # two-phase heap kernel scores whatever doubles it is handed. For a
    # query not exactly representable in the element type the ~1e-7
    # perturbation could flip a micro6 boundary and break the
    # "both branches emit identical rows" dispatch contract exactly when
    # the pair budget flips the plan — so both branches now score the
    # same rounded doubles.
    from pyspark.sql.types import FloatType

    elem = collection.schema[emb_col].dataType.elementType
    if isinstance(elem, FloatType):
        import numpy as np

        queries = [
            (
                int(qid),
                np.asarray([float(x) for x in qv], dtype=np.float32)
                .astype(np.float64)
                .tolist(),
            )
            for qid, qv in queries
        ]
    n_rows = rows_hint if rows_hint is not None else collection.count()
    if n_rows * max(len(queries), 1) > pair_row_budget:
        return knn_batch_local_topk(
            queries,
            collection,
            k=k,
            id_col=id_col,
            emb_col=emb_col,
            exclude_self=exclude_self,
            payload_cols=payload_cols,
        )
    spark = collection.sparkSession
    # query vectors as literals in the COLLECTION's element type, so the
    # window branch folds the exact same doubles q_knn_batch's oracle does
    emb_type = collection.schema[emb_col].dataType
    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
        "qid bigint, qv array<double>",
    ).withColumn("qv", F.col("qv").cast(emb_type))
    return knn_batch(
        qdf,
        collection,
        k=k,
        metric="cosine",
        id_col=id_col,
        emb_col=emb_col,
        payload_cols=payload_cols,
        exclude_self=exclude_self,
    ).select("qid", id_col, *payload_cols, "score")


def mmr_rerank(
    collection: DataFrame,
    query: list[float],
    k: int = 5,
    pool: int = 20,
    lam: float = 0.5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking: diversify the top-k by
    greedily picking argmax of ``lam*sim(q,d) - (1-lam)*max_{s∈S} sim(d,s)``
    (Carbonell & Goldstein 1998) from an exact top-``pool`` candidate set.

    Vector-DB result diversification: near-duplicate hits crowd out
    genuinely distinct neighbors; MMR trades relevance against novelty.

    Scale shape: phase 1 is the distributed exact top-``pool`` (a
    TakeOrderedAndProject scan, same as :func:`knn`); phase 2 is the greedy
    chain over ``pool`` rows on the driver — O(pool²·dim) work bounded by a
    parameter, not by data size, and inherently sequential (each pick
    depends on the previous). Determinism: micro6 keys, lower-id ties.
    """
    import numpy as np

    from vector_database_spark.functions.vector import py_micro6

    top = knn(
        collection,
        query,
        k=pool,
        metric="cosine",
        id_col=id_col,
        emb_col=emb_col,
        payload_cols=(emb_col,),
    )
    rows = top.collect()
    ids = [int(r[id_col]) for r in rows]
    rel = [float(r["score"]) for r in rows]  # round6 cosine from phase 1
    E = np.asarray([[float(x) for x in r[emb_col]] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(E, axis=1, keepdims=True)
    En = E / np.where(norms == 0.0, 1.0, norms)
    S = En @ En.T  # candidate-candidate cosine
    remaining = list(range(len(ids)))
    picked: list[tuple[int, float]] = []  # (row index, mmr value at pick)
    while remaining and len(picked) < k:
        best = None
        for i in remaining:
            if picked:
                max_sim = max(S[i][j] for j, _ in picked)
            else:
                max_sim = 0.0
            mmr = lam * rel[i] - (1.0 - lam) * max_sim
            key = (py_micro6(mmr), -ids[i])
            if best is None or key > best[0]:
                best = (key, i, mmr)
        picked.append((best[1], best[2]))
        remaining.remove(best[1])
    spark = collection.sparkSession
    return spark.createDataFrame(
        [
            (rank + 1, ids[i], rel[i], py_micro6(mmr))
            for rank, (i, mmr) in enumerate(picked)
        ],
        f"rank int, {id_col} long, score double, mmr_micro long",
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

    k=1 (the common "nearest other point" case) compiles to a
    ``max_by``/``min_by`` aggregation instead of a window: the partial
    (map-side) aggregate reduces every partition to one row per query
    BEFORE the shuffle, so only |queries|·P rows move — the window plan
    shuffles all |queries|·N scored rows to sort them. Tie-break is
    identical: ordering key (round6 score, −id) vs the window's
    (score DESC, id ASC); null scores (zero-norm cosine) lose in both
    (struct comparison puts null fields first, i.e. smallest under max).
    """
    left = collection.select(
        F.col(id_col).alias("qid"), F.col(emb_col).alias("qv")
    )
    if left_filter is not None:
        left = left.filter(left_filter)
    if k == 1:
        coll = with_min_parallelism(collection)
        if metric == "cosine":
            # per-row norms, single fold per pair (see knn_batch)
            coll = coll.withColumn("__cn", l2_norm(F.col(emb_col)))
            left = left.withColumn("__qn", l2_norm(F.col("qv")))
            score = F.nanvl(
                round6(
                    F.try_divide(
                        dot(F.col(emb_col), F.col("qv")),
                        F.col("__cn") * F.col("__qn"),
                    )
                ),
                F.lit(None).cast("double"),
            )
            asc = False
        else:
            score, asc = score_col(metric, F.col(emb_col), F.col("qv"))
        joined = coll.crossJoin(F.broadcast(left)).filter(
            F.col(id_col) != F.col("qid")
        )
        val = F.struct(
            F.col(id_col), *[F.col(c) for c in payload_cols], score.alias("score")
        )
        if asc:  # min score wins, tie → min id
            best = F.min_by(val, F.struct(score, F.col(id_col)))
        else:  # max score wins, tie → min id (max of −id)
            best = F.max_by(val, F.struct(score, (-F.col(id_col))))
        agg = joined.groupBy("qid").agg(best.alias("best"))
        return agg.select(
            "qid",
            f"best.{id_col}",
            *[f"best.{c}" for c in payload_cols],
            "best.score",
        )
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


def discover(
    collection: DataFrame,
    target: list[float],
    context: list[tuple[list[float], list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    payload_cols: tuple[str, ...] = ("label",),
    pre_filter: Column | None = None,
) -> DataFrame:
    """Qdrant discovery search (client.discover): rank candidates by how
    many (positive, negative) context pairs place them on the positive
    side, tie-broken by cosine similarity to the target vector.

    Semantics (engine-declared, cross-engine deterministic): for each
    candidate c, ``ctx_score = Σ_pairs [cos6(c, pos) > cos6(c, neg)]``
    where cos6 is 6dp-rounded cosine (equal-after-rounding counts as NOT
    closer in both engines); order by (ctx_score DESC, target cosine DESC,
    id ASC). The context pairs and target are tiny literals folded into
    the plan — one collection scan, no shuffle before the final top-k
    (TakeOrderedAndProject), so the operator scales like exact k-NN.
    """
    df = collection if pre_filter is None else collection.filter(pre_filter)
    e = F.col(emb_col)

    def lit_vec(v):
        return F.array(*[F.lit(float(x)) for x in v]).cast("array<double>")

    ctx_score = F.lit(0)
    for pos, neg in context:
        closer = round6(cosine(e, lit_vec(pos))) > round6(cosine(e, lit_vec(neg)))
        ctx_score = ctx_score + F.when(closer, 1).otherwise(0)
    scored = df.select(
        id_col,
        *payload_cols,
        ctx_score.cast("int").alias("ctx_score"),
        round6(cosine(e, lit_vec(target))).alias("target_score"),
    )
    return scored.orderBy(
        F.col("ctx_score").desc(),
        F.col("target_score").desc(),
        F.col(id_col).asc(),
    ).limit(k)


def context_search(
    collection: DataFrame,
    context: list[tuple[list[float], list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    payload_cols: tuple[str, ...] = ("label",),
    pre_filter: Column | None = None,
) -> DataFrame:
    """Qdrant CONTEXT search (ContextQuery — discovery's targetless
    sibling): rank candidates by how little they violate the context,
    ``score = Σ_pairs min(0, sim(c,pos) − sim(c,neg))`` (Qdrant's
    published context formula). A candidate inside every pair's positive
    zone scores the maximum 0; each pair whose negative is closer
    subtracts the margin. Similarities in integer micro-units, so the
    per-pair margins and their sum are exact in both engines.

    Same physical shape as :func:`discover`: pairs folded in as literals,
    one scan, TakeOrderedAndProject top-k.
    """
    df = collection if pre_filter is None else collection.filter(pre_filter)
    e = F.col(emb_col)

    def lit_vec(v):
        return F.array(*[F.lit(float(x)) for x in v]).cast("array<double>")

    score = F.lit(0).cast("long")
    for pos, neg in context:
        margin = micro6(cosine(e, lit_vec(pos))) - micro6(cosine(e, lit_vec(neg)))
        score = score + F.least(F.lit(0).cast("long"), margin)
    scored = df.select(id_col, *payload_cols, score.alias("ctx_micro"))
    return scored.orderBy(F.col("ctx_micro").desc(), F.col(id_col).asc()).limit(k)


def retrieval_eval_candidates(
    queries: list[tuple[int, list[float]]],
    collection: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Two-phase candidate generation for the retrieval-eval harness
    (q_retrieval_metrics' cluster-scale ranking stage): each partition
    keeps TWO k-heaps per query — the exact-cosine ground-truth leg
    (micro6 keys) and the int8-quantized dot system leg (exact integer
    keys) — so only 2·k·P·|queries| candidate rows shuffle instead of the
    whole scored corpus funneling through one reducer per query.

    int8 codes use the same per-vector symmetric formula as the column
    expression (scale 127/max|x|, half-up) in float64, so the integer dot
    is bit-identical to the SQL path and heap pruning can never disagree
    with the global tie-break ((key DESC, id ASC) both phases).

    Output: (qid, vec_id, leg 'truth'|'sys', key) — feed to a per-
    (qid, leg) top-k window and the metric rollup."""
    import numpy as np
    import pandas as pd

    q_ids = [int(q[0]) for q in queries]
    Q = np.asarray([[float(x) for x in q[1]] for q in queries], dtype=np.float64)

    def _int8(M: "np.ndarray") -> "np.ndarray":
        mx = np.abs(M).max(axis=1, keepdims=True)
        scale = np.where(mx > 0, 127.0 / np.where(mx == 0, 1.0, mx), 0.0)
        return np.floor(np.abs(M) * scale + 0.5) * np.sign(M)

    Qn = Q / np.where(
        np.linalg.norm(Q, axis=1, keepdims=True) == 0,
        1.0,
        np.linalg.norm(Q, axis=1, keepdims=True),
    )
    Q8 = _int8(Q)

    def local_heaps(batches):
        import heapq

        truth: list[list] = [[] for _ in q_ids]
        sys_h: list[list] = [[] for _ in q_ids]
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            E = np.asarray([list(e) for e in pdf[emb_col]], dtype=np.float64)
            norms = np.linalg.norm(E, axis=1, keepdims=True)
            En = E / np.where(norms == 0.0, 1.0, norms)
            S = En @ Qn.T
            S[norms[:, 0] == 0.0, :] = -np.inf
            # micro keys vectorized — the identical IEEE expression as
            # py_micro6 (see knn_batch_local_topk); int8 dots are exact
            # integers in float64 (|dot| <= dim*127², far below 2^53)
            M = np.where(
                np.isfinite(S), np.floor(S * 1e6 + 0.5), -1.0e18
            ).astype(np.int64)
            D = (_int8(E) @ Q8.T).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            for qi in range(len(q_ids)):
                for col, heap in ((M[:, qi], truth[qi]), (D[:, qi], sys_h[qi])):
                    # one np.partition prunes the per-(row × query) Python
                    # loop to the rows whose key reaches the (k+1)-th
                    # largest; >= keeps every boundary tie so the id
                    # tie-break stays exact (same rule as the two-phase
                    # batch k-NN — no query here excludes itself, the +1
                    # is pure safety margin)
                    if n > k + 8:
                        kth = np.partition(col, n - (k + 1))[n - (k + 1)]
                        cand_idx = np.nonzero(col >= kth)[0]
                    else:
                        cand_idx = range(n)
                    for ri in cand_idx:
                        item = (int(col[ri]), -int(ids[ri]))
                        if len(heap) < k:
                            heapq.heappush(heap, item)
                        elif item > heap[0]:
                            heapq.heapreplace(heap, item)
        rows = {"qid": [], id_col: [], "leg": [], "key": []}
        for qi, qid in enumerate(q_ids):
            for leg, heap in (("truth", truth[qi]), ("sys", sys_h[qi])):
                for key, negid in heap:
                    rows["qid"].append(qid)
                    rows[id_col].append(-negid)
                    rows["leg"].append(leg)
                    rows["key"].append(int(key))
        yield pd.DataFrame(rows).astype(
            {"qid": "int64", id_col: "int64", "leg": "object", "key": "int64"}
        )

    return collection.select(id_col, emb_col).mapInPandas(
        local_heaps, f"qid bigint, {id_col} bigint, leg string, key bigint"
    )
