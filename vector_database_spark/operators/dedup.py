"""Deduplication operators — exact and near-duplicate (SURVEY §2.F F1/F2 +
north-star training-pipeline extensions).

All hash math uses the portable md5-derived hash (functions/hashing.py) so
MinHash signatures, SimHash values and band buckets are bit-identical
between Spark and the DuckDB oracle — near-dup dedup here is fully
oracle-checkable, not rows-only.

Scale notes (100 TB):
  - exact dedup: hash-groupBy is one shuffle on a 128-bit key; with the
    corpus bucketed by md5(text) it is shuffle-free.
  - MinHash LSH: signatures are a map-only pass (explode tokens → 2 aggs);
    band-bucket join materializes only colliding pairs (vs N² pairwise).
    Band buckets are the classic skew hazard — salt/AQE handles hot buckets.
  - verification joins intersect token sets only for candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_database_spark.functions.hashing import seeded_hash
from vector_database_spark.functions.text import explode_tokens, tokenize_ws
from vector_database_spark.functions.vector import (
    computed_once,
    dot,
    l2_norm,
    micro6,
    round6,
)

NUM_HASHES = 8          # minhash signature length
BANDS = 4               # → 2 rows per band; P(collide) = 1-(1-j^2)^4
JACCARD_THRESHOLD = 0.5
# 64-bit fingerprints (Manku et al. 2007's operating point): with 4 bands
# of 16 bits each, band keys take 2^16 values, so the band join's candidate
# count tracks true near-dup density instead of N²/16 (the round-4 16-bit
# default's failure mode at corpus scale).
SIMHASH_BITS = 64
COSINE_NEARDUP_THRESHOLD = 0.95


def substring_dedup(
    docs: DataFrame,
    window_tokens: int,
    seed: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document exact-substring dedup (Lee et al. 2022): flag any doc
    sharing a ``window_tokens``-token window with an earlier (lower-id)
    doc. Distributed stand-in for the paper's suffix array: hash every
    window, attribute each distinct window hash to its first-seen doc id
    (min over the corpus), mark later docs repeating one.

    Output: (id_col, n_windows, n_dup_windows, is_dup) — every input doc
    appears; docs shorter than the window have n_windows = 0. Output
    contract: both counts are over the doc's DISTINCT window hashes (the
    post-``.distinct()`` set), not raw token windows — a doc repeating the
    same window internally counts it once, so n_windows can be smaller
    than size(tokens) - W + 1.

    Scale shape: two linear shuffles (window-hash min-attribution, per-doc
    verdict); nothing quadratic. The r11 min()-window attribution is NOT
    partial-agg combinable on the first shuffle: WindowExec buffers each
    ``g`` group in one task, so a window hash shared by a large fraction
    of docs becomes one giant (spilling, but not OOMing) group — the
    hot-key hazard the module header warns about, traded for one fewer
    exchange of the window-hash table. Corpora with such a hash are
    boilerplate-dominated and belong in line_dedup first; revert to the
    combinable groupBy(g)+equi-join form if that trade ever bites. Used
    by queries.py::q_substring_dedup and the 1M-doc stress probe.
    """
    # pinned: the length guard otherwise pushes down a substituted second
    # tokenize per document (functions/text.py::explode_tokens rationale)
    base = docs.select(
        id_col, computed_once(tokenize_ws(F.col(text_col))).alias("tk")
    ).filter(F.size("tk") >= window_tokens)
    warr = F.transform(
        F.sequence(F.lit(0), F.size("tk") - window_tokens),
        lambda i: F.array_join(F.slice(F.col("tk"), i + 1, window_tokens), " "),
    )
    # r11 (guide §2.4): the per-doc DISTINCT window-hash set is computed
    # map-side — hash the window array, array_distinct it, THEN explode —
    # identical (id, g) pairs to the old explode → .distinct(), minus the
    # global distinct's full shuffle of the window table. Pinned for the
    # same inferred-pre-filter reason as the token explode.
    harr = F.array_distinct(
        F.transform(warr, lambda w: seeded_hash(w, seed))
    )
    wh = base.select(id_col, computed_once(harr).alias("harr")).select(
        id_col, F.explode("harr").alias("g")
    )
    # r11 (guide §2.4): first-seen attribution as a min() window over g —
    # the old groupBy(g) + equi-join back on g paid two exchanges of the
    # window-hash table for a value a single partition-by-g pass computes
    w_first = Window.partitionBy("g")
    per_doc = (
        wh.withColumn("first_doc", F.min(id_col).over(w_first))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum((F.col("first_doc") < F.col(id_col)).cast("long"))
            .cast("long")
            .alias("n_dup_windows"),
        )
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_windows"), F.lit(0)).cast("long").alias("n_windows"),
        F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long").alias("n_dup_windows"),
        (F.coalesce(F.col("n_dup_windows"), F.lit(0)) > 0).alias("is_dup"),
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """F1: exact dedup by content hash, keep lowest id per hash group."""
    w = Window.partitionBy("text_hash").orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("text_hash", F.md5(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Distinct (id, token) pairs — the shingle sets for Jaccard/MinHash.

    r11 (guide §2.4): per-doc ``array_distinct`` BEFORE the explode —
    since the id rides every row, per-doc-distinct tokens ARE the
    distinct (id, token) pairs, and the map-side form removes the full
    shuffle the old global ``.distinct()`` paid on every signature pass
    (the token table is the widest intermediate of the dedup family)."""
    return explode_tokens(docs, (id_col,), text_col, distinct=True)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = NUM_HASHES,
    toks: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per document: h_i = min over tokens of seeded hash i.

    One explode + one groupBy with ``num_hashes`` min() aggregates —
    map-side combinable, single shuffle on doc id. ``toks`` (r11)
    optionally supplies the distinct (id, token) pair table when the
    caller already persists one, skipping the explode+distinct pass.
    Output: (id_col, h0..h{n-1} BIGINT).
    """
    if toks is None:
        toks = _doc_tokens(docs, text_col, id_col)
    aggs = [
        F.min(seeded_hash(F.col("token"), i)).alias(f"h{i}") for i in range(num_hashes)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def _band_key_exprs(num_hashes: int, bands: int) -> list:
    """One concat_ws band-key expression per band (the band index leads
    the key so keys of different bands never collide)."""
    rows_per_band = num_hashes // bands
    keys = []
    for b in range(bands):
        cols = [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
        keys.append(
            F.concat_ws("_", F.lit(str(b)), *[F.col(c).cast("string") for c in cols])
        )
    return keys


def band_keys(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
) -> DataFrame:
    """(bid, band_key) rows — one per (doc, band); docs sharing a band's
    full sub-signature collide on band_key. Shared by the self-join dedup
    (minhash_band_pairs) and the incremental batch-vs-corpus dedup.

    r11 (guide §2.2): one generate pass — the keys project as an array
    and explode — instead of a ``bands``-way union of selects. The union
    form ran bands × input-partitions map tasks (tiny tasks over the
    cached signature table dominated every probe/band-join stage at
    bench SF); the explode form runs one map task per input partition
    and emits the identical (bid, band_key) multiset. The array is
    pinned (computed_once) so InferFiltersFromGenerate cannot clone the
    key expressions into a scan-level pre-filter (same audit finding as
    explode_tokens)."""
    from vector_database_spark.functions.vector import computed_once

    keys = _band_key_exprs(num_hashes, bands)
    pinned = signatures.select(
        F.col(id_col).alias("bid"), computed_once(F.array(*keys)).alias("__bks")
    )
    return pinned.select("bid", F.explode("__bks").alias("band_key"))


def _band_keys_levels(
    signatures: DataFrame,
    id_col: str,
    levels: list[tuple[int, int]],
) -> DataFrame:
    """(bid, __nh, __nb, band_key) rows for SEVERAL banding levels in the
    same single generate pass (r11) — the probe-side shape shared by the
    escalation-ladder volume probes and the persisted band-count
    companion. The pre-r11 union-of-selects form ran
    Σ levels×bands map tasks per cached partition (384 tiny tasks per
    probe at the bench SF — guide §2.2); this emits the identical tagged
    multiset from one task per input partition."""
    from vector_database_spark.functions.vector import computed_once

    entries = []
    for nh, nb in levels:
        for key in _band_key_exprs(nh, nb):
            entries.append(
                F.struct(
                    F.lit(nh).cast("int").alias("__nh"),
                    F.lit(nb).cast("int").alias("__nb"),
                    key.alias("band_key"),
                )
            )
    pinned = signatures.select(
        F.col(id_col).alias("bid"), computed_once(F.array(*entries)).alias("__bke")
    )
    ex = pinned.select("bid", F.explode("__bke").alias("__e"))
    return ex.select(
        "bid",
        F.col("__e.__nh").alias("__nh"),
        F.col("__e.__nb").alias("__nb"),
        F.col("__e.band_key").alias("band_key"),
    )


def minhash_band_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
) -> DataFrame:
    """LSH banding: candidate pairs = docs sharing any band's full sub-signature.

    Output: distinct (id_a, id_b) with id_a < id_b.
    """
    all_bands = band_keys(signatures, id_col, num_hashes, bands)
    a = all_bands.select(F.col("bid").alias("id_a"), "band_key")
    b_ = all_bands.select(F.col("bid").alias("id_b"), "band_key")
    return (
        a.join(b_, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


MAX_BITMASK_VOCAB = 4096  # 64 longs per set; beyond this use array_intersect

# Broadcast the doc→token-set map in the verify stage only while the
# ESTIMATED build side fits a bounded budget. The r1-r6 gate was a doc
# COUNT (5M) calibrated for the packed-bitmask representation (~64 B/row);
# the token-ARRAY representation (vocab > MAX_BITMASK_VOCAB) carries
# ~0.5-1 KB/row, and at 2M pipeline docs (~1.3M after quality) the forced
# broadcast died building the hash table ("Not enough memory to build and
# broadcast", found by the r7 2M pipeline stress). The gate is therefore a
# BYTE budget with a per-representation row estimate: the hint is withheld
# past it and Catalyst/AQE pick shuffle joins (or a runtime broadcast if
# the map turns out small) — an unconditional hint would OOM executors
# before AQE could fall back.
BROADCAST_VERIFY_MAX_BYTES = 256 * 1024 * 1024
BITMASK_ROW_BYTES_BASE = 24          # id + set_size + row overhead
ARRAY_VERIFY_ROW_BYTES = 768         # conservative distinct-token array row
# legacy count cap, still the outer bound for tiny-row sides (id-only etc.)
BROADCAST_VERIFY_MAX_DOCS = 5_000_000


def _maybe_broadcast(
    df: DataFrame, n_rows: int, row_bytes: int | None = None
) -> DataFrame:
    if n_rows > BROADCAST_VERIFY_MAX_DOCS:
        return df
    if row_bytes is not None and n_rows * row_bytes > BROADCAST_VERIFY_MAX_BYTES:
        return df
    return F.broadcast(df)


# sentinel: the caller already knows the vocabulary exceeds
# MAX_BITMASK_VOCAB — _token_bitmasks picks the array representation
# without running its probe job
_VOCAB_OVER_CAP = object()


def _token_bitmasks(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    toks: DataFrame | None = None,
    vocab_tokens=None,
):
    """(masks_df, n_words) — per-doc token set as packed 64-bit words, or
    None when the corpus vocabulary exceeds MAX_BITMASK_VOCAB.

    Intersection of two packed sets is W ANDs + popcounts — orders of
    magnitude cheaper than hashing string arrays when millions of candidate
    pairs need verification. The global vocabulary cardinality decides the
    representation at plan-build time; since r11 that decision is ONE
    bounded job — ``limit(MAX_BITMASK_VOCAB + 1).collect()`` — instead of
    a count() plus a second full collect(): at most cap+1 rows ever reach
    the driver, a truncated result proves the vocab is over the cap (→
    array representation), and an untruncated one IS the complete vocab.

    ``toks`` (optional) is the caller's already-persisted distinct
    (id, token) pair table — the signature passes build exactly this
    table, so threading it here removes a tokenize+distinct shuffle per
    verify (guide §2.4); when omitted the table derives from ``docs``.

    ``vocab_tokens`` (r12, guide §1.2): the caller's already-known
    COMPLETE vocabulary of ``docs`` — either the set of token strings
    (must be the full distinct-token set, ≤ cap or not) or the
    ``_VOCAB_OVER_CAP`` sentinel. With it the representation decision
    costs ZERO Spark jobs here; the incremental paths derive it from
    the at-rest corpus vocabulary plus a batch-only probe instead of
    re-aggregating the corpus-scale union token table every call.
    """
    if vocab_tokens is _VOCAB_OVER_CAP:
        return None, 0
    if toks is None:
        toks = explode_tokens(docs, (id_col,), text_col, distinct=True)
    if vocab_tokens is not None:
        if len(vocab_tokens) > MAX_BITMASK_VOCAB:
            return None, 0
        tokens = sorted(vocab_tokens)
    else:
        vocab = toks.select("token").distinct()
        probe_rows = vocab.limit(MAX_BITMASK_VOCAB + 1).collect()
        if len(probe_rows) > MAX_BITMASK_VOCAB:
            return None, 0
        # dense token ids: the vocab is <= MAX_BITMASK_VOCAB by the gate
        # above (the whole bitmask representation exists only under that
        # bound), so sorting it on the driver is a bounded collect — no
        # global window
        tokens = sorted(r["token"] for r in probe_rows)
    n_vocab = len(tokens)
    n_words = max(1, (n_vocab + 63) // 64)
    vocab_ids = docs.sparkSession.createDataFrame(
        [(t, i) for i, t in enumerate(tokens)], "token string, tid int"
    )
    tagged = toks.join(F.broadcast(vocab_ids), "token")
    word = (F.col("tid") / 64).cast("int")
    # pyspark's shiftleft() only takes a literal shift; the SQL form takes a column
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(tid % 64 AS INT))")
    masks = tagged.groupBy(id_col).agg(
        *[
            F.bit_or(F.when(word == w, bit).otherwise(F.lit(0).cast("long"))).alias(f"w{w}")
            for w in range(n_words)
        ],
        F.count("*").alias("set_size"),
    )
    return masks, n_words


def jaccard_verify(
    candidate_pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = JACCARD_THRESHOLD,
    toks: DataFrame | None = None,
    n_docs: int | None = None,
    vocab_tokens=None,
) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs; keep >= threshold.

    Output: (id_a, id_b, jaccard_micro BIGINT) — micro-units because
    integer ratios hit exact half-boundaries where round() diverges
    across engines (functions/vector.py::micro6).

    Plan note (scale): when the doc→set map is small enough to broadcast,
    the candidate-pair stream (near-quadratic on degenerate corpora) flows
    map-side through both joins with NO shuffle of the pairs. The hint is
    CONDITIONAL on a cheap doc count (<= BROADCAST_VERIFY_MAX_DOCS): a
    100 TB corpus fails the gate, the hint is withheld, and Catalyst/AQE
    pick shuffle joins (or a runtime broadcast if the map turns out small)
    — an unconditional hint would OOM executors before AQE could fall
    back. The set representation is adaptive: packed 64-bit bitmask words
    when the corpus vocabulary is small (intersection = W ANDs +
    popcounts), distinct-token arrays with ``array_intersect`` otherwise.

    r11 (guide §1.2/§2.4): callers that already know the doc count pass
    ``n_docs`` (it only gates the broadcast hint) and callers holding the
    persisted distinct (id, token) table pass ``toks`` so the bitmask
    build reads the cache instead of re-tokenizing ``docs``.
    """
    global _live_sigs
    if n_docs is None:
        n_docs = docs.select(id_col).count()
    masks, n_words = _token_bitmasks(
        docs, text_col, id_col, toks=toks, vocab_tokens=vocab_tokens
    )
    if masks is not None:
        # r12 (guide §5): both join sides below carry their own copy of
        # the mask aggregation and neither compile-time ReuseExchange
        # nor runtime AQE reuse fires (verified on the executed plan —
        # the computed_once pin in the token lineage defeats plan
        # canonicalization), so the doc→mask table was built TWICE per
        # verify. Persisting it lets the CacheManager substitute both
        # sides (one build; measured −15% on the indexed incremental
        # row). BOUNDED: the bitmask representation exists only under
        # MAX_BITMASK_VOCAB, so a row is ≤ 8·n_words+24 B. Released by
        # the next dedup call's cache rotation. The over-cap ARRAY path
        # is deliberately NOT persisted: its per-doc token arrays are
        # corpus-scale, and pinning them would trade the second build
        # for corpus-sized executor storage.
        masks = masks.persist()
        if isinstance(_live_sigs, list):
            _live_sigs.append(masks)
        elif _live_sigs is None:
            _live_sigs = [masks]
        else:
            _live_sigs = [_live_sigs, masks]
        cols = [f"w{w}" for w in range(n_words)]
        a = masks.select(
            F.col(id_col).alias("id_a"),
            *[F.col(c).alias(f"a_{c}") for c in cols],
            F.col("set_size").alias("size_a"),
        )
        b = masks.select(
            F.col(id_col).alias("id_b"),
            *[F.col(c).alias(f"b_{c}") for c in cols],
            F.col("set_size").alias("size_b"),
        )
        inter = None
        for c in cols:
            term = F.bit_count(F.col(f"a_{c}").bitwiseAND(F.col(f"b_{c}")))
            inter = term if inter is None else inter + term
        row_bytes = 8 * n_words + BITMASK_ROW_BYTES_BASE
        jac = (
            candidate_pairs.join(_maybe_broadcast(a, n_docs, row_bytes), "id_a")
            .join(_maybe_broadcast(b, n_docs, row_bytes), "id_b")
            .withColumn("inter", inter.cast("long"))
        )
    else:
        tok_sets = docs.select(
            F.col(id_col),
            F.array_distinct(tokenize_ws(F.col(text_col))).alias("toks"),
        ).withColumn("set_size", F.size("toks"))
        a = tok_sets.select(
            F.col(id_col).alias("id_a"),
            F.col("toks").alias("toks_a"),
            F.col("set_size").alias("size_a"),
        )
        b = tok_sets.select(
            F.col(id_col).alias("id_b"),
            F.col("toks").alias("toks_b"),
            F.col("set_size").alias("size_b"),
        )
        jac = (
            candidate_pairs.join(
                _maybe_broadcast(a, n_docs, ARRAY_VERIFY_ROW_BYTES), "id_a"
            )
            .join(_maybe_broadcast(b, n_docs, ARRAY_VERIFY_ROW_BYTES), "id_b")
            .withColumn(
                "inter", F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b"))).cast("long")
            )
        )
    # computed_once: the threshold predicate reads the projected jaccard
    # (a pushed copy would re-run the W-word popcount chain per pair —
    # the verify stage IS the hot loop of the two heaviest bench queries)
    out = jac.select(
        "id_a",
        "id_b",
        computed_once(
            micro6(
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double")
            )
        ).alias("jaccard_micro"),
    )
    return out.filter(F.col("jaccard_micro") >= int(threshold * 1_000_000))


_live_sigs = None


def _release_sig_caches() -> None:
    """Release the previous call's signature cache(s). One call's caches
    are live at a time per session (the DataFrame analogue of dropping a
    materialized CTE)."""
    global _live_sigs
    if _live_sigs is not None:
        for df in _live_sigs if isinstance(_live_sigs, list) else [_live_sigs]:
            try:
                df.unpersist()
            except Exception:
                pass  # previous cache belonged to a stopped SparkSession
    _live_sigs = None


def minhash_neardup_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """F2: MinHash-LSH near-duplicate pairs, Jaccard-verified.

    shingle → minhash → band → bucket-join → exact verify. Deterministic
    (md5 hash family) and therefore oracle-checkable end-to-end.

    The signature DataFrame is persisted: the band self-join references it
    twice (both join sides) and recomputing the token explode +
    min-aggregation per reference costs ~10× the whole pipeline. (The
    cache is the DataFrame analogue of materializing a CTE.) Since r11
    the distinct (id, token) pair table is persisted too: the verify
    stage's bitmask build reads it instead of re-tokenizing the corpus
    (one fewer tokenize+distinct shuffle per call — guide §2.4). The
    previous call's caches are released on the next call — one call's
    caches are live at a time per session.
    """
    global _live_sigs
    _release_sig_caches()
    toks = _doc_tokens(docs, text_col, id_col).persist()
    sigs = toks.groupBy(id_col).agg(
        *[
            F.min(seeded_hash(F.col("token"), i)).alias(f"h{i}")
            for i in range(NUM_HASHES)
        ]
    ).persist()
    _live_sigs = [sigs, toks]
    cands = minhash_band_pairs(sigs, id_col)
    # No presentation orderBy: the result is a pair SET (the driver compare
    # is order-insensitive) and a global sort of a near-quadratic pair list
    # costs more than the whole pipeline (measured 14.4s → 5.9s at sf0.1).
    return jaccard_verify(cands, docs, text_col, id_col, toks=toks)


# Banding escalation ladder for minhash_neardup_pairs_auto: same 4-band
# layout, rows-per-band doubling 2 → 4 → 8 (collision probability for
# Jaccard j drops 1-(1-j^2)^4 → 1-(1-j^4)^4 → 1-(1-j^8)^4). Exact and
# near-exact duplicates (j → 1) collide at EVERY level; the recall cost
# lands on mid-Jaccard pairs (j=0.7: 96% → 49% → 14%) — the documented
# trade a boilerplate-heavy corpus forces, mirroring how SimHash's
# compound C(6,3) escalation narrows its radius guarantee (Manku §3).
MINHASH_ESCALATION_LEVELS = ((8, 4), (16, 4), (32, 4))
# Candidate-volume budget before escalating: the band join materializes
# Σ_buckets C(n,2) rows; past ~20× the corpus size the verify stage
# dominates end-to-end time (measured on the sf0.1 synthetic worst case:
# ~11M candidates for 122k docs ≈ 90×).
DEFAULT_MAX_CANDIDATES = 2_000_000
# Document-frequency prefilter rung (r10 verdict directive 3): BEFORE
# widening bands, the escalation ladder tries re-signing with tokens
# present in more than this fraction of documents REMOVED. Boilerplate
# tokens are why template-heavy corpora saturate the band join: a token
# in most documents pins the same min-hash onto all of them. Dropping
# it raises the filtered-set Jaccard of true near-dup pairs (their
# shared boilerplate contributed equally to both sides) while pushing
# unrelated template-siblings apart — so the rung prunes candidates
# WITHOUT the mid-Jaccard recall cliff band-widening costs (0.7-J
# banding collision stays ~0.95 at (8,4) instead of 49%/14% at 16/32
# hashes — stress_minhash_auto.py "boilerplate corpus" section).
# Documented trade: pairs whose similarity lives ONLY in boilerplate
# (identical templates, disjoint content — full-token Jaccard can still
# clear 0.5) stop being candidates BY DESIGN, the same call the
# RefinedWeb/DataComp-style curation pipelines make when they strip
# boilerplate before near-dup detection. The set of droppable tokens is
# bounded by construction: at most avg_doc_len/fraction tokens can have
# df > fraction·N (Σ df = N·avg_len), so the drop list always
# broadcasts.
MINHASH_DF_PREFILTER_FRACTION = 0.5
# Docs left with fewer surviving tokens than this after the DF drop
# keep their FULL sets — a doc that IS (almost) pure boilerplate can't
# be signed by its content, and signing only one side of a near-exact
# pair by content while the other falls back to its full set loses the
# pair entirely (r11 review). Pairs straddling the floor itself remain
# the residual boundary of the rung, named in the escalation warning.
MINHASH_DF_MIN_CONTENT_TOKENS = 4


def _wide_minhash_signatures(
    toks: DataFrame,
    id_col: str,
    num_hashes: int,
    drop_tokens: list[str] | None = None,
    min_content: int | None = None,
) -> DataFrame:
    """The ESCALATION-path signature table over a (id, token) pair
    table, hashed with JVM-native xxhash64(i, token) for EVERY column.
    Escalated bandings carry no oracle contract — any deterministic
    hash family gives the same banding probability curve — and xxhash
    is ~an order of magnitude cheaper than the expression-md5 family
    the oracle level pins, which dominated the escalated run's wall
    (17.3s -> 8.7s moving h{NUM_HASHES}.. to xxhash + sharing the token
    table in r10; r11 moves h0..h{NUM_HASHES-1} too — they had kept md5
    only so level-0 bands could be re-derived bit-identically from this
    table, a property nothing used).

    ``drop_tokens`` (r12, guide §1.2/§2.4): the DF-prefilter rung's
    bounded boilerplate drop list, FUSED into this aggregation. The r11
    rung materialized a filtered (id, token) table first — a content
    count groupBy, a fallback anti-join, two joins and a persist over
    the widest dedup intermediate — and then ran the signature pass
    over it: four traversals of the token table inside the ladder-probe
    job. Fused, ONE combinable groupBy computes per doc the min-hash
    over content tokens (``min(when(is_content, h))`` — min ignores the
    NULLs boilerplate rows produce), the min-hash over the full set,
    and the content-token count; the select picks the content minima
    when the count clears ``min_content`` and the full-set minima
    otherwise. Bit-identical to the filtered-table form: a kept doc's
    surviving rows are exactly its content rows, a fallback doc
    (content count < floor) keeps every row."""
    hashes = [F.xxhash64(F.lit(i), F.col("token")) for i in range(num_hashes)]
    if not drop_tokens:
        return toks.groupBy(id_col).agg(
            *[F.min(h).alias(f"h{i}") for i, h in enumerate(hashes)]
        )
    is_content = ~F.col("token").isin(list(drop_tokens))
    aggs = (
        [F.min(F.when(is_content, h)).alias(f"__c{i}") for i, h in enumerate(hashes)]
        + [F.min(h).alias(f"__f{i}") for i, h in enumerate(hashes)]
        + [F.sum(is_content.cast("int")).alias("__nc")]
    )
    keep = F.col("__nc") >= int(min_content or 0)
    return toks.groupBy(id_col).agg(*aggs).select(
        id_col,
        *[
            F.when(keep, F.col(f"__c{i}")).otherwise(F.col(f"__f{i}")).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )


def minhash_candidate_volume(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
) -> int:
    """How many candidate rows the band self-join would materialize:
    Σ over band buckets of C(n,2) — the probe minhash_neardup_pairs_auto
    runs BEFORE committing to a banding level. One combinable groupBy on
    the (doc × bands)-row key table; never touches documents or pairs."""
    return _volume_and_docs(signatures, id_col, num_hashes, bands)[0]


def _volume_and_docs(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
) -> tuple[int, int]:
    """(candidate volume, doc count) from ONE probe job (r11): every doc
    emits exactly ``bands`` band keys (concat_ws never nulls), so the doc
    count falls out of the same bucket-count aggregation as Σ C(n,2) —
    Σ n / bands — and the separate sigs.count() round-trip the escalation
    path paid is gone."""
    counts = band_keys(signatures, id_col, num_hashes, bands).groupBy(
        "band_key"
    ).agg(F.count("*").alias("n"))
    row = counts.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("v"),
        F.sum("n").cast("long").alias("t"),
    ).collect()[0]
    return int(row["v"] or 0), int((row["t"] or 0) // bands)


def _ladder_volumes(
    signatures: DataFrame,
    id_col: str,
    levels: list[tuple[int, int]],
) -> list[int]:
    """Candidate volumes for SEVERAL banding levels in one job: every
    level's band keys emit from one tagged generate pass
    (:func:`_band_keys_levels`) and aggregate together (Σ C(n,2) per
    level). On escalated corpora the ladder's sequential probes were
    driver-blocking round trips over a tiny cached signature table —
    job count, not data volume, was their cost (2.6s of the sf0.1 bench
    row for probes whose aggregation input is ~20k rows); the r11
    explode form additionally collapses the probe's levels×bands-way
    union (384 tiny map tasks) into one map pass. Levels must be
    distinct (nh, nb) pairs — every caller passes a strict widening
    ladder."""
    rows = (
        _band_keys_levels(signatures, id_col, list(levels))
        .groupBy("__nh", "__nb", "band_key")
        .agg(F.count("*").alias("n"))
        .groupBy("__nh", "__nb")
        .agg(
            F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("v")
        )
        .collect()
    )
    vols = {(int(r["__nh"]), int(r["__nb"])): int(r["v"] or 0) for r in rows}
    return [vols.get((nh, nb), 0) for nh, nb in levels]


def minhash_neardup_pairs_auto(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_candidates: int = DEFAULT_MAX_CANDIDATES,
    stats: dict | None = None,
) -> DataFrame:
    """F2 with CANDIDATE-VOLUME-ADAPTIVE banding — the production form
    of :func:`minhash_neardup_pairs` for corpora where fixed (8 hashes,
    4 bands) banding goes near-quadratic (boilerplate-heavy crawls,
    template farms: many docs sharing band keys without being 0.5-dups).

    One signature pass computes the WIDEST level's hashes (h0..h31, so
    escalation re-bands persisted columns instead of re-scanning the
    corpus), then a candidate-volume probe (Σ C(n,2) over band buckets —
    the exact row count the band join would materialize) walks the
    escalation ladder until the volume fits ``max_candidates`` or the
    ladder ends. Below the budget at the first level the result is
    BIT-IDENTICAL to minhash_neardup_pairs — the oracle contract
    (queries.py::q_dedup_minhash_auto carries the same FULL DuckDB
    oracle at the driver's sf, which never escalates there). Escalation
    is NOT silent: a UserWarning reports the chosen level and volumes,
    and ``stats`` (optional dict) returns {level, num_hashes, bands,
    volumes, df_dropped_tokens} for pipelines that log metrics.

    Ladder (r11 — the DF prefilter rung lands between the oracle level
    and band-widening, r10 verdict directive 3):

      0. (8, 4) over the full token sets — the oracle level.
      1. (8, 4) over token sets MINUS tokens present in more than
         MINHASH_DF_PREFILTER_FRACTION of docs (skipped when nothing
         exceeds the cutoff — e.g. flat-DF corpora). Same banding
         probability curve as level 0, so mid-Jaccard recall is KEPT;
         what it spends is boilerplate-only similarity (module constant
         doc). Boilerplate-dominated docs (fewer than
         MINHASH_DF_MIN_CONTENT_TOKENS surviving tokens) keep their
         full sets, so near-exact pairs on either side of the
         all-boilerplate boundary fall back TOGETHER.
      2+ (16, 4) then (32, 4) band-widening over the level-1 token
         sets — the last resort that does trade mid-Jaccard recall
         (0.7-J collision 96% → 49% → 14%).

    Scale shape: probes are key-table aggregations (docs × 4 rows), the
    DF drop list is bounded by avg_doc_len/fraction (always broadcasts),
    the verify join runs once at the chosen level; nothing quadratic
    ever materializes beyond the accepted budget."""
    import warnings

    global _live_sigs
    _release_sig_caches()
    # two-tier signature computation: the FIRST level's 8 hashes cost
    # the same corpus pass as the fixed operator, so the common
    # below-budget case pays only one cheap key-table probe on top;
    # only an actual escalation pays the DF analysis and the second
    # (widest) signature pass — always hashing 32 made the
    # no-escalation case ~2x slower for nothing (measured in
    # tools/stress_minhash_auto.py while building this). Escalated
    # levels re-band PREFIXES of the 32-hash table (h0..h15 for 16), so
    # one widening covers the whole ladder.
    first_nh, first_nb = MINHASH_ESCALATION_LEVELS[0]
    widest = MINHASH_ESCALATION_LEVELS[-1][0]
    # the (id, token) pair table feeds BOTH signature passes when an
    # escalation widens AND (since r11) the verify stage's bitmask build,
    # so it stays persisted until the NEXT dedup call releases it with
    # the signature cache — the r10 one-call-scoped release predated the
    # verify reuse (back then verify re-tokenized the raw docs, so the
    # cache had no reader after signing; now it has two).
    toks = _doc_tokens(docs, text_col, id_col).persist()
    sigs8 = None
    df_dropped = 0
    try:
        aggs8 = [
            F.min(seeded_hash(F.col("token"), i)).alias(f"h{i}")
            for i in range(first_nh)
        ]
        sigs = toks.groupBy(id_col).agg(*aggs8).persist()
        _live_sigs = [sigs, toks]
        # ONE probe job returns the level-0 volume AND the doc count
        # (r11 — the count used to be a second round-trip on the cache)
        vol0, n_docs = _volume_and_docs(sigs, id_col, first_nh, first_nb)
        volumes: list[int] = [vol0]
        chosen = (first_nh, first_nb)
        if volumes[0] > max_candidates:
            # RUNG 1 — DF prefilter: re-sign with boilerplate tokens
            # (df > fraction·N) removed. The drop list is bounded by
            # construction (at most avg_doc_len/fraction tokens — module
            # constant doc), so it is COLLECTED in one job (r11; was a
            # persisted DF paying count + two broadcast rebuilds) and
            # re-enters the plan as a local-relation broadcast side.
            high_tokens = [
                r["token"]
                for r in toks.groupBy("token")
                .agg(F.count("*").alias("df"))
                .filter(
                    F.col("df")
                    > int(MINHASH_DF_PREFILTER_FRACTION * n_docs)
                )
                .select("token")
                .collect()
            ]
            df_dropped = len(high_tokens)
            # full-set fallback for BOILERPLATE-DOMINATED docs: any doc
            # left with fewer than MINHASH_DF_MIN_CONTENT_TOKENS
            # surviving tokens keeps its FULL set. A bare empty-set
            # fallback (r11 first cut) was asymmetric at the boundary —
            # an all-boilerplate doc kept 15 tokens while its near-exact
            # dup with ONE content token kept just that token, so the
            # 0.94-Jaccard pair shared no signature tokens and was
            # silently lost (r11 review). The floor makes both sides of
            # such pairs fall back together; pairs straddling the floor
            # itself (k-1 vs k content tokens) remain the residual
            # boundary, stated in the escalation warning rather than
            # papered over.
            #
            # r12 (guide §1.2/§2.4): the drop list + fallback floor are
            # FUSED into the wide signature aggregation itself
            # (_wide_minhash_signatures(drop_tokens=..., min_content=...))
            # — ONE combinable groupBy over the cached token table
            # replaces the r11 filtered-table build (content-count
            # groupBy + fallback anti-join + two joins + persist) that
            # ran inside the ladder-probe job. Values are bit-identical
            # per the helper's docstring, so every ladder level, the
            # stats dict and the recall tests are unchanged.
            wide = _wide_minhash_signatures(
                toks,
                id_col,
                num_hashes=widest,
                drop_tokens=high_tokens if df_dropped else None,
                min_content=MINHASH_DF_MIN_CONTENT_TOKENS,
            ).persist()
            # the 8-hash table has no reader past this point; it is
            # released in the finally
            sigs8 = sigs
            sigs = wide
            _live_sigs = [sigs, toks]
            # the post-0 ladder: the DF rung keeps level-0 banding (its
            # probe only differs when the filter dropped something),
            # then band-widening as the last resort
            ladder = ([(first_nh, first_nb)] if df_dropped else []) + list(
                MINHASH_ESCALATION_LEVELS[1:]
            )
            ladder_vols = _ladder_volumes(sigs, id_col, ladder)
            chosen = ladder[-1]
            for (nh, nb), vol in zip(ladder, ladder_vols):
                volumes.append(vol)
                if vol <= max_candidates:
                    chosen = (nh, nb)
                    break
            else:
                warnings.warn(
                    "minhash_neardup_pairs_auto: candidate volume "
                    f"{volumes[-1]} still exceeds max_candidates="
                    f"{max_candidates} at the widest banding level "
                    f"{chosen} — the corpus is near-dup-saturated (the "
                    "pair OUTPUT itself is that large); consider "
                    "line_dedup/exact_dedup first",
                    UserWarning,
                    stacklevel=2,
                )
    finally:
        # the probes above materialized the chosen signature table; the
        # escalation-only caches have no further reader. ``toks`` is NOT
        # released here (r11): the verify stage's bitmask build reads it,
        # so it lives with the signature cache until the next call.
        if sigs8 is not None and sigs8 is not sigs:
            sigs8.unpersist()
    level = len(volumes) - 1
    if level > 0:
        df_note = (
            f"DF prefilter dropped {df_dropped} boilerplate tokens "
            f"(df > {MINHASH_DF_PREFILTER_FRACTION:.0%} of docs); "
            if df_dropped
            else "DF prefilter found nothing above the cutoff; "
        )
        recall_note = (
            "banding stayed (8, 4) — mid-Jaccard recall preserved, "
            "boilerplate-only similarity dropped by design"
            if chosen == (first_nh, first_nb)
            else "bands WIDENED — mid-Jaccard recall narrows "
            "(module constant doc)"
        )
        warnings.warn(
            f"minhash_neardup_pairs_auto: escalated to "
            f"{chosen[0]} hashes × {chosen[1]} bands (level {level}): "
            f"volumes per level {volumes} vs budget {max_candidates}. "
            f"{df_note}{recall_note}. Exact duplicates are unaffected "
            "at every level; near-exact pairs survive the DF rung too "
            "(boilerplate-dominated docs fall back to full sets "
            "together) except pairs straddling the "
            f"{MINHASH_DF_MIN_CONTENT_TOKENS}-content-token fallback "
            "floor itself",
            UserWarning,
            stacklevel=2,
        )
    if stats is not None:
        stats.update(
            level=level,
            num_hashes=chosen[0],
            bands=chosen[1],
            volumes=list(volumes),
            max_candidates=max_candidates,
            df_dropped_tokens=df_dropped,
            # since r11 the doc count falls out of the level-0 probe job
            # (_volume_and_docs), so it is populated at every level
            n_docs=n_docs,
        )
    cands = minhash_band_pairs(sigs, id_col, num_hashes=chosen[0], bands=chosen[1])
    return jaccard_verify(cands, docs, text_col, id_col, toks=toks, n_docs=n_docs)


def incremental_dedup(
    incoming: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = JACCARD_THRESHOLD,
    corpus_sigs: DataFrame | None = None,
    corpus_tokens: DataFrame | None = None,
    n_corpus: int | None = None,
    corpus_vocab: list | None = None,
) -> DataFrame:
    """Dedupe an INCOMING batch against an EXISTING corpus — the shape
    every production ingestion pipeline actually runs: new shards arrive
    continuously and must be near-dup-checked against what is already
    ingested, never re-deduping the whole corpus.

    MinHash band keys are computed per side and joined CROSS-side only
    (incoming × corpus band collisions — incoming-internal and
    corpus-internal pairs never materialize). Candidates are
    Jaccard-verified exactly; the verdict is per incoming doc.

    Output: (id_col, n_matches BIGINT, max_jaccard_micro BIGINT nullable,
    is_dup BOOLEAN) — one row per incoming doc; ``n_matches`` counts
    verified corpus near-dups, ``max_jaccard_micro`` is NULL when none.

    Scale shape: at 100 TB the corpus side of this plan (signatures +
    band keys) is a PERSISTED index maintained at ingest — pass it as
    ``corpus_sigs`` (the minhash_signatures output) and each batch costs
    one signature pass over the batch plus a band-key join whose corpus
    side is read pre-bucketed by band_key; nothing is quadratic in
    corpus size — though the CANDIDATE count is still data-dependent:
    :func:`incremental_dedup_auto` is this operator with a cross-side
    volume probe and band-widening against a wide index, for corpora
    where fixed banding saturates. Ids MUST be disjoint across the two inputs — the
    verification stage unions the two doc sets, so an id on both sides
    would fan its joins out and silently inflate ``n_matches``. Collisions
    fail fast with an EAGER broadcast-semi probe at call time (this
    function runs a Spark job before returning, like the other
    driver-looped operators here): against the in-memory index when
    ``corpus_sigs`` is supplied, else against the column-pruned corpus id
    scan — never the signature computation.

    Deterministic (portable md5 hash family) → FULL DuckDB oracle
    (queries.py::q_incremental_dedup).
    """
    n_incoming = _check_disjoint_ids(
        incoming,
        corpus_sigs if corpus_sigs is not None else corpus,
        id_col,
        count_incoming=True,
    )
    global _live_sigs
    _release_sig_caches()
    inc_sigs = minhash_signatures(incoming, text_col, id_col).persist()
    if corpus_sigs is None:
        # self-building (contrast) shape: tokenize the corpus ONCE and
        # share the pair table between the signature pass and the verify
        # stage (r11 — verify used to re-tokenize the corpus)
        if corpus_tokens is None:
            corpus_tokens = _doc_tokens(corpus, text_col, id_col).persist()
            corp_sigs = minhash_signatures(
                corpus, text_col, id_col, toks=corpus_tokens
            ).persist()
            _live_sigs = [inc_sigs, corp_sigs, corpus_tokens]
        else:
            corp_sigs = minhash_signatures(
                corpus, text_col, id_col, toks=corpus_tokens
            ).persist()
            _live_sigs = [inc_sigs, corp_sigs]
    else:
        corp_sigs = corpus_sigs  # caller-managed persistence (their index)
        _live_sigs = [inc_sigs]
    # broadcast the INCOMING band side (bounded by the arriving batch, ×
    # BANDS rows) so the band join never shuffles the corpus index — with a
    # persisted corpus_sigs the per-batch cost is then ONE linear scan of
    # the index, no corpus-side exchange (measured 21.7s → ~7s per batch at
    # a 1M-doc corpus, STRESS.md). Guarded by the same ≤5M-docs cap as the
    # verify stage: a giant backfill "batch" falls back to a shuffle join
    # rather than OOMing the executors on a forced broadcast. n_incoming
    # rode the disjointness probe's job (r12) — no second scan.
    inc_bands = band_keys(inc_sigs, id_col).withColumnRenamed("bid", "id_b")
    cands = (
        band_keys(corp_sigs, id_col)
        .withColumnRenamed("bid", "id_a")
        .join(_maybe_broadcast(inc_bands, n_incoming, 40), "band_key")
        .select("id_a", "id_b")
        .distinct()
    )
    # NEGATIVE RESULT (round 6, measured then reverted): semi-joining the
    # corpus down to candidate id_a's before jaccard_verify — so the
    # token-set build tracks candidates instead of the corpus — made the
    # 1M-corpus batch 3x SLOWER (18.6s → 57.7s): the persist+count to size
    # the broadcast forces an eager band-join materialization, and the
    # verify map build re-executes the semi-join lineage per reference.
    # The corpus-wide token pass is cheap (one scan, map-side) next to
    # that; don't re-add the "optimization" without re-measuring
    # tools/stress_incremental.py.
    return _incremental_verdict(
        cands, incoming, corpus, text_col, id_col, threshold,
        corpus_tokens=corpus_tokens, n_corpus=n_corpus,
        n_incoming=n_incoming, corpus_vocab=corpus_vocab,
    )


def _check_disjoint_ids(
    incoming: DataFrame,
    probe_side: DataFrame,
    id_col: str,
    count_incoming: bool = False,
) -> int | None:
    """Ids MUST be disjoint across the two incremental-dedup inputs —
    the verification stage unions the two doc sets, so an id on both
    sides would fan its joins out and silently inflate n_matches.
    EAGER broadcast-semi probe (one Spark job at call time), against the
    in-memory index when one is supplied (never the signature compute).

    ``count_incoming`` (r12, guide §1.2): the callers' very next eager
    round-trip was ``incoming.count()`` for the band-side broadcast
    gate — a second driver job over the same scan. Folded here as a
    sibling aggregate branch of the SAME action (still no signature
    computation on the error path), so the per-batch call pays one
    probe job instead of two; returns the count, else None."""
    overlap_branch = (
        probe_side.select(id_col)
        .join(F.broadcast(incoming.select(id_col)), id_col, "semi")
        .limit(1)
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
        .select(F.lit(0).alias("__b"), "v")
    )
    if count_incoming:
        probe = overlap_branch.unionByName(
            incoming.agg(F.count(F.lit(1)).cast("long").alias("v")).select(
                F.lit(1).alias("__b"), "v"
            )
        )
    else:
        probe = overlap_branch
    got = {int(r["__b"]): int(r["v"]) for r in probe.collect()}
    if got[0]:
        raise ValueError(
            "incremental_dedup requires disjoint ids: some incoming "
            f"{id_col} values already exist in the corpus"
        )
    return got.get(1)


def _incremental_verdict(
    cands: DataFrame,
    incoming: DataFrame,
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    corpus_tokens: DataFrame | None = None,
    n_corpus: int | None = None,
    n_incoming: int | None = None,
    corpus_vocab: list | None = None,
) -> DataFrame:
    """Shared tail of the incremental-dedup operators: exact-verify the
    cross-side candidates against the union of both texts, then fold to
    the per-incoming verdict contract (id, n_matches, max_jaccard_micro,
    is_dup).

    r11: ``corpus_tokens`` is the at-rest index's persisted distinct
    (id, token) table — the docstring of :func:`incremental_dedup_auto`
    says the whole point of the index is never re-reading corpus text
    per batch, yet the verify stage used to re-tokenize the corpus for
    its vocabulary decision and bitmask build on every call. With the
    table supplied (ids are disjoint by contract, so per-side distinct
    pair tables union to the union's distinct pair table) only the
    BATCH is tokenized per call; ``n_corpus``+``n_incoming`` likewise
    replace the union's count job for the verify broadcast gate.

    r12 (guide §1.2): ``corpus_vocab`` is the at-rest COMPLETE corpus
    vocabulary, collected once at index build under the same
    MAX_BITMASK_VOCAB+1 cap the verify probe uses (so it is bounded:
    at most cap+1 strings). With it the per-batch representation
    decision probes only the BATCH's distinct tokens — the r11 path
    still re-aggregated the corpus-scale union token table to one
    driver row every call. Union vocabulary = corpus vocabulary ∪ batch
    vocabulary (ids are disjoint, tokens need not be), and a truncated
    probe on either side proves the union exceeds the cap — the same
    decision, same dense-id assignment, from a batch-sized job (or no
    job at all when the corpus alone exceeds the cap)."""
    both = incoming.select(id_col, text_col).unionByName(
        corpus.select(id_col, text_col)
    )
    both_toks = None
    n_docs = None
    vocab_tokens = None
    if corpus_tokens is not None:
        inc_toks = _doc_tokens(incoming, text_col, id_col)
        both_toks = inc_toks.unionByName(corpus_tokens.select(id_col, "token"))
        if n_corpus is not None and n_incoming is not None:
            n_docs = n_corpus + n_incoming
        if corpus_vocab is not None:
            if len(corpus_vocab) > MAX_BITMASK_VOCAB:
                vocab_tokens = _VOCAB_OVER_CAP
            else:
                batch_rows = (
                    inc_toks.select("token")
                    .distinct()
                    .limit(MAX_BITMASK_VOCAB + 1)
                    .collect()
                )
                union_vocab = set(corpus_vocab)
                union_vocab.update(r["token"] for r in batch_rows)
                vocab_tokens = (
                    _VOCAB_OVER_CAP
                    if len(batch_rows) > MAX_BITMASK_VOCAB
                    or len(union_vocab) > MAX_BITMASK_VOCAB
                    else union_vocab
                )
    verified = jaccard_verify(
        cands,
        both,
        text_col,
        id_col,
        threshold,
        toks=both_toks,
        n_docs=n_docs,
        vocab_tokens=vocab_tokens,
    )
    hits = verified.groupBy("id_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.max("jaccard_micro").alias("max_jaccard_micro"),
    )
    return (
        incoming.select(id_col)
        .join(hits, F.col(id_col) == F.col("id_b"), "left")
        .select(
            id_col,
            F.coalesce(F.col("n_matches"), F.lit(0)).cast("long").alias("n_matches"),
            "max_jaccard_micro",
            F.col("n_matches").isNotNull().alias("is_dup"),
        )
        .orderBy(id_col)
    )


# Width of the at-rest signature index the ESCALATING incremental path
# consumes = the ladder's widest level. h0..h{NUM_HASHES-1} stay the
# portable md5 family — level-0 banding against this index is
# bit-identical to the fixed incremental plan (and the DuckDB oracle
# family); h{NUM_HASHES}.. are JVM-native xxhash64, escalation-only
# columns with no portability contract. 32 longs + id ≈ 0.3 KB/doc:
# ~30 GB at 100M docs, a rounding error next to the corpus it indexes.
INDEX_NUM_HASHES = MINHASH_ESCALATION_LEVELS[-1][0]


def minhash_index_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
) -> DataFrame:
    """The WIDE (h0..h{INDEX_NUM_HASHES-1}) signature table a production
    pipeline persists at ingest so that :func:`incremental_dedup_auto`
    can WIDEN banding against a saturated corpus without ever re-reading
    corpus text — the corpus prerequisite for escalation the full-corpus
    ladder gets by re-scanning. One tokenize + one groupBy, same shape
    as minhash_signatures with 4x the min-aggregates; ``toks`` (r11)
    optionally supplies a caller-persisted pair table."""
    if toks is None:
        toks = _doc_tokens(docs, text_col, id_col)
    aggs = [
        F.min(seeded_hash(F.col("token"), i)).alias(f"h{i}")
        for i in range(NUM_HASHES)
    ] + [
        F.min(F.xxhash64(F.lit(i), F.col("token"))).alias(f"h{i}")
        for i in range(NUM_HASHES, INDEX_NUM_HASHES)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def minhash_index_band_counts(
    index_sigs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(__nh, __nb, band_key, n) counts for every ladder level the index
    is wide enough to band — the probe-side companion a production
    pipeline persists WITH the index (both refresh on ingest). Per batch
    the cross-side volume probe then joins the arriving batch's tiny
    count table against THIS table instead of re-aggregating the full
    index — probing costs a scan of a counts table (~the corpus's
    distinct band keys, narrow rows) instead of two extra index scans,
    which the saturated-corpus stress measured as the dominant auto
    overhead. Sort/bucket it by band_key at rest and the scan prunes
    down to the batch's keys.

    The table is APPEND-MAINTAINABLE: counts are additive and the
    probe's Σ n×m distributes over duplicate key rows ((Σ nᵢ)×m =
    Σ nᵢ×m), so an ingest loop appends each admitted batch's OWN band
    counts (this function over the batch's signature rows) next to the
    existing files — no re-aggregation per batch, and the
    level-coverage check still holds (any carried level has rows).
    Compact the duplicate keys opportunistically if the scan size ever
    matters (tests/test_streaming.py runs the full loop)."""
    levels = [
        (nh, nb)
        for nh, nb in MINHASH_ESCALATION_LEVELS
        if all(f"h{i}" in index_sigs.columns for i in range(nh))
    ]
    if not levels:
        raise ValueError(
            "minhash_index_band_counts: index carries no h0.."
            f"h{MINHASH_ESCALATION_LEVELS[0][0] - 1} signature columns "
            f"(got {index_sigs.columns})"
        )
    return _band_keys_levels(index_sigs, id_col, levels).groupBy(
        "__nh", "__nb", "band_key"
    ).agg(F.count("*").alias("n"))


def _cross_volumes(
    corp_sigs: DataFrame,
    inc_sigs: DataFrame,
    id_col: str,
    levels: list[tuple[int, int]],
    corp_counts: DataFrame | None = None,
) -> list[int]:
    """CROSS-side candidate volumes (what the corpus×incoming band join
    materializes before distinct: Σ over shared band keys of
    n_corpus × n_incoming) for several banding levels in one job. Both
    sides reduce to (num_hashes-tagged band_key, count) tables first, so
    the probe is linear in each side and never touches pairs; pass
    ``corp_counts`` (:func:`minhash_index_band_counts`, persisted WITH
    the index) and the corpus side costs a counts-table scan instead of
    re-aggregating the full index per batch. On the counts path a level
    the companion does not carry returns **None** (the LEFT join yields
    a row for every carried level even with zero shared keys), so
    callers can tell a stale companion from a true zero volume; the
    index-aggregation path always returns ints."""

    def keyed(sigs: DataFrame) -> DataFrame:
        return _band_keys_levels(sigs, id_col, levels).groupBy(
            "__nh", "__nb", "band_key"
        ).agg(F.count("*").alias("n"))

    # no broadcast hint on the incoming side: a normal batch's count
    # table is tiny (AQE broadcasts it at runtime), but a giant backfill
    # "batch" must be allowed to shuffle rather than OOM on a forced hint
    inc_keyed = keyed(inc_sigs).withColumnRenamed("n", "m")
    if corp_counts is not None:
        # LEFT join so every level the companion CARRIES yields a row
        # even with zero shared keys — distinguishing a true-zero volume
        # from a level the table never had (a stale companion built from
        # an older, narrower index must not read as "0 candidates, pick
        # me"); absent levels return None and the caller refuses them
        wanted = F.struct(F.col("__nh"), F.col("__nb")).isin(
            [F.struct(F.lit(nh), F.lit(nb)) for nh, nb in levels]
        )
        rows = (
            corp_counts.filter(wanted)
            .join(inc_keyed, ["__nh", "__nb", "band_key"], "left")
            .groupBy("__nh", "__nb")
            .agg(
                F.sum(F.col("n") * F.coalesce(F.col("m"), F.lit(0)))
                .cast("long")
                .alias("v")
            )
            .collect()
        )
        vols = {
            (int(r["__nh"]), int(r["__nb"])): int(r["v"] or 0) for r in rows
        }
        return [vols.get(lv) for lv in levels]
    rows = (
        keyed(corp_sigs)
        .join(inc_keyed, ["__nh", "__nb", "band_key"])
        .groupBy("__nh", "__nb")
        .agg(F.sum(F.col("n") * F.col("m")).cast("long").alias("v"))
        .collect()
    )
    vols = {(int(r["__nh"]), int(r["__nb"])): int(r["v"] or 0) for r in rows}
    return [vols.get(lv, 0) for lv in levels]


def incremental_dedup_auto(
    incoming: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = JACCARD_THRESHOLD,
    corpus_index: DataFrame | None = None,
    corpus_band_counts: DataFrame | None = None,
    corpus_tokens: DataFrame | None = None,
    n_corpus: int | None = None,
    corpus_vocab: list | None = None,
    max_candidates: int = DEFAULT_MAX_CANDIDATES,
    stats: dict | None = None,
) -> DataFrame:
    """:func:`incremental_dedup` with the CANDIDATE-VOLUME BOUND of
    :func:`minhash_neardup_pairs_auto` — the batch-vs-corpus production
    form for corpora where fixed (8, 4) cross-side banding explodes
    (boilerplate-saturated collections: most corpus docs sharing band
    keys with every arriving batch).

    A cross-side volume probe (Σ over shared band keys of
    n_corpus × n_incoming — the exact row count the band join would
    materialize, computed from per-side count tables, linear in each
    side) checks level 0 first; under ``max_candidates`` the plan and
    result are BIT-IDENTICAL to incremental_dedup — same md5 band keys,
    same join, same verify — so the same FULL oracle applies. Over
    budget, one more probe job walks the band-WIDENING levels
    ((16, 4) then (32, 4)) against the wide columns of the index.

    There is NO DF-prefilter rung here by design: re-signing without
    boilerplate tokens needs both sides' token sets, and the whole point
    of the at-rest index is never re-reading corpus text per batch. A
    boilerplate-saturated corpus is better re-indexed once (build the
    index from DF-filtered text at ingest) than re-signed per batch; the
    escalation warning says so. Widening's mid-Jaccard recall trade is
    the module-constant doc's (0.7-J collision 96% → 49% → 14%).

    ``corpus_index`` is the persisted :func:`minhash_index_signatures`
    table (caller-managed persistence — their index). A NARROW legacy
    index (h0..h{NUM_HASHES-1} only, the minhash_signatures shape) still
    works but cannot widen: over-budget volume then proceeds at level 0
    with a warning naming the rebuild. When ``corpus_index`` is omitted
    the index is built from ``corpus`` text for this call (the contrast
    shape, like incremental_dedup without ``corpus_sigs``).
    ``corpus_band_counts`` (:func:`minhash_index_band_counts`, persisted
    alongside the index and refreshed with it) replaces the probes'
    corpus-side aggregation with a counts-table scan — without it each
    probe job re-aggregates the full index, which the saturated-corpus
    stress measured as the dominant auto overhead per batch.
    ``corpus_tokens`` (r11) is the index's persisted distinct
    (id, token) table and ``n_corpus`` its doc count — with them the
    verify stage stops re-tokenizing and re-counting the corpus per
    batch (see :func:`_incremental_verdict`), completing the
    never-re-read-corpus-text property the index exists for.

    Output contract, id-disjointness requirement, and the eager
    disjointness probe are incremental_dedup's."""
    import warnings

    n_incoming = _check_disjoint_ids(
        incoming,
        corpus_index if corpus_index is not None else corpus,
        id_col,
        count_incoming=True,
    )
    global _live_sigs
    _release_sig_caches()
    inc_sigs = minhash_index_signatures(incoming, text_col, id_col).persist()
    if corpus_index is None:
        # self-building (contrast) shape: one corpus tokenize shared by
        # the index pass and the verify stage (r11)
        if corpus_tokens is None:
            corpus_tokens = _doc_tokens(corpus, text_col, id_col).persist()
            corp_sigs = minhash_index_signatures(
                corpus, text_col, id_col, toks=corpus_tokens
            ).persist()
            _live_sigs = [inc_sigs, corp_sigs, corpus_tokens]
        else:
            corp_sigs = minhash_index_signatures(
                corpus, text_col, id_col, toks=corpus_tokens
            ).persist()
            _live_sigs = [inc_sigs, corp_sigs]
    else:
        corp_sigs = corpus_index  # caller-managed persistence (their index)
        _live_sigs = [inc_sigs]
    first = MINHASH_ESCALATION_LEVELS[0]
    # which ladder levels the index is wide enough to band
    widenable = [
        (nh, nb)
        for nh, nb in MINHASH_ESCALATION_LEVELS[1:]
        if all(f"h{i}" in corp_sigs.columns for i in range(nh))
    ]
    if corpus_band_counts is not None:
        # with the companion, EVERY level is probed in the same single
        # job (the index-aggregation cost the level-0-first split
        # avoided is gone — probing is one counts-table scan). The LEFT
        # join inside _cross_volumes makes coverage validation free: a
        # level the companion never carried comes back None — a STALE
        # companion (built from an older, narrower index) must not read
        # as "0 candidates, pick me" and have the band join materialize
        # the real volume unbounded. Level 0 absent = malformed table.
        probe_levels = [first] + widenable
        probed = _cross_volumes(
            corp_sigs, inc_sigs, id_col, probe_levels, corpus_band_counts
        )
        if probed[0] is None:
            raise ValueError(
                "incremental_dedup_auto: corpus_band_counts lacks the "
                f"level-0 banding {first} — not a "
                "minhash_index_band_counts table for this ladder"
            )
        lvl_vols = dict(zip(probe_levels, probed))
        widenable = [lv for lv in widenable if lvl_vols[lv] is not None]
        volumes = [lvl_vols[first]]
    else:
        # no companion: level 0 probed alone so the common under-budget
        # batch re-aggregates the index for ONE level's keys, not three
        volumes = _cross_volumes(corp_sigs, inc_sigs, id_col, [first])
    chosen = first
    if volumes[0] > max_candidates:
        if widenable:
            wider = (
                [lvl_vols[lv] for lv in widenable]
                if corpus_band_counts is not None
                else _cross_volumes(corp_sigs, inc_sigs, id_col, widenable)
            )
            chosen = widenable[-1]
            for (nh, nb), vol in zip(widenable, wider):
                volumes.append(vol)
                if vol <= max_candidates:
                    chosen = (nh, nb)
                    break
            else:
                warnings.warn(
                    "incremental_dedup_auto: candidate volume "
                    f"{volumes[-1]} still exceeds max_candidates="
                    f"{max_candidates} at the widest banding level "
                    f"{chosen} — the batch is near-dup-saturated "
                    "against this corpus; exact/line dedup first, or "
                    "re-index from boilerplate-filtered text",
                    UserWarning,
                    stacklevel=2,
                )
            if chosen != first:
                warnings.warn(
                    "incremental_dedup_auto: escalated to "
                    f"{chosen[0]} hashes × {chosen[1]} bands: volumes "
                    f"per level {volumes} vs budget {max_candidates}. "
                    "Bands WIDENED — mid-Jaccard recall narrows "
                    "(module constant doc); exact/near-exact incoming "
                    "dups are unaffected. No DF rung exists on this "
                    "path (the at-rest index never re-reads corpus "
                    "text) — a boilerplate-saturated corpus is better "
                    "re-indexed from DF-filtered text at ingest",
                    UserWarning,
                    stacklevel=2,
                )
        else:
            warnings.warn(
                "incremental_dedup_auto: candidate volume "
                f"{volumes[0]} exceeds max_candidates={max_candidates} "
                "but no widened banding level is available — the "
                "corpus_index is narrow (h0.."
                f"h{NUM_HASHES - 1} only) or the band-count companion "
                "predates the wide index; proceeding at (8, 4). "
                "Rebuild with minhash_index_signatures (+ "
                "minhash_index_band_counts) to enable escalation",
                UserWarning,
                stacklevel=2,
            )
    # batch size for the broadcast gate: n_incoming rode the
    # disjointness probe's job (r12) — counting ALL incoming rows, the
    # same stats meaning as incremental_dedup (the r11 cached-signature
    # count reported only token-bearing docs, a silent inconsistency
    # between the two operators; both values only gate broadcasts, and
    # the row count is the conservative one).
    inc_bands = band_keys(inc_sigs, id_col, *chosen).withColumnRenamed(
        "bid", "id_b"
    )
    cands = (
        band_keys(corp_sigs, id_col, *chosen)
        .withColumnRenamed("bid", "id_a")
        .join(_maybe_broadcast(inc_bands, n_incoming, 40), "band_key")
        .select("id_a", "id_b")
        .distinct()
    )
    if stats is not None:
        stats.update(
            level=len(volumes) - 1 if chosen != first else 0,
            num_hashes=chosen[0],
            bands=chosen[1],
            volumes=list(volumes),
            max_candidates=max_candidates,
            n_incoming=n_incoming,
        )
    return _incremental_verdict(
        cands, incoming, corpus, text_col, id_col, threshold,
        corpus_tokens=corpus_tokens, n_corpus=n_corpus,
        n_incoming=n_incoming, corpus_vocab=corpus_vocab,
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash fingerprint: bit j set iff sum over distinct tokens of
    (+1 if bit j of token hash set else -1) > 0.

    Output: (id_col, simhash BIGINT). Hamming-close fingerprints ≈ near-dups.
    Explodes tokens once; ``bits`` conditional-sum aggregates — map-side
    combinable, one shuffle.

    Bit sourcing: the portable hash yields 60 usable bits, so bit j reads
    bit ``j % 32`` of seeded hash ``999 + j // 32`` — up to 64 independent
    bits from two hash evaluations per token. Bit 63 contributes the
    two's-complement term -(2**63) so the fingerprint packs into a signed
    BIGINT identically in Spark and DuckDB (xor/bit_count both operate on
    the two's-complement value in both engines).
    """
    if bits > 64:
        raise ValueError(f"simhash supports at most 64 bits, got {bits}")
    toks = _doc_tokens(docs, text_col, id_col)
    for w in range((bits + 31) // 32):
        toks = toks.withColumn(f"th{w}", seeded_hash(F.col("token"), 999 + w))
    aggs = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"th{j // 32}"), j % 32).bitwiseAND(F.lit(1)) == 1,
                1,
            ).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    sim = None
    for j in range(bits):
        weight = -(1 << 63) if j == 63 else (1 << j)
        term = F.when(F.col(f"b{j}") > 0, F.lit(weight)).otherwise(F.lit(0)).cast("long")
        sim = term if sim is None else sim + term
    return sums.select(id_col, sim.alias("simhash"))


SIMHASH_BANDS = 4            # 64/4 → 16-bit band keys; lossless for k ≤ 3
SIMHASH_COMPOUND_BLOCKS = 6  # Manku §3 escalation: C(6,3) = 20 tables


def simhash_band_key_array(sim: Column, compound: bool = False) -> Column:
    """ARRAY of band keys for one fingerprint column — the banding scheme
    of :func:`simhash_band_pairs`, exposed so probes can count band-group
    collisions without materializing the pair join. Default: 4 string keys
    'b_<16-bit value>'. ``compound``: 20 BIGINT keys, one per C(6,3) block
    choice, each packing (combo id, 3 block values) into ≤38 bits."""
    if compound:
        widths = [11, 11, 11, 11, 10, 10]  # Σ = 64
        offsets = [sum(widths[:i]) for i in range(len(widths))]
        blocks = [
            F.shiftrightunsigned(sim, offsets[i]).bitwiseAND(
                F.lit((1 << widths[i]) - 1)
            )
            for i in range(len(widths))
        ]
        from itertools import combinations

        keys = []
        for c, (i, j, k) in enumerate(
            combinations(range(SIMHASH_COMPOUND_BLOCKS), 3)
        ):
            # fixed 11-bit slots regardless of block width: 5+33 bits < 64
            packed = (
                (
                    (F.lit(c).cast("long") * 2048 + blocks[i].cast("long")) * 2048
                    + blocks[j].cast("long")
                )
                * 2048
                + blocks[k].cast("long")
            )
            keys.append(packed)
        return F.array(*keys)
    bits_per = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << bits_per) - 1
    return F.array(
        *[
            F.concat(
                F.lit(f"{b}_"),
                F.shiftrightunsigned(sim, b * bits_per)
                .bitwiseAND(F.lit(mask))
                .cast("string"),
            )
            for b in range(SIMHASH_BANDS)
        ]
    )


def simhash_band_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    compound: bool = False,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
) -> DataFrame:
    """SimHash near-dup pairs via Hamming banding (Manku et al. 2007).

    Default (``compound=False``): 4 bands × 16 bits. Pigeonhole: ≤3
    flipped bits corrupt ≤3 of the 4 bands, so every true pair shares at
    least one intact band — the banding is LOSSLESS for ``max_hamming`` ≤
    3, not a heuristic. Band keys take 2^16 values, so the random-collision
    floor is ~``bands``·N²/2^17 pairs on a hash-uniform corpus.

    ``compound=True`` (round-6 directive 6 — the documented "next knob past
    ~10M docs" made real): Manku §3's compound-key escalation. The 64 bits
    split into 6 blocks (11,11,11,11,10,10 bits); one table per C(6,3)=20
    choice of 3 blocks, keyed on the 3 block VALUES packed into a single
    BIGINT (combo id + 3×11-bit slots → ≤38 bits). ≤3 flipped bits lie in
    ≤3 blocks, so ≥3 blocks stay intact and the table keyed on 3 intact
    blocks still collides — the pigeonhole property is preserved for
    Hamming ≤ 3. The collision floor drops to ~20·N²/2^(32..33) — ~2^15
    lower than the 16-bit bands — at 5× the band-join width (20·N rows
    shuffle instead of 4·N). Worth it only once N² /2^17 dominates true
    near-dup density, i.e. ≳10M hash-uniform docs (STRESS.md "SimHash
    banding", compound columns).

    Output: (id_a, id_b, hamming BIGINT) with id_a < id_b and hamming ≤
    ``max_hamming``; identical for both key schemes (both are lossless,
    verification is the same exact XOR+popcount).
    """
    if max_hamming > 3:
        raise ValueError(
            f"banding is lossless only for max_hamming <= 3 "
            f"(4 bands / C(6,3) blocks); got {max_hamming}"
        )
    key_arr = simhash_band_key_array(F.col(sim_col), compound)
    exploded = sigs.select(id_col, sim_col, F.explode(key_arr).alias("bk"))
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col(sim_col).alias("sh_a"), "bk"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col(sim_col).alias("sh_b"), "bk"
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return (
        a.join(b, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    max_id: int | None = None,
) -> DataFrame:
    """N-gram (word-bigram) Jaccard similarity pairs >= threshold.

    Exact (no LSH): explode distinct bigrams, self-join on bigram to get
    intersections, derive union from set sizes. ``max_id`` bounds the pair
    space for oracle runs; at scale this is the *verify* stage after LSH.
    Output: (id_a, id_b, jaccard).
    """
    from vector_database_spark.functions.text import bigrams

    base = docs if max_id is None else docs.filter(F.col(id_col) < max_id)
    # r12 (guide §1.2/§2.4): the bigram array is built ONCE over a pinned
    # token attribute (the raw-expression form re-ran the split() regex
    # per bigram element inside the transform lambda — O(tokens²) per
    # doc), per-doc array_distinct replaces the global .distinct() (the
    # id rides every row, so the (id, g) set is identical — the
    # _doc_tokens argument), and each doc's distinct-gram COUNT is
    # size() arithmetic on the same array instead of a groupBy over the
    # exploded gram table: two full shuffles of the gram table removed.
    pinned = base.select(
        id_col, computed_once(tokenize_ws(F.col(text_col))).alias("__tk")
    ).select(
        id_col,
        computed_once(F.array_distinct(bigrams(F.col("__tk")))).alias("__bg"),
    )
    grams = pinned.select(id_col, F.explode("__bg").alias("g"))
    sizes = pinned.select(
        id_col, F.size("__bg").cast("long").alias("sz")
    ).filter(F.col("sz") > 0)
    ga = grams.select(F.col(id_col).alias("id_a"), "g")
    gb = grams.select(F.col(id_col).alias("id_b"), "g")
    inter = (
        ga.join(gb, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            micro6(
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double")
            ).alias("jaccard_micro"),
        )
        .filter(F.col("jaccard_micro") >= int(threshold * 1_000_000))
        .orderBy("id_a", "id_b")
    )


def norm_side(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    out_id: str,
    e_alias: str,
    n_alias: str,
    extra=(),
) -> DataFrame:
    """One side of a pair-scoring join, L2 norm computed ONCE PER ROW —
    the single-fold discipline every pair-scoring site must follow
    (try_divide(dot, na*nb) is bit-identical to cosine(ea, eb): same
    sqrt(a·a)*sqrt(b·b) doubles in the same order, but N instead of N²
    work for two of the three folds; 2.7x measured on 64M pairs,
    STRESS.md "Pair scoring"). Shared by _pair_sides,
    semdedup_incremental and catalog._near_duplicates_indexed."""
    return df.select(
        *extra,
        F.col(id_col).alias(out_id),
        F.col(emb_col).alias(e_alias),
        l2_norm(F.col(emb_col)).alias(n_alias),
    )


def _pair_sides(tagged: DataFrame, id_col: str, emb_col: str, extra=()):
    """(a, b, cos_expr) for a self-join pair verify — norm_side applied
    to both projections of one tagged frame."""
    a = norm_side(tagged, id_col, emb_col, "id_a", "ea", "na", extra)
    b = norm_side(tagged, id_col, emb_col, "id_b", "eb", "nb", extra)
    cross = dot(F.col("ea"), F.col("eb"))
    return a, b, F.try_divide(cross, F.col("na") * F.col("nb"))


def embedding_neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = COSINE_NEARDUP_THRESHOLD,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold, a < b).

    Exact pairwise; at scale, ann.py's LSH bucketing generates the
    candidate pairs and this becomes the verify stage.
    Output: (id_a, id_b, cos DOUBLE).
    """
    from vector_database_spark.operators.knn import with_min_parallelism

    # with_min_parallelism: the streamed side of the nested-loop pair join
    # otherwise inherits the scan's file-partition count (1-2 tasks on a
    # single parquet file — measured 2 of 32 cores busy for the whole N²)
    a, b, cos = _pair_sides(with_min_parallelism(embeddings), id_col, emb_col)
    # computed_once: the threshold predicate must read the projected cos,
    # not a substituted second copy of the fold (double per-pair work)
    scored = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", round6(computed_once(cos)).alias("cos")
    )
    return scored.filter(F.col("cos") >= threshold).orderBy("id_a", "id_b")


def _sign_bucket_words(emb, dim: int = 64, n_words: int = 1) -> list:
    """Sign-bit bucket words: bit j of word k = [component_{32k+j} > 0],
    as Σ 2^j·[v>0] in exact-integer double arithmetic (the same
    construction as the binary quantizer, queries._binary_code_cols).
    Identical vectors always share every word; the DuckDB twin computes
    the same bits, so bucketing is fully oracle-checkable."""
    if (n_words - 1) * 32 >= dim:
        raise ValueError(
            f"n_words={n_words} exceeds the sign-word capacity of a "
            f"{dim}-d embedding ({(dim + 31) // 32} = ceil(dim/32))"
        )
    embd = emb.cast("array<double>")
    words = []
    for k in range(n_words):
        bits = F.zip_with(
            F.slice(embd, k * 32 + 1, min(32, dim - k * 32)),
            F.sequence(F.lit(0), F.lit(min(32, dim - k * 32) - 1)),
            lambda v, j: F.when(
                v > 0.0, F.pow(F.lit(2.0), j.cast("double"))
            ).otherwise(F.lit(0.0)),
        )
        words.append(F.aggregate(bits, F.lit(0.0), lambda a, x: a + x).cast("long"))
    return words


def semdedup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = COSINE_NEARDUP_THRESHOLD,
    dim: int = 64,
    n_bucket_words: int = 1,
) -> DataFrame:
    """SemDeDup-shape semantic dedup (Abbas et al. 2023): cluster the
    embeddings cheaply, verify cosine ONLY within clusters — the scale
    path of :func:`embedding_neardup_pairs`, which compares all N² pairs.

    The cluster key here is the 32-bit sign bucket (first
    ``n_bucket_words`` sign words) instead of the paper's k-means: it is
    a pure deterministic expression, so both engines assign identical
    buckets and the operator keeps a FULL DuckDB oracle — rare for a
    clustered dedup. Exact/near-identical copies always share the bucket
    (identical sign patterns); a near-dup whose near-zero components flip
    sign can land one bucket away — the recall/cost trade every
    clustered dedup makes (SemDeDup likewise only compares within a
    cluster), measured against the exact operator in tests/test_ann.py.

    Scale shape: one shuffle of (id, embedding) on the bucket key; pairs
    materialize per bucket, never globally. Skewed buckets (e.g. an
    all-positive embedding model) are the LSH hot-bucket hazard — salt
    or raise ``n_bucket_words``. Output: (id_a, id_b, cos), a < b.
    """
    words = _sign_bucket_words(F.col(emb_col), dim=dim, n_words=n_bucket_words)
    keys = [f"__sb{k}" for k in range(len(words))]
    # computed_once: the bucket equi-join infers isnotnull filters on the
    # keys, which Catalyst otherwise pushes down with SUBSTITUTED copies
    # of the 32-element sign fold — the plan carried 10 copies of it
    # (registry plan audit, round 4) instead of one per side
    tagged = embeddings.select(
        F.col(id_col),
        F.col(emb_col),
        *[computed_once(w).alias(k) for w, k in zip(words, keys)],
    )
    a, b, cos = _pair_sides(tagged, id_col, emb_col, extra=keys)
    scored = (
        a.join(b, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", round6(computed_once(cos)).alias("cos"))
    )
    return scored.filter(F.col("cos") >= threshold).orderBy("id_a", "id_b")


def semdedup_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = COSINE_NEARDUP_THRESHOLD,
    dim: int = 64,
    n_bucket_words: int = 1,
    max_candidates: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Batch-vs-corpus SemDeDup — the INCREMENTAL shape of
    :func:`semdedup_pairs`, completing the family next to
    incremental_dedup's MinHash twin: which incoming vectors are
    semantic near-dups of vectors already in the corpus? Both sides
    bucket by the deterministic sign pattern (identical in both
    engines → FULL oracle, queries.q_incremental_semdedup) and ONLY
    cross-side bucket pairs verify cosine — candidates never
    materialize batch² or corpus²; per-batch cost is one bucket pass
    over the batch plus the bucket join against the (re-bucketed)
    corpus. Norm tagging keeps the per-pair score to one fold
    (_pair_sides rationale). Output: (batch_id, corpus_id, cos).

    ``max_candidates``/``stats`` (r11, opt-in — the default plan is
    unchanged and stays single-job) add the cross-side volume probe of
    :func:`incremental_dedup_auto`: Σ over shared sign buckets of
    n_batch × n_corpus, one count-table join, BEFORE the verify join
    materializes anything. Over budget it WARNS rather than re-plans —
    unlike MinHash banding there is no recall-free widening here (every
    extra sign bit sheds real pairs: P(bit agrees) ≈ 1 − θ/π per bit),
    and a 64-bit sign bucket only saturates when the corpus genuinely
    clusters, so the fix is the ``dim``/``n_bucket_words`` knobs or
    admitting the output IS that large. The probe costs one extra
    bucket pass per side — opt-in so the micro-batch hot path
    (near-duplicates-on-ingest) never pays it silently."""
    import warnings

    words = _sign_bucket_words(F.col(emb_col), dim=dim, n_words=n_bucket_words)
    keys = [f"__sb{k}" for k in range(len(words))]

    def tag(df: DataFrame, out_id: str, e: str, n: str) -> DataFrame:
        # computed_once on the bucket words: same substituted-fold hazard
        # as semdedup_pairs (the equi-join infers isnotnull on the keys)
        bucketed = df.select(
            F.col(id_col),
            F.col(emb_col),
            *[computed_once(w).alias(k) for w, k in zip(words, keys)],
        )
        return norm_side(bucketed, id_col, emb_col, out_id, e, n, extra=keys)

    a = tag(batch, "batch_id", "eb", "nb")
    b = tag(corpus, "corpus_id", "ec", "nc")
    if max_candidates is not None or stats is not None:
        vol = int(
            a.groupBy(*keys)
            .agg(F.count("*").alias("n"))
            .join(
                b.groupBy(*keys).agg(F.count("*").alias("m")), keys
            )
            .agg(F.sum(F.col("n") * F.col("m")).cast("long").alias("v"))
            .collect()[0]["v"]
            or 0
        )
        if stats is not None:
            stats["bucket_pair_volume"] = vol
        if max_candidates is not None and vol > max_candidates:
            warnings.warn(
                f"semdedup_incremental: the sign-bucket join would "
                f"materialize {vol} cross-side pairs (> max_candidates="
                f"{max_candidates}) — the corpus clusters tightly in "
                f"sign space at dim={dim}, n_bucket_words="
                f"{n_bucket_words}. Raise those knobs (each extra sign "
                "bit sheds real pairs — there is no recall-free "
                "widening here), pre-shrink the batch, or accept that "
                "the near-dup output itself is that large",
                UserWarning,
                stacklevel=2,
            )
    cos = F.try_divide(dot(F.col("eb"), F.col("ec")), F.col("nb") * F.col("nc"))
    scored = a.join(b, keys).select(
        "batch_id", "corpus_id", round6(computed_once(cos)).alias("cos")
    )
    return scored.filter(F.col("cos") >= threshold).orderBy(
        "batch_id", "corpus_id"
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_w: int = 8,
    df_threshold: int = 2,
) -> DataFrame:
    """RefinedWeb/CCNet boilerplate line removal (see queries.q_line_dedup):
    segment each doc into fixed ``line_w``-token lines, strip lines whose
    corpus document-frequency reaches ``df_threshold``, return per-doc
    (n_lines, n_kept, n_removed, clean_hash). One shuffle for the DF
    count, a size-gated broadcast anti-join for the strip (the repeated-
    line set grows with the corpus — past the byte budget the hint is
    withheld and AQE decides), one shuffle to reassemble.

    Input contract: ``id_col`` must be unique and non-NULL per doc. The
    r11 boiler aggregation counts rows over per-doc-distinct line
    arrays (not countDistinct(id)), so a NULL-id doc or a duplicated id
    would shift lines across ``df_threshold`` — out-of-contract inputs
    the old form silently tolerated.
    """
    from vector_database_spark.functions.text import tokenize_ws

    from vector_database_spark.functions.vector import computed_once

    n_docs_hint = docs.count()
    # r12: pin the token array ONCE per branch (computed_once). Without
    # the pin CollapseProject inlined the tokenize into every per-line
    # slice — the exploded branch split each doc once PER LINE ROW, and
    # the r11 boiler branch split once per transform() ELEMENT inside an
    # interpreted lambda (the driver-measured r11 regression: O(lines ×
    # tokens) re-tokenization per doc). Pinned, each branch splits each
    # doc exactly once, same as substring_dedup.
    tk = tokenize_ws(F.col(text_col))
    tka = F.col("__tk")
    base = docs.select(id_col, computed_once(tk).alias("__tk"))
    starts = F.when(
        F.size(tka) > 0, F.sequence(F.lit(0), F.size(tka) - 1, F.lit(line_w))
    ).otherwise(F.array().cast("array<int>"))
    lines = base.select(
        id_col, "__tk", F.posexplode(starts).alias("line_no", "start")
    ).select(
        id_col,
        F.col("line_no").cast("long").alias("line_no"),
        F.concat_ws(" ", F.slice(tka, F.col("start") + 1, line_w)).alias("line"),
    )
    # r11 (guide §2.3/§2.4): the DF count only needs DISTINCT (doc, line)
    # pairs, so dedupe per doc MAP-SIDE (array_distinct over the line
    # array) and count plain rows per line — the old
    # groupBy(line).agg(countDistinct(id)) expanded into two shuffles of
    # the full line table for the same number. Pinned against the
    # inferred-pre-filter clone like every built-array explode.
    line_arr = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(tka, s + 1, line_w))
    )
    boiler = (
        base.select(computed_once(F.array_distinct(line_arr)).alias("__la"))
        .select(F.explode("__la").alias("line"))
        .groupBy("line")
        .count()
        .filter(F.col("count") >= df_threshold)
        .select("line")
    )
    # boiler (distinct repeated lines) grows with the corpus: hint it
    # only below the verify byte budget. Row estimate: ~8 lines/doc upper
    # bound (line_w-token segments) at ~120 B per line row.
    kept = lines.join(
        _maybe_broadcast(boiler, n_docs_hint * 8, 120), "line", "left_anti"
    )
    agg = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                    lambda s: s["line"],
                ),
            )
        ).alias("clean_hash"),
    )
    # r11 (guide §2.4): a doc's line count is size(starts) — arithmetic on
    # the token array — so the totals side is MAP-ONLY instead of a
    # groupBy over the exploded line table (one shuffle of docs×8 rows
    # removed); the size(tk) > 0 guard keeps row parity with the explode
    # (docs with NULL/absent text produced no line rows and no output row).
    # r12: size(sequence(0, n-1, w)) written as the integer arithmetic it
    # is — floor((n-1)/w) + 1 — so the totals pass allocates no array.
    totals = base.select(
        id_col,
        computed_once(
            F.when(
                F.size(tka) > 0,
                F.floor((F.size(tka) - 1) / line_w) + 1,
            )
        )
        .cast("long")
        .alias("n_lines"),
    ).filter(F.col("n_lines") > 0)
    return totals.join(agg, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
        F.coalesce(F.col("clean_hash"), F.md5(F.lit(""))).alias("clean_hash"),
    )


# launder the label table's compounding size estimate through a parquet
# leaf every N rounds (see the footgun note inside connected_components);
# 8 keeps the BigInt under ~12k digits — sub-millisecond arithmetic
_CC_STATS_LAUNDER_EVERY = 8


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 30,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into duplicate CLUSTERS: connected
    components by iterative min-label propagation with pointer jumping —
    the cluster-resolution step after MinHash/SimHash/Jaccard pair
    generation (each doc keeps its component's min id as the canonical
    representative, the standard fuzzy-dedup endgame).

    Each round does (1) a neighbor-min exchange (label := min over adjacent
    labels) and (2) a pointer jump (label := label(label)), which is the
    path-halving that turns O(diameter) rounds into O(log diameter) — the
    same idea as the MapReduce large-star/small-star algorithm. Rounds are
    driver-iterated Catalyst jobs with localCheckpoint() between them
    (iterative lineage would otherwise grow unboundedly). Converged when a
    round changes no label, so the result is iteration-order independent
    and exactly the true components: (id, component=min reachable id).

    ``nodes`` optionally supplies the full id universe (single-column
    DataFrame) so isolated docs appear as their own singleton component.
    """
    import atexit
    import os
    import shutil
    import tempfile

    # r12 — stats-compounding footgun (measured, guide §1/§7): Spark's
    # size-only stats visitor estimates a join's sizeInBytes as the
    # PRODUCT of its children's, and Dataset.localCheckpoint captures
    # the optimized plan's stats into the new LogicalRDD (originStats).
    # An iterative join loop therefore SQUARES the BigInt estimate every
    # round — its digit count doubles (measured on the 200-node test
    # graph: 45 → 96 → 198 → 401 → 808 → 1621 → 3248 digits over six
    # rounds), and by round ~17 every planning pass does arithmetic on
    # multi-megabit integers: checkpoint calls grew 0.25s → 13s/round
    # while data, plans and RDD lineage stayed provably flat (AQE off,
    # constraint propagation off, reliable checkpoint, and a pre-ckpt
    # repartition all reproduced it). Only a LEAF relation resets the
    # estimate, so every _CC_STATS_LAUNDER_EVERY rounds the (id, comp)
    # table takes one parquet round-trip through a temp dir — a linear,
    # narrow-table write whose files are reclaimed at process exit.
    launder_root: list[str] = []

    def _launder(df: DataFrame, it: int) -> DataFrame:
        if not launder_root:
            launder_root.append(tempfile.mkdtemp(prefix="cc_labels_"))
            atexit.register(shutil.rmtree, launder_root[0], ignore_errors=True)
        path = os.path.join(launder_root[0], f"round_{it}")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)

    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # r12 (guide §5): the symmetrized edge table is read by EVERY round's
    # neighbor-min join; un-persisted, each round re-ran the union +
    # distinct shuffle. One persist before the loop, released after.
    edges = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    labels = edges.select(F.col("src").alias("id")).distinct()
    if nodes is not None:
        ids = nodes.toDF("id")
        labels = labels.unionAll(ids).distinct()
    labels = labels.select("id", F.col("id").alias("comp")).localCheckpoint()
    for it in range(max_iter):
        nbr = (
            edges.join(
                labels.select(F.col("id").alias("src"), F.col("comp").alias("c")),
                "src",
            )
            .groupBy("dst")
            .agg(F.min("c").alias("nbr_comp"))
            .select(F.col("dst").alias("id"), "nbr_comp")
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id",
            F.col("comp").alias("__old"),
            F.least("comp", F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
        )
        new_comp = F.least("comp", F.coalesce("comp2", F.col("comp")))
        jumped = stepped.join(
            stepped.select(F.col("id").alias("comp"), F.col("comp").alias("comp2")),
            "comp",
            "left",
        ).select("id", new_comp.alias("comp"), (new_comp != F.col("__old")).alias("__chg"))
        # r12 (guide §1.2): convergence is detected from a flag carried
        # THROUGH the checkpoint (new label != old label, computed inside
        # the round's own job) — the old probe re-joined the new and old
        # label tables, paying a second shuffle job per round
        new_labels = jumped.localCheckpoint()
        changed = new_labels.filter(F.col("__chg")).limit(1).count()
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
        if (it + 1) % _CC_STATS_LAUNDER_EVERY == 0:
            labels = _launder(labels, it)
    edges.unpersist()
    return labels.select("id", F.col("comp").alias("component"))
