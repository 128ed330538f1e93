"""Focused pins for the r12 optimization-round internals.

Every r12 change claims BIT-IDENTICAL results through a cheaper plan;
these tests pin the equivalences directly (the oracle-parity suite pins
them end-to-end, but these point at the exact internal that changed so a
future edit fails here first with a readable message).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL
from vector_database_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    from vector_database_spark.sources.tables import read_table

    return read_table(spark, SF_SMALL, "documents")


def _filtered_table_wide_sigs(toks, id_col, num_hashes, drop, min_content):
    """The pre-r12 DF-rung shape — build the filtered (id, token) table
    (content rows for kept docs, ALL rows for fallback docs) and run the
    plain wide-signature aggregation over it. Golden reference for the
    fused drop_tokens/min_content form."""
    spark = toks.sparkSession
    high_df = spark.createDataFrame([(t,) for t in drop], "token string")
    content_n = (
        toks.join(F.broadcast(high_df), "token", "left_anti")
        .groupBy(id_col)
        .agg(F.count("*").alias("__n"))
    )
    all_ids = toks.select(id_col).distinct()
    fallback_ids = all_ids.join(
        content_n.filter(F.col("__n") >= min_content), id_col, "left_anti"
    )
    filt = (
        toks.join(F.broadcast(high_df.withColumn("__hi", F.lit(True))), "token", "left")
        .join(fallback_ids.withColumn("__fb", F.lit(True)), id_col, "left")
        .filter(F.col("__fb").isNotNull() | F.col("__hi").isNull())
        .select(id_col, "token")
    )
    return dedup._wide_minhash_signatures(filt, id_col, num_hashes)


def test_fused_df_rung_equals_filtered_table_form(spark):
    """_wide_minhash_signatures(drop_tokens=..., min_content=...) must be
    row-identical to signing the explicitly filtered token table — the
    r12 fusion's whole claim. The corpus plants every regime: pure-
    boilerplate docs (full-set fallback), boundary docs straddling the
    content floor, and content-rich docs."""
    rows = [
        (1, "b0 b1 b2 b3 c0 c1 c2 c3 c4"),     # content-rich: filtered
        (2, "b0 b1 b2 b3"),                      # pure boilerplate: fallback
        (3, "b0 b1 b2 b3 c9"),                   # 1 content token: fallback
        (4, "b0 c0 c1 c2 c3"),                   # exactly at floor: filtered
        (5, "c5 c6 c7 c8"),                      # no boilerplate at all
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = dedup._doc_tokens(docs, "text", "doc_id")
    drop = ["b0", "b1", "b2", "b3"]
    fused = dedup._wide_minhash_signatures(
        toks, "doc_id", 8, drop_tokens=drop, min_content=4
    )
    golden = _filtered_table_wide_sigs(toks, "doc_id", 8, drop, 4)
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, golden.collect())
    )


def test_disjoint_probe_returns_incoming_count(spark, docs):
    """_check_disjoint_ids(count_incoming=True) folds the incoming row
    count into the probe job; the count must equal a plain count() and
    the overlap ValueError must still fire."""
    corpus = docs.filter(F.col("doc_id") < 300)
    incoming = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 340)
    ).select("doc_id", "text")
    n = dedup._check_disjoint_ids(incoming, corpus, "doc_id", count_incoming=True)
    assert n == incoming.count()
    # without the flag: None, behavior unchanged
    assert dedup._check_disjoint_ids(incoming, corpus, "doc_id") is None
    overlapping = docs.filter(
        (F.col("doc_id") >= 299) & (F.col("doc_id") < 340)
    ).select("doc_id", "text")
    with pytest.raises(ValueError, match="disjoint ids"):
        dedup._check_disjoint_ids(overlapping, corpus, "doc_id", count_incoming=True)


def test_token_bitmasks_vocab_tokens_equals_probe_path(spark, docs):
    """_token_bitmasks with a caller-supplied complete vocabulary must
    produce the identical mask table as the self-probing path, and the
    over-cap sentinel must select the array representation without any
    probe."""
    sample = docs.filter(F.col("doc_id") < 60)
    toks = dedup._doc_tokens(sample, "text", "doc_id")
    vocab = [r["token"] for r in toks.select("token").distinct().collect()]
    probed, nw1 = dedup._token_bitmasks(sample, "text", "doc_id", toks=toks)
    given, nw2 = dedup._token_bitmasks(
        sample, "text", "doc_id", toks=toks, vocab_tokens=vocab
    )
    assert nw1 == nw2
    assert sorted(map(tuple, probed.collect())) == sorted(
        map(tuple, given.collect())
    )
    over, nw = dedup._token_bitmasks(
        sample, "text", "doc_id", toks=toks, vocab_tokens=dedup._VOCAB_OVER_CAP
    )
    assert over is None and nw == 0
    # a too-large explicit vocabulary also falls back to arrays
    fake = [f"t{i}" for i in range(dedup.MAX_BITMASK_VOCAB + 1)]
    over2, _ = dedup._token_bitmasks(
        sample, "text", "doc_id", toks=toks, vocab_tokens=fake
    )
    assert over2 is None


def test_incremental_corpus_vocab_threading_row_identical(spark, docs):
    """incremental_dedup with the at-rest corpus vocabulary must return
    exactly the rows of the self-probing call (the q_incremental_dedup
    oracle contract rides on this)."""
    corpus = docs.filter(F.col("doc_id") < 300)
    incoming = (
        docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 350))
        .select("doc_id", "text")
    )
    base = dedup.incremental_dedup(incoming, corpus).collect()
    toks = dedup._doc_tokens(corpus, "text", "doc_id")
    vocab = [
        r["token"]
        for r in toks.select("token")
        .distinct()
        .limit(dedup.MAX_BITMASK_VOCAB + 1)
        .collect()
    ]
    threaded = dedup.incremental_dedup(
        incoming,
        corpus,
        corpus_tokens=toks,
        n_corpus=corpus.count(),
        corpus_vocab=vocab,
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, threaded))


def test_line_dedup_single_tokenize_per_branch(spark):
    """The r12 pin: each line_dedup branch tokenizes each doc exactly
    once — every split() in the optimized plan sits inside a pinned
    (nondeterministic CASE WHEN) projection, never inside a transform
    lambda or a per-exploded-row projection."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c")], "doc_id long, text string"
    )
    plan = (
        dedup.line_dedup(docs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "split(" in plan
    for line in plan.splitlines():
        if "split(" not in line:
            continue
        assert "monotonically_increasing_id" in line, (
            "unpinned tokenize (would re-run per line):\n" + line
        )
    # and no tokenize inside any lambda body (the r11 regression shape)
    i = 0
    while True:
        j = plan.find("lambdafunction(", i)
        if j < 0:
            break
        k = j + len("lambdafunction(")
        depth, end = 1, k
        while depth and end < len(plan):
            depth += {"(": 1, ")": -1}.get(plan[end], 0)
            end += 1
        assert "split(" not in plan[k:end]
        i = k


def test_ngram_jaccard_matches_bruteforce(spark):
    """ngram_jaccard_pairs after the r12 map-side-distinct rewrite must
    equal a python brute force over distinct bigram sets."""
    rows = [
        (1, "x y z w"),
        (2, "x y z q"),
        (3, "x y x y x y"),   # internal repeats: distinct set is {x y, y x}
        (4, "x y z w"),       # exact dup of 1
        (5, "solo"),          # no bigrams at all
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_micro"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    import itertools

    def bg(text):
        t = text.split()
        return {f"{a} {b}" for a, b in zip(t, t[1:])}

    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        sa, sb = bg(ta), bg(tb)
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter == 0:
            continue
        j = inter / (len(sa) + len(sb) - inter)
        micro = int(j * 1_000_000 + 0.5)
        if micro >= 200_000:
            want[(ia, ib)] = micro
    assert got == want


def test_connected_components_stats_launder_unbounded_rounds(spark):
    """A long path graph forces > _CC_STATS_LAUNDER_EVERY rounds, so the
    parquet launder path executes; components must still be exact (the
    r12 stats-compounding fix claims zero semantic footprint)."""
    n = 60
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_verify_mask_cache_rotates_with_sig_caches(spark, docs):
    """r12: jaccard_verify persists the bitmask table (both join sides
    read one build) and registers it with the dedup cache rotation — a
    second dedup call must release the first call's masks, so repeated
    calls keep cached-RDD count bounded."""
    sample = docs.filter(F.col("doc_id") < 80)

    def n_cached():
        sc = spark.sparkContext
        return len(
            [i for i in sc._jsc.sc().getRDDStorageInfo() if i.numCachedPartitions() > 0]
        )

    dedup.minhash_neardup_pairs(sample).write.mode("overwrite").format(
        "noop"
    ).save()
    first = n_cached()
    for _ in range(3):
        dedup.minhash_neardup_pairs(sample).write.mode("overwrite").format(
            "noop"
        ).save()
    assert n_cached() <= first, "verify mask cache leaked across calls"
    dedup._release_sig_caches()
