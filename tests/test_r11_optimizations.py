"""Focused pins for the r11 optimization-round internals.

Every r11 change claims BIT-IDENTICAL results through a cheaper plan;
these tests pin the equivalences directly (the oracle-parity suite pins
them end-to-end, but these point at the exact internal that changed so a
future edit fails here first with a readable message).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL
from vector_database_spark.operators import ann, dedup


@pytest.fixture(scope="module")
def docs(spark):
    from vector_database_spark.sources.tables import read_table

    return read_table(spark, SF_SMALL, "documents")


def _old_union_band_keys(signatures, id_col, num_hashes, bands):
    """The pre-r11 bands-way-union band_keys — the golden reference the
    explode form must reproduce as a multiset."""
    rows_per_band = num_hashes // bands
    frames = []
    for b in range(bands):
        cols = [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
        key = F.concat_ws(
            "_", F.lit(str(b)), *[F.col(c).cast("string") for c in cols]
        )
        frames.append(
            signatures.select(F.col(id_col).alias("bid"), key.alias("band_key"))
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionAll(fr)
    return out


def test_band_keys_explode_matches_union_form(spark, docs):
    sigs = dedup.minhash_signatures(docs).persist()
    try:
        new = dedup.band_keys(sigs, "doc_id").groupBy("bid", "band_key").count()
        old = (
            _old_union_band_keys(sigs, "doc_id", dedup.NUM_HASHES, dedup.BANDS)
            .groupBy("bid", "band_key")
            .count()
        )
        assert new.exceptAll(old).count() == 0
        assert old.exceptAll(new).count() == 0
    finally:
        sigs.unpersist()


def test_band_keys_levels_tags_every_level(spark, docs):
    sigs = dedup.minhash_index_signatures(docs).persist()
    try:
        levels = list(dedup.MINHASH_ESCALATION_LEVELS)
        tagged = dedup._band_keys_levels(sigs, "doc_id", levels)
        for nh, nb in levels:
            lv = tagged.filter(
                (F.col("__nh") == nh) & (F.col("__nb") == nb)
            ).select("bid", "band_key")
            ref = dedup.band_keys(sigs, "doc_id", nh, nb)
            assert lv.exceptAll(ref).count() == 0
            assert ref.exceptAll(lv).count() == 0
    finally:
        sigs.unpersist()


def test_volume_and_docs_doc_count_and_volume(spark, docs):
    sigs = dedup.minhash_signatures(docs).persist()
    try:
        vol, n_docs = dedup._volume_and_docs(
            sigs, "doc_id", dedup.NUM_HASHES, dedup.BANDS
        )
        assert n_docs == sigs.count()
        assert vol == dedup.minhash_candidate_volume(sigs)
    finally:
        sigs.unpersist()


def test_doc_tokens_map_side_distinct(spark):
    rows = spark.createDataFrame(
        [(1, "a b a  b c"), (2, "x x x"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["token"])
        for r in dedup._doc_tokens(rows, "text", "doc_id").collect()
    }
    # per-doc distinct pairs; "" tokenizes to [""]; NULL text drops the doc
    assert got == {(1, "a"), (1, "b"), (1, "c"), (2, "x"), (3, "")}
    # and the plan carries no exchange before the generate (map-side)
    plan = dedup._doc_tokens(rows, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_token_bitmasks_over_cap_returns_array_path(spark):
    # vocab of MAX_BITMASK_VOCAB+2 distinct tokens -> the single-probe
    # limit-collect must detect the over-cap case exactly
    n = dedup.MAX_BITMASK_VOCAB + 2
    rows = spark.createDataFrame(
        [(i, f"tok{i} tok{(i + 1) % n}") for i in range(n)],
        "doc_id long, text string",
    )
    masks, n_words = dedup._token_bitmasks(rows, "text", "doc_id")
    assert masks is None and n_words == 0


def test_jaccard_verify_accepts_threaded_toks_and_n_docs(spark, docs):
    toks = dedup._doc_tokens(docs, "text", "doc_id").persist()
    try:
        sigs = dedup.minhash_signatures(docs, toks=toks).persist()
        try:
            cands = dedup.minhash_band_pairs(sigs)
            base = dedup.jaccard_verify(cands, docs)
            threaded = dedup.jaccard_verify(
                cands, docs, toks=toks, n_docs=docs.count()
            )
            assert base.exceptAll(threaded).count() == 0
            assert threaded.exceptAll(base).count() == 0
        finally:
            sigs.unpersist()
    finally:
        toks.unpersist()


def test_lsh_long_form_single_udf_pass_and_null_rows(spark):
    from pyspark.sql import Row

    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[float(i) for i in range(64)], label="a"),
            Row(vec_id=1, embedding=None, label="b"),  # degraded signature
        ]
    )
    lf = ann.lsh_long_form(emb, dim=64, payload_cols=("label",))
    rows = lf.collect()
    # one row per (vec, table), NULL sig rows preserved per table
    assert len(rows) == 2 * ann.LSH_TABLES
    null_rows = [r for r in rows if r["sig"] is None]
    assert len(null_rows) == ann.LSH_TABLES
    assert sorted({r["table"] for r in rows}) == list(range(ann.LSH_TABLES))
    # exactly ONE Python-eval node in the executed plan (the pre-r11
    # union form carried one per table)
    plan = lf._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") == 1


def test_pq_auto_shortlist_n_codes_matches_count_path(spark):
    from vector_database_spark.sources.tables import read_table

    emb = read_table(spark, SF_SMALL, "embeddings")
    books = ann.pq_train(emb)
    codes = ann.pq_encode(emb, books)
    via_count = ann.pq_knn_rerank(
        codes, books, emb, [float(i % 7) for i in range(64)], k=5, shortlist=None
    )
    via_n = ann.pq_knn_rerank(
        codes,
        books,
        emb,
        [float(i % 7) for i in range(64)],
        k=5,
        shortlist=None,
        n_codes=emb.count(),
    )
    assert [r.asDict() for r in via_count.collect()] == [
        r.asDict() for r in via_n.collect()
    ]


def test_read_table_memoizes_per_session(spark):
    from vector_database_spark.sources import tables

    a = tables.read_table(spark, SF_SMALL, "documents")
    b = tables.read_table(spark, SF_SMALL, "documents")
    assert a is b  # plan-level memo: same analyzed DataFrame object
    c = tables.read_table(spark, SF_SMALL, "orders")
    assert c is not a
