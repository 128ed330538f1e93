"""Cross-operator property checks (SURVEY §5.2 item 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vector_database_spark.operators import dedup, textops
from vector_database_spark.sources.tables import read_table


def test_exact_dedup_idempotent(spark):
    docs = read_table(spark, SF_SMALL, "documents")
    aug = docs.unionByName(
        docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 9000).alias("doc_id"), "text", "lang", "source", "n_chars"
        )
    )
    once = dedup.exact_dedup(aug)
    twice = dedup.exact_dedup(once.drop("text_hash"))
    assert once.count() == twice.count()
    assert {r["doc_id"] for r in once.select("doc_id").collect()} == {
        r["doc_id"] for r in twice.select("doc_id").collect()
    }


def test_upsert_reapply_is_idempotent(spark, tmp_path):
    from vector_database_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "c"))
    col = cat.create_collection("p", dim=2)
    pts = spark.createDataFrame(
        [(i, [float(i), 1.0], {"k": "v"}) for i in range(10)],
        "id long, embedding array<float>, payload map<string,string>",
    )
    col.upsert(pts)
    col.upsert(pts)  # same batch again — latest wins, same logical state
    assert col.count() == 10
    assert col.df().select("id").distinct().count() == 10


def test_encode_decode_roundtrip_on_corpus(spark):
    """decode(encode(x)) == tokens of x with out-of-vocab replaced by [UNK]."""
    docs = read_table(spark, SF_SMALL, "documents").limit(20)
    full = read_table(spark, SF_SMALL, "documents")
    vocab = textops.build_vocab(full)
    vocab_tokens = {r["token"] for r in vocab.collect()}
    enc = textops.encode(docs, vocab)
    dec = {r["doc_id"]: r["decoded"] for r in textops.decode(enc, vocab).collect()}
    for r in docs.select("doc_id", "text").collect():
        toks = r["text"].lower().split()
        expect = " ".join(t if t in vocab_tokens else "[UNK]" for t in toks)
        assert dec[r["doc_id"]] == expect


def test_jaccard_verify_wide_vocab_fallback(spark):
    """A corpus with >4096 distinct tokens must take the array_intersect
    fallback (bitmask packing refuses) and still produce exact Jaccard."""
    import itertools

    # 40 docs × 250 tokens, odd docs share 150 with their predecessor:
    # distinct vocabulary = 20·250 + 20·100 = 7000 > MAX_BITMASK_VOCAB
    rows = []
    for d in range(40):
        toks = [f"tok{d}_{i}" for i in range(250)]
        if d % 2 == 1:
            toks[:150] = [f"tok{d-1}_{i}" for i in range(150)]
        rows.append((d, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    masks, _ = dedup._token_bitmasks(docs, "text", "doc_id")
    assert masks is None  # fallback path engaged

    pairs = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(range(40), 2)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_micro"]
        for r in dedup.jaccard_verify(pairs, docs, threshold=0.3).collect()
    }
    # exact expectation: 150 shared of 250+250-150=350 union → 0.428571…
    # micro6 = floor(150/350*1e6 + 0.5) = 428571
    for d in range(1, 40, 2):
        assert got[(d - 1, d)] == 428571
    # non-adjacent pairs share nothing → absent
    assert (0, 2) not in got


def test_minhash_contains_all_exact_dup_pairs(spark):
    """LSH candidates must never miss identical documents (J=1 collides in
    every band), so exact-dup pairs are a strict subset of minhash output."""
    docs = read_table(spark, SF_SMALL, "documents")
    copies = docs.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    aug = docs.unionByName(copies)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_neardup_pairs(aug).collect()
    }
    for i in range(30):
        assert (i, i + 5000) in pairs
