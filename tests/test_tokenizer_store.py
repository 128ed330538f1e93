"""Tokenizer artifact persistence (operators/tokenizer_store.py):
exact round-trips, encode equality through a reload, crash-swap
recovery, kind/version guards."""

from __future__ import annotations

import os
import shutil

import pytest

from vector_database_spark.operators import bpe, tokenizer_store as ts
from vector_database_spark.operators import textops, unigram_lm as ug


@pytest.fixture()
def tiny_docs(spark):
    rows = [
        (0, "aba abba aba cab"),
        (1, "abba aba bac cab"),
        (2, "cab aba abba abc"),
        (3, "bbb aaa aba abba"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_roundtrip_bit_exact_and_encode_equal(spark, tiny_docs, tmp_path):
    model = ug.train_unigram(tiny_docs, vocab_size=8, max_piece_len=3)
    path = str(tmp_path / "uni")
    ts.save_unigram(spark, path, model, params={"vocab_size": 8})
    loaded = ts.load_unigram(spark, path)
    assert loaded == model  # bit-exact doubles through parquet
    enc_a = {
        r["doc_id"]: list(r["pieces"])
        for r in ug.unigram_encode(tiny_docs, model).collect()
    }
    enc_b = {
        r["doc_id"]: list(r["pieces"])
        for r in ug.unigram_encode(tiny_docs, loaded).collect()
    }
    assert enc_a == enc_b
    meta = ts.describe(path)
    assert meta["kind"] == "unigram" and meta["n"] == len(model)
    assert meta["params"] == {"vocab_size": 8}


def test_bpe_roundtrip_and_encode_equal(spark, tiny_docs, tmp_path):
    merges = bpe.learn_bpe(tiny_docs, n_merges=6)
    path = str(tmp_path / "bpe")
    ts.save_bpe(spark, path, merges)
    loaded = ts.load_bpe(spark, path)
    assert loaded == merges
    enc_a = {
        r["doc_id"]: list(r["subwords"])
        for r in textops.bpe_encode(tiny_docs, merges).collect()
    }
    enc_b = {
        r["doc_id"]: list(r["subwords"])
        for r in textops.bpe_encode(tiny_docs, loaded).collect()
    }
    assert enc_a == enc_b


def test_overwrite_replaces_and_kind_guard(spark, tiny_docs, tmp_path):
    path = str(tmp_path / "tok")
    m1 = ug.train_unigram(tiny_docs, vocab_size=6, max_piece_len=3)
    m2 = ug.train_unigram(tiny_docs, vocab_size=8, max_piece_len=3)
    ts.save_unigram(spark, path, m1)
    ts.save_unigram(spark, path, m2)
    assert ts.load_unigram(spark, path) == m2
    with pytest.raises(ValueError, match="kind"):
        ts.load_bpe(spark, path)
    with pytest.raises(FileNotFoundError):
        ts.load_unigram(spark, str(tmp_path / "absent"))


def test_crashed_swap_falls_back_to_aside(spark, tiny_docs, tmp_path):
    """A crash between 'old moves aside' and 'new lands' leaves only
    the .old dir — the loader must still serve the previous model."""
    path = str(tmp_path / "tok")
    m1 = ug.train_unigram(tiny_docs, vocab_size=6, max_piece_len=3)
    ts.save_unigram(spark, path, m1)
    # simulate the torn swap
    os.rename(path, path + ".old")
    assert ts.load_unigram(spark, path) == m1
    # and a subsequent save heals it: aside cleared, final current
    m2 = ug.train_unigram(tiny_docs, vocab_size=8, max_piece_len=3)
    ts.save_unigram(spark, path, m2)
    assert ts.load_unigram(spark, path) == m2
    assert not os.path.exists(path + ".old")


def test_stale_staging_dir_is_replaced(spark, tiny_docs, tmp_path):
    path = str(tmp_path / "tok")
    stale = f"{path}.staging-{os.getpid()}"
    os.makedirs(stale)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("crashed save leftovers")
    m1 = ug.train_unigram(tiny_docs, vocab_size=6, max_piece_len=3)
    ts.save_unigram(spark, path, m1)
    assert ts.load_unigram(spark, path) == m1
    assert not os.path.exists(stale)
    shutil.rmtree(path)
