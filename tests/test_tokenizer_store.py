"""Tokenizer artifact persistence (operators/tokenizer_store.py):
exact round-trips, encode equality through a reload, crash-state
recovery of the versioned-pointer layout, reader grace window,
kind/version guards."""

from __future__ import annotations

import os

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


def test_previous_version_survives_one_save_for_readers(spark, tiny_docs, tmp_path):
    """A reader that resolved the pointer just before a re-save must
    still find its (immutable) version dir afterwards; two saves later
    it is reclaimed."""
    path = str(tmp_path / "tok")
    m1 = ug.train_unigram(tiny_docs, vocab_size=6, max_piece_len=3)
    m2 = ug.train_unigram(tiny_docs, vocab_size=8, max_piece_len=3)
    ts.save_unigram(spark, path, m1)
    v1 = ts._resolve(path)  # what an in-flight reader holds
    ts.save_unigram(spark, path, m2)
    # grace window: the reader's dir is intact and self-consistent
    assert os.path.exists(os.path.join(v1, "meta.json"))
    assert ts.load_unigram(spark, path) == m2
    ts.save_unigram(spark, path, m1)
    assert not os.path.exists(v1)  # reclaimed after the grace window


def test_crash_before_pointer_swap_serves_old_then_heals(spark, tiny_docs, tmp_path):
    """Crash AFTER the version dir renamed but BEFORE the pointer swap:
    CURRENT still names the old complete artifact; the next save cleans
    the orphan."""
    path = str(tmp_path / "tok")
    m1 = ug.train_unigram(tiny_docs, vocab_size=6, max_piece_len=3)
    ts.save_unigram(spark, path, m1)
    # simulate the torn save: a fully-written orphan version dir with no
    # pointer update (copy the current artifact as the orphan)
    import shutil

    cur = ts._resolve(path)
    orphan = os.path.join(path, "v99")
    shutil.copytree(cur, orphan)
    assert ts.load_unigram(spark, path) == m1  # pointer wins, orphan ignored
    m2 = ug.train_unigram(tiny_docs, vocab_size=8, max_piece_len=3)
    ts.save_unigram(spark, path, m2)  # picks v100, cleans the orphan
    assert ts.load_unigram(spark, path) == m2
    assert not os.path.exists(orphan)


def test_stale_staging_from_any_pid_is_swept(spark, tiny_docs, tmp_path):
    path = str(tmp_path / "tok")
    os.makedirs(path)
    stale = os.path.join(path, ".staging-424242")  # some dead pid
    os.makedirs(stale)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("crashed save leftovers")
    m1 = ug.train_unigram(tiny_docs, vocab_size=6, max_piece_len=3)
    ts.save_unigram(spark, path, m1)
    assert ts.load_unigram(spark, path) == m1
    assert not os.path.exists(stale)


def test_save_sweeps_dead_staging_but_spares_live_writers(spark, tmp_path):
    """The staging sweep removes dirs from DEAD pids (crashed saves) but
    leaves a dir whose pid is still alive — a concurrent-writer contract
    violation should fail loudly at the victim's own rename, not have
    its staging dir silently yanked by us."""
    path = str(tmp_path / "tok")
    os.makedirs(path)
    dead = os.path.join(path, ".staging-999999999")  # pid cannot exist
    live = os.path.join(path, ".staging-1")  # pid 1 is always alive
    orphan = os.path.join(path, ".staging-xyz")  # non-pid orphan: swept
    for d in (dead, live, orphan):
        os.makedirs(d)
    ts.save_unigram(spark, path, [("a", -0.5)], params={})
    assert not os.path.exists(dead)
    assert not os.path.exists(orphan)
    assert os.path.exists(live)  # the live writer keeps its dir
    # the save itself completed and reads back fine
    assert ts.load_unigram(spark, path) == [("a", -0.5)]
