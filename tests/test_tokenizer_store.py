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


# -- HF WordLevel interop (r10 verdict directive 7) -----------------------

_REF_ARTIFACT = "/root/reference/tokenizer_en.json"


@pytest.mark.skipif(
    not os.path.exists(_REF_ARTIFACT), reason="reference artifact not mounted"
)
def test_load_reference_hf_artifact_and_encode_parity(spark):
    """Load the reference's ACTUAL tokenizer_en.json (15,698 entries,
    specials [UNK]/[PAD]/[SOS]/[EOS] at 0-3 — transformer_sample.py:402-411)
    and assert D3 encode ids match HF WordLevel semantics on in-vocab
    tokens: id = model.vocab[token], unknown → [UNK]=0."""
    import json

    from pyspark.sql import functions as F

    from vector_database_spark.functions.text import hf_whitespace_tokens

    vocab_df = ts.load_hf_wordlevel(spark, _REF_ARTIFACT)
    hf_vocab = json.load(open(_REF_ARTIFACT))["model"]["vocab"]
    assert vocab_df.count() == len(hf_vocab) == 15698
    specials = {
        r["token"]: r["token_id"]
        for r in vocab_df.filter(F.col("token_id") < 4).collect()
    }
    assert specials == {"[UNK]": 0, "[PAD]": 1, "[SOS]": 2, "[EOS]": 3}

    # punctuation-free text whose whitespace tokens are all in-vocab,
    # plus one guaranteed-OOV token — D3's broadcast-join encode must
    # produce exactly HF's ids
    text = "the king said that no man could ever zzqx"
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = textops.encode(docs, vocab_df).collect()[0]["ids"]
    expected = [hf_vocab.get(tok, 0) for tok in text.split()]
    assert list(got) == expected
    assert expected[-1] == 0  # the OOV token really exercised the UNK path
    assert all(i > 3 for i in expected[:-1])  # and the rest are real hits

    # the HF Whitespace pre-tokenizer (\w+|[^\w\s]+) splits punctuation
    # runs the engine's plain ws split would keep fused — parity on the
    # boundary behavior the artifact was trained with
    punct = spark.createDataFrame([("Hello, world!",)], "text string")
    toks = punct.select(
        hf_whitespace_tokens(F.col("text")).alias("t")
    ).collect()[0]["t"]
    assert list(toks) == ["Hello", ",", "world", "!"]


@pytest.mark.skipif(
    not os.path.exists(_REF_ARTIFACT), reason="reference artifact not mounted"
)
def test_save_hf_wordlevel_roundtrips_reference_artifact(spark, tmp_path):
    """load → save → load of the real reference artifact preserves the
    model vocab exactly (byte-format parity on the fields WordLevel
    loading depends on)."""
    import json

    out = str(tmp_path / "tokenizer_roundtrip.json")
    ts.save_hf_wordlevel(ts.load_hf_wordlevel(spark, _REF_ARTIFACT), out)
    orig = json.load(open(_REF_ARTIFACT))
    saved = json.load(open(out))
    assert saved["model"] == orig["model"]
    assert saved["pre_tokenizer"] == orig["pre_tokenizer"]
    assert {t["content"]: t["id"] for t in saved["added_tokens"]} == {
        t["content"]: t["id"] for t in orig["added_tokens"]
    }
    # and the saved file loads back into an identical DataFrame
    a = sorted(map(tuple, ts.load_hf_wordlevel(spark, out).collect()))
    b = sorted(map(tuple, ts.load_hf_wordlevel(spark, _REF_ARTIFACT).collect()))
    assert a == b


def test_save_hf_wordlevel_from_build_vocab(spark, tiny_docs, tmp_path):
    """D2's build_vocab output (content ids from 4 up) exports to an HF
    artifact with the specials planted at 0-3, and a reload encodes
    identically to the in-memory vocab."""
    vocab = textops.build_vocab(tiny_docs)
    out = str(tmp_path / "wl.json")
    ts.save_hf_wordlevel(vocab, out)
    reloaded = ts.load_hf_wordlevel(spark, out)
    assert reloaded.count() == vocab.count() + 4  # + the specials
    enc_a = {
        r["doc_id"]: list(r["ids"])
        for r in textops.encode(tiny_docs, vocab).collect()
    }
    enc_b = {
        r["doc_id"]: list(r["ids"])
        for r in textops.encode(tiny_docs, reloaded).collect()
    }
    assert enc_a == enc_b


def test_save_hf_wordlevel_guards(spark):
    """Collisions fail loudly: a content row squatting on a special id,
    and a vocab without its unk_token."""
    bad = spark.createDataFrame(
        [("hello", 1)], "token string, token_id long"
    )
    with pytest.raises(ValueError, match="needs id"):
        ts.save_hf_wordlevel(bad, "/tmp/never_written.json")
    no_unk = spark.createDataFrame(
        [("hello", 4)], "token string, token_id long"
    )
    with pytest.raises(ValueError, match="unk_token"):
        ts.save_hf_wordlevel(no_unk, "/tmp/never_written.json", specials=("[PAD]",))


def test_load_hf_wordlevel_merges_added_tokens(spark, tmp_path):
    """r11 review: specials registered ONLY in added_tokens (the
    tokenizer.add_special_tokens() serialization shape) must load; a
    contradictory id must raise, not silently pick a side."""
    import json

    art = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [
            {"id": 0, "content": "[UNK]", "special": True},
            {"id": 1, "content": "[PAD]", "special": True},
        ],
        "normalizer": None,
        "pre_tokenizer": {"type": "Whitespace"},
        "post_processor": None,
        "decoder": None,
        # model.vocab deliberately lacks the specials
        "model": {"type": "WordLevel", "vocab": {"hello": 2, "world": 3},
                  "unk_token": "[UNK]"},
    }
    p = str(tmp_path / "added_only.json")
    json.dump(art, open(p, "w"))
    vocab = {r["token"]: r["token_id"] for r in ts.load_hf_wordlevel(spark, p).collect()}
    assert vocab == {"[UNK]": 0, "[PAD]": 1, "hello": 2, "world": 3}

    art["added_tokens"][0]["id"] = 5  # contradicts nothing yet...
    art["model"]["vocab"]["[UNK]"] = 0  # ...now it does
    p2 = str(tmp_path / "conflict.json")
    json.dump(art, open(p2, "w"))
    with pytest.raises(ValueError, match="contradicts"):
        ts.load_hf_wordlevel(spark, p2)
