"""Tokenizer-dataflow known-answer tests (SURVEY §2.D / §5.2).

Mirrors the reference's implicit assertions: fixed frame lengths
(transformer_sample.py:544-546), specials ids (:402-404), unknown→[UNK]
(:498-499), too-long guard (:510-511), 90/10 split (:431-433).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_spark.operators import textops


@pytest.fixture()
def tiny_docs(spark):
    rows = [
        (0, "the cat sat"),
        (1, "the cat ran"),
        (2, "a dog sat"),
        (3, "unique words only here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_build_ordering_and_specials(tiny_docs):
    vocab = {r["token"]: (r["cnt"], r["token_id"]) for r in textops.build_vocab(tiny_docs).collect()}
    # min_frequency=2 drops singletons (transformer_sample.py:402-404)
    assert set(vocab) == {"the", "cat", "sat"}
    # ids ordered by (count DESC, token ASC) starting after specials 0-3
    assert vocab["cat"] == (2, 4)  # 'cat' < 'sat' < 'the' at count 2... ordered below
    # counts: the=2, cat=2, sat=2 → alphabetical: cat=4, sat=5, the=6
    assert vocab == {"cat": (2, 4), "sat": (2, 5), "the": (2, 6)}


def test_encode_unknown_is_zero_and_decode_roundtrip(tiny_docs):
    vocab = textops.build_vocab(tiny_docs)
    enc = textops.encode(tiny_docs, vocab)
    ids = {r["doc_id"]: r["ids"] for r in enc.collect()}
    assert ids[0] == [6, 4, 5]      # the cat sat
    assert ids[2] == [0, 0, 5]      # a, dog unknown → [UNK]=0
    dec = {r["doc_id"]: r["decoded"] for r in textops.decode(enc, vocab).collect()}
    assert dec[0] == "the cat sat"  # encode∘decode == identity on in-vocab
    assert dec[2] == "[UNK] [UNK] sat"


def test_pad_frame_exact_length_and_mask(tiny_docs):
    vocab = textops.build_vocab(tiny_docs)
    framed = textops.pad_frame(textops.encode(tiny_docs, vocab), seq_len=8)
    rows = {r["doc_id"]: r["framed"] for r in framed.collect()}
    # SOS/EOS framing + PAD fill to exactly seq_len (transformer_sample.py:544-546)
    assert rows[0] == [2, 6, 4, 5, 3, 1, 1, 1]
    assert all(len(v) == 8 for v in rows.values())
    masked = {r["doc_id"]: r["mask"] for r in textops.pad_mask(framed).collect()}
    assert masked[0] == [1, 1, 1, 1, 1, 0, 0, 0]


def test_too_long_guard_filters(spark):
    docs = spark.createDataFrame(
        [(0, "one two"), (1, " ".join(["w"] * 50))], "doc_id long, text string"
    )
    vocab = textops.build_vocab(docs)
    framed = textops.pad_frame(textops.encode(docs, vocab), seq_len=10)
    # 50-token doc exceeds seq_len-2 → filtered, not raised (engine policy for
    # the reference's ValueError at transformer_sample.py:510-511)
    assert [r["doc_id"] for r in framed.collect()] == [0]


def test_hash_split_is_deterministic_and_roughly_90_10(spark):
    docs = spark.range(1000).withColumnRenamed("id", "doc_id")
    split1 = {r["doc_id"]: r["split"] for r in textops.hash_split(docs).collect()}
    split2 = {r["doc_id"]: r["split"] for r in textops.hash_split(docs).collect()}
    assert split1 == split2
    n_train = sum(1 for v in split1.values() if v == "train")
    assert 850 <= n_train <= 950


def test_parse_instruction(spark):
    df = spark.createDataFrame(
        [(0, "[INST] translate this [/INST] la traduzione")], "doc_id long, inst_text string"
    )
    r = textops.parse_instruction(df).collect()[0]
    assert r["instruction"] == "translate this"
    assert r["response"] == "la traduzione"


def test_chunk_text_overlap(spark):
    from vector_database_spark.operators.textops import chunk_text

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(35))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = chunk_text(docs, size=20, stride=15).orderBy("doc_id", "chunk_id").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 35 tokens → starts 0, 15, 30 → chunks of 20, 20, 5
    assert [r["n_chunk_tokens"] for r in by_doc[1]] == [20, 20, 5]
    # overlap: chunk 1 starts at token 15, so its first 5 tokens repeat
    c0 = by_doc[1][0]["chunk_text"].split()
    c1 = by_doc[1][1]["chunk_text"].split()
    assert c0[15:] == c1[:5]
    # short doc → one chunk; empty text → split('') yields [''] → one chunk
    assert [r["n_chunk_tokens"] for r in by_doc[2]] == [2]
    assert len(by_doc[3]) == 1


def test_pack_sequences_bins(spark):
    from vector_database_spark.operators.textops import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * 50)) for i in range(10)],  # 10 docs x 50 tokens
        "doc_id long, text string",
    )
    # n_shards=1 → the classic global id-ordered pack
    rows = pack_sequences(docs, seq_len=128, n_shards=1).collect()
    # offsets 0,50,...,450; bin = floor(offset/128) → bins 0(3),1(3),2(2),3(2)
    assert [(r["bin_id"], r["n_docs"], r["sum_tokens"]) for r in rows] == [
        (0, 3, 150), (1, 3, 150), (2, 2, 100), (3, 2, 100),
    ]


def test_pack_sequences_sharded(spark):
    """Default sharded pack: per-shard offsets match a Python twin of the
    portable shard hash + id-ordered cumulative pack within each shard."""
    import hashlib

    from vector_database_spark.operators.textops import (
        N_PACK_SHARDS,
        PACK_SHARD_SEED,
        pack_sequences,
    )

    n_tok = {i: 30 + 7 * (i % 5) for i in range(20)}
    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * n_tok[i])) for i in range(20)],
        "doc_id long, text string",
    )

    def shard_of(i):
        h = int(hashlib.md5(f"{PACK_SHARD_SEED}:{i}".encode()).hexdigest()[:15], 16)
        return h % N_PACK_SHARDS

    expected = {}
    for s in range(N_PACK_SHARDS):
        off = 0
        for i in sorted(i for i in n_tok if shard_of(i) == s):
            b = off // 128
            n_docs, sum_t = expected.get((s, b), (0, 0))
            expected[(s, b)] = (n_docs + 1, sum_t + n_tok[i])
            off += n_tok[i]
    got = {
        (r["shard"], r["bin_id"]): (r["n_docs"], r["sum_tokens"])
        for r in pack_sequences(docs, seq_len=128).collect()
    }
    assert got == expected


def test_tfidf_known_answer(spark):
    import math

    from vector_database_spark.operators.textanalysis import tfidf

    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "x z")], "doc_id long, text string"
    )
    got = {(r["doc_id"], r["token"]): (r["tf"], r["tfidf"]) for r in tfidf(docs).collect()}
    # x appears in both docs → idf = ln(2/2) = 0
    assert got[(1, "x")] == (2, 0.0) and got[(2, "x")] == (1, 0.0)
    assert got[(1, "y")] == (1, round(math.log(2.0), 6))
    assert got[(2, "z")] == (1, round(math.log(2.0), 6))


def test_bm25_ranks_tf_and_rarity(spark):
    from vector_database_spark.operators.textanalysis import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark pad pad pad pad pad"),
            (2, "spark pad pad pad pad pad pad pad"),
            (3, "pad pad pad pad pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_search(docs, ["spark"], k=3).collect()
    # only docs containing the term score; higher tf ranks first
    assert [r["doc_id"] for r in rows] == [1, 2]
    assert rows[0]["score"] > rows[1]["score"] > 0


# ---------------------------------------------------------------------------
# BPE merge learning vs a from-scratch reference implementation
# ---------------------------------------------------------------------------


def _ref_bpe(word_counts: dict[str, int], n_merges: int, min_pair_count: int = 2):
    """Sennrich et al. 2016 reference: pair counting over word types,
    greedy non-overlapping left-to-right merge, (count DESC, left ASC,
    right ASC) argmax — the exact contract bpe_learn declares."""
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] = pc.get((sym[i], sym[i + 1]), 0) + c
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_pair_count:
            break
        merges.append((rank, left, right, left + right, cnt))
        out = {}
        for sym, c in vocab.items():
            ns: list[str] = []
            for x in sym:
                if ns and ns[-1] == left and x == right:
                    ns[-1] = left + right
                else:
                    ns.append(x)
            out[tuple(ns)] = out.get(tuple(ns), 0) + c
        vocab = out
    return merges


def _word_counts(duck):
    import re

    rows = duck.sql("SELECT text FROM documents").fetchall()
    wc: dict[str, int] = {}
    for (text,) in rows:
        for t in re.split(r"\s+", text.lower()):
            if t:
                wc[t] = wc.get(t, 0) + 1
    return wc


def test_bpe_learn_matches_reference(spark, duck):
    from tests.conftest import SF_SMALL
    from vector_database_spark.sources.tables import read_table

    docs = read_table(spark, SF_SMALL, "documents")
    got = textops.bpe_learn(docs, n_merges=12)
    want = _ref_bpe(_word_counts(duck), 12)
    assert got == want


def test_bpe_incremental_trainer_matches_distributed_and_reference(spark, duck):
    """operators/bpe.py::learn_bpe (compressed-dict driver trainer, the
    large-vocabulary path) must produce the IDENTICAL merge sequence to
    textops.bpe_learn (per-round distributed) and the from-scratch
    reference — same corpus, same determinism contract."""
    from tests.conftest import SF_SMALL
    from vector_database_spark.operators import bpe
    from vector_database_spark.sources.tables import read_table

    docs = read_table(spark, SF_SMALL, "documents")
    inc = bpe.learn_bpe(docs, n_merges=12)
    assert inc == textops.bpe_learn(docs, n_merges=12)
    assert inc == _ref_bpe(_word_counts(duck), 12)


def test_bpe_incremental_deep_merges_match_reference(duck):
    """The 48-merge regime (multi-char symbols dominate the pair table)
    — exercises the incremental count maintenance far past where the
    in-plan trainer is run; pure driver code, no Spark session."""
    from vector_database_spark.operators import bpe

    wc = _word_counts(duck)
    assert bpe.train_bpe_from_freq(list(wc.items()), 48) == _ref_bpe(wc, 48)


def test_bpe_incremental_randomized_vs_reference():
    """Small-alphabet random dicts stress repeat-pair words ('aaaa' —
    overlap counting and same-pass merge adjacency) and early-stop; the
    incremental trainer must equal the from-scratch recount at every
    depth, in any dict order."""
    import random

    from vector_database_spark.operators import bpe

    rng = random.Random(1234)
    for trial in range(8):
        wc = {
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6))): rng.randint(1, 9)
            for _ in range(rng.randint(3, 40))
        }
        n = rng.randint(1, 30)
        got = bpe.train_bpe_from_freq(list(wc.items()), n)
        want = _ref_bpe(wc, n)
        assert got == want, (trial, wc, n)
        # dict-order independence: reversed insertion, same sequence
        rev = bpe.train_bpe_from_freq(list(reversed(list(wc.items()))), n)
        assert rev == want, (trial, "reversed", n)


def test_bpe_encode_greedy_equals_ordered(spark):
    """strategy='greedy' (rank-greedy, depth-independent — the deep-table
    path) must segment identically to the ordered merge replay on a
    sequentially-trained table: a learned pair over a merged symbol
    always ranks after the merges that formed it, so lowest-rank-first
    replays the training order. Checked on the corpus AND on randomized
    small-alphabet tables (repeat-pair words stress the all-occurrence
    left-to-right pass)."""
    import random

    from tests.conftest import SF_SMALL
    from vector_database_spark.operators import bpe
    from vector_database_spark.sources.tables import read_table

    docs = read_table(spark, SF_SMALL, "documents").filter(F.col("doc_id") < 60)
    merges = textops.bpe_learn(docs, n_merges=12)
    a = {
        r["doc_id"]: r["subwords"]
        for r in textops.bpe_encode(docs, merges).collect()
    }
    b = {
        r["doc_id"]: r["subwords"]
        for r in textops.bpe_encode(docs, merges, strategy="greedy").collect()
    }
    assert a == b

    # randomized trained tables, driver-side application equivalence
    rng = random.Random(99)
    for trial in range(6):
        wc = {
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 7))): rng.randint(1, 9)
            for _ in range(rng.randint(3, 30))
        }
        table = bpe.train_bpe_from_freq(list(wc.items()), rng.randint(1, 25))
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(wc)], "doc_id long, text string"
        )
        x = {r["doc_id"]: r["subwords"] for r in textops.bpe_encode(df, table).collect()}
        y = {
            r["doc_id"]: r["subwords"]
            for r in textops.bpe_encode(df, table, strategy="greedy").collect()
        }
        assert x == y, (trial, wc, table)


def test_bpe_incremental_max_words_cap(spark):
    """max_words keeps the most frequent words (count DESC, word ASC
    tie-break) — the capped dict trains deterministically and equals the
    reference trained on the same truncated dict."""
    from vector_database_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "low low low low low lowest lowest newer newer wider")],
        "doc_id long, text string",
    )
    stats = {}
    with pytest.warns(UserWarning, match=r"dropped the 2 least frequent"):
        merges = bpe.learn_bpe(docs, n_merges=3, max_words=2, stats=stats)
    # top-2: low(5), lowest(2) ('lowest' < 'newer' breaks the count tie)
    assert merges == _ref_bpe({"low": 5, "lowest": 2}, 3)
    # the cap is not silent (no-silent-caps rule): exact counts surface
    assert stats == {
        "word_types_total": 4,
        "word_types_kept": 2,
        "word_types_dropped": 2,
    }
    # an uncapped run neither warns nor reports drops
    import warnings as _warnings

    stats2 = {}
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        bpe.learn_bpe(docs, n_merges=1, stats=stats2)
    assert stats2["word_types_dropped"] == 0
    assert stats2["word_types_total"] == stats2["word_types_kept"] == 4


def test_bpe_learn_known_answer(spark):
    # 'low' x5, 'lowest' x2: first merges are driven by the shared prefix
    docs = spark.createDataFrame(
        [(1, "low low low low low lowest lowest")], "doc_id long, text string"
    )
    merges = textops.bpe_learn(docs, n_merges=3)
    # l+o appears in all 7 word instances; then lo+w in all 7
    assert merges[0][1:] == ("l", "o", "lo", 7)
    assert merges[1][1:] == ("lo", "w", "low", 7)


def test_bpe_encode_matches_reference_and_roundtrips(spark, duck):
    from tests.conftest import SF_SMALL
    from vector_database_spark.sources.tables import read_table

    docs = read_table(spark, SF_SMALL, "documents").limit(40)
    merges = textops.bpe_learn(docs, n_merges=10)
    enc = {r["doc_id"]: r["subwords"] for r in textops.bpe_encode(docs, merges).collect()}

    ranked = [(l, r, m) for _, l, r, m, _ in merges]

    def ref_encode_word(w):
        sym = list(w) + ["</w>"]
        for left, right, merged in ranked:
            out = []
            for x in sym:
                if out and out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            sym = out
        return sym

    import re

    for row in docs.select("doc_id", "text").collect():
        words = [t for t in re.split(r"\s+", row["text"].lower()) if t]
        want = [p for w in words for p in ref_encode_word(w)]
        assert enc[row["doc_id"]] == want, row["doc_id"]
        # lossless: stripping </w> and re-joining recovers the token stream
        joined = "".join(enc[row["doc_id"]]).replace("</w>", " ").strip()
        assert joined == " ".join(words)


def test_bpe_encode_join_fallback_matches_broadcast(spark):
    # broadcast_types_max=0 forces the shuffle/join strategy; both
    # physical paths must produce identical subword sequences
    docs = spark.createDataFrame(
        [(1, "low lower lowest low"), (2, "newer newest new")],
        "doc_id long, text string",
    )
    merges = textops.bpe_learn(docs, n_merges=6)
    a = {r["doc_id"]: r["subwords"] for r in textops.bpe_encode(docs, merges).collect()}
    b = {
        r["doc_id"]: r["subwords"]
        for r in textops.bpe_encode(docs, merges, broadcast_types_max=0).collect()
    }
    assert a == b


def test_bpe_encode_tokenless_docs_consistent_across_strategies(spark):
    # empty / whitespace-only / null text: both physical strategies must
    # emit an empty-subword row, not drop or crash
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    merges = textops.bpe_learn(docs, n_merges=2)
    for kwargs in ({}, {"broadcast_types_max": 0}):
        rows = {r["doc_id"]: r for r in textops.bpe_encode(docs, merges, **kwargs).collect()}
        assert set(rows) == {1, 2, 3, 4}, kwargs
        for d in (2, 3, 4):
            assert rows[d]["subwords"] == [] and rows[d]["n_subwords"] == 0, (d, kwargs)
        assert rows[1]["n_subwords"] > 0
