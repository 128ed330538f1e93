"""Unigram-LM tokenizer tests (operators/unigram_lm.py; Kudo 2018).

Verification strategy mirrors the BPE pair: kernel-level known answers
(expected counts vs brute-force segmentation enumeration), algorithmic
invariants (EM monotone likelihood, coverage floor, prune semantics),
end-to-end determinism under re-partitioning, and encode round-trips.
Training is iterative → rows-only at the driver gate; the seed
statistics carry the FULL oracle (q_unigram_seed_vocab, swept in
tests/test_oracle_parity.py like every other oracled query).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_database_spark.operators import unigram_lm as ug


@pytest.fixture()
def tiny_docs(spark):
    rows = [
        (0, "aba abba aba cab"),
        (1, "abba aba bac cab"),
        (2, "cab aba abba abc"),
        (3, "bbb aaa aba abba"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _enumerate_segmentations(word, pieces, max_len):
    """All segmentations of word into pieces (brute force)."""
    if word == "":
        return [[]]
    out = []
    for l in range(1, min(max_len, len(word)) + 1):
        head = word[:l]
        if head in pieces:
            for rest in _enumerate_segmentations(word[l:], pieces, max_len):
                out.append([head] + rest)
    return out


def test_expected_counts_match_enumeration():
    """Forward-backward expected counts == direct posterior-weighted
    enumeration over ALL segmentations, for every piece."""
    lp = {
        "a": math.log(0.3),
        "b": math.log(0.2),
        "ab": math.log(0.25),
        "ba": math.log(0.15),
        "aba": math.log(0.1),
    }
    word, cnt, max_len = "ababa", 7, 3
    contrib, ll_micro = ug._fb_word(word, cnt, lp, max_len)

    segs = _enumerate_segmentations(word, set(lp), max_len)
    probs = [math.exp(sum(lp[p] for p in s)) for s in segs]
    z = sum(probs)
    assert ll_micro == round(math.log(z) * cnt * 1_000_000)
    for piece in lp:
        expected = (
            sum(pr * s.count(piece) for s, pr in zip(segs, probs)) / z * cnt
        )
        got = contrib.get(piece, 0) / ug._NANO
        # per-occurrence nano quantization → within a few nanos
        assert abs(got - expected) < 1e-6, piece


def test_viterbi_is_argmax_of_enumeration():
    lp = {
        "a": math.log(0.35),
        "b": math.log(0.25),
        "ab": math.log(0.2),
        "bb": math.log(0.2),
    }
    for word in ("abab", "abbb", "aabb", "babab"):
        segs = _enumerate_segmentations(word, set(lp), 2)
        best = max(segs, key=lambda s: sum(lp[p] for p in s))
        got, score = ug._viterbi(word, lp, 2)
        assert math.isclose(score, sum(lp[p] for p in best))
        assert math.isclose(sum(lp[p] for p in got), score)
    assert ug._viterbi("axb", lp, 2) == (None, ug.NEG_INF)


def test_em_monotone_likelihood(tiny_docs):
    """Corpus log-likelihood is non-decreasing across EM iterations
    (the EM guarantee; quantization slack 1e-3 in log space)."""
    from vector_database_spark.operators.textops import word_freq

    wf = word_freq(tiny_docs).persist()
    try:
        pieces, logp = ug._seed_from_wf(wf, 24, 3)
        lls = []
        for _ in range(4):
            counts, ll = ug._em_pass(wf, pieces, logp, 3)
            lls.append(ll / ug._MICRO)
            pieces, logp = ug._m_step(pieces, counts)
        for prev, cur in zip(lls, lls[1:]):
            assert cur >= prev - 1e-3, lls
    finally:
        wf.unpersist()


def test_m_step_drops_dead_multichar_keeps_singles():
    pieces = ["a", "b", "ab", "ba"]
    counts = [5 * ug._NANO, 0, 3 * ug._NANO, 0]
    kept, logp = ug._m_step(pieces, counts)
    assert kept == ["a", "b", "ab"]  # 'ba' dead → dropped; 'b' floored
    probs = [math.exp(v) for v in logp]
    assert math.isclose(sum(probs), 1.0, rel_tol=1e-9)


def test_train_coverage_floor_and_target(tiny_docs):
    model = ug.train_unigram(
        tiny_docs, vocab_size=6, max_piece_len=3, seed_size=40
    )
    pieces = [p for p, _ in model]
    # every corpus character survives (coverage floor)
    assert {"a", "b", "c"} <= set(pieces)
    assert len(pieces) <= max(6, 3)
    # probabilities normalize (post-EM fixpoint)
    assert math.isclose(sum(math.exp(v) for _, v in model), 1.0, rel_tol=1e-6)
    # sorted-by-piece contract
    assert pieces == sorted(pieces)


def test_train_deterministic_under_repartition(spark, tiny_docs):
    m1 = ug.train_unigram(tiny_docs, vocab_size=8, max_piece_len=3)
    m2 = ug.train_unigram(
        tiny_docs.repartition(7), vocab_size=8, max_piece_len=3
    )
    assert [p for p, _ in m1] == [p for p, _ in m2]
    # bit-identical logprobs — the integer-nanos contract
    assert m1 == m2


def test_encode_roundtrip_and_oov(spark, tiny_docs):
    model = ug.train_unigram(tiny_docs, vocab_size=8, max_piece_len=3)
    enc = ug.unigram_encode(tiny_docs, model)
    rows = {r["doc_id"]: r for r in enc.collect()}
    texts = {r["doc_id"]: r["text"] for r in tiny_docs.collect()}
    for did, r in rows.items():
        assert r["n_pieces"] == len(r["pieces"])
        assert "".join(r["pieces"]) == "".join(texts[did].lower().split())
    # OOV characters pass through as single-char pieces
    oov = spark.createDataFrame([(9, "abz zq")], "doc_id long, text string")
    r = ug.unigram_encode(oov, model).collect()[0]
    assert "".join(r["pieces"]) == "abzzq"
    assert "z" in r["pieces"] and "q" in r["pieces"]


def test_sample_encode_roundtrip_determinism_and_sharpening(spark, tiny_docs):
    model = ug.train_unigram(tiny_docs, vocab_size=8, max_piece_len=3)
    s1 = ug.unigram_sample_encode(tiny_docs, model, alpha=0.5, seed=7)
    s2 = ug.unigram_sample_encode(
        tiny_docs.repartition(5), model, alpha=0.5, seed=7
    )
    r1 = {r["doc_id"]: list(r["pieces"]) for r in s1.collect()}
    r2 = {r["doc_id"]: list(r["pieces"]) for r in s2.collect()}
    assert r1 == r2  # seed-deterministic, partitioning-independent
    texts = {r["doc_id"]: r["text"] for r in tiny_docs.collect()}
    for did, pieces in r1.items():
        assert "".join(pieces) == "".join(texts[did].lower().split())
    # a different seed must change at least one sampled segmentation
    r3 = {
        r["doc_id"]: list(r["pieces"])
        for r in ug.unigram_sample_encode(
            tiny_docs, model, alpha=0.5, seed=8
        ).collect()
    }
    assert r3 != r1
    # alpha -> large sharpens to the Viterbi path (== unigram_encode)
    hard = {
        r["doc_id"]: list(r["pieces"])
        for r in ug.unigram_sample_encode(
            tiny_docs, model, alpha=100.0, seed=7
        ).collect()
    }
    vit = {
        r["doc_id"]: list(r["pieces"])
        for r in ug.unigram_encode(tiny_docs, model).collect()
    }
    assert hard == vit


def test_sample_encode_unicode_ws_matches_viterbi_tokenization(spark, tiny_docs):
    """U+00A0 is whitespace to Python str.split() but NOT to the
    engine's Java \\s+ tokenizer — both encoders must agree (sampled
    encoding tokenizes Spark-side through the same tokenize_ws), and
    the non-breaking space must survive as an OOV piece, not vanish."""
    model = ug.train_unigram(tiny_docs, vocab_size=8, max_piece_len=3)
    docs = spark.createDataFrame(
        [(0, "aba cab ab")], "doc_id long, text string"
    )
    sam = ug.unigram_sample_encode(docs, model, alpha=100.0, seed=1).collect()[0]
    vit = ug.unigram_encode(docs, model).collect()[0]
    assert list(sam["pieces"]) == list(vit["pieces"])
    assert "".join(sam["pieces"]) == "aba cabab"
    assert " " in sam["pieces"]
    # negative ids must seed cleanly (SeedSequence masking)
    neg = spark.createDataFrame([(-5, "aba cab")], "doc_id long, text string")
    r = ug.unigram_sample_encode(neg, model, alpha=0.5, seed=1).collect()[0]
    assert "".join(r["pieces"]) == "abacab"


def test_ffbs_samples_posterior():
    """At alpha=1 the FFBS empirical segmentation frequencies match the
    true posterior over all segmentations (chi-square-loose check)."""
    import numpy as np

    lp = {
        "a": math.log(0.4),
        "b": math.log(0.3),
        "ab": math.log(0.2),
        "ba": math.log(0.1),
    }
    word, max_len, n_draws = "aba", 2, 4000
    segs = _enumerate_segmentations(word, set(lp), max_len)
    probs = [math.exp(sum(lp[p] for p in s)) for s in segs]
    z = sum(probs)
    rng = np.random.default_rng(123)
    counts = {tuple(s): 0 for s in segs}
    for _ in range(n_draws):
        # alpha=1: the pre-scaled dict IS the log-prob dict
        counts[tuple(ug._ffbs_word(word, lp, max_len, rng))] += 1
    for s, pr in zip(segs, probs):
        expect = pr / z
        got = counts[tuple(s)] / n_draws
        assert abs(got - expect) < 0.04, (s, got, expect)


def test_em_pass_survives_int64_overflow_counts(spark):
    """Word frequencies large enough that integer-nanos expected counts
    exceed int64 (~9.2e9 occurrences) must aggregate exactly — the pass
    travels as DECIMAL(38,0), not BIGINT."""
    big = 20_000_000_000  # 2e10 · 1e9 nanos ≈ 2e19 > 2^63-1
    wf = spark.createDataFrame(
        [("ab", big), ("b", 3)], "word string, cnt long"
    )
    pieces = ["a", "ab", "b"]
    logp = [math.log(0.3), math.log(0.4), math.log(0.3)]
    counts, ll = ug._em_pass(wf, pieces, logp, 2)
    assert counts[1] > 2**63  # 'ab' used by most of the 2e10 mass
    assert sum(counts) > 0 and ll < 0
    # M-step digests the unbounded ints fine
    kept, new_logp = ug._m_step(pieces, counts)
    assert math.isclose(
        sum(math.exp(v) for v in new_logp), 1.0, rel_tol=1e-9
    )


def test_kernels_match_enumeration_randomized():
    """Property test over random vocabularies and words: the
    forward-backward expected counts and Viterbi score both agree with
    brute-force enumeration of every segmentation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = "ab"

    @settings(max_examples=150, deadline=None)
    @given(
        word=st.text(alphabet=alphabet, min_size=1, max_size=7),
        extra=st.lists(
            st.text(alphabet=alphabet, min_size=2, max_size=3),
            max_size=4,
            unique=True,
        ),
        data=st.data(),
    )
    def check(word, extra, data):
        pieces = sorted(set(alphabet) | set(extra))
        raw = [
            data.draw(st.floats(min_value=0.05, max_value=1.0))
            for _ in pieces
        ]
        z0 = sum(raw)
        lp = {p: math.log(r / z0) for p, r in zip(pieces, raw)}
        max_len = max(len(p) for p in pieces)

        segs = _enumerate_segmentations(word, set(lp), max_len)
        probs = [math.exp(sum(lp[p] for p in s)) for s in segs]
        z = sum(probs)

        contrib, ll = ug._fb_word(word, 3, lp, max_len)
        assert ll == round(math.log(z) * 3 * ug._MICRO)
        for piece in lp:
            expect = sum(pr * s.count(piece) for s, pr in zip(segs, probs)) / z * 3
            assert abs(contrib.get(piece, 0) / ug._NANO - expect) < 1e-6

        best = max(probs)
        _, score = ug._viterbi(word, lp, max_len)
        assert math.isclose(math.exp(score), best, rel_tol=1e-9)

    check()


def test_fertility_invariants(spark):
    """q_unigram_fertility: pieces segment words (never merge across
    them) so fertility >= 1; pieces cover exactly the non-space chars
    so chars/piece <= max piece length."""
    from vector_database_spark.queries import q_unigram_fertility

    from tests.conftest import SF_SMALL

    rows = q_unigram_fertility(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["fertility_micro"] >= 1_000_000
        assert 1_000_000 <= r["chars_per_piece_micro"] <= 6_000_000
        assert r["pieces"] >= r["words"] > 0


def test_seed_pieces_counts(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab b")], "doc_id long, text string"
    )
    got = {
        r["piece"]: r["piece_cnt"]
        for r in ug.seed_pieces(docs, max_piece_len=2).collect()
    }
    # 'ab' x2 words: a=2, b=2(from ab)+1(solo b)=3, ab=2
    assert got == {"a": 2, "b": 3, "ab": 2}


def test_prune_keeps_high_loss_pieces(tiny_docs):
    """The prune drops the multi-char piece whose removal costs the
    least corpus likelihood, never a single character."""
    from vector_database_spark.operators.textops import word_freq

    wf = word_freq(tiny_docs).persist()
    try:
        pieces, logp = ug._seed_from_wf(wf, 24, 3)
        for _ in range(2):
            counts, _ = ug._em_pass(wf, pieces, logp, 3)
            pieces, logp = ug._m_step(pieces, counts)
        n_singles = sum(1 for p in pieces if len(p) == 1)
        keep_n = n_singles + 2
        kept, _ = ug._prune(wf, pieces, logp, keep_n, 3)
        assert len(kept) <= keep_n
        assert {p for p in pieces if len(p) == 1} <= set(kept)
        # kept multi-char pieces actually appear in the corpus ('aba'
        # and 'abba' dominate the fixture)
        for p in kept:
            if len(p) > 1:
                assert p in "abaabbacababcbbbaaa"
    finally:
        wf.unpersist()


def test_train_unigram_empty_corpus_raises_clearly(spark):
    """An empty or whitespace-only corpus raises a clear ValueError, not
    an obscure 'math domain error' from log(0) in the seed step."""
    for rows in ([], [(0, ""), (1, "   \t  ")]):
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        with pytest.raises(ValueError, match="empty corpus"):
            ug.train_unigram(docs, vocab_size=8)


def test_sample_encode_preserves_id_column_type(spark):
    """unigram_sample_encode round-trips a NON-long id column (string
    ids) — the mapInPandas schema derives from the input, and the
    occurrence RNG seeds through a stable digest, so determinism holds
    under any partitioning."""
    model = [("a", -0.5), ("b", -1.0), ("ab", -0.7)]
    docs = spark.createDataFrame(
        [("doc-x", "ab ab"), ("doc-y", "ba")], "doc_id string, text string"
    )
    out = ug.unigram_sample_encode(docs, model, alpha=0.5, seed=3)
    assert dict(out.dtypes)["doc_id"] == "string"
    got = {r["doc_id"]: r["pieces"] for r in out.collect()}
    assert set(got) == {"doc-x", "doc-y"}
    for pieces in got.values():
        assert all(p in {"a", "b", "ab"} for p in pieces)
    # deterministic for a fixed seed regardless of partitioning
    again = {
        r["doc_id"]: r["pieces"]
        for r in ug.unigram_sample_encode(
            docs.repartition(7), model, alpha=0.5, seed=3
        ).collect()
    }
    assert got == again
    # and round-trips: concat(pieces) rebuilds the non-space chars
    assert "".join(got["doc-x"]) == "abab"
    assert "".join(got["doc-y"]) == "ba"
