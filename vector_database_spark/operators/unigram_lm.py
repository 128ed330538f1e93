"""Unigram-LM subword tokenizer — training (EM + prune) and Viterbi
encoding, the SentencePiece algorithm (Kudo 2018, "Subword
Regularization", §3; Kudo & Richardson 2018). Complements the BPE pair
(operators/textops.py::bpe_learn, operators/bpe.py::learn_bpe): BPE
grows a vocabulary bottom-up by merging; the unigram LM starts from an
over-complete seed and PRUNES it down by likelihood loss, which is what
production multilingual tokenizers (T5, mT5, XLNet, ALBERT) train with.

Scale shape (the part that matters at 100 TB):

* the corpus is touched ONCE — the shared word-frequency pass
  (textops.word_freq, map-side combined; same input contract as both
  BPE trainers, so a tokenization change hits all three or none);
* every EM E-step and every prune's Viterbi-usage pass is ONE
  distributed job over the WORD-TYPE table (mapInPandas with the
  vocab broadcast — the vocabulary is 10^4..10^6 entries at any corpus
  size, always broadcastable), reduced by a map-side-combined integer
  sum. The driver only ever holds vocab-sized statistics; the word-type
  table never leaves the cluster. Total cluster work for a full train:
  1 corpus pass + O(rounds) type-table passes, rounds ~ log_shrink
  (seed/target) · em_iters ≈ 10-15.

Determinism contract (FIXTURES.md rules 6-9 applied to EM): per-word
forward-backward runs in float64 with a FIXED iteration order, its
freq-weighted expected counts are quantized to integer NANOS per
(word, occurrence) before any aggregation, and all cross-partition /
cross-word reduction is exact integer addition — so the learned vocab
and every logprob are bit-identical regardless of partitioning, batch
boundaries, or hash order. Per-word log-likelihoods aggregate the same
way in integer MICROS. Training is iterative (each round's statistics
depend on the previous round's probabilities), hence rows-only for the
driver gate; the seed statistics are relational and carry a FULL DuckDB
oracle (queries.py::q_unigram_seed_vocab).

Reference parity: the reference trains/uses tokenizers only through its
torch scripts (transformer_sample.py:388-433 builds a word vocab;
no subword trainer exists there) — this module is part of the
beyond-reference training-data pipeline surface, same as the BPE
trainers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_spark.operators.textops import (
    _apply_word_encoder,
    word_freq,
)

NEG_INF = float("-inf")
_NANO = 1_000_000_000  # expected-count quantum (integer sums → determinism)
_MICRO = 1_000_000  # log-likelihood quantum
# sub-EM iterations per prune round and the per-round keep fraction —
# SentencePiece's defaults (trainer_interface: 2 sub-iterations, 25%
# shrink per round)
DEFAULT_EM_ITERS = 2
DEFAULT_SHRINK = 0.75
DEFAULT_MAX_PIECE_LEN = 6


# ---------------------------------------------------------------------------
# per-word kernels (pure, module-level so Spark pickles them cleanly)
# ---------------------------------------------------------------------------


def _logadd(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    if b == NEG_INF:
        return a
    return a + math.log1p(math.exp(b - a))


def _forward(word: str, lp: dict, max_len: int) -> list[float]:
    """alpha[i] = log-sum over all segmentations of word[:i]."""
    n = len(word)
    alpha = [NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = NEG_INF
        for l in range(1, min(max_len, i) + 1):
            a = alpha[i - l]
            if a == NEG_INF:
                continue
            v = lp.get(word[i - l : i])
            if v is None:
                continue
            acc = _logadd(acc, a + v)
        alpha[i] = acc
    return alpha


def _backward(word: str, lp: dict, max_len: int) -> list[float]:
    """beta[i] = log-sum over all segmentations of word[i:]."""
    n = len(word)
    beta = [NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = NEG_INF
        for l in range(1, min(max_len, n - i) + 1):
            b = beta[i + l]
            if b == NEG_INF:
                continue
            v = lp.get(word[i : i + l])
            if v is None:
                continue
            acc = _logadd(acc, b + v)
        beta[i] = acc
    return beta


def _fb_word(word: str, cnt: int, lp: dict, max_len: int):
    """Forward-backward expected piece counts for one word type.

    Returns ``(contrib, ll)`` where ``contrib`` maps piece -> expected
    occurrence count × word frequency, quantized to integer nanos per
    occurrence-position (fixed iteration order → deterministic), and
    ``ll`` is the word's freq-weighted log-likelihood in integer micros.
    ``(None, 0)`` if the word has no segmentation under ``lp`` (cannot
    happen while every character stays in the vocab)."""
    n = len(word)
    alpha = _forward(word, lp, max_len)
    z = alpha[n]
    if z == NEG_INF:
        return None, 0
    beta = _backward(word, lp, max_len)
    contrib: dict[str, int] = {}
    for j in range(n):
        aj = alpha[j]
        if aj == NEG_INF:
            continue
        for l in range(1, min(max_len, n - j) + 1):
            piece = word[j : j + l]
            v = lp.get(piece)
            if v is None:
                continue
            bi = beta[j + l]
            if bi == NEG_INF:
                continue
            e = math.exp(aj + v + bi - z) * cnt
            nanos = int(round(e * _NANO))
            if nanos:
                contrib[piece] = contrib.get(piece, 0) + nanos
    return contrib, int(round(z * cnt * _MICRO))


def _viterbi(word: str, lp: dict, max_len: int):
    """Best segmentation of ``word`` under piece log-probs ``lp``.
    Returns ``(pieces, logprob)`` or ``(None, -inf)`` if unreachable.
    Ties break toward the SHORTEST last piece (strict > on a fixed
    l-ascending scan) — deterministic."""
    n = len(word)
    best = [NEG_INF] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        bs, bj = NEG_INF, -1
        for l in range(1, min(max_len, i) + 1):
            a = best[i - l]
            if a == NEG_INF:
                continue
            v = lp.get(word[i - l : i])
            if v is None:
                continue
            s = a + v
            if s > bs:
                bs, bj = s, i - l
        best[i] = bs
        back[i] = bj
    if best[n] == NEG_INF:
        return None, NEG_INF
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out, best[n]


# ---------------------------------------------------------------------------
# relational seed statistics (FULL oracle)
# ---------------------------------------------------------------------------


def candidate_pieces(
    wf: DataFrame, max_piece_len: int = 4, word_col: str = "word"
) -> DataFrame:
    """All substrings of length 1..``max_piece_len`` of the word-type
    table, weighted by word frequency — the unigram seed-vocabulary
    statistic (SentencePiece seeds from the most frequent substrings;
    Kudo 2018 §3.2). Pure relational plan: the explode runs on the
    DISTINCT-word table, the reduce is one map-side-combined groupBy.
    Output: (piece, piece_cnt) — integer counts only, FULL oracle
    (queries.py::q_unigram_seed_vocab)."""
    w = F.col(word_col)
    subs = wf.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.length(w)),
                        lambda i: F.transform(
                            F.sequence(F.lit(1), F.lit(max_piece_len)),
                            lambda l: F.when(
                                i + l - F.lit(1) <= F.length(w),
                                F.substring(w, i, l),
                            ),
                        ),
                    )
                ),
                lambda p: p.isNotNull(),
            )
        ).alias("piece"),
        F.col("cnt"),
    )
    return subs.groupBy("piece").agg(
        F.sum("cnt").cast("long").alias("piece_cnt")
    )


def seed_pieces(
    docs: DataFrame, text_col: str = "text", max_piece_len: int = 4
) -> DataFrame:
    """candidate_pieces over the corpus' word-frequency table."""
    return candidate_pieces(word_freq(docs, text_col), max_piece_len)


# ---------------------------------------------------------------------------
# distributed EM
# ---------------------------------------------------------------------------


def _type_table_pass(
    wf: DataFrame, pieces: list, logp: list, max_len: int, kernel
):
    """ONE distributed statistics pass over the word-type table — the
    plumbing both the E-step and the prune's Viterbi-usage pass share:
    mapInPandas applies ``kernel(word, cnt, lp, max_len) -> (dict
    piece -> int, int extra)`` per word type, combines partials inside
    the batch, emits one (piece_id, value) row per touched piece plus a
    pid=-1 row carrying the summed ``extra`` (the E-step's
    log-likelihood; 0 for usage), and a map-side-combined sum reduces
    them. Values travel as DECIMAL(38,0), not BIGINT: per-piece
    integer-nanos totals scale with corpus frequency and would overflow
    int64 around word counts of ~9.2e9 (well below the 100 TB design
    point) — decimal keeps the reduction exact to 38 digits and the
    driver converts back to unbounded Python ints. Returns
    (values: list[int] aligned with pieces, extra_total: int)."""
    from decimal import Decimal

    import pandas as pd

    spark = wf.sparkSession
    bc = spark.sparkContext.broadcast(
        (dict(zip(pieces, logp)), {p: i for i, p in enumerate(pieces)})
    )
    ml = int(max_len)

    def gen(batches):
        lp, pid = bc.value
        acc: dict[int, int] = {}
        extra = 0
        for pdf in batches:
            for w, c in zip(pdf["word"], pdf["cnt"]):
                contrib, e = kernel(w, int(c), lp, ml)
                if contrib is None:
                    continue
                extra += e
                for p, v in contrib.items():
                    i = pid[p]
                    acc[i] = acc.get(i, 0) + v
        yield pd.DataFrame(
            {
                "pid": list(acc.keys()) + [-1],
                "val": [Decimal(v) for v in acc.values()] + [Decimal(extra)],
            }
        )

    rows = (
        wf.mapInPandas(gen, "pid int, val decimal(38,0)")
        .groupBy("pid")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    values = [0] * len(pieces)
    extra_total = 0
    for r in rows:
        if r["pid"] < 0:
            extra_total = int(r["val"])
        else:
            values[r["pid"]] = int(r["val"])
    bc.unpersist()
    return values, extra_total


def _em_pass(wf: DataFrame, pieces: list, logp: list, max_len: int):
    """ONE distributed E-step: forward-backward expected counts (integer
    nanos) + corpus log-likelihood (integer micros). Returns
    (counts_nanos, loglik_micro)."""
    return _type_table_pass(wf, pieces, logp, max_len, _fb_word)


def _m_step(pieces: list, counts: list):
    """Renormalize expected counts into log-probs. Single characters are
    floored at 1 nano (coverage: every word must stay segmentable);
    multi-char pieces whose expected count hit exactly zero are dropped
    (p=0 is an EM fixpoint — they can never regain mass)."""
    keep_p: list[str] = []
    keep_c: list[int] = []
    for p, c in zip(pieces, counts):
        if len(p) == 1:
            keep_p.append(p)
            keep_c.append(max(int(c), 1))
        elif c > 0:
            keep_p.append(p)
            keep_c.append(int(c))
    log_total = math.log(sum(keep_c))
    return keep_p, [math.log(c) - log_total for c in keep_c]


def _usage_kernel(word: str, cnt: int, lp: dict, max_len: int):
    """Per-word kernel for the prune pass: freq-weighted Viterbi piece
    usage (exact integers; no extra slot)."""
    segs, _ = _viterbi(word, lp, max_len)
    if segs is None:
        return None, 0
    contrib: dict[str, int] = {}
    for p in segs:
        contrib[p] = contrib.get(p, 0) + cnt
    return contrib, 0


def _viterbi_usage(wf: DataFrame, pieces: list, logp: list, max_len: int):
    """Freq-weighted Viterbi piece-usage counts, one distributed job,
    same plumbing as the E-step (_type_table_pass)."""
    usage, _ = _type_table_pass(wf, pieces, logp, max_len, _usage_kernel)
    return usage


def _prune(wf: DataFrame, pieces: list, logp: list, keep_n: int, max_len: int):
    """Drop the lowest-value multi-char pieces down to ``keep_n`` total.
    Value = Viterbi usage × (own logprob − best alternative segmentation
    of the piece's own string without it) — the likelihood the corpus
    loses if the piece's occurrences re-segment (Kudo 2018 §3.2 prune
    step). Single characters are never pruned; zero-usage multi-char
    pieces drop for free. Ties break (loss DESC, piece ASC) —
    deterministic."""
    usage = _viterbi_usage(wf, pieces, logp, max_len)
    lp = dict(zip(pieces, logp))
    singles = [(p, v) for p, v in zip(pieces, logp) if len(p) == 1]
    cands: list[tuple[float, str, float]] = []
    for p, v, u in zip(pieces, logp, usage):
        if len(p) == 1 or u == 0:
            continue
        del lp[p]
        _, alt = _viterbi(p, lp, max_len)
        lp[p] = v
        cands.append((u * (v - alt), p, v))
    cands.sort(key=lambda t: (-t[0], t[1]))
    n_multi = max(0, keep_n - len(singles))
    kept = singles + [(p, v) for _, p, v in cands[:n_multi]]
    kept.sort(key=lambda t: t[0])
    return [p for p, _ in kept], [v for _, v in kept]


def _seed_from_wf(
    wf: DataFrame, seed_size: int, max_piece_len: int
) -> tuple[list, list]:
    """Initial vocabulary: ALL single characters (coverage floor) + the
    top multi-char substrings by (weighted count DESC, piece ASC), with
    frequency-proportional initial log-probs. Two bounded collects —
    alphabet-sized and seed-sized."""
    cand = candidate_pieces(wf, max_piece_len).persist()
    try:
        singles = cand.filter(F.length("piece") == 1).collect()
        multis = (
            cand.filter(F.length("piece") > 1)
            .orderBy(F.col("piece_cnt").desc(), F.col("piece").asc())
            .limit(max(0, seed_size - len(singles)))
            .collect()
        )
    finally:
        cand.unpersist()
    rows = sorted(
        [(r["piece"], int(r["piece_cnt"])) for r in singles]
        + [(r["piece"], int(r["piece_cnt"])) for r in multis]
    )
    if not rows:
        raise ValueError(
            "cannot train a tokenizer on an empty corpus: the word-"
            "frequency table has no pieces (all documents empty or "
            "whitespace-only)"
        )
    log_total = math.log(sum(c for _, c in rows))
    return [p for p, _ in rows], [math.log(c) - log_total for _, c in rows]


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 400,
    text_col: str = "text",
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
    seed_size: int | None = None,
    em_iters: int = DEFAULT_EM_ITERS,
    shrink: float = DEFAULT_SHRINK,
) -> list[tuple[str, float]]:
    """Train a unigram-LM vocabulary of (at most) ``vocab_size`` pieces.

    One corpus pass (word_freq, persisted as the round fixture), then
    alternating [EM ×``em_iters`` → prune to max(target, ``shrink``·n)]
    until the vocabulary fits — every statistic a distributed job over
    the word-type table, every reduction an exact integer sum
    (bit-deterministic under any partitioning; see module docstring).
    Returns [(piece, logprob)] sorted by piece. The floor is the
    single-character alphabet: if it alone exceeds ``vocab_size`` the
    result keeps all of it (coverage beats the target)."""
    wf = word_freq(docs, text_col).persist()
    try:
        pieces, logp = _seed_from_wf(
            wf, seed_size or 8 * vocab_size, max_piece_len
        )
        n_singles_floor = sum(1 for p in pieces if len(p) == 1)
        while True:
            for _ in range(em_iters):
                counts, _ll = _em_pass(wf, pieces, logp, max_piece_len)
                pieces, logp = _m_step(pieces, counts)
            if len(pieces) <= max(vocab_size, n_singles_floor):
                break
            keep_n = max(vocab_size, int(len(pieces) * shrink))
            if keep_n >= len(pieces):
                keep_n = len(pieces) - 1
            nxt = _prune(wf, pieces, logp, keep_n, max_piece_len)
            if len(nxt[0]) >= len(pieces):
                break  # only the single-char floor is left — cannot shrink
            pieces, logp = nxt
        return sorted(zip(pieces, logp))
    finally:
        wf.unpersist()


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def _segment_oov_tolerant(word: str, lp: dict, segment_fn):
    """Shared OOV fallback for both encoders: try ``segment_fn(word)``
    (returns a piece list or None for an unreachable lattice); on OOV
    characters, segment each run of KNOWN characters and pass unknown
    characters through as single-char pieces, so concat(pieces) always
    round-trips. Known-char runs are always segmentable because the
    membership test is the single-char key itself (``ch in lp``)."""
    segs = segment_fn(word)
    if segs is not None:
        return segs
    out: list[str] = []
    run = ""
    for ch in word:
        if ch in lp:
            run += ch
        else:
            if run:
                out.extend(segment_fn(run))
                run = ""
            out.append(ch)
    if run:
        out.extend(segment_fn(run))
    return out


def _ffbs_word(word: str, scaled: dict, max_len: int, rng):
    """Forward-filtering backward-sampling: draw ONE segmentation of
    ``word`` from P(seg | word)^alpha (normalized) — Kudo 2018 §3.3
    subword regularization. ``scaled`` holds the PRE-multiplied
    alpha·logprob per piece (scale once per job, not per token — the
    vocabulary is 10^4..10^6 entries). alpha -> inf sharpens to the
    Viterbi path; alpha = 1 samples the true posterior. Returns None if
    the word has no segmentation under ``scaled``."""
    n = len(word)
    alpha_f = _forward(word, scaled, max_len)
    if alpha_f[n] == NEG_INF:
        return None
    out: list[str] = []
    i = n
    while i > 0:
        # candidate last pieces of word[:i], P(j) ∝ exp(αlp + alpha_f[j])
        opts: list[tuple[int, str]] = []
        weights: list[float] = []
        for l in range(1, min(max_len, i) + 1):
            j = i - l
            a = alpha_f[j]
            if a == NEG_INF:
                continue
            v = scaled.get(word[j:i])
            if v is None:
                continue
            opts.append((j, word[j:i]))
            weights.append(math.exp(a + v - alpha_f[i]))
        total = sum(weights)
        r = rng.random() * total
        acc = 0.0
        pick = len(opts) - 1
        for k, w in enumerate(weights):
            acc += w
            if r <= acc:
                pick = k
                break
        j, piece = opts[pick]
        out.append(piece)
        i = j
    out.reverse()
    return out


def unigram_sample_encode(
    docs: DataFrame,
    model: list[tuple[str, float]],
    alpha: float = 0.2,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sampled subword segmentation — subword REGULARIZATION (Kudo 2018
    §3.3; SentencePiece ``enable_sampling``): each token OCCURRENCE
    independently draws a segmentation from P(seg|word)^alpha via
    forward-filtering backward-sampling, the on-the-fly augmentation a
    training pipeline applies per epoch. Unlike :func:`unigram_encode`
    this cannot dedupe by word type (independence per occurrence is the
    point), so it runs as one Arrow-batched mapInPandas over the corpus
    — map-only, no shuffle.

    Deterministic for a fixed ``seed``: each occurrence's RNG is seeded
    by (seed, doc_id, position), independent of partitioning or batch
    boundaries (negative ids are masked to the non-negative range
    SeedSequence requires). Tokenization happens Spark-side through the
    same ``tokenize_ws`` expression every other text operator and the
    DuckDB oracles use — Python's ``str.split()`` disagrees with Java's
    ``\\s+`` on Unicode whitespace and would silently drop those
    characters. OOV characters pass through as single-char pieces (same
    contract as unigram_encode), so concat(pieces) always round-trips.
    Output: (id, pieces ARRAY<STRING>, n_pieces)."""
    import numpy as np
    import pandas as pd

    from vector_database_spark.operators.textops import tokenize_ws

    lp = dict(model)
    max_len = max((len(p) for p in lp), default=1)
    sc = docs.sparkSession.sparkContext
    # pre-scale ONCE: _ffbs_word takes alpha·logp, and rebuilding a
    # 10^4..10^6-entry dict per token occurrence would dominate the pass
    bc = sc.broadcast({p: v * float(alpha) for p, v in lp.items()})
    s = int(seed)
    _MASK = (1 << 63) - 1
    # the id column round-trips with its ORIGINAL type (string/int ids
    # included); integral ids seed the occurrence RNG directly, anything
    # else through a stable digest — both partition-independent
    id_type = docs.schema[id_col].dataType.simpleString()

    def _id_seed(doc_id):
        try:
            return int(doc_id) & _MASK
        except (TypeError, ValueError):
            import hashlib

            digest = hashlib.md5(str(doc_id).encode("utf-8")).digest()
            return int.from_bytes(digest[:8], "big") & _MASK

    def gen(batches):
        scaled = bc.value

        def one(doc_id, tokens):
            pieces: list[str] = []
            if tokens is not None:
                k = 0
                for w in tokens:
                    if not w:
                        continue
                    rng = np.random.default_rng(
                        [s, _id_seed(doc_id), k]
                    )
                    pieces.extend(
                        _segment_oov_tolerant(
                            w,
                            scaled,
                            lambda r: _ffbs_word(r, scaled, max_len, rng),
                        )
                    )
                    k += 1
            return pieces

        for pdf in batches:
            out = [one(d, t) for d, t in zip(pdf[id_col], pdf["__toks"])]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pieces": out,
                    "n_pieces": [len(p) for p in out],
                }
            )

    return docs.select(
        id_col, tokenize_ws(F.col(text_col)).alias("__toks")
    ).mapInPandas(
        gen, f"{id_col} {id_type}, pieces array<string>, n_pieces long"
    )


def unigram_encode(
    docs: DataFrame,
    model: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_types_max: int = 2_000_000,
) -> DataFrame:
    """Viterbi-encode the corpus with a trained unigram model. Reuses
    the conditional-broadcast word-encoder plumbing shared with
    bpe_encode (textops._apply_word_encoder): Python pays one Viterbi
    per word TYPE, the corpus pays dict lookups. Characters absent from
    the model (unseen at train time) pass through as single-char OOV
    pieces, so ``concat(pieces)`` always round-trips the word. Output:
    (id, pieces ARRAY<STRING>, n_pieces)."""
    lp = dict(model)
    max_len = max((len(p) for p in lp), default=1)

    def _encode_one(w: str) -> list[str]:
        return _segment_oov_tolerant(
            w, lp, lambda r: _viterbi(r, lp, max_len)[0]
        )

    return _apply_word_encoder(
        docs,
        _encode_one,
        text_col,
        id_col,
        broadcast_types_max,
        out_col="pieces",
        n_col="n_pieces",
    )
