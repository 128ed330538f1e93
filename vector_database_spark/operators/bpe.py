"""BPE trainer, compressed-dict incremental form — the LARGE-vocabulary
twin of operators/textops.py::bpe_learn (same Sennrich et al. 2016
semantics, same determinism contract, different scale trade).

textops.bpe_learn runs every merge round as TWO distributed jobs (pair
count + argmax) over the word-type table — perfect for bounded rounds,
impossible for a production tokenizer (32k merges = 64k Spark jobs).
This module flips the bound: ONE distributed pass builds the
word-frequency dict (map-side-combined groupBy; a 100 TB corpus has a
bounded word-type table, and ``max_words`` caps the driver collect for
adversarial corpora while keeping the frequency mass that decides
merges), then the merge loop runs driver-side with INCREMENTAL
pair-count maintenance — each round touches only the words containing
the merged pair (occurrence-indexed), never rescans the dict. This is
the shape HF tokenizers / subword-nmt actually train with; thousands of
merges cost zero additional cluster jobs.

Determinism contract (shared with bpe_learn, asserted equal in
tests/test_textops.py): argmax tie-breaks (count DESC, left ASC, right
ASC); per-word application merges all occurrences left-to-right in one
pass; training stops below MIN_PAIR_COUNT. Iterative → rows-only for
the driver gate; the round-1 statistics are relational and carry a FULL
DuckDB oracle (queries.py::q_bpe_pair_counts). Encoding is
textops.bpe_encode (word-type-deduped, broadcast-joined) — one encoder,
both trainers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_spark.operators.textops import BPE_EOW as END_OF_WORD
from vector_database_spark.operators.textops import word_freq

# merging a pair seen once generalizes nothing (mirrors textops
# MIN_FREQUENCY and bpe_learn's min_pair_count): stop early below it
MIN_PAIR_COUNT = 2
# driver-collect bound for the compressed dict: keep the most frequent
# distinct words (ties broken by word for determinism). 1M words x ~16B
# is ~tens of MB on the driver — far below any practical vocabulary.
DEFAULT_MAX_WORDS = 1_000_000


def pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent symbol-pair counts of the INITIAL (character) alphabet,
    weighted by word frequency — exactly round 1 of BPE training, as a
    relational plan (FULL oracle in queries.py::q_bpe_pair_counts).

    Shape: word-freq groupBy (map-side combined), then per-word pair
    explosion over the DISTINCT-word table — the expensive explode runs
    on the compressed dict, not the corpus — then a second combined
    groupBy on (left_sym, right_sym). The last character pairs with the
    END_OF_WORD marker, so `e + </w>` (word-final e) counts separately
    from `e + r` (medial), as in Sennrich et al.
    """
    wf = word_freq(docs, text_col)
    w = F.col("word")
    pairs = wf.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(w)),
                lambda i: F.struct(
                    F.substring(w, i, F.lit(1)).alias("left_sym"),
                    F.when(
                        i < F.length(w), F.substring(w, i + 1, F.lit(1))
                    )
                    .otherwise(F.lit(END_OF_WORD))
                    .alias("right_sym"),
                ),
            )
        ).alias("p"),
        F.col("cnt"),
    )
    return pairs.groupBy(
        F.col("p.left_sym").alias("left_sym"),
        F.col("p.right_sym").alias("right_sym"),
    ).agg(F.sum("cnt").cast("long").alias("pair_cnt"))


def train_bpe_from_freq(
    freq: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from a (word, count) dict —
    the pure driver-side core, input already corpus-compressed. Returns
    bpe_learn's exact row shape [(rank, left, right, merged,
    pair_count)] so the two trainers are drop-in interchangeable (and
    directly comparable in tests).

    Incremental: pair counts and a pair→word-index occurrence index are
    maintained across rounds; a merge re-segments ONLY the words that
    contain the merged pair, removing and re-adding EVERY pair of each
    touched word (a whole-word recount — simpler than true
    changed-neighborhood deltas, and measured fast enough that the
    word-freq collect dominates: 8,000 merges in ~16s on a 50k-type
    dict; revisit only if profiling ever shows the recount leading).
    The argmax is a LAZY-DELETION HEAP, not a dict scan —
    every count change pushes a fresh (−count, left, right) entry and
    pops discard entries whose count no longer matches the live dict, so
    a round costs O(touched-neighborhoods · log P) instead of O(P); at
    32k merges a per-round full-dict scan would dominate end-to-end
    time. tests/test_textops.py proves equality with both the
    from-scratch reference recount and the distributed bpe_learn. Ties
    break (count DESC, left ASC, right ASC) — the heap orders by exactly
    that triple — deterministic regardless of dict or hash order."""
    import heapq

    words: list[list[str]] = []
    counts: list[int] = []
    for w, c in freq:
        if w:
            words.append(list(w) + [END_OF_WORD])
            counts.append(int(c))

    pair_cnt: dict[tuple[str, str], int] = {}
    occ: dict[tuple[str, str], set[int]] = {}
    heap: list[tuple[int, str, str]] = []

    def _add(widx: int, sign: int, push: bool = True) -> None:
        syms, c = words[widx], counts[widx] * sign
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            nc = pair_cnt.get(p, 0) + c
            if nc <= 0:
                pair_cnt.pop(p, None)
                continue
            pair_cnt[p] = nc
            if sign > 0:
                occ.setdefault(p, set()).add(widx)
            # push on EVERY change (decreases too): a pair whose count
            # only dropped would otherwise have nothing but stale higher
            # entries in the heap and become invisible to the argmax.
            # Entries reflecting transient mid-update counts are
            # discarded at pop time (count mismatch vs the live dict).
            if push:
                heapq.heappush(heap, (-nc, a, b))

    for i in range(len(words)):
        _add(i, +1, push=False)
    heap = [(-c, p[0], p[1]) for p, c in pair_cnt.items()]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best: tuple[str, str] | None = None
        best_c = 0
        while heap:
            negc, a, b = heap[0]
            cur = pair_cnt.get((a, b), 0)
            if cur != -negc:
                heapq.heappop(heap)  # stale: count moved since the push
                continue
            best, best_c = (a, b), cur
            break
        if best is None or best_c < MIN_PAIR_COUNT:
            break
        joined = best[0] + best[1]
        merges.append((rank, best[0], best[1], joined, best_c))
        for widx in sorted(occ.get(best, ())):
            syms = words[widx]
            # zip-scan membership check: the occurrence index is lazy
            if not any(
                a == best[0] and b == best[1] for a, b in zip(syms, syms[1:])
            ):
                continue
            _add(widx, -1)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[widx] = out
            _add(widx, +1)
        # the merged pair is fully replaced in every word that held it;
        # its dict entry goes now and its heap entries die lazily at pop
        # (zero/negative counts for OTHER pairs are pruned inline in _add)
        pair_cnt.pop(best, None)
        occ.pop(best, None)
    return merges


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int = DEFAULT_MAX_WORDS,
    stats: dict | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """End-to-end training: distributed word-freq pass, top-``max_words``
    cap (count DESC, word ASC — deterministic), driver merge loop. The
    collect is bounded by max_words — the documented compressed-dict
    contract, not a corpus materialization.

    The cap is NOT silent: when the corpus holds more word types than
    ``max_words``, a ``UserWarning`` reports how many (rare-tail) types
    were dropped, and passing a ``stats`` dict returns the exact counts
    (``word_types_total`` / ``word_types_kept`` /
    ``word_types_dropped``) for pipelines that log metrics. The dropped
    mass is the frequency TAIL (the cap keeps count-DESC), which is why
    the merge sequence is insensitive to it on natural corpora — but the
    caller deserves the number, not an assumption."""
    import warnings

    wf = word_freq(docs, text_col).persist()
    try:
        total = wf.count()
        rows = (
            wf.orderBy(F.col("cnt").desc(), F.col("word").asc())
            .limit(int(max_words))
            .collect()
        )
    finally:
        wf.unpersist()
    dropped = max(0, total - len(rows))
    if stats is not None:
        stats.update(
            word_types_total=total,
            word_types_kept=len(rows),
            word_types_dropped=dropped,
        )
    if dropped:
        warnings.warn(
            f"learn_bpe: corpus has {total} word types; the "
            f"max_words={int(max_words)} compressed-dict cap dropped the "
            f"{dropped} least frequent (merge decisions keep the "
            "frequency mass; raise max_words to include the tail)",
            UserWarning,
            stacklevel=2,
        )
    return train_bpe_from_freq([(r["word"], r["cnt"]) for r in rows], n_merges)


