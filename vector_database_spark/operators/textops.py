"""Tokenizer dataflow operators (SURVEY §2.D) — the reference's transformer
data pipeline re-expressed as relational plans.

Reference pipeline (transformer_sample.py): corpus → Whitespace tokenizer →
WordLevel vocabulary with min_frequency=2 and specials [UNK]=0 [PAD]=1
[SOS]=2 [EOS]=3 (transformer_sample.py:398-409) → encode to id sequences
(:498-499) → SOS/EOS/PAD framing to seq_len (:503-541) → too-long guard
(:510-511) → 90/10 split (:431-433).

Engine-declared determinism (FIXTURES.md rules 3-4): vocabulary ids are
``row_number() OVER (ORDER BY count DESC, token ASC) + 3``; splits are
hash-based on the id, never randomSplit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_database_spark.functions.text import explode_tokens, tokenize_ws

UNK, PAD, SOS, EOS = 0, 1, 2, 3
MIN_FREQUENCY = 2
SEQ_LEN = 128  # engine default; reference uses 350 (transformer_sample.py:651)

# Knuth multiplicative hash — portable across Spark and DuckDB in BIGINT.
SPLIT_MULT = 2654435761
SPLIT_MOD = 1 << 32


def tokenized(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """D1: docs + a ``tokens`` array column.

    The column is pinned (computed_once): Catalyst's
    InferFiltersFromGenerate clones a downstream explode's generator
    expression into a pre-filter, and the relaxed Spark-4 pushdown then
    plants a SECOND tokenize at the scan — every tokenize-explode query
    was splitting each document twice (registry plan audit, round 4;
    pin measured 15-25% off q_vocab_build/encode/pad_frame/bigram).
    Pinned, the inferred empty-skip filter reads the attribute.
    Predicates on OTHER columns still push through (Spark 4 pushes when
    the fields the predicate references are deterministic).
    """
    from vector_database_spark.functions.vector import computed_once

    return docs.withColumn("tokens", computed_once(tokenize_ws(F.col(text_col))))


def build_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """D2: WordLevel vocabulary build (transformer_sample.py:398-409).

    count tokens → drop freq < MIN_FREQUENCY → dense ids after the 4
    reserved specials, ordered by (count DESC, token ASC) — a group-by
    plus a rank. Token counting is a map-side-combined groupBy that scales
    with the corpus; the rank over the distinct-token set uses the
    partition-offset scheme (operators/ranking.py), so even a
    billion-token raw vocabulary never funnels through one partition.
    """
    from vector_database_spark.operators.ranking import global_row_number

    counts = (
        tokenized(docs, text_col)
        .select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .count()
        .filter(F.col("count") >= MIN_FREQUENCY)
    )
    ranked = global_row_number(
        counts,
        [F.col("count").desc(), F.col("token").asc()],
        out_col="__vrank",
    )
    return ranked.select(
        "token",
        F.col("count").alias("cnt"),
        (F.col("__vrank") + 3).cast("long").alias("token_id"),
    )


def encode(
    docs: DataFrame, vocab: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """D3: token → id lookup; unknown → [UNK]=0 (transformer_sample.py:498-499).

    posexplode keeps positions → broadcast-join the vocab (it is small by
    construction: distinct frequent tokens) → reassemble in position order.
    Output: (id_col, ids ARRAY<BIGINT>).
    """
    toks = tokenized(docs, text_col).select(
        id_col, F.posexplode("tokens").alias("pos", "token")
    )
    joined = toks.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token_id"))),
                lambda s: F.coalesce(s["token_id"], F.lit(0)).cast("long"),
            ).alias("ids")
        )
    )


def decode(
    encoded: DataFrame, vocab: DataFrame, id_col: str = "doc_id", ids_col: str = "ids"
) -> DataFrame:
    """D4: id → token lookup; unknown id → '[UNK]' (transformer_sample.py:623-624).

    Output: (id_col, decoded STRING — tokens joined by ' ').
    """
    toks = encoded.select(id_col, F.posexplode(ids_col).alias("pos", "tid"))
    joined = toks.join(
        F.broadcast(vocab.select(F.col("token_id").alias("tid"), "token")), "tid", "left"
    )
    return joined.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: F.coalesce(s["token"], F.lit("[UNK]")),
            ),
            " ",
        ).alias("decoded")
    )


def pad_frame(
    encoded: DataFrame,
    seq_len: int = SEQ_LEN,
    id_col: str = "doc_id",
    ids_col: str = "ids",
) -> DataFrame:
    """D5+D6: SOS/EOS/PAD framing to fixed length with the too-long guard
    as a *filter* (engine policy; reference raises,
    transformer_sample.py:503-541,510-511).

    Output: (id_col, framed ARRAY<BIGINT> of exactly seq_len).
    """
    n = F.size(ids_col)
    framed = F.concat(
        F.array(F.lit(SOS).cast("long")),
        F.col(ids_col),
        F.array(F.lit(EOS).cast("long")),
        F.array_repeat(F.lit(PAD).cast("long"), F.lit(seq_len) - n - 2),
    )
    return encoded.filter(n <= seq_len - 2).select(id_col, framed.alias("framed"))


def pad_mask(framed: DataFrame, framed_col: str = "framed") -> DataFrame:
    """D12: elementwise padding mask, 1 where token != [PAD]
    (transformer_sample.py:551)."""
    return framed.withColumn(
        "mask",
        F.transform(
            F.col(framed_col),
            lambda x: F.when(x != PAD, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        ),
    )


def hash_split(
    df: DataFrame, id_col: str = "doc_id", train_pct: int = 9
) -> DataFrame:
    """D8: deterministic 90/10 split (engine twin of randomSplit,
    transformer_sample.py:431-433). ``(id * 2654435761) % 2^32 % 10 < 9``
    is reproducible in any engine — FIXTURES.md rule 3.
    """
    h = (F.col(id_col) * F.lit(SPLIT_MULT)) % F.lit(SPLIT_MOD) % 10
    return df.withColumn(
        "split", F.when(h < train_pct, F.lit("train")).otherwise(F.lit("val"))
    )


def parse_instruction(df: DataFrame, text_col: str = "inst_text") -> DataFrame:
    """D9: '[INST] x [/INST] y' → (instruction, response)
    (transformer_training.py:300-301)."""
    return df.select(
        "*",
        F.trim(
            F.regexp_extract(F.col(text_col), r"\[INST\](.*?)\[/INST\]", 1)
        ).alias("instruction"),
        F.trim(F.element_at(F.split(F.col(text_col), r"\[/INST\]"), 2)).alias(
            "response"
        ),
    )


def max_len_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """D7: max token length per language (transformer_sample.py:442-451)."""
    return (
        tokenized(docs, text_col)
        .groupBy("lang")
        .agg(F.max(F.size("tokens")).cast("long").alias("max_tokens"))
    )


CHUNK_SIZE = 20
CHUNK_STRIDE = 15  # 5-token overlap between consecutive chunks


def chunk_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split each document into overlapping fixed-size token chunks — the
    context-window chunking step of an LLM training/RAG pipeline (each chunk
    becomes one training sample / one embedded retrieval unit).

    Chunks start at token offsets 0, stride, 2*stride, … < n_tokens; each
    takes ``size`` tokens (the last may be shorter). Pure array expressions
    (sequence → posexplode → slice): map-only, no shuffle, whole-stage
    codegen'd — at 100 TB this is a scan-speed pass.
    """
    toks = tokenize_ws(F.col(text_col))
    n = F.size(toks)
    # sequence() counts DOWN when start > stop — guard the empty-doc case
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    with_chunks = docs.select(
        id_col, toks.alias("__toks"), F.posexplode(starts).alias("chunk_id", "start")
    )
    piece = F.slice(F.col("__toks"), F.col("start") + 1, size)
    return with_chunks.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


PACK_SHARD_SEED = 97
N_PACK_SHARDS = 8


def pack_shard(id_col_expr, n_shards: int = N_PACK_SHARDS):
    """Deterministic pack shard: portable_hash('97:' || id) % n_shards.
    Portable across Spark and DuckDB (functions/hashing.py), so both
    engines assign identical shards."""
    from vector_database_spark.functions.hashing import seeded_hash

    return F.pmod(seeded_hash(id_col_expr.cast("string"), PACK_SHARD_SEED), F.lit(n_shards)).cast(
        "long"
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = SEQ_LEN,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = N_PACK_SHARDS,
) -> DataFrame:
    """Contiguous sequence packing: documents are laid into
    ``seq_len``-token bins by cumulative offset (bin = floor(start/seq_len))
    — the packing step that turns ragged documents into fixed training
    rows without padding waste.

    Declared deterministic semantics: shard-keyed offset packing. Each doc
    is assigned a shard by portable hash (:func:`pack_shard`); docs are
    packed in id order WITHIN their shard, offsets independent per shard —
    the running-sum window is partitioned by shard, so the plan is
    embarrassingly parallel (n_shards scales with the cluster; same bin
    quality as a global pack because bins only ever waste their final
    partial row). No single-partition global window.

    Output: one row per (shard, bin_id): n_docs, sum_tokens (≈ bin
    utilization).
    """
    from pyspark.sql.window import Window

    n_tok = F.size(tokenize_ws(F.col(text_col))).cast("long")
    shard = pack_shard(F.col(id_col), n_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    binned = docs.select(
        id_col, shard.alias("shard"), n_tok.alias("n_tok")
    ).withColumn(
        "bin_id", F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / seq_len)
    )
    return (
        binned.groupBy("shard", "bin_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("sum_tokens"))
        .orderBy("shard", "bin_id")
    )


BPE_EOW = "</w>"  # end-of-word marker (Sennrich et al. 2016 §3.2)


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the whitespace-lowered token stream — the ONE
    corpus-wide pass both BPE trainers start from (bpe_learn here and
    operators/bpe.py::learn_bpe). Shared on purpose: the two trainers
    are tested to produce IDENTICAL merge sequences, and that contract
    starts with an identical word-frequency input — a tokenization or
    empty-word-filter change must hit both or neither. Map-side combined
    groupBy; output bounded by the distinct-word count."""
    return (
        explode_tokens(docs, (), text_col, alias="word")
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[int, str, str, str, int]]:
    """Distributed BPE vocabulary learning (Sennrich et al. 2016): iterate
    ``n_merges`` rounds of (count adjacent symbol pairs weighted by word
    frequency → merge the most frequent pair in every word). The loop runs
    on the WORD-TYPE table (distinct words + counts), not the corpus — the
    classical formulation, and the reason this scales: a 100 TB corpus has
    a bounded word-type table (tens of millions of rows), touched once to
    build and then iterated in memory-sized rounds.

    Deterministic: pair argmax tie-breaks (count DESC, left ASC, right
    ASC); the per-word merge is a left-to-right greedy fold identical to
    the reference regex replace (non-overlapping, no same-pass rescan).

    Each round is two small jobs (pair count + argmax collect of ONE row)
    plus a localCheckpoint that keeps the symbol column a flat projection
    (20 stacked merge folds would otherwise collapse into one giant
    codegen expression). Returns the merge table
    [(rank, left, right, merged, pair_count)] — driver-sized by
    definition (n_merges rows).

    Reference twin: the WordLevel trainer this engine ships for D2
    (transformer_sample.py:398-409) is frequency-pruned whole words; BPE
    is the subword upgrade every modern LLM tokenizer actually uses.
    """
    words = word_freq(docs, text_col).withColumnRenamed("cnt", "wc")
    # word -> initial symbol sequence: chars + end-of-word marker
    # (split at every inter-char position: not at start, must be followed
    # by a char — the (?=.) guard keeps end-of-string from producing a
    # trailing empty symbol)
    sym = F.concat(F.split(F.col("word"), "(?!^)(?=.)"), F.array(F.lit(BPE_EOW)))
    table = words.select(F.col("wc"), sym.alias("sym")).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            table.filter(F.size("sym") >= 2)
            .select(
                "wc",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("sym"), 1, F.size("sym") - 1).alias("l"),
                        F.slice(F.col("sym"), 2, F.size("sym") - 1).alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = pairs[0]["l"], pairs[0]["r"], int(pairs[0]["cnt"])
        merged = left + right
        merges.append((rank, left, right, merged, cnt))
        fold = F.aggregate(
            F.col("sym"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        table = table.select("wc", fold.alias("sym")).localCheckpoint(eager=True)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_types_max: int = 2_000_000,
    strategy: str = "ordered",
) -> DataFrame:
    """Apply learned BPE merges (from :func:`bpe_learn` or
    operators/bpe.py::learn_bpe) to encode the corpus into subword
    sequences. Two physical strategies, chosen by vocabulary size (the
    same conditional-broadcast policy as the MinHash verify stage):

    * word types <= ``broadcast_types_max`` (every real tokenizer —
      vocabularies are 10^4..10^6): the word->pieces map is computed once
      on the distinct-word table, collected, and BROADCAST into a
      map-side pandas UDF that encodes each document's token array by
      dict lookup — ZERO shuffles; Python pays one fold per word TYPE and
      one dict hit per token.
    * above the threshold: positional explode -> broadcast join of the
      pieces table -> ordered reassembly (one shuffle on the doc id),
      which never materializes the type map on the driver.

    ``strategy`` picks the per-word-type application algorithm —
    orthogonal to the physical plan above:

    * ``"ordered"`` (default): replay the merge list in rank order, one
      left-to-right pass per merge — O(n_merges · len) per type. Right
      for the shallow in-plan tables bpe_learn produces.
    * ``"greedy"``: repeatedly merge the LOWEST-RANK pair present —
      O(len²) per type, INDEPENDENT of table depth. Required for
      production-depth tables (8k-32k merges from the incremental
      trainer), where the ordered replay pays the whole vocabulary per
      word type. For tables trained by sequential BPE the two are
      provably identical (a learned pair over a merged symbol always
      ranks after the merges that formed it, so the greedy's
      lowest-rank-first order replays the training order exactly) —
      equivalence-tested in tests/test_textops.py; an arbitrary
      hand-built table holds no such guarantee.

    Output: (id, subwords ARRAY<STRING>, n_subwords) — subwords carry the
    </w> end-of-word markers, so ``concat(subwords)`` round-trips the
    original words.
    """
    ranked = [(left, right, merged) for _, left, right, merged, _ in merges]
    if strategy not in ("ordered", "greedy"):
        raise ValueError(f"unknown bpe_encode strategy: {strategy!r}")

    if strategy == "greedy":
        ranks = {(left, right): k for k, (left, right, _m) in enumerate(ranked)}

        def _encode_one(w: str) -> list[str]:
            sym = list(w) + [BPE_EOW]
            while len(sym) > 1:
                best = min(
                    (
                        (ranks[p], p)
                        for p in zip(sym, sym[1:])
                        if p in ranks
                    ),
                    default=None,
                )
                if best is None:
                    break
                left, right = best[1]
                merged = left + right
                out: list[str] = []
                i = 0
                while i < len(sym):
                    if (
                        i + 1 < len(sym)
                        and sym[i] == left
                        and sym[i + 1] == right
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            return sym

    else:

        def _encode_one(w: str) -> list[str]:
            sym = list(w) + [BPE_EOW]
            for left, right, merged in ranked:
                out: list[str] = []
                for x in sym:
                    if out and out[-1] == left and x == right:
                        out[-1] = merged
                    else:
                        out.append(x)
                sym = out
            return sym

    return _apply_word_encoder(
        docs, _encode_one, text_col, id_col, broadcast_types_max
    )


def _apply_word_encoder(
    docs: DataFrame,
    encode_one,
    text_col: str,
    id_col: str,
    broadcast_types_max: int,
    out_col: str = "subwords",
    n_col: str = "n_subwords",
) -> DataFrame:
    """Physical plumbing shared by every word-level subword encoder
    (bpe_encode here; operators/unigram_lm.py::unigram_encode): apply
    ``encode_one(word) -> list[str]`` over the corpus with the
    conditional-broadcast strategy documented on :func:`bpe_encode` —
    word types <= ``broadcast_types_max`` get a collected word->pieces
    map broadcast into one map-side pandas UDF (zero shuffles); larger
    vocabularies take the positional explode -> broadcast join ->
    ordered reassembly path (one shuffle on the doc id)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def encode_word(words: pd.Series) -> pd.Series:
        return words.map(encode_one)

    toks = explode_tokens(docs, (id_col,), text_col, alias="word", pos=True).filter(
        F.col("word") != ""
    )
    types = toks.select("word").distinct()

    # persist so the strategy-choosing count and the broadcast branch's
    # collect reuse one tokenize+distinct pass; BOTH branches unpersist
    # before returning (the cache must not outlive the call — the
    # fallback's lazy job recomputes the distinct once, an accepted cost
    # on the >broadcast_types_max path)
    types.persist()
    small_vocab = types.count() <= broadcast_types_max

    if small_vocab:
        pieces_map = {
            r["word"]: list(r["pieces"])
            for r in types.select(
                "word", encode_word(F.col("word")).alias("pieces")
            ).collect()
        }
        types.unpersist()
        sc = docs.sparkSession.sparkContext
        bc = sc.broadcast(pieces_map)

        @pandas_udf("array<string>")
        def encode_doc(token_arrays: pd.Series) -> pd.Series:
            m = bc.value

            def one(tokens) -> list[str]:
                out: list[str] = []
                if tokens is None:
                    return out
                for w in tokens:
                    if w:
                        out.extend(m.get(w) or encode_one(w))
                return out

            return token_arrays.map(one)

        return docs.select(
            id_col, encode_doc(tokenize_ws(F.col(text_col))).alias(out_col)
        ).select(id_col, out_col, F.size(out_col).cast("long").alias(n_col))

    types.unpersist()
    typed = types.select("word", encode_word(F.col("word")).alias("pieces"))
    joined = toks.join(F.broadcast(typed), "word")
    grouped = joined.groupBy(id_col).agg(
        F.flatten(
            F.array_sort(
                F.collect_list(F.struct("pos", "pieces"))
            ).getField("pieces")
        ).alias(out_col)
    )
    # left join from the full doc set: token-less docs (empty/whitespace/
    # null text) keep an empty subword row, matching the broadcast path
    return (
        docs.select(id_col)
        .join(grouped, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                F.col(out_col), F.array().cast("array<string>")
            ).alias(out_col),
        )
        .select(
            id_col,
            out_col,
            F.size(out_col).cast("long").alias(n_col),
        )
    )
