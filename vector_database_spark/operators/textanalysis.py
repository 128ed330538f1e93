"""Text analysis operators — the north-star training-data-pipeline set:
language ID, quality scoring, token counting, document fingerprinting.

Everything is a built-in-function projection/aggregation (no UDFs), each
deterministic and DuckDB-oracle-checkable. The per-document operators are
embarrassingly parallel map-only plans; only the corpus-level stats
aggregate (one map-side-combined shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_database_spark.functions.text import explode_tokens, tokenize_ws
from vector_database_spark.functions.vector import micro6, round6

# Marker tokens per language for the n-gram/keyword language-ID heuristic.
# The fixture corpus is synthetic, so markers are drawn from its vocabulary;
# with real text these would be stopword lists per language.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("table", "row", "column"),
    "en": ("the", "a", "data"),
    "es": ("join", "merge", "group"),
    "fr": ("fast", "slow", "big"),
    "zh": ("vector", "spark", "query"),
}

STOPWORDS = ("the", "a", "of", "and", "to")

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_MULT = 31

# BPE-ish token pattern: runs of letters, runs of digits, or single
# non-alphanumeric non-space characters (subword-style segmentation).
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words))).cast("long")


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Language-ID heuristic: argmax over per-language marker-token counts,
    ties broken by language name order, 'en' when all scores are 0.

    Output: (id_col, pred_lang, best_score).
    """
    from vector_database_spark.functions.vector import computed_once

    # r12 (guide §1.2): pin the token array once — the per-language
    # filter() counts are CodegenFallback HOFs, so each one used to
    # re-evaluate the split() regex embedded in its argument (one full
    # tokenize per LANGUAGE per row); over the pinned attribute each
    # filter scans the materialized array instead
    toks = F.col("__tk")
    langs = sorted(LANG_MARKERS)
    scored = docs.select(
        id_col, computed_once(tokenize_ws(F.col(text_col))).alias("__tk")
    ).select(
        id_col,
        *[_count_in(toks, LANG_MARKERS[lg]).alias(f"s_{lg}") for lg in langs],
    )
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = F.lit("en")
    # first language (alphabetical) achieving the max wins — same CASE
    # ordering as the oracle SQL
    for lg in reversed(langs):
        pred = F.when(F.col(f"s_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best == 0, F.lit("en")).otherwise(pred)
    return scored.select(
        id_col, pred.alias("pred_lang"), best.cast("long").alias("best_score")
    )


def quality_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Quality scoring: length/stopword/avg-token-length features + a
    composite score. Mirrors the heuristics a pretraining-data filter uses.

    Ratio outputs are BIGINT micro-units (micro6): integer ratios hit exact
    decimal half-boundaries where round() diverges across engines.
    Output: (id_col, n_tokens, n_stopwords, stop_ratio_micro,
    avg_token_len_micro, quality_micro).
    """
    from vector_database_spark.functions.vector import computed_once

    # r12 (guide §1.2): pin the token array once. The feature set reuses
    # the stopword filter() and length-sum aggregate() HOFs across the
    # ratio and composite columns, and HOFs are CodegenFallback — every
    # textual occurrence used to re-run the embedded split() regex (the
    # plan carried 11 split() sites per row); over the pinned attribute
    # each occurrence scans the materialized array
    toks = F.col("__tk")
    n_tok = F.size(toks).cast("long")
    n_stop = _count_in(toks, STOPWORDS)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    avg_len = sum_len.cast("double") / n_tok.cast("double")
    quality = (
        F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0)) * F.lit(0.5)
        + stop_ratio * F.lit(0.25)
        + F.least(avg_len / F.lit(8.0), F.lit(1.0)) * F.lit(0.25)
    )
    return docs.select(
        id_col, computed_once(tokenize_ws(F.col(text_col))).alias("__tk")
    ).select(
        id_col,
        n_tok.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        micro6(stop_ratio).alias("stop_ratio_micro"),
        micro6(avg_len).alias("avg_token_len_micro"),
        micro6(quality).alias("quality_micro"),
    )


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace words + BPE-ish regex pieces.

    Output: (id_col, n_ws_tokens, n_bpe_tokens).
    """
    ws = F.size(tokenize_ws(F.col(text_col))).cast("long")
    bpe = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_PATTERN), F.lit(0))
    ).cast("long")
    return docs.select(id_col, ws.alias("n_ws_tokens"), bpe.alias("n_bpe_tokens"))


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized text plus a
    rolling polynomial hash over tokens
    (h := (h*31 + len(t)*17 + ascii(t[0])) mod 1e9+7).

    Output: (id_col, fp_md5, fp_roll).
    """
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    toks = tokenize_ws(F.col(text_col))
    contrib = F.transform(
        toks,
        lambda t: (F.length(t).cast("long") * 17 + F.ascii(F.substring(t, 1, 1)).cast("long")),
    )
    roll = F.aggregate(
        contrib,
        F.lit(0).cast("long"),
        lambda a, x: (a * FINGERPRINT_MULT + x) % FINGERPRINT_MOD,
    )
    return docs.select(
        id_col, F.md5(norm).alias("fp_md5"), roll.alias("fp_roll")
    )


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """F3: corpus stats per language — doc counts, char/token averages.

    Integer sums are exact; the derived averages are emitted as BIGINT
    micro-units (micro6) for cross-engine bit-equality.
    Output: (lang, n_docs, avg_chars_micro, avg_tokens_micro).
    """
    n_tok = F.size(tokenize_ws(F.col(text_col))).cast("long")
    base = docs.select("lang", F.col("n_chars"), n_tok.alias("n_tok"))
    return (
        base.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("n_tok").alias("sum_toks"),
        )
        .select(
            "lang",
            "n_docs",
            micro6(F.col("sum_chars").cast("double") / F.col("n_docs")).alias(
                "avg_chars_micro"
            ),
            micro6(F.col("sum_toks").cast("double") / F.col("n_docs")).alias(
                "avg_tokens_micro"
            ),
        )
        .orderBy("lang")
    )


def corpus_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Dataset-card report per source (the Dolma/FineWeb release-notes
    table): document and token volumes, average document length, language
    mix, and the exact-duplicate rate — the one-scan summary every corpus
    release ships with.

    All derived ratios are integer-ratio micro-units (FIXTURES.md rule 6);
    the duplicate rate is 1 − distinct(md5(text))/docs within the source.
    One groupBy (map-side partial aggs) — scan-bound at any corpus size.
    Output: (source, n_docs, total_tokens, avg_tokens_micro,
    pct_en_micro, dup_rate_micro).
    """
    n_tok = F.size(tokenize_ws(F.col(text_col))).cast("long")
    base = docs.select(
        "source",
        n_tok.alias("n_tok"),
        (F.col("lang") == "en").cast("long").alias("is_en"),
        F.md5(F.col(text_col)).alias("h"),
    )
    return (
        base.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("is_en").alias("n_en"),
            F.count_distinct("h").alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            micro6(F.col("total_tokens").cast("double") / F.col("n_docs")).alias(
                "avg_tokens_micro"
            ),
            micro6(F.col("n_en").cast("double") / F.col("n_docs")).alias(
                "pct_en_micro"
            ),
            micro6(
                (F.col("n_docs") - F.col("n_distinct")).cast("double")
                / F.col("n_docs")
            ).alias("dup_rate_micro"),
        )
        .orderBy("source")
    )


BM25_K1 = 1.2
BM25_B = 0.75

# Broadcast VOCABULARY-sized statistics tables (per-token df, unigram LM
# rows) only below this corpus size: vocabulary grows sublinearly but
# unboundedly with the corpus (Heaps' law), and a forced broadcast of a
# web-scale term table is the same failure class the dedup verify gate
# fixed at 2M docs (r7). Past the gate the hint is withheld and AQE
# converts at runtime if the aggregated table turns out small. The doc
# count used for the gate is parquet-footer metadata for table inputs.
VOCAB_BROADCAST_MAX_DOCS = 2_000_000


def _hint_if_small_corpus(df: DataFrame, n_docs: int) -> DataFrame:
    return F.broadcast(df) if n_docs <= VOCAB_BROADCAST_MAX_DOCS else df


def tfidf(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_id: int | None = None,
) -> DataFrame:
    """TF-IDF per (doc, token): tf * ln(N / df), df computed over the FULL
    corpus (``max_doc_id`` only bounds which docs are emitted, so the
    statistics stay corpus-wide while the result set stays small).

    Plan: one tokenize+explode scan → two aggregations (tf by (doc,token),
    df by token) → broadcast join of the (vocabulary-sized) df side. The
    heavy side shuffles once on (doc, token) — map-side combinable.
    ln-derived score → round6 is cross-engine safe (FIXTURES rule 1).
    """
    toks = explode_tokens(docs, (id_col,), text_col)
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    df_ = toks.select(id_col, "token").distinct().groupBy("token").agg(
        F.count("*").alias("df")
    )
    n_docs = docs.select(id_col).distinct().count()
    out = tf.join(_hint_if_small_corpus(df_, n_docs), "token").select(
        id_col,
        "token",
        "tf",
        round6(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
    )
    if max_doc_id is not None:
        out = out.filter(F.col(id_col) < max_doc_id)
    return out.orderBy(id_col, "token")


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int | None = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 keyword search (Robertson/Sparck Jones): top-k docs for a term
    list — the lexical retrieval twin of the embedding k-NN surface (hybrid
    search = this + knn.knn, fused by score or rank).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf = ln(1 + (N − df + ½)/(df + ½)).

    Determinism: per-term partial scores go through DECIMAL(38,6) before
    the per-doc sum (order-free); avgdl = Σdl/N is exact-integer division
    identical in both engines. Plan: explode once, tf agg, broadcast the
    |terms|-row df side, top-k via TakeOrderedAndProject.
    """
    # tokenize once per doc: pinned array column feeds BOTH the doc
    # length and the explode (see functions/text.py::explode_tokens)
    from vector_database_spark.functions.vector import computed_once

    toks = (
        docs.select(
            id_col, computed_once(tokenize_ws(F.col(text_col))).alias("__tokens")
        )
        .select(
            id_col,
            F.size("__tokens").cast("long").alias("dl"),
            F.explode("__tokens").alias("token"),
        )
        .filter(F.col("token").isin(list(query_terms)))
    )
    stats = docs.agg(
        F.count("*").alias("n"),
        F.sum(F.size(tokenize_ws(F.col(text_col))).cast("long")).alias("total_dl"),
    )
    tf = toks.groupBy(id_col, "token", "dl").agg(F.count("*").alias("tf"))
    df_ = toks.select(id_col, "token").distinct().groupBy("token").agg(
        F.count("*").alias("df")
    )
    joined = tf.join(F.broadcast(df_), "token").crossJoin(F.broadcast(stats))
    avgdl = F.col("total_dl").cast("double") / F.col("n").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    term_score = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl))
    )
    out = (
        joined.select(id_col, term_score.cast("decimal(38,6)").alias("ts"))
        .groupBy(id_col)
        .agg(F.round(F.sum("ts").cast("double"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
    )
    # k=None returns every scored doc (the candidate set for hybrid fusion)
    return out if k is None else out.limit(k)


def bigram_logprob(
    docs: DataFrame,
    lam: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated-bigram LM scoring (CCNet shape): each position scores
    ln(λ·p(w|prev) + (1−λ)·p(w)) under the corpus's own MLE models;
    position 0 scores unigram-only. Output: (id_col, n_tokens,
    avg_logprob_micro).

    Scale notes: the unigram lookup is |vocab|-bounded (broadcast
    hinted); the bigram-count join is UN-hinted — it grows toward
    |vocab|² on real corpora, so AQE must be free to pick a shuffle join
    (validated by the 1M-doc / 200k-vocab probe in tools/stress_text.py).
    Per-position ln is 6dp-rounded and summed via DECIMAL(38,6) so the
    doc mean is order-independent (queries.py carries the DuckDB twin).
    """
    from vector_database_spark.functions.vector import computed_once

    # pinned: the explode's inferred empty-skip filter otherwise pushes a
    # substituted second tokenize to the scan (and this subtree is read
    # three times — tp/uni/bi — so the waste triples)
    tp = docs.select(
        id_col, computed_once(tokenize_ws(F.col(text_col))).alias("tk")
    ).select(
        id_col,
        F.posexplode(F.col("tk")).alias("pos", "cur"),
        F.col("tk"),
    ).select(
        id_col,
        "pos",
        "cur",
        F.when(F.col("pos") >= 1, F.element_at(F.col("tk"), F.col("pos"))).alias(
            "prev"
        ),
    )
    uni = tp.groupBy("cur").agg(F.count("*").alias("cu"))
    tot = uni.agg(F.sum("cu").alias("tot"))
    bi = (
        tp.filter(F.col("pos") >= 1)
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("cb"))
    )
    up = uni.select(F.col("cur").alias("prev"), F.col("cu").alias("cp"))
    # uni/up are VOCABULARY-sized: hint only below the corpus-size gate
    # (the bi side was never hinted — the bigram table is larger still).
    # One footer count is the price of the informed choice (knn_batch_auto
    # precedent); `tot` stays hinted — it is one row at any scale.
    n_docs = docs.count()
    scored = (
        tp.join(_hint_if_small_corpus(uni, n_docs), "cur")
        .join(_hint_if_small_corpus(up, n_docs), "prev", "left")
        .join(bi, ["prev", "cur"], "left")
        .crossJoin(F.broadcast(tot))
    )
    p_uni = F.col("cu").cast("double") / F.col("tot").cast("double")
    p_bi = F.col("cb").cast("double") / F.col("cp").cast("double")
    lp = round6(
        F.when(F.col("pos") == 0, F.log(p_uni)).otherwise(
            F.log(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni)
        )
    )
    per_doc = scored.select(id_col, lp.alias("lp")).groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.col("lp").cast("decimal(38,6)")).cast("double").alias("slp"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        micro6(F.col("slp") / F.col("n_tokens").cast("double")).alias(
            "avg_logprob_micro"
        ),
    )
