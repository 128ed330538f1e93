"""Text column helpers — tokenization and shingling.

The reference tokenizes with a HuggingFace ``Whitespace()`` pre-tokenizer
(transformer_sample.py:399); here the engine-declared semantics are
``split(lower(text), '\\s+')`` which the DuckDB oracle mirrors with
``string_split_regex(lower(text), '\\s+')``.

NOTE: Spark's ``sequence(a, b)`` counts *down* when a > b, so every
positional generator below guards the empty case explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS_PATTERN = r"\s+"


def tokenize_ws(text: Column) -> Column:
    """Whitespace tokenization (transformer_sample.py:399 semantics)."""
    return F.split(F.lower(text), WS_PATTERN)


def explode_tokens(
    docs: DataFrame,
    keep: tuple[str, ...],
    text_col: str = "text",
    alias: str = "token",
    distinct: bool = False,
    pos: bool = False,
    pos_alias: str = "pos",
) -> DataFrame:
    """``(…keep, token)`` rows — tokenize evaluated ONCE per document.

    Writing ``explode(tokenize_ws(text))`` inline costs a SECOND full
    tokenize per document: InferFiltersFromGenerate clones the generator
    expression into an empty-skip pre-filter, and Spark-4 pushdown plants
    the clone at the scan (registry plan audit, round 4 — every tokenize
    query paid 2x). Here the token array is projected first, pinned
    (computed_once — a nondeterministic expression is not legal directly
    under Generate, and the pin stops the clone from being substituted),
    and the explode consumes the attribute.
    """
    from vector_database_spark.functions.vector import computed_once

    toks = tokenize_ws(F.col(text_col))
    if distinct:
        toks = F.array_distinct(toks)
    pinned = docs.select(*keep, computed_once(toks).alias("__tokens"))
    gen = (
        F.posexplode("__tokens").alias(pos_alias, alias)
        if pos
        else F.explode("__tokens").alias(alias)
    )
    return pinned.select(*keep, gen)


def bigrams(tokens: Column) -> Column:
    """Adjacent word bigrams joined by a space, as an array column.

    Built positionally (element_at is 1-based) so the DuckDB twin
    ``list_transform(range(len(l)-1), i -> l[i+1] || ' ' || l[i+2])``
    produces the identical list.

    CALLER CONTRACT (r12): pass a MATERIALIZED array attribute (a
    pinned projected column), never the raw tokenize expression —
    ``tokens`` is referenced inside the per-element lambda, and HOFs
    are CodegenFallback with no subexpression elimination, so an inline
    ``split()`` argument re-runs once per element: O(tokens²) per row
    (found in four queries by the r12 lambda-body plan audit).
    """
    return F.when(F.size(tokens) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - 1),
            lambda i: F.concat(
                F.element_at(tokens, i), F.lit(" "), F.element_at(tokens, i + 1)
            ),
        )
    )


def char_shingles(text: Column, n: int = 5) -> Column:
    """Character n-gram shingles of whitespace-normalized lowercased text."""
    norm = F.lower(F.regexp_replace(text, WS_PATTERN, " "))
    return F.when(F.length(norm) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - (n - 1)),
            lambda i: F.substring(norm, i, F.lit(n)),
        )
    )


def hf_whitespace_tokens(text: Column) -> Column:
    """HF `tokenizers` ``Whitespace`` pre-tokenization, JVM-side: the
    regex ``\\w+|[^\\w\\s]+`` — word runs OR punctuation runs, so
    "Hello, world!" → ["Hello", ",", "world", "!"] where plain
    whitespace split (tokenize_ws) keeps "Hello," fused. Use this as
    the D1 stage when encoding against an HF WordLevel artifact
    (tokenizer_store.load_hf_wordlevel) so token boundaries match the
    artifact's training; the reference builds exactly this pipeline at
    transformer_sample.py:398-400 (WordLevel + Whitespace).

    Caveat (documented, not hidden): Java regex ``\\w`` is ASCII by
    default while Rust's (HF's) is Unicode-aware — non-ASCII word
    characters tokenize as punctuation runs here. The engine's corpora
    and the reference's artifacts are ASCII-dominant; full Unicode
    parity would need (?U) flags at a measured perf cost."""
    return F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]+"), 0)
