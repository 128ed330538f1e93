"""Text column helpers — tokenization and shingling.

The reference tokenizes with a HuggingFace ``Whitespace()`` pre-tokenizer
(transformer_sample.py:399); here the engine-declared semantics are
``split(lower(text), '\\s+')`` which the DuckDB oracle mirrors with
``string_split_regex(lower(text), '\\s+')``.

NOTE: Spark's ``sequence(a, b)`` counts *down* when a > b, so every
positional generator below guards the empty case explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS_PATTERN = r"\s+"


def tokenize_ws(text: Column) -> Column:
    """Whitespace tokenization (transformer_sample.py:399 semantics)."""
    return F.split(F.lower(text), WS_PATTERN)


def bigrams(tokens: Column) -> Column:
    """Adjacent word bigrams joined by a space, as an array column.

    Built positionally (element_at is 1-based) so the DuckDB twin
    ``list_transform(range(len(l)-1), i -> l[i+1] || ' ' || l[i+2])``
    produces the identical list.
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
