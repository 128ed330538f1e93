"""Vector math as Catalyst expressions (JVM-side, whole-stage codegen'd).

The reference declares cosine distance on its collections
(vector_db.py:23, text_img.py:21) and consumes ordered similarity scores
(vector_db_query.py:85-86). Here every metric is a built-in higher-order
function over ARRAY<FLOAT> columns — no UDF, no Python in the hot path.

Determinism contract (SURVEY §7.3 / FIXTURES.md): all similarity math is
performed in DOUBLE (floats are cast up before any arithmetic) and
user-facing scores are rounded to 6 decimals so the DuckDB oracle agrees
bit-for-bit. Accumulation is left-to-right (``aggregate``), matching
DuckDB's list function evaluation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ROUND_DP = 6


def round6(col: Column) -> Column:
    """Round a DOUBLE score to the cross-engine comparison precision.

    Safe for irrational-ish values (similarity scores, norms: sqrt/exp in
    the formula) where exact decimal half-boundaries cannot occur. For
    ratios of integers use :func:`micro6` instead — those CAN land exactly
    on a half-boundary, where Spark's and DuckDB's round() disagree.
    """
    return F.round(col, ROUND_DP)


def micro6(col: Column) -> Column:
    """Division-derived value → BIGINT micro-units, bit-exact across engines.

    ``floor(x*1e6 + 0.5)``: both engines evaluate the identical IEEE double
    expression, and floor has no tie-breaking mode to disagree on (unlike
    round, which differs between Spark's BigDecimal path and DuckDB's
    multiply path exactly on .xxxxxx5 boundaries — which integer ratios hit).
    DuckDB twin: CAST(floor(x * 1000000 + 0.5) AS BIGINT).
    """
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def py_micro6(x: float) -> int:
    """Python twin of :func:`micro6` for driver/UDF-side code (heap keys,
    streaming state, literals inlined into oracle SQL). Keep every
    Python-side micro conversion on this ONE helper — a drifted copy
    (e.g. ``int(x*1e6+0.5)``, which truncates instead of floors) differs
    for negative values."""
    import math

    return int(math.floor(float(x) * 1e6 + 0.5))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two ARRAY<numeric> columns, accumulated in DOUBLE.

    Reference: cosine scoring inside Qdrant `client.search`
    (vector_db_query.py:78-82); here it is a codegen'd fold.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm ``sqrt(a . a)`` in DOUBLE."""
    return F.sqrt(dot(a, a))


def l2_dist(a: Column, b: Column) -> Column:
    """Euclidean distance in DOUBLE (Distance.EUCLID analogue, vector_db.py:2)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l1_dist(a: Column, b: Column) -> Column:
    """Manhattan (L1) distance in DOUBLE (Qdrant Distance.MANHATTAN)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.abs(x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in DOUBLE (Distance.COSINE, vector_db.py:23).

    A zero-norm side has no direction: the score is NULL (try_divide), so
    zero vectors sort LAST under desc ordering in every exact operator —
    consistent with VectorCollection.search's null handling and the
    two-phase operator's -inf ranking. Under ANSI mode (Spark 4 default)
    a plain division would instead abort the whole query with
    DIVIDE_BY_ZERO. Cosine collections reject zero vectors at ingest, so
    on managed data this branch never fires; raw-DataFrame callers get the
    sane ordering instead of a crash.
    """
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
