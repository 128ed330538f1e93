"""Vector math as Catalyst expressions (JVM-side).

The reference declares cosine distance on its collections
(vector_db.py:23, text_img.py:21) and consumes ordered similarity scores
(vector_db_query.py:85-86). Here every metric is a built-in higher-order
function over ARRAY<FLOAT> columns — no UDF, no Python in the hot path.

Determinism contract (SURVEY §7.3 / FIXTURES.md): all similarity math is
performed in DOUBLE (floats are cast up before any arithmetic) and
user-facing scores are rounded to 6 decimals so the DuckDB oracle agrees
bit-for-bit. Accumulation is left-to-right (``aggregate``), matching
DuckDB's list function evaluation order.

MEASURED NEGATIVE RESULT (round 4 — don't retry): unrolling these folds
into static Multiply/Add chains (64-d: ~192 ops per cosine) made every
scoring path SLOWER, not faster. The HOFs are CodegenFallback, but their
interpreted evaluation is a JIT-compiled Scala loop over primitive
arrays; the unrolled chain's generated ``processNext`` exceeds HotSpot's
8 KB bytecode JIT ceiling (DontCompileHugeMethods), so the whole stage
runs in the bytecode interpreter — measured 1.3-1.5x slower on a 1M-row
scan, 3-4x slower per pair under a crossJoin, and 3x slower for the
k-means integer assignment; two copies (a filter pushed through the
projection) additionally blow janino's 64 KB method limit and fall the
stage back to fully interpreted expressions. The fixes that DO pay, all
bit-identical: precompute per-row norms so each pair costs ONE fold
(``try_divide(dot, na*nb)`` — see operators/dedup.py::_pair_sides and
knn_batch), pin filtered scores with :func:`computed_once`, and replace
many-dots-per-row shapes with one Arrow-batched numpy matmul
(operators/ann.py::with_lsh_signature). Curves: STRESS.md "Pair scoring".
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
    (vector_db_query.py:78-82); here it is a left-to-right fold. See the
    module docstring before "optimizing" this into an unrolled chain —
    that was measured slower everywhere (HotSpot JIT method ceiling).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def computed_once(col: Column) -> Column:
    """Pin an EXPENSIVE projected expression so downstream predicates
    read the attribute instead of a substituted second copy.

    ``df.select(big_expr.alias("s")).filter(F.col("s") >= t)`` lets
    Catalyst substitute ``big_expr`` into the filter and push it below
    the projection — the expression is then evaluated twice per row
    (and, for very large generated code, can blow janino's 64 KB method
    limit, silently falling the stage back to interpreted execution).
    Spark 4 pushes a predicate through a projection whenever the FIELDS
    IT REFERENCES resolve to deterministic expressions — a
    nondeterministic sibling column, or a nondeterministic OR-term in
    the predicate, does not stop it (both were tried; the score was
    still inlined into a join condition).

    The wrapper ``when(monotonically_increasing_id() >= 0, col)`` is
    value-identical (ids are non-negative by contract, the branch is
    always taken, no ``otherwise`` is reachable) but marks the
    expression nondeterministic, which makes substitution illegal —
    the optimizer must leave the Filter above the Project reading the
    computed attribute, which is exactly the plan a human would write.
    The condition is non-foldable, so SimplifyConditionals cannot strip
    the wrapper. Use ONLY on columns a downstream filter/join keys on;
    it also blocks legitimate pushdown of cheap predicates.
    """
    return F.when(F.monotonically_increasing_id() >= 0, col)


def l2_norm(a: Column) -> Column:
    """Euclidean norm ``sqrt(a . a)`` in DOUBLE.

    Pair-scoring pattern: ``cosine(a, b)`` evaluates THREE folds per
    PAIR. Tagging each side with its norm once per ROW and scoring pairs
    as ``try_divide(dot(a, b), na * nb)`` is bit-identical — the
    denominator is the same ``sqrt(a·a) * sqrt(b·b)`` doubles in the
    same order — but does N work instead of N² for two of the three
    folds (measured 2.7x on a 64M-pair batch, STRESS.md)."""
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

    For PAIR scoring (both sides columns, N×M pairs) prefer per-row norm
    tagging + ``try_divide(dot, na*nb)`` — same values, one fold per pair
    instead of three (see :func:`l2_norm`).
    """
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
