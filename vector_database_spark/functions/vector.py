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
    (vector_db_query.py:78-82). NOTE: higher-order functions
    (aggregate/zip_with) are CodegenFallback in Spark — each row pays
    interpreted lambda dispatch. When one side is a Python literal,
    prefer :func:`dot_literal`, which unrolls to plain Multiply/Add nodes
    that whole-stage-codegen compiles (~10x on wide vectors) while
    keeping the identical left-to-right IEEE addition order.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_literal(a: Column, values) -> Column:
    """``dot(a, lit_array(values))`` unrolled to a static expression chain.

    Bit-identical to the fold: starts from lit(0.0) and adds
    ``a[i] * values[i]`` left-to-right — the exact operation sequence
    ``aggregate`` performs — so 6dp-rounded scores cannot move. Uses
    0-based ``F.get`` (NULL out of range, no ANSI error), so a too-short
    ``a`` yields NULL like the zip_with fold does. Caller contract: ``a``
    has exactly ``len(values)`` elements (collections validate dim at
    ingest); a LONGER ``a`` would be silently truncated here where the
    fold returns NULL.
    """
    acc = F.lit(0.0)
    for i, v in enumerate(values):
        acc = acc + F.get(a, i).cast("double") * F.lit(float(v))
    return acc


def dot_self_unrolled(a: Column, dim: int) -> Column:
    """``dot(a, a)`` unrolled for a known dimension — same fold order."""
    acc = F.lit(0.0)
    for i in range(dim):
        x = F.get(a, i).cast("double")
        acc = acc + x * x
    return acc


def py_l2_norm(values) -> float:
    """Python twin of ``l2_norm`` over a literal vector: identical IEEE
    double ops in the identical order (0.0 + v0*v0 + v1*v1 ...; sqrt)."""
    import math

    acc = 0.0
    for v in values:
        fv = float(v)
        acc = acc + fv * fv
    return math.sqrt(acc)


def cosine_literal(a: Column, values) -> Column:
    """:func:`cosine` against a literal query vector with ZERO
    higher-order functions: the cross dot and the row-side norm unroll to
    codegen'd chains, the query-side norm folds to a Python float literal
    (same IEEE ops, same order). Scores are bit-identical to
    ``cosine(a, F.array(*lits))``."""
    qn = py_l2_norm(values)
    return F.try_divide(
        dot_literal(a, values),
        F.sqrt(dot_self_unrolled(a, len(values))) * F.lit(qn),
    )


def l2_dist_literal(a: Column, values) -> Column:
    """:func:`l2_dist` against a literal vector, unrolled (same order)."""
    acc = F.lit(0.0)
    for i, v in enumerate(values):
        d = F.get(a, i).cast("double") - F.lit(float(v))
        acc = acc + d * d
    return F.sqrt(acc)


def l1_dist_literal(a: Column, values) -> Column:
    """:func:`l1_dist` against a literal vector, unrolled (same order)."""
    acc = F.lit(0.0)
    for i, v in enumerate(values):
        acc = acc + F.abs(F.get(a, i).cast("double") - F.lit(float(v)))
    return acc


def dot_cols(a: Column, b: Column, dim: int) -> Column:
    """``dot(a, b)`` between two array COLUMNS of a statically-known
    dimension, unrolled to a codegen'd chain (same left-to-right IEEE
    order as the fold — bit-identical results).

    Collections declare ``dim`` at creation (the Qdrant model this engine
    mirrors), so the dimension is schema knowledge wherever managed
    vectors are scored. Contract: both arrays have exactly ``dim``
    elements. A SHORTER array yields NULL (F.get out of range) just like
    the zip_with fold; a LONGER one would be silently truncated here
    where the fold pads the short side with NULLs → NULL."""
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return acc


def cosine_cols(a: Column, b: Column, dim: int) -> Column:
    """:func:`cosine` between two array columns of known ``dim`` with
    ZERO higher-order functions — all three dots unroll (same order,
    bit-identical scores)."""
    return F.try_divide(
        dot_cols(a, b, dim),
        F.sqrt(dot_self_unrolled(a, dim)) * F.sqrt(dot_self_unrolled(b, dim)),
    )


def l2_dist_cols(a: Column, b: Column, dim: int) -> Column:
    """:func:`l2_dist` between two array columns of known ``dim``,
    unrolled (same order)."""
    acc = F.lit(0.0)
    for i in range(dim):
        d = F.get(a, i).cast("double") - F.get(b, i).cast("double")
        acc = acc + d * d
    return F.sqrt(acc)


def l1_dist_cols(a: Column, b: Column, dim: int) -> Column:
    """:func:`l1_dist` between two array columns of known ``dim``,
    unrolled (same order)."""
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.abs(F.get(a, i).cast("double") - F.get(b, i).cast("double"))
    return acc


def computed_once(col: Column) -> Column:
    """Pin an EXPENSIVE projected expression so downstream predicates
    read the attribute instead of a substituted second copy.

    ``df.select(big_expr.alias("s")).filter(F.col("s") >= t)`` lets
    Catalyst substitute ``big_expr`` into the filter and push it below
    the projection — the expression is then evaluated (and
    code-generated) TWICE per row. For the unrolled chains above that
    doubles the per-row work and, with two ~192-operation copies fused
    into one whole-stage method, blows janino's 64 KB method limit
    (Spark silently falls back to interpreted execution — observed on
    the cosine-threshold queries). Spark 4 pushes a predicate through a
    projection whenever the FIELDS IT REFERENCES resolve to
    deterministic expressions (a nondeterministic sibling column, or a
    nondeterministic OR-term in the predicate, does not stop it —
    both were tried and the score was still inlined into a join
    condition).

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


def norm_unrolled(a: Column, dim: int) -> Column:
    """``l2_norm`` for a known dimension, unrolled (same fold order).

    Pair-scoring pattern: ``cosine(a, b)`` evaluates THREE dots per PAIR.
    Tagging each side with its norm once per ROW and scoring pairs as
    ``try_divide(dot_cols(a, b, dim), na * nb)`` is bit-identical —
    the denominator is the same ``sqrt(a·a) * sqrt(b·b)`` doubles in the
    same order — but does N work instead of N² for two of the three dots.
    """
    return F.sqrt(dot_self_unrolled(a, dim))


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
