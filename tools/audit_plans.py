#!/usr/bin/env python
"""Registry-wide plan audit: flag expensive expressions that Catalyst
substituted into Filter/Join nodes — the double-compute bug class of
round 4.

Spark 4 pushes a predicate through a projection by SUBSTITUTING the
aliased expression whenever the fields the predicate references are
deterministic, and InferFiltersFromGenerate clones generator expressions
into pre-filters. Either way an expensive projected expression (a vector
fold, a tokenize, a popcount chain, an n-gram build) silently runs twice
per row. The fix is functions/vector.py::computed_once (or the
project-then-explode shape in functions/text.py::explode_tokens); this
tool finds the sites.

This audit found, in one pass: the k-means argmin substituted into an
inferred isnotnull, q_semdedup's sign-word fold appearing 10x in one
plan, q_pipeline_e2e's quality predicate cloned to the scan, and the 2x
tokenize in EVERY tokenize-explode query.

Known-clean exception: q_simhash_pairs keeps its `bit_count(xor) <= k`
inside the join condition on purpose (it prunes pairs in-join and
popcount is cheap), so that one hit is allowlisted.

Since round 5 the audit also runs inside pytest over the heaviest query
plans (tests/test_plan_audit.py), so a regression fails the suite, not
just this tool.

Usage: python tools/audit_plans.py [sf_dir]   (default sf0.001)
Exit code 0 iff no unexpected offender.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKERS = (
    "aggregate(",          # HOF vector/text folds
    "split(lower",         # tokenize
    "regexp_extract_all",  # BPE-ish token split
    "bit_count(",          # popcount chains
    "array_join(slice",    # n-gram builds
)
OPERATORS = (
    "Filter",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
)
ALLOW = {
    ("q_simhash_pairs", "bit_count("),
    # same deliberate in-join popcount prune, compound key scheme (r6)
    ("q_simhash_pairs_compound", "bit_count("),
}


# r12: expensive expressions INSIDE a lambdafunction body are the
# second double-compute class — HOFs are CodegenFallback with no
# subexpression elimination, so e.g. a tokenize referenced by the lambda
# re-runs once PER ELEMENT (O(tokens²) per row). Found q_line_dedup's
# boiler branch, plus bigrams(raw-tokenize) in q_repetition_ratio /
# q_dsir_select / q_ngram_jaccard and the pos scan in q_loss_mask.
# aggregate()/bit_count() folds are NOT flagged here: the fold body IS
# the per-element work (the r4 "don't unroll folds" result).
LAMBDA_MARKERS = ("split(lower", "regexp_extract_all")


def _lambda_bodies(plan: str):
    i = 0
    while True:
        j = plan.find("lambdafunction(", i)
        if j < 0:
            return
        k = j + len("lambdafunction(")
        depth, end = 1, k
        while depth and end < len(plan):
            c = plan[end]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            end += 1
        yield plan[k:end]
        i = k


def audit_query_plans(spark, queries, sf: str) -> list[str]:
    """Run the substitution audit over ``queries`` (name → builder).
    Returns human-readable offender strings; empty list == clean."""
    bad: list[str] = []
    for name, fn in queries.items():
        try:
            plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001 — report, keep auditing
            bad.append(f"{name}: PLAN-ERROR {type(ex).__name__}: {ex}")
            continue
        for line in plan.splitlines():
            node = line.strip().lstrip(":+- *(0123456789)")
            if not node.startswith(OPERATORS):
                continue
            for m in MARKERS:
                if m in node and (name, m) not in ALLOW:
                    bad.append(f"{name}: {m!r} inside {node[:110]}")
                    break
        for body in _lambda_bodies(plan):
            for m in LAMBDA_MARKERS:
                if m in body:
                    bad.append(
                        f"{name}: {m!r} inside lambdafunction body "
                        f"(per-element re-eval): {body[:90]}"
                    )
                    break
    return bad


def main() -> int:
    from vector_database_spark.queries import QUERIES
    from vector_database_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("audit_plans")
    spark.sparkContext.setLogLevel("ERROR")
    offenders = audit_query_plans(spark, QUERIES, sf)
    for line in offenders:
        print(line, flush=True)
    print(f"AUDIT {'CLEAN' if not offenders else f'FOUND {len(offenders)} site(s)'}")
    return 0 if not offenders else 1


if __name__ == "__main__":
    sys.exit(main())
