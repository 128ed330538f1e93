"""Doc-drift tripwires: the review passes keep finding stale registry
counts and dangling query references in the coverage docs — make the
contract mechanical. These tests intentionally read the repo's own
markdown so that adding/removing a query without updating the docs (or
vice versa) fails the suite instead of surfacing in review."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry():
    from vector_database_spark.queries import ORACLES, QUERIES

    return QUERIES, ORACLES


def test_every_coverage_query_reference_exists():
    QUERIES, _ = _registry()
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    referenced = set(re.findall(r"`(q_[a-z0-9_]+)`", text))
    missing = sorted(referenced - set(QUERIES))
    assert not missing, f"COVERAGE.md references unknown queries: {missing}"


def test_every_bench_headliner_exists():
    QUERIES, _ = _registry()
    import bench

    missing = sorted(set(bench.BENCH_QUERIES) - set(QUERIES))
    assert not missing, f"bench.py lists unknown queries: {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES), "duplicates"


def test_readme_counts_match_registry():
    QUERIES, ORACLES = _registry()
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+) queries, (\d+) with DuckDB", text)
    assert m, "README should state the registry counts"
    assert (int(m.group(1)), int(m.group(2))) == (len(QUERIES), len(ORACLES)), (
        f"README says {m.groups()}, registry is {len(QUERIES)}/{len(ORACLES)}"
    )


def test_every_oracle_has_a_query():
    QUERIES, ORACLES = _registry()
    dangling = sorted(set(ORACLES) - set(QUERIES))
    assert not dangling, f"oracles with no query: {dangling}"
