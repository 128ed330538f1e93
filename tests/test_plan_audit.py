"""Round-5 directive #8: the substitution audit (tools/audit_plans.py)
runs inside pytest, not only as a standalone tool — zero duplicated
generator/fold subtrees inside Filter/Join nodes of the heaviest query
plans. The tokenize-once projection (functions/text.py::explode_tokens)
and the pinned fold expressions (functions/vector.py::computed_once) are
load-bearing for every tokenize/n-gram/scoring query; a Catalyst upgrade
or a careless refactor re-introducing the clone must fail the suite."""

from __future__ import annotations

from tests.conftest import SF_SMALL
from tools.audit_plans import audit_query_plans

# the heaviest plans by BENCH_r04 wall time, plus the plans the round-4
# audit actually caught offenders in (kmeans/semdedup/pipeline_e2e)
HEAVY_QUERIES = (
    "q_incremental_dedup",
    "q_dedup_minhash",
    "q_vocab_build",
    "q_knn_lsh",
    "q_retrieval_metrics",
    "q_quality_score",
    "q_substring_dedup",
    "q_simhash_pairs",
    # round-6 additions: explode-once banding (compound keys), the
    # two-phase micro-keyed batch k-NN, and the indexed incremental path
    "q_simhash_pairs_compound",
    "q_knn_twophase",
    "q_incremental_dedup_indexed",
    # r11: the volume-bounded incremental path (wide-index band join)
    "q_incremental_dedup_auto",
    "q_semdedup",
    "q_semdedup_kmeans",
    "q_kmeans_clusters",
    "q_pipeline_e2e",
    "q_decontaminate",
    "q_winnow_fingerprint",
)


def test_no_substituted_expensive_expressions_in_heavy_plans(spark):
    from vector_database_spark.queries import QUERIES

    subset = {name: QUERIES[name] for name in HEAVY_QUERIES}
    assert len(subset) == len(HEAVY_QUERIES)
    offenders = audit_query_plans(spark, subset, SF_SMALL)
    assert not offenders, "\n".join(offenders)
