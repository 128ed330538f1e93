"""filters.qdrant_filter — Qdrant Filter-DSL translation semantics.

The load-bearing deltas from naive SQL translation:
  * missing payload keys never match (coalesce-to-FALSE), so must_not on
    an absent key KEEPS the row (Qdrant two-valued logic, not SQL NULL)
  * should = at least one; nested filters recurse
"""

from __future__ import annotations

import pytest

from vector_database_spark.filters import qdrant_filter


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(
        [
            (1, {"lang": "en", "stars": "5"}),
            (2, {"lang": "de", "stars": "2"}),
            (3, {"lang": "en"}),  # no stars key
            (4, {"stars": "4"}),  # no lang key
        ],
        "id long, payload map<string,string>",
    )


def ids(df):
    return sorted(r["id"] for r in df.collect())


def test_match_value_and_missing_key(pts):
    assert ids(pts.filter(qdrant_filter({"must": [{"key": "lang", "match": {"value": "en"}}]}))) == [1, 3]


def test_must_not_keeps_missing_key_rows(pts):
    # Qdrant: id=4 has no lang, so "lang must_not be en" matches it
    f = {"must_not": [{"key": "lang", "match": {"value": "en"}}]}
    assert ids(pts.filter(qdrant_filter(f))) == [2, 4]


def test_range_and_should(pts):
    f = {
        "must": [{"key": "stars", "range": {"gte": 3}}],
        "should": [
            {"key": "lang", "match": {"value": "en"}},
            {"key": "stars", "match": {"value": "4"}},
        ],
    }
    # stars>=3 → {1,4}; should: lang=en (1) or stars=4 (4) → both survive
    assert ids(pts.filter(qdrant_filter(f))) == [1, 4]


def test_match_any_except_text(pts):
    assert ids(pts.filter(qdrant_filter({"must": [{"key": "lang", "match": {"any": ["de", "fr"]}}]}))) == [2]
    assert ids(pts.filter(qdrant_filter({"must": [{"key": "lang", "match": {"except": ["en"]}}]}))) == [2]
    assert ids(pts.filter(qdrant_filter({"must": [{"key": "lang", "match": {"text": "e"}}]}))) == [1, 2, 3]


def test_has_id_and_is_empty(pts):
    assert ids(pts.filter(qdrant_filter({"must": [{"has_id": [2, 3]}]}))) == [2, 3]
    assert ids(pts.filter(qdrant_filter({"must": [{"is_empty": {"key": "stars"}}]}))) == [3]


def test_nested_filter_recursion(pts):
    # (lang=en) AND (stars=5 OR stars missing)
    f = {
        "must": [
            {"key": "lang", "match": {"value": "en"}},
            {
                "should": [
                    {"key": "stars", "match": {"value": "5"}},
                    {"is_empty": {"key": "stars"}},
                ]
            },
        ]
    }
    assert ids(pts.filter(qdrant_filter(f))) == [1, 3]


def test_empty_filter_matches_all(pts):
    assert ids(pts.filter(qdrant_filter({}))) == [1, 2, 3, 4]


def test_unsupported_condition_raises(pts):
    with pytest.raises(ValueError, match="unsupported"):
        qdrant_filter({"must": [{"key": "x", "match": {"phrase": "y"}}]})


def test_collection_search_accepts_dsl(spark, tmp_path):
    from pyspark.sql import functions as F

    from vector_database_spark.catalog import Catalog
    from vector_database_spark.filters import qdrant_filter

    cat = Catalog(spark, str(tmp_path / "c"))
    col = cat.create_collection("f", dim=2, metric="dot")
    col.upsert(
        spark.createDataFrame(
            [
                (1, [1.0, 0.0], {"lang": "en"}),
                (2, [0.9, 0.0], {"lang": "de"}),
            ],
            "id long, embedding array<float>, payload map<string,string>",
        )
    )
    hits = col.search(
        [1.0, 0.0],
        payload_filter=qdrant_filter({"must": [{"key": "lang", "match": {"value": "de"}}]}),
    )
    assert [r["id"] for r in hits.collect()] == [2]


def test_dot_path_keys_walk_nested_payloads(spark):
    nested = spark.createDataFrame(
        [(1, {"meta": {"age": "30"}}), (2, {"meta": {"age": "7"}}), (3, {})],
        "id long, payload map<string,map<string,string>>",
    )
    f = {"must": [{"key": "meta.age", "range": {"gte": 18}}]}
    assert [r["id"] for r in nested.filter(qdrant_filter(f)).collect()] == [1]
