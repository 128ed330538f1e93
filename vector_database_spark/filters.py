"""Qdrant filter-DSL → Catalyst ``Column`` translator.

The reference's query surface accepts Qdrant ``Filter`` objects (the JSON
DSL with ``must`` / ``should`` / ``must_not`` clause lists — the shape
``client.search(..., query_filter=Filter(...))`` consumes,
vector_db_query.py:78-82's optional filter arm). This module lets a user
of the reference bring those filter dicts unchanged: ``qdrant_filter``
compiles one into a boolean ``Column`` usable in ``df.filter`` /
``VectorCollection.search(payload_filter=...)``.

Because the output is a plain Catalyst predicate, everything downstream is
free: Parquet predicate pushdown, partition pruning on tenant/bucket
columns, and whole-stage codegen — the DSL costs nothing at plan time.

Condition forms (the Qdrant condition union):
  {"key": k, "match": {"value": v}}      equality
  {"key": k, "match": {"any": [...]}}    IN
  {"key": k, "match": {"except": [...]}} NOT IN
  {"key": k, "match": {"text": t}}       substring full-text match
  {"key": k, "range": {gt|gte|lt|lte}}   numeric range (payload cast DOUBLE)
  {"is_empty": {"key": k}}               key missing / null
  {"is_null": {"key": k}}                alias of is_empty for map payloads
  {"has_id": [ids]}                      id membership
  {"must"/"should"/"must_not": [...]}    nested filter (recursive)

Clause semantics (Qdrant's): ALL of ``must``, NONE of ``must_not``, and —
when present — at least ONE of ``should``. Missing payload keys make a
condition NOT match (never SQL-unknown): every leaf is coalesced to FALSE
before negation, so ``must_not`` on an absent key keeps the row, exactly
like Qdrant, instead of three-valued-logic dropping it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def _str(v) -> str:
    # payloads are map<string,string>: booleans serialize lowercase like JSON
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _leaf(cond: dict, payload_col: str, id_col: str) -> Column:
    if "has_id" in cond:
        return F.col(id_col).isin([int(i) for i in cond["has_id"]])
    if "is_empty" in cond:
        return F.col(payload_col).getItem(cond["is_empty"]["key"]).isNull()
    if "is_null" in cond:
        return F.col(payload_col).getItem(cond["is_null"]["key"]).isNull()
    key = cond["key"]
    # Qdrant dot-path keys ("metadata.age") walk nested payload structs/maps
    val = F.col(payload_col)
    for part in key.split("."):
        val = val.getItem(part)
    if "match" in cond:
        m = cond["match"]
        if "value" in m:
            return val == F.lit(_str(m["value"]))
        if "any" in m:
            return val.isin([_str(x) for x in m["any"]])
        if "except" in m:
            # Qdrant MatchExcept: present-and-not-in; missing keys handled
            # by the coalesce-to-false wrapper like every other leaf
            return ~val.isin([_str(x) for x in m["except"]])
        if "text" in m:
            return val.contains(m["text"])
        raise ValueError(f"unsupported match condition: {sorted(m)}")
    if "range" in cond:
        num = val.cast("double")
        parts = []
        r = cond["range"]
        if "gt" in r:
            parts.append(num > float(r["gt"]))
        if "gte" in r:
            parts.append(num >= float(r["gte"]))
        if "lt" in r:
            parts.append(num < float(r["lt"]))
        if "lte" in r:
            parts.append(num <= float(r["lte"]))
        if not parts:
            raise ValueError("empty range condition")
        return reduce(lambda a, b: a & b, parts)
    raise ValueError(f"unsupported condition: {sorted(cond)}")


def qdrant_filter(
    spec: dict, payload_col: str = "payload", id_col: str = "id"
) -> Column:
    """Compile a Qdrant Filter dict into a boolean Catalyst Column."""

    def cond(c: dict) -> Column:
        if {"must", "should", "must_not"} & set(c):
            return build(c)
        # two-valued logic: an absent key never matches (and therefore
        # survives must_not) — Qdrant semantics, not SQL NULL semantics
        return F.coalesce(_leaf(c, payload_col, id_col), F.lit(False))

    def build(f: dict) -> Column:
        parts = [cond(c) for c in f.get("must", [])]
        parts += [~cond(c) for c in f.get("must_not", [])]
        should = [cond(c) for c in f.get("should", [])]
        if should:
            parts.append(reduce(lambda a, b: a | b, should))
        if not parts:
            return F.lit(True)
        return reduce(lambda a, b: a & b, parts)

    return build(spec)
