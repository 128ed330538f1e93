"""Persisted tokenizer artifacts — save/load for trained subword models
(unigram vocabularies, BPE merge tables).

Why this exists: the trainers (operators/unigram_lm.py::train_unigram,
operators/bpe.py::learn_bpe, operators/textops.py::bpe_learn) return
driver-side model objects, which is the right shape for a training JOB
but not for a PIPELINE — production encodes in many later processes
(batch encode jobs, streaming ingest, serving) against one frozen
artifact. This module is that artifact: a parquet payload plus a JSON
meta, written staged-then-renamed so a crash mid-save can never leave a
half-written model where a reader finds it (the same discipline as the
catalog's index commits, catalog.py::_refresh_protocol — simplified to
the single-writer case a model registry is).

Round-trip is EXACT: unigram log-probs are IEEE doubles and parquet
stores them bit-for-bit, so an encode against a reloaded model is
asserted identical to an encode against the in-memory one
(tests/test_tokenizer_store.py). Layout:

    <path>/meta.json                {kind, format_version, params, n}
    <path>/payload/…parquet         the model rows (schema per kind)

Reference parity: the reference persists its word vocab with the torch
checkpoint (transformer_sample.py:414-433); here the tokenizer is a
first-class engine artifact independent of any model checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession

FORMAT_VERSION = 1
_META = "meta.json"
_PAYLOAD = "payload"

_UNIGRAM_SCHEMA = "piece STRING, logprob DOUBLE"
_BPE_SCHEMA = (
    "merge_rank INT, left STRING, right STRING, merged STRING, pair_count LONG"
)


def _swap_in(staging: str, path: str) -> None:
    """Atomically promote a fully-written staging dir to ``path``.
    Crash-safe for readers: the old artifact moves aside BEFORE the new
    one lands, and _resolve() falls back to the aside if a crash strikes
    between the two renames."""
    aside = path + ".old"
    # complete a previously-torn swap FIRST: if only the aside survives,
    # restoring it before anything is deleted keeps a readable artifact
    # through every intermediate state of THIS swap too
    if not os.path.exists(path) and os.path.exists(aside):
        os.rename(aside, path)
    if os.path.exists(aside):
        shutil.rmtree(aside)
    if os.path.exists(path):
        os.rename(path, aside)
    os.rename(staging, path)
    if os.path.exists(aside):
        shutil.rmtree(aside)


def _resolve(path: str) -> str:
    """The readable artifact dir: ``path``, or the ``.old`` aside a
    crashed swap left behind."""
    if os.path.exists(os.path.join(path, _META)):
        return path
    aside = path + ".old"
    if os.path.exists(os.path.join(aside, _META)):
        return aside
    raise FileNotFoundError(f"no tokenizer artifact at {path}")


def _save(spark, path, kind, schema, rows, params) -> None:
    staging = f"{path}.staging-{os.getpid()}"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    os.makedirs(staging)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(staging, _PAYLOAD))
    meta = {
        "kind": kind,
        "format_version": FORMAT_VERSION,
        "params": params or {},
        "n": len(rows),
    }
    with open(os.path.join(staging, _META), "w") as f:
        json.dump(meta, f)
    _swap_in(staging, path)


def _load(spark, path, kind):
    base = _resolve(path)
    with open(os.path.join(base, _META)) as f:
        meta = json.load(f)
    if meta["kind"] != kind:
        raise ValueError(
            f"tokenizer at {path} is kind={meta['kind']!r}, expected {kind!r}"
        )
    if meta["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"tokenizer at {path} has format_version={meta['format_version']}"
            f" > supported {FORMAT_VERSION}"
        )
    rows = spark.read.parquet(os.path.join(base, _PAYLOAD)).collect()
    return meta, rows


def save_unigram(
    spark: SparkSession,
    path: str,
    model: list[tuple[str, float]],
    params: dict | None = None,
) -> None:
    """Persist a trained unigram model ([(piece, logprob)])."""
    _save(spark, path, "unigram", _UNIGRAM_SCHEMA, list(model), params)


def load_unigram(spark: SparkSession, path: str) -> list[tuple[str, float]]:
    """Reload a unigram model, sorted by piece (train_unigram's output
    contract) — log-probs round-trip bit-exactly through parquet."""
    _, rows = _load(spark, path, "unigram")
    return sorted((r["piece"], r["logprob"]) for r in rows)


def save_bpe(
    spark: SparkSession,
    path: str,
    merges: list[tuple[int, str, str, str, int]],
    params: dict | None = None,
) -> None:
    """Persist a learned BPE merge table (bpe_learn / learn_bpe rows)."""
    _save(spark, path, "bpe", _BPE_SCHEMA, list(merges), params)


def load_bpe(spark: SparkSession, path: str) -> list[tuple[int, str, str, str, int]]:
    """Reload a BPE merge table in rank order (the application order
    both bpe_encode strategies require)."""
    _, rows = _load(spark, path, "bpe")
    return sorted(
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in rows
    )


def describe(path: str) -> dict:
    """The artifact's meta (kind, params, n) without loading rows."""
    with open(os.path.join(_resolve(path), _META)) as f:
        return json.load(f)
