"""Cross-operator property checks (SURVEY §5.2 item 4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vector_database_spark.operators import dedup, textops
from vector_database_spark.sources.tables import read_table


def test_exact_dedup_idempotent(spark):
    docs = read_table(spark, SF_SMALL, "documents")
    aug = docs.unionByName(
        docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 9000).alias("doc_id"), "text", "lang", "source", "n_chars"
        )
    )
    once = dedup.exact_dedup(aug)
    twice = dedup.exact_dedup(once.drop("text_hash"))
    assert once.count() == twice.count()
    assert {r["doc_id"] for r in once.select("doc_id").collect()} == {
        r["doc_id"] for r in twice.select("doc_id").collect()
    }


def test_upsert_reapply_is_idempotent(spark, tmp_path):
    from vector_database_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "c"))
    col = cat.create_collection("p", dim=2)
    pts = spark.createDataFrame(
        [(i, [float(i), 1.0], {"k": "v"}) for i in range(10)],
        "id long, embedding array<float>, payload map<string,string>",
    )
    col.upsert(pts)
    col.upsert(pts)  # same batch again — latest wins, same logical state
    assert col.count() == 10
    assert col.df().select("id").distinct().count() == 10


def test_encode_decode_roundtrip_on_corpus(spark):
    """decode(encode(x)) == tokens of x with out-of-vocab replaced by [UNK]."""
    docs = read_table(spark, SF_SMALL, "documents").limit(20)
    full = read_table(spark, SF_SMALL, "documents")
    vocab = textops.build_vocab(full)
    vocab_tokens = {r["token"] for r in vocab.collect()}
    enc = textops.encode(docs, vocab)
    dec = {r["doc_id"]: r["decoded"] for r in textops.decode(enc, vocab).collect()}
    for r in docs.select("doc_id", "text").collect():
        toks = r["text"].lower().split()
        expect = " ".join(t if t in vocab_tokens else "[UNK]" for t in toks)
        assert dec[r["doc_id"]] == expect


def test_jaccard_verify_wide_vocab_fallback(spark):
    """A corpus with >4096 distinct tokens must take the array_intersect
    fallback (bitmask packing refuses) and still produce exact Jaccard."""
    import itertools

    # 40 docs × 250 tokens, odd docs share 150 with their predecessor:
    # distinct vocabulary = 20·250 + 20·100 = 7000 > MAX_BITMASK_VOCAB
    rows = []
    for d in range(40):
        toks = [f"tok{d}_{i}" for i in range(250)]
        if d % 2 == 1:
            toks[:150] = [f"tok{d-1}_{i}" for i in range(150)]
        rows.append((d, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    masks, _ = dedup._token_bitmasks(docs, "text", "doc_id")
    assert masks is None  # fallback path engaged

    pairs = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(range(40), 2)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_micro"]
        for r in dedup.jaccard_verify(pairs, docs, threshold=0.3).collect()
    }
    # exact expectation: 150 shared of 250+250-150=350 union → 0.428571…
    # micro6 = floor(150/350*1e6 + 0.5) = 428571
    for d in range(1, 40, 2):
        assert got[(d - 1, d)] == 428571
    # non-adjacent pairs share nothing → absent
    assert (0, 2) not in got


def test_minhash_contains_all_exact_dup_pairs(spark):
    """LSH candidates must never miss identical documents (J=1 collides in
    every band), so exact-dup pairs are a strict subset of minhash output."""
    docs = read_table(spark, SF_SMALL, "documents")
    copies = docs.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    aug = docs.unionByName(copies)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_neardup_pairs(aug).collect()
    }
    for i in range(30):
        assert (i, i + 5000) in pairs


def test_twophase_equals_window_on_tie_dense_grids(spark):
    """Adversarial equivalence sweep for the vectorized phase-1 pruning
    (r6): small-integer-grid vectors make MANY pairs share the exact same
    cosine micro key, so the (k+1)-th-largest partition threshold sits on
    a fat tie plateau — precisely where a '>' instead of '>=' (or a k
    instead of k+1) would silently drop a lower-id tie that the global
    window keeps. Full row equality (ids AND micro-quantized scores)
    against the exact window operator, across partitionings."""
    import numpy as np

    from vector_database_spark.operators import knn

    for seed in range(5):
        rng = np.random.RandomState(seed)
        n, dim, k = 240, 4, 4
        vecs = rng.randint(0, 3, size=(n, dim)).astype(float)  # dense ties
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).repartition(7)
        q_ids = [int(i) for i in rng.choice(n, size=3, replace=False)]
        queries = [(i, [float(x) for x in vecs[i]]) for i in q_ids]
        qdf = spark.createDataFrame(queries, "qid long, qv array<float>")

        exact = {
            (r["qid"], r["vec_id"], r["score"])
            for r in knn.knn_batch(qdf, df, k=k, payload_cols=()).collect()
        }
        two = {
            (r["qid"], r["vec_id"], r["score"])
            for r in knn.knn_batch_local_topk(queries, df, k=k).collect()
        }
        assert exact == two, f"seed {seed}: {exact ^ two}"


def test_simhash_compound_bands_equal_default_and_lossless(spark):
    """Manku C(6,3)=20 compound keys and the default 4×16-bit bands are
    BOTH lossless for Hamming ≤ 3, so on the same fingerprints they must
    produce the IDENTICAL verified pair set (r6 directive 6). Planted
    fingerprints at exact Hamming 1/2/3 from a base doc (bits flipped in
    up to 3 different blocks) must all surface; Hamming 4 must not."""
    rows = []
    base = 0x0123_4567_89AB_CDEF
    # flips chosen to land in DIFFERENT 11/10-bit blocks AND different
    # 16-bit bands — the adversarial case for banding
    rows.append((1, base))
    rows.append((2, base ^ (1 << 5)))                                 # H=1
    rows.append((3, base ^ (1 << 5) ^ (1 << 20)))                     # H=2
    rows.append((4, base ^ (1 << 5) ^ (1 << 20) ^ (1 << 40)))         # H=3
    rows.append((5, base ^ (1 << 5) ^ (1 << 20) ^ (1 << 40) ^ (1 << 60)))  # H=4
    rows.append((6, -(1 << 63) | 0x7FFF))  # negative fingerprint (bit 63 set)
    rows.append((7, (-(1 << 63) | 0x7FFF) ^ (1 << 62)))               # H=1 to 6
    sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
    default = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_band_pairs(sigs).collect()
    }
    compound = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_band_pairs(sigs, compound=True).collect()
    }
    assert default == compound
    assert (1, 2, 1) in default and (1, 3, 2) in default and (1, 4, 3) in default
    assert (6, 7, 1) in default  # sign-bit fingerprints band correctly
    assert not any(a == 1 and b == 5 for a, b, _ in default)  # H=4 excluded

    with pytest.raises(ValueError):
        dedup.simhash_band_pairs(sigs, max_hamming=4)


def test_incremental_dedup_flags_planted_and_only_incoming(spark):
    """Verbatim corpus copies in the incoming batch MUST be flagged
    (J=1 collides in every band); the verdict covers exactly the incoming
    ids (corpus-internal and incoming-internal pairs never surface)."""
    docs = read_table(spark, SF_SMALL, "documents")
    corpus = docs.filter(F.col("doc_id") < 300)
    incoming = (
        docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 350))
        .select("doc_id", "text")
        .unionByName(
            corpus.filter(F.col("doc_id") < 20).select(
                (F.col("doc_id") + 7000).alias("doc_id"), "text"
            )
        )
    )
    out = {r["doc_id"]: r for r in dedup.incremental_dedup(incoming, corpus).collect()}
    assert set(out) == set(range(300, 350)) | {7000 + i for i in range(20)}
    for i in range(20):
        r = out[7000 + i]
        assert r["is_dup"] and r["max_jaccard_micro"] == 1_000_000
        assert r["n_matches"] >= 1


def test_incremental_dedup_rejects_overlapping_ids(spark):
    """An incoming id already present in the corpus would fan the verify
    joins out and silently inflate n_matches — must raise instead."""
    import pytest

    docs = read_table(spark, SF_SMALL, "documents")
    corpus = docs.filter(F.col("doc_id") < 300)
    incoming = docs.filter((F.col("doc_id") >= 299) & (F.col("doc_id") < 320)).select(
        "doc_id", "text"
    )
    with pytest.raises(ValueError, match="disjoint ids"):
        dedup.incremental_dedup(incoming, corpus)


def _incremental_sides_small(spark):
    docs = read_table(spark, SF_SMALL, "documents")
    corpus = docs.filter(F.col("doc_id") < 300)
    incoming = (
        docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 350))
        .select("doc_id", "text")
        .unionByName(
            corpus.filter(F.col("doc_id") < 20).select(
                (F.col("doc_id") + 7000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz")).alias("text"),
            )
        )
    )
    return corpus, incoming


def test_incremental_auto_below_budget_identical_to_fixed(spark):
    """Below the cross-side candidate budget the auto operator must be
    bit-identical to incremental_dedup — the q_incremental_dedup_auto
    oracle contract (level-0 band keys are the same md5 family whether
    they come from the narrow or the wide index)."""
    corpus, incoming = _incremental_sides_small(spark)
    stats: dict = {}
    got = sorted(
        map(tuple, dedup.incremental_dedup_auto(
            incoming, corpus, stats=stats
        ).collect())
    )
    want = sorted(map(tuple, dedup.incremental_dedup(incoming, corpus).collect()))
    assert stats["level"] == 0 and len(stats["volumes"]) == 1
    assert got == want


def test_incremental_auto_cross_volume_probe_is_exact(spark):
    """The probe's Σ n_corpus × n_incoming over shared band keys must
    equal the row count the cross-side band join actually materializes
    (before distinct) — the number the budget bounds."""
    corpus, incoming = _incremental_sides_small(spark)
    corp_sigs = dedup.minhash_index_signatures(corpus).persist()
    inc_sigs = dedup.minhash_index_signatures(incoming).persist()
    first = dedup.MINHASH_ESCALATION_LEVELS[0]
    probed = dedup._cross_volumes(corp_sigs, inc_sigs, "doc_id", [first])[0]
    actual = (
        dedup.band_keys(corp_sigs, "doc_id", *first)
        .withColumnRenamed("bid", "id_a")
        .join(
            dedup.band_keys(inc_sigs, "doc_id", *first).withColumnRenamed(
                "bid", "id_b"
            ),
            "band_key",
        )
        .count()
    )
    corp_sigs.unpersist()
    inc_sigs.unpersist()
    assert probed == actual > 0


def test_incremental_auto_escalates_and_keeps_near_exact_recall(spark):
    """Forced over a tiny budget, the auto operator widens banding
    against the wide index columns (warning says so) and the planted
    near-exact (J≈0.95) incoming dups survive at the widest level."""
    import warnings

    corpus, incoming = _incremental_sides_small(spark)
    idx = dedup.minhash_index_signatures(corpus).persist()
    stats: dict = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = {
            r["doc_id"]: r
            for r in dedup.incremental_dedup_auto(
                incoming, corpus, corpus_index=idx,
                max_candidates=10, stats=stats,
            ).collect()
        }
    idx.unpersist()
    assert stats["level"] > 0 and stats["num_hashes"] > 8
    assert any("WIDENED" in str(x.message) for x in w)
    found = sum(1 for i in range(20) if out[7000 + i]["is_dup"])
    assert found >= 19, f"planted near-exact recall {found}/20 after widening"


def test_ladder_volumes_one_job_probe_matches_per_level_probe(spark):
    """The r11 one-job ladder probe must return exactly what the
    per-level minhash_candidate_volume probes return — the number the
    escalation walk trusts."""
    corpus, _ = _incremental_sides_small(spark)
    wide = dedup._wide_minhash_signatures(
        dedup._doc_tokens(corpus, "text", "doc_id"), "doc_id", 32
    ).persist()
    levels = list(dedup.MINHASH_ESCALATION_LEVELS)
    combined = dedup._ladder_volumes(wide, "doc_id", levels)
    singles = [
        dedup.minhash_candidate_volume(wide, "doc_id", nh, nb)
        for nh, nb in levels
    ]
    wide.unpersist()
    assert combined == singles and combined[0] > 0


def test_incremental_auto_empty_sides_are_graceful(spark):
    """An empty batch yields an empty verdict; a first-batch-vs-empty
    corpus yields all-fresh verdicts — no probes or joins may throw on
    the degenerate shapes an ingest loop hits at startup."""
    corpus, incoming = _incremental_sides_small(spark)
    empty = incoming.filter(F.lit(False))
    assert dedup.incremental_dedup_auto(empty, corpus).count() == 0
    out = dedup.incremental_dedup_auto(incoming, empty).collect()
    assert len(out) == incoming.count()
    assert all(not r["is_dup"] and r["n_matches"] == 0 for r in out)


def test_incremental_auto_band_counts_companion_is_equivalent(spark):
    """The persisted band-count companion (minhash_index_band_counts)
    must change the probe's COST, never its answer: identical per-level
    volumes, chosen level, and verdict rows vs the index-aggregating
    probe, through a forced escalation."""
    import warnings

    corpus, incoming = _incremental_sides_small(spark)
    idx = dedup.minhash_index_signatures(corpus).persist()
    counts = dedup.minhash_index_band_counts(idx).persist()
    outs, statss = [], []
    for kw in ({}, {"corpus_band_counts": counts}):
        stats: dict = {}
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            outs.append(sorted(map(tuple, dedup.incremental_dedup_auto(
                incoming, corpus, corpus_index=idx,
                max_candidates=10, stats=stats, **kw,
            ).collect())))
        statss.append(stats)
    idx.unpersist()
    counts.unpersist()
    assert statss[0]["volumes"] == statss[1]["volumes"]
    assert statss[0]["level"] == statss[1]["level"] > 0
    assert outs[0] == outs[1]


def test_incremental_auto_stale_counts_cannot_fake_zero_volumes(spark):
    """A band-count companion that predates the wide index (carries only
    level 0) must RESTRICT the ladder — not let the probe read a
    missing widened level as volume 0 and pick it unbounded; one missing
    level 0 entirely is a malformed table and raises."""
    import warnings

    import pytest

    corpus, incoming = _incremental_sides_small(spark)
    idx = dedup.minhash_index_signatures(corpus).persist()
    counts = dedup.minhash_index_band_counts(idx).persist()
    stale = counts.filter(F.col("__nh") == 8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        stats: dict = {}
        got = sorted(
            map(tuple, dedup.incremental_dedup_auto(
                incoming, corpus, corpus_index=idx,
                corpus_band_counts=stale, max_candidates=10, stats=stats,
            ).collect())
        )
    assert stats["level"] == 0 and stats["num_hashes"] == 8
    assert any("no widened banding level" in str(x.message) for x in w)
    want = sorted(map(tuple, dedup.incremental_dedup(incoming, corpus).collect()))
    assert got == want
    malformed = counts.filter(F.col("__nh") != 8)
    with pytest.raises(ValueError, match="lacks the level-0"):
        dedup.incremental_dedup_auto(
            incoming, corpus, corpus_index=idx, corpus_band_counts=malformed
        )
    idx.unpersist()
    counts.unpersist()


def test_incremental_auto_narrow_index_cannot_widen(spark):
    """A legacy 8-hash index over budget must warn that escalation is
    impossible and still produce the fixed-plan result at (8, 4)."""
    import warnings

    corpus, incoming = _incremental_sides_small(spark)
    narrow = dedup.minhash_signatures(corpus).persist()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        stats: dict = {}
        got = sorted(
            map(tuple, dedup.incremental_dedup_auto(
                incoming, corpus, corpus_index=narrow,
                max_candidates=10, stats=stats,
            ).collect())
        )
    narrow.unpersist()
    assert stats["level"] == 0 and stats["num_hashes"] == 8
    assert any("no widened banding level" in str(x.message) for x in w)
    want = sorted(map(tuple, dedup.incremental_dedup(incoming, corpus).collect()))
    assert got == want


def test_q_incremental_dedup_auto_raises_on_escalation(spark, monkeypatch):
    """The wrapper's oracle guard: ANY escalation on a driver fixture
    must raise (strict form of the q_dedup_minhash_auto guard)."""
    import pytest

    from vector_database_spark import queries
    from vector_database_spark.operators import dedup as dedup_mod

    def fake_auto(incoming, corpus, stats=None, **kw):
        if stats is not None:
            stats.update(level=1, num_hashes=16, bands=4)
        return incoming

    monkeypatch.setattr(dedup_mod, "incremental_dedup_auto", fake_auto)
    with pytest.raises(RuntimeError, match="escalated banding"):
        queries.q_incremental_dedup_auto(spark, SF_SMALL)


def test_filter_dsl_agrees_with_python_reference(spark):
    """Property check: random Qdrant filter specs evaluated by the Catalyst
    translator must agree row-for-row with a direct Python evaluator
    implementing Qdrant's documented semantics (all must, no must_not,
    >=1 should; missing keys never match)."""
    import random

    from vector_database_spark.filters import qdrant_filter

    rnd = random.Random(42)
    rows = [
        (i, {k: v for k, v in [("lang", rnd.choice(["en", "de", "fr", None])),
                               ("stars", rnd.choice(["1", "3", "5", None])),
                               ("src", rnd.choice(["a", "b", None]))] if v is not None})
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, payload map<string,string>")

    def gen_cond():
        kind = rnd.choice(["value", "any", "text", "range", "is_empty", "has_id"])
        key = rnd.choice(["lang", "stars", "src", "ghost"])
        if kind == "value":
            return {"key": key, "match": {"value": rnd.choice(["en", "de", "5", "a", "zz"])}}
        if kind == "any":
            return {"key": key, "match": {"any": rnd.sample(["en", "de", "1", "3", "b"], 2)}}
        if kind == "text":
            return {"key": key, "match": {"text": rnd.choice(["e", "5", "q"])}}
        if kind == "range":
            return {"key": "stars", "range": {"gte": rnd.choice([1, 2, 4])}}
        if kind == "is_empty":
            return {"is_empty": {"key": key}}
        return {"has_id": rnd.sample(range(60), 5)}

    def py_cond(c, rid, p):
        if "has_id" in c:
            return rid in c["has_id"]
        if "is_empty" in c:
            return c["is_empty"]["key"] not in p
        v = p.get(c["key"])
        if "match" in c:
            m = c["match"]
            if v is None:
                return False
            if "value" in m:
                return v == str(m["value"])
            if "any" in m:
                return v in [str(x) for x in m["any"]]
            if "text" in m:
                return m["text"] in v
        if "range" in c:
            if v is None:
                return False
            try:
                x = float(v)
            except ValueError:
                return False
            ok = True
            r = c["range"]
            if "gte" in r:
                ok &= x >= r["gte"]
            return ok
        raise AssertionError(c)

    for _ in range(12):
        spec = {}
        if rnd.random() < 0.8:
            spec["must"] = [gen_cond() for _ in range(rnd.randint(1, 2))]
        if rnd.random() < 0.5:
            spec["must_not"] = [gen_cond()]
        if rnd.random() < 0.5:
            spec["should"] = [gen_cond() for _ in range(rnd.randint(1, 2))]

        def py_match(rid, p):
            if not all(py_cond(c, rid, p) for c in spec.get("must", [])):
                return False
            if any(py_cond(c, rid, p) for c in spec.get("must_not", [])):
                return False
            sh = spec.get("should", [])
            return (not sh) or any(py_cond(c, rid, p) for c in sh)

        want = sorted(rid for rid, p in rows if py_match(rid, p))
        got = sorted(r["id"] for r in df.filter(qdrant_filter(spec)).collect())
        assert got == want, f"spec={spec}"


def test_connected_components_random_graph_matches_union_find(spark):
    import random

    from vector_database_spark.operators.dedup import connected_components

    rnd = random.Random(7)
    n = 200
    edges = sorted({(rnd.randrange(n), rnd.randrange(n)) for _ in range(150)})
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min id per component
    want = {}
    comp_min = {}
    for i in range(n):
        r = find(i)
        comp_min.setdefault(r, i)  # ids ascending → first seen is min
    for i in range(n):
        want[i] = comp_min[find(i)]

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs, nodes=nodes).collect()
    }
    assert got == want


def test_funnel_stage_counts_monotone_nonincreasing(spark):
    """A funnel can only narrow: each stage's user count <= the previous."""
    from vector_database_spark.queries import q_funnel_steps

    rows = {r["stage"]: r["n_users"] for r in q_funnel_steps(spark, SF_SMALL).collect()}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]
    assert rows["1_view"] > 0


def test_substring_dedup_flags_planted_copy(spark):
    """A verbatim copy of an earlier doc must be flagged with ALL its
    windows duplicated; the original must stay clean."""
    from vector_database_spark.queries import _SUBSTR_W  # noqa: F401
    import vector_database_spark.queries as q

    base = read_table(spark, SF_SMALL, "documents").filter(
        F.size(F.split(F.lower(F.col("text")), r"\s+")) >= 12
    ).limit(1).collect()[0]
    docs = spark.createDataFrame(
        [(1, base["text"]), (2, base["text"]), (3, "one two three")],
        "doc_id long, text string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: r for r in q.q_substring_dedup(spark, d).collect()}
    assert not out[1]["is_dup"]
    assert out[2]["is_dup"] and out[2]["n_dup_windows"] == out[2]["n_windows"] > 0
    assert not out[3]["is_dup"] and out[3]["n_windows"] == 0  # too short


def test_scd2_intervals_tile_each_user_timeline(spark):
    """Per user: exactly one current row, intervals are disjoint and
    chained (each valid_to equals the next valid_from)."""
    from vector_database_spark.queries import q_scd2_intervals
    from collections import defaultdict

    rows = q_scd2_intervals(spark, SF_SMALL).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from_us"])
        assert sum(1 for r in ivs if r["is_current"]) == 1
        assert ivs[-1]["valid_to_us"] is None and ivs[-1]["is_current"]
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
        # consecutive intervals represent a state CHANGE
        for a, b in zip(ivs, ivs[1:]):
            assert a["event_type"] != b["event_type"]


def test_gopher_rules_known_answers(spark):
    """Crafted docs hit each rule: a good doc keeps, a symbol-heavy doc
    and a stopword-free doc fail."""
    import vector_database_spark.queries as q
    import tempfile, os

    docs = spark.createDataFrame(
        [
            (1, "the cat sat of the mat and went to sleep"),      # keep
            (2, "# # # # # the of"),                               # symbols > 10%
            (3, "zebra xylophone quartz jumps vex"),               # no stopwords
            (4, "the of"),                                         # too few tokens
        ],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: r for r in q.q_gopher_rules(spark, d).collect()}
    assert out[1]["keep"]
    assert not out[2]["keep"] and out[2]["symbol_micro"] > 100_000
    assert not out[3]["keep"] and out[3]["n_stopwords"] == 0
    assert not out[4]["keep"] and out[4]["n_tokens"] < 5


def test_prefetch_rerank_recall_vs_exact(spark):
    """The two-leg prefetch shortlist must recover most of the exact
    cosine top-5 for the same query point (recall@5 >= 0.8)."""
    import vector_database_spark.queries as q
    from vector_database_spark.functions.vector import cosine, micro6

    got = [r["vec_id"] for r in q.q_prefetch_rerank(spark, SF_SMALL).collect()]
    emb = read_table(spark, SF_SMALL, "embeddings")
    qv = emb.filter(F.col("vec_id") == 5).select(F.col("embedding").alias("qv"))
    exact = [
        r["vec_id"]
        for r in emb.crossJoin(F.broadcast(qv))
        .select("vec_id", micro6(cosine(F.col("embedding"), F.col("qv"))).alias("s"))
        .orderBy(F.col("s").desc(), F.col("vec_id").asc())
        .limit(5)
        .collect()
    ]
    assert len(set(got) & set(exact)) >= 4


def test_topngram_flags_planted_repetition(spark):
    """A 'spam spam spam …' doc concentrates all chars in one 2-gram →
    keep=false; a diverse doc keeps."""
    import vector_database_spark.queries as q
    import tempfile, os

    # the diverse doc must be LONG: on a short doc even a unique 3-gram
    # exceeds 18% of the characters (Gopher's thresholds assume real docs)
    docs = spark.createDataFrame(
        [
            (1, " ".join(["spam"] * 30)),
            (2, " ".join(f"word{i}" for i in range(80))),
        ],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: r for r in q.q_topngram_fraction(spark, d).collect()}
    assert not out[1]["keep"] and out[1]["top2_frac_micro"] > 900_000
    assert out[2]["keep"]


def test_auto_default_rules_properties():
    """r7: the four scale-aware ANN defaults are total functions with the
    invariants the operators rely on — floors/caps hold, explicit values
    always pin, derived values are monotone in the driving quantity, and
    every result is a valid operating point for its operator."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vector_database_spark.operators import ann

    @settings(max_examples=300, deadline=None)
    @given(n=st.integers(min_value=0, max_value=10**14))
    def check_sizes(n):
        bits = ann._auto_lsh_bits(n)
        assert ann.LSH_BITS <= bits <= 16
        cells = ann._auto_n_centroids(n)
        assert 16 <= cells <= 4096
        ef = ann._auto_ef(None, n)
        assert ef >= ann.NSW_EF
        sl = ann._auto_shortlist(None, n)
        assert sl >= ann.PQ_SHORTLIST_FLOOR
        # monotone: more data never derives a SMALLER operating point
        if n > 0:
            smaller = n // 2
            assert ann._auto_lsh_bits(smaller) <= bits
            assert ann._auto_n_centroids(smaller) <= cells
            assert ann._auto_ef(None, smaller) <= ef
            assert ann._auto_shortlist(None, smaller) <= sl

    check_sizes()

    @settings(max_examples=300, deadline=None)
    @given(
        cells=st.integers(min_value=1, max_value=10**6),
        pin=st.integers(min_value=1, max_value=10**6),
    )
    def check_nprobe(cells, pin):
        np_auto = ann._auto_nprobe(None, cells)
        assert 1 <= np_auto <= cells          # always a probe-able point
        assert ann._auto_nprobe(pin, cells) == pin  # explicit pins
        if cells > 1:
            assert ann._auto_nprobe(None, cells - 1) <= np_auto

    check_nprobe()


def _tiny_vocab_docs(spark, n_docs=400, vocab=40, toks=10):
    """Deterministic low-vocab corpus (the boilerplate-heavy shape that
    makes fixed 2-rows-per-band banding go near-quadratic) + planted
    exact copies (i -> i+5000) and high-Jaccard near-copies (i -> i+7000,
    one token appended to 19 distinct = J ~ 0.905)."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(n_docs):
        toks_i = rng.sample(range(vocab), toks)
        rows.append((i, " ".join(f"t{t}" for t in toks_i)))
    planted_exact = [(i + 5000, txt) for i, txt in rows[:20]]
    wide = []
    for i in range(40):
        toks_i = rng.sample(range(vocab), 19)
        txt = " ".join(f"t{t}" for t in toks_i)
        wide.append((i + 6000, txt))
        if i < 20:
            wide.append((i + 7000, txt + " zz"))
    return spark.createDataFrame(
        rows + planted_exact + wide, "doc_id long, text string"
    )


def test_minhash_auto_escalates_and_keeps_planted_recall(spark):
    """r9 directive 4: the candidate-volume probe escalates banding on a
    degenerate corpus, the escalated volume is BOUNDED (monotone drop
    down the ladder), and recall on planted duplicates holds — exact
    copies at 100% (J=1 collides in every band at every level),
    high-Jaccard near-copies within the documented escalation trade."""
    import warnings

    docs = _tiny_vocab_docs(spark)
    stats: dict = {}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_neardup_pairs_auto(
                docs, max_candidates=800, stats=stats
            ).collect()
        }
    assert stats["level"] > 0  # escalation actually engaged
    assert any("escalated to" in str(w.message) for w in caught)
    vols = stats["volumes"]
    assert vols[0] > 800  # level 0 was over budget...
    assert vols[-1] < vols[0]  # ...and the ladder shrank the volume
    for i in range(20):  # exact copies: never lost
        assert (i, i + 5000) in pairs
    near_found = sum((i + 6000, i + 7000) in pairs for i in range(20))
    assert near_found >= 18  # J~0.905 at the escalated level: >=90%


def test_minhash_auto_df_prefilter_keeps_mid_jaccard_recall(spark):
    """r10 verdict directive 3: on a boilerplate-heavy corpus the
    escalation ladder's DF prefilter rung (drop tokens with df > 50%)
    must bound candidates WITHOUT widening bands — planted 0.72-Jaccard
    pairs (3 boilerplate + 1 content edit on 25 tokens, the mid-Jaccard
    range band-widening loses: 96% -> 49% -> 14%) stay >= 95% found.
    Dropping the shared boilerplate RAISES the pairs' effective Jaccard
    (their edits were mostly IN the dropped tokens: filtered-J 9/11 =
    0.82 vs raw 0.72) while unrelated template siblings fall apart."""
    import random
    import warnings

    rng = random.Random(7)
    pool = [f"b{i}" for i in range(25)]  # each doc takes 15 -> df 60%
    cvocab = [f"c{i}" for i in range(500)]
    rows = []
    for i in range(1500):
        rows.append((i, " ".join(rng.sample(pool, 15) + rng.sample(cvocab, 10))))
    planted = []
    for i in range(60):
        base = rows[i][1].split()
        bo, co = base[:15], base[15:]
        new_bo = bo[:-3] + rng.sample([t for t in pool if t not in bo], 3)
        new_co = co[:-1] + [f"c{500 + i}"]
        planted.append((i + 10000, " ".join(new_bo + new_co)))
    docs = spark.createDataFrame(rows + planted, "doc_id long, text string")

    stats: dict = {}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_neardup_pairs_auto(
                docs, max_candidates=20_000, stats=stats
            ).collect()
        }
    # the rung engaged: level 1, banding UNCHANGED, boilerplate dropped,
    # and the volume bound held (measured 178k -> ~2.8k)
    assert stats["level"] == 1
    assert (stats["num_hashes"], stats["bands"]) == (8, 4)
    assert stats["df_dropped_tokens"] == 25
    assert stats["volumes"][0] > 20_000
    assert stats["volumes"][-1] <= 20_000
    assert any(
        "mid-Jaccard recall preserved" in str(w.message) for w in caught
    )
    found = sum((i, i + 10000) in pairs for i in range(60))
    assert found >= 57, f"planted 0.72-J recall {found}/60 < 95%"


def test_minhash_df_rung_boundary_pair_survives(spark):
    """r11 review: a near-exact pair straddling the all-boilerplate
    boundary — doc A pure boilerplate, doc B = A + one content token
    (J = 15/16) — must survive the DF rung. The first cut's empty-set
    fallback kept A's full 15 tokens but shrank B to its single content
    token, so the pair shared no signature tokens; the
    MINHASH_DF_MIN_CONTENT_TOKENS floor makes both sides fall back to
    full sets together."""
    import random
    import warnings

    rng = random.Random(3)
    pool = [f"b{i}" for i in range(25)]
    cvocab = [f"c{i}" for i in range(500)]
    rows = []
    for i in range(1500):
        rows.append((i, " ".join(rng.sample(pool, 15) + rng.sample(cvocab, 10))))
    # the boundary pair: A = 15 boilerplate tokens only, B = A + "cxx"
    a_toks = rng.sample(pool, 15)
    rows.append((20000, " ".join(a_toks)))
    rows.append((20001, " ".join(a_toks + ["cxx"])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    stats: dict = {}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_neardup_pairs_auto(
                docs, max_candidates=20_000, stats=stats
            ).collect()
        }
    assert stats["level"] == 1 and stats["df_dropped_tokens"] == 25
    assert (20000, 20001) in pairs, "boundary near-exact pair lost"


def test_minhash_auto_below_budget_identical_to_fixed(spark):
    """Below the candidate budget the auto operator must be bit-identical
    to minhash_neardup_pairs — the q_dedup_minhash_auto oracle contract."""
    docs = _tiny_vocab_docs(spark)
    stats: dict = {}
    auto = {
        (r["id_a"], r["id_b"], r["jaccard_micro"])
        for r in dedup.minhash_neardup_pairs_auto(
            docs, max_candidates=10_000_000, stats=stats
        ).collect()
    }
    assert stats["level"] == 0
    fixed = {
        (r["id_a"], r["id_b"], r["jaccard_micro"])
        for r in dedup.minhash_neardup_pairs(docs).collect()
    }
    assert auto == fixed


def test_q_dedup_minhash_auto_raises_on_oracle_scale_escalation(
    spark, monkeypatch
):
    """The q_dedup_minhash_auto wrapper must fail LOUDLY (not as a bare
    oracle diff) if escalation ever fires at an oracle-scale sf — the
    DuckDB oracle is only valid at level 0 (ADVICE r10). Escalation is
    simulated by stubbing the operator; at real oracle sfs the level-0
    volume sits far under the default budget."""
    import pytest

    from vector_database_spark import queries
    from vector_database_spark.operators import dedup as dedup_mod

    fake_n_docs = {"n": 1000}

    def fake_auto(docs, stats=None, **kw):
        if stats is not None:
            stats.update(
                level=1, num_hashes=16, bands=4, n_docs=fake_n_docs["n"]
            )
        return docs

    monkeypatch.setattr(dedup_mod, "minhash_neardup_pairs_auto", fake_auto)
    # the odd-path cases below never touch the filesystem
    monkeypatch.setattr(
        queries,
        "_docs_with_near_dups",
        lambda _spark, _sf: spark.createDataFrame(
            [(0, "x")], "doc_id long, text string"
        ),
    )
    with pytest.raises(RuntimeError, match="oracle-scale"):
        queries.q_dedup_minhash_auto(spark, "/root/testdata/sf0.001")
    # non-oracle sf: escalation is by design, no raise
    queries.q_dedup_minhash_auto(spark, "/root/testdata/sf0.1")
    # un-parseable path must not fail OPEN (r11 review): the corpus-size
    # fallback catches an oracle-scale corpus behind a renamed dir...
    with pytest.raises(RuntimeError, match="oracle-scale"):
        queries.q_dedup_minhash_auto(spark, "/root/testdata/sf0.001-copy")
    # ...while an sf0.1-sized corpus (~5,100 docs — escalation is by
    # design there) behind an odd path stays allowed
    fake_n_docs["n"] = 5_100
    queries.q_dedup_minhash_auto(spark, "/root/testdata/sf0.001-copy")
