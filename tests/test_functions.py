"""Column-function unit + property tests (SURVEY §5.2 items 3-4)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_database_spark.functions.embed import embed_query_text, hash_embed_one
from vector_database_spark.functions.hashing import portable_hash, portable_hash_sql
from vector_database_spark.functions.text import bigrams, char_shingles, tokenize_ws
from vector_database_spark.functions.vector import cosine, dot, l2_dist, l2_norm, micro6


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _arr(vals):
    return F.array(*[F.lit(float(v)) for v in vals])


def test_vector_known_answers(spark):
    a, b = _arr([1, 0, 0]), _arr([0, 1, 0])
    assert _one(spark, dot(a, b)) == 0.0
    assert _one(spark, cosine(a, a)) == 1.0
    assert _one(spark, l2_norm(_arr([3, 4, 0]))) == 5.0
    assert _one(spark, l2_dist(a, b)) == pytest.approx(2**0.5)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.floats(-10, 10).filter(lambda x: abs(x) > 1e-3), min_size=3, max_size=3),
    st.lists(st.floats(-10, 10).filter(lambda x: abs(x) > 1e-3), min_size=3, max_size=3),
)
def test_cosine_properties(spark, va, vb):
    """cosine symmetry and [-1, 1] bounds (SURVEY §5.2 item 4)."""
    ab = _one(spark, cosine(_arr(va), _arr(vb)))
    ba = _one(spark, cosine(_arr(vb), _arr(va)))
    assert ab == pytest.approx(ba, abs=1e-12)
    assert -1.0 - 1e-9 <= ab <= 1.0 + 1e-9


def test_portable_hash_matches_duckdb(spark):
    """The md5-derived hash family is bit-identical across engines — the
    foundation of every oracle-checkable dedup operator."""
    samples = ["", "a", "hello world", "zz", "0:tok", "x" * 100]
    sdf = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: r["h"]
        for r in sdf.select("s", portable_hash(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for s in samples:
        expect = con.execute(f"SELECT {portable_hash_sql('$1')}", [s]).fetchone()[0]
        assert got[s] == expect, s


def test_micro6_matches_duckdb_floor(spark):
    vals = [0.6620065, 0.25, 1.0, 0.3390625, 0.0000005, 123.4567894999]
    sdf = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["v"]: r["m"] for r in sdf.select("v", micro6(F.col("v")).alias("m")).collect()}
    con = duckdb.connect()
    for v in vals:
        expect = con.execute(
            "SELECT CAST(floor($1 * 1000000.0 + 0.5) AS BIGINT)", [v]
        ).fetchone()[0]
        assert got[v] == expect, v


def test_bigrams_and_shingles_edges(spark):
    df = spark.createDataFrame([("a b c",), ("single",)], "text string")
    rows = df.select(bigrams(tokenize_ws(F.col("text"))).alias("g")).collect()
    assert rows[0]["g"] == ["a b", "b c"]
    assert rows[1]["g"] == []
    rows = df.select(char_shingles(F.col("text"), 5).alias("s")).collect()
    assert rows[0]["s"] == ["a b c"]
    assert rows[1]["s"] == ["singl", "ingle"]


def test_hash_embedder_deterministic_and_normalized():
    v1 = hash_embed_one("hello", 64)
    v2 = embed_query_text("hello", 64)
    assert v1 == v2
    assert len(v1) == 64
    assert sum(x * x for x in v1) == pytest.approx(1.0, abs=1e-9)
    assert hash_embed_one("other", 64) != v1


def test_embed_udf_real_model_path_mock_transformers(spark, tmp_path):
    """The documented torch/transformers drop-in (functions/embed.py:16-30,
    reference vector_db.py:43-63) executed end-to-end WITHOUT torch
    installed (VERDICT r5 directive 7): a fake ``torch``/``transformers``
    is installed in the WORKER by the encoder constructor, imported exactly
    as the docstring's recipe does, and every model init / forward batch is
    logged to a shared directory. Asserts the iterator-UDF contract the
    recipe relies on: from_pretrained runs once per task (model reuse
    across Arrow batches — never per row, never per batch), and the data
    arrives in multi-row Arrow batches."""
    import glob

    from pyspark.sql import functions as F

    from vector_database_spark.functions.embed import make_embed_udf

    log_dir = str(tmp_path)
    dim = 8

    def make_fake_resnet_encoder():
        # runs IN the python worker: install fakes, then follow the
        # docstring recipe verbatim (import torch / from transformers ...)
        import os
        import sys
        import types
        import uuid

        import numpy as np

        # The fakes persist in REUSED python workers (spark.python.worker
        # .reuse), where pyspark.testing.utils probes find_spec("torch") at
        # import time inside the applyInPandasWithState worker path — a
        # module whose __spec__ is None makes that RAISE (ValueError:
        # torch.__spec__ is None), which is exactly the cross-test streaming
        # flake seen in full-suite runs. Every fake therefore carries a real
        # ModuleSpec, a fake-marker for the post-test sweep, and is removed
        # from the worker pool after the assertions below.
        import importlib.machinery

        if "torch" not in sys.modules:
            fake_torch = types.ModuleType("torch")
            fake_torch.__spec__ = importlib.machinery.ModuleSpec(
                "torch", loader=None
            )
            fake_torch.__vdbs_fake__ = True

            class _NoGrad:
                def __enter__(self):
                    return self

                def __exit__(self, *a):
                    return False

            fake_torch.no_grad = _NoGrad
            sys.modules["torch"] = fake_torch
        if "transformers" not in sys.modules:
            fake_tr = types.ModuleType("transformers")
            fake_tr.__spec__ = importlib.machinery.ModuleSpec(
                "transformers", loader=None
            )
            fake_tr.__vdbs_fake__ = True

            class ResNetModel:
                @classmethod
                def from_pretrained(cls, name):
                    with open(
                        f"{log_dir}/init_{os.getpid()}_{uuid.uuid4().hex}", "w"
                    ) as fh:
                        fh.write(name)
                    return cls()

                def eval(self):
                    return self

                def forward_batch(self, texts):
                    return [
                        (np.arange(dim, dtype=np.float64) + len(str(t))).tolist()
                        for t in texts
                    ]

            fake_tr.ResNetModel = ResNetModel
            sys.modules["transformers"] = fake_tr

        import torch
        from transformers import ResNetModel

        model = ResNetModel.from_pretrained("microsoft/resnet-50").eval()

        def encode(series):
            with open(
                f"{log_dir}/batch_{os.getpid()}_{uuid.uuid4().hex}_{len(series)}",
                "w",
            ):
                pass
            with torch.no_grad():
                return model.forward_batch(series)

        return encode

    n_rows, n_parts = 600, 2
    df = spark.range(n_rows).repartition(n_parts).select(
        F.concat(F.lit("doc "), F.col("id")).alias("text")
    )
    udf = make_embed_udf(make_fake_resnet_encoder, dim=dim)
    # force several Arrow batches per task so reuse-across-batches is
    # observable (restored after — session fixture is shared)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        out = df.select(udf(F.col("text")).alias("emb")).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert len(out) == n_rows
    assert all(len(r["emb"]) == dim for r in out)

    inits = glob.glob(f"{log_dir}/init_*")
    batches = glob.glob(f"{log_dir}/batch_*")
    batch_sizes = [int(p.rsplit("_", 1)[1]) for p in batches]
    # model loaded once per task, NOT per batch or per row
    assert 1 <= len(inits) <= n_parts
    assert sum(batch_sizes) == n_rows
    # Arrow batching: multi-row batches, several per task, model reused
    assert max(batch_sizes) > 1
    assert len(batches) > len(inits)

    # Sweep the fakes back OUT of the reused worker pool: a lingering fake
    # torch (even with a valid __spec__) would make any later worker-side
    # `import torch` succeed with a non-functional stub. Far more cleanup
    # tasks than workers, so every idle reused worker takes at least one.
    def _evict_fakes(it):
        import sys

        for mod in ("torch", "transformers"):
            m = sys.modules.get(mod)
            if m is not None and getattr(m, "__vdbs_fake__", False):
                del sys.modules[mod]
        for pdf in it:
            yield pdf

    spark.range(2048).repartition(256).mapInPandas(
        _evict_fakes, "id long"
    ).write.mode("overwrite").format("noop").save()


def test_connected_components_known_graph(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, singleton 99
    from vector_database_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 99]], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_pb_shim_never_patches_a_real_protobuf(tmp_path):
    """r8 directive 8 (pb_shim fence): in an environment where a REAL
    google.protobuf is importable, neither pb_shim.enable_driver() nor the
    worker sitecustomize may no-op its ValidateProtobufRuntimeVersion gate
    or ship worker env — even with a stale SPARK_GRAFT_PB_SHIM exported.
    Simulated in a SUBPROCESS with a fake 'real install' first on sys.path
    (this process's protobuf IS the vendored one, so precedence can't be
    probed in-process)."""
    import os
    import subprocess
    import sys

    real = tmp_path / "site-packages" / "google" / "protobuf"
    real.mkdir(parents=True)
    (tmp_path / "site-packages" / "google" / "__init__.py").write_text(
        "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n"
    )
    (real / "__init__.py").write_text("")
    (real / "runtime_version.py").write_text(
        "SENTINEL = 'real-install'\n"
        "def ValidateProtobufRuntimeVersion(*a, **k):\n"
        "    return 'REAL-GATE-RAN'\n"
    )
    (real / "descriptor.py").write_text("_USE = 'real'\n")

    probe = r"""
import os, sys
sys.path.insert(0, os.environ["FAKE_SITE"])   # the 'real install' wins
sys.path.insert(0, os.environ["REPO"])
from vector_database_spark.compat import pb_shim
ok = pb_shim.enable_driver()
from google.protobuf import runtime_version as rv
assert ok, "enable_driver must report protobuf importable"
assert getattr(rv, "SENTINEL", None) == "real-install", rv.__file__
assert rv.ValidateProtobufRuntimeVersion() == "REAL-GATE-RAN", (
    "enable_driver no-op'd a REAL install's version gate")
assert pb_shim.worker_env() == {}, "worker_env must not ship the shim"

# worker half: sitecustomize with a stale SPARK_GRAFT_PB_SHIM pointing at
# the actual vendored dir must still leave the real gate intact
vendored = pb_shim.find_vendored_protobuf()
if vendored:
    os.environ["SPARK_GRAFT_PB_SHIM"] = vendored
    sc = os.path.join(os.path.dirname(pb_shim.__file__), "pb_shim_path",
                      "sitecustomize.py")
    exec(compile(open(sc).read(), sc, "exec"), {"__name__": "sitecustomize"})
    assert rv.ValidateProtobufRuntimeVersion() == "REAL-GATE-RAN", (
        "sitecustomize no-op'd a REAL install's version gate")
print("FENCE-OK")
"""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("SPARK_GRAFT_PB_SHIM", "PYTHONPATH")
    }
    env["FAKE_SITE"] = str(tmp_path / "site-packages")
    env["REPO"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    out = subprocess.run(
        [sys.executable, "-c", probe], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert "FENCE-OK" in out.stdout


def test_pb_shim_activates_only_without_real_protobuf(tmp_path):
    """The complement: with NO protobuf importable, enable_driver activates
    the vendored runtime (when the host ships one) and no-ops ONLY the
    vendored module's gate — asserted on the module's __file__."""
    import os
    import subprocess
    import sys

    probe = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
from vector_database_spark.compat import pb_shim
vendored = pb_shim.find_vendored_protobuf()
if vendored is None:
    print("NO-VENDORED")  # nothing to assert on this host
    raise SystemExit(0)
ok = pb_shim.enable_driver()
assert ok
from google.protobuf import runtime_version as rv
assert str(rv.__file__).startswith(os.path.join(vendored, "")), rv.__file__
assert rv.ValidateProtobufRuntimeVersion("x", 1, 2, 3) is None
print("VENDORED-OK")
"""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("SPARK_GRAFT_PB_SHIM", "PYTHONPATH")
    }
    env["REPO"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    out = subprocess.run(
        [sys.executable, "-c", probe], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert ("VENDORED-OK" in out.stdout) or ("NO-VENDORED" in out.stdout)
