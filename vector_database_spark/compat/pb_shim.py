"""Borrow a host-vendored pure-Python protobuf runtime for state-v2 streaming.

PySpark 4's ``transformWithStateInPandas`` python runner speaks the
state-server protocol through generated protobuf code
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``, gencode 6.33.0).
This container installs no ``google.protobuf`` — and has no network — so
the v2 runner cannot start (streaming/events.py::tws_available gates it).

What IS on disk (round-7 directive 6 discovery): the google-cloud-sdk
ships two vendored pure-Python protobuf runtimes. The usable one is
``platform/google_appengine`` at **6.32.0** — same major as the gencode,
one minor older. Protobuf's ``ValidateProtobufRuntimeVersion`` refuses
"runtime older than gencode" even across a single minor, but within a
major version the wire format and the generated-code API surface are
stable (protobuf.dev cross-version guarantees); a 6.32 runtime executes
6.33 gencode correctly, which the state-v2 parity test then proves
end-to-end. So the shim does exactly two things:

1. append the vendored dir to ``sys.path`` (APPEND — a real installed
   protobuf always wins), forcing the pure-Python implementation;
2. no-op ``runtime_version.ValidateProtobufRuntimeVersion`` so the
   6.33-vs-6.32 exact-pin check doesn't reject an otherwise compatible
   runtime.

Driver-side that is :func:`enable_driver`. Spark's python WORKERS are
separate interpreters spawned by the JVM, so they need the same two steps
at startup: :func:`worker_env` returns the env vars (a ``sitecustomize``
dir on PYTHONPATH + the activation flag) that must be in the environment
BEFORE the JVM launches — tests/conftest.py sets them at import time,
before the session fixture builds the JVM. Nothing activates unless
``SPARK_GRAFT_PB_SHIM`` points at a vendored runtime dir.
"""

from __future__ import annotations

import os
import sys

# Known host locations of vendored pure-Python protobuf runtimes, best
# first. The cloudsdk third_party copy (4.23) is NOT listed: it is patched
# to import from a `cloudsdk` namespace and predates `runtime_version`.
VENDORED_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_SITE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pb_shim_path")


def find_vendored_protobuf() -> str | None:
    """First candidate dir whose ``google/protobuf`` looks like a modern
    (has ``runtime_version``) pure-Python runtime. Cheap path checks only —
    no imports, so probing can't poison ``sys.modules``."""
    for d in VENDORED_CANDIDATES:
        if os.path.isfile(
            os.path.join(d, "google", "protobuf", "runtime_version.py")
        ):
            return d
    return None


def _activate(vendored: str) -> None:
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    if vendored not in sys.path:
        sys.path.append(vendored)  # append: a real install wins
    from google.protobuf import runtime_version as _rv

    # fence (r8 directive 8): no-op the exact-pin gate ONLY on the vendored
    # runtime this shim itself put on the path. enable_driver() already
    # returns before calling here when a real protobuf imports, but if one
    # ever wins the import race anyway, its version gate stays intact.
    if str(getattr(_rv, "__file__", "")).startswith(
        os.path.join(vendored, "")
    ):
        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None


def enable_driver() -> bool:
    """Make ``google.protobuf`` importable IN THIS PROCESS from the
    vendored runtime (no-op if a real one already imports). Returns True
    when protobuf is importable afterwards."""
    try:
        from google.protobuf import runtime_version  # noqa: F401

        return True
    except Exception:
        pass
    vendored = find_vendored_protobuf()
    if vendored is None:
        return False
    try:
        _activate(vendored)
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def worker_env() -> dict[str, str]:
    """Env vars that extend the shim to Spark python workers: a
    ``sitecustomize``-bearing dir prepended to PYTHONPATH (the ``site``
    module imports it at every interpreter startup) plus the activation
    flag it keys on. MUST be in the environment before the JVM launches —
    workers inherit the JVM's env, which inherits the driver's at launch.
    Empty dict when no vendored runtime exists or protobuf is already
    installed for real."""
    try:
        import google.protobuf  # noqa: F401

        return {}
    except Exception:
        pass
    vendored = find_vendored_protobuf()
    if vendored is None:
        return {}
    pythonpath = os.environ.get("PYTHONPATH", "")
    parts = [_SITE_DIR] + ([pythonpath] if pythonpath else [])
    return {
        "SPARK_GRAFT_PB_SHIM": vendored,
        "PYTHONPATH": os.pathsep.join(parts),
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION": "python",
    }
