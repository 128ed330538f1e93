"""Spark python-worker half of vector_database_spark.compat.pb_shim.

The ``site`` module imports ``sitecustomize`` at every interpreter
startup when this directory is on PYTHONPATH. Activation is gated on
``SPARK_GRAFT_PB_SHIM`` (set by pb_shim.worker_env alongside the
PYTHONPATH entry), so a stray PYTHONPATH inheritance does nothing.
Defensive: any failure leaves the interpreter exactly as it found it —
this shim must never break a process that doesn't need protobuf.

Order matters: the vendored dir is appended BEFORE the first
``google.protobuf`` import. Spark runner processes carry jars on
``sys.path`` whose ``google/protobuf/*.proto`` resource entries form a
contentless NAMESPACE portion; a first failed import would cache that
namespace package in ``sys.modules``, and no later ``sys.path`` append
can displace it (observed: ``ImportError ... from 'google.protobuf'
(unknown location)``). Importing with the vendored dir already on the
path lets its REGULAR package win over the jar's namespace portion —
and a real installed protobuf still wins over the appended vendored one
by path order.
"""

import os
import sys

_vendored = os.environ.get("SPARK_GRAFT_PB_SHIM")
if _vendored and os.path.isdir(_vendored):
    try:
        os.environ.setdefault(
            "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python"
        )
        if _vendored not in sys.path:
            sys.path.append(_vendored)  # append: a real install wins
        from google.protobuf import runtime_version as _rv

        # 6.33-gencode vs 6.32-vendored-runtime: same-major, wire- and
        # API-compatible; drop the exact-pin rejection (pb_shim docstring).
        # FENCED (r8 directive 8): only when the import actually resolved
        # from the VENDORED dir — if a real install won by path order, its
        # version gate must keep running (a stale SPARK_GRAFT_PB_SHIM in a
        # future environment with a real runtime must not silently no-op
        # the real install's compatibility check).
        if str(getattr(_rv, "__file__", "")).startswith(
            os.path.join(_vendored, "")
        ):
            _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        if os.environ.get("SPARK_GRAFT_PB_SHIM_DEBUG"):
            with open("/tmp/pb_shim_debug.log", "a") as _fh:
                _fh.write("pid=%s activated rv=%r\n" % (os.getpid(), _rv.__file__))
    except Exception as _ex:
        if os.environ.get("SPARK_GRAFT_PB_SHIM_DEBUG"):
            with open("/tmp/pb_shim_debug.log", "a") as _fh:
                import traceback as _tb

                _fh.write(
                    "pid=%s FAILED %s\n%s\n"
                    % (os.getpid(), _ex, _tb.format_exc())
                )
