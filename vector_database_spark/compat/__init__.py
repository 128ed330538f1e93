"""Environment-compat shims.

Currently one inhabitant: :mod:`pb_shim`, which makes PySpark's state-v2
streaming API (``transformWithStateInPandas``) runnable on hosts that ship
no ``google.protobuf`` runtime by borrowing a vendored pure-Python runtime
already present on disk (e.g. the google-cloud-sdk's). Nothing here runs
unless explicitly enabled — the engine's default paths never depend on it.
"""
