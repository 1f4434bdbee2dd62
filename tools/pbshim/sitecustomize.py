"""Protobuf bootstrap for environments whose google.protobuf is missing.

``transformWithStateInPandas`` (streaming/stateful.py:running_user_totals)
talks to Spark's state server over protobuf, in BOTH the driver and the
Python workers.  This container ships no google.protobuf wheel, but the
Google Cloud SDK on the base image vendors a 6.32 runtime.  Putting this
directory on PYTHONPATH makes every Python process (driver AND spawned
workers — sitecustomize runs at interpreter start) fall back to that
vendored runtime, with the gencode/runtime minor-version check relaxed:
Spark 4.1's StateMessage gencode is 6.33, one minor ahead, and uses no
6.33-only runtime API (the integration test exercises the full state
round-trip, which is the real compatibility proof).

Two traps this file handles explicitly:

- the probe must be ``from google.protobuf import descriptor``, not
  ``import google.protobuf``: Spark workers get spark-core's JAR on
  PYTHONPATH, whose bundled ``google/protobuf/*.proto`` resources form an
  importable-but-EMPTY namespace package that makes the bare import
  succeed vacuously;
- after extending sys.path, the cached empty namespace modules must be
  dropped from sys.modules so the re-import re-scans and the vendored
  REGULAR package (which has ``__init__.py``) wins over the JAR's
  namespace portion.

Activated for tests via tests/conftest.py — a real protobuf installation
always wins because the descriptor probe succeeds immediately.
"""

import os
import sys

_VENDORED = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def ensure_protobuf() -> bool:
    """Make a REAL google.protobuf importable; True when usable."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_VENDORED, "google", "protobuf")):
        return False
    sys.path.append(_VENDORED)
    for name in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[name]
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:  # noqa: BLE001 — any failure means "no protobuf here"
        return False


ensure_protobuf()
