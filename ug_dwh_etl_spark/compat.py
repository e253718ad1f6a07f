"""Runtime compatibility shims.

``ensure_protobuf`` makes ``google.protobuf`` importable when no pip
install exists, by falling back to the pure-python protobuf runtime that
the host's google-cloud-sdk bundles (Apache/BSD-licensed open source —
the same files a ``pip install protobuf`` would provide). PySpark's
``transformWithStateInPandas`` needs it: the state-server protocol
between the Python worker and the JVM speaks protobuf
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``).

Two processes need the runtime:

- the driver (this process): ``sys.path`` append + a lenient version
  validator (the SDK ships runtime 6.32, Spark's gencode stamps 6.33 —
  a minor-version gap the upstream check rejects by policy, not by any
  wire/API break; the proto is plain proto3).
- every executor Python worker: workers are fresh interpreters, so the
  same two steps must run there before ``pyspark.worker`` imports the
  state client. ``_pbshim/sitecustomize.py`` does it via the standard
  ``site`` mechanism; ``ensure_protobuf`` prepends that directory (and
  the SDK path) to ``$PYTHONPATH`` so workers inherit both. Must
  therefore run BEFORE the JVM / SparkSession is created.
"""

from __future__ import annotations

import os
import sys

_SDK_PATH = "/usr/lib/google-cloud-sdk/platform/google_appengine"
_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")


def _patch_version_check() -> None:
    from google.protobuf import runtime_version as rv

    if getattr(rv.ValidateProtobufRuntimeVersion, "_lenient", False):
        return
    orig = rv.ValidateProtobufRuntimeVersion

    def lenient(*args, **kwargs):
        try:
            orig(*args, **kwargs)
        except rv.VersionError:
            pass

    lenient._lenient = True
    rv.ValidateProtobufRuntimeVersion = lenient


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable here and in Spark workers.

    Returns True when the runtime is available (real install or SDK
    fallback), False when neither exists. Idempotent and cheap after
    the first call.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        if not os.path.isdir(os.path.join(_SDK_PATH, "google", "protobuf")):
            return False
        if _SDK_PATH not in sys.path:
            # append, not prepend: a real install (absent here) or any
            # same-named stdlib module must keep winning
            sys.path.append(_SDK_PATH)
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            return False
    try:
        _patch_version_check()
    except Exception:
        pass  # older runtimes predate runtime_version — nothing to relax
    # workers: sitecustomize runs at interpreter startup in every Python
    # process whose PYTHONPATH carries _pbshim
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
    for extra in (_SHIM_DIR, _SDK_PATH):
        if extra not in parts:
            parts.append(extra)
    os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    return True
