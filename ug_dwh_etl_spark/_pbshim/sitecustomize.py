"""Executed automatically (via the stdlib ``site`` mechanism) in every
Python interpreter whose PYTHONPATH includes this directory — which
``ug_dwh_etl_spark.compat.ensure_protobuf`` arranges for Spark's
executor Python workers.

Mirrors ensure_protobuf's driver-side steps: expose the
google-cloud-sdk's bundled pure-python protobuf runtime when no real
install exists, and relax its gencode version gate (runtime 6.32 vs
Spark's 6.33-stamped StateMessage_pb2 — a policy check, not a
compatibility break). No-op when protobuf is properly installed or the
SDK path is absent.
"""

import os
import sys

_SDK_PATH = "/usr/lib/google-cloud-sdk/platform/google_appengine"

try:
    import google.protobuf as _pb
except ImportError:
    _pb = None
    if os.path.isdir(os.path.join(_SDK_PATH, "google", "protobuf")):
        if _SDK_PATH not in sys.path:
            sys.path.append(_SDK_PATH)
        try:
            import google.protobuf as _pb
        except ImportError:
            _pb = None

# relax the version gate ONLY for the SDK copy — a real pip install
# keeps its upstream check (PYTHONPATH may already carry _SDK_PATH when
# the parent process exported it, so this must run on import success too)
if _pb is not None and getattr(_pb, "__file__", "").startswith(_SDK_PATH):
    try:
        from google.protobuf import runtime_version as _rv

        _orig = _rv.ValidateProtobufRuntimeVersion

        def _lenient(*args, **kwargs):
            try:
                _orig(*args, **kwargs)
            except _rv.VersionError:
                pass

        _lenient._lenient = True
        _rv.ValidateProtobufRuntimeVersion = _lenient
    except Exception:
        pass
