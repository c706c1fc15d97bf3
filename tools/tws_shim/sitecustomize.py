"""Auto-applied protobuf shim for Spark python workers (imported by the
interpreter at startup when this dir is on PYTHONPATH — put there by
pandas_tsdb_spark.protobuf_shim.ensure_env() before the JVM launches).

Self-contained on purpose: worker interpreters may not have the repo on
sys.path yet when site runs. Logic mirrors protobuf_shim.ensure_env():
content-checked probe (a bare `import google.protobuf` false-succeeds
via an empty namespace package inside the Spark jars), vendored
appengine protobuf 6.32 appended, gencode/runtime validator no-oped
(Spark's StateMessage gencode declares 6.33; the 6.32 runtime parses it
correctly — verified by an exact TWS differential)."""

import importlib.util
import sys

_VENDORED = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _has_real_protobuf():
    try:
        return (
            importlib.util.find_spec("google.protobuf.descriptor")
            is not None
        )
    except Exception:
        return False


if not _has_real_protobuf():
    sys.path.append(_VENDORED)
    for _m in [
        _m
        for _m in list(sys.modules)
        if _m == "google" or _m.startswith("google.")
    ]:
        del sys.modules[_m]
    importlib.invalidate_caches()
try:
    from google.protobuf import runtime_version as _rv

    _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
except Exception:
    pass
