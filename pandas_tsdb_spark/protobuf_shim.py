"""Vendored-protobuf shim: un-gates transformWithStateInPandas offline.

Round-7 probe result (VERDICT r6 item 4). TWS's state-server protocol
is protobuf (pyspark/sql/streaming/proto/StateMessage_pb2.py); the
container has no installed google.protobuf and installs are prohibited.
Three facts make an offline un-gate possible anyway:

1. The machine ships a VENDORED pure-python protobuf 6.32.0 under the
   Google Cloud SDK's appengine platform dir (a plain `google/protobuf`
   regular package — unlike the cloudsdk copy, whose imports are
   rewritten to `cloudsdk.google.protobuf` and can't serve as
   `google.protobuf`).
2. Spark's generated StateMessage_pb2 declares gencode 6.33.0 and
   protobuf's runtime validator rejects any older runtime. The 6.32
   runtime parses this gencode correctly in practice (verified: full
   TWS round-trip + exact cross-batch cumsum differential), so the
   shim no-ops the validator. This trades protobuf's cross-version
   guarantee for one minor version — acceptable for the local harness;
   a production cluster installs protobuf>=6.33 and never loads this.
3. A bare `import google.protobuf` is NOT a valid availability probe
   inside Spark python workers: the Spark jars on the worker sys.path
   contain a `google/protobuf` RESOURCE directory that zipimport
   surfaces as an EMPTY namespace package, so the import "succeeds"
   while every real submodule is missing ("cannot import name
   'descriptor' from 'google.protobuf' (unknown location)"). The probe
   must check content: find_spec("google.protobuf.descriptor").

Worker processes can't be patched after the fact — their sys.path is
assembled from the JVM's environment at JVM LAUNCH — so `ensure_env()`
must run before the SparkSession is created: it fixes the CURRENT
process directly and prepends `tools/tws_shim` (whose sitecustomize.py
re-applies the same fix at interpreter startup) to $PYTHONPATH for the
JVM and every python worker it spawns.
"""

from __future__ import annotations

import importlib.util
import os
import sys

VENDORED = "/usr/lib/google-cloud-sdk/platform/google_appengine"
SHIM_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "tws_shim",
)


def has_real_protobuf() -> bool:
    """True iff google.protobuf with actual content is importable (see
    module docstring for why a bare import is not a valid probe)."""
    try:
        return (
            importlib.util.find_spec("google.protobuf.descriptor")
            is not None
        )
    except Exception:
        return False


def _patch_validator() -> None:
    try:
        from google.protobuf import runtime_version

        runtime_version.ValidateProtobufRuntimeVersion = (
            lambda *a, **k: None
        )
    except Exception:
        pass


def ensure_env() -> bool:
    """Make google.protobuf importable in THIS process and in python
    workers of any SparkSession created AFTER this call. Returns
    availability (False when the machine has no vendored copy either —
    callers then skip TWS surfaces with that evidence)."""
    if not has_real_protobuf():
        if not os.path.isdir(os.path.join(VENDORED, "google", "protobuf")):
            return False
        sys.path.append(VENDORED)
        for m in [
            m
            for m in list(sys.modules)
            if m == "google" or m.startswith("google.")
        ]:
            del sys.modules[m]
        importlib.invalidate_caches()
    _patch_validator()
    if os.path.isdir(SHIM_DIR):
        pp = os.environ.get("PYTHONPATH", "")
        if SHIM_DIR not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                SHIM_DIR + (os.pathsep + pp if pp else "")
            )
    return has_real_protobuf()
