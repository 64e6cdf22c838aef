"""Locate or stage a protobuf runtime for ``transformWithStateInPandas``.

Spark 4's arbitrary-stateful-processing v2 (SPARK-46815) drives its
state-server protocol over protobuf (``pyspark/sql/streaming/proto/
StateMessage_pb2.py``), but ``protobuf`` is not a pyspark install
dependency and is absent from minimal containers. Rather than stubbing
the operator, this module makes the dependency self-healing:

1. If the stock ``google.protobuf`` runtime can already load the
   generated module, use it.
2. Otherwise, stage a PURE-PYTHON protobuf runtime found on the host
   (the Google Cloud SDK ships an unmodified copy under its App Engine
   platform tree) into a tmp directory, relax the gencode/runtime
   minor-version gate (wire format is stable across minors; the staged
   6.32 runtime meets 6.33 gencode), put the staged tree on the driver's
   ``sys.path``, and ship it to Python workers via ``addPyFile`` so the
   worker-side state client can import it too.

Nothing is installed; the staging is per-host tmp state, the same shape
as the events replay staging. Where no donor runtime exists either, the
probe reports failure and callers skip (the previous behavior).
"""

from __future__ import annotations

import importlib
import os
import shutil
import sys
import tempfile
import zipfile

from pyspark.sql import SparkSession

#: Known pure-Python protobuf runtimes bundled by common host tooling,
#: newest first. Each entry is the directory CONTAINING ``google/``.
DONOR_ROOTS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]

_STAGE = os.path.join(tempfile.gettempdir(), "dpp-protobuf-stage")

#: Appended to the staged runtime_version.py: redefines the validator as
#: a no-op, accepting a same-major gencode/runtime skew (e.g. gencode
#: 6.33 on the staged 6.32 runtime — wire format is identical).
_LENIENT_PATCH = (
    "\n\n# Patched by data_preparation_plugin_spark.streaming."
    "protobuf_compat:\n"
    "# accept same-major gencode/runtime skew for the staged runtime.\n"
    "def ValidateProtobufRuntimeVersion(*args, **kwargs):\n"
    "    return None\n"
)


def _gencode_loads() -> bool:
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

        return True
    except Exception:
        return False


def _find_donor() -> str | None:
    for root in DONOR_ROOTS:
        if os.path.isfile(
            os.path.join(root, "google", "protobuf", "__init__.py")
        ):
            return root
    return None


def _stage_runtime(donor_root: str) -> str:
    """Copy the donor ``google/protobuf`` tree into the stage, patch the
    version gate, and zip it for worker shipping. Idempotent."""
    marker = os.path.join(_STAGE, "_STAGED")
    if not os.path.isfile(marker):
        shutil.rmtree(_STAGE, ignore_errors=True)
        dst = os.path.join(_STAGE, "google", "protobuf")
        shutil.copytree(
            os.path.join(donor_root, "google", "protobuf"),
            dst,
            ignore=shutil.ignore_patterns("__pycache__", "*.pyc"),
        )
        # Plain (non-namespace) parent package: the stage is the only
        # provider of ``google.*`` wherever it is used.
        with open(os.path.join(_STAGE, "google", "__init__.py"), "w"):
            pass
        rv = os.path.join(dst, "runtime_version.py")
        if os.path.isfile(rv):
            with open(rv, "a") as fh:
                fh.write(_LENIENT_PATCH)
        zip_path = os.path.join(_STAGE, "protobuf_runtime.zip")
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for base, _dirs, files in os.walk(os.path.join(_STAGE, "google")):
                for name in files:
                    full = os.path.join(base, name)
                    zf.write(full, os.path.relpath(full, _STAGE))
        with open(marker, "w"):
            pass
    return _STAGE


def _ship_to_workers(spark: SparkSession, stage: str) -> None:
    """Make the staged runtime visible to EVERY pyspark-spawned python:
    task workers get the zip via ``addPyFile`` (sys.path insertion at
    task setup), while the TWS *driver worker* — a separate process the
    JVM spawns for the stateful-processor init protocol, which does NOT
    process python includes — inherits it through the ``PYTHONPATH``
    entry in ``sc.environment`` (merged into the spawned worker's env by
    PythonWorkerFactory). Mutating ``sc.environment`` works post-start
    because PythonFunction captures it at operator-definition time."""
    sc = spark.sparkContext
    try:
        sc.addPyFile(os.path.join(stage, "protobuf_runtime.zip"))
    except Exception:
        pass  # already added in this context
    env = sc.environment
    parts = env.get("PYTHONPATH", "").split(os.pathsep)
    if stage not in parts:
        env["PYTHONPATH"] = os.pathsep.join([stage] + [p for p in parts if p])
    os_parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if stage not in os_parts:
        os.environ["PYTHONPATH"] = os.pathsep.join(
            [stage] + [p for p in os_parts if p]
        )


def ensure_protobuf(spark: SparkSession | None = None) -> bool:
    """Make ``StateMessage_pb2`` importable driver-side (and, when a
    session is given, worker-side). Returns False when no runtime can be
    arranged — callers treat that as the old hard dependency gate."""
    if _gencode_loads():
        if spark is not None and _STAGE in sys.path:
            # Driver got the staged runtime earlier in this process but
            # possibly for a different session: (re-)ship to workers.
            _ship_to_workers(spark, _STAGE)
        return True
    # A stock-but-older runtime may already be imported, in which case
    # sys.path staging cannot take effect (google.protobuf is cached).
    # If only the minor-version gate blocks the gencode, relax it in the
    # live module — same-major wire format is stable.
    rv = sys.modules.get("google.protobuf.runtime_version")
    if rv is not None and hasattr(rv, "ValidateProtobufRuntimeVersion"):
        rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        if _gencode_loads():
            return True
    donor = _find_donor()
    if donor is None:
        return False
    stage = _stage_runtime(donor)
    if stage not in sys.path:
        sys.path.insert(0, stage)
        importlib.invalidate_caches()
    if not _gencode_loads():
        return False
    if spark is not None:
        _ship_to_workers(spark, stage)
    return True
