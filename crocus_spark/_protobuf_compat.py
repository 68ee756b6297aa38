"""Best-effort ``google.protobuf`` availability shim.

Spark 4's ``transformWithStateInPandas`` talks to the JVM state server
over a protobuf protocol: the Python worker imports the generated
``pyspark.sql.streaming.proto.StateMessage_pb2``, which needs the
public ``google.protobuf`` runtime. Some hermetic environments (this
container included) ship PySpark without protobuf installed, while a
pure-Python copy of the SAME public Apache-2.0 runtime is often
already on disk inside another vendored tool (the Google Cloud SDK
bundles one under ``lib/third_party/cloudsdk/google/protobuf``).

``ensure_protobuf()`` makes the API usable without any installation:

1. if ``google.protobuf`` already imports, done (the normal case on a
   real cluster — protobuf is a standard PySpark extra);
2. otherwise look for a vendored pure-Python runtime on a small list
   of well-known public locations (extensible via the
   ``CROCUS_PROTOBUF_PATH`` env var), alias its package to
   ``google.protobuf`` in ``sys.modules``, and stub the
   ``runtime_version`` check module that newer GENERATED code imports
   but older runtimes predate (the gencode's serialized
   FileDescriptorProto format itself is stable across these versions);
3. if nothing is found, return ``False`` — callers degrade to the
   ``applyInPandasWithState`` twin and say so.

Worker processes get the same treatment through
``crocus_spark.worker_daemon`` (the session's daemon module), which
calls ``ensure_protobuf()`` once at daemon start so every forked
worker inherits the aliases copy-on-write.
"""

from __future__ import annotations

import os
import sys
import types

# Public, well-known spots a pure-Python protobuf runtime ships at
# without being pip-installed. Each entry is (sys.path root, package
# prefix of the vendored copy). "" prefix = a plain `google/protobuf`
# tree at that root.
_CANDIDATES: list[tuple[str, str]] = [
    ("/usr/lib/google-cloud-sdk/lib/third_party", "cloudsdk"),
    ("/usr/lib64/google-cloud-sdk/lib/third_party", "cloudsdk"),
    ("/opt/google-cloud-sdk/lib/third_party", "cloudsdk"),
]


def _stub_runtime_version() -> None:
    """Newer generated _pb2 modules call
    ``runtime_version.ValidateProtobufRuntimeVersion`` at import; older
    runtimes have no such module. The check is advisory (gencode/runtime
    skew detection) — stub it permissively."""
    import google.protobuf as gp  # noqa: PLC0415

    if hasattr(gp, "runtime_version"):
        return
    rv = types.ModuleType("google.protobuf.runtime_version")

    class Domain:
        PUBLIC = 1

    rv.Domain = Domain
    rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    sys.modules["google.protobuf.runtime_version"] = rv
    gp.runtime_version = rv


def ensure_protobuf() -> bool:
    """Make ``import google.protobuf`` work if at all possible; return
    whether it does. Idempotent, never raises."""
    try:
        import google.protobuf  # noqa: F401

        _stub_runtime_version()
        return True
    except Exception:
        pass
    extra = os.environ.get("CROCUS_PROTOBUF_PATH")
    candidates = list(_CANDIDATES)
    if extra:
        candidates.insert(0, (extra, ""))
    for root, prefix in candidates:
        probe = os.path.join(
            root,
            *(prefix.split(".") if prefix else []),
            "google",
            "protobuf",
            "__init__.py",
        )
        if not os.path.exists(probe):
            continue
        try:
            if root not in sys.path:
                sys.path.insert(0, root)
            if prefix:
                pkg = __import__(
                    f"{prefix}.google.protobuf", fromlist=["__name__"]
                )
                sys.modules["google"] = sys.modules[f"{prefix}.google"]
                sys.modules["google.protobuf"] = pkg
            else:
                __import__("google.protobuf")
            _stub_runtime_version()
            import google.protobuf  # noqa: F401

            return True
        except Exception:  # pragma: no cover - corrupt vendored copy
            continue
    return False
