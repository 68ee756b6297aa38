"""PYTHONPATH shim: make ``google.protobuf`` resolve to a vendored
pure-Python runtime in BARE spawned processes (Spark's streaming
Python runners / workers), where no driver code ran first.

This directory is prepended to PYTHONPATH by ``crocus_spark.session``
ONLY when the driver environment has no installed ``google.protobuf``
but a vendored copy exists on disk (see
``crocus_spark._protobuf_compat``). When protobuf IS installed, the
shim never enters the path, so the real package is untouched.

Mechanics: executing this package body during ``import google``
replaces ``sys.modules['google']`` with the vendored package (PEP 328
permits a module substituting itself mid-import); subsequent
``google.protobuf.*`` submodule imports then resolve against the
vendored tree."""

from crocus_spark._protobuf_compat import ensure_protobuf as _ensure

if not _ensure():  # pragma: no cover - shim added only when it works
    raise ImportError(
        "crocus_spark protobuf shim is on PYTHONPATH but no vendored "
        "google.protobuf runtime was found (see "
        "crocus_spark/_protobuf_compat.py; set CROCUS_PROTOBUF_PATH)"
    )
