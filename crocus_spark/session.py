"""SparkSession factory with the engine's configuration pins.

The reference (crocus) has no runtime configuration at all — it is eager
single-threaded Python (``scripts/webscrapers/ishares.py:190-198``). Here the
equivalent of its hand-optimizations (filter-early, project-early, partition
layout; SURVEY.md §4.1) is delegated to Catalyst, and the session pins make
that delegation deterministic and oracle-comparable:

- ``spark.sql.session.timeZone=UTC``: DuckDB timestamps are UTC-naive; the
  oracle diff requires identical wall-clock values.
- ``spark.sql.adaptive.*``: AQE re-plans joins/partitions at runtime — the
  100 TB story (skew-join splitting, partition coalescing) with zero code.
- shuffle partitions default to the local core count; at cluster scale this
  is expected to be overridden (or left to AQE coalescing).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

# Python workers unpickle module-level UDF functions by importing their
# module; make the package importable in workers regardless of the driver
# process's cwd (the driver harness may launch from anywhere).
_PKG_ROOT = str(Path(__file__).resolve().parent.parent)

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "crocus_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Local test harnesses get ``local[$SPARK_GRAFT_CPUS]``; on a real cluster
    the caller passes ``master=None`` with an external cluster manager and
    the same semantic pins apply.
    """
    existing = os.environ.get("PYTHONPATH", "")
    if _PKG_ROOT not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _PKG_ROOT + (os.pathsep + existing if existing else "")
        )
    # transformWithStateInPandas spawns BARE python runners that import
    # the protobuf-generated state protocol. If the environment has no
    # installed google.protobuf but a vendored pure-Python runtime
    # exists on disk, put the alias shim on PYTHONPATH so those
    # processes resolve it too (driver-side code goes through
    # _protobuf_compat.ensure_protobuf directly). No-op when protobuf
    # is properly installed — the shim never shadows a real package.
    try:
        import google.protobuf  # noqa: F401
    except Exception:
        from crocus_spark._protobuf_compat import ensure_protobuf

        if ensure_protobuf():
            shim = str(Path(__file__).resolve().parent / "_vendor_shim")
            cur = os.environ.get("PYTHONPATH", "")
            if shim not in cur.split(os.pathsep):
                os.environ["PYTHONPATH"] = shim + os.pathsep + cur
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    nshuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst=true (the default) refuses to coalesce below
        # the session parallelism, so a kilobyte shuffle still launches
        # 32 tasks — pure task-launch overhead on small stages, and the
        # Spark tuning guide itself recommends false so the target size
        # is respected. 8 MB advisory keeps plenty of parallelism at
        # fixture scale while a 100 TB shuffle still fans out to
        # thousands of partitions (A/B: full-registry queries 10-40%
        # faster at sf0.01, headline suite 28.0 s → 24.1 s at sf0.1,
        # same protocol).
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "false",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # ANSI mode (SURVEY §4.2): DuckDB-matching cast/overflow semantics —
        # invalid casts/overflow ERROR instead of silently returning NULL;
        # the explicit null-tolerant path is the try_* battery
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # INT96 (the legacy default) writes NO min/max stats — every
        # time-range predicate would scan every file. MICROS restores
        # row-group skipping on timestamp columns (io_zorder_prune relies
        # on it; so does any time-partitioned read at 100 TB).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # TIMESTAMP(NANOS) parquet columns (events.ts) are read as long,
        # then converted in io.load — Spark has no native ns timestamps.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Fixture parquet stamps are MICROS with isAdjustedToUTC=false, which
        # Spark 4 would infer as TIMESTAMP_NTZ; read them as session-tz (UTC)
        # TIMESTAMP instead so LTZ-only expressions (unix_micros etc.) resolve
        # and values equal DuckDB's naive-UTC timestamps. A conf, not a cast:
        # casting post-scan would break predicate pushdown on time columns.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # Python UDTFs evaluate through Arrow batches
        # (ArrowEvalPythonUDTF) instead of row-at-a-time pickling —
        # same 10-100x Arrow-vs-row argument as pandas UDFs; the
        # registry-wide no-BatchEvalPython detector keeps the whole
        # query surface Arrow-only (tests/test_plans.py).
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        # Whole-stage-codegen compiled-class cache: the default 100
        # entries thrash under a diverse query mix — the 19-query bench
        # suite alone compiles >100 codegen units, so interleaved passes
        # recompiled (~100 ms each) what consecutive passes got from
        # cache (measured: the same per-query min is ~0.2-0.3 s lower
        # when runs are consecutive; raising the cache closes most of
        # the gap). Scale-neutral: a long-lived cluster serving many
        # query shapes wants exactly the same headroom, and the entries
        # are compiled classes (small) — not data.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # Pre-import pandas/pyarrow/numpy + the engine's worker-side
        # operator modules ONCE in the python-worker daemon; forked
        # workers inherit them copy-on-write. Without this, the first
        # cores-wide Arrow stage pays ~1.2 s × cores of import work
        # (measured 5.5 s wall on an idle 32-core host, ~20 s under
        # load — the r5 in-sweep multimodal_pdf_cid_text blowup).
        .config("spark.python.daemon.module", "crocus_spark.worker_daemon")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _prewarm_python_datasource(spark)
    return spark


_PREWARMED = False


def _prewarm_python_datasource(spark) -> None:
    """Fork the Python Data Source plan/write workers in the BACKGROUND
    at session build. The first python-datasource query in a process
    pays a one-time ~5-7 s worker spin-up (measured: io_python_datasink
    8.8 s first call, 1.1 s after) that a long-lived cluster amortizes
    invisibly; warming it concurrently with the session's first real
    work removes it from whichever query happens to run first. Daemon
    thread, one attempt per process, failures swallowed — warming is an
    optimization, never a correctness dependency."""
    global _PREWARMED
    if _PREWARMED or os.environ.get("SPARK_GRAFT_NO_PREWARM") == "1":
        return
    _PREWARMED = True

    def warm() -> None:
        try:
            import shutil
            import tempfile

            from crocus_spark.sources import (
                register_catalog_sink,
                register_catalog_source,
            )

            # py4j thread pinning gives this thread its own JVM thread
            # with NO active session; the write-path source lookup
            # consults it, so pin ours or the sink format resolves as
            # not-found (observed: reader fine, writer
            # DATA_SOURCE_NOT_FOUND).
            spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
                spark._jsparkSession
            )
            # Arrow pool first (pandas-UDF stages are the common case):
            # launching any Python stage starts the worker daemon, whose
            # one-time ~3.5 s import chain (worker_daemon.py pre-imports
            # pandas/pyarrow/serializers once; forks are then O(ms))
            # this hides off the first real query's wall clock. One
            # task is enough — post-daemon forks measured 32 tasks in
            # 0.5 s.
            def _noop(batches):
                yield from batches

            spark.range(0, 1, 1, 1).mapInPandas(_noop, "id long").count()
            register_catalog_source(spark)
            register_catalog_sink(spark)
            tiny = (
                spark.read.format("crocus_catalog")
                .option("n_products", 1)
                .load()
            )
            out = tempfile.mkdtemp(prefix="crocus_spark_warm_")
            try:
                (
                    tiny.write.format("crocus_catalog_sink")
                    .option("path", out)
                    .mode("append")
                    .save()
                )
            finally:
                shutil.rmtree(out, ignore_errors=True)
            # The avro source/sink pair has its own first-use cost the
            # catalog warm does not cover (~1.5 s measured: OCF codec
            # import + plan-time header read machinery) and it was the
            # most expensive untouched io query two sweeps running —
            # round-trip one row through it here so the first real avro
            # query starts warm.
            from crocus_spark.sources import (
                register_avro_sink,
                register_avro_source,
            )

            register_avro_sink(spark)
            register_avro_source(spark)
            out = tempfile.mkdtemp(prefix="crocus_spark_warm_avro_")
            try:
                (
                    spark.range(0, 1, 1, 1)
                    .write.format("crocus_avro_sink")
                    .option("path", out)
                    .mode("append")
                    .save()
                )
                (
                    spark.read.format("crocus_avro")
                    .option("path", out)
                    .load()
                    .count()
                )
            finally:
                shutil.rmtree(out, ignore_errors=True)
        except Exception:
            pass  # pre-warm is best-effort by design

    from pyspark import InheritableThread

    InheritableThread(
        target=warm, name="crocus-spark-prewarm", daemon=True
    ).start()
