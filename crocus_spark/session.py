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
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    nshuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
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
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
