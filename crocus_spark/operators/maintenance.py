"""Lakehouse table-maintenance operators: small-file compaction and
snapshot time travel.

The reference keeps one flat ``products.json`` per run
(``scripts/webscrapers/base_scraper.py:165-178``) and relies on the
filesystem for history (a fresh file per scrape date,
``ishares.py:190-198``). At 100 TB the same two needs — "keep the file
layout healthy" and "read the table as of an earlier commit" — become
table-maintenance operators in their own right. Delta/Iceberg ship them
as OPTIMIZE and ``VERSION AS OF``; here they are built from plain
parquet + a versioned directory scheme so the engine has no library
dependency, while keeping the same commit discipline (never mutate a
file a reader might hold open; every commit is a NEW directory).
"""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "parquet_data_files",
    "compact_small_files",
    "snapshot_version_path",
    "list_snapshot_versions",
    "read_snapshot",
    "expire_snapshots",
]


def parquet_data_files(path: str) -> list[tuple[str, int]]:
    """(file, bytes) for every parquet data file under ``path``.

    Driver-side directory listing — the same metadata pass any table
    format's manifest gives for free. Listing cost is O(files), which is
    exactly the problem compaction exists to bound.
    """
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith("_"):
                p = os.path.join(root, f)
                out.append((p, os.path.getsize(p)))
    return sorted(out)


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int,
    sort_col: str | None = None,
    schema=None,
) -> tuple[DataFrame, dict]:
    """OPTIMIZE-style rewrite: coalesce a fragmented parquet directory
    into ``ceil(total_bytes / target_file_bytes)`` files at ``out_path``.

    Small files are the dominant silent killer at 100 TB: a table that
    should be 100k × 1 GiB files but is 10M × 10 MiB files pays 100× the
    scan-planning, footer-read, and open() cost on every query. The
    rewrite is one column-pruned scan + one exchange:

    - file count derives from the MEASURED on-disk bytes (compressed),
      not a row-count guess — so the target holds across codecs/schemas;
    - with ``sort_col``, ``repartitionByRange + sortWithinPartitions``
      restores clustering, so per-file min/max footer stats stay narrow
      and data-skipping keeps working after the rewrite (a plain
      ``repartition`` would shuffle rows round-robin and destroy the
      rectangles z-ordering/range-writes set up);
    - output is a NEW directory; the caller swaps a manifest/symlink
      atomically. Never rewrite in place — a concurrent reader holding
      the old file list must keep seeing consistent data (this is the
      snapshot-isolation rule every table format enforces).

    Returns (compacted DataFrame reading ``out_path``, stats dict).
    """
    files_before = parquet_data_files(path)
    total = sum(sz for _p, sz in files_before)
    n_out = max(1, math.ceil(total / target_file_bytes))
    reader = spark.read.schema(schema) if schema is not None else spark.read
    df = reader.parquet(path)
    if sort_col is not None:
        df = df.repartitionByRange(n_out, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(out_path)
    files_after = parquet_data_files(out_path)
    back = spark.read.schema(schema) if schema is not None else spark.read
    stats = {
        "files_before": len(files_before),
        "files_after": len(files_after),
        "bytes_before": total,
        "bytes_after": sum(sz for _p, sz in files_after),
        "target_files": n_out,
    }
    return back.parquet(out_path), stats


def snapshot_version_path(state_root: str, version: int) -> str:
    return os.path.join(state_root, f"v{version}")


def list_snapshot_versions(state_root: str) -> list[int]:
    """Committed versions under ``state_root``, ascending — the manifest
    scan. Versions are directories named ``v{n}``; a version is the full
    table state as of commit n (copy-on-write, like Delta checkpoints),
    so time travel is a single directory read with no log replay."""
    return sorted(
        int(os.path.basename(p)[1:])
        for p in glob.glob(os.path.join(state_root, "v*"))
        if os.path.basename(p)[1:].isdigit()
    )


def read_snapshot(
    spark: SparkSession, state_root: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: table state as of ``version`` (default: latest).

    ``VERSION AS OF`` over the versioned-directory store that
    ``foreach_batch_merge_totals`` (streaming/ops.py) commits into: pick
    the directory, read it. O(selected version) — history depth never
    enters the scan, because each commit wrote full state, not a delta.
    """
    versions = list_snapshot_versions(state_root)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions under {state_root}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"version {version} not in {versions} under {state_root}"
        )
    return spark.read.parquet(snapshot_version_path(state_root, version))


def expire_snapshots(state_root: str, keep_last: int = 2) -> list[int]:
    """Retention expiry (VACUUM): delete all but the newest ``keep_last``
    committed versions. Returns the versions removed.

    The copy-on-write store trades write amplification for O(1) time
    travel — retention is what bounds its storage: a daily-commit table
    retains keep_last days of re-readable history, and expiry is pure
    directory deletion (no data-file reachability analysis needed,
    because each version is self-contained). Never expire a version a
    running reader could hold: callers gate this on reader-lease age in
    a real deployment, exactly as Delta VACUUM's retention check does.
    """
    import shutil

    versions = list_snapshot_versions(state_root)
    drop = versions[:-keep_last] if keep_last > 0 else versions
    for v in drop:
        shutil.rmtree(snapshot_version_path(state_root, v))
    return drop
