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


def zorder_key(a, b, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative int columns into
    one long — the multi-dimensional clustering key lakehouse OPTIMIZE
    ZORDER uses: sorting by the interleaved key co-locates rows that are
    close in BOTH dimensions, so parquet footer min/max stats prune
    row groups for predicates on either column (a single-column sort
    only skips for that column). Pure shift/or expressions — JVM-side,
    codegen'd, no UDF.

    Columns are first rank-compressed by the caller (or already dense
    ints); ``bits`` bounds the per-dimension range at 2^bits."""
    from pyspark.sql import functions as F

    mask = (1 << bits) - 1
    ca = F.col(a).cast("long").bitwiseAND(F.lit(mask)) if isinstance(a, str) else a
    cb = F.col(b).cast("long").bitwiseAND(F.lit(mask)) if isinstance(b, str) else b
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(
                F.shiftleft(ca.bitwiseAND(F.lit(1 << i)), i)
            ).bitwiseOR(
                F.shiftleft(cb.bitwiseAND(F.lit(1 << i)), i + 1)
            )
        )
    return z


def zorder_rewrite(
    df,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the Z-order key of (col_a, col_b). The write is the whole
    cost — one range shuffle + local sort, the same bill OPTIMIZE ZORDER
    pays — and afterwards every file covers a narrow rectangle of the
    (a, b) space, so footer stats skip files for predicates on either
    column. tests/test_scale.py measures the per-file min/max shrinkage
    directly from the parquet footers.

    Both dimensions are min/max-scaled to the same ``bits`` width before
    interleaving — a raw interleave lets the wider-ranged column's high
    bits dominate the sort, leaving the narrow column unclustered
    (measured: suppkey per-file extent stayed ~1.0 unscaled). The stats
    pass is one 1-row aggregate broadcast onto the scan."""
    from pyspark.sql import functions as F

    top = (1 << bits) - 1
    stats = df.agg(
        F.min(col_a).alias("_amin"),
        F.max(col_a).alias("_amax"),
        F.min(col_b).alias("_bmin"),
        F.max(col_b).alias("_bmax"),
    )

    def scaled(c, lo, hi):
        return F.floor(
            (F.col(c).cast("double") - F.col(lo))
            * top
            / F.greatest(F.lit(1.0), (F.col(hi) - F.col(lo)).cast("double"))
        ).cast("long")

    z = zorder_key(
        scaled(col_a, "_amin", "_amax"),
        scaled(col_b, "_bmin", "_bmax"),
        bits,
    ).alias("_zkey")
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_zkey", z)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", "_amin", "_amax", "_bmin", "_bmax")
        .write.mode("overwrite")
        .parquet(path)
    )
