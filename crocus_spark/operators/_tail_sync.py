"""Shared drain loop for index-maintenance CDC consumers (HNSW/IVF/PQ).

Every maintained at-rest index follows the same shape: read the source
table's ``crocus_snapshot_tail`` change feed, reduce each micro-batch to
per-key net effects, apply them to the store, checkpoint beside the
store. The one failure mode they also share is a REWRITE on the source
table (compaction, restore): the CDC source refuses to represent it as
a delta and the stream dies — permanently, because the checkpointed
offset sits just below the rewrite version, so every later drain hits
the same wall (round-9 advice). ``run_tail_sync`` owns that policy:

- ``on_rewrite='fail'`` (default): surface the source's error — the
  operator decides what to do. Recovery is wiping ``index_path`` and
  ``index_path + '_ckpt'`` and re-draining (a full O(corpus) rebuild).
- ``on_rewrite='skip'``: pass ``skip_rewrites=true`` to the source.
  CORRECT for layout-only rewrites (compaction / Z-order: the logical
  rows are unchanged, so the index needs nothing) but it also skips
  RESTOREs, which DO change logical content — use only on tables whose
  maintenance is compaction-only, as with Delta ``skipChangeCommits``.
- ``on_rewrite='rebuild'``: on a rewrite error, delete the store and
  its checkpoint, bootstrap the store from a BATCH read of the current
  snapshot (re-draining the tail from version 0 would just hit the same
  rewrite again), then tail changes from the next version on. Always
  correct — a restore's post-restore state is exactly the current
  snapshot — at the cost of a full rebuild; the right policy for
  tables that RESTORE.
"""

from __future__ import annotations

import shutil


def net_effects(batch_df, id_col: str, vec_col: str):
    """Per-key NET effect of one CDC micro-batch — the latest
    (_op, vec) by ``_version`` per id (an insert after a tombstone
    survives; anything before one is absorbed) — materialized ONCE via
    an eager ``localCheckpoint``. The batch relation is backed by the
    Python tail source, so every downstream action would otherwise
    re-read the whole feed and re-run this aggregate: the bootstrap
    consumes it two-to-three times (model fit(s) + store build) and the
    upsert paths three-to-four (cell discovery, semi-join, merge write).
    The checkpoint is batch-sized (per-key net effects), paid once.
    Returns ``(ups, dels)``."""
    from pyspark.sql import functions as F

    last = (
        batch_df.groupBy(id_col)
        .agg(F.max_by(F.struct("_op", vec_col), "_version").alias("s"))
        .localCheckpoint(eager=True)
    )
    ups = last.filter(F.col("s._op") == "insert").select(
        F.col(id_col), F.col(f"s.{vec_col}").alias(vec_col)
    )
    dels = last.filter(F.col("s._op") != "insert").select(id_col)
    return ups, dels


_REWRITE_MARKERS = (
    "cannot represent a rewrite",
    "cannot represent a restore",
    "is a restore of version",
)


def run_tail_sync(
    spark, table_root: str, index_path: str, apply_fn, on_rewrite: str = "fail"
) -> None:
    """Drain ``table_root``'s CDC tail through ``apply_fn`` (a
    foreachBatch body) with the checkpoint at ``index_path + '_ckpt'``
    (NOT inside the store — the bootstrap overwrite would destroy an
    in-store checkpoint), applying the ``on_rewrite`` policy above."""
    from crocus_spark.sources import register_snapshot_tail_source

    if on_rewrite not in ("fail", "skip", "rebuild"):
        raise ValueError(
            f"on_rewrite must be 'fail', 'skip' or 'rebuild', got {on_rewrite!r}"
        )
    register_snapshot_tail_source(spark)

    def drain(skip: bool, starting_version: int | None = None) -> None:
        from crocus_spark.streaming.ops import retry_transient_stream

        def attempt() -> None:
            reader = spark.readStream.format("crocus_snapshot_tail").option(
                "path", table_root
            )
            if skip:
                reader = reader.option("skip_rewrites", "true")
            if starting_version is not None:
                reader = reader.option(
                    "starting_version", str(starting_version)
                )
            q = (
                reader.load()
                .writeStream.foreachBatch(apply_fn)
                .option("checkpointLocation", index_path + "_ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        # retries ONLY the Python-worker spawn-timeout class (the tail
        # source spawns a non-daemon runner at query init; under heavy
        # host oversubscription the fixed 10 s connect-back window can
        # lapse before batch 0) — the rewrite/restore markers the except
        # below dispatches on propagate unchanged on first throw, and the
        # checkpointed availableNow resume makes a retry exactly-once.
        retry_transient_stream(attempt)

    try:
        drain(on_rewrite == "skip")
    except Exception as e:
        msg = str(e)
        if on_rewrite != "rebuild" or not any(
            m in msg for m in _REWRITE_MARKERS
        ):
            raise
        # The table was compacted/restored under the index: the delta
        # stream past that version is unrecoverable, and re-draining
        # from version 0 would hit the same rewrite. Rebuild: wipe the
        # store + checkpoint, feed the CURRENT snapshot to apply_fn as
        # one synthetic insert batch (its bootstrap path runs because
        # the store is gone), then tail changes from the next version —
        # the pinned batch read and the starting_version cut leave no
        # gap and no overlap.
        from pyspark.sql import functions as F

        from crocus_spark.operators.maintenance import (
            list_snapshot_versions,
            read_snapshot,
        )

        latest = list_snapshot_versions(table_root)[-1]
        shutil.rmtree(index_path, ignore_errors=True)
        shutil.rmtree(index_path + "_ckpt", ignore_errors=True)
        bootstrap = (
            read_snapshot(spark, table_root, latest)
            .withColumn("_op", F.lit("insert"))
            .withColumn("_version", F.lit(latest).cast("long"))
        )
        apply_fn(bootstrap, -1)
        drain(False, starting_version=latest + 1)
