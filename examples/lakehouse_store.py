"""The snapshot store end-to-end, as a USER would drive it — the
lakehouse lifecycle the engine grew across rounds 6-7, in one script:

1. COMMIT a table (atomic manifest, writer schema recorded, per-file
   column stats for the cluster key);
2. EVOLVE the schema additively (validated at commit; a type-changing
   commit is refused);
3. PRUNE a key-band read from manifest stats alone (no footer opens);
4. ERASE rows with an equality-delete commit (zero data copied;
   time travel to the pre-delete version still sees everything);
5. PUBLISH through a branch with write-audit-publish (bad batches
   never reach ``main``);
6. COMPACT — folding the delete set physically;
7. EXPIRE history (branch-pinned versions survive);
8-11. GROW O(delta): append commits, positional dedup of a re-delivered
   batch, the CDC tail replay, VACUUM of crashed-writer debris;
12-14. ROUND 9: ``TIMESTAMP AS OF`` reads off the manifest commit
   clocks, zero-copy RESTORE rollback, and a late consumer cutting
   into the change feed by timestamp (restores refused as deltas).

Everything here is the public ``crocus_spark.operators.maintenance``
API over plain parquet + JSON manifests — no table-format library; the
protocol is the published Delta/Iceberg recipe (put-if-absent commits,
immutable data dirs, pinned readers). Run:
``python examples/lakehouse_store.py`` (smoke-tested by
tests/test_examples.py).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from crocus_spark.operators.maintenance import (  # noqa: E402
    SchemaCompatibilityError,
    commit_equality_deletes,
    commit_snapshot,
    compact_snapshot,
    expire_snapshots,
    get_branch,
    list_snapshot_versions,
    read_branch,
    read_manifest,
    read_snapshot,
    read_snapshot_pruned,
    set_branch,
)


def run(spark, root: str | None = None) -> dict:
    root = root or tempfile.mkdtemp(prefix="crocus_lakehouse_example_")
    shutil.rmtree(root, ignore_errors=True)
    out: dict = {"root": root}

    # 1. commit: 1000 orders, range-clustered so file stats are narrow
    orders = (
        spark.range(0, 1000)
        .select(
            F.col("id").alias("order_id"),
            F.pmod("id", F.lit(7)).alias("customer"),
            (F.col("id") % 97 * 1.5).alias("amount"),
        )
        .repartitionByRange(8, "order_id")
        .sortWithinPartitions("order_id")
    )
    v0 = commit_snapshot(orders, root, stats_columns=["order_id"])
    out["v0"] = v0

    # 2. additive evolution commits; a type change is refused AT COMMIT
    evolved = orders.withColumn(
        "channel", F.when(F.col("order_id") % 2 == 0, "web")
    )
    v1 = commit_snapshot(
        evolved.repartitionByRange(8, "order_id"), root,
        stats_columns=["order_id"],
    )
    out["v1"] = v1
    try:
        commit_snapshot(
            evolved.withColumn("amount", F.col("amount").cast("string")),
            root,
        )
        raise AssertionError("type change must be refused")
    except SchemaCompatibilityError as e:
        out["refused"] = str(e)

    # 3. stats-pruned read: only files overlapping the key band open
    band, info = read_snapshot_pruned(spark, root, "order_id", 100, 299)
    out["pruning"] = info
    out["band_rows"] = band.filter(
        F.col("order_id").between(100, 299)
    ).count()

    # 4. GDPR-style erasure: customer 3 disappears from NEW versions only
    doomed = read_snapshot(spark, root, v1).filter(
        F.col("customer") == 3
    ).select("order_id")
    v2 = commit_equality_deletes(doomed, root, ["order_id"])
    out["v2"] = v2
    out["rows_after_delete"] = read_snapshot(spark, root, v2).count()
    out["rows_time_travel"] = read_snapshot(spark, root, v1).count()

    # 5. write-audit-publish: consumers follow `main`
    set_branch(root, "main", v2)
    bad = read_snapshot(spark, root, v2).limit(10)  # lossy "ingest"
    v3 = commit_snapshot(bad, root)
    set_branch(root, "staging", v3)
    audit_ok = (
        read_branch(spark, root, "staging").count()
        >= read_branch(spark, root, "main").count()
    )
    out["audit_ok"] = audit_ok
    if audit_ok:  # it is not — main stays where it was
        set_branch(root, "main", v3)
    out["main_version"] = get_branch(root, "main")

    # 6. compaction of the MAIN branch head folds the delete set
    # physically (the staged bad batch is the newest commit — compaction
    # targets what consumers read, not whatever landed last)
    v4, stats = compact_snapshot(
        spark, root, target_file_bytes=1 << 30,
        version=get_branch(root, "main"),
    )
    out["compaction"] = stats
    out["deletes_in_compacted"] = read_manifest(root, v4).get("deletes")
    out["rows_compacted"] = read_snapshot(spark, root, v4).count()

    # 7. retention: main's pin survives even when its version ages out
    dropped = expire_snapshots(root, keep_last=1)
    out["dropped"] = dropped
    out["versions_left"] = list_snapshot_versions(root)
    out["main_still_readable"] = read_branch(spark, root, "main").count()

    # ---- round-8 lifecycle: the table grows and changes O(delta) ----
    from crocus_spark.operators.maintenance import (
        commit_append,
        commit_positional_deletes,
        read_snapshot_with_positions,
        vacuum_orphans,
    )
    from crocus_spark.sources import register_snapshot_tail_source

    feed_root = root + "_feed"
    shutil.rmtree(feed_root, ignore_errors=True)

    def day(lo, hi):
        return (
            spark.range(lo, hi)
            .select(
                F.col("id").alias("order_id"),
                F.pmod("id", F.lit(7)).alias("customer"),
                (F.col("id") % 97 * 1.5).alias("amount"),
            )
            .coalesce(1)
        )

    # 8. APPEND commits: each day lands as its increment only —
    #    history is never rewritten (O(delta), not O(table))
    commit_snapshot(day(0, 500), feed_root)           # day 0 → v0
    commit_append(day(500, 700), feed_root)           # day 1 → v1
    out["feed_rows"] = read_snapshot(spark, feed_root).count()

    # 9. a batch is RE-DELIVERED (at-least-once ingestion); positional
    #    deletes erase exactly the extra copies — the one delete an
    #    equality key cannot express
    commit_append(day(600, 700), feed_root)           # dup rows → v2
    from pyspark.sql import Window

    wp = read_snapshot_with_positions(spark, feed_root)
    extras = (
        wp.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("order_id").orderBy("_file", "_pos")
            ),
        )
        .filter(F.col("rn") > 1)
        .select("_file", "_pos")
    )
    commit_positional_deletes(extras, feed_root)      # v3
    out["feed_rows_deduped"] = read_snapshot(spark, feed_root).count()

    # 10. the CDC TAIL replays the whole story as a change feed:
    #     inserts file-parallel, deleted rows as full pre-images
    register_snapshot_tail_source(spark)
    sink = tempfile.mkdtemp(prefix="crocus_lakehouse_feed_")
    q = (
        spark.readStream.format("crocus_snapshot_tail")
        .option("path", feed_root)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="crocus_lakehouse_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    feed = spark.read.parquet(sink)
    out["cdc_ops"] = {
        r["_op"]: r["n"]
        for r in feed.groupBy("_op")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # 11. VACUUM reclaims a crashed writer's debris (a data dir no
    #     manifest ever linked) — committed data is provably untouched
    import os as _os

    _os.makedirs(_os.path.join(feed_root, "d-crashed-writer"))
    out["vacuumed"] = vacuum_orphans(feed_root, grace_seconds=0)
    out["feed_rows_after_vacuum"] = read_snapshot(spark, feed_root).count()

    # ---- round-9 lifecycle: time, rollback, and feed cuts ----
    from crocus_spark.operators.maintenance import (
        read_snapshot_as_of,
        restore_snapshot,
    )

    # 12. TIMESTAMP AS OF: every commit recorded a strictly-monotone
    #     wall time in its manifest — "the table as of just before the
    #     duplicate delivery" needs no version bookkeeping, and a
    #     restore/copy can't perturb it (it is not an mtime)
    t_dup = read_manifest(feed_root, 2)["committed_at_ms"]
    out["rows_as_of_pre_dup"] = read_snapshot_as_of(
        spark, feed_root, t_dup - 1
    ).count()

    # 13. ROLLBACK: an operator decides the dedup cleanup (v3) was
    #     wrong and restores v1 — pure metadata, zero bytes copied,
    #     v2/v3 stay readable as history
    v_restore = restore_snapshot(feed_root, 1)
    out["restore_version"] = v_restore
    out["rows_after_restore"] = read_snapshot(spark, feed_root).count()
    out["restore_zero_copy"] = (
        read_manifest(feed_root, v_restore)["data_dir"]
        == read_manifest(feed_root, 1)["data_dir"]
    )

    # 14. a LATE consumer cuts into the feed by TIME, not version —
    #     Delta's startingTimestamp; the restore itself is refused as a
    #     delta (it can un-delete rows), so the consumer skips it
    #     explicitly, exactly like compaction rewrites
    sink2 = tempfile.mkdtemp(prefix="crocus_lakehouse_feed2_")
    q2 = (
        spark.readStream.format("crocus_snapshot_tail")
        .option("path", feed_root)
        .option("starting_timestamp", str(t_dup))
        .option("skip_rewrites", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", sink2)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="crocus_lakehouse_ckpt2_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    out["cdc_since_dup_ops"] = {
        r["_op"]: r["n"]
        for r in spark.read.parquet(sink2)
        .groupBy("_op")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # 15. ROUND 10 — manifest-log CHECKPOINTS: at production commit
    #     cadence the log grows unbounded, so every 10 commits the
    #     store folds version -> (commit time, dirs, schema) into a
    #     c{v}.json (Delta's _last_checkpoint cadence) and TIMESTAMP AS
    #     OF / retention / schema lookups read checkpoint + suffix —
    #     O(suffix), not one JSON per version. Same answers either way;
    #     losing every checkpoint only costs speed.
    from crocus_spark.operators.maintenance import (
        _checkpoint_versions,
        latest_log_checkpoint,
        resolve_version_as_of,
    )

    for i in range(12):  # push the feed table's log past a fold point
        commit_append(day(2000 + i * 5, 2005 + i * 5), feed_root)
    ck = latest_log_checkpoint(feed_root)
    out["log_checkpoints_on_disk"] = _checkpoint_versions(feed_root)
    out["checkpoint_folds_versions"] = len(ck["entries"])
    t_mid = read_manifest(feed_root, ck["checkpoint_version"])[
        "committed_at_ms"
    ]
    out["as_of_resolves_via_checkpoint"] = (
        resolve_version_as_of(feed_root, t_mid) == ck["checkpoint_version"]
    )
    return out


if __name__ == "__main__":
    from crocus_spark.session import get_spark

    res = run(get_spark(app_name="lakehouse-example"))
    for k, v in res.items():
        print(f"{k}: {v}")
