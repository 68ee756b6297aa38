"""CDC tail over the manifest log (sources/snapshot_stream.py): feed
contents per commit kind, exactly-once resume from the checkpointed
version offset, rewrite refusal, and layout parity with the operator
module's manifest accessors."""

from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from crocus_spark.operators.maintenance import (
    commit_append,
    commit_equality_deletes,
    commit_positional_deletes,
    commit_snapshot,
    compact_snapshot,
    list_snapshot_versions,
    read_manifest,
    read_snapshot_with_positions,
)
from crocus_spark.sources import register_snapshot_tail_source
from crocus_spark.sources.snapshot_stream import (
    _committed_versions,
    _read_manifest,
)


def _drain(spark, root: str, ckpt: str, **options) -> str:
    """One availableNow drain into a fresh memory table; returns its
    name. Reusing ``ckpt`` resumes from the committed version offset."""
    name = f"cdc_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("crocus_snapshot_tail")
        .option("path", root)
        .options(**options)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return name


def _store(spark, tmp_path):
    root = str(tmp_path / "store")
    base = spark.range(0, 300).selectExpr(
        "id AS k", "id % 7 AS g", "CAST(id * 0.5 AS double) AS v"
    ).coalesce(2)
    commit_snapshot(base, root)  # v0
    inc = spark.range(300, 400).selectExpr(
        "id AS k", "id % 7 AS g", "CAST(id * 0.5 AS double) AS v"
    ).coalesce(1)
    commit_append(inc, root)  # v1
    return root


def test_manifest_layout_parity(spark, tmp_path):
    """The stream module reads manifests with its own inline helpers
    (to keep the pickled reader light); they must agree byte-for-byte
    with the operator module's accessors — this test pins the layout
    coupling so a maintenance-side rename fails HERE, not in a stream
    at 2 a.m."""
    root = _store(spark, tmp_path)
    assert _committed_versions(root) == list_snapshot_versions(root)
    for v in list_snapshot_versions(root):
        assert _read_manifest(root, v) == read_manifest(root, v)


def test_feed_emits_each_commits_delta(spark, tmp_path):
    register_snapshot_tail_source(spark)
    root = _store(spark, tmp_path)
    commit_equality_deletes(
        spark.createDataFrame([(3,)], "g long"), root, ["g"]
    )  # v2
    live = read_snapshot_with_positions(spark, root)
    commit_positional_deletes(
        live.filter(F.col("k") % 50 == 1).select("_file", "_pos"), root
    )  # v3
    name = _drain(spark, root, tempfile.mkdtemp(prefix="cdc_ckpt_"))
    feed = spark.table(name)
    by = {
        (r["_op"], r["_version"]): r["n"]
        for r in feed.groupBy("_op", "_version")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by[("insert", 0)] == 300
    assert by[("insert", 1)] == 100
    assert by[("delete_key", 2)] == 1
    # pre-images: live k%50==1 rows, cohort g==3 already erased
    expected_pre = sorted(
        k for k in range(400) if k % 50 == 1 and k % 7 != 3
    )
    got_pre = sorted(
        r.k for r in feed.filter("_op = 'delete'").collect()
    )
    assert got_pre == expected_pre
    # key tombstone: key column set, all non-key columns NULL
    row = feed.filter("_op = 'delete_key'").collect()[0]
    assert row.g == 3 and row.k is None and row.v is None


def test_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """A restarted drain with the SAME checkpoint must emit only
    commits newer than the consumed offset — no replay of already-
    delivered inserts (the property that lets a downstream MERGE apply
    the feed idempotently). Uses a parquet sink: the memory sink
    cannot recover from a checkpoint, a file sink is the recovery
    path."""
    register_snapshot_tail_source(spark)
    root = _store(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "feed_out")

    def drain():
        q = (
            spark.readStream.format("crocus_snapshot_tail")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out)

    assert drain().count() == 400  # v0 + v1 inserts
    # nothing new: a resumed drain appends zero rows
    assert drain().count() == 400
    # two more commits land; the next drain emits exactly their delta
    commit_append(
        spark.range(400, 430).selectExpr(
            "id AS k", "id % 7 AS g", "CAST(id * 0.5 AS double) AS v"
        ).coalesce(1),
        root,
    )
    commit_equality_deletes(
        spark.createDataFrame([(5,)], "g long"), root, ["g"]
    )
    feed = drain()
    assert feed.count() == 431
    got = {
        (r["_op"], r["_version"]): r["n"]
        for r in feed.filter("_version >= 2")
        .groupBy("_op", "_version")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {("insert", 2): 30, ("delete_key", 3): 1}


def test_rewrite_refused_unless_skipped(spark, tmp_path):
    """A commit that changes the primary data_dir (compaction, full
    re-commit) cannot be represented as a delta: the tail fails loudly
    by default and skips it only under the explicit option — Delta's
    skipChangeCommits semantics."""
    register_snapshot_tail_source(spark)
    root = _store(spark, tmp_path)
    compact_snapshot(spark, root, target_file_bytes=1 << 20)  # v2 rewrite
    with pytest.raises(Exception, match="rewrote the table"):
        _drain(spark, root, tempfile.mkdtemp(prefix="cdc_ckpt_"))
    name = _drain(
        spark, root, tempfile.mkdtemp(prefix="cdc_ckpt_"),
        skip_rewrites="true",
    )
    feed = spark.table(name)
    assert feed.count() == 400  # v0+v1 inserts; the rewrite contributed 0
    assert feed.filter("_version = 2").count() == 0


def test_versions_per_batch_rate_limits_steady_state(spark, tmp_path):
    """versions_per_batch (Delta's maxFilesPerTrigger analog) bounds
    how far latestOffset advances per batch once the reader has
    anchored — and a FRESH reader's first offset is deliberately
    unbounded, because an offset below the engine's checkpoint would
    move the stream backwards and re-emit versions."""
    from pyspark.sql import types as T

    from crocus_spark.sources.snapshot_stream import _SnapshotTailReader

    root = _store(spark, tmp_path)  # v0, v1
    schema = T.StructType.fromJson(read_manifest(root, 1)["schema"])
    schema = T.StructType(
        list(schema.fields)
        + [
            T.StructField("_op", T.StringType(), False),
            T.StructField("_version", T.LongType(), False),
        ]
    )
    r = _SnapshotTailReader(
        {"path": root, "versions_per_batch": "2"}, schema
    )
    # first call: unbounded catch-up (anchor unknown before this)
    assert r.latestOffset() == {"v": 2}
    # four more commits land while the stream runs
    for lo in (400, 500, 600, 700):
        commit_append(
            spark.range(lo, lo + 10).selectExpr(
                "id AS k", "id % 7 AS g", "CAST(id * 0.5 AS double) AS v"
            ).coalesce(1),
            root,
        )
    # steady state: ≤ 2 versions per batch, monotone, catches up
    assert r.latestOffset() == {"v": 4}
    parts = r.partitions({"v": 2}, {"v": 4})
    assert {p.version for p in parts} == {2, 3}
    assert r.latestOffset() == {"v": 6}
    assert r.latestOffset() == {"v": 6}  # no new commits: no progress
    # a restarted reader (fresh instance) jumps straight to the head
    r2 = _SnapshotTailReader(
        {"path": root, "versions_per_batch": "2"}, schema
    )
    assert r2.latestOffset() == {"v": 6}
