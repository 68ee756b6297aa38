"""Streaming queries — deterministic availableNow replays of the events
fixture, oracle-checked against batch SQL where the semantics are
SQL-expressible (SURVEY §5.2.4).

Every query here drives a REAL Structured Streaming query (micro-batched
file source → stateful operators → memory sink) and returns the sink as a
batch DataFrame for the driver's comparison.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crocus_spark.io import load, local_df
from crocus_spark.queries import register
from crocus_spark.streaming.ops import (
    read_events_stream,
    retry_transient_stream,
    run_available_now,
    session_window_agg,
    sliding_window_agg,
    stateful_user_totals,
    stream_stream_attribution,
    streaming_dedup,
    tumbling_window_agg,
)


@register(
    "stream_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    tags=("streaming", "headline"),
)
def stream_tumbling_window(spark, sf_dir):
    """Tumbling 6h windows × event_type via a real streaming query
    (§2B#45, #52: availableNow trigger, complete output). Oracle: the same
    agg as batch SQL with time_bucket — tumbling windows are epoch-aligned
    in both engines."""
    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(tumbling_window_agg(ev, "6 hours"), "complete")
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        "n",
        "total_value",
    ).orderBy("window_start", "event_type")


@register(
    "stream_sliding_window",
    oracle="""
    WITH offsets(o) AS (VALUES (0), (1)),
    assigned AS (
      SELECT time_bucket(INTERVAL '6 hours', ts)
               - (o * INTERVAL '6 hours') AS w_start,
             event_type, ts
      FROM events CROSS JOIN offsets
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n
    FROM assigned
    WHERE ts < w_start + INTERVAL '12 hours' AND ts >= w_start
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    tags=("streaming",),
)
def stream_sliding_window(spark, sf_dir):
    """Sliding 12h/6h windows (§2B#46): every event lands in two overlapping
    windows. Oracle expands the window assignment explicitly (bucket minus
    0/1 slide offsets) — the same expansion Spark's Expand operator does."""
    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(sliding_window_agg(ev, "12 hours", "6 hours"), "complete")
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        "n",
    ).orderBy("window_start", "event_type")


@register(
    "stream_session_window",
    oracle="""
    WITH with_gap AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM with_gap
    ), agg AS (
      SELECT user_id, session_id,
             MIN(ts) AS s_start, MAX(ts) AS s_last, COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           strftime(s_start, '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           n_events
    FROM agg
    WHERE s_last + INTERVAL '30 minutes'
          <= (SELECT MAX(ts) FROM events) - INTERVAL '10 minutes'
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "session"),
)
def stream_session_window(spark, sf_dir):
    """Session windows (30min gap) per user, append mode with a 10min
    watermark (§2B#47-48). Oracle: gaps-and-islands SQL, filtered to
    sessions the final watermark (max ts − 10min) has closed — i.e. exactly
    the append-mode emission rule. Late-data drop is what the WHERE clause
    encodes: sessions still open at end-of-stream are withheld."""
    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(session_window_agg(ev, "30 minutes", "10 minutes"), "append")
    return out.select(
        "user_id",
        F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        "n_events",
    ).orderBy("user_id", "session_start")


@register(
    "stream_stream_join",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, click_id, purchase_id,
           strftime(click_ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(purchase_ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
    FROM c JOIN p ON c.user_id = p.user_id
    WHERE purchase_ts >= click_ts
      AND purchase_ts < click_ts + INTERVAL '30 minutes'
    ORDER BY click_id, purchase_id
    """,
    tags=("streaming", "join"),
)
def stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream inner join: purchases attributed to the
    user's clicks within the prior 30 minutes. The time-bounded condition
    between the two event-time columns is what lets Spark expire join
    state (clicks past watermark+window can never match) — bounded state
    on two unbounded streams. availableNow replay of the complete fixture
    makes the result equal the batch self-join the oracle runs."""
    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(
        stream_stream_attribution(ev, "30 minutes", "1 hour"), "append"
    )
    return out.select(
        "user_id",
        "click_id",
        "purchase_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "purchase_ts"
        ),
    ).orderBy("click_id", "purchase_id")


@register(
    "stream_dedup_watermark",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    ORDER BY event_id
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_watermark(spark, sf_dir):
    """Streaming dedup by event_id within a 1h watermark (§2B#49).
    Fixture event_ids are unique, so the deduped stream equals the input —
    which is the point of the oracle: dedup must not drop or duplicate
    anything on an already-unique stream. (Duplicate-collapse behavior is
    covered by the property test in tests/test_streaming.py.)"""
    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(streaming_dedup(ev, "1 hour"), "append")
    return out.select("event_id", "user_id", "event_type").orderBy("event_id")


@register(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_stateful_totals(spark, sf_dir):
    """Custom stateful per-key streaming (§2B#50): running per-user totals
    via applyInPandasWithState, replayed to completion. In update mode the
    memory sink holds one row per user per batch; the window top-1 keeps
    each user's LAST emission (the final running total), which the batch
    oracle reproduces as a plain group-by. Integer-cent accumulation keeps
    the comparison exact."""
    from pyspark.sql.window import Window

    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(stateful_user_totals(ev), "update")
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_events").desc(), F.col("total_cents").desc()
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_cents")
        .orderBy("user_id")
    )


@register(
    "stream_static_join",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
    tags=("streaming", "join"),
)
def stream_static_join(spark, sf_dir):
    """Stream-static enrichment join (§2B#51): the event stream joined to
    the static customer dimension (events.user_id ⋈ customer.c_custkey),
    then aggregated. The static side is re-read per micro-batch and
    broadcast — the streaming analog of the crocus catalog-enrichment join
    J1."""
    ev = read_events_stream(spark, sf_dir)
    cust = load(spark, sf_dir, "customer")
    joined = ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey
    )
    agg = joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
    )
    return run_available_now(agg, "complete").orderBy("segment")


@register(
    "stream_corpus_curation",
    oracle=None,  # set just below from the shared scored-CTE SQL
    tags=("streaming", "corpus"),
)
def stream_corpus_curation(spark, sf_dir):
    """Streaming corpus curation: the SAME quality + repetition scorers
    the batch pipeline uses (operators/text.py, operators/corpus.py) run
    unchanged over the document-arrival stream — they are stateless
    per-row expressions, so the curation filter is a pure streaming map
    with no state store, applicable at any arrival rate. availableNow
    replay makes the result batch-comparable."""
    from crocus_spark.operators import corpus as C
    from crocus_spark.operators import text as X
    from crocus_spark.streaming.ops import (
        read_documents_stream,
        run_available_now,
    )

    docs = read_documents_stream(spark, sf_dir)
    scored = C.dup_gram_cols(X.quality_score(docs, "text"), "text")
    kept = scored.filter(
        (F.col("quality") >= 0.45) & (F.col("dup_ratio") <= 0.5)
    ).select("doc_id", "lang", "source", "quality", "dup_ratio")
    return run_available_now(kept, "append").orderBy("doc_id")


# The oracle is the shared batch scored-CTE (corpus_q._SCORED_SQL) — the
# whole point of the query: stream and batch agree bit-for-bit.
from crocus_spark.queries import REGISTRY as _REG
from crocus_spark.queries.corpus_q import _SCORED_SQL as _SC

_REG["stream_corpus_curation"].oracle = f"""
    SELECT doc_id, lang, source, quality, dup_ratio
    FROM ({_SC})
    WHERE quality >= 0.45 AND dup_ratio <= 0.5
    ORDER BY doc_id
"""


@register(
    "stream_foreachbatch_merge",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "merge", "scale"),
)
def stream_foreachbatch_merge(spark, sf_dir):
    """Streaming materialized view via foreachBatch MERGE (§2B#50/#52 +
    the incremental-maintenance pattern of agg_incremental_merge, fused):
    every micro-batch's algebraic partials merge into a versioned parquet
    state table; the query returns the final state, which must equal the
    plain batch group-by over everything — maintenance is invisible, the
    oracle proves it. Batches never overwrite the version they read and
    are idempotent under checkpoint replay (batch_id-keyed dirs) — the
    exactly-once recipe for any custom sink."""
    import shutil
    import tempfile
    import os as _os

    from crocus_spark.streaming.ops import foreach_batch_merge_totals

    state_root = _os.path.join(
        tempfile.gettempdir(),
        "crocus_stream_state",
        _os.path.basename(_os.path.normpath(sf_dir)),
        "merge_totals",
    )
    shutil.rmtree(state_root, ignore_errors=True)
    ev = read_events_stream(spark, sf_dir)
    state = foreach_batch_merge_totals(ev, state_root)
    return (
        state.select(
            "user_id",
            "n_events",
            F.col("value_dec").cast("double").alias("sum_value"),
        )
        .orderBy("user_id")
    )


@register(
    "stream_python_datasource",
    oracle="""
    WITH days AS (SELECT d FROM generate_series(0, 2) t(d)),
    rec AS (
      SELECT d, d * 100 + i AS product_id,
             ((d * 100 + i) * 2654435761) % 4294967296 AS h
      FROM days, generate_series(0, 39) s(i)
    )
    SELECT d AS day, COUNT(*) AS n_products,
           CAST(SUM(CAST((h % 100000) / 100.0 AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_price
    FROM rec
    GROUP BY d
    ORDER BY d
    """,
    tags=("streaming", "datasource"),
)
def stream_python_datasource(spark, sf_dir):
    """Custom STREAMING Python Data Source: the reference's daily scrape
    re-run (a fresh dated file per day, ishares.py:190-198) as a
    checkpointed stream — each day is one micro-batch, offsets are
    {day}, and a crashed run resumes at the day it died instead of
    re-scraping history (readBetweenOffsets replays committed batches
    deterministically). The bounded source reports no-new-data after
    n_days; the query drains it to a memory sink and aggregates per
    day. Arithmetic identical to the batch source, so a custom
    streaming source is oracle-checked end-to-end."""
    import tempfile
    import time
    import uuid

    from crocus_spark.sources import register_catalog_stream_source

    register_catalog_stream_source(spark)

    def attempt() -> str:
        # name AND checkpoint unique per attempt/invocation: memory-sink
        # tables outlive their query in the session (a reused name would
        # double-ingest on a second call), and a fresh checkpoint makes
        # every worker-spawn retry a complete from-scratch replay of the
        # deterministic source into its fresh sink table
        ckpt = tempfile.mkdtemp(prefix="crocus_catstream_ckpt")
        name = f"catalog_stream_sink_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.format("crocus_catalog_stream")
            .option("n_days", 3)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        try:
            expected = 3 * 40
            deadline = time.time() + 120
            while time.time() < deadline:
                if spark.table(name).count() >= expected:
                    break
                exc = q.exception()
                if exc is not None:  # fail fast instead of burning the
                    raise exc  # deadline polling a dead query
                time.sleep(0.25)
        finally:
            q.stop()
        return name

    name = retry_transient_stream(attempt)
    return (
        spark.table(name)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_products"),
            F.sum(F.col("price").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("day")
    )


@register(
    "stream_stateful_rocksdb",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "stateful", "rocksdb"),
)
def stream_stateful_rocksdb(spark, sf_dir):
    """Stateful per-key streaming on the ROCKSDB state store — the
    production backend (state spills to executor-local disk with
    changelog checkpointing instead of living JVM-heap-resident like the
    default HDFS-backed provider, which is what bounds state by MEMORY at
    100 TB key cardinalities). Identical semantics and oracle to
    stream_stateful_totals: the backend swap must be invisible to
    results — that invariance is exactly what this query pins."""
    from pyspark.sql.window import Window

    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(
        stateful_user_totals(ev),
        "update",
        state_provider=(
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider"
        ),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_events").desc(), F.col("total_cents").desc()
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_cents")
        .orderBy("user_id")
    )


@register(
    "stream_stream_left_outer",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, click_id, purchase_id,
           strftime(click_ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(purchase_ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
    FROM c LEFT JOIN p ON c.user_id = p.user_id
      AND purchase_ts >= click_ts
      AND purchase_ts < click_ts + INTERVAL '30 minutes'
    ORDER BY click_id, purchase_id
    """,
    tags=("streaming", "join", "outer"),
)
def stream_stream_left_outer(spark, sf_dir):
    """Watermarked stream-stream LEFT OUTER join (§2B#51's hardest
    form): clicks with no purchase in the next 30 minutes must still
    emit — but an outer result only flushes once the watermark passes
    the click's window, so a finite replay needs the end-of-stream
    sentinel (stage_stream_with_flush_sentinel) to push both sides'
    watermarks past every real window. With the sentinel the streamed
    result equals the batch LEFT JOIN bit-for-bit — the oracle is that
    batch join; no emission-horizon carve-outs. State stays bounded by
    watermark+window exactly as in the inner form."""
    from crocus_spark.streaming.ops import (
        EVENTS_STREAM_SCHEMA,
        stage_stream_with_flush_sentinel,
    )

    stage = stage_stream_with_flush_sentinel(spark, sf_dir, "events")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ev = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(stage)
    out = run_available_now(
        stream_stream_attribution(ev, "30 minutes", "1 hour", "left_outer"),
        "append",
    )
    return (
        out.filter(F.col("user_id") >= 0)  # drop the sentinel's own row
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "click_ts"
            ),
            F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "purchase_ts"
            ),
        )
        .orderBy("click_id", "purchase_id")
    )


@register(
    "stream_stream_full_outer",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           click_id, purchase_id,
           strftime(click_ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(purchase_ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
      AND purchase_ts >= click_ts
      AND purchase_ts < click_ts + INTERVAL '30 minutes'
    ORDER BY click_id, purchase_id, user_id
    """,
    tags=("streaming", "join", "outer"),
)
def stream_stream_full_outer(spark, sf_dir):
    """Watermarked stream-stream FULL OUTER join — the last §2B#51 join
    form (inner and left-outer already green): unmatched rows from BOTH
    sides must emit, each only once the watermark has passed its side's
    join horizon; the end-of-stream sentinel
    (stage_stream_with_flush_sentinel) pushes both watermarks past
    every real window so the finite replay flushes completely and the
    streamed result equals the batch FULL JOIN bit-for-bit. State
    expiry is the same watermark+window bound as the inner form —
    bounded on an unbounded stream, which is the entire design rule."""
    from crocus_spark.streaming.ops import (
        EVENTS_STREAM_SCHEMA,
        stage_stream_with_flush_sentinel,
    )

    stage = stage_stream_with_flush_sentinel(spark, sf_dir, "events")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ev = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(stage)
    out = run_available_now(
        stream_stream_attribution(ev, "30 minutes", "1 hour", "full_outer"),
        "append",
    )
    return (
        out.filter(F.col("user_id") >= 0)  # drop the sentinel's own row
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "click_ts"
            ),
            F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "purchase_ts"
            ),
        )
        .orderBy("click_id", "purchase_id", "user_id")
    )


@register(
    "stream_avro_landing",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           md5(string_agg(md5(text), '' ORDER BY doc_id)) AS corpus_md5
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("streaming", "io", "avro"),
)
def stream_avro_landing(spark, sf_dir):
    """STREAMING ingestion of the Avro landing zone (§2B#7 for the
    custom format; the Kafka-adjacent shape the r6 verdict's Avro ask
    implies): documents land as four deflate-coded OCF files through
    the two-phase sink, then `crocus_avro_stream` consumes them as
    checkpointed micro-batches — offset = consumed-file count over the
    sink's monotonic part-NNNNN names, so a crashed run resumes at the
    file it died on and readBetweenOffsets replays committed batches
    byte-deterministically. The query drains to a memory sink
    (files_per_batch=1 → ≥4 micro-batches, asserted from the stream's
    own progress log) and reduces to per-lang counts plus an
    order-insensitive corpus digest — a hash match proves the streamed
    rows are EXACTLY the landed table, no file skipped, duplicated, or
    torn across batch boundaries."""
    import tempfile
    import time
    import uuid

    from crocus_spark.sources import (
        register_avro_sink,
        register_avro_stream_source,
    )

    register_avro_sink(spark)
    register_avro_stream_source(spark)
    land = tempfile.mkdtemp(prefix="crocus_avro_landing_")
    docs = load(spark, sf_dir, "documents")
    n_expected = docs.count()
    (
        docs.repartition(4)
        .write.format("crocus_avro_sink")
        .option("path", land)
        .mode("append")
        .save()
    )
    def attempt() -> str:
        # fresh checkpoint + sink name per attempt: a worker-spawn retry
        # replays the landing dir from scratch into a fresh memory table
        ckpt = tempfile.mkdtemp(prefix="crocus_avro_landing_ckpt")
        name = f"avro_landing_sink_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.format("crocus_avro_stream")
            .option("path", land)
            .option("files_per_batch", 1)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                if spark.table(name).count() >= n_expected:
                    break
                exc = q.exception()
                if exc is not None:  # fail fast: don't poll a dead query
                    raise exc  # for the rest of the deadline
                time.sleep(0.25)
            batches = {
                p["batchId"]
                for p in (q.recentProgress or [])
                if p.get("numInputRows", 0) > 0
            }
            assert (
                len(batches) >= 2
            ), f"expected incremental batches, saw {batches}"
        finally:
            q.stop()
        return name

    name = retry_transient_stream(attempt)
    return (
        spark.table(name)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.md5(
                F.concat_ws(
                    "",
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("doc_id"), F.md5("text").alias("h"))
                        )
                    ).getField("h"),
                )
            ).alias("corpus_md5"),
        )
        .orderBy("lang")
    )


@register(
    "stream_snapshot_cdc",
    oracle="""
    SELECT * FROM (
      SELECT 'insert' AS op, 0 AS version, COUNT(*) AS n,
             COUNT(DISTINCT user_id) AS n_users,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS value_sum
      FROM events WHERE event_id % 3 = 0
      UNION ALL
      SELECT 'insert', 1, COUNT(*), COUNT(DISTINCT user_id),
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
      FROM events WHERE event_id % 3 = 1
      UNION ALL
      SELECT 'delete_key', 2, COUNT(*), COUNT(DISTINCT user_id),
             CAST(NULL AS DOUBLE)
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 7 = 3)
      UNION ALL
      SELECT 'delete', 3, COUNT(*), COUNT(DISTINCT user_id),
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
      FROM events
      WHERE event_id % 3 <= 1 AND event_id % 50 = 1 AND user_id % 7 <> 3
    ) WHERE n > 0
    ORDER BY version
    """,
    tags=("streaming", "cdc", "snapshot", "lakehouse"),
)
def stream_snapshot_cdc(spark, sf_dir):
    """CDC TAIL of the snapshot store's manifest log as a structured
    stream (`crocus_snapshot_tail`) — the Delta-streaming-source shape
    and the read side that makes the whole commit protocol incremental:
    the reference re-reads entire snapshot files per run
    (base_scraper.py:72-83); a consumer of this feed sees only what
    each commit CHANGED. The store accrues four commits — initial
    snapshot (day-0 events), an append (day-1 increment), an equality
    delete (a user cohort erased: key-only tombstones, O(delta)), and a
    positional delete (specific rows erased: full PRE-IMAGES, because
    the (file, position) tombstones name exactly which rows died) —
    then one availableNow drain replays the log from version 0 with
    the manifest version as the checkpointed offset. The oracle
    recomputes every batch's rows from the raw fixture, so a hash match
    proves the feed emitted exactly each commit's delta: no row of
    history re-read, none skipped, inserts file-parallel. At 100 TB
    planning stays O(manifests + delete sets) and row data only ever
    moves for the files a commit actually touched."""
    import shutil
    import tempfile
    import uuid

    from crocus_spark.operators.maintenance import (
        commit_append,
        commit_equality_deletes,
        commit_positional_deletes,
        commit_snapshot,
        read_snapshot_with_positions,
    )
    from crocus_spark.queries.sources_q import _scratch
    from crocus_spark.sources import register_snapshot_tail_source

    register_snapshot_tail_source(spark)
    root = _scratch("cdc_tail_store")
    shutil.rmtree(root, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    day0 = events.filter(F.pmod("event_id", F.lit(3)) == 0).coalesce(2)
    day1 = events.filter(F.pmod("event_id", F.lit(3)) == 1).coalesce(1)
    commit_snapshot(day0, root)                                    # v0
    commit_append(day1, root)                                      # v1
    cohort = events.filter(F.pmod("user_id", F.lit(7)) == 3).select(
        "user_id"
    ).distinct()
    commit_equality_deletes(cohort, root, ["user_id"])             # v2
    live = read_snapshot_with_positions(spark, root)
    doomed = live.filter(F.pmod("event_id", F.lit(50)) == 1).select(
        "_file", "_pos"
    )
    commit_positional_deletes(doomed, root)                        # v3
    def attempt() -> str:
        # fresh checkpoint + sink per attempt: each worker-spawn retry is
        # a complete availableNow replay of the (static) snapshot log
        name = f"snapshot_cdc_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.format("crocus_snapshot_tail")
            .option("path", root)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="cdc_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return name

    feed = spark.table(retry_transient_stream(attempt))
    return (
        feed.groupBy(
            F.col("_op").alias("op"),
            F.col("_version").cast("int").alias("version"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .orderBy("version")
    )


@register(
    "stream_cdc_apply_merge",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS value_sum
    FROM events
    WHERE event_id % 3 <= 1
      AND user_id % 7 <> 3
      AND event_id % 50 <> 1
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "cdc", "snapshot", "merge"),
)
def stream_cdc_apply_merge(spark, sf_dir):
    """The CONSUMER half of the CDC loop: tail one store's change feed
    (`crocus_snapshot_tail`) and MAINTAIN a derived per-user aggregate
    store from it via foreachBatch — Delta CDF driving a materialized
    aggregate. Inserts add algebraic partials, positional-delete
    PRE-IMAGES subtract theirs (the reason the feed carries full rows
    for that op), equality-delete key tombstones anti-join their users
    out, and each batch commits the derived state exactly-once
    (version = batch_id, replace-mode manifest swap). The oracle
    computes the surviving aggregate straight from the fixture, so a
    hash match proves feed production AND application compose to the
    truth — end to end, per-batch cost is churn-sized, never
    source-history sized. Producer commits: day-0 snapshot, day-1
    append, a user-cohort equality delete, a row-level positional
    delete."""
    import shutil
    import uuid as _uuid

    from crocus_spark.operators.maintenance import (
        commit_append,
        commit_equality_deletes,
        commit_positional_deletes,
        commit_snapshot,
        read_snapshot_with_positions,
    )
    from crocus_spark.queries.sources_q import _scratch
    from crocus_spark.sources import register_snapshot_tail_source
    from crocus_spark.streaming.ops import foreach_batch_apply_cdc

    register_snapshot_tail_source(spark)
    src_root = _scratch("cdc_apply_src")
    derived_root = _scratch("cdc_apply_derived")
    shutil.rmtree(src_root, ignore_errors=True)
    shutil.rmtree(derived_root, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    commit_snapshot(
        events.filter(F.pmod("event_id", F.lit(3)) == 0).coalesce(2),
        src_root,
    )
    commit_append(
        events.filter(F.pmod("event_id", F.lit(3)) == 1).coalesce(1),
        src_root,
    )
    cohort = (
        events.filter(F.pmod("user_id", F.lit(7)) == 3)
        .select("user_id")
        .distinct()
    )
    commit_equality_deletes(cohort, src_root, ["user_id"])
    live = read_snapshot_with_positions(spark, src_root)
    commit_positional_deletes(
        live.filter(F.pmod("event_id", F.lit(50)) == 1).select(
            "_file", "_pos"
        ),
        src_root,
    )
    feed = (
        spark.readStream.format("crocus_snapshot_tail")
        .option("path", src_root)
        .load()
    )
    state = foreach_batch_apply_cdc(feed, derived_root)
    return (
        state.select(
            "user_id",
            "n_events",
            F.col("value_dec").cast("double").alias("value_sum"),
        ).orderBy("user_id")
    )


@register(
    "stream_cdc_eq_preimages",
    oracle="""
    SELECT * FROM (
      SELECT 'insert' AS op, 0 AS version, COUNT(*) AS n,
             COUNT(DISTINCT user_id) AS n_users,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS value_sum
      FROM events WHERE event_id % 3 = 0
      UNION ALL
      SELECT 'delete', 1, COUNT(*), COUNT(DISTINCT user_id),
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
      FROM events WHERE event_id % 3 = 0 AND event_id % 40 = 2
      UNION ALL
      SELECT 'delete', 2, COUNT(*), COUNT(DISTINCT user_id),
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
      FROM events
      WHERE event_id % 3 = 0 AND user_id % 9 = 4
        AND event_id % 40 <> 2
    ) WHERE n > 0
    ORDER BY version
    """,
    tags=("streaming", "cdc", "snapshot", "lakehouse"),
)
def stream_cdc_eq_preimages(spark, sf_dir):
    """Equality-delete PRE-IMAGES on the CDC tail
    (``option("eq_pre_images", "true")``): a consumer maintaining a
    NON-additive aggregate needs the dying rows' full values, which the
    default key-only tombstone cannot give it. The reader joins the
    commit's deleted keys against only the data files whose
    manifest-recorded [min, max] stats overlap them — the store commits
    with ``stats_columns`` on the delete key and range-clusters by it,
    so the join touches a bounded slice of the table, never a full
    scan. Rows that already died via an EARLIER positional delete are
    excluded (they belong to their own commit's delta, not this one's).
    The oracle recomputes every op's rows straight from the fixture —
    insert (day-0 snapshot), positional pre-images (v1), then the
    equality cohort's surviving pre-images (v2) with full value sums,
    which only full rows can produce: a hash match proves the pre-image
    join is exact. Planning stays O(manifests + delete delta); the
    pre-image reads are file-parallel over the stats-selected files."""
    import shutil
    import tempfile
    import uuid

    from crocus_spark.operators.maintenance import (
        commit_equality_deletes,
        commit_positional_deletes,
        commit_snapshot,
        read_snapshot_with_positions,
    )
    from crocus_spark.queries.sources_q import _scratch
    from crocus_spark.sources import register_snapshot_tail_source

    register_snapshot_tail_source(spark)
    root = _scratch("cdc_preimage_store")
    shutil.rmtree(root, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    day0 = (
        events.filter(F.pmod("event_id", F.lit(3)) == 0)
        .repartitionByRange(4, "user_id")
        .sortWithinPartitions("user_id")
    )
    commit_snapshot(day0, root, stats_columns=["user_id"])       # v0
    live = read_snapshot_with_positions(spark, root)
    commit_positional_deletes(
        live.filter(F.pmod("event_id", F.lit(40)) == 2).select(
            "_file", "_pos"
        ),
        root,
    )                                                            # v1
    cohort = (
        events.filter(F.pmod("user_id", F.lit(9)) == 4)
        .select("user_id")
        .distinct()
    )
    commit_equality_deletes(cohort, root, ["user_id"])           # v2
    def attempt() -> str:
        # fresh checkpoint + sink per attempt (see stream_snapshot_cdc)
        name = f"cdc_preimg_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.format("crocus_snapshot_tail")
            .option("path", root)
            .option("eq_pre_images", "true")
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="cdc_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return name

    feed = spark.table(retry_transient_stream(attempt))
    return (
        feed.groupBy(
            F.col("_op").alias("op"),
            F.col("_version").cast("int").alias("version"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .orderBy("version")
    )


@register(
    "stream_cdc_starting_timestamp",
    oracle="""
    SELECT * FROM (
      SELECT 'delete_key' AS op, 2 AS version, COUNT(*) AS n,
             COUNT(DISTINCT user_id) AS n_users
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 7 = 3)
      UNION ALL
      SELECT 'insert', 3, COUNT(*), COUNT(DISTINCT user_id)
      FROM events WHERE event_id % 3 = 2
    ) WHERE n > 0
    ORDER BY version
    """,
    tags=("streaming", "cdc", "snapshot", "timetravel"),
)
def stream_cdc_starting_timestamp(spark, sf_dir):
    """Delta's ``startingTimestamp`` on the CDC tail, driven by the r9
    manifest commit clocks: the consumer opts OUT of the initial
    snapshot load and takes only the changes committed at or after an
    instant — ``option("starting_timestamp", t)`` resolves against the
    strictly-monotone ``committed_at_ms`` fields (first version with
    commit time >= t), so "give me everything since last night's run"
    needs no version bookkeeping on the consumer side. The store
    accrues v0 (day-0 snapshot), v1 (day-1 append), v2 (cohort
    equality delete), v3 (day-2 append); the tail starts at v2's exact
    commit instant and the oracle recomputes ONLY v2+v3's deltas from
    the fixture — a hash match proves the cut is boundary-exact: v0/v1
    history is never re-read, nothing after the instant is missed."""
    import shutil
    import tempfile
    import uuid

    from crocus_spark.operators.maintenance import (
        commit_append,
        commit_equality_deletes,
        commit_snapshot,
        read_manifest,
    )
    from crocus_spark.queries.sources_q import _scratch
    from crocus_spark.sources import register_snapshot_tail_source

    register_snapshot_tail_source(spark)
    root = _scratch("cdc_start_ts_store")
    shutil.rmtree(root, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    commit_snapshot(
        events.filter(F.pmod("event_id", F.lit(3)) == 0).coalesce(2), root
    )                                                            # v0
    commit_append(
        events.filter(F.pmod("event_id", F.lit(3)) == 1).coalesce(1), root
    )                                                            # v1
    cohort = (
        events.filter(F.pmod("user_id", F.lit(7)) == 3)
        .select("user_id")
        .distinct()
    )
    commit_equality_deletes(cohort, root, ["user_id"])           # v2
    commit_append(
        events.filter(F.pmod("event_id", F.lit(3)) == 2).coalesce(1), root
    )                                                            # v3
    t2 = read_manifest(root, 2)["committed_at_ms"]
    def attempt() -> str:
        # fresh checkpoint + sink per attempt (see stream_snapshot_cdc)
        name = f"cdc_start_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.format("crocus_snapshot_tail")
            .option("path", root)
            .option("starting_timestamp", str(t2))
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="cdc_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return name

    feed = spark.table(retry_transient_stream(attempt))
    return (
        feed.groupBy(
            F.col("_op").alias("op"),
            F.col("_version").cast("int").alias("version"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("version")
    )


@register(
    "stream_cdc_apply_minmax",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           MAX(value) AS max_value,
           MIN(value) AS min_value
    FROM events
    WHERE event_id % 3 <= 1
      AND event_id % 50 <> 1
      AND event_type <> 'error'
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "cdc", "snapshot", "merge"),
)
def stream_cdc_apply_minmax(spark, sf_dir):
    """NON-distributive aggregate maintenance off the CDC feed — the
    case additive algebra cannot cover (you cannot subtract a deleted
    row from a MAX) and the reason the tail's ``eq_pre_images`` option
    exists: the equality delete here is keyed on ``event_type`` — NOT
    the group key — so a key-only tombstone would carry ``user_id``
    NULL and the consumer could not know which groups went dirty (the
    consumer fails loudly in that configuration). With pre-images,
    every deleted row carries its group: each batch derives the exact
    DIRTY-GROUP set from the feed, recomputes ONLY those groups against
    the source pinned at the batch's newest version, and carries every
    other group's state over untouched — per-batch cost is churn +
    dirty-group sized, never a full recompute. Producer commits: day-0
    snapshot, day-1 append, a positional row deletion, then the
    event_type='error' equality erasure. The oracle computes the final
    per-user count/max/min straight from the fixture: hash-green
    proves feed pre-images, dirty-set derivation, and group-pruned
    recompute compose to the truth."""
    import shutil

    from crocus_spark.operators.maintenance import (
        commit_append,
        commit_equality_deletes,
        commit_positional_deletes,
        commit_snapshot,
        read_snapshot_with_positions,
    )
    from crocus_spark.queries.sources_q import _scratch
    from crocus_spark.sources import register_snapshot_tail_source
    from crocus_spark.streaming.ops import foreach_batch_apply_cdc_groups

    register_snapshot_tail_source(spark)
    src = _scratch("cdc_minmax_src")
    derived = _scratch("cdc_minmax_derived")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(derived, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    commit_snapshot(
        events.filter(F.pmod("event_id", F.lit(3)) == 0).coalesce(2), src
    )                                                            # v0
    commit_append(
        events.filter(F.pmod("event_id", F.lit(3)) == 1).coalesce(1), src
    )                                                            # v1
    live = read_snapshot_with_positions(spark, src)
    commit_positional_deletes(
        live.filter(F.pmod("event_id", F.lit(50)) == 1).select(
            "_file", "_pos"
        ),
        src,
    )                                                            # v2
    commit_equality_deletes(
        local_df(spark, [("error",)], "event_type string"),
        src,
        ["event_type"],
    )                                                            # v3
    feed = (
        spark.readStream.format("crocus_snapshot_tail")
        .option("path", src)
        .option("eq_pre_images", "true")
        .load()
    )
    state = foreach_batch_apply_cdc_groups(feed, src, derived)
    return state.select(
        "user_id", "n_events", "max_value", "min_value"
    ).orderBy("user_id")


@register(
    "stream_cdc_windowed_totals",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '6 hours', ts) AS TIMESTAMP) AS win_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS value_sum
    FROM events
    WHERE event_id % 3 <= 1
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("streaming", "cdc", "snapshot", "window"),
)
def stream_cdc_windowed_totals(spark, sf_dir):
    """The CDC tail composed with Spark's BUILT-IN streaming operators —
    not a foreachBatch escape hatch: the change feed's insert rows flow
    straight into a tumbling event-time window aggregation
    (`F.window(ts, '6 hours')`), proving the custom Python stream
    source is a first-class citizen of Structured Streaming's operator
    graph (watermarks, windows, output modes all apply to it like any
    Kafka/file source). The store accrues two commits (day-0 snapshot +
    day-1 append); the oracle recomputes the window totals from the
    fixture with DuckDB's time_bucket — hash-green proves the feed's
    Arrow batches carry timestamps with exact instant semantics through
    the source → window → sink chain. At scale this is the shape of a
    streaming rollup maintained directly off the table's change feed,
    state bounded by open windows."""
    import shutil
    import tempfile
    import uuid

    from crocus_spark.operators.maintenance import (
        commit_append,
        commit_snapshot,
    )
    from crocus_spark.queries.sources_q import _scratch
    from crocus_spark.sources import register_snapshot_tail_source

    register_snapshot_tail_source(spark)
    root = _scratch("cdc_window_store")
    shutil.rmtree(root, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    commit_snapshot(
        events.filter(F.pmod("event_id", F.lit(3)) == 0).coalesce(2), root
    )
    commit_append(
        events.filter(F.pmod("event_id", F.lit(3)) == 1).coalesce(1), root
    )
    # scope state-store width for the query's lifetime (the stateful
    # operator pins its store count to this conf at first start; the
    # session's batch-tuned 32 would cost 32 stores of per-batch commit
    # fsyncs for a fixture-sized stream — same rationale as
    # streaming.ops.run_available_now)
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)

    def attempt() -> str:
        # fresh checkpoint + sink per attempt (see stream_snapshot_cdc)
        name = f"cdc_win_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.format("crocus_snapshot_tail")
            .option("path", root)
            .load()
            .filter(F.col("_op") == "insert")
            .groupBy(F.window("ts", "6 hours"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(25,6)"))
                .cast("double")
                .alias("value_sum"),
            )
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="cdc_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return name

    try:
        spark.conf.set(key, "8")
        name = retry_transient_stream(attempt)
    finally:
        spark.conf.set(key, prev)
    return (
        spark.table(name)
        .select(
            F.col("window.start").alias("win_start"),
            "n",
            "value_sum",
        )
        .orderBy("win_start")
    )


_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming."
    "state.RocksDBStateStoreProvider"
)


@register(
    "stream_stateful_tws",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "stateful", "tws"),
)
def stream_stateful_tws(spark, sf_dir):
    """Per-key running totals on ``transformWithStateInPandas`` — the
    Spark-4 arbitrary-state API (r10 verdict task #5), kept as an
    oracle-identical twin of ``stream_stateful_totals`` so BOTH state
    API generations stay covered: explicit typed ValueState on a
    StatefulProcessor, Arrow-batched rows per key, state in the
    executor RocksDB stores (the API requires multi-column-family
    support, which only RocksDB provides). The protobuf runtime the
    Python↔JVM state protocol needs resolves through
    crocus_spark/_protobuf_compat.py when not installed. Same window
    top-1 reduction and batch group-by oracle as the
    applyInPandasWithState twin — the API swap must be invisible to
    results."""
    from pyspark.sql.window import Window

    from crocus_spark.streaming.ops import stateful_user_totals_tws

    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(
        stateful_user_totals_tws(ev), "update", state_provider=_ROCKSDB
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_events").desc(), F.col("total_cents").desc()
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_cents")
        .orderBy("user_id")
    )


@register(
    "stream_session_expiry_tws",
    oracle="""
    WITH with_gap AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM with_gap
    ), agg AS (
      SELECT user_id, session_id,
             MIN(ts) AS s_start, MAX(ts) AS s_last, COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           strftime(s_start, '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           n_events
    FROM agg
    WHERE s_last + INTERVAL '30 minutes'
          <= (SELECT MAX(ts) FROM events) - INTERVAL '10 minutes'
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "stateful", "tws", "session", "timers"),
)
def stream_session_expiry_tws(spark, sf_dir):
    """TIMER-driven session expiry on ``transformWithStateInPandas``
    (r10 verdict task #5's full shape: event-time timers + composite
    typed state): each user's open session lives in a ValueState,
    data-closed sessions in a ListState, and EVENT-TIME TIMERS emit a
    session exactly when the watermark passes its last event + 30min
    gap — the same append-mode emission rule the built-in
    ``session_window`` applies (``stream_session_window`` is the
    built-in twin; the custom processor exists for the semantics the
    built-in can't express — per-session TTL actions, enrichment at
    expiry, side outputs). Sessions still open at end-of-stream are
    withheld, which is what the oracle's final-watermark WHERE
    encodes. availableNow-replayed; hash-green against the batch
    gaps-and-islands SQL."""
    from crocus_spark.streaming.ops import session_expiry_tws

    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(
        session_expiry_tws(ev), "append", state_provider=_ROCKSDB
    )
    return out.select(
        "user_id",
        F.date_format(
            F.col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("session_start"),
        "n_events",
    ).orderBy("user_id", "session_start")


@register(
    "stream_snapshot_sink",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "sink", "snapshot", "lakehouse"),
)
def stream_snapshot_sink(spark, sf_dir):
    """STREAMING ingestion into the lakehouse store (r11):
    ``df.writeStream.format("crocus_snapshot")`` — the
    DataSourceStreamArrowWriter sink appends each micro-batch to the
    manifest log EXACTLY-ONCE (per-epoch commit moves exactly the
    files the WriterCommitMessages reference into an immutable a-dir
    and append-commits it with a (txn_app, batchId) transaction; the
    manifest's folded txn ledger turns a replayed batch into a no-op —
    Delta's idempotent-writes action). Arrow-native end to end: no
    Spark Row ever materializes in Python on the write path.

    The query streams ``events`` through the sink (availableNow), then
    RE-DRAINS with the same checkpoint and asserts nothing new
    committed (the exactly-once story a restart depends on), reads the
    store back through the batch source, and aggregates — the oracle
    recomputes from ``events`` directly, so a dropped or
    double-counted micro-batch fails the hash. Replay/compaction
    ledger tests live in tests/test_snapshot_batch.py."""
    import shutil

    from crocus_spark.operators.maintenance import list_snapshot_versions
    from crocus_spark.queries.sources_q import _scratch
    from crocus_spark.sources import register_snapshot_source

    register_snapshot_source(spark)
    root = _scratch("stream_snap_sink")
    ckpt = _scratch("stream_snap_sink_ckpt")
    for p in (root, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    ev = read_events_stream(spark, sf_dir)

    def drain():
        def attempt() -> None:
            q = (
                ev.writeStream.format("crocus_snapshot")
                .option("path", root)
                .option("txn_app", "stream_snapshot_sink_q")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(300)
            finally:
                q.stop()

        # same checkpoint across attempts ON PURPOSE: the snapshot sink's
        # txn ledger makes a resumed drain exactly-once (that is what this
        # query asserts), so a worker-spawn retry is just a restart
        retry_transient_stream(attempt)

    drain()
    versions = list_snapshot_versions(root)
    assert versions, "sink committed nothing"
    drain()  # restart with the same checkpoint: must be a no-op
    assert list_snapshot_versions(root) == versions, "re-drain re-committed"
    store = (
        spark.read.format("crocus_snapshot").option("path", root).load()
    )
    return (
        store.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.col("value") * 100).cast("long")
            ).cast("long").alias("total_cents"),
        )
        .orderBy("user_id")
    )


@register(
    "stream_tws_mapstate",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
    tags=("streaming", "stateful", "tws", "mapstate"),
)
def stream_tws_mapstate(spark, sf_dir):
    """COMPOSITE state on transformWithStateInPandas (r11 — MapState,
    completing the Spark-4 state surface beside the ValueState totals
    and the timer sessions): one map per user keyed by event type,
    per-batch merge, full map emitted in update mode; window top-1
    keeps each (user, type)'s final running count, as in the totals
    twin. The operator also takes ``ttl_ms`` (the production
    state-bound knob for unbounded keyspaces) but this query runs
    WITHOUT it: measured in this environment, enabling state TTL
    turned a 9 s drain into a >9-minute one (the TTL secondary-index
    maintenance multiplies Python<->JVM state RPCs per update), so the
    TTL path is documented-but-not-benched rather than silently
    shipped as a hot path — see the ops docstring."""
    from pyspark.sql.window import Window

    from crocus_spark.streaming.ops import stateful_type_counts_tws

    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(
        stateful_type_counts_tws(ev),
        "update",
        state_provider=_ROCKSDB,
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("n").desc()
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "n")
        .orderBy("user_id", "event_type")
    )
