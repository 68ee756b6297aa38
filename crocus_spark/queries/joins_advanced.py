"""Advanced join queries — as-of, range, interval overlap, fuzzy name.

SURVEY.md §2B #15-17, #59 over the driver fixtures, each backed by the
composed operators in ``crocus_spark.operators.joins`` and (where DuckDB can
express the same semantics) an oracle — incl. DuckDB's native ASOF JOIN as
the as-of oracle, exactly as SURVEY §4.3 prescribes.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from crocus_spark.io import load, spread
from crocus_spark.operators.joins import (
    asof_join,
    fuzzy_name_join,
    interval_overlap_join,
    range_join,
)
from crocus_spark.queries import register


@register(
    "join_asof_events",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts AS click_ts, value AS click_value
      FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           strftime(c.click_ts, '%Y-%m-%d %H:%M:%S.%f') AS prior_click_ts,
           c.click_value AS prior_click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.click_ts <= p.ts
    ORDER BY p.user_id, p.event_id
    """,
    tags=("join", "asof", "headline"),
)
def join_asof_events(spark, sf_dir):
    """As-of join (§2B#16): each purchase aligned with the user's latest
    prior click — the same 'nearest earlier snapshot' semantics needed to
    confront providers whose NAV dates differ (crocus: '28 feb 2025' vs
    '21/02/25'). Union+window implementation; DuckDB ASOF JOIN is the
    oracle. Timestamps emitted as strings for hash-stable comparison."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="click_ts",
        value_cols=["click_ts", "click_value"],
        suffix="",
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        F.date_format("click_ts", fmt).alias("prior_click_ts"),
        F.col("click_value").alias("prior_click_value"),
    ).orderBy("user_id", "event_id")


_BANDS = [
    Row(band="budget", lo=0.0, hi=1000.0),
    Row(band="mid", lo=1000.0, hi=1500.0),
    Row(band="premium", lo=1500.0, hi=2000.0),
    Row(band="luxury", lo=2000.0, hi=1e9),
]

_BANDS_SQL = """
    bands(band, lo, hi) AS (VALUES
      ('budget', 0.0, 1000.0),
      ('mid', 1000.0, 1500.0),
      ('premium', 1500.0, 2000.0),
      ('luxury', 2000.0, 1000000000.0)
    )
"""


@register(
    "join_range_bands",
    oracle=f"""
    WITH {_BANDS_SQL}
    SELECT band, COUNT(*) AS n_parts,
           CAST(MIN(p_retailprice) AS DOUBLE) AS min_price,
           CAST(MAX(p_retailprice) AS DOUBLE) AS max_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    ORDER BY band
    """,
    tags=("join", "range"),
)
def join_range_bands(spark, sf_dir):
    """Non-equi range join (§2B#15): parts histogrammed into price bands —
    the crocus 'price-band compare'. Broadcast nested loop over a
    dimension-sized bands table: linear in the fact side, no shuffle."""
    p = load(spark, sf_dir, "part")
    bands = spark.createDataFrame(_BANDS, schema="band string, lo double, hi double")
    return (
        range_join(p, bands, "p_retailprice")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
        .orderBy("band")
    )


_PROMOS = [
    Row(promo="launch95", p_start="1995-01-01 00:00:00", p_end="1995-06-30 00:00:00"),
    Row(promo="holiday97", p_start="1997-11-01 00:00:00", p_end="1997-12-31 00:00:00"),
    Row(promo="y2k", p_start="1999-10-01 00:00:00", p_end="2000-03-31 00:00:00"),
]

_PROMOS_SQL = """
    promos(promo, p_start, p_end) AS (VALUES
      ('launch95', TIMESTAMP '1995-01-01 00:00:00', TIMESTAMP '1995-06-30 00:00:00'),
      ('holiday97', TIMESTAMP '1997-11-01 00:00:00', TIMESTAMP '1997-12-31 00:00:00'),
      ('y2k', TIMESTAMP '1999-10-01 00:00:00', TIMESTAMP '2000-03-31 00:00:00')
    )
"""


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH {_PROMOS_SQL},
    order_windows AS (
      SELECT o_orderkey, o_orderdate AS o_start,
             o_orderdate + INTERVAL 30 DAY AS o_end
      FROM orders
    )
    SELECT promo, COUNT(*) AS n_orders
    FROM order_windows
    JOIN promos ON o_start <= p_end AND p_start <= o_end
    GROUP BY promo
    ORDER BY promo
    """,
    tags=("join", "range"),
)
def join_interval_overlap(spark, sf_dir):
    """Interval overlap join (§2B#17): 30-day order fulfillment windows vs
    promo periods — holding-period-overlap semantics. Closed intervals,
    broadcast small side."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").alias("o_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("o_end"),
    )
    promos = spark.createDataFrame(_PROMOS).select(
        "promo",
        F.col("p_start").cast("timestamp"),
        F.col("p_end").cast("timestamp"),
    )
    return (
        interval_overlap_join(o, promos, "o_start", "o_end", "p_start", "p_end")
        .groupBy("promo")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("promo")
    )


@register(
    "join_fuzzy_name",
    oracle="""
    SELECT s.s_suppkey AS suppkey_a, r.s_suppkey AS suppkey_b,
           s.s_name AS name_a, r.s_name AS name_b,
           levenshtein(s.s_name, r.s_name) AS edit_distance
    FROM supplier s
    JOIN supplier r ON s.s_nationkey = r.s_nationkey
                   AND s.s_suppkey < r.s_suppkey
    WHERE levenshtein(s.s_name, r.s_name) <= 2
    ORDER BY suppkey_a, suppkey_b
    """,
    tags=("join", "fuzzy"),
)
def join_fuzzy_name(spark, sf_dir):
    """Fuzzy name match with blocking (§2B#59): near-identical supplier
    names within a nation block, Levenshtein ≤ 2 — the crocus fallback
    matcher for products missing an ISIN. Blocking on nation keeps the
    candidate set O(block²) instead of O(n²)."""
    s = load(spark, sf_dir, "supplier")
    pairs = fuzzy_name_join(
        s,
        s,
        block_on="s_nationkey",
        left_name="s_name",
        right_name="s_name",
        max_edit_distance=2,
    ).filter(F.col("s_suppkey") < F.col("r_s_suppkey"))
    return pairs.select(
        F.col("s_suppkey").alias("suppkey_a"),
        F.col("r_s_suppkey").alias("suppkey_b"),
        F.col("s_name").alias("name_a"),
        F.col("r_s_name").alias("name_b"),
        "edit_distance",
    ).orderBy("suppkey_a", "suppkey_b")


@register(
    "join_null_safe_eq",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CASE WHEN o_custkey % 97 = 0 THEN NULL
                  ELSE o_custkey % 100 END AS k
      FROM orders
    ), c AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 97 = 0 THEN NULL
                  ELSE c_custkey % 100 END AS k
      FROM customer
    )
    SELECT o.k AS k, COUNT(*) AS n_pairs,
           COUNT(*) FILTER (WHERE o.k IS NULL) AS n_null_pairs
    FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k
    GROUP BY o.k
    ORDER BY k NULLS FIRST
    """,
    tags=("join", "nullsafe"),
)
def join_null_safe_eq(spark, sf_dir):
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    each other instead of vanishing — the semantics entity resolution
    needs when the join key (ISIN, ticker) is absent on both sides of a
    candidate pair. Spark plans eqNullSafe as a plain hash join on the
    coalesced key (null-safe equality IS hashable), so the 100 TB cost
    equals an ordinary equi-join; the NULL bucket is one key and shows up
    to AQE as just another (possibly skewed) partition."""
    o = load(spark, sf_dir, "orders").select(
        F.when(F.col("o_custkey") % 97 == 0, F.lit(None))
        .otherwise(F.col("o_custkey") % 100)
        .alias("k")
    )
    c = load(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 97 == 0, F.lit(None))
        .otherwise(F.col("c_custkey") % 100)
        .alias("ck")
    )
    return (
        o.join(c, F.col("k").eqNullSafe(F.col("ck")))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("n_null_pairs"),
        )
        .orderBy(F.col("k").asc_nulls_first())
    )


@register(
    "join_strategy_hints",
    oracle="""
    WITH j AS (
      SELECT l_orderkey, o_totalprice
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ), m AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               AS sum_price
      FROM j
    )
    SELECT s.strategy, m.n_rows, m.sum_price
    FROM (VALUES ('broadcast'), ('merge'), ('shuffle_hash')) AS s(strategy)
    CROSS JOIN m
    ORDER BY s.strategy
    """,
    tags=("join", "hints", "scale"),
)
def join_strategy_hints(spark, sf_dir):
    """Explicit physical join-strategy control (the escape hatch when
    Catalyst's estimate is wrong at 100 TB): the SAME logical join run
    under broadcast / merge / shuffle_hash hints must produce identical
    results — the hint moves cost, never semantics. Each branch returns
    its strategy label + aggregate; tests/test_plans.py pins that each
    hint actually changed the physical operator (BroadcastHashJoin vs
    SortMergeJoin vs ShuffledHashJoin). shuffle_hash is the one AQE can't
    pick on its own pre-3.2-style: builds a hash map per partition,
    skipping both the sort and the broadcast memory ceiling."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    outs = []
    for strategy in ("broadcast", "merge", "shuffle_hash"):
        j = li.join(o.hint(strategy), li.l_orderkey == o.o_orderkey)
        outs.append(
            j.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
                .cast("double")
                .alias("sum_price"),
            ).select(F.lit(strategy).alias("strategy"), "n_rows", "sum_price")
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionAll(x)
    return out.orderBy("strategy")


@register(
    "join_asof_tolerance",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts AS click_ts, value AS click_value
      FROM events WHERE event_type = 'click'
    ), matched AS (
      SELECT p.user_id, p.event_id, p.ts, c.click_ts, c.click_value
      FROM purchases p
      ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND c.click_ts <= p.ts
    )
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           CASE WHEN click_ts >= ts - INTERVAL 2 HOUR
                THEN strftime(click_ts, '%Y-%m-%d %H:%M:%S.%f') END
             AS recent_click_ts,
           CASE WHEN click_ts >= ts - INTERVAL 2 HOUR
                THEN click_value END AS recent_click_value,
           CASE WHEN click_ts IS NULL THEN 'no_click'
                WHEN click_ts >= ts - INTERVAL 2 HOUR THEN 'within_tolerance'
                ELSE 'stale' END AS match_status
    FROM matched
    ORDER BY user_id, event_id
    """,
    tags=("join", "asof"),
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a match tolerance (§2B#16, the pandas
    ``merge_asof(tolerance=...)`` semantics): each purchase takes the
    user's latest prior click only if it happened within the last 2
    hours — older matches are demoted to NULL but the left row survives
    (attribution windows, stale-quote suppression in the crocus NAV
    confront). Implementation: the same single-shuffle union+window
    as-of, carrying the matched timestamp so the tolerance is one
    post-hoc row-local CASE — no second join, no inequality-join blowup;
    the oracle applies the identical CASE over DuckDB's native ASOF."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="click_ts",
        value_cols=["click_ts", "click_value"],
        suffix="",
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    in_tol = F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 2 HOURS")
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        F.when(in_tol, F.date_format("click_ts", fmt)).alias(
            "recent_click_ts"
        ),
        F.when(in_tol, F.col("click_value")).alias("recent_click_value"),
        F.when(F.col("click_ts").isNull(), "no_click")
        .when(in_tol, "within_tolerance")
        .otherwise("stale")
        .alias("match_status"),
    ).orderBy("user_id", "event_id")


@register(
    "join_reciprocal_best",
    oracle="""
    WITH scored AS (
      SELECT c_custkey, s_suppkey,
             abs(c_acctbal - s_acctbal) AS gap,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY abs(c_acctbal - s_acctbal),
                                         s_suppkey) AS rk_c,
             ROW_NUMBER() OVER (PARTITION BY s_suppkey
                                ORDER BY abs(c_acctbal - s_acctbal),
                                         c_custkey) AS rk_s
      FROM customer CROSS JOIN supplier
    )
    SELECT c_custkey, s_suppkey, CAST(gap AS FLOAT) AS balance_gap
    FROM scored
    WHERE rk_c = 1 AND rk_s = 1
    ORDER BY c_custkey
    """,
    tags=("join", "entity-resolution"),
)
def join_reciprocal_best(spark, sf_dir):
    """Reciprocal best match (mutual nearest neighbor): customer-supplier
    pairs where each is the OTHER's closest account balance — the
    high-precision pairing rule entity resolution uses to accept matches
    without a threshold (and the RBM step of modern embedding dedup
    pipelines). Both argmax directions break ties by key, so the mutual
    set is fully deterministic.

    Spark shape: the candidate relation is customers × the broadcast
    supplier DIMENSION (linear in customers, like `ann_bruteforce_topk` —
    never fact × fact; banded candidates via `join_range_bands` are the
    swap if both sides grow). Each side's best match is an ARGMIN — one
    `min(struct(gap, key))` hash aggregate per direction, map-side
    combined down to group-count rows before any exchange — NOT a
    rank-1 window, which would sort the full candidate relation twice
    (the oracle keeps the textbook window form; struct-min's
    lexicographic order is exactly its (gap, key) tie rule). The mutual
    filter is then a key-sized join of the two argmin relations. The
    same plan shape runs RBM over LSH candidate pairs at corpus scale."""
    # spread: the broadcast cross product (customers × suppliers) and
    # both argmin partial aggregates pipeline into the customer scan
    # task — a one-split fixture scan would run the full candidate
    # generation single-threaded, twice (once per argmin direction)
    cust = spread(load(spark, sf_dir, "customer"), spark).select(
        "c_custkey", "c_acctbal"
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal"
    )
    scored = cust.crossJoin(F.broadcast(supp)).select(
        "c_custkey",
        "s_suppkey",
        F.abs(F.col("c_acctbal") - F.col("s_acctbal")).alias("gap"),
    )
    best_c = (
        scored.groupBy("c_custkey")
        .agg(F.min(F.struct("gap", "s_suppkey")).alias("m"))
        .select("c_custkey", F.col("m.s_suppkey").alias("s_suppkey"),
                F.col("m.gap").alias("gap"))
    )
    best_s = (
        scored.groupBy("s_suppkey")
        .agg(F.min(F.struct("gap", "c_custkey")).alias("m"))
        .select("s_suppkey", F.col("m.c_custkey").alias("c_custkey"))
    )
    return (
        best_c.join(F.broadcast(best_s), ["c_custkey", "s_suppkey"])
        .select(
            "c_custkey",
            "s_suppkey",
            F.col("gap").cast("float").alias("balance_gap"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'
    ),
    cand AS (
      SELECT p.user_id, p.event_id, p.ts,
             (SELECT c.cts FROM c
              WHERE c.user_id = p.user_id
              ORDER BY abs(date_diff('microsecond', p.ts, c.cts)), c.cts
              LIMIT 1) AS nearest
      FROM p
    )
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           strftime(nearest, '%Y-%m-%d %H:%M:%S.%f') AS nearest_click_ts,
           CASE WHEN nearest IS NULL THEN NULL
                WHEN nearest <= ts THEN 'backward'
                ELSE 'forward' END AS direction,
           abs(date_diff('microsecond', ts, nearest)) AS gap_us
    FROM cand ORDER BY user_id, event_id
    """,
    tags=("join", "asof"),
)
def join_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest')``): each purchase pairs with the user's closest click in
    TIME — before or after — ties to the earlier click. Completes the
    as-of family (backward: `join_asof_events`; backward+tolerance:
    `join_asof_tolerance`).

    Spark shape: two union-carry passes over the same per-user sort key —
    backward carries the last click ≤ t; FORWARD reuses the identical
    backward operator on NEGATED microsecond timestamps (latest -ts' ≤
    -t ⟺ earliest ts' ≥ t), then a row-local CASE picks the nearer side.
    Carrying only the timestamp itself makes equal-ts right rows
    harmless (they carry the same value), and the whole thing stays two
    shuffles on user_id — no event×event join. The oracle is the
    declarative correlated ORDER BY |Δt| LIMIT 1, which Catalyst could
    not decorrelate — the union-carry IS the scale path."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    back = asof_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="cts",
        value_cols=["cts"],
        suffix="_b",
    ).withColumnRenamed("cts_b", "prev_cts")
    p_neg = purchases.withColumn("nts", -F.unix_micros("ts"))
    c_neg = clicks.select(
        "user_id", (-F.unix_micros("cts")).alias("ncts")
    )
    fwd = asof_join(
        p_neg,
        c_neg,
        by="user_id",
        left_ts="nts",
        right_ts="ncts",
        value_cols=["ncts"],
        suffix="_f",
    ).select(
        "user_id",
        "event_id",
        F.timestamp_micros(-F.col("ncts_f")).alias("next_cts"),
    )
    both = back.join(fwd, ["user_id", "event_id"])
    gap_b = F.unix_micros("ts") - F.unix_micros("prev_cts")
    gap_f = F.unix_micros("next_cts") - F.unix_micros("ts")
    nearest = (
        F.when(F.col("prev_cts").isNull(), F.col("next_cts"))
        .when(F.col("next_cts").isNull(), F.col("prev_cts"))
        .when(gap_f < gap_b, F.col("next_cts"))
        .otherwise(F.col("prev_cts"))
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return both.select(
        "user_id",
        "event_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        F.date_format(nearest, fmt).alias("nearest_click_ts"),
        F.when(nearest.isNull(), F.lit(None).cast("string"))
        .when(nearest <= F.col("ts"), "backward")
        .otherwise("forward")
        .alias("direction"),
        F.abs(
            F.unix_micros(nearest) - F.unix_micros("ts")
        ).alias("gap_us"),
    ).orderBy("user_id", "event_id")
