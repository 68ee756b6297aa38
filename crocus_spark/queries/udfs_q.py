"""UDF-surface queries — SURVEY.md §2B #61-64 — plus the salted-aggregation
scale pattern (§4.3). Every UDF query is oracle-checked: the Python path
must produce the same rows as the pure-SQL computation, which is the whole
point — the escape hatch is only usable if it doesn't change answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from crocus_spark.io import load
from crocus_spark.operators import skew as K
from crocus_spark.operators import udfs as U
from crocus_spark.queries import register
from crocus_spark.queries._det import DEC

# Cogroup-key coarsening for udf_cogrouped_asof: Python invocations are
# bounded at this many buckets instead of one per user. Sized ~2x the
# session shuffle parallelism; at a real 100 TB run this scales with the
# cluster (buckets ~ 2-4x executor cores), never with user cardinality.
_ASOF_BUCKETS = 64


@register(
    "udf_pandas_scalar",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens_udf,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens_jvm
    FROM documents
    ORDER BY doc_id
    """,
    tags=("udf",),
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized scalar pandas_udf (§2B#61): whitespace token count via
    Arrow batches, emitted side-by-side with the equivalent JVM expression —
    the query asserts Python-path == fast-path row by row."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            U.ws_token_count("text").alias("n_tokens_udf"),
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens_jvm"),
        )
        .orderBy("doc_id")
    )


@register(
    "udaf_weighted_mean",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
             AS w_mean_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("udf", "agg"),
)
def udaf_weighted_mean(spark, sf_dir):
    """Grouped-agg UDAF (§2B#62): quantity-weighted mean price per
    (returnflag, linestatus), accumulated as exact int64 micros inside the
    UDAF — order-independent, hash-identical to the oracle's DECIMAL sums."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            U.weighted_mean_price("l_extendedprice", "l_quantity").alias(
                "w_mean_price"
            )
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "udf_grouped_map_zscore",
    oracle="""
    WITH s AS (
      SELECT c_custkey, c_nationkey, c_acctbal,
             AVG(c_acctbal) OVER (PARTITION BY c_nationkey) AS mu,
             STDDEV_POP(c_acctbal) OVER (PARTITION BY c_nationkey) AS sd
      FROM customer
    )
    SELECT c_custkey, c_nationkey, c_acctbal,
           CASE WHEN sd = 0 THEN NULL
                ELSE round((c_acctbal - mu) / sd, 6) END AS zscore
    FROM s
    ORDER BY c_custkey
    """,
    tags=("udf", "window"),
)
def udf_grouped_map_zscore(spark, sf_dir):
    """Grouped-map applyInPandas (§2B#64): per-nation population z-score
    of account balance — one pandas frame per group, fsum-exact two-pass
    moments, matching the oracle's window AVG/STDDEV_POP."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    return U.zscore_by_group(cust, "c_nationkey").orderBy("c_custkey")


@register(
    "udtf_bigrams",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS s
      FROM documents WHERE doc_id < 100
    )
    SELECT * FROM (
      SELECT doc_id, unnest(list_transform(generate_series(1, len(s) - 1),
               i -> {'pos': i, 'bigram': s[i] || ' ' || s[i+1]}),
               recursive := true)
      FROM t
    )
    ORDER BY doc_id, pos
    """,
    tags=("udf",),
)
def udtf_bigrams(spark, sf_dir):
    """UDTF via lateral join (§2B#63): word bigrams per document — the
    row-expanding Python escape hatch, oracle-checked against DuckDB's
    list-comprehension equivalent."""
    U.register_udtfs(spark)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, pos, bigram
        FROM _udtf_docs, LATERAL bigrams(text)
        ORDER BY doc_id, pos
        """
    )


@register(
    "salted_groupby",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "scale"),
)
def salted_groupby(spark, sf_dir):
    """Two-stage salted aggregation (§4.3 skew rule): l_returnflag has 3
    values — the canonical hot-key groupBy. Stage 1 spreads each key over
    32 salted reducers, stage 2 merges ≤32 partials per key. Decimal sums
    make the re-association exact: output hash-equals the plain groupBy."""
    li = load(spark, sf_dir, "lineitem")
    out = K.salted_agg(
        li,
        ["l_returnflag"],
        aggs=[
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("sum_price"),
        ],
        final_aggs=[
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_qty").cast("double").alias("sum_qty"),
            F.sum("sum_price").cast("double").alias("sum_price"),
        ],
        salt_src="l_orderkey",
        n_salts=32,
    )
    return out.orderBy("l_returnflag")


@register(
    "join_salted_skew",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join", "scale"),
)
def join_salted_skew(spark, sf_dir):
    """Skew-salted equi-join (§4.3): orders is the skewed fact side, its
    per-row salt spreads any hot custkey over 16 reducers; customer is
    exploded ×16 (the shape for a dim too big to broadcast). The rewrite
    is purely physical — result hash-equals the plain join — which is the
    property that lets it be dropped into any plan at 100 TB when AQE's
    skew split can't help (e.g. a subsequent keyed agg pins partitioning).
    """
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = K.salted_join(orders, cust, "o_custkey", n_salts=16)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("sum_total"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    WITH t AS (
      SELECT lang,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tokens
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM t GROUP BY lang ORDER BY lang
    """,
    tags=("udf", "arrow"),
)
def udf_map_in_arrow(spark, sf_dir):
    """mapInArrow (§2B#61's zero-copy variant): the Python stage receives
    raw Arrow RecordBatches — no pandas materialization at all — and emits
    Arrow back. For byte-dense payloads (token-count over text here;
    media bytes in the multimodal path) this skips the Arrow→pandas→Arrow
    double conversion a pandas_udf pays, the cheapest possible
    Python-side hop at 100 TB. The batch boundary is also the memory
    contract: peak Python memory is one batch, never one partition."""
    import pyarrow as pa

    def count_tokens(batches):
        for batch in batches:
            langs = batch.column("lang")
            texts = batch.column("text").to_pylist()
            n = [len([t for t in (s or "").split(" ") if t]) for s in texts]
            yield pa.RecordBatch.from_arrays(
                [langs, pa.array(n, type=pa.int64())],
                names=["lang", "n_tokens"],
            )

    docs = load(spark, sf_dir, "documents").select("lang", "text")
    toks = docs.mapInArrow(count_tokens, "lang string, n_tokens long")
    return (
        toks.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "udf_cogrouped_asof",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.purchase_id,
           (SELECT c.click_id FROM clicks c
            WHERE c.user_id = p.user_id AND c.click_ts <= p.purchase_ts
            ORDER BY c.click_ts DESC, c.click_id DESC LIMIT 1) AS last_click_id
    FROM purchases p
    ORDER BY p.user_id, p.purchase_id
    """,
    tags=("udf", "cogroup", "asof"),
)
def udf_cogrouped_asof(spark, sf_dir):
    """Cogrouped-map pandas (§2B#64's two-sided sibling —
    ``groupBy().cogroup().applyInPandas``): both relations shuffle by
    the SAME key ONCE and arrive at the UDF as a pandas frame PAIR per
    key — the API for per-key logic that needs both sides at once (here
    an as-of backward merge via pandas merge_asof, the imperative twin
    of the declarative join_asof_events). The cogroup key is a hash
    BUCKET of user_id, not user_id itself: per-entity cogrouping pays a
    few ms of Arrow-slice + frame-construction overhead per Python call,
    so a billion users would mean a billion Python calls. Bucketing
    bounds the call count at _ASOF_BUCKETS while merge_asof(by=user_id)
    keeps exact per-user alignment inside each batch — the batch, not
    the entity, is the Python-hop unit at 100 TB (same contract as
    mapInArrow above). Users never straddle buckets, so semantics are
    identical to the per-user cogroup."""
    import pandas as pd

    # The two sides are loaded as SEPARATE scans on purpose: cogroup
    # sides carved from one shared events DataFrame share attribute
    # ids, and Spark's relation dedup then drops the right side's
    # un-aliased user_id from the Arrow payload (the aliased click_id/
    # click_ts survive), breaking merge_asof(by=) — seen under
    # count()-style actions. Independent scans give each side its own
    # attribute ids; each scan is event_type-filter-pruned, and one
    # shared scan would execute twice across the co-shuffle anyway.
    clicks = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    # The bucket is materialized as a column and grouped as a plain
    # reference (not a per-side derived grouping expression).
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(_ASOF_BUCKETS)).alias(
        "__bkt"
    )
    clicks = clicks.select("*", bucket)
    purchases = purchases.select("*", bucket)

    def asof(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        # left = purchases, right = clicks for ONE user_id bucket;
        # merge_asof(by=) re-scopes the backward search to each user.
        if len(left) == 0:
            return pd.DataFrame(
                columns=["user_id", "purchase_id", "last_click_id"]
            )
        if "click_id" not in right.columns:
            # a side with no rows for this key can arrive column-less
            right = pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "click_id": pd.Series(dtype="int64"),
                    # dtype must match the left on-key for merge_asof
                    "click_ts": left["purchase_ts"].iloc[:0],
                }
            )
        left = left.sort_values(["purchase_ts", "purchase_id"])
        # ties on click_ts break to the HIGHEST click_id (the SQL
        # correlated subquery orders click_ts DESC, click_id DESC):
        # merge_asof backward picks the LAST in-sort-order row per
        # by-group with click_ts <= purchase_ts, so click_id ascending
        # within equal click_ts yields exactly that row.
        right = right.sort_values(["click_ts", "click_id"])
        merged = pd.merge_asof(
            left,
            right[["user_id", "click_id", "click_ts"]],
            left_on="purchase_ts",
            right_on="click_ts",
            by="user_id",
            direction="backward",
        )
        out = merged[["user_id", "purchase_id"]].copy()
        out["last_click_id"] = merged["click_id"].astype("object").where(
            merged["click_id"].notna(), None
        )
        return out

    return (
        purchases.groupBy("__bkt")
        .cogroup(clicks.groupBy("__bkt"))
        .applyInPandas(
            asof, "user_id long, purchase_id long, last_click_id long"
        )
        .orderBy("user_id", "purchase_id")
    )
