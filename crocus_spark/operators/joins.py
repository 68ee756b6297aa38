"""Composed join operators Spark lacks natively — SURVEY.md §2B #15-17, #59.

The reference's implied workload needs these: as-of (align two providers'
snapshot dates — ``ishares.json:8`` "28 feb 2025" vs ``vanguard.json:9``
"21/02/25"), interval overlap (holding periods), and fuzzy name match
(cross-provider confront when ISIN is missing, crocus J2 / README.md:4).

All are compositions of built-in DataFrame ops — no UDFs, no collect — so
they inherit Catalyst optimization and scale with a single shuffle each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``by`` key (ties included).

    Implementation — the union+window trick (no native Spark primitive):
    tag both sides, union on a common schema, sort each key partition by
    (ts, side) with right rows first at equal ts, then carry the last
    non-null right payload forward with ``last(ignorenulls)`` over an
    unbounded-preceding frame. One shuffle on ``by``, one partition sort —
    the same cost profile as a sort-merge join, and it streams: no per-key
    buffering of the whole right side.

    Matches DuckDB ``ASOF JOIN ... ON l.by = r.by AND r.ts <= l.ts``
    semantics (the oracle used in tests), assuming right (by, ts) pairs are
    unique — pre-dedup the right side otherwise.

    100 TB notes: cost is one hash exchange of left+right on ``by`` plus an
    in-partition sort; skewed keys are split by AQE. For a small right side,
    a broadcast variant (range-bucketed lookup) would avoid shuffling the
    left fact entirely — not needed at current scales.
    """
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1))
    for c in value_cols:
        l = l.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    l = l.withColumn("__ts", F.col(left_ts))

    r = right.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(right_ts))
    for c in value_cols:
        r = r.withColumn(f"__r_{c}", F.col(c))
    for c in lcols:
        if c not in right.columns or c == by:
            if c != by:
                r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    keep = [by, "__ts", "__side"] + [c for c in lcols if c != by] + [
        f"__r_{c}" for c in value_cols
    ]
    unioned = l.select(*keep).unionByName(r.select(*keep), allowMissingColumns=False)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        unioned = unioned.withColumn(
            f"{c}{suffix}", F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    return unioned.filter(F.col("__side") == 1).select(
        by,
        *[c for c in lcols if c != by],
        *[f"{c}{suffix}" for c in value_cols],
    )


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Range (theta) join: fact rows matched to [lo, hi) bands (§2B#15).

    The bands side must be dimension-sized: Spark executes this as a
    BroadcastNestedLoopJoin, which is linear in the fact and never shuffles
    it. For band counts in the thousands+, pre-bucketize instead: assign
    each fact row a bucket id with ``width_bucket``-style arithmetic and
    equi-join on bucket — turning O(n·m) into O(n).
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(bands), cond)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
) -> DataFrame:
    """Interval overlap join (§2B#17): rows whose [start, end] periods
    intersect — closed-interval semantics ``l.start <= r.end AND
    r.start <= l.end`` (holding-period overlap in the crocus workload).
    Small side broadcast; for two fact-sized interval sets, slice time into
    grid cells, explode intervals onto cells, equi-join on cell, dedup."""
    cond = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    return left.join(F.broadcast(right), cond)


def fuzzy_name_join(
    left: DataFrame,
    right: DataFrame,
    block_on: str | Column,
    left_name: str,
    right_name: str,
    max_edit_distance: int = 2,
) -> DataFrame:
    """Fuzzy name match with blocking (§2B#59 — the crocus cross-provider
    confront fallback when ISIN is absent).

    Candidate pairs are generated only within a blocking key (e.g. first
    name token + currency), then filtered by Levenshtein distance — an
    equi-join plus a cheap post-filter instead of an O(n²) cross product.
    At 100 TB the blocking key IS the scalability story: pick one selective
    enough that per-block candidate sets stay bounded, and salt hot blocks.
    """
    l = left.withColumn("__blk", F.col(block_on) if isinstance(block_on, str) else block_on)
    r = right.withColumn("__blk", F.col(block_on) if isinstance(block_on, str) else block_on)
    r = r.select("__blk", *[F.col(c).alias(f"r_{c}") for c in right.columns])
    joined = l.join(r, "__blk")
    dist = F.levenshtein(F.col(left_name), F.col(f"r_{right_name}"))
    return joined.withColumn("edit_distance", dist).filter(
        F.col("edit_distance") <= max_edit_distance
    ).drop("__blk")
