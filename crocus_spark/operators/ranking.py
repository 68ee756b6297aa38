"""Distributed global-order primitives — rank, row_number, and cumulative
sums over a total order WITHOUT the single-partition sort that a naive
``Window.orderBy(...)`` (no partitionBy) implies.

The naive form is the canonical 100 TB anti-pattern: Spark warns
``WindowExec: No Partition Defined`` and funnels the whole relation
through one task. Every helper here replaces it with the range-shard +
per-shard-rank + broadcast-offset decomposition already proven in
``operators/corpus.py:assign_global_row_ids`` (r2 verdict asked for it to
be promoted into a shared, key-type-general helper):

1. shard boundaries come from ``approx_percentile`` over the order key,
   computed IN-PLAN and carried as a one-row broadcast (no driver
   collect; boundary *placement* never affects results — only which
   shard does which slice of the work — so approximate quantiles are
   exactly as correct as exact ones);
2. rows range-shard by binary comparison against the boundary array —
   rows equal on the shard key always co-locate, so ties of the order
   key never straddle shards;
3. per-shard ranks/cumulatives run as ordinary partitioned windows, in
   parallel;
4. shard totals (≤ n_shards rows — metadata, not data) get prefix sums
   through a trivially small window and broadcast back as offsets.

Three shuffles of which only one moves the data rows (by shard); the
rest are metadata-sized.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_range_shard(
    df: DataFrame, key: str, n_shards: int
) -> DataFrame:
    """Attach ``_shard``: a monotone-in-``key`` shard id from in-plan
    approx-percentile boundaries. Equal keys always share a shard (the
    shard is a deterministic function of the key value alone). Shard ids
    need not be consecutive — every consumer aggregates or windows BY
    shard, never arithmetic ON the id."""
    pcts = [i / n_shards for i in range(1, n_shards)]
    bounds = df.agg(
        F.percentile_approx(
            F.col(key), F.array(*[F.lit(p) for p in pcts]), F.lit(10_000)
        ).alias("_bounds")
    )
    return df.crossJoin(F.broadcast(bounds)).withColumn(
        "_shard",
        F.coalesce(
            F.size(F.filter("_bounds", lambda b: b < F.col(key))),
            F.lit(0),
        ),
    ).drop("_bounds")


def ranked_global(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "_rn",
    n_shards: int = 32,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY *order_cols)`` (1-based,
    in ``out_col``) with no single-partition sort. ``order_cols[0]`` must
    be numeric (it feeds the percentile sketch); remaining columns break
    ties within shards, where all rows equal on the first key co-locate.
    """
    first = order_cols[0]
    sharded = with_range_shard(df, first, n_shards)
    counts = sharded.groupBy("_shard").agg(F.count(F.lit(1)).alias("_sn"))
    w_off = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )  # ≤ n_shards rows — metadata-sized
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_sn").over(w_off), F.lit(0))
    ).select("_shard", "_off")
    in_shard = Window.partitionBy("_shard").orderBy(*order_cols)
    return (
        sharded.withColumn("_r", F.row_number().over(in_shard))
        .join(F.broadcast(offsets), "_shard")
        .withColumn(out_col, (F.col("_off") + F.col("_r")).cast("long"))
        .drop("_shard", "_r", "_off")
    )


def cumulative_below(
    df: DataFrame,
    value_col: str,
    weight_cols: Sequence[str],
    n_shards: int = 32,
) -> DataFrame:
    """For a DISTINCT-VALUE relation (one row per ``value_col``), attach
    ``_cum_<w>`` = SUM(w) over all rows with STRICTLY SMALLER value, for
    each w in ``weight_cols`` — the building block for empirical CDFs,
    midranks, and rank-sum statistics, none of which need per-row global
    ranks at all: they decompose over the value-frequency relation
    (distinct-values-sized), which this helper cumulates shard-parallel.
    """
    sharded = with_range_shard(df, value_col, n_shards)
    shard_tot = sharded.groupBy("_shard").agg(
        *[F.sum(w).alias(f"_t_{w}") for w in weight_cols]
    )
    w_off = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )  # ≤ n_shards rows — metadata-sized
    offsets = shard_tot.select(
        "_shard",
        *[
            F.coalesce(F.sum(f"_t_{w}").over(w_off), F.lit(0)).alias(
                f"_o_{w}"
            )
            for w in weight_cols
        ],
    )
    in_shard = (
        Window.partitionBy("_shard")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = sharded.join(F.broadcast(offsets), "_shard")
    for w in weight_cols:
        out = out.withColumn(
            f"_cum_{w}",
            (
                F.col(f"_o_{w}")
                + F.coalesce(F.sum(w).over(in_shard), F.lit(0))
            ).cast("long"),
        )
    return out.drop(
        "_shard", *[f"_o_{w}" for w in weight_cols]
    )
