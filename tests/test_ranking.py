"""Unit/property tests for operators/ranking.py — the shard-offset
global-order primitives — against the naive single-partition window they
replace. The oracle queries exercise them end-to-end; these pin the
operators directly on adversarial shapes (ties, skew, few rows, empty),
where boundary placement and shard-membership consistency bite first."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from crocus_spark.operators.ranking import (
    cumulative_below,
    ranked_global,
    with_range_shard,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


CASES = {
    "dense_ties": [(v % 5, i) for i, v in enumerate(range(200))],
    "all_equal": [(7, i) for i in range(64)],
    "skewed": [(0, i) for i in range(150)] + [(j, 200 + j) for j in range(10)],
    "singleton": [(3, 0)],
    "negatives": [((-1) ** i * (i // 3), i) for i in range(90)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_ranked_global_matches_naive_window(spark, name):
    df = _df(spark, CASES[name], "k long, tie long")
    got = ranked_global(df, ["k", "tie"], out_col="rn", n_shards=8)
    naive = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("k", "tie"))
    )
    assert sorted(got.select("k", "tie", "rn").collect()) == sorted(
        naive.select("k", "tie", "rn").collect()
    )


def test_ranked_global_empty(spark):
    df = _df(spark, [], "k long, tie long")
    assert ranked_global(df, ["k", "tie"], n_shards=8).count() == 0


@pytest.mark.parametrize("name", sorted(CASES))
def test_cumulative_below_matches_naive(spark, name):
    # build a distinct-value relation with a weight per value
    base = _df(spark, CASES[name], "k long, tie long")
    freq = base.groupBy("k").agg(F.count(F.lit(1)).alias("w"))
    got = cumulative_below(freq, "k", ["w"], n_shards=8)
    naive = freq.withColumn(
        "_cum_w",
        F.coalesce(
            F.sum("w").over(
                Window.orderBy("k").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    assert sorted(got.select("k", "w", "_cum_w").collect()) == sorted(
        naive.select("k", "w", "_cum_w").collect()
    )


def test_equal_keys_share_a_shard(spark):
    """Ties must never straddle shards — the invariant everything else
    rests on (the partitioner is a deterministic function of the key)."""
    df = _df(spark, [(v % 7, i) for i, v in enumerate(range(500))],
             "k long, tie long")
    sharded = with_range_shard(df, "k", 8)
    n_pairs = (
        sharded.groupBy("k")
        .agg(F.countDistinct("_shard").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert n_pairs == 0


def test_shard_assignment_is_stable_across_reads(spark):
    """The checkpointed shard relation must give identical answers when
    read twice (fresh-boundary-per-evaluation was a real bug: offsets
    and ranks disagreed between the two passes)."""
    df = _df(spark, [(i * 13 % 97, i) for i in range(400)],
             "k long, tie long")
    sharded = with_range_shard(df, "k", 8)
    first = sorted(sharded.select("k", "tie", "_shard").collect())
    second = sorted(sharded.select("k", "tie", "_shard").collect())
    assert first == second


def test_ranked_global_rank_set_is_exactly_1_to_n(spark):
    df = _df(spark, [(i % 11, i) for i in range(333)], "k long, tie long")
    got = ranked_global(df, ["k", "tie"], out_col="rn", n_shards=8)
    ranks = sorted(r.rn for r in got.select("rn").collect())
    assert ranks == list(range(1, 334))


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("inclusive", [True, False])
def test_running_global_matches_naive(spark, name, inclusive):
    from crocus_spark.operators.ranking import running_global

    df = _df(spark, CASES[name], "k long, tie long").withColumn(
        "w", (F.col("tie") % 7 + 1)
    )
    got = running_global(
        df, ["k", "tie"], "w", out_col="run", n_shards=8,
        inclusive=inclusive,
    )
    end = 0 if inclusive else -1
    naive = df.withColumn(
        "run",
        F.coalesce(
            F.sum("w").over(
                Window.orderBy("k", "tie").rowsBetween(
                    Window.unboundedPreceding, end
                )
            ),
            F.lit(0),
        ),
    )
    assert sorted(got.select("k", "tie", "run").collect()) == sorted(
        naive.select("k", "tie", "run").collect()
    )


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("inclusive", [True, False])
def test_running_max_global_matches_naive(spark, name, inclusive):
    from crocus_spark.operators.ranking import running_max_global

    df = _df(spark, CASES[name], "k long, tie long").withColumn(
        "v", (F.col("tie") * 7 % 13) - 5
    )
    got = running_max_global(
        df, ["k", "tie"], "v", out_col="rm", n_shards=8,
        inclusive=inclusive,
    )
    end = 0 if inclusive else -1
    naive = df.withColumn(
        "rm",
        F.max("v").over(
            Window.orderBy("k", "tie").rowsBetween(
                Window.unboundedPreceding, end
            )
        ),
    )
    assert sorted(
        got.select("k", "tie", "rm").collect(),
        key=lambda r: (r.k, r.tie, r.rm is None, r.rm),
    ) == sorted(
        naive.select("k", "tie", "rm").collect(),
        key=lambda r: (r.k, r.tie, r.rm is None, r.rm),
    )


@pytest.mark.parametrize("n", [1, 4, 5, 9, 10, 11, 37, 100])
@pytest.mark.parametrize("k", [2, 5, 10])
def test_ntile_from_rank_matches_builtin(spark, n, k):
    from crocus_spark.operators.ranking import ntile_from_rank

    df = _df(spark, [(i,) for i in range(1, n + 1)], "rn long").withColumn(
        "n", F.lit(n).cast("long")
    )
    got = df.select(
        "rn", ntile_from_rank("rn", "n", k).alias("b")
    )
    naive = df.select(
        "rn", F.ntile(k).over(Window.orderBy("rn")).alias("b")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_cumulative_below_keeps_double_weights(spark):
    """Fractional weights must not be floored by a long cast (the r4
    kaplan-meier log-sum path)."""
    rows = [(float(i), 0.1 * i) for i in range(20)]
    df = _df(spark, rows, "v double, w double")
    got = cumulative_below(df, "v", ["w"], n_shards=4)
    assert got.schema["_cum_w"].dataType.typeName() == "double"
    naive = {
        r.v: r.c
        for r in df.withColumn(
            "c",
            F.coalesce(
                F.sum("w").over(
                    Window.orderBy("v").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0.0),
            ),
        )
        .select("v", "c")
        .collect()
    }
    for r in got.select("v", "_cum_w").collect():
        assert abs(r._cum_w - naive[r.v]) < 1e-9
