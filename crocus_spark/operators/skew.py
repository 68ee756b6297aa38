"""Skew-mitigation helpers — SURVEY.md §4.3 "100 TB design rules".

AQE (`spark.sql.adaptive.skewJoin`) handles *shuffle-join* skew at
runtime; these helpers cover the two cases it can't:

- aggregation skew: a groupBy whose key distribution concentrates most
  rows on a handful of keys ⇒ one reducer does all the work. Fix:
  two-stage salted aggregation (partial by (key, salt), final by key) —
  valid for any algebraic aggregate.
- skewed-key equi-join where neither side broadcasts: salt the skewed
  side's key, replicate the other side once per salt value.

Salts are deterministic (hash of a stable column), so salted plans give
bit-identical results to the unsalted plan — which is exactly how the
oracle verifies them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(src: Column | str, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from a stable column — hashed,
    not random: re-runs and retried tasks must agree."""
    c = F.col(src) if isinstance(src, str) else src
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: list[Column],
    final_aggs: list[Column],
    salt_src: str,
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage salted aggregation.

    Stage 1 groups by (group_cols…, salt) — the hot key's rows spread over
    ``n_salts`` reducers; stage 2 re-aggregates the ≤ n_salts partial rows
    per key. ``aggs`` are the partial aggregates, ``final_aggs`` recombine
    them (sum→sum, count→sum, min→min, …). Exactness requires algebraic
    aggregates (decimal sums, counts, min/max — not raw double sums).
    """
    partial = df.withColumn("_salt", salt_col(salt_src, n_salts)).groupBy(
        *group_cols, "_salt"
    ).agg(*aggs)
    return partial.groupBy(*group_cols).agg(*final_aggs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted skewed side.

    The salt must vary per-row *within* a join key (salting by the key
    itself would keep the hot key on one reducer), so it derives from the
    hash of the whole row; the other side is exploded once per salt value
    (replication factor = n_salts, acceptable when ``other`` is the
    smaller — but too big to broadcast — side). Join key becomes
    (on, salt): the hot key's rows land on n_salts reducers instead of 1.
    Result equals the plain join exactly (salt columns are dropped).
    """
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts)).cast("int")
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted.join(replicated, [on, "_salt"], how)
    return out.drop("_salt")
