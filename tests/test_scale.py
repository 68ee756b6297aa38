"""Tests for the skew-mitigation helpers (SURVEY.md §4.3): salted plans
must be *bit-identical* to their unsalted equivalents — salting is a
physical rewrite, never a semantic one."""

from __future__ import annotations

from pyspark.sql import functions as F

from crocus_spark.io import load
from crocus_spark.operators import skew as K
from tests.conftest import SF_SMOKE


def _rowset(df):
    return {tuple(r) for r in df.collect()}


def test_salted_join_equals_plain_join(spark):
    orders = load(spark, SF_SMOKE, "orders")
    cust = load(spark, SF_SMOKE, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey").select(
        "o_orderkey", "o_custkey", "c_name"
    )
    salted = K.salted_join(orders, cust, "o_custkey", n_salts=8).select(
        "o_orderkey", "o_custkey", "c_name"
    )
    assert _rowset(plain) == _rowset(salted)
    assert plain.count() == salted.count()


def test_salted_join_left_outer(spark):
    """Outer semantics survive salting: unmatched skewed-side rows keep
    exactly one null-extended output row."""
    ev = (
        load(spark, SF_SMOKE, "events")
        .select("event_id", "user_id")
        .limit(200)
    )
    cust = load(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    plain = ev.join(cust, "user_id", "left")
    salted = K.salted_join(ev, cust, "user_id", n_salts=4, how="left")
    assert _rowset(plain) == _rowset(salted)


def test_salt_col_deterministic_and_bounded(spark):
    li = load(spark, SF_SMOKE, "lineitem").select("l_orderkey")
    salts = li.select(K.salt_col("l_orderkey", 32).alias("s"))
    mn, mx = salts.agg(F.min("s"), F.max("s")).collect()[0]
    assert 0 <= mn and mx <= 31
    a = salts.groupBy("s").count().collect()
    b = li.select(K.salt_col("l_orderkey", 32).alias("s")).groupBy("s").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
