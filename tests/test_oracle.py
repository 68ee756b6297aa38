"""Oracle-differential tests: every registered query with an oracle must
match DuckDB exactly at sf0.001 — the engine-side rehearsal of the driver's
sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from crocus_spark.queries import REGISTRY, queries
from crocus_spark.testing import compare_frames

queries()  # populate REGISTRY

WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if not q.oracle)

from tests.conftest import SF_SMOKE  # noqa: E402


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_SMOKE)
    ok, report = compare_frames(df, duck, q.oracle)
    assert ok, f"{name}: {report}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_SMOKE)
    n = df.count()
    assert n >= 0
    assert df.schema is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_cogrouped_asof_count_action(spark):
    """Regression: under count()-shaped actions the optimizer pruned the
    right cogroup side's un-aliased user_id out of the Arrow payload
    when both sides were carved from ONE shared events scan (shared
    attribute ids) — merge_asof(by=) then blew up in the Python worker.
    compare_frames (toPandas) never exercised that plan shape, so this
    pins the count() path specifically."""
    q = REGISTRY["udf_cogrouped_asof"]
    assert q.fn(spark, SF_SMOKE).count() > 0
