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
