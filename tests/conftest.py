from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMOKE = os.environ.get("CROCUS_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("CROCUS_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from crocus_spark.session import get_spark

    s = get_spark(app_name="crocus-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views, the
    same way the driver's oracle harness does."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()
