"""End-to-end ingestion pipeline (SURVEY §3.4 entry points): golden-value
provider rows → normalize → reconcile → partitioned snapshot store →
pruned re-read. The values are the reference's own golden outputs
(output_examples/ishares.json / vanguard.json), so this is the engine
running the reference's whole batch lifecycle."""

from __future__ import annotations

from datetime import date
from decimal import Decimal

from pyspark.sql import Row


_RAW_SCHEMA = (
    "isin string, name string, fund_type string, currency string, "
    "ter string, price string, date string"
)


def _raw(spark):
    ishares = spark.createDataFrame(
        [
            Row(
                isin="IE00B5BMR087",
                name="iShares Core S&P 500 UCITS ETF\nUSD (Acc)",
                fund_type=None,
                currency="USD",
                ter="0,07",
                price="USD 632,42",
                date="28 feb 2025",
            )
        ],
        schema=_RAW_SCHEMA,
    )
    vanguard = spark.createDataFrame(
        [
            Row(
                isin="IE00BK5BQT80",
                name="Vanguard FTSE All-World UCITS ETF (USD) ACCUMULATING",
                fund_type="equity",
                currency="USD",
                ter="0,22%",
                price="144,12 USD",
                date="21/02/25",
            ),
            # same ISIN as the iShares row: reconcile must keep vanguard
            # (later provider wins, the dict-unpack rule)
            Row(
                isin="IE00B5BMR087",
                name="Vanguard duplicate listing",
                fund_type="equity",
                currency="USD",
                ter="0,30%",
                price="10,00 USD",
                date="21/02/25",
            ),
        ],
        schema=_RAW_SCHEMA,
    )
    return ishares, vanguard


def test_catalog_ingest_roundtrip(spark, tmp_path):
    from crocus_spark.ingest import ingest_catalog, read_catalog

    ish, van = _raw(spark)
    base = str(tmp_path / "products")
    catalog, metrics = ingest_catalog(
        spark, {"ishares": ish, "vanguard": van}, base, "2025-02-28"
    )
    assert metrics["n_rows"] == 2  # 3 raw rows, 1 collapsed by last-wins
    assert metrics["n_null_key"] == 0

    back = read_catalog(spark, base, "2025-02-28")
    rows = {r.isin: r for r in back.collect()}
    assert set(rows) == {"IE00B5BMR087", "IE00BK5BQT80"}
    # last-wins: the vanguard duplicate beat the ishares original
    dup = rows["IE00B5BMR087"]
    assert dup.provider == "vanguard"
    assert dup.ter_pct == Decimal("0.3000")
    # golden-value normalization survived the store round-trip
    vw = rows["IE00BK5BQT80"]
    assert vw.price_amount == Decimal("144.1200")
    assert vw.price_currency == "USD"
    assert vw.nav_date == date(2025, 2, 21)
    # newline-stripped name (ishares.py:150 semantics) checked via vanguard
    assert "\n" not in vw.name


def test_catalog_read_is_partition_pruned(spark, tmp_path):
    from crocus_spark.ingest import ingest_catalog, read_catalog
    from crocus_spark.plans import has_partition_filters

    ish, van = _raw(spark)
    base = str(tmp_path / "products")
    ingest_catalog(spark, {"ishares": ish}, base, "2025-02-27")
    ingest_catalog(spark, {"vanguard": van}, base, "2025-02-28")
    pruned = read_catalog(spark, base, "2025-02-28", provider="vanguard")
    assert has_partition_filters(pruned)
    assert pruned.count() == 2


def test_holdings_ingest_quarantines_and_stores(spark, tmp_path):
    from crocus_spark.ingest import ingest_holdings, read_holdings

    csv = tmp_path / "h.csv"
    csv.write_text(
        "isin,snapshot_date,provider,holding_name,holding_isin,sector,"
        "weight,market_value,shares\n"
        "IE00B5BMR087,2025-02-28,ishares,APPLE INC,US0378331005,tech,"
        "0.07,1000.5,12.0\n"
        "IE00B5BMR087,2025-02-28,ishares,BROKEN,US0,tech,bad,bad,bad\n"
    )
    base = str(tmp_path / "holdings")
    clean, quarantine, metrics = ingest_holdings(spark, str(csv), base)
    assert metrics == {"n_rows": 2, "n_corrupt": 1, "n_null_key": 0}
    assert quarantine.count() == 1
    back = read_holdings(spark, base, "2025-02-28", "ishares")
    assert back.count() == 1
    assert back.first().holding_name == "APPLE INC"


def test_catalog_sink_gap_safe_and_overwrite(spark, tmp_path):
    """r7 ADVICE (same fix as the Avro sink): part naming is
    max(existing index)+1 with compact non-None numbering, and
    mode('overwrite') truncates instead of silently appending."""
    import os

    from crocus_spark.sources import (
        register_catalog_sink,
        register_catalog_source,
    )

    register_catalog_sink(spark)
    register_catalog_source(spark)
    path = str(tmp_path / "cat_sink")
    spark.range(0, 6).selectExpr("id AS k").repartition(2).write.format(
        "crocus_catalog_sink"
    ).option("path", path).mode("append").save()
    assert sorted(os.listdir(path)) == ["part-00000.json", "part-00001.json"]
    os.remove(os.path.join(path, "part-00000.json"))  # punch a gap
    spark.range(100, 103).selectExpr("id AS k").repartition(1).write.format(
        "crocus_catalog_sink"
    ).option("path", path).mode("append").save()
    # named past the survivor, never onto it
    assert sorted(os.listdir(path)) == ["part-00001.json", "part-00002.json"]
    spark.range(7, 9).selectExpr("id AS k").repartition(1).write.format(
        "crocus_catalog_sink"
    ).option("path", path).mode("overwrite").save()
    assert sorted(os.listdir(path)) == ["part-00000.json"]
    got = sorted(
        r.k for r in spark.read.json(path).selectExpr(
            "CAST(k AS long) AS k"
        ).collect()
    )
    assert got == [7, 8]
