"""Ingest-quality surface: PERMISSIVE corrupt-record reads (reference C4,
log-and-continue at base_scraper.py:130-134) and observe()-based metrics
(reference C3, the JSON logger at base_scraper.py:37-51)."""

from __future__ import annotations


DIRTY_CSV = """isin,snapshot_date,provider,holding_name,holding_isin,sector,weight,market_value,shares
IE00B5BMR087,2025-02-28,ishares,APPLE INC,US0378331005,tech,0.07,1000.5,12.0
IE00B5BMR087,2025-02-28,ishares,MSFT,US5949181045,tech,not_a_number,oops,NaNope
IE00BK5BQT80,2025-02-28,vanguard,NVDA,US67066G1040,tech,0.05,2000.25,3.5
"""


def _write_dirty(tmp_path):
    p = tmp_path / "holdings.csv"
    p.write_text(DIRTY_CSV)
    return str(p)


def test_permissive_read_quarantines_bad_rows(spark, tmp_path):
    from crocus_spark.io import read_holdings_csv
    from crocus_spark.metrics import split_corrupt

    df = read_holdings_csv(spark, _write_dirty(tmp_path)).cache()
    clean, quarantine = split_corrupt(df)
    assert clean.count() == 2
    assert "_corrupt_record" not in clean.columns
    bad = quarantine.collect()
    assert len(bad) == 1
    # the malformed source line is preserved verbatim for inspection
    assert "not_a_number" in bad[0]._corrupt_record
    df.unpersist()


def test_observe_metrics_ride_the_action(spark, tmp_path):
    """observe() metrics must reflect exactly the rows the action saw —
    no second scan, no separate validation query."""
    from crocus_spark.io import read_holdings_csv
    from crocus_spark.metrics import observe_ingest

    raw = read_holdings_csv(spark, _write_dirty(tmp_path))
    df, obs = observe_ingest(raw, key_col="isin")
    df.write.format("noop").mode("overwrite").save()  # the one action
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_corrupt"] == 1
    assert got["n_null_key"] == 0


def test_observe_metrics_on_clean_frame(spark):
    from pyspark.sql import functions as F

    from crocus_spark.io import load
    from crocus_spark.metrics import observe_ingest
    from tests.conftest import SF_SMOKE

    df, obs = observe_ingest(
        load(spark, SF_SMOKE, "orders"), key_col="o_custkey"
    )
    n = df.count()
    assert obs.get["n_rows"] == n
    assert obs.get["n_corrupt"] == 0


def test_spread_is_noop_at_production_partition_counts(spark):
    """io.spread() exists to fix one-row-group fixture scans; at real
    split counts it must add NO shuffle (returns the input unchanged) —
    a spread that repartitions a 100 TB scan would be a regression."""
    from pyspark.sql import functions as F

    from crocus_spark.io import spread

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, par)
    assert spread(wide, spark) is wide
    narrow = spark.range(0, 1000, 1, 1).withColumn("x", F.col("id") * 2)
    out = spread(narrow, spark)
    assert out.rdd.getNumPartitions() == par
    assert out.count() == 1000


def test_spread_width_from_file_metadata(spark, tmp_path):
    """r6: spread's current-parallelism estimate comes from inputFiles
    byte sizes (the RDD-conversion fallback cost 0.1-0.5 s of py4j plan
    work PER FRESH PLAN across a dozen callers). A one-file fixture
    scan must still spread to core width; a scan whose bytes exceed
    target × maxPartitionBytes must be left untouched."""
    from pyspark.sql import functions as F

    from crocus_spark.io import (
        _planned_scan_partitions,
        scan_width,
        spread,
    )
    from tests.conftest import SF_SMOKE

    par = spark.sparkContext.defaultParallelism
    from crocus_spark.io import load

    docs = load(spark, SF_SMOKE, "documents").select("doc_id")
    est = _planned_scan_partitions(docs, spark)
    assert est == 1  # one small fixture file = one split
    assert spread(docs, spark).rdd.getNumPartitions() == par
    # non-file plans return None and take the RDD fallback
    assert _planned_scan_partitions(spark.range(10), spark) is None
    # scan_width floors at core count and grows with bytes: shrink the
    # split size so the same file maps to > par splits
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try:
        w = scan_width(spark, SF_SMOKE, "documents")
        assert w > par
        est2 = _planned_scan_partitions(docs, spark)
        assert est2 == w  # both read the same metadata rule
        # spread must then be a no-op: estimated splits >= target
        assert spread(docs, spark) is docs
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728b")


def test_spread_fast_path_requires_scan_shaped_plan(spark):
    """r6 ADVICE: inputFiles() reports the UNDERLYING scan for any
    file-backed plan, so a df with an upstream shuffle/aggregate/
    coalesce must NOT take the metadata fast path (it would report the
    scan's split count instead of its own — possibly 1-partition —
    distribution and skip a needed repartition). Scan-shaped plans
    (scan, projected, filtered, view-aliased) keep the fast path."""
    from pyspark.sql import functions as F

    from crocus_spark.io import _planned_scan_partitions, load
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    # scan / project / filter: fast path holds
    assert _planned_scan_partitions(docs, spark) == 1
    shaped = docs.select("doc_id", "lang").filter(F.col("doc_id") > 3)
    assert _planned_scan_partitions(shaped, spark) == 1
    docs.createOrReplaceTempView("_spread_guard_docs")
    viewed = spark.table("_spread_guard_docs").select("doc_id")
    assert _planned_scan_partitions(viewed, spark) == 1
    # aggregate / coalesce / repartition / join over the SAME scan:
    # inputFiles() still lists the file, but the fast path must decline
    agg = docs.groupBy("lang").count()
    assert agg.inputFiles()  # precondition: the trap is live
    assert _planned_scan_partitions(agg, spark) is None
    assert _planned_scan_partitions(docs.coalesce(1), spark) is None
    assert _planned_scan_partitions(docs.repartition(4), spark) is None
    assert (
        _planned_scan_partitions(docs.join(docs.select("doc_id"), "doc_id"), spark)
        is None
    )
