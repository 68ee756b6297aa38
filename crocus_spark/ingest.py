"""Engine entry points mirroring the reference's pipelines (SURVEY §3.4):

- ``ingest_catalog``  — the catalog-scrape analog (`ishares.py:190-198`,
  `vanguard.py:164-170`): raw provider rows → normalize → reconcile →
  date/provider-partitioned products store.
- ``ingest_holdings`` — the download-loop analog (`ishares.py:175-187`):
  landed holdings CSV → PERMISSIVE parse → quarantine split → partitioned
  fact store.
- ``read_catalog`` / ``read_holdings`` — the offline re-read path
  (`ishares.py:196`, `base_scraper.py:172-178`): re-hydrate state from the
  snapshot store, partition-pruned to one (date, provider).

The store layout is the reference's ``{base}/{date}/{provider}/…``
(`base_scraper.py:72-83`) as Hive partitions, so a daily query reads one
directory no matter how much history exists — the property that keeps the
daily workload O(day) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crocus_spark import normalize as N
from crocus_spark.io import read_holdings_csv, write_snapshot
from crocus_spark.metrics import observe_ingest, split_corrupt


def reconcile_catalogs(*provider_dfs: DataFrame) -> DataFrame:
    """Schema-divergent provider catalogs → one reconciled table
    (crocus U1/U2): unionByName over the superset schema, last-wins dedup
    by ISIN with provider order as the priority (later argument wins —
    the dict-unpack semantics of `vanguard.py:105-109`)."""
    from pyspark.sql.window import Window

    tagged = [
        df.withColumn("_prio", F.lit(i)) for i, df in enumerate(provider_dfs)
    ]
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    w = Window.partitionBy("isin").orderBy(F.desc("_prio"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )


def ingest_catalog(
    spark: SparkSession,
    raw_by_provider: dict[str, DataFrame],
    base: str,
    snapshot_date: str,
) -> tuple[DataFrame, dict]:
    """Catalog ingestion: normalize each provider's raw rows (typed
    ter/price/date out of locale strings), reconcile, write one snapshot
    partition. Returns (reconciled_df, ingest_metrics)."""
    normalized = [
        N.normalize_products(df, provider)
        for provider, df in raw_by_provider.items()
    ]
    catalog = reconcile_catalogs(*normalized).withColumn(
        "snapshot_date", F.to_date(F.lit(snapshot_date))
    )
    observed, obs = observe_ingest(catalog, name="catalog", key_col="isin")
    write_snapshot(observed, base)
    return catalog, obs.get


def ingest_holdings(
    spark: SparkSession,
    csv_path: str,
    base: str,
) -> tuple[DataFrame, DataFrame, dict]:
    """Holdings ingestion: PERMISSIVE CSV parse, (clean, quarantine)
    split, clean rows into the partitioned fact store. Returns
    (clean, quarantine, metrics) — the reference's log-and-continue
    (C4) with the failures kept as data instead of log lines."""
    # cache the parsed batch: _corrupt_record is populated only when the
    # full row is parsed — recomputing the quarantine from the file with
    # column pruning would silently re-parse just the corrupt column and
    # find nothing (documented PERMISSIVE-mode behavior). One ingest batch
    # is bounded, so the cache is too.
    raw = read_holdings_csv(spark, csv_path).cache()
    observed, obs = observe_ingest(raw, name="holdings", key_col="isin")
    clean, quarantine = split_corrupt(observed)
    write_snapshot(clean, base)
    metrics = obs.get
    return clean, quarantine, metrics


def read_catalog(
    spark: SparkSession, base: str, snapshot_date: str, provider: str | None = None
) -> DataFrame:
    """Partition-pruned snapshot read — the offline re-read path. The
    filters are on partition columns, so the scan touches exactly one
    (date[, provider]) directory (PartitionFilters in the plan)."""
    df = spark.read.parquet(base).filter(
        F.col("snapshot_date") == F.to_date(F.lit(snapshot_date))
    )
    if provider is not None:
        df = df.filter(F.col("provider") == provider)
    return df


def read_holdings(
    spark: SparkSession, base: str, snapshot_date: str, provider: str | None = None
) -> DataFrame:
    return read_catalog(spark, base, snapshot_date, provider)
