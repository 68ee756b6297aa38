"""End-to-end 'confront' workflow through the PUBLIC engine façade.

The reference's README promises exactly one workflow: "obtain info from
Vanguard and iShares ETFs and confront them with eachover"
(reference README.md:3-5). This example is that workflow as a USER of
``crocus_spark`` would write it — no registry, no test harness, just the
public column functions (``crocus_spark.functions``) and plain DataFrame
composition:

1. NORMALIZE two locale-messy provider feeds (Italian decimal commas,
   two date dialects, newline-suffixed names — the reference's S1/S6/D2/D3
   scraper cleanups) into one typed schema;
2. UNION them by name with provider lineage;
3. CONFRONT the providers product-by-product on cost (TER) and NAV;
4. REPORT the cheaper provider per ISIN plus a fleet-level summary.

Run: ``python examples/confront.py`` — the provider rows below are
inline so the example is fully self-contained (smoke-tested by
tests/test_examples.py).

Every transformation is JVM-side built-in expressions (the façade
re-exports no UDFs), so the same code runs unchanged on a real cluster:
normalization fuses into the scans, the confront join broadcasts the
smaller provider, and the report is a cells-sized aggregate.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crocus_spark import functions as CF

RAW_SCHEMA = (
    "isin string, name string, fund_type string, ter string, "
    "price string, nav_date string"
)

# provider feeds as scraped: locale decimals, mixed date dialects,
# display names with newline-glued share-class suffixes
ISHARES_ROWS = [
    ("IE00B5BMR087", "iShares Core S&P 500\nUSD (Acc)", "equity",
     "0,07%", "EUR 543,21", "28 ago 2025"),
    ("IE00B4L5Y983", "iShares Core MSCI World\nUSD (Acc)", "equity",
     "0,20%", "EUR 101,55", "28 ago 2025"),
    ("IE00B3F81R35", "iShares Core EUR Corp Bond", "bond",
     "0,20%", "EUR 128,03", "27 ago 2025"),
]
VANGUARD_ROWS = [
    ("IE00B3XXRP09", "Vanguard S&P 500 UCITS ETF", "equity",
     "0,07%", "EUR 112,44", "28/08/25"),
    ("IE00B4L5Y983", "Vanguard (listing) MSCI World", "equity",
     "0,19%", "EUR 99,80", "28/08/25"),
    ("IE00BZ163M45", "Vanguard EUR Corporate Bond", "bond",
     "0,12%", "EUR 47,90", "27/08/25"),
]


def normalize(raw: DataFrame, provider: str) -> DataFrame:
    """Provider feed → typed products table, using only façade column
    functions (scan-fused, no UDFs)."""
    return raw.select(
        "isin",
        CF.strip_after_newline("name").alias("name"),
        "fund_type",
        F.lit(provider).alias("provider"),
        CF.parse_ter("ter").cast("double").alias("ter_pct"),
        CF.parse_price_amount("price").cast("double").alias("nav"),
        CF.parse_price_currency("price").alias("currency"),
        F.date_format(CF.parse_date_any("nav_date"), "yyyy-MM-dd").alias(
            "nav_date"
        ),
    )


def confront(products: DataFrame) -> DataFrame:
    """Per-ISIN provider comparison: both providers' TER/NAV side by
    side where they overlap, cheaper provider called out. The self-join
    key is the ISIN — at catalog scale the smaller provider broadcasts."""
    a = products.filter(F.col("provider") == "ishares").alias("a")
    b = products.filter(F.col("provider") == "vanguard").alias("b")
    return (
        a.join(F.broadcast(b), "isin", "inner")
        .select(
            "isin",
            F.col("a.name").alias("name"),
            F.col("a.ter_pct").alias("ishares_ter"),
            F.col("b.ter_pct").alias("vanguard_ter"),
            F.col("a.nav").alias("ishares_nav"),
            F.col("b.nav").alias("vanguard_nav"),
            F.when(F.col("a.ter_pct") < F.col("b.ter_pct"), "ishares")
            .when(F.col("b.ter_pct") < F.col("a.ter_pct"), "vanguard")
            .otherwise("tie")
            .alias("cheaper"),
        )
        .orderBy("isin")
    )


def report(products: DataFrame) -> DataFrame:
    """Fleet-level summary per provider × fund type: product counts and
    cost stats — a cells-sized aggregate whatever the catalog size."""
    return (
        products.groupBy("provider", "fund_type")
        .agg(
            F.count(F.lit(1)).alias("n_products"),
            F.round(F.avg("ter_pct"), 4).alias("avg_ter_pct"),
            F.min("nav").alias("min_nav"),
            F.max("nav").alias("max_nav"),
        )
        .orderBy("provider", "fund_type")
    )


def run(spark: SparkSession) -> dict[str, DataFrame]:
    ishares = normalize(
        spark.createDataFrame(ISHARES_ROWS, RAW_SCHEMA), "ishares"
    )
    vanguard = normalize(
        spark.createDataFrame(VANGUARD_ROWS, RAW_SCHEMA), "vanguard"
    )
    products = ishares.unionByName(vanguard)
    return {
        "products": products,
        "confront": confront(products),
        "report": report(products),
    }


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("crocus-confront-example")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    out = run(spark)
    for name, df in out.items():
        print(f"== {name} ==")
        df.show(truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
