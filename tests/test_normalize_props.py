"""Property-based round-trips for the locale-normalization layer
(SURVEY §5.2.3): hypothesis generates typed values, formats them exactly
the way the providers do (Italian decimals, both price orders, both date
dialects — shapes from output_examples/*.json), and the engine must
recover the original value. Each example is a batch of rows so one Spark
job covers the whole case list."""

from __future__ import annotations

from datetime import date
from decimal import Decimal

from hypothesis import given, settings, strategies as st

from crocus_spark.normalize import (
    parse_date_any,
    parse_locale_decimal,
    parse_price_amount,
    parse_price_currency,
    parse_ter,
)

IT_MON = ["gen", "feb", "mar", "apr", "mag", "giu",
          "lug", "ago", "set", "ott", "nov", "dic"]


def _fmt_it(amount: Decimal) -> str:
    """Italian locale: '.' thousands separator, ',' decimal mark."""
    ip, _, fp = f"{amount:.4f}".partition(".")
    grouped = f"{int(ip):,}".replace(",", ".")
    return f"{grouped},{fp}"


amounts = st.decimals(
    min_value=Decimal("0.0001"), max_value=Decimal("9999999"), places=4
)
ccys = st.sampled_from(["USD", "EUR", "GBP", "CHF"])
dates_long = st.dates(min_value=date(1990, 1, 1), max_value=date(2035, 12, 28))
# two-digit years: keep to the 20xx half of Spark's yy pivot window
dates_short = st.dates(min_value=date(2000, 1, 1), max_value=date(2068, 12, 28))


@settings(max_examples=5, deadline=None)
@given(st.lists(amounts, min_size=1, max_size=25, unique=True))
def test_locale_decimal_roundtrip(spark, vals):
    df = spark.createDataFrame([(str(_fmt_it(v)),) for v in vals], "raw string")
    got = [r.out for r in df.select(
        parse_locale_decimal("raw", 18, 4).alias("out")).collect()]
    assert got == list(vals)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(amounts, ccys, st.booleans()),
                min_size=1, max_size=25))
def test_price_roundtrip_both_orders(spark, cases):
    """'USD 632,42' (iShares order) and '144,12 USD' (Vanguard order) both
    parse to (amount, currency)."""
    rows = []
    for amt, ccy, ccy_first in cases:
        s = _fmt_it(amt)
        rows.append((f"{ccy} {s}" if ccy_first else f"{s} {ccy}",))
    df = spark.createDataFrame(rows, "raw string")
    got = df.select(
        parse_price_amount("raw").alias("amt"),
        parse_price_currency("raw").alias("ccy"),
    ).collect()
    for (amt, ccy, _), r in zip(cases, got):
        assert r.amt == amt and r.ccy == ccy


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(amounts, st.booleans()), min_size=1, max_size=25))
def test_ter_roundtrip_with_and_without_percent(spark, cases):
    rows = [(_fmt_it(amt) + ("%" if pct else ""),) for amt, pct in cases]
    df = spark.createDataFrame(rows, "raw string")
    got = [r.out for r in df.select(parse_ter("raw").alias("out")).collect()]
    assert got == [amt for amt, _ in cases]


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(dates_long, dates_short), min_size=1, max_size=25))
def test_date_dialects_roundtrip(spark, cases):
    """parse_date_any must crack both dialects in one column — the mixed
    situation a reconciled cross-provider catalog actually contains."""
    rows = []
    expected = []
    for d_it, d_sh in cases:
        rows.append((f"{d_it.day} {IT_MON[d_it.month - 1]} {d_it.year}",))
        expected.append(d_it)
        rows.append((d_sh.strftime("%d/%m/%y"),))
        expected.append(d_sh)
    df = spark.createDataFrame(rows, "raw string")
    got = [r.out for r in df.select(parse_date_any("raw").alias("out")).collect()]
    assert got == expected
