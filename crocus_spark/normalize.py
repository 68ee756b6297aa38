"""Locale-string normalization — crocus rows S6/D2/D3 as column expressions.

The reference scrapes everything as strings (SURVEY.md §1.2): TER like
``"0,07"`` or ``"0,22%"``, prices like ``"USD 632,42"`` / ``"144,12 USD"`` /
``"5,66 €"``, dates like ``"28 feb 2025"`` (Italian month abbreviations) or
``"21/02/25"``. Evidence: ``output_examples/ishares.json:6-8`` and
``output_examples/vanguard.json:7-9,19-20``.

Everything here is pure built-in column expressions (regexp/cast) — JVM-side,
codegen-friendly, no UDFs — so normalization runs at scan speed even at
100 TB. Italian month names are a pinned literal mapping rather than JVM
locale data, so results are deterministic across JVMs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pinned Italian month-abbreviation map ("28 feb 2025"); deterministic across
# JVMs unlike Locale-dependent to_date patterns.
IT_MONTHS = {
    "gen": "01", "feb": "02", "mar": "03", "apr": "04",
    "mag": "05", "giu": "06", "lug": "07", "ago": "08",
    "set": "09", "ott": "10", "nov": "11", "dic": "12",
}

_CCY_SYMBOLS = {"€": "EUR", "$": "USD", "£": "GBP", "CHF": "CHF"}


def parse_locale_decimal(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """``"632,42"`` / ``"1.632,42"`` → decimal. Italian locale: ``.`` is the
    thousands separator, ``,`` the decimal mark."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.regexp_replace(F.trim(c), r"\.", ""), ",", ".")
    return cleaned.cast(f"decimal({precision},{scale})")


def parse_ter(col: Column | str) -> Column:
    """TER: ``"0,07"`` (iShares) or ``"0,22%"`` (Vanguard) → decimal(12,4)
    as a fraction of 1 is NOT implied — the reference stores percent points;
    we keep percent points, only typed."""
    c = F.col(col) if isinstance(col, str) else col
    return parse_locale_decimal(F.regexp_replace(c, "%", ""), 12, 4)


def parse_price_amount(col: Column | str) -> Column:
    """Amount from either provider order: ``"USD 632,42"`` or ``"144,12 USD"``
    or ``"5,66 €"`` → decimal(18,4)."""
    c = F.col(col) if isinstance(col, str) else col
    amount = F.regexp_extract(c, r"([0-9][0-9\.]*,[0-9]+|[0-9]+(?:\.[0-9]+)?)", 1)
    return parse_locale_decimal(amount, 18, 4)


def parse_price_currency(col: Column | str) -> Column:
    """Currency token from a raw price string: ISO code (``USD``) or symbol
    (``€``) → ISO-4217 code."""
    c = F.col(col) if isinstance(col, str) else col
    code = F.regexp_extract(c, r"([A-Z]{3})", 1)
    sym = F.regexp_extract(c, r"([€$£])", 1)
    sym_mapped = (
        F.when(sym == "€", F.lit("EUR"))
        .when(sym == "$", F.lit("USD"))
        .when(sym == "£", F.lit("GBP"))
        .otherwise(F.lit(None))
    )
    return F.when(code != "", code).otherwise(sym_mapped)


def parse_date_it(col: Column | str) -> Column:
    """Italian long date ``"28 feb 2025"`` → DateType, via the pinned month
    map (crocus D2; `output_examples/ishares.json:8`)."""
    c = F.col(col) if isinstance(col, str) else col
    day = F.lpad(F.regexp_extract(c, r"^(\d{1,2})", 1), 2, "0")
    mon_name = F.lower(F.regexp_extract(c, r"^\d{1,2}\s+(\w+)", 1))
    year = F.regexp_extract(c, r"(\d{4})$", 1)
    mon = F.lit(None).cast("string")
    expr = None
    for name, num in IT_MONTHS.items():
        expr = (
            F.when(mon_name == name, F.lit(num))
            if expr is None
            else expr.when(mon_name == name, F.lit(num))
        )
    mon = expr.otherwise(F.lit(None))
    return F.to_date(F.concat_ws("-", year, mon, day), "yyyy-MM-dd")


def parse_date_short(col: Column | str) -> Column:
    """Vanguard short date ``"21/02/25"`` → DateType (crocus D3;
    `output_examples/vanguard.json:9`). Two-digit years pivot at 1970 via
    Spark's `yy` pattern; pinned explicitly to dd/MM/yy."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, "dd/MM/yy")


def parse_date_any(col: Column | str) -> Column:
    """Provider-agnostic date: try Italian long form, fall back to dd/MM/yy."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.when(c.rlike(r"^\d{1,2}/\d{1,2}/\d{2}$"), parse_date_short(c)),
        parse_date_it(c),
    )


def strip_after_newline(col: Column | str) -> Column:
    """First line of a scraped cell — the reference's `name.split("\\n")[0]`
    (ishares.py:150)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, "\n", 1)


def file_type_from_url(col: Column | str, default: str = "csv") -> Column:
    """`fileType` query param with default — the reference's
    `parse_qs(urlparse(url).query).get("fileType", ["csv"])[0]`
    (ishares.py:181-182)."""
    c = F.col(col) if isinstance(col, str) else col
    param = F.parse_url(c, F.lit("QUERY"), F.lit("fileType"))
    return F.coalesce(param, F.lit(default))


# Bloomberg exchange-code suffix → (MIC, venue name). The reference left
# this as a TODO on the Vanguard ticker column ("VWCE IM",
# vanguard.py:74-76); codes and MICs are public reference data (Bloomberg
# exchange-code tables / ISO 10383 MIC registry). Deliberately a bounded
# dimension literal: it broadcast-joins or folds into the scan for free.
BBG_EXCH = {
    "IM": ("XMIL", "Borsa Italiana"),
    "LN": ("XLON", "London Stock Exchange"),
    "GY": ("XETR", "Deutsche Boerse Xetra"),
    "GR": ("XFRA", "Deutsche Boerse Frankfurt"),
    "FP": ("XPAR", "Euronext Paris"),
    "NA": ("XAMS", "Euronext Amsterdam"),
    "SW": ("XSWX", "SIX Swiss Exchange"),
    "SM": ("XMAD", "Bolsa de Madrid"),
    "UN": ("XNYS", "New York Stock Exchange"),
    "UW": ("XNAS", "Nasdaq"),
}


def ticker_symbol(col: Column | str) -> Column:
    """Bare symbol of a Bloomberg-style ticker: text before the exchange
    suffix ('VWCE IM' → 'VWCE'; suffix-less tickers pass through)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(F.trim(c), " ", 1)


def ticker_mic(col: Column | str) -> Column:
    """ISO 10383 MIC for the Bloomberg exchange suffix; NULL when the
    ticker has no suffix or the suffix is unmapped (emit, don't guess —
    the quarantine pattern)."""
    c = F.col(col) if isinstance(col, str) else col
    suffix = F.when(
        F.trim(c).rlike(r"^\S+ \S+$"), F.substring_index(F.trim(c), " ", -1)
    )
    mapping = F.create_map(
        *[F.lit(x) for kv in BBG_EXCH.items() for x in (kv[0], kv[1][0])]
    )
    return mapping[suffix]


def ticker_exchange_name(col: Column | str) -> Column:
    """Human-readable venue for the Bloomberg suffix (same contract as
    ticker_mic)."""
    c = F.col(col) if isinstance(col, str) else col
    suffix = F.when(
        F.trim(c).rlike(r"^\S+ \S+$"), F.substring_index(F.trim(c), " ", -1)
    )
    mapping = F.create_map(
        *[F.lit(x) for kv in BBG_EXCH.items() for x in (kv[0], kv[1][1])]
    )
    return mapping[suffix]


def normalize_products(df, provider: str):
    """Full normalization of a raw provider catalog into the typed reconciled
    schema: typed ter/price/date + provider tag. The engine-side analog of
    the reference's final record construction (ishares.py:149-160,
    vanguard.py:86-97), with types instead of locale strings."""
    return (
        df.withColumn("name", strip_after_newline("name"))
        .withColumn("ter_pct", parse_ter("ter"))
        .withColumn("price_amount", parse_price_amount("price"))
        .withColumn("price_currency", parse_price_currency("price"))
        .withColumn("nav_date", parse_date_any("date"))
        .withColumn("provider", F.lit(provider))
    )
