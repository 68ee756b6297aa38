"""Public scalar/column-function surface of the engine (SURVEY.md §2B
rows 36-44, 55): one import point for the column expressions users
compose into their own queries, mirroring the layout promised in the
build plan (`crocus_spark/functions/`).

Everything re-exported here is a pure built-in-expression helper —
JVM-side, codegen-friendly, no UDFs — safe in any hot path.
"""

from crocus_spark.normalize import (  # noqa: F401
    file_type_from_url,
    normalize_products,
    parse_date_any,
    parse_date_it,
    parse_date_short,
    parse_locale_decimal,
    parse_price_amount,
    parse_price_currency,
    parse_ter,
    strip_after_newline,
)
from crocus_spark.operators.dedup import normalize_text  # noqa: F401
from crocus_spark.operators.similarity import cosine  # noqa: F401
from crocus_spark.queries._det import davg, dsum, rounded  # noqa: F401

__all__ = [
    "cosine",
    "davg",
    "dsum",
    "file_type_from_url",
    "normalize_products",
    "normalize_text",
    "parse_date_any",
    "parse_date_it",
    "parse_date_short",
    "parse_locale_decimal",
    "parse_price_amount",
    "parse_price_currency",
    "parse_ter",
    "rounded",
    "strip_after_newline",
]
