"""Determinism helpers for oracle-exact aggregation.

Problem: double-precision SUM/AVG is order-dependent, and Spark's partial
aggregation order differs from DuckDB's — a naive ``SUM(double)`` over 60k
rows hash-mismatches in the last few ulps. Fix: per-row arithmetic stays in
double (IEEE ops are deterministic and identical across engines), then the
*aggregation* is carried out in DECIMAL (exact, order-independent), and the
final result is cast back to DOUBLE (exact → nearest-double is deterministic).

The Spark and SQL forms below are the same computation, expression for
expression:

    Spark : F.sum(expr.cast("decimal(25,6)")).cast("double")
    DuckDB: CAST(SUM(CAST(expr AS DECIMAL(25,6))) AS DOUBLE)

The 6-digit scale keeps a per-row quantization identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a double expression (see module doc)."""
    return F.sum(_c(col).cast(DEC)).cast("double").alias(alias)


def dsum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: exact decimal sum, then double division by the
    (exact) count — one double op, identical in both engines."""
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def davg_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def rounded(col: Column, digits: int, alias: str) -> Column:
    """For inherently order-dependent stats (stddev/corr): round far below
    the accumulation-error floor so both engines agree."""
    return F.round(col, digits).alias(alias)
