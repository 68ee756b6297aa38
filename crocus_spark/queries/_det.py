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


def components_unrolled_sql(rounds: int = 12) -> str:
    """CTE-chain fragment computing min-label connected components in a
    FIXED number of propagate+jump rounds, for oracles. The caller must
    define CTEs ``nodes(id)`` (every vertex) and ``sym(src, dst)``
    (symmetric edge list); the fragment ends with ``comp(id, lbl)`` where
    lbl is the component's minimum id.

    Replaces the recursive-CTE transitive closure — whose O(Σ comp²)
    reach relation cost 1,568 s of the r3 sf0.1 sweep (VERDICT "What's
    wrong" #2) — with O((V+E)·rounds). Each round propagates the min
    label over edges then pointer-jumps (lbl ← lbl(lbl)); every CTE is
    MATERIALIZED — each round references the previous one twice and
    ``sym`` once, so plain (inlined) CTEs would expand the plan
    exponentially (observed as 2^rounds parquet re-opens). The covered
    path distance grows as 2^(i+1)−2, so 12 rounds are exact for any
    component diameter ≤ 8190. If a fixture ever exceeded that, the
    result would HASH-MISMATCH the engine (fail-loud, never silently
    green) — and the sweep verifies at every fixture scale."""
    parts = ["l0 AS MATERIALIZED (SELECT id, id AS lbl FROM nodes)"]
    for i in range(1, rounds + 1):
        prev = f"l{i - 1}"
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT l.id, "
            f"LEAST(l.lbl, COALESCE(MIN(m.lbl), l.lbl)) AS lbl "
            f"FROM {prev} l LEFT JOIN sym e ON e.src = l.id "
            f"LEFT JOIN {prev} m ON m.id = e.dst GROUP BY l.id, l.lbl)"
        )
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT p.id, LEAST(p.lbl, pp.lbl) AS lbl "
            f"FROM p{i} p JOIN p{i} pp ON pp.id = p.lbl)"
        )
    parts.append(f"comp AS (SELECT id, lbl FROM l{rounds})")
    return ",\n    ".join(parts)
