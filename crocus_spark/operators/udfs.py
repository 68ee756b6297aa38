"""User-defined-function surface — SURVEY.md §2B #61-64: vectorized scalar
pandas_udf, grouped-agg UDAF, grouped-map applyInPandas, and a UDTF.

UDFs are the engine's slow path (SURVEY.md §0 design rules): everything
here exists to prove the *escape hatch* works at scale — Arrow-batched
transfer, module-level definitions (workers import this module, no
closure pickling of big state), deterministic math (exact integer/fsum
accumulation so results are reproducible across partitionings and match
the DuckDB oracle bit-for-bit after rounding).

The reference has no UDFs (its whole pipeline is driver-side Python,
``ishares.py:190-198``); this surface is the north-star requirement.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


# ---------------------------------------------------------------------------
# #61 scalar pandas_udf — Arrow-vectorized, batch-at-a-time
# ---------------------------------------------------------------------------


@pandas_udf(T.IntegerType())
def ws_token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized over Arrow batches. Matches the
    JVM expression size(split(trim(text), '\\s+')) — the point of the query
    using it is exactly that equivalence: the Python escape hatch produces
    the same answer as the built-in fast path."""
    return text.str.split().str.len().fillna(0).astype("int32")


# ---------------------------------------------------------------------------
# #62 UDAF — grouped-agg pandas_udf
# ---------------------------------------------------------------------------


@pandas_udf(T.DoubleType())
def weighted_mean_price(price: pd.Series, qty: pd.Series) -> float:
    """Quantity-weighted mean price as a grouped-agg UDAF.

    Determinism: each product is quantized to 6 decimals and accumulated
    as exact int64 (order-independent, no float accumulation error), the
    same quantization the oracle does with DECIMAL(25,6) sums — so the
    result is identical regardless of row order or partitioning."""
    num = int((price * qty).mul(1_000_000).round().astype("int64").sum())
    den = int(qty.mul(1_000_000).round().astype("int64").sum())
    if den == 0:
        return float("nan")
    # round each exact sum to double BEFORE dividing — the same two
    # roundings, in the same order, as the oracle's CAST(SUM(...) AS
    # DOUBLE) / CAST(SUM(...) AS DOUBLE)
    return (num / 1_000_000) / (den / 1_000_000)


# ---------------------------------------------------------------------------
# #64 grouped map — applyInPandas
# ---------------------------------------------------------------------------

ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group population z-score. Two-pass with math.fsum (exactly
    rounded sums ⇒ order-independent); rounded to 6 so the last-ulp
    difference vs the oracle's stddev_pop vanishes."""
    n = len(pdf)
    vals = pdf["c_acctbal"].tolist()
    mean = math.fsum(vals) / n
    var = math.fsum((v - mean) ** 2 for v in vals) / n
    std = math.sqrt(var)
    out = pdf[["c_custkey", "c_nationkey", "c_acctbal"]].copy()
    out["zscore"] = (
        None if std == 0.0 else [round((v - mean) / std, 6) for v in vals]
    )
    return out


def zscore_by_group(df: DataFrame, group_col: str = "c_nationkey") -> DataFrame:
    """Grouped-map normalization (§2B#64): one pandas frame per group.
    Scale shape: group count ≫ executor count and each group fits in
    memory — the applyInPandas contract; skewed group sizes are the
    caller's problem (pre-salt or pre-aggregate)."""
    return df.groupBy(group_col).applyInPandas(_zscore_group, ZSCORE_SCHEMA)


# ---------------------------------------------------------------------------
# #63 UDTF — one row in, many rows out
# ---------------------------------------------------------------------------


# useArrow=True pinned at the DEFINITION: with useArrow=None the eval
# type resolves from the active session's pythonUDTF.arrow conf at
# decoration time — module import order decided whether the plan got
# ArrowEvalPythonUDTF or row-at-a-time BatchEvalPythonUDTF (the
# registry-wide detector caught the flip when imports preceded the
# session). Explicit beats conf-dependent for an eval-type contract.
@udtf(returnType="pos: int, bigram: string", useArrow=True)
class BigramUDTF:
    """Word-bigram generator as a UDTF (§2B#63): lateral-joinable table
    function, the row-expanding escape hatch (the set-returning analog of
    explode for logic too custom for array expressions)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = text.split()
        for i in range(len(toks) - 1):
            yield i + 1, f"{toks[i]} {toks[i + 1]}"


def register_udtfs(spark) -> None:
    spark.udtf.register("bigrams", BigramUDTF)
