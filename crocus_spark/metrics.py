"""Pipeline observability — the engine analog of the reference's
structured JSON logging (C3, ``base_scraper.py:37-51``) and its
log-and-continue error handling (C4, ``base_scraper.py:130-134``).

The reference logs per-row scrape failures to a JSON logger and carries
on. A distributed engine can't afford per-row driver logging; instead,
metrics ride the query itself via ``df.observe`` — computed executor-side
during the action that was already running, collected once per query, zero
extra passes over data. That property (no second scan) is what makes
validation affordable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_ingest(
    df: DataFrame,
    name: str = "ingest",
    key_col: str | None = None,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, Observation]:
    """Attach ingest-quality metrics to a DataFrame.

    Returns (df, observation); after any action on ``df`` runs,
    ``observation.get`` yields::

        n_rows        total rows seen
        n_corrupt     rows the PERMISSIVE reader couldn't parse
                      (0 if the frame has no corrupt column)
        n_null_key    rows with a NULL key (if ``key_col`` given)

    The metrics are aggregates over the *exact rows the action processed*
    — consistent with the result by construction, unlike a separate
    validation query which races the data.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if corrupt_col in df.columns:
        metrics.append(
            F.sum(F.col(corrupt_col).isNotNull().cast("long")).alias("n_corrupt")
        )
    else:
        metrics.append(F.lit(0).cast("long").alias("n_corrupt"))
    if key_col is not None:
        metrics.append(
            F.sum(F.col(key_col).isNull().cast("long")).alias("n_null_key")
        )
    return df.observe(obs, *metrics), obs


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) split of a PERMISSIVE read — the reference's
    log-and-continue (C4) as dataflow: bad rows are not dropped silently
    and not fatal; they land in a quarantine relation to be sunk next to
    the clean table for inspection."""
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = df.filter(F.col(corrupt_col).isNotNull())
    return clean, quarantine
