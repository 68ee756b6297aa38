"""Oracle-differential test utilities — the engine-side mirror of the
driver's correctness harness (row-count + schema + order-insensitive value
comparison between a Spark DataFrame and a DuckDB SQL result).

Comparison is EXACT on canonicalized cell strings: if a query only matches
its oracle to within float noise, that's a determinism bug in the query (fix
it with the ``_det`` aggregation rules), not a tolerance to paper over.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal


def canon_cell(v) -> str:
    """Canonical string form of one result cell, type-insensitively enough
    that int64 5 and int32 5 agree but 5 and 5.5 don't."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v)) + ".0"
        return repr(v)
    if isinstance(v, Decimal):
        return canon_cell(float(v))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def _canon_frame(pdf) -> tuple[list[str], list[tuple[str, ...]]]:
    import numpy as np

    cols = sorted(pdf.columns)
    out = []
    for _, row in pdf[cols].iterrows():
        vals = []
        for v in row:
            if v is not None and type(v).__module__ == "numpy":
                v = v.item() if getattr(v, "ndim", 0) == 0 else list(v)
            if isinstance(v, float) and math.isnan(v):
                v = None
            try:
                import pandas as pd

                if v is pd.NaT:
                    v = None
                elif isinstance(v, pd.Timestamp):
                    v = v.to_pydatetime()
            except Exception:
                pass
            vals.append(canon_cell(v))
        out.append(tuple(vals))
    out.sort()
    return cols, out


def compare_frames(spark_df, duck_con, sql: str, max_diffs: int = 5):
    """Compare a Spark DataFrame against a DuckDB SQL result.

    Returns (ok, report). Mirrors the driver: row count, column-name set,
    and order-insensitive canonical value comparison.
    """
    spdf = spark_df.toPandas()
    odf = duck_con.execute(sql).fetchdf()

    problems = []
    if len(spdf) != len(odf):
        problems.append(f"row count: spark={len(spdf)} oracle={len(odf)}")
    scols, srows = _canon_frame(spdf)
    ocols, orows = _canon_frame(odf)
    if scols != ocols:
        problems.append(f"columns: spark={scols} oracle={ocols}")
    if not problems:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
        ]
        if diffs:
            for i, a, b in diffs[:max_diffs]:
                problems.append(f"row {i}: spark={a} oracle={b}")
            problems.append(f"... {len(diffs)} differing rows total")
    return (not problems), "; ".join(problems)
