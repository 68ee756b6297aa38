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


def token_mask_sql(base: str = "base", extra_cols: str = "") -> str:
    """CTE fragment turning a CTE ``{base}(id, toks, ...)`` (toks a
    DISTINCT-element list) into ``masks(id{extra}, mask, sz)`` where
    ``mask`` is a HUGEINT token-set bitmask over a dense global token
    ranking and ``sz`` the set size.

    Why: exact set-intersection oracles phrased as shared-token
    self-joins explode on Σ df² — the fixture corpus has a ~31-token
    vocabulary shared by nearly every document, so the join
    materialized ~200 M collision rows for a 3.8 M-pair result (18.2 s
    at sf0.1). With set bitmasks the SAME pair relation evaluates as
    ``bit_count((a.mask & b.mask)::BIT)`` per candidate pair — 1.4 s,
    identical 964 854-pair output, exact by construction (a dense rank
    is injective, so intersection sizes are invariant). FAIL-LOUD
    bound: HUGEINT carries 126 usable bits, and a vocabulary larger
    than that raises ``error(...)`` inside the mask build instead of
    silently truncating — a fixture regen with a big vocabulary turns
    the oracle red, never wrong. ``extra_cols`` (e.g. ``, blk``)
    carries blocking columns through the mask aggregate."""
    err = (
        "error('token vocabulary exceeds 126 bits — widen "
        "token_mask_sql before trusting this oracle')"
    )
    extra = extra_cols.strip()
    sel_extra = f", {extra}" if extra else ""
    return f"""ranks AS MATERIALIZED (
      SELECT tok, row_number() OVER (ORDER BY tok) AS rn
      FROM (SELECT DISTINCT unnest(toks) AS tok FROM {base})
    ),
    masks AS MATERIALIZED (
      SELECT t.id{sel_extra},
             SUM(CASE WHEN r.rn > 126 THEN {err}
                      ELSE 1::HUGEINT << r.rn END)::HUGEINT AS mask,
             COUNT(*) AS sz
      FROM (SELECT id{sel_extra}, unnest(toks) AS tok FROM {base}) t
      JOIN ranks r USING (tok)
      GROUP BY t.id{sel_extra}
    )"""


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
    the edge relation once, so plain (inlined) CTEs would expand the
    plan exponentially (observed as 2^rounds parquet re-opens).

    r6 (verdict task #6): the rounds now run over a STAR-CONTRACTED
    graph, mirroring the engine's phase 1 (operators/graph.py): one
    pass computes every node's closed-neighborhood minimum l0, and the
    edge image under l0 (self-loops dropped) is a contracted graph
    whose components are exactly the images of the originals — l0
    stays inside the component, and the component minimum m has
    l0(m)=m, so the contracted minimum IS the original minimum. Dense
    near-dup clusters are near-cliques whose contraction is EMPTY, so
    every propagate round joins a tiny relation instead of the full
    edge list (the 12 rounds re-joined the 1.9 M-row sym 12× at sf0.1
    — ~10 s of pure loop-invariant work in the
    dedup_minhash_verified_clusters oracle). comp(u) = c(l0(u)) with
    fallback l0(u) for nodes whose representative has no contracted
    edge.

    The covered path distance after contraction grows as 2^(i+1)−2
    contracted hops (each ≥ 1 original hop, usually ~3), so the
    default 12 rounds are exact for any contracted diameter ≤ 8190.
    If a fixture ever exceeded that, the result would HASH-MISMATCH
    the engine (fail-loud, never silently green) — and the sweep
    verifies at every fixture scale."""
    parts = [
        # closed-neighborhood min: one pass over the full edge list —
        # the only round-invariant cost, paid once instead of per round
        "l0 AS MATERIALIZED (SELECT n.id, "
        "LEAST(n.id, COALESCE(MIN(e.dst), n.id)) AS lbl "
        "FROM nodes n LEFT JOIN sym e ON e.src = n.id GROUP BY n.id)",
        "csym AS MATERIALIZED (SELECT DISTINCT la.lbl AS src, "
        "lb.lbl AS dst FROM sym e "
        "JOIN l0 la ON la.id = e.src JOIN l0 lb ON lb.id = e.dst "
        "WHERE la.lbl <> lb.lbl)",
        "c0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lbl "
        "FROM csym)",
    ]
    for i in range(1, rounds + 1):
        prev = f"c{i - 1}"
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT l.id, "
            f"LEAST(l.lbl, COALESCE(MIN(m.lbl), l.lbl)) AS lbl "
            f"FROM {prev} l LEFT JOIN csym e ON e.src = l.id "
            f"LEFT JOIN {prev} m ON m.id = e.dst GROUP BY l.id, l.lbl)"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT p.id, LEAST(p.lbl, pp.lbl) AS lbl "
            f"FROM p{i} p JOIN p{i} pp ON pp.id = p.lbl)"
        )
    parts.append(
        "comp AS (SELECT l0.id, COALESCE(c.lbl, l0.lbl) AS lbl "
        f"FROM l0 LEFT JOIN c{rounds} c ON c.id = l0.lbl)"
    )
    return ",\n    ".join(parts)
