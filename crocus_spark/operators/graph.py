"""Distributed graph primitives over edge-list DataFrames.

The engine's dedup cluster collapse (``minhash_dedup_survivors``) is a
special case of connected components with diameter ~1; this module is the
general operator: min-label propagation with pointer jumping over an
arbitrary edge list, run to a *checked* fixpoint. The reference's implied
workload needs it for cross-provider entity resolution — ETFs linked by
shared ISIN / shared holdings form equivalence classes exactly like
near-dup documents do (SURVEY.md §2B#54/#59).

Scale shape (the Kiveris et al. 2014 "Connected Components in MapReduce"
family): every iteration is two key-partitioned joins + hash aggregates —
no global structure, no driver-side graph. State per node is one (node,
label) row; labels only ever decrease, so each round is monotone and the
fixpoint test (zero changed labels) is a cheap anti-equality count.
Pointer jumping (label := label(label)) halves tree heights each round, so
rounds grow with log(diameter), not diameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    edges_distinct: bool = False,
) -> DataFrame:
    """Label every node with the minimum node id in its connected
    component. Returns (node, component).

    Iterates min-label propagation over the symmetrized edge list plus a
    pointer-jumping contraction, local-checkpointing each round to
    truncate lineage (without it the plan doubles every iteration), until
    no label changes. Labels are bounded below by the true component
    minimum and decrease monotonically, so the checked fixpoint IS the
    exact answer — the iteration cap only guards against degenerate
    inputs, and hitting it raises instead of returning a wrong answer.

    ``edges_distinct=True`` promises the input is already a distinct
    CANONICAL pair list (src < dst, no duplicates — what the dedup verify
    stage and star contraction emit), skipping the symmetrize-then-
    distinct shuffle; propagation is min-idempotent, so a violated
    promise costs only wasted work, never a wrong label.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).filter(F.col("u") != F.col("v"))
    if not edges_distinct:
        und = und.distinct()
    und = und.persist()
    # round 0 for free: initialize every node at its closed-neighborhood
    # minimum (min of itself and its neighbors) — one propagation round
    # folded into the init aggregate, so star/clique-ish graphs start
    # one hop closer to the fixpoint
    labels = (
        und.groupBy(F.col("u").alias("node"))
        .agg(F.least(F.first("u"), F.min("v")).alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # closed-neighborhood min: comp'(u) = min(comp(u), min_{v∈N(u)} comp(v))
        nbr = (
            und.join(
                labels.select(
                    F.col("node").alias("v"), F.col("comp").alias("vcomp")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr, labels["node"] == nbr["u"], "left")
            .select(
                labels["node"],
                labels["comp"].alias("old"),
                F.least(
                    labels["comp"], F.coalesce(nbr["nbr_comp"], labels["comp"])
                ).alias("comp"),
            )
        )
        # triple pointer jumping: comp → comp(comp), applied three times
        # per round (path lengths contract ~8× per round instead of ~2×;
        # measured at sf0.01 this shaves a full checkpoint+count round on
        # both fixture graphs — each extra hop is only a lazy self-join
        # inside the same checkpoint action, while a round is two whole
        # jobs). The pre-round label rides along as `old` so the
        # convergence check is a filter over the already-checkpointed
        # round output — no extra join-the-previous-labels job per
        # round. `stepped` is persisted for the round so the self-joins
        # reuse one computation of the neighborhood-min join instead of
        # 8× (clique-ish graphs converge in 1-2 rounds and would
        # otherwise pay the doubling for nothing).
        stepped = stepped.persist()
        hop1 = stepped
        for _hop in range(3):
            a, b = hop1.alias("a"), hop1.alias("b")
            hop1 = a.join(
                b, F.col("a.comp") == F.col("b.node"), "left"
            ).select(
                F.col("a.node").alias("node"),
                F.col("a.old").alias("old"),
                F.least(
                    F.col("a.comp"),
                    F.coalesce(F.col("b.comp"), F.col("a.comp")),
                ).alias("comp"),
            )
        jumped = hop1.select(
            "node",
            "comp",
            (F.col("comp") != F.col("old")).alias("_chg"),
        ).localCheckpoint(eager=True)
        changed = jumped.filter(F.col("_chg")).limit(1).count()
        stepped.unpersist()
        labels = jumped.drop("_chg")
        if changed == 0:
            und.unpersist()
            return labels
    und.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "u",
    dst: str = "v",
    max_iter: int = 12,
) -> DataFrame:
    """Maximal k-core: iteratively peel nodes of degree < k until the
    remaining subgraph is stable. Returns (node, core_degree) for the
    surviving nodes — every one has ≥ k neighbors INSIDE the core (the
    self-certifying invariant the tests pin).

    Shape: per round, one semi-join of the edge list against the alive
    set on each endpoint + a degree aggregate — all key-partitioned;
    state is one row per alive node. Peeling is monotone (alive sets
    only shrink), so a checked fixpoint is exact; the cap raises rather
    than returning a partial peel, which keeps the unrolled-rounds
    oracle sound (equality needs convergence ≤ the unroll depth, and
    non-convergence is an ERROR, not a wrong answer)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    alive = und.select("u").distinct().localCheckpoint(eager=True)
    n_alive = alive.count()
    for _ in range(max_iter):
        deg = (
            und.join(alive, "u")
            .join(alive.select(F.col("u").alias("v")), "v")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        nxt = (
            deg.filter(F.col("deg") >= k)
            .select("u", "deg")
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        if n_next == n_alive:
            und.unpersist()
            return nxt.select(
                F.col("u").alias("node"), F.col("deg").alias("core_degree")
            )
        alive = nxt.select("u").localCheckpoint(eager=True)
        n_alive = n_next
    und.unpersist()
    raise RuntimeError(f"k_core did not converge in {max_iter} iterations")
