"""Property-based invariants (SURVEY §5.2.3): sketch error bounds,
union-by-name commutativity, salted-op equivalence already lives in
test_scale.py, dedup idempotence in test_llm.py."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE


def test_approx_count_distinct_error_bound(spark):
    """HLL++ estimate within 5% of exact per group (rsd pinned at 0.02 in
    the query; 5% leaves slack for small groups)."""
    from crocus_spark.io import load

    li = load(spark, SF_ORACLE, "lineitem")
    got = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    assert got
    for r in got:
        assert abs(r.approx - r.exact) / r.exact <= 0.05, (
            f"{r.l_returnflag}: {r.approx} vs {r.exact}"
        )


def test_hll_sketch_merge_matches_single_pass(spark):
    """Mergeability: unioning per-group sketches estimates the same
    population as one global sketch over the same rows — the property
    that makes daily-sketch rollups sound. The two aren't bit-identical
    (the union gadget may operate in a different sketch mode), so both
    are held to the 2%-of-exact bound instead."""
    from crocus_spark.io import load

    o = load(spark, SF_ORACLE, "orders")
    merged = (
        o.groupBy("o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .select(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()
        .est
    )
    single = o.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est")
    ).first().est
    exact = o.select(F.countDistinct("o_custkey")).first()[0]
    assert abs(merged - exact) / exact <= 0.02
    assert abs(single - exact) / exact <= 0.02


def test_union_by_name_commutes_on_shared_columns(spark):
    """unionByName(allowMissingColumns) content is order-independent —
    the provider-reconciliation union (§2B#33) can't depend on which
    catalog arrives first."""
    from crocus_spark.io import load

    cust = load(spark, SF_SMOKE, "customer")
    a = cust.filter(F.col("c_custkey") % 2 == 0).drop("c_mktsegment")
    b = cust.filter(F.col("c_custkey") % 3 == 0).drop("c_acctbal")
    ab = a.unionByName(b, allowMissingColumns=True)
    ba = b.unionByName(a, allowMissingColumns=True)
    cols = sorted(ab.columns)
    assert sorted(ba.columns) == cols
    norm = lambda df: sorted(
        map(tuple, df.select(*cols).fillna({"c_acctbal": -1.0}).collect())
    )
    assert norm(ab) == norm(ba)


def test_jaccard_pairs_symmetric_under_id_relabel(spark):
    """Prefix-filter candidate pruning must not depend on id order:
    negating doc ids (reversing every a<b comparison) yields the same
    pair set (modulo the relabel)."""
    from crocus_spark.io import load
    from crocus_spark.operators.dedup import ngram_jaccard_pairs

    docs = load(spark, SF_SMOKE, "documents").limit(300)
    base = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", block_col=None, threshold=0.9
        ).collect()
    }
    releb = docs.withColumn("doc_id", -F.col("doc_id"))
    flipped = {
        (-r.id_b, -r.id_a)
        for r in ngram_jaccard_pairs(
            releb, "text", "doc_id", block_col=None, threshold=0.9
        ).collect()
    }
    assert base == flipped


def test_approx_percentiles_rank_error_bound(spark):
    """GK sketch contract: each returned value's true rank is within
    n/accuracy of the target rank (accuracy=10000 ⇒ ±0.01% of rows)."""
    from crocus_spark.io import load
    from crocus_spark.queries.aggregates import agg_approx_percentiles

    got = agg_approx_percentiles(spark, SF_SMOKE).collect()
    li = load(spark, SF_SMOKE, "lineitem")
    for r in got:
        vals = sorted(
            x.l_extendedprice
            for x in li.filter(F.col("l_returnflag") == r.l_returnflag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        for q, v in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            import bisect

            lo = bisect.bisect_left(vals, v)
            hi = bisect.bisect_right(vals, v)
            target = q * n
            slack = max(1.0, n / 10000) + 1
            assert lo - slack <= target <= hi + slack, (
                r.l_returnflag, q, v, lo, hi, target, n,
            )


def test_pagerank_properties(spark):
    """PageRank contract: deterministic across runs; ranks positive,
    returned in nonincreasing order; every returned vertex has edges; and
    no single vertex in a ~thousand-part graph hoards the rank mass."""
    from crocus_spark.queries.graph_q import graph_pagerank

    a = graph_pagerank(spark, SF_SMOKE).collect()
    b = graph_pagerank(spark, SF_SMOKE).collect()
    assert a == b, "iterative fixpoint must be run-to-run deterministic"
    assert len(a) == 20
    ranks = [r.rank for r in a]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r.rank > 0 and r.deg > 0 for r in a)
    assert ranks[0] < 0.5, "no vertex should hold half the total mass"


def test_kmeans_inertia_monotone(spark):
    """Lloyd's invariant: inertia never increases between rounds, and
    membership churn collapses as the clustering settles."""
    from crocus_spark.queries.llm import ml_kmeans_iterations

    hist = ml_kmeans_iterations(spark, SF_SMOKE).collect()
    assert len(hist) == 4
    inertias = [r.inertia for r in hist]
    assert all(
        b <= a + 1e-9 for a, b in zip(inertias, inertias[1:])
    ), inertias
    assert hist[-1].n_moved < hist[0].n_moved


def test_kll_sketch_quantiles_near_exact(spark):
    """KLL quantile estimates must sit within the sketch's rank-error
    bound of the exact percentiles (k=200 ⇒ ~1.3% rank error; assert a
    generous 3% rank tolerance by value-bracketing)."""
    from pyspark.sql import functions as F

    from crocus_spark.queries import REGISTRY, queries

    queries()
    row = REGISTRY["agg_kll_quantile_sketch"].fn(spark, SF_SMOKE).collect()[0]
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    for q, est in (("0.5", row.p50), ("0.9", row.p90), ("0.99", row.p99)):
        lo, hi = (
            o.agg(
                F.expr(
                    f"percentile(o_totalprice, {max(0.0, float(q)-0.03)})"
                ),
                F.expr(
                    f"percentile(o_totalprice, {min(1.0, float(q)+0.03)})"
                ),
            ).collect()[0]
        )
        assert lo <= est <= hi, (q, est, lo, hi)


def test_theta_set_algebra_consistent_with_exact(spark):
    """Theta estimates must match exact distinct-set algebra on the
    fixture (sketch is exact below its nominal-entries threshold) and be
    internally consistent: union = urgent + other - both;
    urgent_only = urgent - both."""
    from pyspark.sql import functions as F

    from crocus_spark.queries import REGISTRY, queries

    queries()
    row = REGISTRY["agg_theta_set_algebra"].fn(spark, SF_SMOKE).collect()[0]
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    urgent = {
        r.o_custkey
        for r in o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey").distinct().collect()
    }
    other = {
        r.o_custkey
        for r in o.filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey").distinct().collect()
    }
    def close(est, exact):
        return abs(est - exact) <= max(2, 0.05 * exact)
    assert close(row.n_urgent, len(urgent))
    assert close(row.n_other, len(other))
    assert close(row.n_union, len(urgent | other))
    assert close(row.n_both, len(urgent & other))
    assert close(row.n_urgent_only, len(urgent - other))


def test_weighted_median_defining_property(spark):
    """For each group: at least half the total weight sits at or below
    the reported weighted median, and strictly less than half sits
    strictly below it — the definition, checked against the raw table
    rather than any oracle."""
    from crocus_spark.io import load
    from crocus_spark.queries import REGISTRY, queries

    queries()
    med = {
        r.l_returnflag: r.weighted_median
        for r in REGISTRY["agg_weighted_median"].fn(spark, SF_SMOKE).collect()
    }
    li = load(spark, SF_SMOKE, "lineitem")
    for flag, m in med.items():
        g = li.filter(F.col("l_returnflag") == flag)
        tot = g.agg(F.sum("l_quantity")).first()[0]
        at_or_below = (
            g.filter(F.col("l_extendedprice") <= m)
            .agg(F.sum("l_quantity"))
            .first()[0]
        )
        below = (
            g.filter(F.col("l_extendedprice") < m)
            .agg(F.sum("l_quantity"))
            .first()[0]
            or 0.0
        )
        assert 2 * at_or_below >= tot, flag
        assert 2 * below < tot + 1e-9, flag


def test_auc_bounds_and_counts(spark):
    """AUC ∈ [0,1]; pos+neg covers the corpus; the label-0 centroid must
    rank its own class above the rest (AUC > 0.5) on every fixture."""
    from crocus_spark.io import load
    from crocus_spark.queries import REGISTRY, queries

    queries()
    row = REGISTRY["ml_auc_evaluation"].fn(spark, SF_SMOKE).first()
    n = load(spark, SF_SMOKE, "embeddings").count()
    assert row.n_pos + row.n_neg == n
    assert 0.0 <= row.auc <= 1.0
    assert row.auc > 0.5


def test_hhi_bounds(spark):
    """HHI lies in [1/n_positions, 1] — equal-weight floor to
    single-position ceiling — for every reported portfolio."""
    from crocus_spark.queries import REGISTRY, queries

    queries()
    rows = REGISTRY["holdings_concentration_hhi"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.hhi_floor - 1e-6 <= r.hhi <= 1.0 + 1e-6, r


def test_drawdown_nonnegative_and_bounded_by_peak(spark):
    """0 ≤ max drawdown ≤ max peak: the trough can't fall further than
    the peak is high (values are non-negative purchase amounts)."""
    from crocus_spark.queries import REGISTRY, queries

    queries()
    rows = REGISTRY["series_max_drawdown"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.max_drawdown <= r.max_peak + 1e-9, r


def test_calibration_bins_partition_the_corpus(spark):
    """Decile bins partition the scored corpus: counts sum to corpus
    size, every frac_pos ∈ [0,1], every mean_score inside its bin's
    [lo, hi] envelope."""
    from crocus_spark.io import load
    from crocus_spark.queries import REGISTRY, queries

    queries()
    rows = REGISTRY["ml_calibration_bins"].fn(spark, SF_SMOKE).collect()
    n = load(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.n for r in rows) == n
    for r in rows:
        assert 0.0 <= r.frac_pos <= 1.0
        lo, hi = r.bin / 10.0, (r.bin + 1) / 10.0 if r.bin < 9 else 1.0
        assert lo - 1e-6 <= r.mean_score <= hi + 1e-6, r


@pytest.mark.slow  # edge-input property sweep across every dedup operator (~13 s)
def test_dedup_operators_handle_empty_and_singleton_input(spark):
    """Degenerate inputs — empty corpus and a single document — must flow
    through the dedup family without error: no pairs, one self-cluster.
    At 100 TB these shapes appear per-partition (an empty shard, a
    1-doc block) even when the corpus is huge."""
    from crocus_spark.operators import dedup as D

    schema = "doc_id long, text string, lang string"
    empty = spark.createDataFrame([], schema)
    one = spark.createDataFrame([(1, "hello world", "en")], schema)

    assert D.ngram_jaccard_pairs(empty, block_col="lang").count() == 0
    assert D.ngram_jaccard_pairs(one, block_col="lang").count() == 0
    assert D.simhash_pairs(empty).count() == 0
    assert D.simhash_pairs(one).count() == 0
    assert D.exact_dedup(empty).count() == 0
    assert D.exact_dedup(one).count() == 1
    labels = D.minhash_verified_components(one).collect()
    assert [(r.id, r.cluster_id, r.is_survivor) for r in labels] == [
        (1, 1, True)
    ]


def test_similarity_operators_handle_empty_query_side(spark):
    """Zero queries against a non-empty corpus → zero result rows (not an
    error): the Arrow scorers must tolerate empty batches, and top-k
    windows over nothing are nothing."""
    from crocus_spark.operators import similarity as S

    schema = "vec_id long, embedding array<float>"
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5, 0.25]) for i in range(8)], schema
    )
    no_queries = spark.createDataFrame([], schema)
    assert S.brute_force_topk(no_queries, corpus, k=3).count() == 0


def test_cosine_neardup_empty_probe_returns_empty(spark):
    """r4 ADVICE: an EMPTY probe set must early-return an empty
    (id_a, id_b, cos) frame — the collected-probe matrix path would
    otherwise build a shape-(0,) array and crash on P.shape[1] inside
    the executor scorer."""
    from crocus_spark.operators.similarity import cosine_neardup_pairs

    schema = "vec_id long, embedding array<float>"
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5, 0.25]) for i in range(8)], schema
    )
    no_probe = spark.createDataFrame([], schema)
    out = cosine_neardup_pairs(corpus, threshold=0.5, probe=no_probe)
    assert out.columns == ["id_a", "id_b", "cos"]
    assert out.count() == 0


def test_connected_components_fractional_ids_take_generic_path(spark):
    """r4 ADVICE: the numeric fast path's convergence checksum casts
    labels to decimal(38,0), which ROUNDS fractional ids — a monotone
    decrease like 2.4→1.6 can leave the checksum unchanged and exit
    before the fixpoint. Double ids must fall through to the generic
    changed-rows path and still label exactly. The chain ids are
    spaced 0.8 apart so consecutive labels round to the SAME integer —
    the exact aliasing the decimal checksum cannot see."""
    from crocus_spark.operators.graph import connected_components

    # chain 10.0 — 10.8 — 11.6 — ... (21 nodes, diameter forces
    # multiple propagation rounds) plus an isolated pair
    chain = [(10.0 + 0.8 * i, 10.0 + 0.8 * (i + 1)) for i in range(20)]
    edges = chain + [(99.5, 99.9)]
    df = spark.createDataFrame(edges, "src double, dst double")
    comp = {
        r.node: r.comp
        for r in connected_components(df, "src", "dst").collect()
    }
    chain_nodes = [10.0 + 0.8 * i for i in range(21)]
    assert {comp[n] for n in chain_nodes} == {10.0}
    assert comp[99.5] == 99.5 and comp[99.9] == 99.5


def test_golden_record_no_duplicates_is_empty(spark):
    """A corpus with zero exact duplicates produces an EMPTY golden-record
    relation (the HAVING > 1 contract), not one row per document."""
    from crocus_spark.queries import REGISTRY, queries

    queries()
    out = REGISTRY["dedup_golden_record"].fn(spark, SF_SMOKE)
    got = out.collect()
    for r in got:
        assert r.n_members > 1


def test_k_core_invariant_every_member_has_k_core_neighbors(spark):
    """The defining k-core property, checked independently of the oracle:
    every returned node has >= k neighbors that are THEMSELVES in the
    core, and its reported core_degree equals that count."""
    from pyspark.sql import functions as F

    from crocus_spark.operators.graph import k_core
    from crocus_spark.queries import REGISTRY, queries

    queries()
    core = REGISTRY["graph_k_core"].fn(spark, SF_SMOKE).collect()
    members = {r.node for r in core}
    degrees = {r.node: r.core_degree for r in core}
    from crocus_spark.io import load

    li = (
        load(spark, SF_SMOKE, "lineitem")
        .filter(F.col("l_orderkey") % 20 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    from collections import defaultdict

    orders = defaultdict(set)
    for r in li:
        orders[r.l_orderkey].add(r.l_partkey)
    adj = defaultdict(set)
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a != b:
                    adj[a].add(b)
    for node in members:
        in_core = adj[node] & members
        assert len(in_core) >= 3, f"{node} has only {len(in_core)} core nbrs"
        assert degrees[node] == len(in_core)


@pytest.mark.slow  # dual-path property fuzz (~9 s); generic path covered by test_connected_components_fractional_ids
def test_connected_components_numeric_and_generic_paths_agree(spark):
    """The numeric fast path (self-loop fold + decimal checksum
    convergence) and the generic orderable-id path (changed-rows check)
    must label identically — pinned on a graph mixing a long chain
    (multi-round convergence, exercises the pointer jump), a clique, an
    isolated pair, and a self-loop-only node that the u != v filter
    drops from both paths."""
    from pyspark.sql import functions as F

    from crocus_spark.operators.graph import connected_components

    edges = [(i, i + 1) for i in range(100, 140)]  # 41-node chain
    edges += [(a, b) for a in range(5) for b in range(5) if a < b]
    edges += [(50, 51), (60, 60)]
    df = spark.createDataFrame(edges, "src long, dst long")

    num = {
        (r.node, r.comp)
        for r in connected_components(df, "src", "dst").collect()
    }
    # string ids zero-padded so lexicographic min == numeric min
    sdf = df.select(
        F.format_string("%03d", F.col("src")).alias("src"),
        F.format_string("%03d", F.col("dst")).alias("dst"),
    )
    gen = {
        (int(r.node), int(r.comp))
        for r in connected_components(sdf, "src", "dst").collect()
    }
    assert num == gen
    comp = dict(num)
    assert {comp[i] for i in range(100, 141)} == {100}
    assert {comp[i] for i in range(5)} == {0}
    assert comp[50] == 50 and comp[51] == 50
    assert 60 not in comp  # self-loop-only node has no undirected edge
