"""Similarity search over embedding columns — SURVEY.md §2B #55 and the
driver north star: brute-force cosine top-k as the exact baseline, a
random-hyperplane LSH bucketed variant as the scale path, and embedding
cosine near-dup pairs.

Vector math stays in built-in higher-order functions (zip_with/aggregate) —
JVM-side, no UDF serde. The LSH plane matrix is a seeded literal: tiny,
deterministic, broadcast by construction.

Published foundations (public literature): random-hyperplane LSH is
Charikar (STOC'02); multiprobe is Lv et al., "Multi-Probe LSH" (VLDB'07);
the IVF (inverted-file + coarse quantizer, nprobe search) design follows
Jégou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI'11) §IV-A, flat (unquantized) residuals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns via
    zip_with + fold — sequential accumulation, deterministic, identical to
    DuckDB's list_cosine_similarity on double-cast inputs."""
    prod = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return prod / (na * nb)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k (§2B#55 baseline): broadcast the (small) query
    set against the corpus, score every pair, window top-k per query.

    Scale shape: cost is |queries|·|corpus| scored JVM-side with no
    shuffle of the corpus (queries broadcast); the top-k window partitions
    by query. This is the correct exact plan when queries ≪ corpus — the
    common batch-ANN-evaluation layout. For corpus×corpus use the LSH path.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, table: int, seed: int = 42):
    """Seeded random hyperplane matrix as Python literals (deterministic)."""
    import random

    rnd = random.Random(seed * 1000 + table)
    return [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def _bucket_sig(vec_col: str, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bits of the vector's dot products with each
    hyperplane, packed into a long."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), lit_plane, lambda x, p: x.cast("double") * p
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << i)).otherwise(0)
    return sig


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k via multiprobe random-hyperplane LSH (§2B#55
    scale path).

    n_tables independent n_planes-bit signatures; a candidate is any corpus
    vector whose bucket is within ``probe_hamming`` bit flips of the
    query's bucket in ≥1 table (multiprobe: the query probes its own bucket
    plus each 1-bit-flipped neighbor — recall of many tables at the storage
    cost of one). Candidates are scored exactly and top-k'd. Equi-join on
    (table, bucket) — the corpus is hash-partitioned by bucket, never
    cross-joined; only query rows are replicated (1 + n_planes per table),
    and queries ≪ corpus. Recall is tunable (property-tested against brute
    force); precision is 1.0 because scoring is exact.

    Defaults are tuned for near-orthogonal embeddings (true-neighbor
    cosine ≈ 0.35 ⇒ per-bit agreement ≈ 0.61): 4 planes × 8 tables ×
    radius-1 probing ⇒ expected recall ≈ 0.99. Denser corpora at scale
    raise n_planes ∝ log(n) to keep buckets bounded.

    At 100 TB: corpus signatures are precomputed once and bucket-bucketed
    at rest; per-query work is |bucket|·n_tables·(1+n_planes) scorings. An
    IVF variant (k-means centroids + nprobe) drops in behind the same
    contract.
    """
    def with_buckets(df, prefix, probe):
        rows = []
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_planes, t, seed)
            sig = _bucket_sig(vec_col, planes)
            if probe and probe_hamming >= 1:
                sigs = F.array(
                    sig, *[sig.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
                )
                bucket = F.explode(sigs).alias("bucket")
            else:
                bucket = sig.alias("bucket")
            rows.append(
                df.select(
                    F.col(id_col).alias(f"{prefix}_id"),
                    F.col(vec_col).alias(f"{prefix}_vec"),
                    F.lit(t).alias("table"),
                    bucket,
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    qb = with_buckets(queries, "q", probe=True)
    cb = with_buckets(corpus, "c", probe=False)
    candidates = (
        qb.join(cb, ["table", "bucket"])
        .select("q_id", "q_vec", "c_id", "c_vec")
        .distinct()
    )
    scored = candidates.withColumn(
        "cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "cos",
            "rank",
        )
    )


def _norm_vec(c: Column) -> Column:
    """L2-normalize an array<float> column to array<double> (unit length),
    so cosine reduces to a dot product."""
    n = F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.transform(c, lambda x: x.cast("double") / n)


def _dot_lit(vec_col: Column, centroid: list[float]) -> Column:
    """Dot product of a vector column with a Python-literal centroid."""
    lit_c = F.array(*[F.lit(v) for v in centroid])
    return F.aggregate(
        F.zip_with(vec_col, lit_c, lambda x, p: x * p),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest_cell(vec_col: Column, centroids: list[list[float]]) -> Column:
    """Cell id of the max-dot-product centroid (vectors pre-normalized).
    array_max over (dot, -cell) structs: ties go to the LOWEST cell id —
    deterministic assignment."""
    entries = [
        F.struct(
            _dot_lit(vec_col, c).alias("dot"), F.lit(-i).alias("neg_cell")
        )
        for i, c in enumerate(centroids)
    ]
    return -F.array_max(F.array(*entries)).getField("neg_cell")


def ivf_fit_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 1,
) -> list[list[float]]:
    """Deterministic IVF centroid fit (spherical k-means).

    Seeds = the ``n_cells`` corpus vectors with the smallest
    xxhash64(id) — a seedless deterministic pseudo-random sample that is
    stable across partitionings and cluster layouts. Each Lloyd iteration
    assigns every (normalized) vector to its max-dot centroid and
    recomputes centroids as the per-cell mean via posexplode →
    groupBy(cell, dim) — both full passes are distributed; only the
    centroid matrix (n_cells × dim doubles — a model artifact, like the
    LSH plane matrix) ever reaches the driver.
    """
    normed = corpus.select(
        F.col(id_col).alias("id"), _norm_vec(F.col(vec_col)).alias("v")
    )
    seed_rows = (
        normed.orderBy(F.xxhash64(F.col("id")))
        .limit(n_cells)
        .select("id", "v")
        .collect()
    )
    centroids = [list(r.v) for r in sorted(seed_rows, key=lambda r: r.id)]
    for _ in range(lloyd_iters):
        assigned = normed.withColumn("cell", _nearest_cell(F.col("v"), centroids))
        means = (
            assigned.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r.cell, {})[r.dim] = r.m
        dim = len(centroids[0])
        for cell, comps in by_cell.items():
            vec = [comps[d] for d in range(dim)]
            norm = sum(x * x for x in vec) ** 0.5 or 1.0
            centroids[cell] = [x / norm for x in vec]  # re-normalize mean
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    nprobe: int = 4,
    lloyd_iters: int = 1,
) -> DataFrame:
    """Approximate top-k via IVF-Flat (§2B#55, the inverted-file scale
    path complementing ``lsh_bucketed_topk``).

    Index: every corpus vector lands in exactly one cell (nearest
    centroid). Search: each query probes only its ``nprobe`` nearest
    cells; candidates are scored exactly (cosine, same rounding contract
    as brute force) and top-k'd. nprobe = n_cells degrades to exact brute
    force — the property the tests pin.

    Scale shape: the corpus partitions cleanly by cell (at rest:
    ``partitionBy("cell")``, so a probe reads nprobe/n_cells of the
    data); queries replicate nprobe× and equi-join on cell — never a
    cross join. Centroids are literals in the plan: broadcast by
    construction, no shuffle to apply. Recall is tunable with nprobe;
    precision is 1.0 because re-scoring is exact.
    """
    centroids = ivf_fit_centroids(
        corpus, n_cells, id_col, vec_col, lloyd_iters
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _nearest_cell(_norm_vec(F.col(vec_col)), centroids).alias("cell"),
    )
    probe_entries = [
        F.struct(
            (-_dot_lit(_norm_vec(F.col(vec_col)), cen)).alias("neg_dot"),
            F.lit(i).alias("cell"),
        )
        for i, cen in enumerate(centroids)
    ]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            F.slice(F.array_sort(F.array(*probe_entries)), 1, nprobe)
        ).alias("probe"),
    ).select("query_id", "q_vec", F.col("probe.cell").alias("cell"))
    scored = q.join(c, "cell").withColumn(
        "cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (north star): all pairs (a<b) with
    rounded cosine ≥ threshold. Exact all-pairs — test-scale only; the
    at-scale path is lsh_bucketed_topk's candidate generation feeding the
    same exact scorer."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
