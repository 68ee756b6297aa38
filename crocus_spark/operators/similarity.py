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
from pyspark.sql import types as T
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


@F.pandas_udf(T.DoubleType())
def cosine_batch(a, b):
    """Arrow-batched cosine, BIT-IDENTICAL to the ``cosine`` fold: the
    accumulation loops over *dimensions* with numpy elementwise float64
    ops, so each row's sum is the same left-to-right IEEE sequence as the
    JVM fold (and DuckDB's sequential loop) while the batch vectorizes
    across rows. This is the pair-scoring hot path: the declarative
    zip_with/aggregate form runs in Spark's interpreted HOF evaluator
    (measured 60s for 2M pairs at sf0.1; this UDF: ~1s). Fixed-dim
    vectors assumed (the embeddings contract)."""
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.vstack(a.to_numpy()).astype(np.float64)
    B = np.vstack(b.to_numpy()).astype(np.float64)
    dot = np.zeros(A.shape[0])
    na = np.zeros(A.shape[0])
    nb = np.zeros(A.shape[0])
    for i in range(A.shape[1]):
        x, y = A[:, i], B[:, i]
        dot = dot + x * y
        na = na + x * x
        nb = nb + y * y
    return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))


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
        "cos", F.round(cosine_batch(F.col("q_vec"), F.col("c_vec")), 6)
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

    All n_tables signatures come from ONE Arrow-batched matmul per scan
    (vectors × the (n_tables·n_planes, dim) plane matrix) followed by a
    posexplode — one pass over the corpus. The r1 form unioned n_tables
    separate scans, each evaluating n_planes interpreted HOF folds per
    row: 8× the scan work and a 32-fold expression tree (measured 10 s →
    ~3 s at sf0.01 for the same buckets).
    """
    import numpy as np
    import pandas as pd

    planes = np.array(
        [_hyperplanes(dim, n_planes, t, seed) for t in range(n_tables)],
        dtype=np.float64,
    ).reshape(n_tables * n_planes, dim)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def all_sigs(v):
        V = np.vstack(v.to_numpy()).astype(np.float64)  # (B, dim)
        bits = (V @ planes.T > 0).reshape(len(V), n_tables, n_planes)
        sigs = (bits * weights).sum(-1).astype(np.int64)  # (B, n_tables)
        return pd.Series(list(sigs))

    def with_buckets(df, prefix, probe):
        base = df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_vec"),
            F.posexplode(all_sigs(F.col(vec_col))).alias("table", "sig"),
        )
        if probe and probe_hamming >= 1:
            bucket = F.explode(
                F.array(
                    F.col("sig"),
                    *[
                        F.col("sig").bitwiseXOR(F.lit(1 << i))
                        for i in range(n_planes)
                    ],
                )
            ).alias("bucket")
        else:
            bucket = F.col("sig").alias("bucket")
        return base.select(
            f"{prefix}_id", f"{prefix}_vec", "table", bucket
        )

    qb = with_buckets(queries, "q", probe=True)
    cb = with_buckets(corpus, "c", probe=False)
    candidates = (
        qb.join(cb, ["table", "bucket"])
        .dropDuplicates(["q_id", "c_id"])
        .select("q_id", "q_vec", "c_id", "c_vec")
    )
    scored = candidates.withColumn(
        "cos", F.round(cosine_batch(F.col("q_vec"), F.col("c_vec")), 6)
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


def _dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (sequential fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@F.pandas_udf(T.DoubleType())
def dot_batch(a, b):
    """Arrow-batched dot product, bit-identical to the ``_dot`` fold: the
    dimension loop keeps each row's left-to-right IEEE accumulation order
    while numpy vectorizes across rows (same rationale as cosine_batch —
    the fold is interpreted per element)."""
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.vstack(a.to_numpy()).astype(np.float64)
    B = np.vstack(b.to_numpy()).astype(np.float64)
    dot = np.zeros(A.shape[0])
    for i in range(A.shape[1]):
        dot = dot + A[:, i] * B[:, i]
    return pd.Series(dot)


def _assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid cell per vector: broadcast the (cells-sized)
    centroid relation, score every (vector, centroid) pair, keep the
    max-dot cell with ties to the LOWEST cell id (deterministic).
    max_by over struct(dot, -cell) does the argmax in one partial+final
    aggregation — no window, no extra shuffle of the vector payload."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "id",
        "v",
        F.struct(
            dot_batch(F.col("v"), F.col("centroid")).alias("dot"),
            (-F.col("cell")).alias("neg_cell"),
        ).alias("sc"),
    )
    best = scored.groupBy("id").agg(
        (-F.max("sc").getField("neg_cell")).cast("int").alias("cell"),
        F.first("v").alias("v"),
    )
    return best


def collect_centroid_model(centroids: DataFrame):
    """Collect the fitted (cell, centroid) relation into a dense cell
    list + k×dim float64 matrix. The collect is MODEL-sized (k·dim
    doubles — bytes to kilobytes), the same serving layout FAISS and
    MLlib KMeans use; it is never on a data-sized path."""
    import numpy as np

    rows = sorted(centroids.collect(), key=lambda r: r["cell"])
    cells = np.array([int(r["cell"]) for r in rows], dtype=np.int32)
    mat = np.array([list(r["centroid"]) for r in rows], dtype=np.float64)
    return cells, mat


def _centroid_df(spark, cells, mat) -> DataFrame:
    """(cell, centroid) DataFrame rebuilt from the collected model —
    plan-time literal rows, so referencing it never re-runs the fit.

    Built through pandas+Arrow, NOT ``createDataFrame(list)``: the list
    path parallelizes into ``defaultParallelism`` slices, so every
    materialization of this 8-row relation launched 32 near-empty tasks
    (measured 0.35 s vs 0.05 s for the Arrow local relation — the probe
    path paid it once per broadcast build). Values are dense non-null
    floats, so the pandas conversion cannot change NULL semantics; the
    list path remains as fallback for sessions without Arrow."""
    try:
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "cell": [int(c) for c in cells],
                "centroid": [[float(x) for x in row] for row in mat],
            }
        )
        return spark.createDataFrame(pdf, "cell int, centroid array<double>")
    except Exception:
        return spark.createDataFrame(
            [(int(c), [float(x) for x in row]) for c, row in zip(cells, mat)],
            "cell int, centroid array<double>",
        )


def assign_cells_projection(
    vectors: DataFrame, cells, mat, normalize: bool = False
) -> DataFrame:
    """Shuffle-free nearest-centroid assignment: the k×dim model rides
    into a map-side Arrow UDF as a closure (Spark broadcasts the
    serialized task), so assignment is a pure projection — the corpus is
    never shuffled or replicated k× the way the crossJoin+groupBy argmax
    does. At 100 TB this removes a full corpus exchange per assignment,
    the single biggest avoidable cost in IVF indexing.

    ``normalize=True`` L2-normalizes the input vectors INSIDE the Arrow
    batch before the dot loop, replaying ``_norm_vec``'s left-to-right
    IEEE fold (acc + x·x per dim, sqrt, per-component divide)
    bit-for-bit — callers that only need the CELL no longer pay the
    interpreted higher-order ``_norm_vec`` lambda over the whole corpus
    (seconds per million rows; the r4-measured cold-probe wall).

    Value parity with ``_assign_cells``: the dimension loop accumulates
    each (vector, centroid) dot in the same left-to-right IEEE order as
    ``dot_batch``, and ``np.argmax``'s first-max rule over ascending cell
    ids reproduces the max-dot / lowest-cell tie rule."""
    import numpy as np
    import pandas as pd

    @F.pandas_udf(T.IntegerType())
    def best_cell(v):
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        V = np.vstack(v.to_numpy()).astype(np.float64)
        if normalize:
            acc = np.zeros(V.shape[0])
            for i in range(V.shape[1]):  # _norm_vec's fold order
                x = V[:, i]
                acc = acc + x * x
            V = V / np.sqrt(acc)[:, None]
        D = np.zeros((V.shape[0], mat.shape[0]))
        for i in range(V.shape[1]):
            D = D + V[:, i : i + 1] * mat[None, :, i]
        return pd.Series(cells[np.argmax(D, axis=1)], dtype="int32")

    # asNondeterministic (guide §4.4 pattern): downstream equi-joins on
    # "cell" push an IsNotNull(cell) filter below the projection, and the
    # optimizer then evaluates this UDF TWICE per corpus row (one
    # ArrowEvalPython under the pushed filter, one for the output column
    # — observed in the ann_ivf_topk physical plan). The function is in
    # fact pure, but the deterministic contract is what licenses the
    # duplication; withholding it pins exactly one evaluation. The
    # assignment can never be NULL, so the blocked IsNotNull prune was
    # dead weight anyway.
    best_cell = best_cell.asNondeterministic()

    return vectors.withColumn("cell", best_cell(F.col("v")))


def assign_and_normalize(vectors: DataFrame, cells, mat) -> DataFrame:
    """One Arrow pass emitting (cell, v) where v is the L2-NORMALIZED
    double vector and cell its nearest centroid — the fit-loop
    counterpart of ``assign_cells_projection(normalize=True)`` for
    consumers that need the normalized components THEMSELVES (the
    per-cell decimal mean recompute). Normalization replays
    ``_norm_vec``'s left-to-right fold (acc + x·x per dim, sqrt,
    per-component divide) and the dot loop replays ``dot_batch``'s
    order, so every emitted double is bit-identical to the interpreted
    lambda + projection pair it replaces."""
    import numpy as np
    import pandas as pd

    def fn(batches):
        for b in batches:
            if len(b) == 0:
                continue
            V = np.vstack(b["v"].to_numpy()).astype(np.float64)
            acc = np.zeros(V.shape[0])
            for i in range(V.shape[1]):
                x = V[:, i]
                acc = acc + x * x
            V = V / np.sqrt(acc)[:, None]
            D = np.zeros((V.shape[0], mat.shape[0]))
            for i in range(V.shape[1]):
                D = D + V[:, i : i + 1] * mat[None, :, i]
            yield pd.DataFrame(
                {
                    "cell": cells[np.argmax(D, axis=1)].astype("int32"),
                    "v": list(V),
                }
            )

    return vectors.mapInPandas(fn, "cell int, v array<double>")


def ivf_fit_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 1,
    dim: int | None = None,
    seed_hash=None,
) -> DataFrame:
    """Deterministic IVF centroid fit (spherical k-means).

    Seeds = the ``n_cells`` corpus vectors with the smallest xxhash64(id)
    — a seedless deterministic pseudo-random sample, stable across
    partitionings. ``seed_hash`` overrides the sampling hash (a Column
    function over the id column): pass ``dedup.portable_hash60`` over a
    string cast when the whole fit must be replayable in an external
    SQL oracle (xxhash64 has no DuckDB twin; the md5-based hash does —
    the ``dq_ann_recall_probe`` monitor uses this). Either way the
    sample is uniform-ish and content-keyed; the hash choice never
    changes the algorithm, only cross-engine replayability.
    Each Lloyd iteration collects the MODEL (k×dim
    doubles — the MLlib-KMeans layout; never data-sized), assigns cells
    as a shuffle-free map-side projection, then recomputes per-cell means
    with the decimal accumulation contract (queries/_det.py) so centroid
    components are bit-identical at any parallelism. Per iteration the
    corpus is read once and shuffled never; the only exchange carries
    cells × dims of aggregate state — model-sized."""
    raw = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    # distributed top-n (TakeOrderedAndProject — per-partition partial
    # top-n, merge of n_cells rows), NOT a global row_number window, which
    # would funnel the whole corpus through one task. Normalization
    # happens AFTER the limit (n_cells rows) — the corpus-wide
    # interpreted _norm_vec lambda was most of the cold fit's wall.
    hash_fn = seed_hash if seed_hash is not None else F.xxhash64
    seeds = raw.orderBy(hash_fn(F.col("id")), F.col("id")).limit(n_cells)
    centroids = (
        # re-key seeds by id order so cell numbering is hash-independent;
        # the window spans only the n_cells seed rows
        seeds.withColumn(
            "cell", (F.row_number().over(Window.orderBy("id")) - 1).cast("int")
        ).select("cell", _norm_vec(F.col("v")).alias("centroid"))
    )
    for _ in range(lloyd_iters):
        # model-sized collect per iteration (MLlib-KMeans-style), so the
        # assignment is a map-side projection, not a corpus shuffle;
        # one Arrow pass emits (cell, normalized v) — numpy replays
        # _norm_vec's fold bit-for-bit (see assign_and_normalize)
        assigned = assign_and_normalize(
            raw, *collect_centroid_model(centroids)
        )
        if dim is not None:
            # dim known up front: ONE aggregation with dim per-component
            # decimal sums (map-side partials, cells × dim state) replaces
            # the posexplode → groupBy(cell, dim) → groupBy(cell) pair —
            # same values (exact decimal sums, same rounding), one shuffle
            # instead of two, and no corpus × dim intermediate relation.
            # Built as ONE parsed SQL string: dim×4 py4j Column calls cost
            # ~0.5 s of driver time per plan build at dim=64.
            comps = ",".join(
                "round(cast(sum(cast(element_at(v, {i}) as decimal(25,12)))"
                " as double) / count(1), 9)".format(i=i + 1)
                for i in range(dim)
            )
            unnormed = assigned.groupBy("cell").agg(
                F.expr(f"array({comps})").alias("mv")
            )
        else:
            means = (
                assigned.select("cell", F.posexplode("v").alias("dim", "x"))
                .groupBy("cell", "dim")
                .agg(
                    F.round(
                        F.sum(F.col("x").cast("decimal(25,12)")).cast("double")
                        / F.count(F.lit(1)),
                        9,
                    ).alias("m")
                )
            )
            unnormed = means.groupBy("cell").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s.m,
                ).alias("mv")
            )
        centroids = unnormed.select(
            "cell", _norm_vec(F.col("mv")).alias("centroid")
        )
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
    dim: int | None = None,
    model: tuple | None = None,
) -> DataFrame:
    """Approximate top-k via IVF-Flat (§2B#55, the inverted-file scale
    path complementing ``lsh_bucketed_topk``).

    ``model``: an optional prefitted ``(cells, mat)`` pair from
    ``collect_centroid_model`` — the FAISS serve-from-index shape. When
    given, the (scan-heavy) centroid fit is skipped entirely and the
    call is probe-only; a production deployment fits once and serves
    many, so the headline query memoizes the model per corpus path.

    Index: every corpus vector lands in exactly one cell (nearest
    centroid). Search: each query probes only its ``nprobe`` nearest
    cells; candidates are scored exactly (cosine, same rounding contract
    as brute force) and top-k'd. nprobe = n_cells degrades to exact brute
    force — the property the tests pin.

    Scale shape: the corpus partitions cleanly by cell (at rest:
    ``partitionBy("cell")``, so a probe reads nprobe/n_cells of the
    data); queries replicate nprobe× and equi-join on cell — never an
    unbounded cross join. The centroid relation is cells-sized and
    broadcast everywhere it appears, and assignment is a map-side
    projection against the collected k×dim model (model-sized driver
    state, FAISS-style — n_cells can still grow to √n). Recall is
    tunable with nprobe; precision is 1.0 because re-scoring is exact.
    """
    # materialize the fitted model ONCE as the collected k×dim matrix;
    # the (cells-sized) centroid DataFrame the probe ranking needs is
    # rebuilt from the collected rows, so no downstream reference can
    # re-run the fit lineage and no checkpoint state lingers.
    cells, mat = model if model is not None else collect_centroid_model(
        ivf_fit_centroids(corpus, n_cells, id_col, vec_col, lloyd_iters, dim=dim)
    )
    centroids = _centroid_df(corpus.sparkSession, cells, mat)
    # cell assignment as a projection ON the corpus scan itself — no
    # corpus self-join, no shuffle; the raw vector stays alongside for
    # exact re-scoring. Normalization happens inside the Arrow batch
    # (normalize=True): the corpus-wide interpreted _norm_vec lambda
    # was this probe path's single biggest cost, and its result was
    # immediately dropped.
    c = assign_cells_projection(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.col(vec_col).alias("v"),
        ),
        cells,
        mat,
        normalize=True,
    ).drop("v")
    # per-query probe list: top-nprobe centroid cells by dot product
    q_normed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm_vec(F.col(vec_col)).alias("qn"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("q_dot"), F.col("cell")
    )
    probes = (
        q_normed.crossJoin(F.broadcast(centroids))
        .withColumn("q_dot", dot_batch(F.col("qn"), F.col("centroid")))
        .withColumn("probe_rank", F.row_number().over(w_probe))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    # probes is (queries × nprobe) rows — tiny by the module's standing
    # queries ≪ corpus contract. The explicit broadcast keeps the corpus
    # from ever shuffling on cell for this join (and skips AQE's
    # stage-materialization round-trip that reaches the same plan).
    scored = c.join(F.broadcast(probes), "cell").withColumn(
        "cos", F.round(cosine_batch(F.col("q_vec"), F.col("c_vec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def label_centroids(
    corpus: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_digits: int = 9,
) -> DataFrame:
    """(label, centroid array<double>): per-label mean vector, computed
    distributed via posexplode → groupBy(label, dim) → exact decimal mean
    → re-assembled in dim order. The decimal accumulation (same contract
    as queries/_det.py) plus a 9-digit round makes centroid components
    bit-identical across engines and cluster layouts. The shuffle carries
    (labels × dims) cells — model-sized, never data-sized."""
    dims = corpus.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("dim", "x"),
    )
    means = dims.groupBy("label", "dim").agg(
        F.round(
            F.sum(F.col("x").cast("double").cast("decimal(25,12)")).cast("double")
            / F.count(F.lit(1)),
            round_digits,
        ).alias("m")
    )
    return means.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s.m
        ).alias("centroid")
    )


def centroid_classify(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid classification over the embedding column: assign
    each query the label of the max-cosine per-label mean (Rocchio
    classifier). Centroids are a labels-sized relation — crossJoin +
    broadcast by size; ties break to the lowest label, deterministically.
    At 100 TB only the posexplode mean pass touches the corpus."""
    cents = label_centroids(corpus, label_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "cos", F.round(cosine(F.col("qv"), F.col("centroid")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("label"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "cos")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs against a BOUNDED probe set.

    An exact cosine θ-join over dense vectors at a low threshold is
    inherently Ω(n·m): no deterministic blocking prunes dense 64-dim
    pairs without losing recall (LSH/MinHash — registered separately —
    are the approximate at-scale paths for the unbounded case). The exact
    form this operator keeps is therefore the *probe-semijoin* shape: a
    bounded probe relation is broadcast against the corpus, which streams
    through the scorer exactly once — linear in corpus size, the same
    shape as brute-force ANN. ``probe`` MUST be bounded (queries ≪
    corpus, this module's standing contract); passing ``None`` scores
    ``df`` against itself and is test-scale only.

    The corpus side is repartitioned to the session's parallelism: the
    fixture parquet is a single row group (one input split), and without
    the spread all scoring would run in one task (measured 2.5×).

    With a probe set, the probe MATRIX is collected (model-sized by the
    bounded-probe contract — m×d floats, same class as the IVF centroid
    model) and shipped in the UDF closure, so the Arrow boundary carries
    the corpus ONCE plus the scored pairs — NOT both vectors
    materialized per pair, which at m probes multiplies corpus bytes by
    m through the serializer (measured: the pair-row form shipped ~100MB
    for a 1MB corpus at sf0.01 and was this query's entire wall). The
    accumulation loops dimensions in index order with float64
    elementwise ops — the same left-to-right IEEE sequence as
    cosine_batch and DuckDB's loop, so scores are bit-identical."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if probe is None:
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = df.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
        ).repartition(par)
        pairs = b.join(F.broadcast(a), F.col("id_a") < F.col("id_b"))
        return (
            pairs.withColumn(
                "cos", F.round(cosine_batch(F.col("va"), F.col("vb")), 6)
            )
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos")
        )

    import numpy as np

    probe_rows = probe.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).collect()  # bounded probe contract: m×d — model-sized
    if not probe_rows:
        # empty probe set: P would be shape (0,) and P.shape[1] inside
        # the executor-side scorer raises — return the empty result the
        # old join-based path produced.
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "id_a long, id_b long, cos double"
        )
    p_ids = np.array([r["id"] for r in probe_rows], dtype=np.int64)
    P = np.array([list(r["v"]) for r in probe_rows], dtype=np.float64)

    def score(batches):
        import pandas as pd

        # probe norms in the same dim order as the pair fold
        nb = np.zeros(P.shape[0])
        for i in range(P.shape[1]):
            y = P[:, i]
            nb = nb + y * y
        sq_nb = np.sqrt(nb)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf["id_b"].to_numpy(dtype=np.int64)
            C = np.vstack(pdf["vb"].to_numpy()).astype(np.float64)
            dot = np.zeros((C.shape[0], P.shape[0]))
            na = np.zeros(C.shape[0])
            for i in range(C.shape[1]):
                x = C[:, i]
                dot = dot + np.outer(x, P[:, i])
                na = na + x * x
            cos = dot / (np.sqrt(na)[:, None] * sq_nb[None, :])
            keep = p_ids[None, :] < c_ids[:, None]
            ci, pi = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": p_ids[pi],
                    "id_b": c_ids[ci],
                    "cos_raw": cos[ci, pi],
                }
            )

    corpus = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    ).repartition(par)
    scored = corpus.mapInPandas(
        score, "id_a long, id_b long, cos_raw double"
    )
    return (
        scored.withColumn("cos", F.round(F.col("cos_raw"), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's compression half)
# ---------------------------------------------------------------------------


def pq_fit_codebook(
    corpus: DataFrame,
    m: int = 16,
    ksub: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 256,
    iters: int = 5,
):
    """Per-subspace k-means codebook, trained on a deterministic sample.

    PQ codebooks are model-sized (m·ksub·(d/m) floats — KBs) and are
    trained on a bounded sample even in production systems (FAISS trains
    on ~100k vectors regardless of corpus size), so unlike the IVF fit —
    which is fully declarative — this deliberately collects a
    hash-ordered sample (stable across partitionings) and runs seeded
    Lloyd iterations in numpy on the driver. Returns (m, ksub, d/m)
    float64 ndarray; broadcast it to the encode/scan UDFs.
    """
    import numpy as np

    sample = (
        corpus.select(
            F.col(id_col).alias("id"), _norm_vec(F.col(vec_col)).alias("v")
        )
        .orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(sample_n)
    )
    X = np.array([r.v for r in sample.collect()], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    codebook = np.zeros((m, ksub, ds))
    for s in range(m):
        sub = X[:, s * ds : (s + 1) * ds]
        cent = sub[: min(ksub, len(sub))].copy()
        if len(cent) < ksub:  # degenerate tiny corpus: pad by repeat
            cent = np.resize(cent, (ksub, ds))
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(ksub):
                pts = sub[assign == c]
                if len(pts):
                    cent[c] = pts.mean(0)
        codebook[s] = cent
    return codebook


def pq_topk(
    spark,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 16,
    ksub: int = 32,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via PQ codes + ADC scan + exact re-rank.

    Encode: each normalized corpus vector compresses to ``m`` one-byte
    codes (nearest per-subspace centroid) — 64 float32 dims become 8
    bytes, a 32× memory cut, which is what lets a 100 TB embedding corpus
    sit scan-resident. Search: per query, an (m × ksub) lookup table of
    subspace dots is built once; the Arrow-batched scan then scores every
    row with m table lookups instead of d multiplies (ADC). The top
    ``refine`` ADC candidates per query are re-scored EXACTLY against the
    raw vectors (same cosine/rounding contract as brute force), so
    precision of returned scores is 1.0 and PQ error only affects which
    candidates reach the re-rank — recall is property-tested and tunable
    via refine/ksub. Queries collect to the driver for LUT construction
    (queries ≪ corpus is this module's standing contract; the corpus
    itself never leaves the executors).
    """
    import numpy as np
    import pandas as pd

    codebook = pq_fit_codebook(
        corpus, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
    )
    bc_cb = spark.sparkContext.broadcast(codebook)
    d = codebook.shape[0] * codebook.shape[2]
    ds = codebook.shape[2]

    q_rows = (
        queries.select(
            F.col(id_col).alias("query_id"), _norm_vec(F.col(vec_col)).alias("qn")
        )
        .orderBy("query_id")
        .collect()
    )
    q_ids = [r.query_id for r in q_rows]
    Q = np.array([r.qn for r in q_rows], dtype=np.float64)  # (q, d)
    # (q, m, ksub) LUT: dot of each query subvector with each centroid
    lut = np.einsum(
        "qsd,skd->qsk", Q.reshape(len(q_ids), m, ds), codebook
    )
    bc_lut = spark.sparkContext.broadcast((q_ids, lut))

    normed = corpus.select(
        F.col(id_col).alias("neighbor_id"), _norm_vec(F.col(vec_col)).alias("v")
    )

    def adc_scan(batches):
        cb = bc_cb.value
        ids, lut_v = bc_lut.value
        nq = len(ids)
        for pdf in batches:
            V = np.array(list(pdf["v"]), dtype=np.float64)  # (B, d)
            B = V.shape[0]
            if not B:
                continue
            sub = V.reshape(B, m, ds)
            # encode: argmin L2 per subspace -> (B, m) codes
            d2 = (
                (sub[:, :, None, :] - cb[None, :, :, :]) ** 2
            ).sum(-1)
            codes = d2.argmin(-1)
            out_id, out_q, out_adc = [], [], []
            rng = np.arange(m)
            for qi in range(nq):
                adc = lut_v[qi][rng, codes].sum(1)  # (B,)
                out_id.append(pdf["neighbor_id"].to_numpy())
                out_q.append(np.full(B, ids[qi], dtype=np.int64))
                out_adc.append(adc)
            yield pd.DataFrame(
                {
                    "neighbor_id": np.concatenate(out_id),
                    "query_id": np.concatenate(out_q),
                    "adc": np.concatenate(out_adc),
                }
            )

    scanned = normed.mapInPandas(
        adc_scan, schema="neighbor_id long, query_id long, adc double"
    )
    w_c = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    candidates = (
        scanned.withColumn("crank", F.row_number().over(w_c))
        .filter(F.col("crank") <= refine)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank: only refine·|queries| rows reach this join
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    rescored = (
        candidates.join(c_vecs, "neighbor_id")
        .join(F.broadcast(q_vecs), "query_id")
        .withColumn(
            "cos", F.round(cosine_batch(F.col("q_vec"), F.col("c_vec")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_topk_at_rest(
    spark,
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    nprobe: int = 4,
    dim: int | None = None,
    model: tuple | None = None,
    reuse_store: bool = False,
) -> DataFrame:
    """IVF serving from a CELL-PARTITIONED store — the at-rest layout the
    in-memory ``ivf_topk`` docstring promises, made concrete: the indexed
    corpus is written ``partitionBy("cell")`` and the probe read carries a
    ``cell IN (...)`` predicate, so the scan opens only the probed cells'
    directories (PartitionFilters — asserted in tests/test_plans.py).
    nprobe/n_cells is thus a *bytes-read* fraction, not just a
    candidate-count fraction — the property that makes IVF pay at 100 TB.

    Same centroids, probes, scoring, and tie rules as ``ivf_topk``; the
    two must return identical rows (pinned in tests/test_llm.py). The
    probed-cell list is collected — ≤ n_cells integers, model-sized —
    because a partition-pruning predicate must be a literal at plan time.

    ``model`` is an optional prefitted ``(cells, mat)`` pair (the same
    shape ``ivf_topk`` takes); ``reuse_store=True`` skips the index
    write when the store is already committed (``_SUCCESS`` present) —
    the caller owns invalidation, e.g. by keying ``path`` on a corpus
    content fingerprint. Together they make repeat calls probe-only:
    index build is a one-time cost in production serving.
    """
    import os as _os

    cells, mat = model if model is not None else collect_centroid_model(
        ivf_fit_centroids(corpus, n_cells, id_col, vec_col, dim=dim)
    )
    centroids = _centroid_df(spark, cells, mat)
    if not (reuse_store and _os.path.exists(_os.path.join(path, "_SUCCESS"))):
        indexed = assign_cells_projection(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("c_vec"),
                F.col(vec_col).alias("v"),
            ),
            cells,
            mat,
            normalize=True,
        ).drop("v")
        indexed.write.mode("overwrite").partitionBy("cell").parquet(path)

    q_normed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm_vec(F.col(vec_col)).alias("qn"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("q_dot"), F.col("cell")
    )
    probes = (
        q_normed.crossJoin(F.broadcast(centroids))
        .withColumn("q_dot", dot_batch(F.col("qn"), F.col("centroid")))
        .withColumn("probe_rank", F.row_number().over(w_probe))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    probe_cells = sorted(
        r.cell for r in probes.select("cell").distinct().collect()
    )  # ≤ n_cells ints — the partition-pruning literal
    back = spark.read.parquet(path).filter(F.col("cell").isin(probe_cells))
    scored = back.join(F.broadcast(probes), "cell").withColumn(
        "cos", F.round(cosine_batch(F.col("q_vec"), F.col("c_vec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# Incremental IVF maintenance (r9): the at-rest cell store follows the
# table. The centroid MODEL is frozen between refits (the production
# IVF pattern: continuous upsert, periodic refit); with a frozen model
# cell assignment is deterministic, so an incrementally maintained
# store equals a same-model rebuild exactly — the testable twin.
# ---------------------------------------------------------------------------


def ivf_model_save(path: str, cells, mat) -> None:
    """Persist the (cells, centroid-matrix) model beside the cell store
    as ``_model.json`` (atomic tmp+rename) so every later sync/serve
    uses the SAME frozen centroids."""
    import json as _json
    import os as _os
    import uuid as _uuid

    body = {
        "cells": [int(c) for c in cells],
        "mat": [[float(x) for x in row] for row in mat],
    }
    _os.makedirs(path, exist_ok=True)
    tmp = _os.path.join(path, f".tmp-{_uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        _json.dump(body, f)
    _os.replace(tmp, _os.path.join(path, "_model.json"))


def ivf_model_load(path: str):
    import json as _json
    import os as _os

    import numpy as np

    with open(_os.path.join(path, "_model.json")) as f:
        d = _json.load(f)
    return (
        np.array(d["cells"], dtype=np.int32),
        np.array(d["mat"], dtype=np.float64),
    )


def ivf_build_store(
    corpus: DataFrame,
    path: str,
    model,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Write the cell-partitioned at-rest index for ``corpus`` under a
    FROZEN model and persist the model beside it — the build half
    ``ivf_topk_at_rest`` runs inline, split out so incremental sync can
    bootstrap once and upsert forever."""
    cells, mat = model
    indexed = assign_cells_projection(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.col(vec_col).alias("v"),
        ),
        cells,
        mat,
        normalize=True,
    ).drop("v")
    indexed.write.mode("overwrite").partitionBy("cell").parquet(path)
    ivf_model_save(path, cells, mat)


def ivf_upsert_store(
    spark,
    upserts: DataFrame,
    delete_ids: DataFrame,
    path: str,
    model=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    attr_cols: list[str] | None = None,
) -> list[int]:
    """Apply UPSERTS (id, vec) and DELETES (id) to a committed IVF cell
    store, rewriting ONLY the affected cells: an upserted vector's cell
    comes from the frozen model (one Arrow projection — no shuffle), a
    deleted id's cell from an id-column semi-join against the store
    (column-pruned scan; a 100 TB deployment bounds it further with an
    id-range/Bloom sidecar per cell — the same planning trick as
    manifest stats). Untouched cell partitions are never rewritten
    (dynamic partition overwrite); cells emptied by deletes drop their
    directory explicitly, since dynamic overwrite leaves absent
    partitions in place. Returns the affected cell ids (bounded
    ≤ n_cells). With the same frozen model, the maintained store equals
    a from-scratch ``ivf_build_store`` of the final corpus — pinned by
    tests and the ``ann_ivf_incremental`` query."""
    import os as _os
    import shutil as _shutil

    cells, mat = model if model is not None else ivf_model_load(path)
    attrs = list(attr_cols or [])  # filtered stores carry these inline
    up = assign_cells_projection(
        upserts.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            *[F.col(c) for c in attrs],
            F.col(vec_col).alias("v"),
        ),
        cells,
        mat,
        normalize=True,
    ).drop("v")
    # one eager materialization of the churn-sized encoded upserts: the
    # relation feeds cell discovery, the merge anti-join probe and the
    # union — without it the Arrow assign projection re-runs per action
    up = up.localCheckpoint(eager=True)
    dels = delete_ids.select(
        F.col(id_col).alias("neighbor_id")
    ).distinct()
    back = spark.read.parquet(path)
    # affected = NEW cells of upserts ∪ CURRENT cells of every touched
    # id (deletes AND upserts): an UPDATE whose re-embedded vector
    # lands in a different frozen-centroid cell must rewrite its OLD
    # cell too, or the stale row survives there and the id serves from
    # two cells (r10 ADVICE #2). Both cell sets ride ONE union-distinct
    # job (bounded ≤ 2·n_cells rows) — they were two separate collects.
    touched = dels.unionByName(up.select("neighbor_id")).distinct()
    affected = sorted(
        int(r["cell"])
        for r in up.select("cell")
        .unionByName(
            back.join(touched, "neighbor_id", "left_semi").select("cell")
        )
        .distinct()
        .collect()
    )
    if not affected:
        return []
    sub = back.filter(F.col("cell").isin(affected))
    keep = ["neighbor_id", "c_vec", *attrs, "cell"]
    merged = (
        sub.join(up.select("neighbor_id"), "neighbor_id", "left_anti")
        .join(dels, "neighbor_id", "left_anti")
        .select(*keep)
        .unionByName(up.select(*keep))
    )
    counts = {
        int(r["cell"]): r["n"]
        for r in merged.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # ≤ n_cells rows — bounded
    }
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell")
        .parquet(path)
    )
    for c in affected:
        if counts.get(c, 0) == 0:
            _shutil.rmtree(
                _os.path.join(path, f"cell={c}"), ignore_errors=True
            )
    return affected


def ivf_sync_from_tail(
    spark,
    table_root: str,
    index_path: str,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_rewrite: str = "fail",
    seed_hash=None,
) -> None:
    """Keep the IVF cell store current against a snapshot table via its
    CDC tail — the IVF sibling of ``hnsw_sync_from_tail``: the first
    batch on a fresh index FITS the centroid model from the initial
    snapshot and builds the store (model persisted beside it); every
    later batch reduces to per-key net effects by ``_version`` and
    upserts under the frozen model. Checkpoint at the sibling
    ``{index_path}_ckpt`` path (the bootstrap overwrite would eat an
    in-store checkpoint). ``on_rewrite``: what a source-table
    compaction/restore does to the sync — ``'fail'`` (default) raises,
    ``'skip'`` skips layout-only rewrites (and restores — compaction-
    only tables), ``'rebuild'`` wipes store+checkpoint and re-fits from
    the current snapshot; see :mod:`crocus_spark.operators._tail_sync`."""
    import os as _os

    from crocus_spark.operators._tail_sync import (
        net_effects,
        run_tail_sync,
    )

    def apply(batch_df, _batch_id):
        ups, dels = net_effects(batch_df, id_col, vec_col)
        if not _os.path.exists(_os.path.join(index_path, "_model.json")):
            model = collect_centroid_model(
                ivf_fit_centroids(
                    ups, n_cells, id_col, vec_col, seed_hash=seed_hash
                )
            )
            ivf_build_store(
                ups, index_path, model, id_col=id_col, vec_col=vec_col
            )
        else:
            ivf_upsert_store(
                spark, ups, dels, index_path,
                id_col=id_col, vec_col=vec_col,
            )

    run_tail_sync(spark, table_root, index_path, apply, on_rewrite)


# ---------------------------------------------------------------------------
# PQ at-rest store with incremental upkeep (r9 verdict task #6)
# ---------------------------------------------------------------------------


def pq_model_save(path: str, codebook) -> None:
    """Persist the PQ codebook beside the store as ``_model.json``
    (floats repr-round-trip exactly, same contract as ivf_model_save)."""
    import json as _json
    import os as _os

    m, ksub, ds = codebook.shape
    tmp = _os.path.join(path, "_model.json.tmp.%d" % _os.getpid())
    _os.makedirs(path, exist_ok=True)
    with open(tmp, "w") as f:
        _json.dump(
            {
                "m": int(m),
                "ksub": int(ksub),
                "ds": int(ds),
                "codebook": [
                    [[float(x) for x in c] for c in s] for s in codebook
                ],
            },
            f,
        )
    _os.replace(tmp, _os.path.join(path, "_model.json"))


def pq_model_load(path: str):
    """Load the frozen codebook written by :func:`pq_model_save`."""
    import json as _json
    import os as _os

    import numpy as _np

    with open(_os.path.join(path, "_model.json")) as f:
        d = _json.load(f)
    cb = _np.array(d["codebook"], dtype=_np.float64)
    assert cb.shape == (d["m"], d["ksub"], d["ds"])
    return cb


def pq_encode_batch(V, codebook):
    """(B, d) float64 → (B, m) uint8 nearest-subspace-centroid codes —
    the ONE encode path shared by the in-memory scan, the store build
    and the incremental upsert, so same codebook + same vector always
    yields the same code (argmin ties break to the lowest index)."""
    import numpy as _np

    m, ksub, ds = codebook.shape
    sub = V.reshape(V.shape[0], m, ds)
    d2 = ((sub[:, :, None, :] - codebook[None, :, :, :]) ** 2).sum(-1)
    return d2.argmin(-1).astype(_np.uint8)


def _pq_encoded(corpus: DataFrame, codebook, n_cells: int,
                id_col: str, vec_col: str) -> DataFrame:
    """(neighbor_id, c_vec raw, code binary, cell) — cell is the
    deterministic hash shard (pmod(xxhash64(id), n_cells), the HNSW
    shard rule): PQ has no centroid geometry to partition by, the cells
    exist so UPKEEP rewrites only churn-affected directories."""
    import pandas as pd  # noqa: PLC0415

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(codebook)

    def fn(batches):
        import numpy as np

        cb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf["_nv"]), dtype=np.float64)
            codes = pq_encode_batch(V, cb)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"],
                    "c_vec": pdf["c_vec"],
                    "code": [c.tobytes() for c in codes],
                    "cell": pdf["cell"],
                }
            )

    prepared = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm_vec(F.col(vec_col)).alias("_nv"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_cells))
        .cast("int")
        .alias("cell"),
    )
    return prepared.mapInPandas(
        fn,
        "neighbor_id long, c_vec array<float>, code binary, cell int",
    )


def pq_build_store(
    corpus: DataFrame,
    path: str,
    codebook,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Write the cell-partitioned PQ code store (codes + raw vectors for
    the exact re-rank) under a FROZEN codebook, model persisted beside
    it — the build half of the maintained index."""
    _pq_encoded(corpus, codebook, n_cells, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)
    pq_model_save(path, codebook)


def pq_upsert_store(
    spark,
    upserts: DataFrame,
    delete_ids: DataFrame,
    path: str,
    codebook=None,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[int]:
    """Apply upserts/deletes to a committed PQ store rewriting ONLY the
    churn-affected cells — the ``ivf_upsert_store`` dynamic-partition-
    overwrite pattern over hash cells: an upserted vector's cell is the
    deterministic id hash (no store read), a deleted id's cell comes
    from a column-pruned semi-join; untouched cell directories keep
    byte-identical files, emptied cells drop explicitly. With the same
    frozen codebook the maintained store EQUALS a from-scratch
    ``pq_build_store`` of the final corpus (same encode path ⇒ same
    codes), pinned by the ``ann_pq_incremental`` query."""
    import os as _os
    import shutil as _shutil

    cb = codebook if codebook is not None else pq_model_load(path)
    # churn-sized; materialized once — feeds cell discovery, the merge
    # probe and the union (the PQ encode would otherwise run per action)
    up = _pq_encoded(upserts, cb, n_cells, id_col, vec_col).localCheckpoint(
        eager=True
    )
    dels = delete_ids.select(
        F.col(id_col).alias("neighbor_id")
    ).distinct()
    back = spark.read.parquet(path)
    # hash cells never move on update, so affected = hash cells of
    # upserts ∪ current cells of deleted ids — ONE union-distinct job
    affected = sorted(
        int(r["cell"])
        for r in up.select("cell")
        .unionByName(
            back.join(dels, "neighbor_id", "left_semi").select("cell")
        )
        .distinct()
        .collect()
    )
    if not affected:
        return []
    sub = back.filter(F.col("cell").isin(affected))
    merged = (
        sub.join(up.select("neighbor_id"), "neighbor_id", "left_anti")
        .join(dels, "neighbor_id", "left_anti")
        .select("neighbor_id", "c_vec", "code", "cell")
        .unionByName(up.select("neighbor_id", "c_vec", "code", "cell"))
    )
    counts = {
        int(r["cell"]): r["n"]
        for r in merged.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # ≤ n_cells rows — bounded
    }
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell")
        .parquet(path)
    )
    for c in affected:
        if counts.get(c, 0) == 0:
            _shutil.rmtree(
                _os.path.join(path, f"cell={c}"), ignore_errors=True
            )
    return affected


def pq_topk_at_rest(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    refine: int = 50,
    codebook=None,
) -> DataFrame:
    """Serve approximate top-k from a committed PQ store: the ADC scan
    reads the STORED codes (no re-encode — the 32× memory cut is now
    also a compute cut), top ``refine`` candidates re-rank exactly
    against the stored raw vectors under the brute-force cosine/rounding
    contract. Same LUT/score arithmetic as ``pq_topk``, so two stores
    with identical codes serve identical rows."""
    import numpy as np
    import pandas as pd  # noqa: PLC0415

    cb = codebook if codebook is not None else pq_model_load(path)
    m, ksub, ds = cb.shape
    q_rows = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
            _norm_vec(F.col("embedding")).alias("qn"),
        )
        .orderBy("query_id")
        .collect()
    )
    q_ids = [r.query_id for r in q_rows]
    Q = np.array([r.qn for r in q_rows], dtype=np.float64)
    lut = np.einsum("qsd,skd->qsk", Q.reshape(len(q_ids), m, ds), cb)
    bc_lut = spark.sparkContext.broadcast((q_ids, lut))

    def adc_scan(batches):
        ids, lut_v = bc_lut.value
        rng = np.arange(m)
        for pdf in batches:
            B = len(pdf)
            if not B:
                continue
            codes = np.frombuffer(
                b"".join(pdf["code"]), dtype=np.uint8
            ).reshape(B, m)
            out_id, out_q, out_adc = [], [], []
            for qi in range(len(ids)):
                out_id.append(pdf["neighbor_id"].to_numpy())
                out_q.append(np.full(B, ids[qi], dtype=np.int64))
                out_adc.append(lut_v[qi][rng, codes].sum(1))
            yield pd.DataFrame(
                {
                    "neighbor_id": np.concatenate(out_id),
                    "query_id": np.concatenate(out_q),
                    "adc": np.concatenate(out_adc),
                }
            )

    store = spark.read.parquet(path)
    scanned = store.select("neighbor_id", "code").mapInPandas(
        adc_scan, schema="neighbor_id long, query_id long, adc double"
    )
    w_c = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    candidates = (
        scanned.withColumn("crank", F.row_number().over(w_c))
        .filter(F.col("crank") <= refine)
        .select("query_id", "neighbor_id")
    )
    c_vecs = store.select("neighbor_id", F.col("c_vec"))
    q_vecs = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
    )
    rescored = (
        candidates.join(c_vecs, "neighbor_id")
        .join(F.broadcast(q_vecs), "query_id")
        .withColumn(
            "cos", F.round(cosine_batch(F.col("q_vec"), F.col("c_vec")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def pq_sync_from_tail(
    spark,
    table_root: str,
    index_path: str,
    m: int = 16,
    ksub: int = 32,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_rewrite: str = "fail",
) -> None:
    """Keep the PQ code store current against a snapshot table via its
    CDC tail — the PQ sibling of ``ivf_sync_from_tail``: the first
    batch on a fresh index FITS the codebook from the initial snapshot
    (persisted beside the store — frozen thereafter, the FAISS
    train-once cadence); every later batch reduces to per-key net
    effects and re-encodes/rewrites only churn-affected hash cells.
    Checkpoint at the sibling ``{index_path}_ckpt`` path; ``on_rewrite``
    as in :mod:`crocus_spark.operators._tail_sync`."""
    import os as _os

    from crocus_spark.operators._tail_sync import (
        net_effects,
        run_tail_sync,
    )

    def apply(batch_df, _batch_id):
        ups, dels = net_effects(batch_df, id_col, vec_col)
        if not _os.path.exists(_os.path.join(index_path, "_model.json")):
            cb = pq_fit_codebook(
                ups, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
            )
            pq_build_store(
                ups, index_path, cb, n_cells=n_cells,
                id_col=id_col, vec_col=vec_col,
            )
        else:
            pq_upsert_store(
                spark, ups, dels, index_path, n_cells=n_cells,
                id_col=id_col, vec_col=vec_col,
            )

    run_tail_sync(spark, table_root, index_path, apply, on_rewrite)


# ---------------------------------------------------------------------------
# IVFPQ: coarse quantizer + PQ codes in one store (Jégou et al. TPAMI'11
# §IV — the FAISS IVFPQ layout). The serve cost model at 100 TB is the
# PRODUCT of the two cuts: a probe opens nprobe/n_cells of the cell
# directories (partition-pruned scan) and reads 8-byte codes instead of
# 256-byte vectors inside them (ADC), with the exact re-rank touching
# only refine·|queries| raw vectors.
# ---------------------------------------------------------------------------


def _ivfpq_encoded(
    corpus: DataFrame, cells, mat, codebook,
    id_col: str, vec_col: str,
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """(neighbor_id, c_vec raw, code binary, [attrs...,] cell) in ONE
    Arrow pass: normalize (the shared dim-ordered fold), coarse-assign
    to the frozen IVF centroid (argmax dot, first-max ties), PQ-encode
    the normalized vector under the frozen codebook. ``attr_cols`` ride
    through untouched — the filtered-serve store shape."""
    import pandas as pd  # noqa: PLC0415

    spark = corpus.sparkSession
    attrs = list(attr_cols or [])
    attr_schema = ""
    if attrs:
        sub = corpus.select(*attrs).schema
        attr_schema = "".join(
            f", {f.name} {f.dataType.simpleString()}" for f in sub.fields
        )
    bc = spark.sparkContext.broadcast((cells, mat, codebook))

    def fn(batches):
        import numpy as np

        cl, m_, cb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
            acc = np.zeros(V.shape[0])
            for i in range(V.shape[1]):
                x = V[:, i]
                acc = acc + x * x
            Vn = V / np.sqrt(acc)[:, None]
            D = np.zeros((Vn.shape[0], m_.shape[0]))
            for i in range(Vn.shape[1]):
                D = D + Vn[:, i : i + 1] * m_[None, :, i]
            codes = pq_encode_batch(Vn, cb)
            out = {
                "neighbor_id": pdf["neighbor_id"],
                "c_vec": pdf["c_vec"],
                "code": [c.tobytes() for c in codes],
            }
            for a in attrs:
                out[a] = pdf[a]
            out["cell"] = cl[np.argmax(D, axis=1)].astype("int32")
            yield pd.DataFrame(out)

    prepared = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        *[F.col(c) for c in attrs],
        F.col(vec_col).alias("_v"),
    )
    return prepared.mapInPandas(
        fn,
        "neighbor_id long, c_vec array<float>, code binary"
        + attr_schema + ", cell int",
    )


def ivfpq_build_store(
    corpus: DataFrame,
    path: str,
    model,
    codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    attr_cols: list[str] | None = None,
) -> None:
    """Write the IVFPQ store: PQ codes + raw vectors partitioned by the
    frozen coarse cell; both frozen models persisted beside it
    (``_model.json`` = IVF centroids, ``_pq_model.json`` = codebook)."""
    import json as _json
    import os as _os

    cells, mat = model
    _ivfpq_encoded(
        corpus, cells, mat, codebook, id_col, vec_col, attr_cols
    ).write.mode("overwrite").partitionBy("cell").parquet(path)
    ivf_model_save(path, cells, mat)
    m, ksub, ds = codebook.shape
    tmp = _os.path.join(path, "_pq_model.json.tmp.%d" % _os.getpid())
    with open(tmp, "w") as f:
        _json.dump(
            {
                "m": int(m), "ksub": int(ksub), "ds": int(ds),
                "codebook": [
                    [[float(x) for x in c] for c in s] for s in codebook
                ],
            },
            f,
        )
    _os.replace(tmp, _os.path.join(path, "_pq_model.json"))


def ivfpq_model_load(path: str):
    """(ivf (cells, mat), pq codebook) frozen beside an IVFPQ store."""
    import json as _json
    import os as _os

    import numpy as _np

    with open(_os.path.join(path, "_pq_model.json")) as f:
        d = _json.load(f)
    cb = _np.array(d["codebook"], dtype=_np.float64)
    return ivf_model_load(path), cb


def ivfpq_topk_at_rest(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 4,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate: str | None = None,
) -> DataFrame:
    """Serve approximate top-k from a committed IVFPQ store: per-query
    nprobe coarse cells (same ranking/ties as ``ivf_topk``), an ADC
    scan over ONLY the probed cells' stored codes (the partition filter
    makes nprobe/n_cells a bytes-read fraction AND each read byte is a
    code, not a float), exact cosine re-rank of the top ``refine``
    candidates against the stored raw vectors."""
    import numpy as np
    import pandas as pd  # noqa: PLC0415

    (cells, mat), cb = ivfpq_model_load(path)
    m, ksub, ds = cb.shape
    centroids = _centroid_df(spark, cells, mat)
    q_normed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm_vec(F.col(vec_col)).alias("qn"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("q_dot"), F.col("cell")
    )
    probes = (
        q_normed.crossJoin(F.broadcast(centroids))
        .withColumn("q_dot", dot_batch(F.col("qn"), F.col("centroid")))
        .withColumn("probe_rank", F.row_number().over(w_probe))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "qn", "cell")
    )
    plist = probes.select("query_id", "qn", "cell").collect()
    probe_cells = sorted({r.cell for r in plist})  # pruning literal
    q_rows = sorted({(r.query_id, tuple(r.qn)) for r in plist})
    q_ids = [q for q, _ in q_rows]
    Q = np.array([list(v) for _, v in q_rows], dtype=np.float64)
    lut = np.einsum("qsd,skd->qsk", Q.reshape(len(q_ids), m, ds), cb)
    cell_of = {}
    for r in plist:
        cell_of.setdefault(int(r.cell), set()).add(r.query_id)
    bc = spark.sparkContext.broadcast((q_ids, lut, cell_of))

    # invert cell→queries to query→cells once (bounded: ≤ nprobe ints
    # per query), so the scan masks with a vectorized np.isin instead
    # of a per-row Python membership test
    cells_of_q: dict = {}
    for c, qs in cell_of.items():
        for q in qs:
            cells_of_q.setdefault(q, []).append(c)
    bc_cells = spark.sparkContext.broadcast(cells_of_q)

    def adc_scan(batches):
        ids, lut_v, _cells_map = bc.value
        pos = {q: i for i, q in enumerate(ids)}
        rng = np.arange(m)
        for pdf in batches:
            B = len(pdf)
            if not B:
                continue
            codes = np.frombuffer(
                b"".join(pdf["code"]), dtype=np.uint8
            ).reshape(B, m)
            cellcol = pdf["cell"].to_numpy()
            out_id, out_q, out_adc = [], [], []
            # score each query only against ITS probed cells
            for qid in ids:
                mask = np.isin(
                    cellcol, bc_cells.value.get(qid, [])
                )
                if not mask.any():
                    continue
                sub = codes[mask]
                out_id.append(pdf["neighbor_id"].to_numpy()[mask])
                out_q.append(np.full(sub.shape[0], qid, dtype=np.int64))
                out_adc.append(lut_v[pos[qid]][rng, sub].sum(1))
            if not out_id:
                continue
            yield pd.DataFrame(
                {
                    "neighbor_id": np.concatenate(out_id),
                    "query_id": np.concatenate(out_q),
                    "adc": np.concatenate(out_adc),
                }
            )

    store = spark.read.parquet(path).filter(
        F.col("cell").isin(probe_cells)
    )
    if predicate is not None:
        # filtered serve (r11): the attribute predicate prunes rows
        # BEFORE any ADC work — pushed into the probed cells' parquet
        # scan, so non-matching codes are never read or scored
        store = store.filter(F.expr(predicate))
    scanned = store.select("neighbor_id", "code", "cell").mapInPandas(
        adc_scan, schema="neighbor_id long, query_id long, adc double"
    )
    w_c = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    candidates = (
        scanned.withColumn("crank", F.row_number().over(w_c))
        .filter(F.col("crank") <= refine)
        .select("query_id", "neighbor_id")
    )
    c_vecs = store.select("neighbor_id", "c_vec")
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    rescored = (
        candidates.join(c_vecs, "neighbor_id")
        .join(F.broadcast(q_vecs), "query_id")
        .withColumn(
            "cos", F.round(cosine_batch(F.col("q_vec"), F.col("c_vec")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivfpq_upsert_store(
    spark,
    upserts: DataFrame,
    delete_ids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[int]:
    """Apply upserts/deletes to a committed IVFPQ store under BOTH
    frozen models (coarse centroids + codebook), rewriting only the
    churn-affected coarse cells — the same dynamic-partition-overwrite
    merge as ``pq_upsert_store`` with the cell coming from the frozen
    centroid assignment instead of the id hash."""
    import os as _os
    import shutil as _shutil

    (cells, mat), cb = ivfpq_model_load(path)
    # churn-sized; materialized once — the double-encode (coarse assign
    # + PQ codes) would otherwise re-run for every downstream action
    up = _ivfpq_encoded(
        upserts, cells, mat, cb, id_col, vec_col
    ).localCheckpoint(eager=True)
    dels = delete_ids.select(
        F.col(id_col).alias("neighbor_id")
    ).distinct()
    back = spark.read.parquet(path)
    # affected must include the CURRENT cells of upserted ids too — an
    # UPDATE that moves an id to a different frozen-centroid cell has
    # to rewrite (and anti-join out of) its old cell (r10 ADVICE #2).
    # Both cell sets ride ONE union-distinct job (bounded ≤ 2·n_cells).
    touched = dels.unionByName(up.select("neighbor_id")).distinct()
    affected = sorted(
        int(r["cell"])
        for r in up.select("cell")
        .unionByName(
            back.join(touched, "neighbor_id", "left_semi").select("cell")
        )
        .distinct()
        .collect()
    )
    if not affected:
        return []
    sub = back.filter(F.col("cell").isin(affected))
    merged = (
        sub.join(up.select("neighbor_id"), "neighbor_id", "left_anti")
        .join(dels, "neighbor_id", "left_anti")
        .select("neighbor_id", "c_vec", "code", "cell")
        .unionByName(up.select("neighbor_id", "c_vec", "code", "cell"))
    )
    counts = {
        int(r["cell"]): r["n"]
        for r in merged.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # ≤ n_cells rows — bounded
    }
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell")
        .parquet(path)
    )
    for c in affected:
        if counts.get(c, 0) == 0:
            _shutil.rmtree(
                _os.path.join(path, f"cell={c}"), ignore_errors=True
            )
    return affected


def ivfpq_sync_from_tail(
    spark,
    table_root: str,
    index_path: str,
    n_cells: int = 8,
    m: int = 16,
    ksub: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_rewrite: str = "fail",
    seed_hash=None,
) -> None:
    """Keep the composed IVFPQ store current against a snapshot table
    via its CDC tail: the first batch on a fresh index fits BOTH frozen
    models from the initial snapshot (coarse centroids + PQ codebook,
    persisted beside the store); later batches re-encode per-key net
    effects and rewrite only churn-affected coarse cells. Checkpoint at
    ``{index_path}_ckpt``; ``on_rewrite`` as in operators/_tail_sync."""
    import os as _os

    from crocus_spark.operators._tail_sync import (
        net_effects,
        run_tail_sync,
    )

    def apply(batch_df, _batch_id):
        ups, dels = net_effects(batch_df, id_col, vec_col)
        if not _os.path.exists(_os.path.join(index_path, "_pq_model.json")):
            model = collect_centroid_model(
                ivf_fit_centroids(
                    ups, n_cells, id_col, vec_col, seed_hash=seed_hash
                )
            )
            cb = pq_fit_codebook(
                ups, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
            )
            ivfpq_build_store(
                ups, index_path, model, cb, id_col=id_col, vec_col=vec_col
            )
        else:
            ivfpq_upsert_store(
                spark, ups, dels, index_path,
                id_col=id_col, vec_col=vec_col,
            )

    run_tail_sync(spark, table_root, index_path, apply, on_rewrite)
