"""Geospatial operators — haversine distance, grid-cell blocking.

No OSS-Spark ST_* library is assumed (none ships with pyspark): geodesic
distance is plain column arithmetic (JVM-side, codegen'd), and the scale
strategy for distance JOINS is integer grid-cell blocking — the spatial
analog of the LSH band trick used by the dedup family: candidates come
from a cell equi-join (shuffle on cell id), exactness from re-checking the
true distance on the tiny candidate set. A cross join never appears.

Coordinates are synthesized deterministically from integer keys (the
fixtures carry no lat/lon): both engines derive byte-identical doubles, so
the oracle comparison stays exact. Transcendental (sin/asin/cos) libm
differences between engines sit ~1e-10 below the 1e-6 rounding grain used
for outputs and ranking.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crocus_spark.io import load
from crocus_spark.queries import register

EARTH_R_KM = 6371.0

# lat in [-63, +63], lon in [-177, +177] via integer arithmetic on the key —
# identical expression text in the SQL oracle below.
_LAT = "(CAST((({k}) * 37) % 127 AS DOUBLE) - 63.0)"
_LON = "((CAST((({k}) * 73) % 178 AS DOUBLE) - 89.0) * 2.0 - 0.5)"


def _lat(k):
    return ((k * 37) % 127).cast("double") - 63.0


def _lon(k):
    return (((k * 73) % 178).cast("double") - 89.0) * 2.0 - 0.5


def _haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km, pure built-in math functions."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rl1) * F.cos(rl2) * F.sin(
        dlon
    ) * F.sin(dlon)
    return 2.0 * EARTH_R_KM * F.asin(F.sqrt(a))


_HAVERSINE_SQL = (
    "2.0 * 6371.0 * asin(sqrt("
    " sin(radians(({lat2}) - ({lat1})) / 2.0)"
    "  * sin(radians(({lat2}) - ({lat1})) / 2.0)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    "  * sin(radians(({lon2}) - ({lon1})) / 2.0)"
    "  * sin(radians(({lon2}) - ({lon1})) / 2.0)))"
)


@register(
    "geo_haversine_knn",
    oracle=f"""
    WITH q AS (
      SELECT c_custkey AS query_id,
             {_LAT.format(k="c_custkey")} AS qlat,
             {_LON.format(k="c_custkey")} AS qlon
      FROM customer WHERE c_custkey < 10
    ), s AS (
      SELECT s_suppkey AS supp_id,
             {_LAT.format(k="s_suppkey + 1000")} AS slat,
             {_LON.format(k="s_suppkey + 1000")} AS slon
      FROM supplier
    ), scored AS (
      SELECT query_id, supp_id,
             round({_HAVERSINE_SQL.format(
                 lat1="qlat", lon1="qlon", lat2="slat", lon2="slon")},
                   6) AS dist_km
      FROM q CROSS JOIN s
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY dist_km, supp_id) AS rank
      FROM scored
    )
    SELECT query_id, supp_id, dist_km, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    tags=("geo", "similarity"),
)
def geo_haversine_knn(spark, sf_dir):
    """k-nearest suppliers by great-circle distance for 10 query points —
    the geodesic twin of `ann_bruteforce_topk`. The 10-row query side
    broadcasts; distance is whole-stage-codegen column math (no UDF);
    per-query top-5 is a rank window over the rounded distance with an id
    tie-break, so ordering is engine-portable. At corpus scale the same
    query drops the crossJoin for the grid-blocked candidates of
    `geo_grid_distance_join`."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 10)
    supp = load(spark, sf_dir, "supplier")
    q = cust.select(
        F.col("c_custkey").alias("query_id"),
        _lat(F.col("c_custkey")).alias("qlat"),
        _lon(F.col("c_custkey")).alias("qlon"),
    )
    s = supp.select(
        F.col("s_suppkey").alias("supp_id"),
        _lat(F.col("s_suppkey") + 1000).alias("slat"),
        _lon(F.col("s_suppkey") + 1000).alias("slon"),
    )
    scored = s.crossJoin(F.broadcast(q)).select(
        "query_id",
        "supp_id",
        F.round(
            _haversine_km(
                F.col("qlat"), F.col("qlon"), F.col("slat"), F.col("slon")
            ),
            6,
        ).alias("dist_km"),
    )
    w = Window.partitionBy("query_id").orderBy("dist_km", "supp_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


@register(
    "geo_grid_distance_join",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_LAT.format(k="c_custkey")} AS clat,
             {_LON.format(k="c_custkey")} AS clon
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             {_LAT.format(k="s_suppkey + 1000")} AS slat,
             {_LON.format(k="s_suppkey + 1000")} AS slon
      FROM supplier
    ), pairs AS (
      SELECT c_custkey, s_suppkey,
             round({_HAVERSINE_SQL.format(
                 lat1="clat", lon1="clon", lat2="slat", lon2="slon")},
                   6) AS dist_km
      FROM c CROSS JOIN s
    )
    SELECT c_custkey,
           COUNT(*) AS n_within,
           MIN(dist_km) AS nearest_km
    FROM pairs
    WHERE dist_km <= 500.0
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    tags=("geo", "join", "scale"),
)
def geo_grid_distance_join(spark, sf_dir):
    """Distance join ("all supplier sites within 500 km of each customer")
    via GRID-CELL BLOCKING — the oracle states the O(n·m) cross-join
    truth; the engine never builds it. Each point maps to an integer
    (lat, lon) cell of ~500 km pitch; each customer probes its 3×3 cell
    neighborhood (a 9-row map-side explode — longitude pitch is scaled by
    sec(lat) so 500 km never spans more than one cell eastward); the join
    is a plain equi-join on cell id, and only that candidate set pays the
    exact haversine check. Candidates shuffle by cell — spatial locality
    IS the partition key — so cost scales with occupied-cell density,
    not with |left|×|right|. The exact re-check makes blocking
    semantically invisible (identical to the oracle's full scan)."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat(F.col("c_custkey")).alias("clat"),
        _lon(F.col("c_custkey")).alias("clon"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _lat(F.col("s_suppkey") + 1000).alias("slat"),
        _lon(F.col("s_suppkey") + 1000).alias("slon"),
    )
    # Latitude bands of 4.5° (≈ 500.9 km). Each band divides the FULL
    # circle of longitude into n equal cells, n = floor(360 / pitch) with
    # pitch = 4.5° / cos(most poleward edge of the band OR its poleward
    # neighbor) — so every cell has uniform width ≥ pitch (no narrow
    # remainder cell at the seam) and the cell index wraps at ±180° via
    # pmod (antimeridian pairs share neighboring cells). Cell identity is
    # (band, lon cell IN THAT BAND'S GRID) — scaling by each point's own
    # cos(lat) would drift cells apart across a band boundary. A customer
    # probes, for each of the 3 neighboring bands, the lon cell computed
    # in that band's grid ±2 (mod n): ±1 is marginally insufficient
    # because a 500 km great-circle arc between points in adjacent bands
    # can span slightly more than one cell width — ±2 gives headroom up
    # to a full 2× the guaranteed width. 15 candidate cells per customer,
    # still O(1) map-side fan-out.
    def _band(lat):
        return F.floor(lat / 4.5)

    def _ncells(band):
        # poleward edge across band AND poleward neighbor; clamp at 89°
        # so polar bands collapse to n=1 instead of dividing by cos(90°).
        edge = F.least(
            F.greatest(
                F.abs(band * 4.5),
                F.abs((band + 1) * 4.5),
                F.abs((band - 1) * 4.5),
                F.abs((band + 2) * 4.5),
            ),
            F.lit(89.0),
        )
        pitch = 4.5 / F.cos(F.radians(edge))
        return F.greatest(F.lit(1).cast("long"), F.floor(360.0 / pitch))

    def _cell(lon, n):
        return F.pmod(F.floor((lon + 180.0) * n.cast("double") / 360.0), n)

    sband = _band(F.col("slat"))
    s_cells = supp.select(
        "s_suppkey",
        "slat",
        "slon",
        sband.alias("band"),
        _cell(F.col("slon"), _ncells(sband)).alias("cell_lon"),
    )
    dlat = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dlat")
    dlon = F.explode(
        F.array(*[F.lit(i) for i in (-2, -1, 0, 1, 2)])
    ).alias("dlon")
    band2 = (_band(F.col("clat")) + F.col("dlat")).alias("band")
    n2 = _ncells(F.col("band"))
    c_cells = (
        cust.select("*", dlat)
        .select("*", dlon)
        .select("c_custkey", "clat", "clon", "dlon", band2)
        .select(
            "c_custkey",
            "clat",
            "clon",
            "band",
            F.pmod(_cell(F.col("clon"), n2) + F.col("dlon"), n2).alias(
                "cell_lon"
            ),
        )
        # wrap collisions: when a band has n < 5 cells, distinct dlon
        # probes alias to the same cell — dedup probes, not candidates.
        .dropDuplicates(["c_custkey", "band", "cell_lon"])
    )
    cand = c_cells.join(s_cells, ["band", "cell_lon"])
    dist = F.round(
        _haversine_km(
            F.col("clat"), F.col("clon"), F.col("slat"), F.col("slon")
        ),
        6,
    )
    return (
        cand.select("c_custkey", "s_suppkey", dist.alias("dist_km"))
        .filter(F.col("dist_km") <= 500.0)
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.min("dist_km").alias("nearest_km"),
        )
        .orderBy("c_custkey")
    )


# Literal test polygons (vertex coords at .25/.75 offsets so no synthesized
# point ever sits exactly on an edge or vertex ray): a rectangle, a
# triangle, and a CONCAVE arrow — ray casting must handle all three.
_POLYGONS = {
    0: [(-100.25, -40.25), (-20.25, -40.25), (-20.25, 30.75), (-100.25, 30.75)],
    1: [(0.25, -50.25), (120.25, -50.25), (60.25, 55.75)],
    2: [(130.25, -20.25), (170.25, -20.25), (170.25, 40.75), (130.25, 40.75),
        (150.25, 10.25)],
}

_EDGES = [
    (pid, vs[i][0], vs[i][1], vs[(i + 1) % len(vs)][0], vs[(i + 1) % len(vs)][1])
    for pid, vs in _POLYGONS.items()
    for i in range(len(vs))
]

_EDGES_SQL = ", ".join(
    f"({pid}, {x1}, {y1}, {x2}, {y2})" for pid, x1, y1, x2, y2 in _EDGES
)


@register(
    "geo_point_in_polygon",
    oracle=f"""
    WITH edges(poly_id, x1, y1, x2, y2) AS (VALUES {_EDGES_SQL}),
    pts AS (
      SELECT s_suppkey AS supp_id,
             {_LON.format(k="s_suppkey + 1000")} AS px,
             {_LAT.format(k="s_suppkey + 1000")} AS py
      FROM supplier
    ), crossings AS (
      SELECT p.supp_id, e.poly_id,
             COUNT(CASE WHEN (e.y1 > p.py) <> (e.y2 > p.py)
                         AND p.px < (e.x2 - e.x1) * (p.py - e.y1)
                                      / (e.y2 - e.y1) + e.x1
                        THEN 1 END) AS n_cross
      FROM pts p CROSS JOIN edges e
      GROUP BY p.supp_id, e.poly_id
    )
    SELECT supp_id, poly_id
    FROM crossings WHERE n_cross % 2 = 1
    ORDER BY supp_id, poly_id
    """,
    tags=("geo",),
)
def geo_point_in_polygon(spark, sf_dir):
    """Point-in-polygon containment join via PNPOLY ray casting
    (Franklin's even-odd rule): each point counts the polygon edges its
    rightward ray crosses — the identical double expression in both
    engines, so even geometric edge cases hash-match. Handles concave
    polygons (the test set includes one).

    Scale: the polygon-edge relation is geometry-sized and BROADCAST;
    points never shuffle — the crossing count is a map-side-combinable
    aggregate keyed (point, polygon). With a country-scale polygon set
    the production path adds grid-cell blocking (geo_grid_distance_join)
    so each point only tests polygons whose bounding box shares its
    cell; the even-odd test itself is unchanged."""
    supp = load(spark, sf_dir, "supplier")
    pts = supp.select(
        F.col("s_suppkey").alias("supp_id"),
        _lon(F.col("s_suppkey") + 1000).alias("px"),
        _lat(F.col("s_suppkey") + 1000).alias("py"),
    )
    edges = spark.createDataFrame(
        _EDGES, "poly_id int, x1 double, y1 double, x2 double, y2 double"
    )
    crossed = (
        pts.crossJoin(F.broadcast(edges))
        .groupBy("supp_id", "poly_id")
        .agg(
            F.count(
                F.when(
                    ((F.col("y1") > F.col("py"))
                     != (F.col("y2") > F.col("py")))
                    & (
                        F.col("px")
                        < (F.col("x2") - F.col("x1"))
                        * (F.col("py") - F.col("y1"))
                        / (F.col("y2") - F.col("y1"))
                        + F.col("x1")
                    ),
                    1,
                )
            ).alias("n_cross")
        )
    )
    return (
        crossed.filter(F.col("n_cross") % 2 == 1)
        .select("supp_id", "poly_id")
        .orderBy("supp_id", "poly_id")
    )


_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_BITS = 15  # per axis; 30 interleaved bits = 6 base32 chars


def _geohash_sql(lat: str, lon: str) -> str:
    """Portable geohash-6 encoder as ONE arithmetic SQL string (identical
    text both engines): quantize each axis to 15 bits, interleave with
    longitude on the odd (higher) positions — geohash bit order — then
    read the 30-bit key out as six 5-bit base32 characters. All integer
    div/mod arithmetic; no engine bit-op or geo built-ins."""
    # `/` is double division in BOTH engines (and their integer-division
    # operators differ: `div` vs `//`), so integer shifts are written as
    # floor(x / 2^i.0) — exact in IEEE because every operand is < 2^30.
    ilat = f"CAST(floor((({lat}) + 90.0) / 180.0 * 32768.0) AS BIGINT)"
    ilon = f"CAST(floor((({lon}) + 180.0) / 360.0 * 32768.0) AS BIGINT)"

    def shr(x: str, k: int) -> str:
        return f"CAST(floor(({x}) / {1 << k}.0) AS BIGINT)"

    terms = []
    for i in range(_GH_BITS):
        terms.append(f"({shr(ilon, i)} % 2) * {1 << (2 * i + 1)}")
        terms.append(f"({shr(ilat, i)} % 2) * {1 << (2 * i)}")
    z = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{_GH_ALPHABET}', CAST({shr(z, 25 - 5 * j)} % 32"
        f" AS INT) + 1, 1)"
        for j in range(6)
    ]
    return " || ".join(chars)


@register(
    "geo_geohash_cells",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS k,
             {_LAT.format(k="c_custkey")} AS lat,
             {_LON.format(k="c_custkey")} AS lon
      FROM customer
    ),
    hashed AS (
      SELECT k, {_geohash_sql("lat", "lon")} AS gh6 FROM pts
    )
    SELECT substr(gh6, 1, 3) AS gh3,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(DISTINCT gh6) AS BIGINT) AS n_cells_6,
           MIN(gh6) AS first_cell
    FROM hashed
    GROUP BY substr(gh6, 1, 3)
    ORDER BY gh3
    """,
    tags=("geo", "geohash"),
)
def geo_geohash_cells(spark, sf_dir):
    """Geohash spatial bucketing: each synthetic customer point encoded
    to a 6-character geohash (the prefix-hierarchical cell id every geo
    index speaks), aggregated at 3-character precision — prefix
    truncation IS the resolution ladder, the property that makes geohash
    the layout key for spatial data lakes (neighboring points share
    prefixes, so range scans cluster).

    The encoder is one integer div/mod expression — quantize, interleave
    (lon on high bits, per spec), six 5-bit base32 reads — built as a
    single parsed SQL string shared verbatim by both engines (the repo's
    plan-build-cost rule: no per-bit py4j Column calls). It fuses into
    the scan: no shuffle until the cell-sized aggregate. Unlike the
    library geohash it needs no UDF — at 100 TB the encode rides
    whole-stage codegen."""
    cust = load(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("k"),
        _lat(F.col("c_custkey")).alias("lat"),
        _lon(F.col("c_custkey")).alias("lon"),
    )
    hashed = pts.select(
        "k", F.expr(_geohash_sql("lat", "lon")).alias("gh6")
    )
    return (
        hashed.groupBy(F.substring("gh6", 1, 3).alias("gh3"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.countDistinct("gh6").cast("long").alias("n_cells_6"),
            F.min("gh6").alias("first_cell"),
        )
        .orderBy("gh3")
    )
