"""Geospatial operators: grid-bucketed radius join (the Sedona/PostGIS
workhorse, built from first principles on plain DataFrame ops).

The scale shape is the 2-D analogue of the interval grid join
(operators/intervals.py): bucket both point sets into fixed-degree grid
cells sized >= the search radius, replicate the SMALLER side to its 3x3
neighbor ring (bounded 9x expansion), equi-join on the cell key (hash
shuffle, never a cross join), and apply the exact haversine predicate as
a post-filter.  The oracle is the honest quadratic theta join — tractable
at oracle scale, and exactly what this plan avoids at 100 TB.

Coordinates are synthesized from the TPC-H keys with the same
multiplicative-scramble discipline as the sampling entries: pure bigint
arithmetic then one exact binary-scale division, so DuckDB reproduces
every coordinate bit-for-bit and the gate hash-matches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_app_spark.registry_util import QuerySpec, table as _t

_K1 = 2654435761  # Knuth scrambles: deterministic, cross-engine-exact
_K2 = 40503
_EARTH_KM = 6371.0088
_RADIUS_KM = 50.0
# region: lat 40..50, lon 0..20 (10 x 20 degrees). Cell sizes must be
# >= the radius in each dimension so a 3x3 neighbor ring covers every
# candidate: 50 km = 0.45 deg lat; 50 km / (111.32 * cos 50deg) = 0.70
# deg lon. Round up to 0.5 / 0.75.
_CELL_LAT = 0.5
_CELL_LON = 0.75


def _coords(key, k_lat, k_lon):
    """(lat, lon) in the region from a bigint key: scramble mod 2^20,
    scale by an exact power-of-two division (no decimal rounding), then
    shift into the region. Every step is exact in binary floating point,
    so Spark and DuckDB agree bit-for-bit."""
    lat = 40.0 + ((key * k_lat) % 1048576) / 1048576.0 * 10.0
    lon = ((key * k_lon) % 1048576) / 1048576.0 * 20.0
    return lat, lon


def _haversine_km(lat1, lon1, lat2, lon2):
    dphi = F.radians(lat2 - lat1) / 2.0
    dlam = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlam)
        * F.sin(dlam)
    )
    return 2.0 * _EARTH_KM * F.asin(F.sqrt(a))


def geo_grid_radius_join(spark, sf_dir):
    """Suppliers within 50 km of each customer — per customer: how many,
    and the distance to the closest one.  Plan: both point sets land in
    0.5 x 0.75 degree grid cells (cell >= radius in both dims), the
    supplier side is exploded to its 3x3 neighbor ring (9x on the SMALL
    side only), the candidate join is an equi hash join on the cell key,
    and the exact haversine distance prunes the ring.  No cross join
    anywhere; the shuffle is keyed on grid cells whose population is
    bounded by geographic density, not table size.

    Scale: this is how a spatial engine (Sedona's grid partitioner,
    PostGIS ST_DWithin over a grid index) executes radius joins; the
    quadratic all-pairs form the oracle runs is the anti-pattern this
    replaces."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("custkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("suppkey")
    )
    clat, clon = _coords(F.col("custkey"), _K1, _K2)
    slat, slon = _coords(F.col("suppkey"), _K2, _K1)
    cust = c.select(
        "custkey",
        clat.alias("clat"),
        clon.alias("clon"),
        F.floor(clat / _CELL_LAT).alias("ci"),
        F.floor(clon / _CELL_LON).alias("cj"),
    )
    supp = s.select(
        "suppkey", slat.alias("slat"), slon.alias("slon")
    ).select(
        "*",
        F.explode(
            F.array(*[F.lit(d) for d in (-1, 0, 1)])
        ).alias("di"),
    ).select(
        "*",
        F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("dj"),
    ).select(
        "suppkey",
        "slat",
        "slon",
        (F.floor(F.col("slat") / _CELL_LAT) + F.col("di")).alias("ci"),
        (F.floor(F.col("slon") / _CELL_LON) + F.col("dj")).alias("cj"),
    )
    pairs = cust.join(supp, ["ci", "cj"]).select(
        "custkey",
        "suppkey",
        _haversine_km(
            F.col("clat"), F.col("clon"), F.col("slat"), F.col("slon")
        ).alias("dist_km"),
    ).filter(F.col("dist_km") < _RADIUS_KM)
    return (
        pairs.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).alias("n_nearby"),
            F.round(F.min("dist_km"), 4).alias("closest_km"),
        )
        .orderBy("custkey")
    )


GEO_GRID_SQL = f"""
WITH cust AS (
  SELECT c_custkey AS custkey,
         40.0 + ((CAST(c_custkey AS BIGINT) * {_K1}) % 1048576)
                / 1048576.0 * 10.0 AS clat,
         ((CAST(c_custkey AS BIGINT) * {_K2}) % 1048576)
                / 1048576.0 * 20.0 AS clon
  FROM customer
), supp AS (
  SELECT s_suppkey AS suppkey,
         40.0 + ((CAST(s_suppkey AS BIGINT) * {_K2}) % 1048576)
                / 1048576.0 * 10.0 AS slat,
         ((CAST(s_suppkey AS BIGINT) * {_K1}) % 1048576)
                / 1048576.0 * 20.0 AS slon
  FROM supplier
), pairs AS (
  SELECT custkey, suppkey,
         2.0 * {_EARTH_KM} * asin(sqrt(
           sin(radians(slat - clat) / 2.0) * sin(radians(slat - clat) / 2.0)
           + cos(radians(clat)) * cos(radians(slat))
             * sin(radians(slon - clon) / 2.0)
             * sin(radians(slon - clon) / 2.0)
         )) AS dist_km
  FROM cust, supp
)
SELECT custkey, count(*) AS n_nearby,
       CAST(round(min(dist_km), 4) AS DOUBLE) AS closest_km
FROM pairs
WHERE dist_km < {_RADIUS_KM}
GROUP BY custkey
ORDER BY custkey
"""


REGISTRY_GEO = {
    "geo_grid_radius_join": QuerySpec(geo_grid_radius_join, GEO_GRID_SQL),
}
