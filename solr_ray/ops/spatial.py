"""Spatial filtering and distance sort — geofilt / bbox / geodist.

Reference semantics: Solr's LatLonPointSpatialField + the geofilt/bbox
query parsers and the geodist() function
(solr/core/src/java/org/apache/solr/schema/LatLonPointSpatialField.java,
solr/core/src/java/org/apache/solr/search/SpatialFilterQParserPlugin.java,
solr/core/src/java/org/apache/solr/search/function/distance/
HaversineConstFunction.java): filter docs within d km great-circle distance
of a point (geofilt), within a lat/lon rectangle (bbox), and sort by
haversine distance (geodist).

Ray-Data-first: every operation is a vectorized `map_batches` filter /
column-add over Arrow batches — embarrassingly parallel, no shuffle. A
distance top-k uses the same partial-top-k-per-batch + small-merge shape
as knn (`sort().limit()` here; volumes are tiny after the filter).

Distances use the haversine great-circle formula on a spherical earth
(R = 6371.0087714 km, the IUGG mean radius Solr uses —
GeodesicSphereDistCalc / DistanceUtils.EARTH_MEAN_RADIUS_KM in
spatial4j, which the reference delegates to).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EARTH_RADIUS_KM = 6371.0087714


def haversine_km(lat1: np.ndarray, lon1: np.ndarray,
                 lat2: float, lon2: float) -> np.ndarray:
    """Vectorized great-circle distance (km) from each (lat1, lon1) row to
    the fixed point (lat2, lon2). Operand order is pinned; the DuckDB
    oracle mirrors it term for term."""
    rlat1 = np.radians(lat1.astype(np.float64))
    rlon1 = np.radians(lon1.astype(np.float64))
    rlat2 = np.radians(np.float64(lat2))
    rlon2 = np.radians(np.float64(lon2))
    sdlat = np.sin((rlat2 - rlat1) / 2.0)
    sdlon = np.sin((rlon2 - rlon1) / 2.0)
    a = sdlat * sdlat + np.cos(rlat1) * np.cos(rlat2) * (sdlon * sdlon)
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def add_geodist(ds, lat_col: str, lon_col: str, pt: tuple[float, float],
                out_col: str = "dist_km"):
    """Append the haversine distance to `pt` as a column (geodist())."""
    plat, plon = float(pt[0]), float(pt[1])

    def dist(t: pa.Table) -> pa.Table:
        d = haversine_km(t[lat_col].to_numpy(zero_copy_only=False),
                         t[lon_col].to_numpy(zero_copy_only=False),
                         plat, plon)
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, pa.array(d, pa.float64()))

    return ds.map_batches(dist, batch_format="pyarrow", zero_copy_batch=True)


def geofilt(ds, lat_col: str, lon_col: str, pt: tuple[float, float],
            d_km: float, keep_dist: bool = True, out_col: str = "dist_km"):
    """{!geofilt} — rows within d km great-circle distance of pt."""
    out = add_geodist(ds, lat_col, lon_col, pt, out_col)
    thresh = float(d_km)

    def cut(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t[out_col], pa.scalar(thresh)))
        return t if keep_dist else t.drop_columns([out_col])

    return out.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)


def bbox_filter(ds, lat_col: str, lon_col: str,
                lat_min: float, lat_max: float,
                lon_min: float, lon_max: float):
    """{!bbox}-style rectangle filter — pure comparisons, exact (no trig).

    Note: Solr's {!bbox} derives the rectangle from pt+d; callers wanting
    that behavior pass the derived bounds. A box crossing the antimeridian
    should be issued as two boxes (same as Lucene's two-range rewrite).
    """
    lo_la, hi_la = float(lat_min), float(lat_max)
    lo_lo, hi_lo = float(lon_min), float(lon_max)

    def cut(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(t[lat_col], pa.scalar(lo_la)),
                    pc.less_equal(t[lat_col], pa.scalar(hi_la))),
            pc.and_(pc.greater_equal(t[lon_col], pa.scalar(lo_lo)),
                    pc.less_equal(t[lon_col], pa.scalar(hi_lo))),
        )
        return t.filter(m)

    return ds.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)


def geodist_topk(ds, lat_col: str, lon_col: str, pt: tuple[float, float],
                 k: int, out_col: str = "dist_km", tie_col: str | None = None):
    """k nearest rows to pt by great-circle distance (sort=geodist() asc).

    Per-batch partial top-k before the global sort keeps the exchange at
    O(k × num_blocks) rows regardless of input size.
    """
    out = add_geodist(ds, lat_col, lon_col, pt, out_col)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        d = t[out_col].to_numpy(zero_copy_only=False)
        # keep every row tied with the k-th smallest (exact global top-k)
        kth = np.partition(d, k - 1)[k - 1]
        return t.filter(pc.less_equal(t[out_col], pa.scalar(float(kth))))

    keys = [out_col] if tie_col is None else [out_col, tie_col]
    return (out.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
            .sort(keys).limit(k))


def heatmap_facet(ds, lat_col: str, lon_col: str,
                  lat_min: float, lat_max: float,
                  lon_min: float, lon_max: float,
                  grid_rows: int = 16, grid_cols: int = 16):
    """FacetHeatmap analog (solr/core/src/java/org/apache/solr/search/
    facet/FacetHeatmap.java): per-cell point counts over a lat/lon grid
    covering the bbox.

    Pure combiner shape (cell count = grid_rows x grid_cols, small by
    contract, like the reference's gridLevel-bounded heatmap): each batch
    2-D-bincounts its in-bbox rows to at most rows x cols partial cells;
    the partials merge in one tiny grouped aggregate. No shuffle ever
    carries more than O(blocks x cells) rows.

    Cell edges follow the reference's convention: cell i covers
    [min + i*width, min + (i+1)*width) with the top/right edge inclusive
    in the last cell (a point at lat_max/lon_max still counts). SQL
    oracle: LEAST(FLOOR((v - lo) / width), n-1) per axis.

    Returns (grid_row, grid_col, cnt) sorted, grid_row 0 = south edge —
    only non-empty cells (the reference emits counts_ints2D with nulls
    for empty rows; sparse rows are the distributed-friendly layout)."""
    la0, la1 = float(lat_min), float(lat_max)
    lo0, lo1 = float(lon_min), float(lon_max)
    rh = (la1 - la0) / grid_rows
    cw = (lo1 - lo0) / grid_cols

    def partial(t: pa.Table) -> pa.Table:
        lat = t[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lon = t[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = (lat >= la0) & (lat <= la1) & (lon >= lo0) & (lon <= lo1)
        lat, lon = lat[m], lon[m]
        r = np.minimum(np.floor((lat - la0) / rh), grid_rows - 1
                       ).astype(np.int64)
        c = np.minimum(np.floor((lon - lo0) / cw), grid_cols - 1
                       ).astype(np.int64)
        flat = r * grid_cols + c
        cnt = np.bincount(flat, minlength=grid_rows * grid_cols)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "grid_row": pa.array(nz // grid_cols, pa.int64()),
            "grid_col": pa.array(nz % grid_cols, pa.int64()),
            "cnt": pa.array(cnt[nz], pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["grid_row", "grid_col"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .sort(["grid_row", "grid_col"]))
