"""Spatial ops: geofilt / bbox / geodist (ops/spatial.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from solr_ray.ops.spatial import (
    EARTH_RADIUS_KM, bbox_filter, geodist_topk, geofilt, haversine_km)


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "lat": pa.array([r[1] for r in rows], pa.float64()),
        "lon": pa.array([r[2] for r in rows], pa.float64()),
    }))


CITIES = [
    (0, 48.8566, 2.3522),    # Paris
    (1, 51.5074, -0.1278),   # London   (~344 km from Paris)
    (2, 40.7128, -74.0060),  # New York (~5837 km)
    (3, 35.6762, 139.6503),  # Tokyo    (~9714 km)
    (4, -33.8688, 151.2093), # Sydney   (~16960 km)
]


def test_haversine_known_distances():
    lat = np.array([51.5074, 40.7128])
    lon = np.array([-0.1278, -74.0060])
    d = haversine_km(lat, lon, 48.8566, 2.3522)
    assert abs(d[0] - 344.0) < 2.0      # Paris-London
    assert abs(d[1] - 5837.0) < 10.0    # Paris-NYC
    # zero distance to itself
    z = haversine_km(np.array([48.8566]), np.array([2.3522]),
                     48.8566, 2.3522)
    assert z[0] == 0.0


def test_geofilt_radius(ray_session):
    out = geofilt(_ds(CITIES), "lat", "lon", (48.8566, 2.3522), 1000.0)
    t = out.to_pandas().sort_values("id")
    assert list(t.id) == [0, 1]          # Paris itself + London
    assert (t.dist_km <= 1000.0).all()


def test_bbox(ray_session):
    # box covering only Europe-ish longitudes/latitudes
    out = bbox_filter(_ds(CITIES), "lat", "lon", 35.0, 60.0, -10.0, 20.0)
    assert sorted(out.to_pandas().id) == [0, 1]


def test_geodist_topk_order_and_ties(ray_session):
    out = geodist_topk(_ds(CITIES), "lat", "lon", (48.8566, 2.3522), 3,
                       tie_col="id")
    t = out.to_pandas()
    assert list(t.id) == [0, 1, 2]       # nearest first
    assert t.dist_km.is_monotonic_increasing
    # duplicate coordinates tie-break by id
    dup = CITIES + [(9, 48.8566, 2.3522)]
    out2 = geodist_topk(_ds(dup), "lat", "lon", (48.8566, 2.3522), 2,
                        tie_col="id")
    assert list(out2.to_pandas().id) == [0, 9]


def test_earth_radius_is_iugg_mean():
    assert math.isclose(EARTH_RADIUS_KM, 6371.0087714)


def test_heatmap_facet(ray_session):
    import ray.data

    from solr_ray.ops.spatial import heatmap_facet

    rng = np.random.default_rng(3)
    lat = rng.uniform(-90, 90, 20_000)
    lon = rng.uniform(-180, 180, 20_000)
    ds = ray.data.from_arrow(pa.table({"lat": lat, "lon": lon})
                             ).repartition(8)
    got = heatmap_facet(ds, "lat", "lon", -60, 60, -120, 120,
                        grid_rows=6, grid_cols=8).to_pandas()
    # brute force
    m = (lat >= -60) & (lat <= 60) & (lon >= -120) & (lon <= 120)
    r = np.minimum(np.floor((lat[m] + 60) / 20), 5).astype(int)
    c = np.minimum(np.floor((lon[m] + 120) / 30), 7).astype(int)
    import collections
    want = collections.Counter(zip(r, c))
    assert int(got["cnt"].sum()) == int(m.sum())
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert want[(row["grid_row"], row["grid_col"])] == row["cnt"]
    # top/right edge inclusivity: a point exactly at the max corner counts
    one = ray.data.from_arrow(pa.table({"lat": [60.0], "lon": [120.0]}))
    g1 = heatmap_facet(one, "lat", "lon", -60, 60, -120, 120,
                       grid_rows=6, grid_cols=8).to_pandas()
    assert len(g1) == 1 and g1["grid_row"][0] == 5 and g1["grid_col"][0] == 7
