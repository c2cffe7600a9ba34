"""Geo helpers: vectorized haversine distance.

The reference sorts coalesce results by great-circle distance from the
query point (``api/search/ESCoalesce.java:50`` ``geoDistanceSort
("centroid")``; centroid built in ``imp/addr/AddrRowWrapper.java``).
This module supplies the same metric for the engine's secondary-sort
path (``QueryEngine.top_k_geo_sorted``) over ``lat``/``lon`` doc-store
columns.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0088  # IUGG mean earth radius


def haversine_km(
    lat1: np.ndarray | float,
    lon1: np.ndarray | float,
    lat2: np.ndarray | float,
    lon2: np.ndarray | float,
) -> np.ndarray:
    """Great-circle distance in km, elementwise over degree inputs."""
    la1, lo1, la2, lo2 = (
        np.radians(np.asarray(x, dtype=np.float64)) for x in (lat1, lon1, lat2, lon2)
    )
    dlat = la2 - la1
    dlon = lo2 - lo1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))
