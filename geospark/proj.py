"""Closed-form EPSG:4326 <-> EPSG:3857 (Web Mercator / spherical) projection.

Replaces the reference's pyproj usage (osmgeocoder/reverse.py:30-37,
osmgeocoder/geocoder.py:61-71). The spherical Mercator forward/inverse has a
closed form, so we never need pyproj:

    x = R * radians(lon)
    y = R * ln(tan(pi/4 + radians(lat)/2))
    lon = degrees(x / R)
    lat = degrees(2 * atan(exp(y / R)) - pi/2)

Both NumPy-vectorized kernels (for pandas UDFs / fixture generation) and Spark
Column expressions (JVM-side, whole-stage-codegen friendly) are provided.
"""

from __future__ import annotations

import math

import numpy as np

R = 6378137.0  # WGS84 semi-major axis used by EPSG:3857
L = math.pi * R  # world half-width in meters: 20037508.342789244
WORLD = 2.0 * L


def lonlat_to_merc(lon, lat):
    """Vectorized forward projection. Accepts scalars or NumPy arrays."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = R * np.radians(lon)
    y = R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def merc_to_lonlat(x, y):
    """Vectorized inverse projection."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------------------------------
# Spark Column expressions (import pyspark lazily so kernels stay Spark-free)
# ---------------------------------------------------------------------------

def merc_x_col(lon_col):
    from pyspark.sql import functions as F
    return F.radians(lon_col) * F.lit(R)


def merc_y_col(lat_col):
    from pyspark.sql import functions as F
    return F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat_col) / F.lit(2.0))) * F.lit(R)


def lon_col(x_col):
    from pyspark.sql import functions as F
    return F.degrees(x_col / F.lit(R))


def lat_col(y_col):
    from pyspark.sql import functions as F
    return F.degrees(F.atan(F.exp(y_col / F.lit(R))) * F.lit(2.0) - F.lit(math.pi / 2.0))
