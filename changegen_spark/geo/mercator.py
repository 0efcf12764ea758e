"""CRS reprojection EPSG:3857 ↔ EPSG:4326 (SURVEY §2.7 F1).

Parity target: the reference's pyproj ``Transformer`` with ``always_xy=True``
(``changegen/generator.py:29-30,563-566``).  Web-Mercator ↔ WGS84 is closed
form, so we express it with built-in column functions — stays inside
whole-stage codegen, no UDF, no pyproj dependency.

Spherical Web Mercator (EPSG:3857) uses radius R = 6378137 m:
    x = R·λ,  y = R·ln(tan(π/4 + φ/2))
    λ = x/R,  φ = 2·atan(exp(y/R)) − π/2
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

R = 6378137.0


def to_3857_x(lon: Column) -> Column:
    return F.radians(lon) * F.lit(R)


def to_3857_y(lat: Column) -> Column:
    return F.lit(R) * F.log(F.tan(F.lit(math.pi / 4) + F.radians(lat) / 2))


def to_4326_lon(x: Column) -> Column:
    return F.degrees(x / F.lit(R))


def to_4326_lat(y: Column) -> Column:
    return F.degrees(2 * F.atan(F.exp(y / F.lit(R))) - F.lit(math.pi / 2))
