from changegen_spark.geo.mercator import to_3857_x, to_3857_y, to_4326_lat, to_4326_lon
from changegen_spark.geo.join import grid_distance_join

__all__ = [
    "to_3857_x",
    "to_3857_y",
    "to_4326_lat",
    "to_4326_lon",
    "grid_distance_join",
]
