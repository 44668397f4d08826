"""Source/sink formats beyond parquet (SURVEY.md §2.1).

The reference interchanges CSV-with-WKT (`prclz/utils.py:26-43`) and
GeoJSON (`midway/midway_blocks.py:59`); the engine reads both into the
same Arrow tables its parquet paths use, and writes CSV+WKT back for
reference compatibility.
"""

from .csv_wkt import read_blocks_csv_wkt, write_blocks_csv_wkt, parse_wkt_polygon
from .geojson import read_geojson_features

__all__ = [
    "read_blocks_csv_wkt",
    "write_blocks_csv_wkt",
    "parse_wkt_polygon",
    "read_geojson_features",
]
