"""Pure-numpy geometry kernels (no shapely/geopandas in this environment).

These are the engine's scalar/vector "expression library" — the analogue
of the reference's per-record geometry helpers (``prclz/topology.py``
Node/Edge/Face math, ``prclz/utils.py`` WKT handling) — but vectorized
over Arrow/numpy batches so they can run inside ``Dataset.map_batches``.
"""

from .core import (  # noqa: F401
    haversine_m,
    point_in_polygon,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
    clip_polygon_convex,
    segment_min_distance,
    project_point_to_segment,
    point_on_segment,
)
from .wkb import (  # noqa: F401
    wkb_point,
    wkb_polygon,
    wkb_multipolygon,
    wkb_linestring,
    wkb_multilinestring,
    parse_wkb,
)
from .strtree import STRtree  # noqa: F401
from .cells import cell_id, cell_token, cell_bounds, polygon_covering_cells  # noqa: F401
from .tiles import lonlat_to_tile, tile_bounds, mercator_tile, mercator_tile_bounds  # noqa: F401
