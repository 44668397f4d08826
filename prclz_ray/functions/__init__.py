"""The engine's scalar/kernel function library (SURVEY.md §2.8) — one
import surface over the geometry, graph, and text kernels that UDF
stages compose, plus a name → callable registry for tooling.

These are prclz's "expression library" analogues (G1–G20 and the
text/hash kernels), all pure numpy / stdlib — no Ray dependency, safe
to import inside any worker.
"""

from ..geom.boolean import (
    inset_polygon,
    is_convex,
    polygon_intersection,
    representative_point,
    winding_number,
)
from ..geom.cells import cell_id, cell_id_e6, cell_parent, polygon_covering_cells
from ..geom.core import (
    clip_polygon_convex,
    closest_point_on_segment,
    haversine_m,
    inset_convex,
    point_in_polygon,
    point_on_segment,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
    project_point_to_segment,
    segment_min_distance,
)
from ..geom.hull import convex_hull, minimum_rotated_rectangle, outside_terminal
from ..geom.noding import node_segments
from ..geom.tiles import lonlat_to_tile, mercator_tile
from ..geom.wkb import (
    parse_wkb,
    wkb_linestring,
    wkb_multilinestring,
    wkb_multipoint,
    wkb_multipolygon,
    wkb_point,
    wkb_polygon,
)
from ..graph.complexity import block_complexity, get_complexity, weak_dual_sequence
from ..graph.steiner import dijkstra, steiner_tree_approx
from ..graph.voronoi import voronoi_cells
from ..stages.hashing import hash_strings, hash_strings62, salted
from .gadm import gadm_level_column

REGISTRY = {
    name: obj
    for name, obj in list(globals().items())
    if callable(obj) and not name.startswith("_")
}

__all__ = sorted(REGISTRY) + ["REGISTRY"]
