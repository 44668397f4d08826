"""Planar-graph / weak-dual / Voronoi / Steiner kernels.

These are transient per-block state inside ``map_batches`` /
``map_groups`` UDFs — they never cross Ray task boundaries (matching
the reference, where graphs are per-task transients,
`midway/midway_complexity.py:32-37`). Durable state is Arrow tables
only.
"""

from .planar import PlanarGraph  # noqa: F401
from .voronoi import voronoi_cells  # noqa: F401
from .complexity import get_s0_approximation, weak_dual_sequence, block_complexity  # noqa: F401
from .steiner import steiner_tree_approx  # noqa: F401
