"""prclz_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query semantics of
``satejsoman/prclz`` (block polygonization, k-complexity via weak-dual
graph depth, Voronoi parcel decomposition, point-in-polygon joins, kNN
assignment, raster/tile rollups) re-expressed as Ray Data pipelines over
zero-copy Arrow batches, plus the large-scale training-data operators
(dedup, similarity search, text analysis) such a corpus engine needs.

Layout:
    geom/       pure-numpy geometry kernels (WKB, PIP, STRtree, cells, tiles)
    graph/      planar graph / weak dual / Voronoi / Steiner kernels
    stages/     Ray Data map_batches / actor-pool stage implementations
    pipelines/  end-to-end pipelines (flagship, blocks, complexity, parcels)
    state/      per-partition lineage manifests + resume planner
    world.py    the deterministic synthetic geography all fixtures share
    stages/pages.py  pages-table derivation from the driver's documents table (synth_pages)

No module in this package calls ``ray.init()``; sessions are owned by
the caller (driver / tests / bench.py).
"""

__version__ = "0.1.0"
