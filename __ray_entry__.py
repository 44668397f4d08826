"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

Surface: 83 queries — geospatial core (extract/geocode/PIP/kNN/tiles/
QC/quantiles/top-k/semi/anti joins, sharded 100TB variants,
hole/MultiPolygon PIP `pip_join_holes`(+sharded), ranked k>1 kNN
`knn_parcels_k3`(+sharded), M8 periphery filter `blocks_periphery`,
real line→region routing `lines_routed` + the dilated per-block shard
map `lines_sharded`), prclz derivation (blocks via two plugin methods
+ general-noding diagonal arrangements, parcels + the segmentize
fallback ladder, complexity, Steiner reblock + the interior G17
variant, zonal raster over a tile table), training-data ops (5 dedup
families + dedup corpus — all bucketed/partitioned with stop-shingle
df caps, no broadcast corpus, 3 ANN variants with partition-pruned
reads, text analysis, multimodal, event windows:
tumbling/sliding/session, temporal joins: as-of `events_asof` + range
`events_range`, quality filtering, eval-set decontamination,
stratified deterministic sampling, PII redaction, WARC-container
ingestion, extract-stage dead-letter sink, corpus curation:
host stats/cap, CCNet line dedup, Gopher repetition signals, MinHash
connected-component clusters, TF-IDF top-k, corpus n-gram top-k,
duplicated-substring spans, trainer ops: `seq_pack` concat-and-chunk
manifest + `shuffle_rank` deterministic global order via the
distributed prefix-sum scan), relational (joins, pricing, revenue)
and skew-salted aggregation.
75 have exact DuckDB oracles; the 8 rows-only ones are geometry- or
approximation-valued (block_complexity, complexity_hist, reblock,
reblock_interior, parcels_ladder, ann_topk_lsh, ann_topk_ivf,
ann_topk_pq) and are pytest-golden-checked instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: pages → extract →
    geocode → cell index → PIP join vs derived blocks → kNN parcel
    assignment. Returns the joined Dataset (streamed, html dropped)."""
    from prclz_ray.queries import _joined

    return _joined("/root/testdata/sf0.001").drop_columns(["text"])


def queries() -> dict[str, Callable[[str], Any]]:
    from prclz_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from prclz_ray.queries import ORACLES

    return dict(ORACLES)
