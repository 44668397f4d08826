"""The engine's query surface: one named entry per operator/pipeline
(SURVEY.md §2), each with a Ray Data implementation and (where
SQL-expressible) a DuckDB oracle over the same parquet tables.

Every Ray callable takes ``sf_dir`` and returns a Dataset / pyarrow
Table; aggregates are exact-integer (or one final float division) so
value hashes match the oracle bit-for-bit. Column names match the SQL
aliases exactly (driver compares after sorting columns by name).
"""

from __future__ import annotations

from .io import read_parquet_clean as _read_parquet_clean

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import world
from .geom.cells import RES_PARTITION, WORLD_SPAN_E6

def _ray_epoch() -> str:
    """Current Ray session marker — broadcast ObjectRefs die with the
    session, so every module-level ref cache is keyed by this."""
    import ray

    try:
        # session dir name is unique per ray.init (job ids restart at 01)
        return ray._private.worker._global_node.session_name
    except Exception:
        try:
            return ray.get_runtime_context().get_node_id()
        except Exception:
            return None  # unknown session → never cache (see _epoch_cached)


_EPOCHED: dict = {}


def _epoch_cached(name: str, build):
    """Session-aware singleton: rebuilt if Ray was restarted; never
    cached when the session identity is unknown (stale-ref safety)."""
    epoch = _ray_epoch()
    if epoch is None:
        return build()
    hit = _EPOCHED.get(name)
    if hit is None or hit[0] != epoch:
        _EPOCHED[name] = (epoch, build())
    return _EPOCHED[name][1]


def _buckets(sf_dir: str, floor: int, table: str = "documents",
             fanout: int = 1) -> int:
    """Input-scaled bucket count for a bounded-bucket shuffle: the
    family's tuned floor constant at test scale, growing once (rows ×
    fanout) / floor exceeds the per-group worker budget (VERDICT r3:
    fixed constants cap reduce parallelism and leave group size =
    corpus / N). ``fanout`` is the stage's row multiplier (lines or
    grams per document); the count comes from one parquet footer walk,
    no data read. Results are bucket-count-invariant — only group
    sizes and reduce parallelism move."""
    from .stages.scaling import dynamic_buckets, parquet_rows

    return dynamic_buckets(parquet_rows(f"{sf_dir}/{table}.parquet") * fanout, floor)


def _rwidth(sf_dir: str, n_buckets: int, table: str = "documents",
            fanout: int = 1, floor: int = 8) -> int:
    """Input-scaled partition width for the repartition feeding a
    bounded-bucket reduce (or a join's ``num_partitions``) — the
    companion of ``_buckets`` (VERDICT r4 §wrong.1: a fixed
    ``repartition(8)`` on a full-corpus stream makes each reduce task
    materialize corpus/8 rows and caps a multi-node cluster at 8-way
    reduce parallelism). Same row estimate as the bucket count it
    pairs with; capped at ``n_buckets`` so partitions never exceed
    groups (schema-less empty-block hazard)."""
    from .stages.scaling import parquet_rows, reduce_width

    return reduce_width(
        parquet_rows(f"{sf_dir}/{table}.parquet") * fanout, n_buckets, floor=floor
    )


def _jwidth(sf_dir: str, table: str = "documents", fanout: int = 1,
            floor: int = 8) -> int:
    """Input-scaled ``num_partitions`` for a Ray hash join — sized on
    the BIGGER side's rows, uncapped by any group count (hash-join
    partitions carry no schema-less empty-group hazard)."""
    from .stages.scaling import MAX_BUCKETS, parquet_rows, reduce_width

    return reduce_width(
        parquet_rows(f"{sf_dir}/{table}.parquet") * fanout,
        MAX_BUCKETS, floor=floor,
    )


def _read_probed_embeddings(paths):
    """read_parquet over a probed-partition file list, tolerating an
    EMPTY probe set: k-means can leave lists empty and probed_paths
    skips missing bucket dirs, so a query whose probed lists are all
    empty must yield an empty typed scan (→ empty top-k), not an
    IndexError inside read_parquet_clean."""
    import ray.data

    if not paths:
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64())),
                }
            )
        )
    return _read_parquet_clean(paths)


def _zero_flag_docs(sf_dir: str):
    """(doc_id, dropped=0) stream over the full corpus — the left side
    of the shared shuffle anti-join tail (``_keep_unflagged``)."""
    return _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "dropped": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )


def _keep_unflagged(zeros, flagged):
    """Shuffle anti-join tail shared by the dedup/decontaminate family:
    keep every doc_id whose max(dropped) over zeros ∪ flagged is 0 —
    nothing materializes on the driver (the drop set can be 30-50% of
    the corpus at web scale)."""
    kept = zeros.union(flagged).groupby("doc_id").max("dropped")
    return kept.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id")}).filter(
            pc.equal(b.column("max(dropped)"), 0)
        ),
        batch_format="pyarrow",
    )


def _cents(col) -> pa.Array:
    """value*100 rounded half-away-from-zero (DuckDB ROUND semantics),
    sign-correct for negative values, cast to exact int64."""
    v = pc.multiply(pc.cast(col, pa.float64()), 100.0)
    pos = pc.cast(pc.floor(pc.add(v, 0.5)), pa.int64())
    neg = pc.cast(pc.ceil(pc.subtract(v, 0.5)), pa.int64())
    return pc.if_else(pc.less(v, 0.0), neg, pos)


def _side_refs():
    """ray.put the blocks/parcels side tables once per Ray session."""
    from .pipelines.flagship import load_side_tables

    return _epoch_cached("side_refs", load_side_tables)


def _joined(sf_dir: str):
    from .pipelines.flagship import joined_pages

    blocks_ref, anchors_ref = _side_refs()
    return joined_pages(sf_dir, blocks_ref=blocks_ref, anchors_ref=anchors_ref)


def _pages(sf_dir: str):
    """pages after synth+geocode+extract+index (no join)."""
    from .stages.pages import pages_dataset

    return pages_dataset(sf_dir)


# ---------------------------------------------------------------------------
# SQL building blocks

_CELL_W = WORLD_SPAN_E6 >> RES_PARTITION  # 312500 µdeg at res 5
_CELL_SQL = (
    f"CASE WHEN has_geo THEN {RES_PARTITION} * (1::BIGINT << 56)"
    f" + LEAST(GREATEST(lon_e6, 0) // {_CELL_W}, {(1 << RES_PARTITION) - 1}) * (1::BIGINT << 28)"
    f" + LEAST(GREATEST(lat_e6, 0) // {_CELL_W}, {(1 << RES_PARTITION) - 1})"
    " ELSE -1 END"
)

_WITH_GEO = f"WITH {world.GEO_CTE}"

_BLOCK_SQL = world.BLOCK_ID_SQL
_GADM_SQL = world.GADM_ID_SQL

# kNN oracle: nearest of the page's own block's 4 anchors (own block is
# provably nearest in this geography; ties broken by smallest p)
_KNN_CTE = f"""
knn AS (
  SELECT doc_id, url, p,
         ('B' || printf('%02d', bx) || '_' || printf('%02d', by) || '_P' || p) AS parcel_id,
         (lon_e6 - (bx * {world.BLOCK_E6} + 25000 + (p % 2) * 50000)) ** 2
       + (lat_e6 - (by * {world.BLOCK_E6} + 25000 + (p // 2) * 50000)) ** 2 AS d2
  FROM pages, (SELECT unnest([0, 1, 2, 3]) AS p)
  WHERE has_geo
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY d2, p) = 1
)
"""


# ---------------------------------------------------------------------------
# geospatial core queries

def q_extract_text(sf_dir: str):
    ds = _pages(sf_dir)
    return ds.select_columns(["url", "lang", "text"])


SQL_EXTRACT = (
    "SELECT 'https://' || source || '/' || CAST(doc_id AS VARCHAR) AS url, lang, text"
    " FROM documents"
)


def _fingerprint_cache(sf_dir: str, prefix: str, build):
    """Derived-fixture cache skeleton shared by the WARC and JSONL
    sources: key = (sf-dir tag, documents.parquet mtime+size), build
    into a private tmp dir, publish with an atomic rename (two racing
    builders never interleave writes; the loser cleans up and defers
    to the winner unless the winner's dir is genuinely absent)."""
    import os
    import shutil
    import tempfile

    from .pipelines.derive import CACHE_DIR

    st = os.stat(f"{sf_dir}/documents.parquet")
    tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(CACHE_DIR, f"{prefix}_{tag}_{st.st_mtime_ns}_{st.st_size}")
    if not os.path.isdir(root):
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = tempfile.mkdtemp(prefix=f"{prefix}.", dir=CACHE_DIR)
        build(tmp)
        try:
            os.replace(tmp, root)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(root):
                raise
    return root


def _warc_path(sf_dir: str) -> str:
    """Documents table serialized ONCE as synthetic WARC files (4 shards
    — exercises the file-parallel read), cached by source fingerprint."""
    import os

    import pyarrow.parquet as pq

    from .sources.warc import write_synth_warc

    def build(tmp):
        t = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        )
        ids = t.column("doc_id").to_pylist()
        srcs = t.column("source").to_pylist()
        texts = t.column("text").to_pylist()
        shards = 4
        for s in range(shards):
            sel = [i for i in range(len(ids)) if ids[i] % shards == s]
            write_synth_warc(
                os.path.join(tmp, f"part-{s}.warc"),
                [f"https://{srcs[i]}/{ids[i]}" for i in sel],
                [f"2024-01-01T00:00:{ids[i] % 60:02d}Z" for i in sel],
                [texts[i].encode() for i in sel],
            )

    return _fingerprint_cache(sf_dir, "warc", build)


def q_warc_extract(sf_dir: str):
    """The north-star ingestion path END-TO-END: Common-Crawl-style
    WARC container files → file-parallel record parse → byte-identical
    extracted text per url (the input_hint invariant), checked against
    the same oracle as the parquet-side extractor."""
    import glob as _glob

    from .sources.warc import read_warc

    root = _warc_path(sf_dir)
    ds = read_warc(sorted(_glob.glob(f"{root}/part-*.warc")))

    def to_text(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": b.column("url"),
                "text": pc.cast(b.column("html"), pa.string()),
            }
        )

    return ds.map_batches(to_text, batch_format="pyarrow")


SQL_WARC_EXTRACT = (
    "SELECT 'https://' || source || '/' || CAST(doc_id AS VARCHAR) AS url, text"
    " FROM documents"
)


def _jsonl_path(sf_dir: str) -> str:
    """Documents table serialized ONCE as JSONL shards (up to 4 files
    — exercises the file-parallel read), cached by source fingerprint.
    Residue classes with zero docs write NO file: pyarrow's NDJSON
    reader raises on a zero-byte file, and the reading glob tolerates
    missing parts."""
    import json
    import os

    import pyarrow.parquet as pq

    def build(tmp):
        t = pq.read_table(f"{sf_dir}/documents.parquet")
        rows = t.to_pylist()
        shards = 4
        for s in range(shards):
            sel = [r for r in rows if r["doc_id"] % shards == s]
            if not sel:
                continue
            with open(os.path.join(tmp, f"part-{s}.jsonl"), "w") as f:
                for r in sel:
                    f.write(json.dumps(r, sort_keys=True) + "\n")

    return _fingerprint_cache(sf_dir, "jsonl", build)


def q_jsonl_ingest(sf_dir: str):
    """JSONL ingestion — the other standard webtext interchange format
    beside WARC: newline-delimited JSON shards → ``ray.data.read_json``
    (pyarrow's vectorized NDJSON parser, one task per file) → column
    projection. The oracle recomputes the expected rows from the
    ``documents`` view, so the writer+reader roundtrip (types, text
    bytes, nulls) is what's checked. Output: documents columns."""
    import glob as _glob

    import ray

    root = _jsonl_path(sf_dir)
    ds = ray.data.read_json(sorted(_glob.glob(f"{root}/part-*.jsonl")))
    cols = ["doc_id", "source", "lang", "text", "n_chars"]
    return ds.map_batches(
        lambda b: b.select(cols), batch_format="pyarrow"
    )


SQL_JSONL_INGEST = """
SELECT doc_id, source, lang, text, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
"""


N_BAD_JSONL_LINES = 2  # garbage lines appended to EACH corrupted shard


def _jsonl_bad_path(sf_dir: str) -> str:
    """The JSONL fixture with N_BAD_JSONL_LINES deterministic garbage
    lines appended per shard — the lenient-reader test corpus."""
    import json
    import os

    import pyarrow.parquet as pq

    def build(tmp):
        t = pq.read_table(f"{sf_dir}/documents.parquet")
        rows = t.to_pylist()
        shards = 4
        for s in range(shards):
            sel = [r for r in rows if r["doc_id"] % shards == s]
            if not sel:
                continue
            with open(os.path.join(tmp, f"part-{s}.jsonl"), "w") as f:
                for r in sel:
                    f.write(json.dumps(r, sort_keys=True) + "\n")
                f.write(f"!!corrupt shard {s} trailing garbage\n")
                f.write('{"doc_id": 999, "unterminated\n')

    return _fingerprint_cache(sf_dir, "jsonlbad", build)


def q_jsonl_lenient(sf_dir: str):
    """LENIENT NDJSON ingestion: shards with injected malformed lines
    → optimistic batch parse with bisect isolation (one C-speed parse
    per clean run, O(log n) extra parses around each bad line), bad
    lines dead-lettered — never silent, never failing the shard. The
    oracle is the full documents view: exactly the garbage lines
    disappear, everything else survives byte-identically. Output:
    documents columns."""
    import glob as _glob

    import ray

    from .sources.jsonl import make_jsonl_parse_fn

    root = _jsonl_bad_path(sf_dir)
    cols = ["doc_id", "source", "lang", "text", "n_chars"]
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("source", pa.string()),
            ("lang", pa.string()),
            ("text", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    ds = ray.data.read_text(sorted(_glob.glob(f"{root}/part-*.jsonl")))
    return ds.map_batches(
        make_jsonl_parse_fn(columns=cols, schema=schema),
        batch_format="pyarrow",
    )


def q_geocode(sf_dir: str):
    return _pages(sf_dir).select_columns(["url", "has_geo", "lat_e6", "lon_e6", "cell_r5"])


SQL_GEOCODE = (
    _WITH_GEO
    + f" SELECT url, has_geo, lat_e6, lon_e6, CAST({_CELL_SQL} AS BIGINT) AS cell_r5 FROM pages"
)


def q_pip_join(sf_dir: str):
    return _joined(sf_dir).select_columns(["url", "block_id", "gadm"])


SQL_PIP_JOIN = (
    _WITH_GEO
    + f""" SELECT url,
        CASE WHEN has_geo THEN {_BLOCK_SQL} END AS block_id,
        CASE WHEN has_geo THEN {_GADM_SQL} END AS gadm
      FROM pages"""
)


def q_knn_parcels(sf_dir: str):
    ds = _joined(sf_dir)
    ds = ds.filter(expr="has_geo")
    return ds.select_columns(["url", "parcel_id", "dist2"])


SQL_KNN = _WITH_GEO + ", " + _KNN_CTE + " SELECT url, parcel_id, CAST(d2 AS BIGINT) AS dist2 FROM knn"


def q_knn_parcels_k3(sf_dir: str):
    """k-NEAREST parcels per page with rank (k=3) — SURVEY J8's general
    form (ref analogue: `reblock/i_topology.py:377-394` k-nearest
    candidate edges). Rank order is (d2, parcel_id); candidates beyond
    a page's own block are real (2nd/3rd nearest can sit in a
    neighboring block), so the oracle searches the 3×3 block
    neighborhood — provably a superset of the true top-3 here (3rd-own
    ≤ √(65000²+25000²) µdeg < 135000 ≤ any anchor ≥ 2 blocks away)."""
    from .stages.spatial import make_knn_topk_fn

    _, anchors_ref = _side_refs()
    ds = _pages(sf_dir).filter(expr="has_geo")
    return ds.map_batches(make_knn_topk_fn(anchors_ref, k=3), batch_format="pyarrow")


SQL_KNN_K3 = (
    _WITH_GEO
    + f""",
cand AS (
  SELECT doc_id, url,
    ('B' || printf('%02d', bx + ox) || '_' || printf('%02d', by + oy) || '_P' || p) AS parcel_id,
    (lon_e6 - ((bx + ox) * {world.BLOCK_E6} + 25000 + (p % 2) * 50000)) ** 2
  + (lat_e6 - ((by + oy) * {world.BLOCK_E6} + 25000 + (p // 2) * 50000)) ** 2 AS d2
  FROM pages,
       (SELECT unnest([-1, 0, 1]) AS ox),
       (SELECT unnest([-1, 0, 1]) AS oy),
       (SELECT unnest([0, 1, 2, 3]) AS p)
  WHERE has_geo
    AND bx + ox BETWEEN 0 AND {world.N_BLOCKS - 1}
    AND by + oy BETWEEN 0 AND {world.N_BLOCKS - 1}
),
knn3 AS (
  SELECT url, parcel_id, d2,
         row_number() OVER (PARTITION BY doc_id ORDER BY d2, parcel_id) AS rnk
  FROM cand
  QUALIFY rnk <= 3
)
SELECT url, CAST(rnk AS BIGINT) AS rank, parcel_id, CAST(d2 AS BIGINT) AS dist2 FROM knn3"""
)


def q_pip_join_sharded(sf_dir: str):
    """The 100 TB PIP path: polygon side sharded per partitioning cell
    (one ray.put slice per cell), rows routed by cell_r5, per-worker
    lazy slice indexes. Same oracle as pip_join proves equivalence."""
    import pyarrow.parquet as pq

    from .pipelines import derive
    from .stages.spatial import make_pip_sharded_fn, put_blocks_side_by_cell

    refs = _epoch_cached(
        "pip_shards", lambda: put_blocks_side_by_cell(pq.read_table(derive.blocks_path()))
    )
    ds = _pages(sf_dir).map_batches(make_pip_sharded_fn(refs), batch_format="pyarrow")
    return ds.select_columns(["url", "block_id", "gadm"])


def q_knn_parcels_sharded(sf_dir: str):
    """The 100 TB kNN path: anchors sharded per cell with a 100k-µdeg
    halo; rows routed by cell_r5. Same oracle as knn_parcels proves the
    halo assumption holds (nearest anchor always inside the slice)."""
    import pyarrow.parquet as pq

    from .pipelines import derive
    from .stages.spatial import make_knn_sharded_fn, put_anchors_side_by_cell

    refs = _epoch_cached(
        "knn_shards", lambda: put_anchors_side_by_cell(pq.read_table(derive.parcels_path()))
    )
    ds = _pages(sf_dir).filter(expr="has_geo")
    ds = ds.map_batches(make_knn_sharded_fn(refs), batch_format="pyarrow")
    return ds.select_columns(["url", "parcel_id", "dist2"])


# --- hole-aware PIP: donut + MultiPolygon blocks -------------------------
# A 4×4 grid of 0.1°-pitch cells; the block of cell (i,j) is a
# MULTIPOLYGON of (a) a donut — outer square with a square HOLE — and
# (b) a small detached square in the cell's corner. Ring coordinates sit
# at half-µdeg offsets so integer-µdeg points are never on a boundary
# (even-odd vs SQL comparisons can't disagree on ties). All bounds in
# µdeg within a cell:
_DNT_PITCH = 100_000
_DNT_GRID = 4
_DNT_OUT = (1, 79_999)      # outer ring interior (µdeg, inclusive)
_DNT_HOLE = (20_001, 59_999)  # hole interior — points here DON'T match
_DNT_PART2 = (85_001, 94_999)  # detached square (MultiPolygon part 2)


def _donut_blocks_table() -> pa.Table:
    from .geom.wkb import wkb_multipolygon

    def sq(x0, x1, y0, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)

    ids, gadm, wkbs = [], [], []
    for i in range(_DNT_GRID):
        for j in range(_DNT_GRID):
            bx, by = i * _DNT_PITCH, j * _DNT_PITCH
            o0, o1 = bx + _DNT_OUT[0] - 0.5, bx + _DNT_OUT[1] + 0.5
            p0, p1 = by + _DNT_OUT[0] - 0.5, by + _DNT_OUT[1] + 0.5
            h0, h1 = bx + _DNT_HOLE[0] - 0.5, bx + _DNT_HOLE[1] + 0.5
            k0, k1 = by + _DNT_HOLE[0] - 0.5, by + _DNT_HOLE[1] + 0.5
            s0, s1 = bx + _DNT_PART2[0] - 0.5, bx + _DNT_PART2[1] + 0.5
            t0, t1 = by + _DNT_PART2[0] - 0.5, by + _DNT_PART2[1] + 0.5
            donut = (sq(o0, o1, p0, p1) / 1e6, [sq(h0, h1, k0, k1) / 1e6])
            part2 = sq(s0, s1, t0, t1) / 1e6
            ids.append(f"D{i}_{j}")
            gadm.append("HOLE")
            wkbs.append(wkb_multipolygon([donut, part2]))
    return pa.table(
        {
            "block_id": pa.array(ids, pa.string()),
            "gadm": pa.array(gadm, pa.string()),
            "geom_wkb": pa.array(wkbs, pa.binary()),
        }
    )


def q_pip_join_holes(sf_dir: str):
    """PIP join against HOLE-bearing MultiPolygon blocks — the general
    (Multi)Polygon case the reference's arbitrary block geometries need
    (`prclz/blocks/methods.py:38-40`): a point inside a block's hole
    must NOT match; a point in a detached part must. Points derive
    deterministically from doc_id so the oracle is pure arithmetic."""
    from .stages.spatial import make_pip_fn, put_blocks_side

    ref = _epoch_cached("donut_side", lambda: put_blocks_side(_donut_blocks_table()))
    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    span = _DNT_GRID * _DNT_PITCH

    def to_points(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lon_e6": pa.array((d * 131) % span, pa.int64()),
                "lat_e6": pa.array((d * 137) % span, pa.int64()),
                "has_geo": pa.array(np.ones(len(d), bool)),
            }
        )

    ds = docs.map_batches(to_points, batch_format="pyarrow")
    ds = ds.map_batches(make_pip_fn(ref), batch_format="pyarrow")
    return ds.select_columns(["doc_id", "block_id"])


_DNT_SPAN = _DNT_GRID * _DNT_PITCH
SQL_PIP_HOLES = f"""
WITH p AS (
  SELECT doc_id,
         (doc_id * 131) % {_DNT_SPAN} AS px,
         (doc_id * 137) % {_DNT_SPAN} AS py
  FROM documents
)
SELECT doc_id,
  CASE WHEN (
      px % {_DNT_PITCH} BETWEEN {_DNT_OUT[0]} AND {_DNT_OUT[1]}
      AND py % {_DNT_PITCH} BETWEEN {_DNT_OUT[0]} AND {_DNT_OUT[1]}
      AND NOT (px % {_DNT_PITCH} BETWEEN {_DNT_HOLE[0]} AND {_DNT_HOLE[1]}
               AND py % {_DNT_PITCH} BETWEEN {_DNT_HOLE[0]} AND {_DNT_HOLE[1]})
    ) OR (
      px % {_DNT_PITCH} BETWEEN {_DNT_PART2[0]} AND {_DNT_PART2[1]}
      AND py % {_DNT_PITCH} BETWEEN {_DNT_PART2[0]} AND {_DNT_PART2[1]}
    )
  THEN 'D' || CAST(px // {_DNT_PITCH} AS VARCHAR) || '_' || CAST(py // {_DNT_PITCH} AS VARCHAR)
  END AS block_id
FROM p
"""


def q_tile_rollup(sf_dir: str):
    from .stages.rollup import tile_rollup

    return tile_rollup(_joined(sf_dir))


SQL_TILE = (
    _WITH_GEO
    + f""" SELECT lon_e6 // {1_000_000} AS tile_x,
        lat_e6 // {1_000_000} AS tile_y,
        COUNT(*) AS n_pages,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_chars
      FROM pages WHERE has_geo GROUP BY 1, 2"""
)


def q_match_count_qc(sf_dir: str):
    from .stages.rollup import match_count_qc

    return match_count_qc(_joined(sf_dir))


SQL_QC = (
    _WITH_GEO
    + f""", keys AS (
      SELECT ('G' || gx || '_' || gy) AS gadm_key
      FROM (SELECT unnest(range({world.N_GADM_AXIS})) AS gx), (SELECT unnest(range({world.N_GADM_AXIS})) AS gy)
      UNION ALL SELECT '{world.SENTINEL_GADM}'
    ),
    counted AS (
      SELECT CASE WHEN has_geo THEN {_GADM_SQL} ELSE '{world.SENTINEL_GADM}' END AS gadm_key,
             COUNT(*) AS n
      FROM pages GROUP BY 1
    )
    SELECT k.gadm_key, COALESCE(c.n, 0) AS n_pages
    FROM keys k LEFT JOIN counted c USING (gadm_key)"""
)


def q_dist_quantiles(sf_dir: str):
    import pyarrow.parquet as pq

    from .stages.rollup import quantiles_int

    ds = _joined(sf_dir).filter(expr="has_geo")
    # row-count hint for the FILTERED stream (has_geo ⇔ doc_id%37≠0 on
    # contiguous ids), from source metadata (free): exact path at
    # oracle scale, the one-pass sketch beyond EXACT_QUANTILE_LIMIT
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_hint = n_docs - (n_docs + 36) // 37
    p50, p95, p100 = quantiles_int(ds, "dist2", [0.5, 0.95, 1.0], n_rows_hint=n_hint)
    return pa.table({"metric": ["p50", "p95", "p100"], "dist2": pa.array([p50, p95, p100], pa.int64())})


SQL_QUANTILES = (
    _WITH_GEO
    + ", "
    + _KNN_CTE
    + """ SELECT 'p50' AS metric, CAST(quantile_disc(d2, 0.5) AS BIGINT) AS dist2 FROM knn
     UNION ALL SELECT 'p95', CAST(quantile_disc(d2, 0.95) AS BIGINT) FROM knn
     UNION ALL SELECT 'p100', CAST(quantile_disc(d2, 1.0) AS BIGINT) FROM knn"""
)


def q_top_blocks(sf_dir: str):
    ds = _joined(sf_dir).filter(expr="has_geo")

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"block_id": batch.column("block_id")})
        return t.group_by("block_id").aggregate([([], "count_all")]).rename_columns(
            ["block_id", "n"]
        )

    counts = ds.map_batches(partial, batch_format="pyarrow").groupby("block_id").sum("n")
    top = counts.sort(["sum(n)", "block_id"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda b: pa.table({"block_id": b.column("block_id"), "n_pages": b.column("sum(n)")}),
        batch_format="pyarrow",
    )


SQL_TOP_BLOCKS = (
    _WITH_GEO
    + f""" SELECT {_BLOCK_SQL} AS block_id, COUNT(*) AS n_pages
      FROM pages WHERE has_geo
      GROUP BY 1 ORDER BY n_pages DESC, block_id LIMIT 10"""
)


def q_semi_join_aoi(sf_dir: str):
    """Semi-join (J7): pages inside the AoI block set (urban core of
    admin cell G1_1: bx, by ∈ [11, 19])."""
    ds = _joined(sf_dir).filter(expr="has_geo")
    aoi_arr = pa.array(
        sorted(
            world.block_id_str(bx, by)
            for bx in range(11, 20)
            for by in range(11, 20)
        )
    )

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("block_id"), value_set=aoi_arr)
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow").select_columns(["url", "block_id"])


SQL_SEMI_JOIN = (
    _WITH_GEO
    + f""" SELECT url, {_BLOCK_SQL} AS block_id
      FROM pages WHERE has_geo AND bx BETWEEN 11 AND 19 AND by BETWEEN 11 AND 19"""
)


def q_anti_join_empty_gadm(sf_dir: str):
    """Anti-join (J10/D4 pattern): admin cells with ZERO joined pages."""
    from .stages.rollup import match_count_qc

    qc = match_count_qc(_joined(sf_dir))
    mask = pc.and_(
        pc.equal(qc.column("n_pages"), 0),
        pc.not_equal(qc.column("gadm_key"), world.SENTINEL_GADM),
    )
    return qc.filter(mask).select(["gadm_key"])


SQL_ANTI_JOIN = (
    _WITH_GEO
    + f""", keys AS (
      SELECT ('G' || gx || '_' || gy) AS gadm_key
      FROM (SELECT unnest(range({world.N_GADM_AXIS})) AS gx), (SELECT unnest(range({world.N_GADM_AXIS})) AS gy)
    )
    SELECT gadm_key FROM keys
    WHERE gadm_key NOT IN (
      SELECT {_GADM_SQL} FROM pages WHERE has_geo
    )"""
)


# ---------------------------------------------------------------------------
# dedup

def q_dedup_exact(sf_dir: str):
    """Exact dedup (D6): 62-bit text digest hash-partition, keep the
    smallest doc_id. The digest is the vectorized two-modulus
    polynomial hash (`stages/hashing.py::hash_strings62`) — no per-row
    Python in the map stage."""
    import ray.data

    from .stages.hashing import hash_strings62

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_h62(batch: pa.Table) -> pa.Table:
        h = hash_strings62(batch.column("text"))
        return pa.table({"text_h62": pa.array(h, pa.int64()), "doc_id": batch.column("doc_id")})

    return ds.map_batches(add_h62, batch_format="pyarrow").groupby("text_h62").min("doc_id").map_batches(
        lambda b: pa.table({"text_h62": b.column("text_h62"), "doc_id": b.column("min(doc_id)")}),
        batch_format="pyarrow",
    )


def _sql_dedup_exact() -> str:
    from .stages.hashing import sql_h62

    return f"SELECT {sql_h62('text')} AS text_h62, MIN(doc_id) AS doc_id FROM documents GROUP BY 1"


# ---------------------------------------------------------------------------
# relational operators over the TPC-H-ish tables (integer-exact sums)

def q_lineitem_pricing(sf_dir: str):
    """Groupby-aggregate (A4 pattern, TPC-H Q1 shape). Money sums are
    exact integer cents so they hash identically to the oracle."""
    import ray.data

    ds = _read_parquet_clean(f"{sf_dir}/lineitem.parquet")

    def partial(batch: pa.Table) -> pa.Table:
        price_c = _cents(batch.column("l_extendedprice"))
        qty_c = _cents(batch.column("l_quantity"))
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "price_cents": price_c,
                "qty_cents": qty_c,
            }
        )
        return (
            t.group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("price_cents", "sum"), ("qty_cents", "sum"), ([], "count_all")])
            .rename_columns(["l_returnflag", "l_linestatus", "price_cents", "qty_cents", "n"])
        )

    # the partial output is #blocks x #groups rows (tiny): collapse to
    # one partition so the final groupby emits no empty (schema-less)
    # shuffle partitions (source of Ray's RefBundle schema warnings)
    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["price_cents", "qty_cents", "n"])
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "sum_price_cents": b.column("sum(price_cents)"),
                "sum_qty_cents": b.column("sum(qty_cents)"),
                "n_rows": b.column("sum(n)"),
            }
        ),
        batch_format="pyarrow",
    )


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_segment_revenue(sf_dir: str):
    """Multi-way hash join (J6 pattern): lineitem ⋈ orders ⋈ customer →
    revenue cents per market segment. Small dims are joined via
    broadcast lookup inside map_batches (no shuffle join needed)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    orders = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    okey = orders.column("o_orderkey").to_numpy()
    ocust = orders.column("o_custkey").to_numpy()
    ckey = cust.column("c_custkey").to_numpy()
    cseg = np.asarray(cust.column("c_mktsegment").to_pylist())
    # dense lookups; -1 / "" sentinels mark dangling keys, which the
    # join DROPS (inner-join semantics, matching the SQL oracle)
    o2c = np.full(int(okey.max()) + 1 if len(okey) else 1, -1, dtype=np.int64)
    o2c[okey] = ocust
    c2s = np.full(int(ckey.max()) + 1 if len(ckey) else 1, "", dtype=object)
    c2s[ckey] = cseg
    lookup_ref = ray.put((o2c, c2s))

    ds = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def join_batch(batch: pa.Table) -> pa.Table:
        o2c_, c2s_ = ray.get(lookup_ref)
        ok = batch.column("l_orderkey").to_numpy()
        custk = o2c_[np.clip(ok, 0, len(o2c_) - 1)]
        custk[(ok < 0) | (ok >= len(o2c_))] = -1
        # both bounds clamped: a dangling o_custkey above max(c_custkey)
        # must drop like a dangling l_orderkey, not crash the task
        in_c = (custk >= 0) & (custk < len(c2s_))
        seg = np.where(in_c, c2s_[np.clip(custk, 0, len(c2s_) - 1)], "")
        matched = in_c & (seg != "")
        batch = batch.filter(pa.array(matched))  # inner-join drop
        seg = seg[matched]
        price = batch.column("l_extendedprice").to_numpy()
        disc = batch.column("l_discount").to_numpy()
        # revenue in exact integer: cents(price) * (100 - cents(disc*100))
        price_c = np.floor(price * 100 + 0.5).astype(np.int64)
        disc_pct = np.floor(disc * 100 + 0.5).astype(np.int64)
        rev = price_c * (100 - disc_pct)
        t = pa.table({"c_mktsegment": pa.array(seg.tolist(), pa.string()), "rev": pa.array(rev)})
        return t.group_by("c_mktsegment").aggregate([("rev", "sum"), ([], "count_all")]).rename_columns(
            ["c_mktsegment", "rev", "n"]
        )

    agg = (
        ds.map_batches(join_batch, batch_format="pyarrow")
        .repartition(1)  # tiny partial stream: no empty shuffle partitions
        .groupby("c_mktsegment")
        .sum(["rev", "n"])
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "c_mktsegment": b.column("c_mktsegment"),
                "revenue_x10000": b.column("sum(rev)"),
                "n_items": b.column("sum(n)"),
            }
        ),
        batch_format="pyarrow",
    )


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_x10000,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_events_hourly(sf_dir: str):
    """Time-bucketed rollup over the events stream table."""
    import ray.data

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet")

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()  # µs epoch
        hour = ts // 3_600_000_000
        val_c = _cents(batch.column("value"))
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour": pa.array(hour),
                "val_cents": val_c,
            }
        )
        return (
            t.group_by(["event_type", "hour"])
            .aggregate([("val_cents", "sum"), ([], "count_all")])
            .rename_columns(["event_type", "hour", "v", "n"])
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(["event_type", "hour"]).sum(["v", "n"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "event_type": b.column("event_type"),
                "hour": b.column("hour"),
                "sum_value_cents": b.column("sum(v)"),
                "n_events": b.column("sum(n)"),
            }
        ),
        batch_format="pyarrow",
    )


SQL_EVENTS_HOURLY = """
SELECT event_type,
       CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# text analysis (training-data pipeline operators)

def _docs(sf_dir: str):
    import ray.data

    return _read_parquet_clean(f"{sf_dir}/documents.parquet")


def q_token_counts(sf_dir: str):
    from .stages.textops import token_counts

    return _docs(sf_dir).map_batches(token_counts, batch_format="pyarrow")


def _sql_token_counts() -> str:
    from .stages.textops import BPE_RE

    return f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""


def q_text_quality(sf_dir: str):
    from .stages.textops import quality_score

    return _docs(sf_dir).map_batches(quality_score, batch_format="pyarrow")


def _sql_text_quality() -> str:
    from .stages.textops import STOPWORDS

    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words, strlen(text) AS n_chars
  FROM documents
)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST((n_chars - (len(words) - 1)) * 100 // len(words) AS BIGINT) AS mean_wlen_x100,
       CAST(len(list_filter(words, x -> x IN ({stops}))) AS BIGINT) AS stopword_hits,
       CAST(CASE WHEN len(words) < 20 THEN 0 WHEN len(words) < 60 THEN 1 ELSE 2 END AS BIGINT) AS quality_bucket
FROM w
"""


def q_quality_filter(sf_dir: str):
    """Training-data quality FILTER (the curation step downstream of
    quality scoring): keep documents with ≥ 20 words, ≥ 1 stopword
    hit, and mean word length ≤ 9.0 chars — the standard heuristic
    gate (Gopher/C4-style rules) over the engine's exact-integer
    quality features. Output: kept doc ids + their quality bucket."""
    from .stages.textops import quality_score

    scored = _docs(sf_dir).map_batches(quality_score, batch_format="pyarrow")

    def keep(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(b.column("n_words"), 20),
                pc.greater_equal(b.column("stopword_hits"), 1),
            ),
            pc.less_equal(b.column("mean_wlen_x100"), 900),
        )
        return pa.table(
            {"doc_id": b.column("doc_id"), "quality_bucket": b.column("quality_bucket")}
        ).filter(mask)

    return scored.map_batches(keep, batch_format="pyarrow")


def _sql_quality_filter() -> str:
    return f"""
WITH q AS ({_sql_text_quality()})
SELECT doc_id, quality_bucket FROM q
WHERE n_words >= 20 AND stopword_hits >= 1 AND mean_wlen_x100 <= 900
"""


DECON_EVAL_MOD = 50  # doc_id % 50 == 0 rows form the held-out eval set


def q_decontaminate(sf_dir: str):
    """Benchmark DECONTAMINATION — the training-data anti-join every
    LLM pipeline needs: drop any training document sharing a 3-word
    shingle with the held-out eval set (doc_id % 50 == 0). Shape: the
    same inverted-index shuffle as dedup_jaccard — shingle rows with
    an is_eval flag → ONE bounded-bucket shuffle marks train docs
    whose shingle string also occurs in an eval doc → flag-union →
    groupby(doc_id).max keeps clean train docs. No broadcast eval
    set, no driver compute."""
    import ray.data

    from functools import partial

    from .stages.dedup import JACCARD_BUCKETS, doc_shingle_rows

    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # ~32 distinct shingles per doc enter the shuffle
    sb_n = _buckets(sf_dir, JACCARD_BUCKETS, fanout=32)
    rows = docs.map_batches(
        partial(doc_shingle_rows, n_buckets=sb_n), batch_format="pyarrow"
    )

    def contaminated(group: pa.Table) -> pa.Table:
        """Per shingle-bucket: train docs sharing a shingle string with
        any eval doc (vectorized run pass over the sorted group)."""
        from .stages.dedup import _sorted_runs

        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "dropped": pa.array([], pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        g, run_start = _sorted_runs(group, "shingle")
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        is_eval = d % DECON_EVAL_MOD == 0
        hits = []
        for i in range(len(run_start) - 1):
            lo, hi = run_start[i], run_start[i + 1]
            if is_eval[lo:hi].any():
                hits.append(d[lo:hi][~is_eval[lo:hi]])
        if not hits:
            return empty
        bad = np.unique(np.concatenate(hits))
        return pa.table(
            {
                "doc_id": pa.array(bad, pa.int64()),
                "dropped": pa.array(np.ones(len(bad), np.int64)),
            }
        )

    flagged = (
        rows.repartition(_rwidth(sf_dir, sb_n, fanout=32))
        .groupby("sb")
        .map_groups(contaminated, batch_format="pyarrow")
    )
    def train_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ids % DECON_EVAL_MOD != 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "dropped": pa.array(np.zeros(int(keep.sum()), np.int64)),
            }
        )

    train = docs.map_batches(train_rows, batch_format="pyarrow")
    # every id in train ∪ flagged is non-eval by construction, so the
    # shared anti-join tail needs no extra eval recheck
    return _keep_unflagged(train, flagged)


def _sql_decontaminate() -> str:
    return f"""
WITH {_SQL_SHINGLES},
shu AS (SELECT doc_id, unnest(list_distinct(sh_list)) AS s FROM sh),
eval_sh AS (SELECT DISTINCT s FROM shu WHERE doc_id % {DECON_EVAL_MOD} = 0)
SELECT doc_id FROM documents
WHERE doc_id % {DECON_EVAL_MOD} != 0
  AND doc_id NOT IN (
    SELECT DISTINCT doc_id FROM shu
    WHERE s IN (SELECT s FROM eval_sh) AND doc_id % {DECON_EVAL_MOD} != 0
  )
"""


SAMPLE_PER_MILLE = {"0": 400, "1": 150, "2": 150}  # keep-rate ‰ per quality bucket


def q_corpus_sample(sf_dir: str):
    """Deterministic STRATIFIED corpus sampling (the downsampling step
    of a data-mixture recipe): per quality bucket, keep documents whose
    url-hash lands under the bucket's per-mille rate — reproducible
    across runs and machines (the polynomial hash family, not RNG),
    exactly mirrored in SQL. Output: kept doc ids + bucket."""
    from .stages.hashing import hash_strings
    from .stages.textops import quality_score

    scored = _docs(sf_dir).map_batches(quality_score, batch_format="pyarrow")

    rate_lut = np.array(
        [SAMPLE_PER_MILLE[str(k)] for k in range(len(SAMPLE_PER_MILLE))], dtype=np.int64
    )

    def keep(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        bucket = b.column("quality_bucket").to_numpy(zero_copy_only=False)
        h = hash_strings(pc.cast(b.column("doc_id"), pa.string())) % 1000
        m = h < rate_lut[bucket]
        return pa.table(
            {
                "doc_id": pa.array(ids[m], pa.int64()),
                "quality_bucket": pa.array(bucket[m], pa.int64()),
            }
        )

    return scored.map_batches(keep, batch_format="pyarrow")


def _sql_corpus_sample() -> str:
    from .stages.hashing import sql_h31

    cases = " ".join(
        f"WHEN quality_bucket = {k} THEN {v}" for k, v in SAMPLE_PER_MILLE.items()
    )
    return f"""
WITH q AS ({_sql_text_quality()})
SELECT doc_id, quality_bucket FROM q
WHERE ({sql_h31('CAST(doc_id AS VARCHAR)')}) % 1000 < (CASE {cases} END)
"""


def q_redact_pii(sf_dir: str):
    """PII scrub over the corpus (emails/phones → typed placeholders),
    vectorized RE2 replace with per-doc redaction counts."""
    from .stages.textops import redact_pii

    return _docs(sf_dir).map_batches(redact_pii, batch_format="pyarrow")


def _sql_redact_pii() -> str:
    from .stages.textops import PII_PATTERNS

    expr = "text"
    count_terms = []
    for pat, repl in PII_PATTERNS:
        count_terms.append(f"len(regexp_extract_all(text, '{pat}'))")
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    counts = " + ".join(count_terms)
    return f"""
SELECT doc_id, {expr} AS clean_text, CAST({counts} AS BIGINT) AS n_redactions
FROM documents
"""


def q_lang_id(sf_dir: str):
    from .stages.textops import lang_id

    return _docs(sf_dir).map_batches(lang_id, batch_format="pyarrow")


def _sql_lang_id() -> str:
    from .stages.textops import LANG_ORDER, LANG_PROFILES, UND

    score_cols = ", ".join(
        f"len(list_filter(words, x -> x IN ({', '.join(repr(w) for w in LANG_PROFILES[c])}))) AS s_{c}"
        for c in LANG_ORDER
    )
    # first maximal score in LANG_ORDER wins (argmax tie-break: CASE
    # evaluates in order, ties satisfy >= for both, earliest fires)
    cases = []
    for c in LANG_ORDER:
        conds = [f"s_{c} >= s_{o}" for o in LANG_ORDER if o != c]
        cases.append(f"WHEN s_{c} > 0 AND {' AND '.join(conds)} THEN '{c}'")
    case_sql = " ".join(cases)
    return f"""
WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
s AS (SELECT doc_id, lang, {score_cols} FROM w)
SELECT doc_id,
       CASE {case_sql} ELSE '{UND}' END AS lang_pred,
       lang AS lang_meta
FROM s
"""


def q_lang_id_trigram(sf_dir: str):
    from .stages.textops import lang_id_trigram

    return _docs(sf_dir).map_batches(lang_id_trigram, batch_format="pyarrow")


def _sql_lang_id_trigram() -> str:
    from .stages.textops import TRI_ORDER, TRIGRAM_PROFILES, UND

    score_cols = ", ".join(
        f"""len(list_filter(list_transform(range(1, strlen(text) - 1),
              i -> substr(text, CAST(i AS INT), 3)),
              g -> g IN ({', '.join(repr(g) for g in TRIGRAM_PROFILES[c])}))) AS s_{c}"""
        for c in TRI_ORDER
    )
    cases = []
    for c in TRI_ORDER:
        conds = [f"s_{c} >= s_{o}" for o in TRI_ORDER if o != c]
        cases.append(f"WHEN s_{c} > 0 AND {' AND '.join(conds)} THEN '{c}'")
    return f"""
WITH s AS (SELECT doc_id, {score_cols} FROM documents)
SELECT doc_id,
       CASE {' '.join(cases)} ELSE '{UND}' END AS lang_pred3,
       CAST(GREATEST(s_de, s_en, s_es, s_fr) AS BIGINT) AS top_score
FROM s
"""


def q_fingerprint(sf_dir: str):
    from .stages.textops import fingerprint

    return _docs(sf_dir).map_batches(fingerprint, batch_format="pyarrow")


def _sql_fingerprint() -> str:
    from .stages.hashing import A_CHAR, P31, sql_h31
    from .stages.textops import FP_GRAM

    g = FP_GRAM
    gram_h = (
        f"list_reduce(list_transform(range(0, {g}), "
        f"j -> CAST(ord(substr(text, CAST(i + j AS INT), 1)) + 1 AS BIGINT)), "
        f"(h, c) -> (h * {A_CHAR} + c) % {P31})"
    )
    return f"""
WITH grams AS (
  SELECT doc_id,
    CASE WHEN strlen(text) < {g}
      THEN [{sql_h31('text')}]
      ELSE list_transform(range(1, strlen(text) - {g} + 2), i -> {gram_h})
    END AS hs
  FROM documents
)
SELECT doc_id, md5(text) AS text_md5, CAST(list_min(hs) AS BIGINT) AS min_gram_h
FROM grams JOIN documents USING (doc_id)
"""


# ---------------------------------------------------------------------------
# dedup suite

_SQL_SHINGLES = """
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT doc_id,
    CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
      ELSE list_transform(range(1, len(words) - 1),
             i -> words[CAST(i AS INT)] || ' ' || words[CAST(i AS INT) + 1] || ' ' || words[CAST(i AS INT) + 2])
    END AS sh_list
  FROM w
)
"""


def _minhash_pairs(sf_dir: str):
    """Distinct MinHash+LSH candidate pairs as a Dataset — the shared
    front half of dedup_minhash and dedup_clusters. Band-bucket count
    is INPUT-SCALED (band rows = 4/doc); the distinct pass rides the
    bounded ``add_pair_hash`` bucket + a vectorized in-group dedup,
    never a Ray group per distinct pair (the tiny-groups pathology)."""
    from functools import partial

    from .stages.dedup import (
        BAND_BUCKETS,
        PAIR_BUCKETS,
        add_bucket_hash,
        add_pair_hash,
        band_bucket_pairs,
        distinct_pairs_group,
        minhash_signatures,
    )

    bb_n = _buckets(sf_dir, BAND_BUCKETS, fanout=4)
    pb_n = _buckets(sf_dir, PAIR_BUCKETS, fanout=4)
    ds = _docs(sf_dir).map_batches(minhash_signatures, batch_format="pyarrow")
    ds = ds.map_batches(
        partial(add_bucket_hash, n_buckets=bb_n), batch_format="pyarrow"
    )
    pairs = (
        ds.repartition(_rwidth(sf_dir, bb_n, fanout=4))
        .groupby("bb")
        .map_groups(band_bucket_pairs, batch_format="pyarrow")
    )

    def add_pb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_a" not in b.column_names:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "pb": pa.array([], pa.int64()),
                }
            )
        return add_pair_hash(b, n_buckets=pb_n)

    return (
        pairs.map_batches(add_pb, batch_format="pyarrow")
        .repartition(_rwidth(sf_dir, pb_n, fanout=4))
        .groupby("pb")
        .map_groups(distinct_pairs_group, batch_format="pyarrow")
        .map_batches(
            lambda b: pa.table(
                {
                    "doc_a": b.column("doc_a") if "doc_a" in b.column_names
                    else pa.array([], pa.int64()),
                    "doc_b": b.column("doc_b") if "doc_b" in b.column_names
                    else pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH candidate pairs: signature map → ONE shuffle on the
    bounded band-key hash bucket → vectorized per-band-bucket pairs →
    distinct (constant group count; per-group overhead on ~|corpus|
    raw band keys dominated the old shape)."""
    return _minhash_pairs(sf_dir)


_SQL_MINHASH_PAIRS_SELECT = """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM band a JOIN band b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id"""


def _sql_minhash_ctes() -> str:
    """The shingle→signature→band CTE chain (no WITH keyword), shared
    by the minhash-pairs oracle and the cluster oracle built on it."""
    from .stages.dedup import BAND
    from .stages.hashing import P31, sql_h31, sql_salt_table

    return f"""{_SQL_SHINGLES},
shu AS (SELECT doc_id, unnest(sh_list) AS s FROM sh),
shh AS (SELECT doc_id, {sql_h31('s')} AS hs FROM shu),
sig AS (
  SELECT doc_id, salt, min((a * hs + b) % {P31}) AS h
  FROM shh, ({sql_salt_table()})
  GROUP BY 1, 2
),
band AS (
  SELECT doc_id, salt // {BAND} AS band,
         string_agg(CAST(h AS VARCHAR), ':' ORDER BY salt) AS key
  FROM sig GROUP BY 1, 2
)"""


def _sql_dedup_minhash() -> str:
    return f"WITH {_sql_minhash_ctes()} {_SQL_MINHASH_PAIRS_SELECT}"


def q_dedup_simhash(sf_dir: str):
    from .stages.dedup import simhash

    return _docs(sf_dir).map_batches(simhash, batch_format="pyarrow")


def _sql_dedup_simhash() -> str:
    from .stages.dedup import SIMHASH_BITS

    bit_terms = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    from .stages.hashing import sql_h31

    return f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
h AS (SELECT doc_id, {sql_h31('word')} AS h FROM w)
SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash
FROM h GROUP BY doc_id
"""


def q_dedup_jaccard(sf_dir: str):
    """Exact 3-shingle Jaccard ≥ 0.2 similarity join — the
    INVERTED-INDEX COUNT JOIN: per-doc distinct shingle strings (one
    vectorized pass) → ONE shuffle on the shingle-hash bucket →
    co-occurrence pair rows per shared shingle → ONE shuffle on the
    pair-hash bucket → run-length count = |A∩B| → jaccard from the
    carried set sizes. Two all-to-alls, zero joins, zero per-pair
    Python, no broadcast corpus, no driver compute; string-exact,
    equals the all-pairs oracle bit-for-bit."""
    import ray.data

    from functools import partial

    from .stages.dedup import (
        JACCARD_BUCKETS,
        PAIR_BUCKETS,
        add_pair_hash,
        doc_shingle_rows,
        pair_jaccard_agg,
        shingle_cooccur_pairs,
    )

    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sb_n = _buckets(sf_dir, JACCARD_BUCKETS, fanout=32)  # shingle rows/doc
    pb_n = _buckets(sf_dir, PAIR_BUCKETS, fanout=8)      # co-occur rows/doc
    rows = docs.map_batches(
        partial(doc_shingle_rows, n_buckets=sb_n), batch_format="pyarrow"
    )
    pairs = (
        rows.repartition(_rwidth(sf_dir, sb_n, fanout=32))
        .groupby("sb")
        .map_groups(shingle_cooccur_pairs, batch_format="pyarrow")
    )
    pairs = pairs.map_batches(
        partial(add_pair_hash, n_buckets=pb_n), batch_format="pyarrow"
    )
    return (
        pairs.repartition(_rwidth(sf_dir, pb_n, fanout=8))
        .groupby("pb")
        .map_groups(pair_jaccard_agg, batch_format="pyarrow")
    )


SQL_DEDUP_JACCARD = f"""
WITH {_SQL_SHINGLES},
sets AS (SELECT doc_id, list_distinct(sh_list) AS s FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.s, b.s)) AS inter,
         len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(1000 * inter // uni AS BIGINT) AS jaccard_x1000
FROM pairs WHERE inter > 0 AND 1000 * inter // uni >= 200
"""


def q_dedup_embedding(sf_dir: str):
    """Embedding-cosine near-dup pairs (cos ≥ 0.4 — the synthetic
    embeddings have no true dups; threshold set to exercise the pair
    path). Exact BLOCK similarity join: the corpus is split into row
    chunks; one task per unordered chunk pair loads only its two
    chunks (row-group-pruned read, worker-cached) and matmuls them.
    Worker memory = 2 chunks, never the corpus; no broadcast, no
    driver compute. Sub-quadratic web-scale alternative: the IVF/SRP
    bucketed ANN path (`stages/similarity.py`)."""
    import pyarrow.parquet as pq
    import ray.data

    from .stages.dedup import make_chunk_pair_fn

    path = f"{sf_dir}/embeddings.parquet"
    n = pq.read_metadata(path).num_rows
    ch = 1024
    bounds = [(s, min(s + ch, n)) for s in range(0, n, ch)]
    items = [
        {"a_start": a0, "a_end": a1, "b_start": b0, "b_end": b1}
        for i, (a0, a1) in enumerate(bounds)
        for (b0, b1) in bounds[i:]
    ]
    ds = ray.data.from_items(items)
    return ds.map_batches(
        make_chunk_pair_fn(path, threshold=0.4), batch_format="pyarrow", batch_size=1
    )


SQL_DEDUP_EMBEDDING = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(
        list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.4
ORDER BY vec_a, vec_b
"""


_EMPTY_PAIR_PB = pa.table(
    {
        "vec_a": pa.array([], pa.int64()),
        "vec_b": pa.array([], pa.int64()),
        "pb": pa.array([], pa.int64()),
    }
)

EMB_TRAIN_SAMPLE = 20_000  # min vectors read onto the driver for
# k-means / codebook training — everything else stays distributed
TRAIN_PER_LIST = 40  # k-means needs ~30-50 training vectors per
# centroid; the sample cap grows with the requested list count so the
# quantizer never silently degenerates (review r4: a fixed 20k sample
# clamped min(n_lists, len(x)) back to 20k lists of ~1 point each)
MAX_TRAIN_LISTS = 1 << 15  # single-level IVF ceiling: 32768 lists ×
# 40 train vecs × 512 B ≈ 670 MB driver sample. Past it the TWO-LEVEL
# quantizer takes over (similarity.train_hier_quantizer: coarse driver
# k-means + distributed per-cell fine training — the driver holds
# centroids only), so the ceiling is a dispatch point, not a limit.


def _embedding_sample(path: str, cap: int = EMB_TRAIN_SAMPLE) -> np.ndarray:
    """STRIDED row-group sample of the embeddings table (≤ ``cap``
    rows) as a float matrix — the driver's training sample. Row groups
    are taken evenly across the file, not head-first: real corpora are
    written in crawl/host order, which correlates with embedding
    clusters, and a head sample would leave tail clusters without
    centroids. At every test sf the table fits the cap whole, so
    behavior there is unchanged."""
    import pyarrow.parquet as pq

    from .stages.similarity import embedding_matrix

    pf = pq.ParquetFile(path)
    total = pf.metadata.num_rows
    if total <= cap:
        t = pf.read(columns=["embedding"])
    else:
        nrg = pf.num_row_groups
        rows_per_rg = max(1, total // nrg)
        need = min(nrg, -(-cap // rows_per_rg))
        idx = np.unique(np.linspace(0, nrg - 1, num=need).astype(np.int64))
        t = pa.concat_tables(
            pf.read_row_group(int(i), columns=["embedding"]) for i in idx
        ).slice(0, cap)
    return embedding_matrix(t.column("embedding"))


def _hier_quantizer(path: str, n: int, n_lists_req: int):
    """Shared two-level-quantizer build for the beyond-ceiling ANN
    paths: coarse driver k-means from the strided sample, then
    DISTRIBUTED per-cell fine training over a deterministic every-k-th
    vec_id sample (map-side filter — no driver data). Returns
    (coarse, subs_flat, cell_off). ONE home for the stride/coarse
    rules so the dedup and top-k dispatches cannot drift."""
    from .stages.similarity import (
        HIER_COARSE,
        ivf_centroids,
        train_hier_quantizer,
    )

    coarse = ivf_centroids(_embedding_sample(path), n_lists=HIER_COARSE)
    subs_per_cell = -(-n_lists_req // HIER_COARSE)
    stride = max(1, n // (TRAIN_PER_LIST * n_lists_req))

    def train_rows(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(ids % stride == 0))

    subs_flat, cell_off = train_hier_quantizer(
        _read_parquet_clean(path).map_batches(train_rows, batch_format="pyarrow"),
        coarse,
        subs_per_cell,
    )
    return coarse, subs_flat, cell_off


def q_dedup_embedding_ann(sf_dir: str):
    """The REGISTERED scale path for embedding near-dup (VERDICT r3:
    the exact chunk-pair join stays as the validation oracle, this IVF
    route is the 100 TB default): k-means coarse quantizer trained on
    a sample → each vector replicated to its top-2 nearest lists → one
    within-list all-pairs matmul per list (O(Σ bᵢ²), list size bounded
    when n_lists scales with the corpus) → one bounded pair-bucket
    distinct pass. Approximate by design → rows-only check; recall vs
    the exact pair set is golden-tested (tests/test_stages.py)."""
    from .stages.dedup import PAIR_BUCKETS, add_pair_hash
    from .stages.scaling import dynamic_buckets, parquet_rows
    from .stages.similarity import (
        ivf_centroids,
        make_hier_dedup_assign,
        make_ivf_dedup_assign,
        make_ivf_pair_fn,
        pair_distinct,
    )

    from .stages.similarity import IVF_DEDUP_PROBES

    path = f"{sf_dir}/embeddings.parquet"
    n = parquet_rows(path)
    # lists scale with the corpus so a list's all-pairs stays bounded;
    # the TRAINING SAMPLE scales with the list count (TRAIN_PER_LIST
    # vectors per centroid) so the quantizer never degenerates. PAST
    # the single-level ceiling the TWO-LEVEL quantizer takes over:
    # coarse driver k-means + DISTRIBUTED per-cell fine training, so
    # the driver holds centroids only (never a list-count-linear
    # sample). Both paths feed the identical downstream pipeline.
    n_lists_req = dynamic_buckets(n, 16, rows_per_group=10_000)
    ds = _read_parquet_clean(path)
    if n_lists_req <= MAX_TRAIN_LISTS:
        emb = _embedding_sample(
            path, cap=max(EMB_TRAIN_SAMPLE, TRAIN_PER_LIST * n_lists_req)
        )
        cents = ivf_centroids(emb, n_lists=n_lists_req)
        # reduce-partition count ≤ lists the SAMPLE probes into —
        # k-means can leave lists empty, and partitions > non-empty
        # groups emit SCHEMA-LESS blocks (the CLAUDE.md hazard).
        # Undercounting from the sample is safe (fewer partitions,
        # never empty ones), so used_n comes from a small STRIDED
        # subsample scored in bounded chunks (the nearest_centroid
        # invariant — a full (sample × n_lists) score matrix is
        # hundreds of GB at the MAX_TRAIN_LISTS ceiling), with early
        # exit once the min(16, used_n) consumer is saturated.
        emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        p = min(IVF_DEDUP_PROBES, len(cents))
        sub = emb_n[:: max(1, len(emb_n) // 4096)][:4096]
        seen: set = set()
        for s0 in range(0, len(sub), 512):
            top = np.argpartition(
                -(sub[s0 : s0 + 512] @ cents.T), p - 1, axis=1
            )[:, :p]
            seen.update(np.unique(top).tolist())
            if len(seen) >= 16:
                break
        used_n = len(seen)
        assigned = ds.map_batches(make_ivf_dedup_assign(cents), batch_format="pyarrow")
    else:
        coarse, subs_flat, cell_off = _hier_quantizer(path, n, n_lists_req)
        used_n = 16  # pair rows >> 16 on any corpus this deep
        assigned = ds.map_batches(
            make_hier_dedup_assign(coarse, subs_flat, cell_off),
            batch_format="pyarrow",
        )
    pb_n = dynamic_buckets(n, PAIR_BUCKETS)
    pairs = (
        assigned.repartition(max(1, min(16, used_n)))
        .groupby("bucket")
        .map_groups(make_ivf_pair_fn(threshold=0.4), batch_format="pyarrow")
    )

    def add_pb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vec_a" not in b.column_names:
            # an EMPTY IVF list's reduce partition emits a schema-less
            # block (the CLAUDE.md hazard) — re-type it here
            return _EMPTY_PAIR_PB
        return add_pair_hash(b, n_buckets=pb_n, a_col="vec_a", b_col="vec_b")

    # input-scaled reduce width (CLAUDE.md: never a fixed repartition(8)
    # on a full-corpus stream — the candidate-pair stream grows with the
    # corpus); the repartition doubles as the launder for any schema-less
    # empty blocks the IVF-list map_groups emitted, so no mid-pipeline
    # materialize/count pass is needed.
    pw = _rwidth(sf_dir, pb_n, table="embeddings", fanout=4)
    keyed = pairs.map_batches(add_pb, batch_format="pyarrow")
    return (
        keyed.repartition(pw)
        .groupby("pb")
        .map_groups(pair_distinct, batch_format="pyarrow")
        # a pb reduce partition that received no groups emits a
        # schema-less block a map_batches re-type can never see (Ray
        # skips zero-row blocks); this repartition rebuilds blocks
        # under the surviving (vec_a, vec_b) schema
        .repartition(min(8, pw))
    )


def q_dedup_corpus(sf_dir: str):
    """The deduplicated corpus: drop every doc that shares an LSH
    bucket with a smaller doc_id (deterministic keep-bucket-minimum
    policy — the per-group-first of D1/D6 applied to near-dup
    clusters). Output: kept doc ids.

    Scale shape: a pure shuffle anti-join — drop flags from the bucket
    groups union the full id set, then one ``groupby(doc_id).max``
    keeps rows never flagged. Nothing materializes on the driver (at
    web scale the drop set is 30-50% of the corpus)."""
    import ray.data

    from functools import partial

    from .stages.dedup import (
        BAND_BUCKETS,
        add_bucket_hash,
        band_bucket_drops,
        minhash_signatures,
    )

    bb_n = _buckets(sf_dir, BAND_BUCKETS, fanout=4)  # band rows/doc
    sig = _docs(sf_dir).map_batches(minhash_signatures, batch_format="pyarrow")
    sig = sig.map_batches(
        partial(add_bucket_hash, n_buckets=bb_n), batch_format="pyarrow"
    )
    flagged = (
        sig.repartition(_rwidth(sf_dir, bb_n, fanout=4))
        .groupby("bb")
        .map_groups(band_bucket_drops, batch_format="pyarrow")
    )
    return _keep_unflagged(_zero_flag_docs(sf_dir), flagged)


def _sql_dedup_corpus() -> str:
    pairs = _sql_dedup_minhash()
    return f"""
WITH pairs AS ({pairs})
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
"""


# ---------------------------------------------------------------------------
# similarity search (ANN top-k)

def _load_query_vectors(sf_dir: str, with_sample: bool = True):
    """(query ObjectRef, bounded TRAINING sample, query matrix, query
    ids). Queries are the vec_id % 100 == 0 rows, gathered by a
    STREAMED batch scan (driver memory = the query set, never the
    corpus); the second element is ``_embedding_sample`` — the strided
    ≤20k-row quantizer/codebook training matrix, which IS the whole
    table at every test sf (identical behavior there). Callers that
    don't train (ann_topk, ann_stream — AnnQueryStream draws its own
    sample) pass ``with_sample=False`` to skip that second strided
    parquet read entirely (None in its slot)."""
    import pyarrow.parquet as pq

    from .stages.similarity import embedding_matrix, put_queries

    path = f"{sf_dir}/embeddings.parquet"
    pf = pq.ParquetFile(path)
    id_parts, mat_parts = [], []
    for rb in pf.iter_batches(columns=["vec_id", "embedding"], batch_size=65_536):
        ids = rb.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
        m = ids % 100 == 0
        if m.any():
            id_parts.append(ids[m])
            mat_parts.append(
                embedding_matrix(pa.Table.from_batches([rb]).column("embedding"))[m]
            )
    qids = np.concatenate(id_parts)
    qmat = np.concatenate(mat_parts)
    emb = _embedding_sample(path) if with_sample else None
    return put_queries(qmat, qids), emb, qmat, qids

def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10: per-batch local top-k vs broadcast
    queries (vec_id % 100 == 0), then a small per-query merge."""
    import ray.data

    from .stages.similarity import make_topk_fn, merge_topk

    qref, _, _, _ = _load_query_vectors(sf_dir, with_sample=False)
    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet")
    local = ds.map_batches(make_topk_fn(qref, k=10), batch_format="pyarrow")
    return local.repartition(1).groupby("query_id").map_groups(
        lambda g: merge_topk(g, k=10), batch_format="pyarrow"
    )  # candidate set is k x queries x batches rows - one partition


SQL_ANN_TOPK = """
SELECT q.vec_id AS query_id,
       CAST(row_number() OVER (
         PARTITION BY q.vec_id
         ORDER BY list_cosine_similarity(
           list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(v.embedding, x -> CAST(x AS DOUBLE))) DESC, v.vec_id
       ) AS BIGINT) AS rank,
       v.vec_id
FROM embeddings q JOIN embeddings v ON q.vec_id % 100 = 0
QUALIFY rank <= 10
"""


def q_ann_topk_lsh(sf_dir: str):
    """SRP-bucketed approximate top-k with a PARTITION-PRUNED read:
    the embeddings are Hive-partitioned by SRP bucket (built once);
    the scan reads only the queries' multi-probe partitions
    (own + Hamming-1 buckets). No SQL oracle — approximate recall by
    design; rows-only check + pruning pytest."""
    import ray.data

    from .stages.scaling import parquet_rows
    from .stages.similarity import (
        build_srp_partitions,
        bucket_of,
        make_bucketed_topk_fn,
        merge_topk,
        probed_paths,
        srp_n_planes_for,
        srp_planes,
        srp_probe_set,
    )

    qref, emb, qmat, _ = _load_query_vectors(sf_dir)
    # plane count scales with the corpus (avg bucket ≤ ~10k rows) so
    # the radius-2 multiprobe read fraction SHRINKS as the corpus
    # grows; every test sf stays at the tuned 8-plane operating point
    n_planes = srp_n_planes_for(parquet_rows(f"{sf_dir}/embeddings.parquet"))
    planes = srp_planes(emb.shape[1], n_planes=n_planes)
    root = build_srp_partitions(sf_dir, planes)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    paths = probed_paths(
        root, srp_probe_set(bucket_of(qn, planes), n_planes=n_planes)
    )

    ds = _read_probed_embeddings(paths)
    local = ds.map_batches(
        make_bucketed_topk_fn(qref, planes, k=10), batch_format="pyarrow"
    )
    return local.repartition(1).groupby("query_id").map_groups(
        lambda g: merge_topk(g, k=10), batch_format="pyarrow"
    )  # candidate set is k x queries x batches rows - one partition


def q_ann_topk_ivf(sf_dir: str):
    """IVF-bucketed approximate top-k with a PARTITION-PRUNED read
    (scale path 2, beside SRP-LSH): k-means coarse quantizer trained
    once, embeddings Hive-partitioned by nearest-list id, queries read
    only their top-4 probed list partitions. Approximate by design →
    rows-only check + pruning pytest."""
    import ray.data

    from .stages.similarity import (
        build_ivf_partitions,
        ivf_centroids,
        ivf_probe,
        make_ivf_topk_fn,
        merge_topk,
        probed_paths,
    )
    from .stages.scaling import dynamic_buckets, parquet_rows

    qref, emb, qmat, _ = _load_query_vectors(sf_dir)
    # list count scales with the corpus (list size ≈ 125 vectors) so
    # NPROBE/n_lists — the per-query read fraction — SHRINKS as the
    # corpus grows instead of each list growing unboundedly; at the
    # test scales (≤2000 vectors) the floor of 16 is in effect and
    # behavior is identical to the tuned round-3 operating point.
    # The training sample grows with the list count (TRAIN_PER_LIST
    # per centroid) so the quantizer never silently degenerates; PAST
    # the single-level ceiling the TWO-LEVEL quantizer takes over
    # (distributed fine training, hier_top1-keyed partitions, probes
    # and scorer sharing the hier descent — the NPROBE invariant).
    path = f"{sf_dir}/embeddings.parquet"
    n = parquet_rows(path)
    n_lists_req = dynamic_buckets(n, 16, rows_per_group=125)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    if n_lists_req <= MAX_TRAIN_LISTS:
        if TRAIN_PER_LIST * n_lists_req > len(emb):
            emb = _embedding_sample(path, cap=TRAIN_PER_LIST * n_lists_req)
        cents = ivf_centroids(emb, n_lists=n_lists_req)
        root = build_ivf_partitions(sf_dir, cents)
        paths = probed_paths(root, ivf_probe(qn, cents).ravel())
        score_fn = make_ivf_topk_fn(qref, cents, k=10)
    else:
        from .stages.similarity import (
            _arr_digest,
            _build_partitions,
            hier_probe,
            hier_top1,
            make_hier_topk_fn,
        )

        # past the ceiling the fine granularity SWITCHES to the same
        # ~10k-row list target the dedup path uses: at 125-row lists
        # the fine training sample (40 per list) would be a third of
        # the corpus — 10k-row lists keep training at ~0.4% of rows
        # and per-query read at nprobe × 10k rows (≤ 0.001% there)
        n_lists_hier = dynamic_buckets(n, 16, rows_per_group=10_000)
        coarse, subs_flat, cell_off = _hier_quantizer(path, n, n_lists_hier)
        # kind carries the CONTENT of the trained quantizer — a cache
        # built under different (patched or re-tuned) knobs/centroids
        # must never serve this probe set
        root = _build_partitions(
            sf_dir,
            f"ivfh_{_arr_digest(coarse, subs_flat, cell_off)}",
            hier_top1(coarse, subs_flat, cell_off),
        )
        qprobe = hier_probe(qn, coarse, subs_flat, cell_off)
        paths = probed_paths(root, qprobe.ravel())
        score_fn = make_hier_topk_fn(
            qref, coarse, subs_flat, cell_off, k=10, qprobe=qprobe
        )

    ds = _read_probed_embeddings(paths)
    local = ds.map_batches(score_fn, batch_format="pyarrow")
    return local.repartition(1).groupby("query_id").map_groups(
        lambda g: merge_topk(g, k=10), batch_format="pyarrow"
    )  # candidate set is k x queries x batches rows - one partition


class AnnQueryStream:
    """Query-STREAM serving over one cached ANN layout (VERDICT r4
    next.6): the IVF quantizer is trained and the corpus
    Hive-partitioned ONCE in ``__init__`` (content-digested cache —
    a second stream over the same corpus reuses the directory), then
    successive query batches arriving over time are served with only
    per-batch probe work — nothing is retrained or repartitioned per
    batch. Mirrors ``q_ann_topk_ivf``'s single-level / two-level
    dispatch exactly, so the layouts are SHARED with the one-shot
    query.

    ``query(qmat, qids, exact=False)`` → Dataset of (query_id, rank,
    vec_id): pruned NPROBE read by default (approximate, the scale
    path); ``exact=True`` probes every list — a full read of the
    cached layout whose result is oracle-checkable (q_ann_stream)."""

    def __init__(self, sf_dir: str, k: int = 10):
        from .stages.scaling import dynamic_buckets, parquet_rows
        from .stages.similarity import (
            _arr_digest,
            _build_partitions,
            build_ivf_partitions,
            hier_top1,
            ivf_centroids,
        )

        self.sf_dir = sf_dir
        self.k = k
        self.batches_served = 0
        path = f"{sf_dir}/embeddings.parquet"
        n = parquet_rows(path)
        n_lists_req = dynamic_buckets(n, 16, rows_per_group=125)
        if n_lists_req <= MAX_TRAIN_LISTS:
            emb = _embedding_sample(
                path, cap=max(EMB_TRAIN_SAMPLE, TRAIN_PER_LIST * n_lists_req)
            )
            self.cents = ivf_centroids(emb, n_lists=n_lists_req)
            self.hier = None
            self.root = build_ivf_partitions(sf_dir, self.cents)
        else:
            n_lists_hier = dynamic_buckets(n, 16, rows_per_group=10_000)
            self.cents = None
            self.hier = _hier_quantizer(path, n, n_lists_hier)
            coarse, subs_flat, cell_off = self.hier
            self.root = _build_partitions(
                sf_dir,
                f"ivfh_{_arr_digest(coarse, subs_flat, cell_off)}",
                hier_top1(coarse, subs_flat, cell_off),
            )

    def _all_paths(self) -> list[str]:
        import glob
        import os as _os

        return sorted(
            glob.glob(_os.path.join(self.root, "bucket=*", "*.parquet"))
        )

    def query(self, qmat: np.ndarray, qids: np.ndarray, exact: bool = False):
        """One arriving query batch → its top-k Dataset. Only probe
        selection + the (pruned or full) scan run here — the layout is
        the one built in ``__init__``."""
        from .stages.similarity import (
            hier_probe,
            ivf_probe,
            make_hier_topk_fn,
            make_ivf_topk_fn,
            make_topk_fn,
            merge_topk,
            probed_paths,
            put_queries,
        )

        qref = put_queries(qmat, qids)
        qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        if exact:
            paths = self._all_paths()
            score_fn = make_topk_fn(qref, k=self.k)
        elif self.hier is None:
            paths = probed_paths(self.root, ivf_probe(qn, self.cents).ravel())
            score_fn = make_ivf_topk_fn(qref, self.cents, k=self.k)
        else:
            coarse, subs_flat, cell_off = self.hier
            qprobe = hier_probe(qn, coarse, subs_flat, cell_off)
            paths = probed_paths(self.root, qprobe.ravel())
            score_fn = make_hier_topk_fn(
                qref, coarse, subs_flat, cell_off, k=self.k, qprobe=qprobe
            )
        self.batches_served += 1
        ds = _read_probed_embeddings(paths)
        local = ds.map_batches(score_fn, batch_format="pyarrow")
        # BOUNDED partial stream: ≤ k × queries × blocks candidate rows
        return local.repartition(1).groupby("query_id").map_groups(
            lambda g: merge_topk(g, k=self.k), batch_format="pyarrow"
        )


def q_ann_stream(sf_dir: str):
    """ANN query-stream batching, oracle-checkable front door: the
    query set arrives as TWO successive batches served by ONE
    ``AnnQueryStream`` (layout built once, reused for batch 2 — the
    serving pattern; the pruned approximate mode is the same object
    with ``exact=False``). Full-probe exact scoring here so the union
    of both batches' top-k hash-matches the ann_topk SQL oracle."""
    _, _, qmat, qids = _load_query_vectors(sf_dir, with_sample=False)
    stream = AnnQueryStream(sf_dir, k=10)
    half = max(1, len(qids) // 2)
    parts = []
    for sl in (slice(None, half), slice(half, None)):
        if len(qids[sl]) == 0:
            continue
        t = stream.query(qmat[sl], qids[sl], exact=True)
        parts.extend(_ray_tables(t))
    return pa.concat_tables(parts)


def _ray_tables(ds) -> list[pa.Table]:
    """Materialize a SMALL Dataset to its Arrow tables (empty blocks
    filtered — the schema-less empty-block hazard)."""
    import ray

    return [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]


# ---------------------------------------------------------------------------
# multimodal (binary media columns; decode stubbed, plumbing real)

def q_media_meta(sf_dir: str):
    from .stages.media import media_meta, synth_media

    ds = _docs(sf_dir).map_batches(synth_media, batch_format="pyarrow")
    return ds.map_batches(media_meta, batch_format="pyarrow")


SQL_MEDIA_META = """
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n_payload FROM documents
)
SELECT doc_id,
       CAST(16 + doc_id % 240 AS BIGINT) AS width,
       CAST(16 + (doc_id // 7) % 240 AS BIGINT) AS height,
       CAST(n_payload AS BIGINT) AS n_payload,
       CAST(list_sum(list_transform(range(1, strlen(text) + 1),
              i -> ord(substr(text, CAST(i AS INT), 1)))) % 65536 AS BIGINT) AS checksum
FROM b
"""


def q_frame_sample(sf_dir: str):
    from .stages.media import frame_sample_plan, synth_media

    ds = _docs(sf_dir).map_batches(synth_media, batch_format="pyarrow")
    return ds.map_batches(frame_sample_plan, batch_format="pyarrow")


SQL_FRAME_SAMPLE = """
WITH m AS (
  SELECT doc_id,
         16 + doc_id % 240 AS width,
         octet_length(encode(text)) AS n_payload
  FROM documents
)
SELECT doc_id, CAST(f AS BIGINT) AS frame, CAST(8 + f * width AS BIGINT) AS byte_off
FROM m, LATERAL (SELECT unnest(range(0, n_payload // width, 10)) AS f)
"""


def q_media_pixels(sf_dir: str):
    """REAL pixel decode (the former DecodeActor stub, closed): encode
    each document as an 'IMG2' RLE grayscale image, then decode the
    bytes back in an actor-pool stage and emit per-document pixel
    statistics. The oracle recomputes the statistics from the pixel
    formula in closed form — so the byte-level encode→decode roundtrip
    is what the hash check proves. Real frames: shrink batch_size so
    decoded-batch × concurrency fits the worker heap."""
    from .stages.media import DecodeActor, synth_media_pixels

    ds = _docs(sf_dir).map_batches(synth_media_pixels, batch_format="pyarrow")
    return ds.map_batches(DecodeActor, batch_format="pyarrow", concurrency=2)


# max dim is 8 + (MOD-1) = 23 → the 23×23 cross join, filtered per doc
_SQL_PX = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 16 AS width, 8 + (doc_id // 3) % 16 AS height
  FROM documents
)
"""

SQL_MEDIA_PIXELS = _SQL_PX + """
SELECT d.doc_id,
       CAST(d.width AS BIGINT) AS width,
       CAST(d.height AS BIGINT) AS height,
       CAST(d.width * d.height AS BIGINT) AS n_pixels,
       CAST(SUM(((d.doc_id + r.r) * 31 + c.c // 8) % 256) AS BIGINT) AS px_sum,
       CAST(MAX(((d.doc_id + r.r) * 31 + c.c // 8) % 256) AS BIGINT) AS px_max
FROM dims d, (SELECT unnest(range(23)) AS r) r, (SELECT unnest(range(23)) AS c) c
WHERE r.r < d.height AND c.c < d.width
GROUP BY d.doc_id, d.width, d.height
"""


def q_frame_pixels(sf_dir: str):
    """Decoded-pixel frame sampling: decode 'IMG2', keep every 4th
    pixel row as a sampled frame with its pixel-sum checksum — the
    decode→sample composition of a video featurization pipeline."""
    from .stages.media import frame_pixel_sums, synth_media_pixels

    ds = _docs(sf_dir).map_batches(synth_media_pixels, batch_format="pyarrow")
    return ds.map_batches(frame_pixel_sums, batch_format="pyarrow")


SQL_FRAME_PIXELS = _SQL_PX + """
SELECT d.doc_id, CAST(r.r AS BIGINT) AS frame,
       CAST(SUM(((d.doc_id + r.r) * 31 + c.c // 8) % 256) AS BIGINT) AS row_sum
FROM dims d, (SELECT unnest(range(23)) AS r) r, (SELECT unnest(range(23)) AS c) c
WHERE r.r < d.height AND c.c < d.width AND r.r % 4 = 0
GROUP BY d.doc_id, r.r
"""


# ---------------------------------------------------------------------------
# derivation queries (rows-only oracles: non-SQL-expressible geometry)

def q_blocks_derived(sf_dir: str):
    """Block extraction output (M6): ids + integer bounds. The polygon
    derivation itself is pytest-golden-checked; here the oracle verifies
    the full id/bounds set against the grid arithmetic."""
    import pyarrow.parquet as pq

    from .pipelines import derive

    t = pq.read_table(derive.blocks_path())
    return t.select(["block_id", "gadm", "bx", "by", "xmin_e6", "ymin_e6", "xmax_e6", "ymax_e6"])


SQL_BLOCKS_DERIVED = f"""
SELECT ('B' || printf('%02d', bx) || '_' || printf('%02d', by)) AS block_id,
       ('G' || CAST(bx // 10 AS VARCHAR) || '_' || CAST(by // 10 AS VARCHAR)) AS gadm,
       bx, by,
       bx * {world.BLOCK_E6} + {world.STREET_EPS_E6} AS xmin_e6,
       by * {world.BLOCK_E6} + {world.STREET_EPS_E6} AS ymin_e6,
       (bx + 1) * {world.BLOCK_E6} - {world.STREET_EPS_E6} AS xmax_e6,
       (by + 1) * {world.BLOCK_E6} - {world.STREET_EPS_E6} AS ymax_e6
FROM (SELECT unnest(range({world.N_BLOCKS})) AS bx), (SELECT unnest(range({world.N_BLOCKS})) AS by)
"""


def q_knn_parcels_k3_sharded(sf_dir: str):
    """100 TB path of knn_parcels_k3: halo'd per-cell anchor slices,
    rows routed by cell_r5. Same oracle as the broadcast path proves
    the halo covers the k-th neighbor."""
    import pyarrow.parquet as pq

    from .pipelines import derive
    from .stages.spatial import make_knn_topk_sharded_fn, put_anchors_side_by_cell

    refs = _epoch_cached(
        "knn_shards", lambda: put_anchors_side_by_cell(pq.read_table(derive.parcels_path()))
    )
    ds = _pages(sf_dir).filter(expr="has_geo")
    return ds.map_batches(make_knn_topk_sharded_fn(refs, k=3), batch_format="pyarrow")


def q_pip_join_holes_sharded(sf_dir: str):
    """100 TB path of pip_join_holes: the donut MultiPolygon side table
    sharded per partitioning cell (exterior-cover routing), points
    routed by their cell id. Same oracle as the broadcast donut path
    proves hole/multi-part semantics survive sharding."""
    from .geom.cells import RES_PARTITION, cell_id_e6
    from .stages.spatial import make_pip_sharded_fn, put_blocks_side_by_cell

    refs = _epoch_cached(
        "donut_shards", lambda: put_blocks_side_by_cell(_donut_blocks_table())
    )
    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    span = _DNT_GRID * _DNT_PITCH

    def to_points(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lon = (d * 131) % span
        lat = (d * 137) % span
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lon_e6": pa.array(lon, pa.int64()),
                "lat_e6": pa.array(lat, pa.int64()),
                "has_geo": pa.array(np.ones(len(d), bool)),
                "cell_r5": pa.array(cell_id_e6(lat, lon, RES_PARTITION), pa.int64()),
            }
        )

    ds = docs.map_batches(to_points, batch_format="pyarrow")
    ds = ds.map_batches(make_pip_sharded_fn(refs), batch_format="pyarrow")
    return ds.select_columns(["doc_id", "block_id"])


# --- M8 periphery filter -------------------------------------------------
# Region-of-interest rectangle (µdeg) whose BUFFERED boundary cuts
# straight through block interiors on all four sides: x = 350000 lands
# inside column bx=3 (302000..398000), x = 7352000 inside bx=73, etc.
PERIPHERY_REGION_E6 = (351_000, 251_000, 7_351_000, 8_251_000)  # rx0 ry0 rx1 ry1
PERIPHERY_BUF_E6 = 1_000  # reference default buffer_radius=0.001°


def _periphery_boundary_ring() -> np.ndarray:
    rx0, ry0, rx1, ry1 = PERIPHERY_REGION_E6
    b = PERIPHERY_BUF_E6
    x0, y0, x1, y1 = rx0 - b, ry0 - b, rx1 + b, ry1 + b
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    ) / 1e6


def q_blocks_periphery(sf_dir: str):
    """M8 periphery filter EXACT semantics (ref
    `prclz/blocks/extraction.py:58-59`): blocks intersecting the
    buffered region boundary are dropped; strictly-inside and
    fully-outside blocks survive. The boundary rectangle is placed so
    it clips block interiors on all four sides — the case the grid
    world never exercised before."""
    import pyarrow.parquet as pq

    from .pipelines import derive

    t = pq.read_table(derive.blocks_path())
    kept = derive.periphery_filter(t, _periphery_boundary_ring())
    return kept.select(
        ["block_id", "gadm", "bx", "by", "xmin_e6", "ymin_e6", "xmax_e6", "ymax_e6"]
    )


def _sql_blocks_periphery() -> str:
    rx0, ry0, rx1, ry1 = PERIPHERY_REGION_E6
    b = PERIPHERY_BUF_E6
    x0, y0, x1, y1 = rx0 - b, ry0 - b, rx1 + b, ry1 + b
    # axis-aligned exact rule: intersects-boundary ⇔ overlaps the
    # buffered rect but is not strictly inside it
    return f"""
WITH blocks AS ({SQL_BLOCKS_DERIVED})
SELECT * FROM blocks
WHERE NOT (
  xmax_e6 > {x0} AND xmin_e6 < {x1} AND ymax_e6 > {y0} AND ymin_e6 < {y1}
  AND NOT (xmin_e6 > {x0} AND xmax_e6 < {x1} AND ymin_e6 > {y0} AND ymax_e6 < {y1})
)
"""


PARCEL_LADDER_LIMIT = 60  # blocks through the segmentize ladder per run


def q_parcels_ladder(sf_dir: str):
    """Parcelization with the reference's segmentize FALLBACK LADDER
    (G19 full, `midway_parcelization_digital_globe.R:124-137`):
    per-building footprints segmentized fine → Voronoi over boundary
    points → per-building cell dissolve; coarser resolution on
    failure; block-geometry inheritance as the last rung. Voronoi +
    union are not SQL-expressible → rows-only check; the partition
    property (parcels tile the block exactly) is pytest-checked."""
    import ray.data

    from .pipelines.derive import parcelize_ladder_block

    n = world.N_BLOCKS
    ids = np.arange(PARCEL_LADDER_LIMIT, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"bx": pa.array(ids // n), "by": pa.array(ids % n)})
    )

    def run(batch: pa.Table) -> pa.Table:
        tables = [
            parcelize_ladder_block(int(r["bx"]), int(r["by"]))
            for r in batch.to_pylist()
        ]
        return pa.concat_tables(tables)

    return ds.map_batches(run, batch_format="pyarrow", batch_size=4).drop_columns(
        ["geom_wkb"]
    )


def q_blocks_diagonal(sf_dir: str):
    """General-noding block extraction (M7 full semantics): border +
    diagonal + mid-cell chord streets → segment-intersection noding
    (proper crossings and T-junctions at non-grid positions) → face
    tracing → inset. Proves the engine polygonizes ARBITRARY street
    arrangements, matching `prclz/blocks/methods.py:43-106`
    (IntersectionPolygonization; smoketest shape
    `smoketests/smoketest_blocks.py:15-39`)."""
    import pyarrow.parquet as pq

    from .pipelines import derive

    t = pq.read_table(derive.blocks_diagonal_path())
    return t.select(["block_id", "gadm", "bx", "by", "xmin_e6", "ymin_e6", "xmax_e6", "ymax_e6"])


def _sql_blocks_diagonal() -> str:
    """Oracle from the ANALYTIC face geometry: closed-form inset
    vertices of the four convex faces per cell (hand-derived line
    offsets — independent of the engine kernels), bounds + centroid
    block-id arithmetic in SQL over the cell grid."""
    import math

    from .pipelines.derive import DIAG_CHORD

    e = world.STREET_EPS_E6 / 1e6
    d = e * math.sqrt(2)
    c = DIAG_CHORD
    faces = {
        # inset vertex lists, cell-relative (derivation: each face edge
        # shifted inward by e; slope-1 edges shift by e*sqrt(2) in y)
        "A": [(e + d, e), (c - e, e), (c - e, c - e - d)],
        "B": [(e, e + d), (c - e, c - e + d), (c - e, 1 - e), (e, 1 - e)],
        "C": [(c + e, e), (1 - e, e), (1 - e, 1 - e - d), (c + e, c + e - d)],
        "D": [(c + e, c + e + d), (1 - e - d, 1 - e), (c + e, 1 - e)],
    }

    def centroid(vs):
        a = cx = cy = 0.0
        for i in range(len(vs)):
            x0, y0 = vs[i]
            x1, y1 = vs[(i + 1) % len(vs)]
            cr = x0 * y1 - x1 * y0
            a += cr
            cx += (x0 + x1) * cr
            cy += (y0 + y1) * cr
        return cx / (3 * a), cy / (3 * a)

    rows = []
    for vs in faces.values():
        cx, cy = centroid(vs)
        dbx = int(cx * 1e6) // world.BLOCK_E6
        dby = int(cy * 1e6) // world.BLOCK_E6
        rows.append(
            f"({dbx}, {dby}, {min(v[0] for v in vs)!r}, {min(v[1] for v in vs)!r}, "
            f"{max(v[0] for v in vs)!r}, {max(v[1] for v in vs)!r})"
        )
    values = ", ".join(rows)
    n = world.N_GADM_AXIS
    return f"""
SELECT ('B' || printf('%02d', gx * 10 + dbx) || '_' || printf('%02d', gy * 10 + dby)) AS block_id,
       ('G' || CAST(gx AS VARCHAR) || '_' || CAST(gy AS VARCHAR)) AS gadm,
       gx * 10 + dbx AS bx, gy * 10 + dby AS by,
       CAST(ROUND((gx + fx0) * 1000000) AS BIGINT) AS xmin_e6,
       CAST(ROUND((gy + fy0) * 1000000) AS BIGINT) AS ymin_e6,
       CAST(ROUND((gx + fx1) * 1000000) AS BIGINT) AS xmax_e6,
       CAST(ROUND((gy + fy1) * 1000000) AS BIGINT) AS ymax_e6
FROM (SELECT unnest(range({n})) AS gx),
     (SELECT unnest(range({n})) AS gy),
     (VALUES {values}) AS tri(dbx, dby, fx0, fy0, fx1, fy1)
"""


def q_block_complexity(sf_dir: str):
    """k-complexity per block (G10/G11) — PIP join buildings→blocks,
    group per block, weak-dual sequence. Geometry is not
    SQL-expressible: the driver records a rows-only check; exact k
    values are pytest-golden-checked."""
    import pyarrow.parquet as pq
    import ray.data

    from .pipelines import derive
    from .pipelines.derive import complexity_bucket_group

    blocks = pq.read_table(derive.blocks_path())
    buildings = _read_parquet_clean(derive.buildings_path())

    # route each building to its block arithmetically? No — run the real
    # PIP join (small side = blocks) then group per block.
    import ray as _ray

    from .stages.spatial import PIPJoinActor, put_blocks_side

    blocks_ref = put_blocks_side(blocks)
    pts = buildings.map_batches(
        lambda b: pa.table(
            {
                "lat_e6": b.column("lat_e6"),
                "lon_e6": b.column("lon_e6"),
                "has_geo": pa.array(np.ones(b.num_rows, dtype=bool)),
            }
        ),
        batch_format="pyarrow",
    )
    joined = pts.map_batches(
        PIPJoinActor,
        fn_constructor_args=(blocks_ref,),
        concurrency=(1, 4),
        batch_format="pyarrow",
        num_cpus=1,
    )
    # attach block geometry for the group step via broadcast lookup
    wkb_by_block = dict(
        zip(blocks.column("block_id").to_pylist(), blocks.column("geom_wkb").to_pylist())
    )
    wkb_ref = _ray.put(wkb_by_block)

    # bucketed grouping (tiny-groups rule): ~10⁴+ blocks of 3-8 buildings
    # each would be a pathological one-Ray-group-per-block shuffle — hash
    # the block id into an input-scaled bucket and regroup inside. The
    # block count is already on the driver (it IS the broadcast side).
    from .stages.hashing import hash_strings
    from .stages.scaling import dynamic_buckets, reduce_width

    est_rows = blocks.num_rows * 6  # ~3-8 building centroids per block
    bc_n = dynamic_buckets(est_rows, 64)
    bc_w = reduce_width(est_rows, bc_n)

    def attach(batch: pa.Table) -> pa.Table:
        lut = _ray.get(wkb_ref)
        ids = batch.column("block_id").to_pylist()
        bid = batch.column("block_id")
        bid = bid.combine_chunks() if isinstance(bid, pa.ChunkedArray) else bid
        return pa.table(
            {
                "block_id": bid,
                "lon_e6": batch.column("lon_e6"),
                "lat_e6": batch.column("lat_e6"),
                "geom_wkb": pa.array([lut.get(i) for i in ids], pa.binary()),
                "bc": pa.array(hash_strings(bid) % bc_n, pa.int64()),
            }
        )

    def drop_unmatched(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column("block_id")))

    grouped = (
        joined.map_batches(drop_unmatched, batch_format="pyarrow")
        .map_batches(attach, batch_format="pyarrow")
        .repartition(bc_w)
        .groupby("bc")
        .map_groups(complexity_bucket_group, batch_format="pyarrow")
    )
    return grouped.select_columns(["block_id", "k", "n_bldgs"])


# ---------------------------------------------------------------------------
# event-stream operators (windowed custom operators)

def q_sessionize(sf_dir: str):
    """Gap-based sessionization: ONE shuffle on user_id, sorted
    map_groups per user (SURVEY §2.9 windowed custom operator)."""
    import ray.data

    from functools import partial

    from .stages.events import ASOF_BUCKETS, add_user_bucket, sessionize_group

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    # bucketed shuffle key (tiny-groups rule): one Ray group per
    # user-bucket, users regrouped vectorized inside the group fn —
    # never one group per user (billions at web scale). Width and
    # bucket count are both input-scaled.
    ub_n = _buckets(sf_dir, ASOF_BUCKETS, table="events")
    ds = ds.map_batches(
        partial(add_user_bucket, n_buckets=ub_n), batch_format="pyarrow"
    )
    return (
        ds.repartition(_rwidth(sf_dir, ub_n, table="events"))
        .groupby("ub")
        .map_groups(sessionize_group, batch_format="pyarrow")
    )


SQL_SESSIONIZE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000
              OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT user_id, t,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM e
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events,
       CAST(MIN(t) AS BIGINT) AS start_us,
       CAST(MAX(t) AS BIGINT) AS end_us,
       CAST(MAX(t) - MIN(t) AS BIGINT) AS duration_us
FROM s GROUP BY user_id, session_idx
"""


def q_events_sliding(sf_dir: str):
    """Sliding-window aggregate (1 h windows / 15 min step) — the third
    window family beside tumbling (events_hourly) and session
    (sessionize). Map-side explode×4 + partial combine, one small
    groupby shuffle."""
    import ray.data

    from .stages.events import sliding_window_counts

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    agg = (
        ds.map_batches(sliding_window_counts, batch_format="pyarrow")
        .groupby(["event_type", "window_us"])
        .sum("n")
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "event_type": b.column("event_type"),
                "window_us": b.column("window_us"),
                "n_events": b.column("sum(n)"),
            }
        ),
        batch_format="pyarrow",
    )


SQL_EVENTS_SLIDING = """
SELECT event_type,
       CAST((epoch_us(ts) // 900000000) * 900000000
            - CAST(k AS BIGINT) * 900000000 AS BIGINT) AS window_us,
       COUNT(*) AS n_events
FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
GROUP BY 1, 2
"""


def q_events_late(sf_dir: str):
    """Watermark late-event detection — the streaming-robustness
    semantic beside the window family: the high-water mark is a
    RUNNING MAX over arrival order, computed as a distributed prefix
    scan with the MAX monoid (per-bucket maxima → driver running max
    of ≤256 bucket values → seeded vectorized in-bucket finish) — the
    `stages/packing.py` scan shape, non-sum. Arrival order is a
    deterministic scramble of the sorted corpus (see
    late_bucket_rows). Emits only the late rows with their watermark.
    Output: (event_id, ts, wm_us)."""
    from .stages.events import (
        WATERMARK_US,
        bucket_max_ts,
        late_bucket_rows,
        make_late_finish,
    )

    from functools import partial

    from .stages.events import LATE_BUCKETS

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    # next power of two ≥ the scaled count (the arrival-key bucket is a
    # bit shift)
    lb_n = 1 << (_buckets(sf_dir, LATE_BUCKETS, table="events") - 1).bit_length()
    rows = ds.map_batches(
        partial(late_bucket_rows, n_buckets=lb_n), batch_format="pyarrow"
    )
    # two passes over the (2-column, read-pruned) rows: the bucket-max
    # reduce and the grouped finish — recomputing the trivial lineage
    # beats materializing the whole stream at 100 TB
    import ray as _ray

    # broadcast the prior array once (input-scaled bucket count →
    # closure-pickling would re-ship it per task)
    lb_w = _rwidth(sf_dir, lb_n, table="events")
    prior_ref = _ray.put(bucket_max_ts(rows, n_buckets=lb_n, width=lb_w))
    return (
        rows.repartition(lb_w)
        .groupby("lb")
        .map_groups(make_late_finish(prior_ref, WATERMARK_US), batch_format="pyarrow")
    )


def _sql_events_late() -> str:
    from .stages.events import WATERMARK_US

    return f"""
WITH a AS (
  SELECT event_id, ts, (event_id * 2654435761) % 2147483648 AS ak
  FROM events
),
o AS (
  SELECT event_id, ts,
         MAX(ts) OVER (ORDER BY ak, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm
  FROM a
)
SELECT event_id, ts, CAST(epoch_us(wm) AS BIGINT) AS wm_us
FROM o
WHERE CAST(epoch_us(wm) AS BIGINT) - CAST(epoch_us(ts) AS BIGINT) > {WATERMARK_US}
"""


def q_events_asof(sf_dir: str):
    """AS-OF JOIN (attribution): each purchase matched to the user's
    latest click with ts ≤ purchase ts — the temporal join Ray Data has
    no native operator for, composed as ONE bounded-bucket shuffle
    (user_id % 64) + a vectorized running-maximum pass per bucket
    (`stages/events.py::asof_join_group`). Inner as-of: purchases with
    no prior click drop. Oracle: DuckDB native ASOF JOIN."""
    from .stages.events import add_user_bucket, asof_join_group

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    from functools import partial

    from .stages.events import ASOF_BUCKETS

    ub_n = _buckets(sf_dir, ASOF_BUCKETS, table="events")
    ds = ds.map_batches(
        partial(add_user_bucket, n_buckets=ub_n), batch_format="pyarrow"
    )
    # repartition ≤ group count (CLAUDE.md; ub has ≥ ASOF_BUCKETS
    # non-empty values on any events corpus with ≥ 8 users)
    return (
        ds.repartition(_rwidth(sf_dir, ub_n, table="events"))
        .groupby("ub")
        .map_groups(asof_join_group, batch_format="pyarrow")
    )


SQL_EVENTS_ASOF = """
SELECT p.event_id, p.user_id,
       CAST(epoch_us(c.ts) AS BIGINT) AS right_ts_us,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_events_range(sf_dir: str):
    """RANGE (interval) join: per purchase, the count of the user's
    clicks in the preceding hour [ts−1h, ts) — the windowed temporal
    join, composed as the same bounded-bucket shuffle as events_asof
    plus two vectorized searchsorted passes over a packed (user, ts)
    key (`stages/events.py::range_join_group`). Zero-click purchases
    stay (count 0)."""
    from .stages.events import add_user_bucket, range_join_group

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    from functools import partial

    from .stages.events import ASOF_BUCKETS

    ub_n = _buckets(sf_dir, ASOF_BUCKETS, table="events")
    ds = ds.map_batches(
        partial(add_user_bucket, n_buckets=ub_n), batch_format="pyarrow"
    )
    # repartition ≤ group count (CLAUDE.md; see q_events_asof)
    return (
        ds.repartition(_rwidth(sf_dir, ub_n, table="events"))
        .groupby("ub")
        .map_groups(range_join_group, batch_format="pyarrow")
    )


SQL_EVENTS_RANGE = """
SELECT p.event_id, p.user_id, CAST(COUNT(c.event_id) AS BIGINT) AS n_right
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
GROUP BY 1, 2
"""


def q_event_props(sf_dir: str):
    """JSON props extraction (vectorized regex) + rollup per type."""
    import ray.data

    from .stages.events import extract_props_k

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "props"]
    )
    parsed = ds.map_batches(extract_props_k, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by("event_type")
            .aggregate([("k", "sum"), ([], "count_all")])
            .rename_columns(["event_type", "k", "n"])
        )

    agg = parsed.map_batches(partial, batch_format="pyarrow").groupby("event_type").sum(["k", "n"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "event_type": b.column("event_type"),
                "sum_k": b.column("sum(k)"),
                "n_events": b.column("sum(n)"),
            }
        ),
        batch_format="pyarrow",
    )


SQL_EVENT_PROPS = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# union (D5) and native hash join (J6)

def q_points_union(sf_dir: str):
    """ds.union of two point sources (buildings ∪ parcel anchors) →
    count per admin cell (the reference's polygon+line-derived building
    consolidation, `osm-etl/consolidate_buildings.py:25`)."""
    import ray.data

    from .pipelines import derive

    b = _read_parquet_clean(derive.buildings_path()).map_batches(
        lambda t: pa.table(
            {
                "lon_e6": t.column("lon_e6").cast(pa.int64()),
                "lat_e6": t.column("lat_e6").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    p = _read_parquet_clean(derive.parcels_path()).map_batches(
        lambda t: pa.table(
            {
                "lon_e6": t.column("anchor_lon_e6").cast(pa.int64()),
                "lat_e6": t.column("anchor_lat_e6").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    u = b.union(p)

    def partial(batch: pa.Table) -> pa.Table:
        gx = pc.divide(batch.column("lon_e6"), 1_000_000)
        gy = pc.divide(batch.column("lat_e6"), 1_000_000)
        t = pa.table({"gx": gx, "gy": gy})
        return t.group_by(["gx", "gy"]).aggregate([([], "count_all")]).rename_columns(
            ["gx", "gy", "n"]
        )

    agg = u.map_batches(partial, batch_format="pyarrow").groupby(["gx", "gy"]).sum("n")
    return agg.map_batches(
        lambda bt: pa.table(
            {
                "gx": bt.column("gx"),
                "gy": bt.column("gy"),
                "n_points": bt.column("sum(n)"),
            }
        ),
        batch_format="pyarrow",
    )


SQL_POINTS_UNION = f"""
WITH blocks AS (
  SELECT bx, by FROM (SELECT unnest(range({world.N_BLOCKS})) AS bx),
                     (SELECT unnest(range({world.N_BLOCKS})) AS by)
),
bldg AS (
  SELECT bx * {world.BLOCK_E6} + 15000
           + ((bx * 1000003 + by * 1009 + j * {world.H1_MUL}) % {world.M31}) % 70000 AS lon_e6,
         by * {world.BLOCK_E6} + 15000
           + (((bx * 1000003 + by * 1009 + j * {world.H1_MUL}) % {world.M31}) // 70000) % 70000 AS lat_e6
  FROM blocks, (SELECT unnest(range(8)) AS j)
  WHERE j < 3 + (bx * 7 + by * 13) % 6
),
anch AS (
  SELECT bx * {world.BLOCK_E6} + 25000 + (p % 2) * 50000 AS lon_e6,
         by * {world.BLOCK_E6} + 25000 + (p // 2) * 50000 AS lat_e6
  FROM blocks, (SELECT unnest(range({world.PARCELS_PER_BLOCK})) AS p)
),
u AS (SELECT * FROM bldg UNION ALL SELECT * FROM anch)
SELECT lon_e6 // 1000000 AS gx, lat_e6 // 1000000 AS gy, COUNT(*) AS n_points
FROM u GROUP BY 1, 2
"""


def q_nation_revenue(sf_dir: str):
    """Native Ray Data hash join (J6): orders ⋈ customer on custkey →
    exact-integer revenue per nation."""
    import ray.data

    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: pa.table(
            {"o_custkey": b.column("o_custkey"), "price_c": _cents(b.column("o_totalprice"))}
        ),
        batch_format="pyarrow",
    )
    cust = _read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    joined = orders.join(
        cust, join_type="inner", num_partitions=_jwidth(sf_dir, table="orders"),
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by("c_nationkey")
            .aggregate([("price_c", "sum"), ([], "count_all")])
            .rename_columns(["c_nationkey", "p", "n"])
        )

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby("c_nationkey").sum(["p", "n"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "c_nationkey": b.column("c_nationkey"),
                "revenue_cents": b.column("sum(p)"),
                "n_orders": b.column("sum(n)"),
            }
        ),
        batch_format="pyarrow",
    )


SQL_NATION_REVENUE = """
SELECT c_nationkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


def q_blocks_buffered(sf_dir: str):
    """The ALTERNATE extraction method (M6 buffered-line-difference)
    through the plugin registry — same oracle as blocks_derived proves
    method parity (the reference's two-method equivalence)."""
    import ray.data

    from .pipelines import derive

    ds = derive.extract_blocks(
        ray.data.from_arrow(derive.streets_table()),
        extraction_method="buffered_difference",
    )
    return ds.select_columns(
        ["block_id", "gadm", "bx", "by", "xmin_e6", "ymin_e6", "xmax_e6", "ymax_e6"]
    )


def q_block_inventory(sf_dir: str):
    """A2/J6: per-block parcel + building counts via a native Ray Data
    hash join of the two derived tables on block_id."""
    import ray.data

    from .pipelines import derive

    parcels = _read_parquet_clean(derive.parcels_path(), columns=["block_id"])

    def pcount(b: pa.Table) -> pa.Table:
        return b.group_by("block_id").aggregate([([], "count_all")]).rename_columns(
            ["block_id", "np_"]
        )

    p = parcels.map_batches(pcount, batch_format="pyarrow").groupby("block_id").sum("np_")
    p = p.map_batches(
        lambda b: pa.table({"block_id": b.column("block_id"), "n_parcels": b.column("sum(np_)")}),
        batch_format="pyarrow",
    )

    bld = _read_parquet_clean(derive.buildings_path(), columns=["bldg_id"])

    def bcount(b: pa.Table) -> pa.Table:
        ids = pc.utf8_slice_codeunits(b.column("bldg_id"), 0, 6)
        t = pa.table({"block_id": ids})
        return t.group_by("block_id").aggregate([([], "count_all")]).rename_columns(
            ["block_id", "nb_"]
        )

    bc = bld.map_batches(bcount, batch_format="pyarrow").groupby("block_id").sum("nb_")
    bc = bc.map_batches(
        lambda b: pa.table({"block_id": b.column("block_id"), "n_buildings": b.column("sum(nb_)")}),
        batch_format="pyarrow",
    )
    # join width sized on the parcel count (an upper bound on the
    # per-block rollup rows entering the join; floor 8 at test scale)
    from .stages.scaling import MAX_BUCKETS, parquet_rows, reduce_width

    npart = reduce_width(parquet_rows(derive.parcels_path()), MAX_BUCKETS)
    return p.join(bc, join_type="inner", num_partitions=npart, on=("block_id",))


SQL_BLOCK_INVENTORY = f"""
SELECT ('B' || printf('%02d', bx) || '_' || printf('%02d', by)) AS block_id,
       CAST({world.PARCELS_PER_BLOCK} AS BIGINT) AS n_parcels,
       CAST(3 + (bx * 7 + by * 13) % 6 AS BIGINT) AS n_buildings
FROM (SELECT unnest(range({world.N_BLOCKS})) AS bx), (SELECT unnest(range({world.N_BLOCKS})) AS by)
"""


# AoI triangle (integer µdeg vertices): the polygon-scope filter J9.
# Exact PIP on a convex polygon = all cross products same sign — integer
# arithmetic, so the oracle is exact SQL.
_AOI_TRI = ((1_200_000, 1_100_000), (2_800_000, 1_300_000), (1_900_000, 2_900_000))


def q_aoi_polygon_filter(sf_dir: str):
    """J9: scope pages to an arbitrary AoI polygon — candidate pruning
    by covering cells (predicate pushdown), then the exact PIP test."""
    from .geom.cells import RES_PARTITION, polygon_covering_cells

    tri = np.asarray(_AOI_TRI, dtype=np.float64) / 1e6
    cover = np.unique(polygon_covering_cells(tri, RES_PARTITION)).astype(np.int64)
    (ax, ay), (bx_, by_), (cx, cy) = _AOI_TRI

    def keep(batch: pa.Table) -> pa.Table:
        cells = batch.column("cell_r5").to_numpy(zero_copy_only=False)
        pre = np.isin(cells, cover)
        t = batch.filter(pa.array(pre))
        if t.num_rows == 0:
            return pa.table({"url": pa.array([], pa.string())})
        px = t.column("lon_e6").to_numpy(zero_copy_only=False)
        py = t.column("lat_e6").to_numpy(zero_copy_only=False)
        d1 = (bx_ - ax) * (py - ay) - (by_ - ay) * (px - ax)
        d2 = (cx - bx_) * (py - by_) - (cy - by_) * (px - bx_)
        d3 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
        inside = ((d1 >= 0) & (d2 >= 0) & (d3 >= 0)) | ((d1 <= 0) & (d2 <= 0) & (d3 <= 0))
        return pa.table({"url": t.column("url").filter(pa.array(inside))})

    return _pages(sf_dir).map_batches(keep, batch_format="pyarrow")


def _sql_aoi() -> str:
    (ax, ay), (bx_, by_), (cx, cy) = _AOI_TRI
    return (
        _WITH_GEO
        + f""" SELECT url FROM pages
      WHERE has_geo AND (
        (({bx_} - {ax}) * (lat_e6 - {ay}) - ({by_} - {ay}) * (lon_e6 - {ax}) >= 0
         AND ({cx} - {bx_}) * (lat_e6 - {by_}) - ({cy} - {by_}) * (lon_e6 - {bx_}) >= 0
         AND ({ax} - {cx}) * (lat_e6 - {cy}) - ({ay} - {cy}) * (lon_e6 - {cx}) >= 0)
        OR
        (({bx_} - {ax}) * (lat_e6 - {ay}) - ({by_} - {ay}) * (lon_e6 - {ax}) <= 0
         AND ({cx} - {bx_}) * (lat_e6 - {by_}) - ({cy} - {by_}) * (lon_e6 - {bx_}) <= 0
         AND ({ax} - {cx}) * (lat_e6 - {cy}) - ({ay} - {cy}) * (lon_e6 - {cx}) <= 0))"""
    )


def q_cell_counts_salted(sf_dir: str):
    """Skew-handled per-cell counts: count pre-pass → hot-cell salting →
    salted groupby → merge (stages/skew.py). Counts must equal the
    unsalted oracle exactly — salting is semantics-free."""
    from .stages.skew import salted_count_by_cell

    # threshold low enough that the 4 urban clusters' cells are hot even
    # at sf0.001 (500 docs)
    return salted_count_by_cell(sf_dir, hot_threshold=10)


SQL_CELL_COUNTS = (
    _WITH_GEO
    + f" SELECT CAST({_CELL_SQL} AS BIGINT) AS cell_r5, COUNT(*) AS n_pages"
    + " FROM pages GROUP BY 1"
)


def q_parcels_derived(sf_dir: str):
    """Voronoi parcelization output (G19): ids + anchors. The cell
    geometry is pytest-checked (partition property: parcel areas sum to
    the block area); ids/anchors are SQL-derivable."""
    import pyarrow.parquet as pq

    from .pipelines import derive

    t = pq.read_table(derive.parcels_path())
    return t.select(["parcel_id", "block_id", "p", "anchor_lon_e6", "anchor_lat_e6"])


SQL_PARCELS_DERIVED = f"""
SELECT ('B' || printf('%02d', bx) || '_' || printf('%02d', by) || '_P' || p) AS parcel_id,
       ('B' || printf('%02d', bx) || '_' || printf('%02d', by)) AS block_id,
       p,
       bx * {world.BLOCK_E6} + 25000 + (p % 2) * 50000 AS anchor_lon_e6,
       by * {world.BLOCK_E6} + 25000 + (p // 2) * 50000 AS anchor_lat_e6
FROM (SELECT unnest(range({world.N_BLOCKS})) AS bx),
     (SELECT unnest(range({world.N_BLOCKS})) AS by),
     (SELECT unnest(range({world.PARCELS_PER_BLOCK})) AS p)
"""


def q_zonal_raster(sf_dir: str):
    """Zonal raster statistics (A5/G20): exact-integer area-weighted
    raster sum per block (raster modeled as a deterministic tile
    table, S11)."""
    from .stages.raster import zonal_dataset

    return zonal_dataset()


def _sql_zonal() -> str:
    from .stages.raster import RASTER_TILE_E6 as TILE_E6

    B, E = world.BLOCK_E6, world.STREET_EPS_E6
    return f"""
WITH blocks AS (
  SELECT ('B' || printf('%02d', bx) || '_' || printf('%02d', by)) AS block_id,
         bx * {B} + {E} AS xmin_e6, by * {B} + {E} AS ymin_e6,
         (bx + 1) * {B} - {E} AS xmax_e6, (by + 1) * {B} - {E} AS ymax_e6
  FROM (SELECT unnest(range({world.N_BLOCKS})) AS bx),
       (SELECT unnest(range({world.N_BLOCKS})) AS by)
),
pairs AS (
  SELECT block_id,
         ((tx * 31 + ty * 17) % 100 + 1)
           * GREATEST(LEAST(xmax_e6, (tx + 1) * {TILE_E6}) - GREATEST(xmin_e6, tx * {TILE_E6}), 0)
           * GREATEST(LEAST(ymax_e6, (ty + 1) * {TILE_E6}) - GREATEST(ymin_e6, ty * {TILE_E6}), 0) AS w
  FROM blocks,
       (SELECT unnest(range({world.N_BLOCKS * world.BLOCK_E6 // TILE_E6})) AS tx),
       (SELECT unnest(range({world.N_BLOCKS * world.BLOCK_E6 // TILE_E6})) AS ty)
  WHERE tx * {TILE_E6} < xmax_e6 AND (tx + 1) * {TILE_E6} > xmin_e6
    AND ty * {TILE_E6} < ymax_e6 AND (ty + 1) * {TILE_E6} > ymin_e6
)
SELECT block_id, CAST(SUM(w) AS BIGINT) AS zonal_weighted
FROM pairs GROUP BY block_id
"""


REBLOCK_LIMIT = 10_000  # all blocks (full derivation; ~5 s at 32 cpus)


def q_reblock(sf_dir: str):
    """Per-block Steiner reblocking summary (G13-G18). Geometry not
    SQL-expressible → rows-only driver check; exact edge sets/lengths
    pytest-golden-checked (tests/test_stages.py)."""
    from .pipelines.reblock import reblock_dataset

    return reblock_dataset(limit_blocks=REBLOCK_LIMIT).drop_columns(
        ["new_lines_wkb", "existing_lines_wkb", "terminals_wkb"]
    )


def q_reblock_terminals(sf_dir: str):
    """SQL-checkable projection of the reblock output: terminal count =
    building count + 1 road-access terminal."""
    from .pipelines.reblock import reblock_dataset

    return reblock_dataset(limit_blocks=REBLOCK_LIMIT).select_columns(
        ["block_id", "n_terminals"]
    )


def q_reblock_interior(sf_dir: str):
    """The reference's FULL G17 reblock flow over building-Voronoi
    parcels: boundary-access buildings dropped
    (`reblock/i_reblock.py:168-210`), outside terminal from
    min-rotated-rect − hull (`:285-291`), access-less blocks skipped
    with explicit status rows. The geometry payload columns are
    emitted HEX-encoded (lossless; `bytes.fromhex` restores the WKB —
    the run_reblock sink writes real binary) so the driver's
    stringify-hash covers them; the oracle is the frozen golden table
    (tools/make_goldens.py), semantics pinned by the pytest goldens."""
    from .pipelines.reblock import reblock_interior_dataset

    ds = reblock_interior_dataset(limit_blocks=REBLOCK_LIMIT).drop_columns(
        ["new_lines_wkb"]
    )

    def hexify(b: pa.Table) -> pa.Table:
        import binascii

        out = {}
        for name in b.column_names:
            col = b.column(name)
            if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
                out[name + "_hex"] = pa.array(
                    [binascii.hexlify(v).decode() if v is not None else None
                     for v in col.to_pylist()],
                    pa.string(),
                )
            else:
                out[name] = col
        return pa.table(out)

    return ds.map_batches(hexify, batch_format="pyarrow")


SQL_REBLOCK_TERMINALS = f"""
SELECT ('B' || printf('%02d', bx) || '_' || printf('%02d', by)) AS block_id,
       CAST(3 + (bx * 7 + by * 13) % 6 + 1 AS BIGINT) AS n_terminals
FROM (SELECT unnest(range({world.N_BLOCKS})) AS bx), (SELECT unnest(range({world.N_BLOCKS})) AS by)
WHERE bx * {world.N_BLOCKS} + by < {REBLOCK_LIMIT}
"""


def _complexity_path() -> str:
    """Parquet-cached full complexity table (the reference's per-block
    `.block.cache` checkpoint files, `single_file_complexity.py:28-46`,
    as one partitioned cache): built once per machine by the REAL
    pipeline (q_block_complexity), then read."""
    from .pipelines.derive import _cached_ds

    # streamed to the cache dir by the workers that computed it — the
    # k table is block-count-sized and must never concat onto the driver
    return _cached_ds("complexity", lambda: q_block_complexity("unused"))


def q_complexity_hist(sf_dir: str):
    """Distribution of k over all blocks (A8 QC rollup) — reads the
    complexity cache (T5 semantics) instead of recomputing."""
    import ray.data

    ds = _read_parquet_clean(_complexity_path())

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"k": batch.column("k")})
        return t.group_by("k").aggregate([([], "count_all")]).rename_columns(["k", "n"])

    # repartition ≤ distinct-k count before the groupby: empty aggregate
    # partitions emit schema-less blocks (CLAUDE.md invariant). The
    # fixture has 3 distinct k values, so 1 is the only always-safe
    # count (the partial stream is ≤ distinct-k rows per block — bytes)
    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .groupby("k")
        .sum("n")
    )
    return agg.map_batches(
        lambda b: pa.table({"k": b.column("k"), "n_blocks": b.column("sum(n)")}),
        batch_format="pyarrow",
    )


def q_qc_report(sf_dir: str):
    """Corpus-level QC SUMMARY — the engine's human-facing QC rollup
    (reference parity: the match-rate report of
    ``data_processing/split_geojson.py:214-249`` and the completeness
    tracker of ``data_processing/data_tracker.py:14-70``). One small
    (section, metric, value) table assembled from the same distributed
    rollups the registry already oracles: geographic coverage from the
    joined page stream (101-row per-gadm table → driver math), exact
    dedup cardinality, quality-gate pass count, language mix. Every
    value is an exact integer (rates as parts-per-million via integer
    division) so the table hashes bit-for-bit against the SQL oracle.
    ``pipelines/qc.run_qc_report`` renders this plus the per-gadm
    detail as a markdown artifact."""
    return _qc_tables(sf_dir)[0]


def _qc_tables(sf_dir: str):
    """(summary, per_gadm) for the QC family — one joined-pipeline run
    serves both (run_qc_report needs the per-gadm detail the summary
    is derived from; recomputing it would double the report's most
    expensive stage)."""
    from .stages.rollup import match_count_qc
    from .stages.scaling import parquet_rows

    per_gadm = match_count_qc(_joined(sf_dir))  # 101 rows, driver-side
    n_by_key = dict(
        zip(
            per_gadm.column("gadm_key").to_pylist(),
            per_gadm.column("n_pages").to_pylist(),
        )
    )
    n_no_geo = int(n_by_key.get(world.SENTINEL_GADM, 0))
    n_total = int(sum(n_by_key.values()))
    n_geo = n_total - n_no_geo
    n_gadm_nonzero = sum(
        1 for k, v in n_by_key.items() if k != world.SENTINEL_GADM and v > 0
    )

    n_docs = parquet_rows(f"{sf_dir}/documents.parquet")
    n_unique = q_dedup_exact(sf_dir).count()
    n_pass = q_quality_filter(sf_dir).count()

    # language mix: tiny partial-aggregate groupby over the lang_id map
    lang_partial = q_lang_id(sf_dir).map_batches(
        lambda b: pa.table({"lang_pred": b.column("lang_pred")})
        .group_by("lang_pred")
        .aggregate([([], "count_all")])
        .rename_columns(["lang_pred", "n"]),
        batch_format="pyarrow",
    )
    lang_counts = (
        # BOUNDED partials: ≤ distinct-language rows per block — bytes
        lang_partial.repartition(1).groupby("lang_pred").sum("n").to_pandas()
    )

    rows: list[tuple[str, str, int]] = [
        ("coverage", "n_pages_total", n_total),
        ("coverage", "n_pages_geo", n_geo),
        ("coverage", "n_pages_no_geo", n_no_geo),
        ("coverage", "geo_ppm", n_geo * 1_000_000 // max(1, n_total)),
        ("coverage", "n_gadm_nonzero", n_gadm_nonzero),
        ("dedup", "n_docs", n_docs),
        ("dedup", "n_unique_text", n_unique),
        ("dedup", "dup_ppm", (n_docs - n_unique) * 1_000_000 // max(1, n_docs)),
        ("quality", "n_pass", n_pass),
        ("quality", "pass_ppm", n_pass * 1_000_000 // max(1, n_docs)),
    ]
    for lang, n in sorted(
        zip(lang_counts["lang_pred"], lang_counts["sum(n)"].astype(int))
    ):
        rows.append(("lang", f"n_lang_{lang}", int(n)))
    # geometry-side QC: the block-complexity distribution (the
    # reference's per-country A8 rollup) from the complexity cache
    comp = q_complexity_hist(sf_dir).to_pandas()
    for k, nb in sorted(zip(comp["k"].astype(int), comp["n_blocks"].astype(int))):
        rows.append(("complexity", f"n_blocks_k{k}", int(nb)))
    summary = pa.table(
        {
            "section": pa.array([r[0] for r in rows], pa.string()),
            "metric": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    return summary, per_gadm


def _sql_qc_report() -> str:
    """UNION ALL of small aggregates mirroring q_qc_report exactly —
    each leg reuses the registry's existing SQL fragments (GEO_CTE,
    dedup-exact hash, quality filter, lang argmax), so the QC summary
    is hash-checked against the same semantics the per-op oracles pin.
    DuckDB ``//`` on BIGINT is floor division, matching Python."""
    return (
        _WITH_GEO
        + f"""
SELECT 'coverage' AS section, 'n_pages_total' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM pages
UNION ALL SELECT 'coverage', 'n_pages_geo', CAST(COUNT(*) AS BIGINT) FROM pages WHERE has_geo
UNION ALL SELECT 'coverage', 'n_pages_no_geo', CAST(COUNT(*) AS BIGINT) FROM pages WHERE NOT has_geo
UNION ALL SELECT 'coverage', 'geo_ppm',
  (SELECT CAST(COUNT(*) FILTER (WHERE has_geo) * 1000000 // GREATEST(COUNT(*), 1) AS BIGINT) FROM pages)
UNION ALL SELECT 'coverage', 'n_gadm_nonzero',
  (SELECT CAST(COUNT(DISTINCT {_GADM_SQL}) AS BIGINT) FROM pages WHERE has_geo)
UNION ALL SELECT 'dedup', 'n_docs', CAST(COUNT(*) AS BIGINT) FROM documents
UNION ALL SELECT 'dedup', 'n_unique_text',
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ({_sql_dedup_exact()}))
UNION ALL SELECT 'dedup', 'dup_ppm',
  (SELECT CAST((COUNT(*) - (SELECT COUNT(*) FROM ({_sql_dedup_exact()}))) * 1000000
        // GREATEST(COUNT(*), 1) AS BIGINT) FROM documents)
UNION ALL SELECT 'quality', 'n_pass',
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ({_sql_quality_filter()}))
UNION ALL SELECT 'quality', 'pass_ppm',
  (SELECT CAST((SELECT COUNT(*) FROM ({_sql_quality_filter()})) * 1000000
        // GREATEST(COUNT(*), 1) AS BIGINT) FROM documents)
UNION ALL SELECT 'lang', 'n_lang_' || lang_pred, CAST(COUNT(*) AS BIGINT)
  FROM ({_sql_lang_id()}) GROUP BY 2
UNION ALL SELECT 'complexity', 'n_blocks_k' || CAST(k AS VARCHAR),
  CAST(n_blocks AS BIGINT) FROM ({_sql_golden("complexity_hist")})"""
    )


# ---------------------------------------------------------------------------
# corpus curation (host caps, line dedup, repetition, clusters, tf-idf)

def _sql_words(src: str = "documents") -> str:
    """The word-split CTE (generate_subscripts alignment idiom) over
    any doc-shaped source table — the ONE place this SQL lives."""
    return f"""w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM {src}
)"""


_SQL_WORDS = _sql_words()


def _sql_lines(src: str = "documents") -> str:
    from .stages.curation import LINE_W

    return f"""{_sql_words(src)},
l AS (
  SELECT doc_id, CAST((ord - 1) // {LINE_W} AS BIGINT) AS line_idx,
         string_agg(word, ' ' ORDER BY ord) AS line
  FROM w GROUP BY 1, 2
)"""


def q_host_stats(sf_dir: str):
    """Per-host corpus stats (doc count, char volume) — the profiling
    step before any Common-Crawl-style per-site cap. Map-side partial
    aggregation → ONE bounded shuffle on ``hash(host) % HOST_BUCKETS``
    with the per-host reduce vectorized inside the bucket — never a
    Ray group per host (~10^7 hosts with heavy skew at web scale);
    hosts never land on the driver."""
    from .stages.curation import host_combine_stats, host_partial_stats

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )
    from functools import partial

    from .stages.curation import HOST_BUCKETS

    hb_n = _buckets(sf_dir, HOST_BUCKETS)
    return (
        ds.map_batches(
            partial(host_partial_stats, n_buckets=hb_n), batch_format="pyarrow"
        )
        # per-batch-distinct partials still scale with the corpus
        .repartition(_rwidth(sf_dir, hb_n))
        .groupby("hb")
        .map_groups(host_combine_stats, batch_format="pyarrow")
    )


SQL_HOST_STATS = """
SELECT source AS host, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1
"""


def q_host_cap(sf_dir: str):
    """Per-host document cap (keep each host's first HOST_CAP docs by
    doc_id): ONE bounded shuffle on ``hash(host) % HOST_BUCKETS`` —
    never a Ray group per host (hosts are ~10^7 with heavy skew at web
    scale) — with the per-host rank computed by vectorized run
    arithmetic inside the bucket."""
    from .stages.curation import host_cap_rows, host_rank_keep

    from functools import partial

    from .stages.curation import HOST_BUCKETS

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    hb_n = _buckets(sf_dir, HOST_BUCKETS)
    rows = ds.map_batches(
        partial(host_cap_rows, n_buckets=hb_n), batch_format="pyarrow"
    )
    return (
        rows.repartition(_rwidth(sf_dir, hb_n))  # full doc stream
        .groupby("hb")
        .map_groups(host_rank_keep, batch_format="pyarrow")
    )


def _sql_host_cap() -> str:
    from .stages.curation import HOST_CAP

    return f"""
SELECT doc_id, source AS host FROM (
  SELECT doc_id, source, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn <= {HOST_CAP}
"""


def q_line_dedup(sf_dir: str):
    """Corpus-wide LINE-level dedup (CCNet shape): documents → fixed
    LINE_W-word lines → ONE shuffle on the line-hash bucket flags every
    occurrence of a corpus-duplicated line → ONE shuffle on the doc
    bucket reassembles each document's cleaned text in line order. Two
    bounded all-to-alls, no broadcast line set, no driver compute.
    Output: (doc_id, clean_text, n_lines, n_dropped)."""
    from functools import partial

    from .stages.curation import (
        DOC_BUCKETS,
        LINE_BUCKETS,
        doc_line_rows,
        line_flag_rows,
        reassemble_docs,
    )

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    lb_n = _buckets(sf_dir, LINE_BUCKETS, fanout=16)  # ≈ lines per doc
    db_n = _buckets(sf_dir, DOC_BUCKETS)
    rows = ds.map_batches(
        partial(doc_line_rows, n_buckets=lb_n), batch_format="pyarrow"
    )
    flagged = (
        rows.repartition(_rwidth(sf_dir, lb_n, fanout=16))  # line rows
        .groupby("lb")
        .map_groups(partial(line_flag_rows, doc_buckets=db_n), batch_format="pyarrow")
    )
    return (
        flagged.repartition(_rwidth(sf_dir, db_n, fanout=16))
        .groupby("db")
        .map_groups(reassemble_docs, batch_format="pyarrow")
    )


def _sql_line_dedup() -> str:
    return f"""
WITH {_sql_lines()},
c AS (SELECT line, COUNT(*) AS cnt FROM l GROUP BY 1),
f AS (SELECT l.doc_id, l.line_idx, l.line,
             CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END AS dup
      FROM l JOIN c USING (line))
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN dup = 0 THEN line END, ' ' ORDER BY line_idx), '') AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(dup) AS BIGINT) AS n_dropped
FROM f GROUP BY 1
"""


def q_repetition_signals(sf_dir: str):
    """Gopher-style per-document repetition signals (duplicate-line and
    top-bigram character fractions) — pure map-side, exact-integer
    x1000 fractions."""
    from .stages.curation import repetition_signals

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(repetition_signals, batch_format="pyarrow")


def _sql_repetition() -> str:
    return f"""
WITH {_sql_lines()},
lc AS (SELECT doc_id, line, COUNT(*) AS cnt, strlen(line) AS sl FROM l GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_lines,
         CAST(SUM(cnt - 1) AS BIGINT) AS dup_occ,
         CAST(SUM((cnt - 1) * sl) AS BIGINT) AS dup_chars
  FROM lc GROUP BY 1
),
b AS (
  SELECT doc_id, word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY ord) AS bg
  FROM w QUALIFY bg IS NOT NULL
),
bcnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY 1, 2),
tb AS (
  SELECT doc_id, c * strlen(bg) AS top_chars,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bg) AS rn
  FROM bcnt
)
SELECT d.doc_id, p.n_lines,
       CAST(p.dup_occ * 1000 // GREATEST(p.n_lines, 1) AS BIGINT) AS dup_line_frac_x1000,
       CAST(p.dup_chars * 1000 // GREATEST(strlen(d.text), 1) AS BIGINT) AS dup_char_frac_x1000,
       CAST(COALESCE(t.top_chars, 0) * 1000 // GREATEST(strlen(d.text), 1) AS BIGINT) AS top_bigram_frac_x1000
FROM documents d
JOIN per_doc p USING (doc_id)
LEFT JOIN (SELECT * FROM tb WHERE rn = 1) t USING (doc_id)
"""


def q_dedup_clusters(sf_dir: str):
    """Near-duplicate CLUSTERS: MinHash+LSH candidate pairs →
    distributed connected components (iterative min-label propagation
    as Ray join+groupby rounds; convergence via a 1-row sum-of-labels
    fixpoint witness). cluster_id = the component's minimum doc_id —
    the canonical-representative step real dedup pipelines run after
    pair generation."""
    from .stages.curation import connected_components

    return connected_components(
        _minhash_pairs(sf_dir), num_partitions=_jwidth(sf_dir, fanout=4)
    )


def _sql_dedup_clusters() -> str:
    return f"""
WITH RECURSIVE {_sql_minhash_ctes()},
pairs AS ({_SQL_MINHASH_PAIRS_SELECT}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
walk(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, w.lbl FROM walk w JOIN edges e ON e.b = w.node
)
SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id FROM walk GROUP BY 1
"""


def q_dedup_keep_best(sf_dir: str):
    """Near-dup representative selection with a QUALITY policy: per
    MinHash cluster keep the member with the most stopword hits (the
    realistic keep-best curation rule, vs dedup_corpus's
    keep-minimum-id). Shapes: connected components → ONE hash join
    with the map-side quality scores → ONE bounded CLUSTER_BUCKETS
    shuffle for the per-cluster argmax → the dedup_corpus anti-join
    union (nothing on the driver). Output: kept doc ids."""
    from .stages.curation import (
        CLUSTER_BUCKETS,
        cluster_keep_best,
        connected_components,
    )
    from .stages.textops import quality_score

    clusters = connected_components(
        _minhash_pairs(sf_dir), num_partitions=_jwidth(sf_dir, fanout=4)
    )
    qual = _docs(sf_dir).map_batches(quality_score, batch_format="pyarrow").map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"), "score": b.column("stopword_hits")}
        ),
        batch_format="pyarrow",
    )
    # size-gated join (the CC/pagerank front-door pattern): near-dup
    # cluster membership is a SMALL fraction of the corpus — below the
    # threshold, broadcast it once and annotate map-side instead of a
    # hash-join shuffle (measured ~1.5 s of fixed join latency at test
    # scale); above, the distributed join runs unchanged.
    clusters = clusters.materialize()
    if 0 < clusters.count() <= 2_000_000:
        import ray as _ray

        ct = pa.concat_tables(
            [t for t in _ray.get(clusters.to_arrow_refs()) if t.num_rows]
        )
        k = ct.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        v = ct.column("cluster_id").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(k)
        side_ref = _ray.put({"k": k[o], "v": v[o]})

        def annotate(b: pa.Table) -> pa.Table:
            # sorted-key searchsorted lookup (the per-DISTINCT-host
            # idiom) — no Python loop over rows
            import ray as _ray

            side = _ray.get(side_ref)
            sk, sv = side["k"], side["v"]
            ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(sk, ids)
            pos_c = np.minimum(pos, len(sk) - 1)
            hit = np.flatnonzero(sk[pos_c] == ids)
            sel = b.take(pa.array(hit))
            return pa.table(
                {
                    "doc_id": sel.column("doc_id"),
                    "cluster_id": pa.array(sv[pos_c[hit]], pa.int64()),
                    "score": sel.column("score"),
                }
            )

        joined = qual.map_batches(annotate, batch_format="pyarrow")
    else:
        joined = clusters.join(
            qual, join_type="inner", num_partitions=_jwidth(sf_dir),
            on=("doc_id",),
        )

    cb_n = _buckets(sf_dir, CLUSTER_BUCKETS)

    def add_cb(b: pa.Table) -> pa.Table:
        c = b.column("cluster_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "cb", pa.array((c % cb_n).astype(np.int64), pa.int64())
        )

    flagged = (
        joined.map_batches(add_cb, batch_format="pyarrow")
        .repartition(_rwidth(sf_dir, cb_n))
        .groupby("cb")
        .map_groups(cluster_keep_best, batch_format="pyarrow")
    )
    return _keep_unflagged(_zero_flag_docs(sf_dir), flagged)


def _sql_dedup_keep_best() -> str:
    return f"""
WITH RECURSIVE {_sql_minhash_ctes()},
pairs AS ({_SQL_MINHASH_PAIRS_SELECT}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
walk(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, w.lbl FROM walk w JOIN edges e ON e.b = w.node
),
clusters AS (SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id FROM walk GROUP BY 1),
q AS ({_sql_text_quality()}),
ranked AS (
  SELECT c.doc_id,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.stopword_hits DESC, c.doc_id) AS rn
  FROM clusters c JOIN q ON q.doc_id = c.doc_id
),
losers AS (SELECT doc_id FROM ranked WHERE rn > 1)
SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id)
"""


def q_normalize_text(sf_dir: str):
    """Pre-tokenization text normalization (the step every tokenizer
    pipeline runs first): lowercase, collapse space/tab runs, trim.
    Messy input is synthesized deterministically from (doc_id, text)
    identically in both engines (case flip, doubled spaces, tab tails
    — the canonical_urls precedent), so the normalizer chain is what
    the oracle checks. Pure map-side RE2/utf8 kernels. Output:
    (doc_id, norm_text, n_removed)."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def norm(b: pa.Table) -> pa.Table:
        from .stages.hashing import ensure_ascii

        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        text = pc.fill_null(b.column("text"), "").cast(pa.string())
        # n_removed compares utf8_length (codepoints) against the
        # oracle's strlen (bytes) — identical only under ASCII, so
        # enforce the repo-wide ASCII contract rather than diverge.
        ensure_ascii(text, "normalize_text")
        m3 = pa.array(d % 3, pa.int64())
        messy = pc.if_else(
            pc.equal(m3, 0),
            pc.binary_join_element_wise(pc.utf8_upper(text), "  tail ", ""),
            pc.if_else(
                pc.equal(m3, 1),
                pc.binary_join_element_wise(" ", text, "\t", ""),
                text,
            ),
        )
        collapsed = pc.replace_substring_regex(
            pc.utf8_lower(messy), r"[ \t]+", " "
        )
        norm_t = pc.utf8_trim(collapsed, " \t")
        n_rem = pc.subtract(
            pc.utf8_length(messy).cast(pa.int64()),
            pc.utf8_length(norm_t).cast(pa.int64()),
        )
        return pa.table(
            {"doc_id": b.column("doc_id"), "norm_text": norm_t, "n_removed": n_rem}
        )

    return ds.map_batches(norm, batch_format="pyarrow")


SQL_NORMALIZE_TEXT = r"""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN upper(COALESCE(text, '')) || '  tail '
              WHEN doc_id % 3 = 1 THEN ' ' || COALESCE(text, '') || chr(9)
              ELSE COALESCE(text, '') END AS messy
  FROM documents
),
n AS (
  SELECT doc_id, messy,
         trim(regexp_replace(lower(messy), '[ \t]+', ' ', 'g'), ' ' || chr(9)) AS norm_text
  FROM m
)
SELECT doc_id, norm_text,
       CAST(strlen(messy) - strlen(norm_text) AS BIGINT) AS n_removed
FROM n
"""


# deterministic link fixture for the host PageRank query: each doc emits
# one link source-host → 'src'||((doc_id²+3) % 20). Quadratic residues
# mod 20 hit only 6 targets, so the graph is SKEWED — a uniform-PR
# fixture would pass even with swapped edge direction. 20 = the
# testdata host count (sources are 'src0'..'src19'); self-links drop.
_SQL_PR_DST = "'src' || CAST((doc_id * doc_id + 3) % 20 AS VARCHAR)"


def _pr_link_batch(b: pa.Table) -> pa.Table:
    """The Ray half of the host-link fixture rule — one (src, dst) row
    per doc, self-links dropped. MUST stay byte-identical to
    _SQL_PR_DST; host_pagerank AND host_components both build on it,
    so the rule lives in exactly one place per engine side."""
    d = b.column("doc_id").to_numpy(zero_copy_only=False)
    dst = pc.binary_join_element_wise(
        "src", pc.cast(pa.array((d * d + 3) % 20, pa.int64()), pa.string()), ""
    )
    t = pa.table({"src": b.column("source"), "dst": dst})
    return t.filter(pc.invert(pc.equal(t.column("src"), t.column("dst"))))


def q_host_pagerank(sf_dir: str):
    """Link-graph centrality: exact-integer host PageRank after
    PR_ITERS rounds — the crawl-frontier / host-quality weighting
    signal web curation runs next to the CCNet/Gopher content
    signals. Links are synthesized deterministically from
    (source, doc_id) identically in both engines (see _SQL_PR_DST);
    the pagerank stage itself is what the oracle checks: raw links →
    bounded-bucket weighted-edge combine → per-round hash join +
    bounded groupby (or the size-gated driver solve — equality of
    both paths is pytest-asserted). Engine-new surface (the reference
    has no link graph). Output: (host, pr)."""
    from .stages.curation import pagerank

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    links = _pr_link_batch  # the ONE host-link fixture rule

    from .stages.curation import PR_SCALE as _PIN
    from .stages.curation import EDGE_BUCKETS

    return pagerank(
        ds.map_batches(links, batch_format="pyarrow"),
        scale=_PIN,
        edge_buckets=_buckets(sf_dir, EDGE_BUCKETS, fanout=4),  # links/doc
        num_partitions=_jwidth(sf_dir, fanout=4),
    )


def _sql_pagerank_over(links_ctes: str) -> str:
    """Full exact-integer PageRank oracle over a CTE preamble that must
    end by defining ``links(src, dst)`` — one chained CTE pair per
    round, floor-division flow, dangling-in hosts at PR_BASE."""
    from .stages.curation import PR_BASE, PR_DAMP_DEN, PR_DAMP_NUM, PR_ITERS, PR_SCALE

    rounds, prev = [], "pr0"
    for k in range(1, PR_ITERS + 1):
        rounds.append(
            f"""s{k} AS (SELECT e.dst AS host,
  CAST(SUM(({PR_DAMP_NUM} * p.pr * e.w) // ({PR_DAMP_DEN} * o.ow)) AS BIGINT) AS c
  FROM wedges e JOIN outw o ON o.src = e.src JOIN {prev} p ON p.host = e.src
  GROUP BY e.dst),
pr{k} AS (SELECT h.host, {PR_BASE} + COALESCE(s{k}.c, 0) AS pr
  FROM hosts h LEFT JOIN s{k} ON s{k}.host = h.host)"""
        )
        prev = f"pr{k}"
    return f"""
WITH {links_ctes},
wedges AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM links GROUP BY src, dst),
outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM wedges GROUP BY src),
hosts AS (SELECT src AS host FROM wedges UNION SELECT dst AS host FROM wedges),
pr0 AS (SELECT host, CAST({PR_SCALE} AS BIGINT) AS pr FROM hosts),
{','.join(rounds)}
SELECT host, pr FROM {prev}
"""


def _sql_host_pagerank() -> str:
    return _sql_pagerank_over(
        f"""links AS (
  SELECT source AS src, {_SQL_PR_DST} AS dst
  FROM documents
  WHERE source <> {_SQL_PR_DST}
)"""
    )


# anchor-bearing page fixture for the link-extraction queries: every doc
# page carries one outlink to src(3d+1)%20, even docs a second to
# src(5d+2)%20 — synthesized identically in both engines, so the
# vectorized multi-match href extractor is what the oracle checks
# (the canonical_urls precedent).
_SQL_LINK_HTML = """h AS (
  SELECT doc_id, source,
    '<html><body><p>t</p>'
    || '<a href="https://src' || CAST((doc_id*3+1)%20 AS VARCHAR) || '.example/p/' || CAST(doc_id AS VARCHAR) || '">a' || CASE WHEN doc_id % 5 = 0 THEN '<b>' || CAST(doc_id % 13 AS VARCHAR) || '</b>' ELSE CAST(doc_id % 13 AS VARCHAR) END || '</a>'
    || CASE WHEN doc_id % 2 = 0 THEN '<a href="https://src' || CAST((doc_id*5+2)%20 AS VARCHAR) || '.example/q">b' || CAST(doc_id % 11 AS VARCHAR) || '</a>' ELSE '' END
    || '</body></html>' AS html
  FROM documents
)"""


def _link_html_batch(b: pa.Table) -> pa.Table:
    """Ray half of _SQL_LINK_HTML: (doc_id, source, html)."""
    d = b.column("doc_id").to_numpy(zero_copy_only=False)
    a1 = pc.cast(pa.array((d * 3 + 1) % 20, pa.int64()), pa.string())
    a2 = pc.cast(pa.array((d * 5 + 2) % 20, pa.int64()), pa.string())
    ds_ = pc.cast(b.column("doc_id"), pa.string())
    m13 = pc.cast(pa.array(d % 13, pa.int64()), pa.string())
    m11 = pc.cast(pa.array(d % 11, pa.int64()), pa.string())
    m13_part = pc.if_else(
        pc.equal(pa.array(d % 5, pa.int64()), 0),
        pc.binary_join_element_wise("<b>", m13, "</b>", ""),
        m13,
    )
    link1 = pc.binary_join_element_wise(
        '<a href="https://src', a1, ".example/p/", ds_, '">a', m13_part, "</a>", ""
    )
    link2 = pc.if_else(
        pc.equal(pa.array(d % 2, pa.int64()), 0),
        pc.binary_join_element_wise(
            '<a href="https://src', a2, '.example/q">b', m11, "</a>", ""
        ),
        pa.scalar("", pa.string()),
    )
    html = pc.binary_join_element_wise(
        "<html><body><p>t</p>", link1, link2, "</body></html>", ""
    )
    return pa.table(
        {"doc_id": b.column("doc_id"), "source": b.column("source"), "html": html}
    )


def q_extract_links(sf_dir: str):
    """Outlink extraction — the crawl-side producer of the link table
    host_pagerank consumes: vectorized multi-match ``href="..."``
    parse (split-on-marker + parent-index mapping, loop-free), one row
    per (page, link) in document order. Pure map-side; the wide html
    column never leaves the stage. Oracle: DuckDB
    ``regexp_extract_all`` + zipped unnest over the identical
    synthesized pages. Output: (doc_id, link_idx, href)."""
    from .stages.pages import extract_links

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return ds.map_batches(_link_html_batch, batch_format="pyarrow").map_batches(
        extract_links, batch_format="pyarrow"
    )


SQL_EXTRACT_LINKS = f"""
WITH {_SQL_LINK_HTML},
l AS (SELECT doc_id, regexp_extract_all(html, 'href="([^"]*)"', 1) AS ls FROM h)
SELECT doc_id,
       CAST(unnest(generate_series(0, len(ls) - 1)) AS BIGINT) AS link_idx,
       unnest(ls) AS href
FROM l
"""


def q_anchor_texts(sf_dir: str):
    """Anchor-text extraction — the training-signal companion of
    extract_links (anchor text is the classic external description of
    a target page, used for retrieval and query-doc supervision): same
    loop-free fragment pass plus one vectorized RE2 anchor group per
    link. Map-side only. Output: (doc_id, link_idx, href, anchor)."""
    from .stages.pages import extract_links

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return ds.map_batches(_link_html_batch, batch_format="pyarrow").map_batches(
        lambda b: extract_links(b, with_anchors=True), batch_format="pyarrow"
    )


SQL_ANCHOR_TEXTS = f"""
WITH {_SQL_LINK_HTML},
l AS (SELECT doc_id,
        regexp_extract_all(html, 'href="([^"]*)"', 1) AS hs,
        regexp_extract_all(html, 'href="[^"]*"[^>]*>([^<]*)', 1) AS ans
      FROM h)
SELECT doc_id,
       CAST(unnest(generate_series(0, len(hs) - 1)) AS BIGINT) AS link_idx,
       unnest(hs) AS href,
       unnest(ans) AS anchor
FROM l
"""


def q_host_components(sf_dir: str):
    """Site-network / mirror clustering: weakly-connected components of
    the host link graph (the grouping crawl pipelines use to treat a
    site family as one unit for caps and dedup). Hosts enter the
    int64 CC machinery as their 62-bit hashes; names are restored by
    ONE hash join against the distinct (hash, host) map — never a
    driver-side host set. cluster_id = the component's minimum host
    hash. Output: (host, cluster_id)."""
    from .stages.curation import connected_components
    from .stages.hashing import hash_strings62

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def pairs(b: pa.Table) -> pa.Table:
        t = _pr_link_batch(b)  # the ONE host-link fixture rule
        return pa.table(
            {
                "doc_a": pa.array(hash_strings62(t.column("src")), pa.int64()),
                "doc_b": pa.array(hash_strings62(t.column("dst")), pa.int64()),
            }
        )

    def host_ids(b: pa.Table) -> pa.Table:
        hosts = pc.unique(_combined_arr(b.column("source")))
        return pa.table(
            {
                "node": pa.array(hash_strings62(hosts), pa.int64()),
                "host": hosts,
            }
        )

    clusters = connected_components(
        ds.map_batches(pairs, batch_format="pyarrow"),
        num_partitions=_jwidth(sf_dir, floor=4),
    ).map_batches(
        lambda b: pa.table(
            {"node": b.column("doc_id"), "cluster_id": b.column("cluster_id")}
        ),
        batch_format="pyarrow",
    )
    names = ds.map_batches(host_ids, batch_format="pyarrow").groupby("node").max(
        "host"
    ).map_batches(
        lambda b: pa.table(
            {"node": b.column("node"), "host": b.column("max(host)")}
        ),
        batch_format="pyarrow",
        # when read blocks outnumber distinct hosts, the aggregate emits
        # schema-less empty partitions the rename above never sees (Ray
        # skips zero-row blocks) — launder them before the join
    ).repartition(_jwidth(sf_dir, floor=4))
    return clusters.join(
        names, join_type="inner", num_partitions=_jwidth(sf_dir, floor=4),
        on=("node",),
    ).map_batches(
        lambda b: pa.table(
            {"host": b.column("host"), "cluster_id": b.column("cluster_id")}
        ),
        batch_format="pyarrow",
    )


def _combined_arr(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _sql_host_components() -> str:
    from .stages.hashing import sql_h62

    h_src = sql_h62("src")
    h_dst = sql_h62("dst")
    h_host = sql_h62("source")
    return f"""
WITH RECURSIVE raw AS (
  SELECT source AS src, {_SQL_PR_DST} AS dst
  FROM documents
  WHERE source <> {_SQL_PR_DST}
),
hp AS (SELECT DISTINCT {h_src} AS a, {h_dst} AS b FROM raw),
edges AS (SELECT a, b FROM hp UNION ALL SELECT b, a FROM hp),
walk(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, w.lbl FROM walk w JOIN edges e ON e.b = w.node
),
cl AS (SELECT node, CAST(MIN(lbl) AS BIGINT) AS cluster_id FROM walk GROUP BY 1),
names AS (SELECT DISTINCT {h_host} AS node, source AS host FROM documents)
SELECT n.host, c.cluster_id
FROM cl c JOIN names n ON n.node = c.node
"""


def q_anchor_texts_rich(sf_dir: str):
    """Markup-tolerant anchor extraction: anchors captured non-greedily
    up to ``</a>`` then inner tags stripped — ``a<b>3</b>`` yields
    ``a3`` where the plain mode truncates at the first ``<``. Requires
    well-formed (closed) anchors, like the oracle's ``(.*?)</a>``
    group. Output: (doc_id, link_idx, href, anchor)."""
    from .stages.pages import extract_links

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return ds.map_batches(_link_html_batch, batch_format="pyarrow").map_batches(
        lambda b: extract_links(b, with_anchors=True, anchor_markup=True),
        batch_format="pyarrow",
    )


SQL_ANCHOR_TEXTS_RICH = f"""
WITH {_SQL_LINK_HTML},
l AS (SELECT doc_id,
        regexp_extract_all(html, 'href="([^"]*)"', 1) AS hs,
        list_transform(
          regexp_extract_all(html, 'href="[^"]*"[^>]*>(.*?)</a>', 1),
          s -> regexp_replace(s, '<[^>]*>', '', 'g')) AS ans
      FROM h)
SELECT doc_id,
       CAST(unnest(generate_series(0, len(hs) - 1)) AS BIGINT) AS link_idx,
       unnest(hs) AS href,
       unnest(ans) AS anchor
FROM l
"""


def q_link_pagerank(sf_dir: str):
    """End-to-end crawl link pipeline: synthesized pages → href
    extraction → host projection (page's own host → target host) →
    exact-integer PageRank. The composition the two stages exist for;
    everything up to the pagerank shuffle is map-side in one pass over
    the pages. Output: (host, pr)."""
    from .stages.curation import pagerank
    from .stages.pages import extract_links

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def links(b: pa.Table) -> pa.Table:
        lk = extract_links(_link_html_batch(b), keep_cols=("source",))
        dst = pc.struct_field(
            pc.extract_regex(lk.column("href"), r"^https://(?P<h>[^./]*)"), "h"
        )
        t = pa.table({"src": lk.column("source"), "dst": dst})
        return t.filter(pc.invert(pc.equal(t.column("src"), t.column("dst"))))

    from .stages.curation import PR_SCALE as _PIN
    from .stages.curation import EDGE_BUCKETS

    return pagerank(
        ds.map_batches(links, batch_format="pyarrow"),
        scale=_PIN,
        edge_buckets=_buckets(sf_dir, EDGE_BUCKETS, fanout=4),  # links/doc
        num_partitions=_jwidth(sf_dir, fanout=4),
    )


def _sql_link_pagerank() -> str:
    return _sql_pagerank_over(
        f"""{_SQL_LINK_HTML},
l AS (SELECT source, unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href FROM h),
links AS (
  SELECT source AS src, regexp_extract(href, '^https://([^./]*)', 1) AS dst
  FROM l
  WHERE source <> regexp_extract(href, '^https://([^./]*)', 1)
)"""
    )


def q_tfidf_topk(sf_dir: str):
    """Per-document top-k TF-IDF terms: map-side term frequencies (a
    doc is one row, so its words never straddle batches) → ONE bounded
    shuffle on the word-hash bucket completes each word's document
    frequency and scores rows → ONE bounded shuffle on the doc bucket
    selects each doc's top-k by (score desc, word asc) with rank."""
    from functools import partial

    from .stages.curation import (
        DOC_BUCKETS,
        WORD_BUCKETS,
        doc_topk,
        tf_score_rows,
        word_tf_rows,
    )

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    wb_n = _buckets(sf_dir, WORD_BUCKETS, fanout=32)  # distinct words/doc
    db_n = _buckets(sf_dir, DOC_BUCKETS)
    tf = ds.map_batches(
        partial(word_tf_rows, n_buckets=wb_n), batch_format="pyarrow"
    )
    scored = (
        tf.repartition(_rwidth(sf_dir, wb_n, fanout=32))  # word rows
        .groupby("wb")
        .map_groups(partial(tf_score_rows, doc_buckets=db_n), batch_format="pyarrow")
    )
    return (
        scored.repartition(_rwidth(sf_dir, db_n, fanout=32))
        .groupby("db")
        .map_groups(doc_topk, batch_format="pyarrow")
    )


def _sql_tfidf_topk() -> str:
    from .stages.curation import SCORE_SCALE, TFIDF_K

    return f"""
WITH {_SQL_WORDS},
tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2),
df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
s AS (SELECT doc_id, t.word, t.tf, CAST(t.tf * {SCORE_SCALE} // d.df AS BIGINT) AS score
      FROM tf t JOIN df d USING (word)),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rn FROM s)
SELECT doc_id, word, tf, score, CAST(rn AS BIGINT) AS rank FROM r WHERE rn <= {TFIDF_K}
"""


def q_ngram_topk(sf_dir: str):
    """Corpus-wide top-k most frequent word n-grams (the classic
    Common-Crawl boilerplate report): map-side partial counts (one
    Arrow group_by per batch — occurrences never hit the wire
    row-per-occurrence) → ONE bounded shuffle on the gram-hash bucket
    sums and keeps per-bucket top-k candidates (a gram lives in
    exactly one bucket, so the global top-k is inside the candidate
    union) → one final task selects the global top-k."""
    from .stages.curation import bucket_topk_grams, global_topk_grams, ngram_partial_counts

    import functools

    from .stages.curation import GRAM_BUCKETS

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    gb_n = _buckets(sf_dir, GRAM_BUCKETS, fanout=32)  # grams/doc
    part = ds.map_batches(
        functools.partial(ngram_partial_counts, n_buckets=gb_n),
        batch_format="pyarrow",
    )
    cands = (
        part.repartition(_rwidth(sf_dir, gb_n, fanout=32))  # per-batch partials
        .groupby("gb")
        .map_groups(bucket_topk_grams, batch_format="pyarrow")
    )
    # BOUNDED candidates: ≤ top-K rows per gram bucket — the global
    # selection sees K × n_buckets rows, never corpus rows
    return cands.repartition(1).map_batches(global_topk_grams, batch_format="pyarrow")


def _sql_ngram_topk() -> str:
    from .stages.curation import NGRAM_TOPK

    return f"""
WITH {_SQL_WORDS},
g AS (
  SELECT doc_id, word || ' ' || lead(word, 1) OVER dw || ' ' || lead(word, 2) OVER dw AS gram
  FROM w WINDOW dw AS (PARTITION BY doc_id ORDER BY ord)
  QUALIFY gram IS NOT NULL
),
c AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1),
r AS (SELECT gram, n, row_number() OVER (ORDER BY n DESC, gram) AS rn FROM c)
SELECT gram, n FROM r WHERE rn <= {NGRAM_TOPK}
"""


def q_doc_surprisal(sf_dir: str):
    """Corpus-statistics LM scoring (the CCNet/KenLM-filter dataflow):
    phase 1 builds the global top-VOCAB_K word vocabulary exactly like
    ngram_topk (map-side partials → ONE bounded GRAM_BUCKETS shuffle →
    one tiny final selection), phase 2 broadcasts the ≤VOCAB_K (hash,
    rank) arrays via ``ray.put`` (T7) and scores every doc map-side:
    surprisal = Σ rank(word) with OOV = VOCAB_K+1 — the exact-integer
    stand-in for KenLM perplexity with the identical two-phase shape.
    Only the K-row vocab ever lands on the driver. Output:
    (doc_id, surprisal, n_oov)."""
    import ray

    from .stages.curation import (
        VOCAB_K,
        bucket_topk_grams,
        global_topk_grams,
        make_surprisal_fn,
        ngram_partial_counts,
    )
    from .stages.hashing import hash_strings62

    from .stages.curation import GRAM_BUCKETS

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    gb_n = _buckets(sf_dir, GRAM_BUCKETS, fanout=32)  # words/doc
    vocab_ds = (
        ds.map_batches(
            lambda b: ngram_partial_counts(b, n=1, n_buckets=gb_n),
            batch_format="pyarrow",
        )
        # partials are per-batch-distinct, still corpus-scale in total
        .repartition(_rwidth(sf_dir, gb_n, fanout=32))
        .groupby("gb")
        .map_groups(lambda g: bucket_topk_grams(g, VOCAB_K), batch_format="pyarrow")
        # BOUNDED: ≤ VOCAB_K rows per gram bucket reach this choke
        .repartition(1)
        .map_batches(lambda b: global_topk_grams(b, VOCAB_K), batch_format="pyarrow")
    )
    tabs = [t for t in ray.get(vocab_ds.to_arrow_refs()) if t.num_rows]
    vt = pa.concat_tables(tabs) if tabs else pa.table({"gram": pa.array([], pa.string())})
    h = hash_strings62(vt.column("gram"))
    ranks = np.arange(1, len(h) + 1, dtype=np.int64)  # rows arrive in
    # (count desc, word asc) order from global_topk_grams
    order = np.argsort(h)
    vocab_ref = ray.put((h[order], ranks[order]))
    return ds.map_batches(make_surprisal_fn(vocab_ref), batch_format="pyarrow")


def _sql_doc_surprisal() -> str:
    from .stages.curation import VOCAB_K

    return f"""
WITH {_SQL_WORDS},
c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1),
top AS (
  SELECT word, CAST(row_number() OVER (ORDER BY n DESC, word) AS BIGINT) AS r
  FROM c ORDER BY n DESC, word LIMIT {VOCAB_K}
)
SELECT w.doc_id,
       CAST(SUM(COALESCE(t.r, {VOCAB_K + 1})) AS BIGINT) AS surprisal,
       CAST(SUM(CASE WHEN t.r IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM w LEFT JOIN top t USING (word)
GROUP BY w.doc_id
"""


def q_dup_spans(sf_dir: str):
    """Corpus-duplicated SUBSTRING spans per document (the
    repeated-passage detection behind substring-level training-data
    dedup): every DUP_G-word gram occurrence with its position → ONE
    bounded shuffle on the gram-hash bucket keeps occurrences of
    corpus-repeated grams → ONE shuffle on the doc bucket merges each
    doc's surviving gram intervals into maximal spans (vectorized
    doc-lifted running-max union). Output per affected doc: words
    covered by duplicated material + span count."""
    from functools import partial

    from .stages.curation import (
        DOC_BUCKETS,
        DUP_BUCKETS,
        dup_flag_rows,
        dup_span_agg,
        gram_pos_rows,
    )

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    gb_n = _buckets(sf_dir, DUP_BUCKETS, fanout=32)  # gram occurrences/doc
    db_n = _buckets(sf_dir, DOC_BUCKETS)
    rows = ds.map_batches(
        partial(gram_pos_rows, n_buckets=gb_n), batch_format="pyarrow"
    )
    flagged = (
        rows.repartition(_rwidth(sf_dir, gb_n, fanout=32))  # gram rows
        .groupby("gb")
        .map_groups(partial(dup_flag_rows, doc_buckets=db_n), batch_format="pyarrow")
    )
    return (
        flagged.repartition(_rwidth(sf_dir, db_n, fanout=32))
        .groupby("db")
        .map_groups(dup_span_agg, batch_format="pyarrow")
    )


def q_dup_spans_exact(sf_dir: str):
    """SUFFIX-granularity exact-substring dedup (VERDICT r4 next.4;
    Lee et al. 2022 shape): duplicated CHAR spans of length ≥ DUP_L —
    catches sub-gram overlaps dup_spans' DUP_G-word grams cannot see
    (a repeated 30-char passage spanning < 5 words, or one whose word
    alignment differs between occurrences). Distributed suffix-array
    stand-in: every char position seeds a length-DUP_L window (ONE
    sliding view over the flat buffer); ONE bounded shuffle on the
    window-hash bucket counts corpus-wide window multiplicity (string
    equality, not hash equality, decides); ONE shuffle on the doc
    bucket merges surviving windows into maximal char spans. Output
    per affected doc: (doc_id, dup_char_cover, n_spans)."""
    from functools import partial

    from .stages.curation import (
        DOC_BUCKETS,
        DUPX_BUCKETS,
        char_window_rows,
        dupx_flag_rows,
        dupx_span_agg,
    )

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # one window per char: fanout ≈ chars/doc
    xb_n = _buckets(sf_dir, DUPX_BUCKETS, fanout=256)
    db_n = _buckets(sf_dir, DOC_BUCKETS)
    rows = ds.map_batches(
        partial(char_window_rows, n_buckets=xb_n), batch_format="pyarrow"
    )
    flagged = (
        rows.repartition(_rwidth(sf_dir, xb_n, fanout=256))  # window rows
        .groupby("xb")
        .map_groups(partial(dupx_flag_rows, doc_buckets=db_n), batch_format="pyarrow")
    )
    return (
        flagged.repartition(_rwidth(sf_dir, db_n, fanout=256))
        .groupby("db")
        .map_groups(dupx_span_agg, batch_format="pyarrow")
    )


def _sql_dup_spans_exact() -> str:
    from .stages.curation import DUP_L as L

    return f"""
WITH pos0 AS (
  SELECT doc_id, text,
         unnest(generate_series(1, len(text) - {L} + 1)) AS p
  FROM documents
),
pos AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p,
         substr(text, CAST(p AS INT), {L}) AS w
  FROM pos0
),
c AS (SELECT w FROM pos GROUP BY 1 HAVING COUNT(*) >= 2),
d AS (SELECT pos.doc_id, pos.p FROM pos JOIN c USING (w)),
cov AS (SELECT DISTINCT doc_id, p + s.x AS q
        FROM d, (SELECT unnest(generate_series(0, {L - 1})) AS x) s),
isl AS (SELECT doc_id, q,
               q - row_number() OVER (PARTITION BY doc_id ORDER BY q) AS grp
        FROM cov)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS dup_char_cover,
       CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_spans
FROM isl GROUP BY 1
"""


def _sql_dup_spans() -> str:
    from .stages.curation import DUP_G

    return f"""
WITH {_SQL_WORDS},
g AS (
  SELECT doc_id, ord AS p,
         word || ' ' || lead(word, 1) OVER dw || ' ' || lead(word, 2) OVER dw
              || ' ' || lead(word, 3) OVER dw || ' ' || lead(word, 4) OVER dw AS gram
  FROM w WINDOW dw AS (PARTITION BY doc_id ORDER BY ord)
  QUALIFY gram IS NOT NULL
),
c AS (SELECT gram FROM g GROUP BY 1 HAVING COUNT(*) >= 2),
d AS (SELECT g.doc_id, g.p FROM g JOIN c USING (gram)),
cov AS (SELECT DISTINCT doc_id, p + s.x AS pos
        FROM d, (SELECT unnest(generate_series(0, {DUP_G - 1})) AS x) s),
isl AS (SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM cov)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS dup_word_cover,
       CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_spans
FROM isl GROUP BY 1
"""


def q_ccnet_tiers(sf_dir: str):
    """CCNet-style per-host head/middle/tail split: each host's
    documents ranked by word count (the quality proxy; perplexity in
    production) and cut into 3 exact-NTILE tiers — the relative
    per-group filter CCNet applies before keeping head+middle. ONE
    bounded shuffle on the host bucket, NTILE replicated with
    vectorized run arithmetic. Output: (doc_id, host, tier)."""
    from .stages.curation import ccnet_tier_assign, ccnet_tier_rows

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    from functools import partial

    from .stages.curation import HOST_BUCKETS

    hb_n = _buckets(sf_dir, HOST_BUCKETS)
    rows = ds.map_batches(
        partial(ccnet_tier_rows, n_buckets=hb_n), batch_format="pyarrow"
    )
    return (
        rows.repartition(_rwidth(sf_dir, hb_n))  # full doc stream
        .groupby("hb")
        .map_groups(ccnet_tier_assign, batch_format="pyarrow")
    )


SQL_CCNET_TIERS = """
SELECT doc_id, source AS host,
       CAST(NTILE(3) OVER (
         PARTITION BY source
         ORDER BY len(string_split(COALESCE(text, ''), ' ')) DESC, doc_id
       ) AS BIGINT) AS tier
FROM documents
"""


def q_seq_pack(sf_dir: str):
    """Sequence packing (GPT-style concat-and-chunk): documents in
    doc_id order are concatenated and cut into fixed SEQ_LEN-token
    training windows; output is the pack manifest — one row per
    (sequence, document) overlap with its token count. The global
    token offsets come from the engine's distributed prefix-sum scan
    (stages/packing.py): text dies at the projection, per-range-bucket
    sums reduce in one bounded groupby, the driver cumsums only the
    PACK_BUCKETS bucket totals, and each bucket finishes vectorized.
    Output: (seq_id, doc_id, tok_in_seq)."""
    from .stages.packing import pack_dataset, token_count_rows

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tok = ds.map_batches(
        token_count_rows, batch_format="pyarrow"
    ).materialize()  # (doc_id, nt) — 16 B/row scan state, corpus read ONCE
    return pack_dataset(tok)  # empty-corpus guard lives in pack_dataset


def _sql_seq_pack() -> str:
    from .stages.packing import SEQ_LEN

    return f"""
WITH tok AS (
  SELECT doc_id, CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS nt
  FROM documents
), off AS (
  SELECT doc_id, nt,
         CAST(COALESCE(SUM(nt) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
  FROM tok
)
SELECT CAST(g AS BIGINT) AS seq_id, doc_id,
       LEAST((g + 1) * {SEQ_LEN}, st + nt) - GREATEST(g * {SEQ_LEN}, st) AS tok_in_seq
FROM (
  SELECT doc_id, nt, st,
         unnest(generate_series(st // {SEQ_LEN}, (st + nt - 1) // {SEQ_LEN})) AS g
  FROM off
)
"""


def q_train_pack(sf_dir: str):
    """The trainer-prep dataflow as an oracle-gated query: curation
    pipeline → sequence packing over the CLEANED text (the same
    composition run_train_prep writes to its sharded sink). Output:
    (seq_id, doc_id, tok_in_seq) over the curated corpus."""
    from .stages.packing import pack_dataset, token_count_rows

    curated = q_curate_corpus(sf_dir)
    tok = curated.map_batches(
        lambda b: token_count_rows(
            pa.table({"doc_id": b.column("doc_id"), "text": b.column("clean_text")})
        ),
        batch_format="pyarrow",
    ).materialize()
    return pack_dataset(tok)


def _sql_train_pack() -> str:
    from .stages.packing import SEQ_LEN

    return f"""
WITH k AS ({_sql_curate_corpus()}),
tok AS (
  SELECT doc_id, CAST(len(string_split(COALESCE(clean_text, ''), ' ')) AS BIGINT) AS nt
  FROM k
), off AS (
  SELECT doc_id, nt,
         CAST(COALESCE(SUM(nt) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
  FROM tok
)
SELECT CAST(g AS BIGINT) AS seq_id, doc_id,
       LEAST((g + 1) * {SEQ_LEN}, st + nt) - GREATEST(g * {SEQ_LEN}, st) AS tok_in_seq
FROM (
  SELECT doc_id, nt, st,
         unnest(generate_series(st // {SEQ_LEN}, (st + nt - 1) // {SEQ_LEN})) AS g
  FROM off
)
"""


def q_shuffle_rank(sf_dir: str):
    """Deterministic global shuffle for training order: dense 1-based
    rank under (hash62(text), doc_id) — a reproducible corpus-wide
    permutation with no RNG state and NO single-node sort: the 62-bit
    hash is uniform, so its range buckets are balanced by construction;
    bucket bases come from the same prefix-sum scan as seq_pack and
    each bucket ranks its own rows vectorized.
    Output: (doc_id, shuffle_pos)."""
    import ray

    from .stages.packing import (
        bucket_bases,
        compact_for_bucket_groupby,
        make_rank_fn,
        shuffle_key_rows,
    )

    from functools import partial

    from .stages.packing import PACK_BUCKETS

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sb_n = _buckets(sf_dir, PACK_BUCKETS)
    rows = ds.map_batches(
        partial(shuffle_key_rows, n_buckets=sb_n), batch_format="pyarrow"
    ).materialize()
    bases_ref = ray.put(bucket_bases(rows, "one", "sb", n_buckets=sb_n))

    return (
        compact_for_bucket_groupby(rows, rows)
        .groupby("sb")
        .map_groups(make_rank_fn(bases_ref), batch_format="pyarrow")
        # when the compact gate skips the pre-repartition at scale,
        # groupless reduce partitions emit schema-less blocks a
        # map_batches re-type can never see (Ray skips zero-row
        # blocks) — launder them by rebuilding blocks; 16 B/row, so
        # the extra exchange is trivial next to the rank shuffle
        .repartition(_rwidth(sf_dir, sb_n))
    )


def _sql_shuffle_rank() -> str:
    from .stages.hashing import sql_h62

    h = sql_h62("COALESCE(text, '')")
    return f"""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY {h}, doc_id) AS BIGINT) AS shuffle_pos
FROM documents
"""


def _lines_e6_table() -> pa.Table:
    """Both street fixtures (grid + diagonal) as µdeg integer segments
    WITHOUT their pre-keyed gadm column — the routing queries must
    re-derive region membership spatially."""
    from .pipelines.derive import diagonal_streets_table, streets_table

    t = pa.concat_tables([streets_table(), diagonal_streets_table()])

    def e6(c: str) -> pa.Array:
        v = pc.multiply(pc.cast(t.column(c), pa.float64()), 1e6)
        return pc.cast(pc.round(v), pa.int64())

    return pa.table(
        {
            "line_id": t.column("line_id").combine_chunks(),
            "x0_e6": e6("x0"),
            "y0_e6": e6("y0"),
            "x1_e6": e6("x1"),
            "y1_e6": e6("y1"),
        }
    )


def _sql_lines_cte() -> str:
    """Closed-form SQL reconstruction of _lines_e6_table (same id
    scheme, same µdeg coords)."""
    from .pipelines.derive import DIAG_CHORD

    N = world.N_GADM_AXIS
    G = world.GADM_E6
    B = world.BLOCK_E6
    C = int(round(DIAG_CHORD * 1e6))
    return f"""
ax AS (SELECT unnest(range({N})) AS gx),
ay AS (SELECT unnest(range({N})) AS gy),
ii AS (SELECT unnest(range({G // B + 1})) AS i),
lines AS (
  SELECT 'G'||gx||'_'||gy||'_v'||i AS line_id,
         gx*{G}+i*{B} AS x0_e6, gy*{G} AS y0_e6,
         gx*{G}+i*{B} AS x1_e6, (gy+1)*{G} AS y1_e6 FROM ax, ay, ii
  UNION ALL
  SELECT 'G'||gx||'_'||gy||'_h'||i,
         gx*{G}, gy*{G}+i*{B}, (gx+1)*{G}, gy*{G}+i*{B} FROM ax, ay, ii
  UNION ALL
  SELECT 'G'||gx||'_'||gy||'_s', gx*{G}, gy*{G}, (gx+1)*{G}, gy*{G} FROM ax, ay
  UNION ALL
  SELECT 'G'||gx||'_'||gy||'_n', gx*{G}, (gy+1)*{G}, (gx+1)*{G}, (gy+1)*{G} FROM ax, ay
  UNION ALL
  SELECT 'G'||gx||'_'||gy||'_w', gx*{G}, gy*{G}, gx*{G}, (gy+1)*{G} FROM ax, ay
  UNION ALL
  SELECT 'G'||gx||'_'||gy||'_e', (gx+1)*{G}, gy*{G}, (gx+1)*{G}, (gy+1)*{G} FROM ax, ay
  UNION ALL
  SELECT 'G'||gx||'_'||gy||'_d1', gx*{G}, gy*{G}, (gx+1)*{G}, (gy+1)*{G} FROM ax, ay
  UNION ALL
  SELECT 'G'||gx||'_'||gy||'_c', gx*{G}+{C}, gy*{G}, gx*{G}+{C}, (gy+1)*{G} FROM ax, ay
)"""


def q_embedding_centroids(sf_dir: str):
    """Per-label embedding centroid — the engine's VECTOR AGGREGATE:
    dim-wise sums of the (n,64) embedding matrix per class label,
    exact-integer (round(v·10⁶) per element before summing, so the
    reduce is order-independent and float-summation-order parity
    hazards never arise). Map-side partial (one row per label per
    batch, the list column carrying the 64 partial sums) → one tiny
    groupby(label). Output: (label, dim, sum_e6, n_vecs) — the exact
    centroid numerator/denominator per dimension."""
    from .stages.similarity import (
        centroid_combine,
        centroid_partials,
        centroid_recombine,
    )

    ds = _read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return (
        ds.map_batches(centroid_partials, batch_format="pyarrow")
        # tree step: partials are labels × n_batches rows (corpus-linear
        # in batch count) — collapse ~64k-row chunks to ≤ labels rows
        # each BEFORE the shuffle, so the final reduce sees a stream
        # bounded by labels × n_chunks
        .map_batches(centroid_recombine, batch_format="pyarrow", batch_size=65536)
        .repartition(4)  # post-tree stream is tiny; ≤ label count
        .groupby("label")
        .map_groups(centroid_combine, batch_format="pyarrow")
    )


def q_embedding_gram(sf_dir: str):
    """Corpus Gram matrix Σ vᵀv over the embedding table — the
    distributed front half of PCA / whitening (the d×d reduce is all
    that ever crosses the wire; the eigendecomposition of a 64×64
    matrix is a driver-side ms once this lands). Map-side int64 matmul
    per batch → ONE groupby over d(d+1)/2 = 2080 keys. Exact-integer
    round_e6 contract (same as embedding_centroids). Output:
    (i, j, s) upper triangle."""
    from .stages.similarity import gram_finish, gram_partials, gram_precombine

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return (
        ds.map_batches(gram_partials, batch_format="pyarrow")
        # tree steps: partials are 2080 rows PER BATCH (corpus-linear in
        # batch count) — two chained map-side combines shrink the stream
        # ~(batch_size/2080)² before the one bounded groupby; the final
        # width is input-scaled and capped at the 2080 key groups
        .map_batches(gram_precombine, batch_format="pyarrow", batch_size=262144)
        .map_batches(gram_precombine, batch_format="pyarrow", batch_size=262144)
        .repartition(_rwidth(sf_dir, 2080, table="embeddings"))
        .groupby("k")
        .sum("s")
        .map_batches(gram_finish, batch_format="pyarrow")
    )


SQL_EMBEDDING_GRAM = """
WITH u AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM embeddings
)
SELECT a.dim AS i, b.dim AS j, CAST(SUM(a.v * b.v) AS BIGINT) AS s
FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY 1, 2
"""


PCA_P = 8  # principal components kept by embedding_pca


def q_embedding_pca(sf_dir: str, p: int = PCA_P):
    """Uncentered PCA / truncated-SVD projection of the embedding
    corpus — the whitening/compression step after `embedding_gram`:
    the distributed Gram lands 2080 int rows on the driver, a 64×64
    ``eigh`` costs microseconds, the top-p components broadcast via
    ``ray.put``, and the projection is one map-side float matmul per
    batch. Deterministic sign convention (each component's
    largest-|coord| made positive); values emitted as round-e6 ints.
    Not SQL-expressible (eigendecomposition) → rows-only driver check
    + orthonormality/energy-ordering pytest. Output:
    (vec_id, comp, val_e6)."""
    import ray

    from .stages.similarity import embedding_matrix
    from .stages.similarity import round_e6 as _round_e6_pca

    gram = q_embedding_gram(sf_dir)
    gt = pa.concat_tables(
        [t for t in ray.get(gram.to_arrow_refs()) if t.num_rows]
    )
    i = gt.column("i").to_numpy(zero_copy_only=False)
    j = gt.column("j").to_numpy(zero_copy_only=False)
    s = gt.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
    d = int(max(i.max(), j.max())) + 1
    G = np.zeros((d, d))
    G[i, j] = s
    G[j, i] = s
    w, v = np.linalg.eigh(G)  # ascending eigenvalues
    comps = v[:, ::-1][:, :p]  # top-p columns
    flip = comps[np.argmax(np.abs(comps), axis=0), np.arange(p)] < 0
    comps = comps * np.where(flip, -1.0, 1.0)
    w_ref = ray.put(np.ascontiguousarray(comps))

    def project(b: pa.Table) -> pa.Table:
        W = ray.get(w_ref)
        V = embedding_matrix(b.column("embedding"))
        proj = V @ W  # (n, p)
        n = len(b)
        vec = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vec, p), pa.int64()),
                "comp": pa.array(np.tile(np.arange(p, dtype=np.int64), n), pa.int64()),
                "val_e6": pa.array(_round_e6_pca(proj.reshape(-1)), pa.int64()),
            }
        )

    ds = _read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(project, batch_format="pyarrow")


SQL_EMBEDDING_CENTROIDS = """
WITH u AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM embeddings
)
SELECT label, dim, CAST(SUM(v) AS BIGINT) AS sum_e6,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM u GROUP BY 1, 2
"""


def q_ann_topk_pq(sf_dir: str):
    """Product-quantization approximate top-k (scale path 3, beside
    SRP-LSH and IVF): per-subspace k-means codebooks trained once and
    broadcast; the scorer never touches a float embedding — each query
    precomputes an (m, k) ADC lookup table per worker and a vector's
    score is the LUT sum over its 16-byte code. At 100 TB the corpus
    is stored as codes (16× smaller than float32) and the encode is
    a one-time map_batches. Approximate by design → rows-only check +
    recall pytest."""
    from .stages.similarity import make_pq_topk_fn, merge_topk, pq_codebooks, pq_k_for

    qref, emb, _, _ = _load_query_vectors(sf_dir)
    books = pq_codebooks(emb, k=pq_k_for(len(emb)))
    ds = _read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    local = ds.map_batches(make_pq_topk_fn(qref, books, k=10), batch_format="pyarrow")
    return local.repartition(1).groupby("query_id").map_groups(
        lambda g: merge_topk(g, k=10), batch_format="pyarrow"
    )  # candidate set is k x queries x batches rows - one partition


def q_canonical_urls(sf_dir: str):
    """URL canonicalization — the crawl pipeline's pre-dedup step:
    lowercase scheme+host (path keeps case), strip ``www.``, drop the
    fragment and ``utm_*`` tracking params, tidy dangling separators.
    Messy URLs are synthesized deterministically from (source, doc_id)
    identically in both engines (uppercase host, www., rotating
    utm/query/fragment decorations), so the canonicalizer itself is
    what the oracle checks. Pure map-side; RE2 regex + list-element
    kernels. Output: (doc_id, url, canon_url)."""
    from .stages.textops import canonicalize_urls

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def messy(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        src = pc.utf8_upper(b.column("source"))
        ds_ = pc.cast(b.column("doc_id"), pa.string())
        m7 = pc.cast(pa.array(d % 7, pa.int64()), pa.string())
        q = pc.binary_join_element_wise("?utm_source=x&id=", m7, "")
        q2 = pc.binary_join_element_wise("?id=", m7, "&utm_medium=y", "")
        tail = pa.array(d % 3, pa.int64())  # mirrors the SQL CASE on doc_id % 3
        query = pc.if_else(
            pc.equal(tail, 0), q, pc.if_else(pc.equal(tail, 1), q2, "")
        )
        frag = pc.if_else(pc.equal(pa.array(d % 4, pa.int64()), 0), "#frag", "")
        url = pc.binary_join_element_wise(
            "HTTPS://WWW.", src, "/p/", ds_, query, frag, ""
        )
        return pa.table({"doc_id": b.column("doc_id"), "url": url})

    return ds.map_batches(messy, batch_format="pyarrow").map_batches(
        canonicalize_urls, batch_format="pyarrow"
    )


SQL_CANONICAL_URLS = r"""
WITH raw AS (
  SELECT doc_id,
         'HTTPS://WWW.' || upper(source) || '/p/' || doc_id ||
         CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&id=' || (doc_id % 7)
              WHEN doc_id % 3 = 1 THEN '?id=' || (doc_id % 7) || '&utm_medium=y'
              ELSE '' END ||
         CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url
  FROM documents
), s0 AS (
  SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u0 FROM raw
), s0b AS (
  -- pathless-query pad + absolute-URL gate, mirrored term for term
  -- with canonicalize_urls (no-ops on this fixture's always-pathed
  -- absolute URLs, but the engines must share the full rule)
  SELECT doc_id, url, u0,
         regexp_replace(u0, '^([^/?#]*//[^/?#]*)\?', '\1/?') AS u1,
         regexp_matches(u0, '^[^/?#]+://') AS is_abs
  FROM s0
), s AS (
  SELECT doc_id, url, u0, is_abs,
         CASE WHEN is_abs AND length(u1) - length(replace(u1, '/', '')) < 3
              THEN u1 || '/' ELSE u1 END AS u
  FROM s0b
), r3 AS (
  SELECT doc_id, url, u, u0, is_abs,
         regexp_replace(regexp_replace(regexp_replace(
             regexp_extract(u, '^[^/]*//[^/]*/(.*)$', 1),
             '([?&])utm_[^&]*&?', '\1', 'g'),
             '([?&])utm_[^&]*&?', '\1', 'g'),
             '([?&])utm_[^&]*&?', '\1', 'g') AS rest
  FROM s
)
SELECT doc_id, url,
       CASE WHEN NOT is_abs THEN u0 ELSE
       lower(regexp_extract(u, '^([^/]+)//', 1)) || '//' ||
       regexp_replace(lower(regexp_extract(u, '^[^/]*//([^/]*)', 1)), '^www\.', '') ||
       '/' ||
       regexp_replace(rest, '[?&]+$', '') END AS canon_url
FROM r3
"""


def q_robots_filter(sf_dir: str):
    """Robots-style per-host disallow filter: hosts whose h31 hash ≡ 0
    (mod 3) carry a disallow prefix ``p/<h31 % 10>``; documents whose
    path starts with their host's prefix are dropped. The rule table
    is tiny-per-host (broadcast via ``ray.put``); each batch resolves
    its rows' prefixes by a sorted-hosts searchsorted lookup and one
    vectorized ``starts_with`` — the scalable shape even at 10^7
    rules, since the lookup is O(log R) per DISTINCT host, not a Ray
    join. Output: surviving (doc_id, host, path)."""
    import ray

    from .stages.hashing import hash_strings

    docs = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def build_rules() -> "ray.ObjectRef":
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
        hosts = np.unique(t.column("source").to_numpy(zero_copy_only=False))
        h = hash_strings(pa.array(hosts.tolist()))
        sel = h % 3 == 0
        return ray.put(
            (
                hosts[sel],  # sorted by construction (np.unique)
                np.char.add("p/", (h[sel] % 10).astype(str)),
            )
        )

    rules_ref = _epoch_cached(f"robots_rules:{sf_dir}", build_rules)

    def keep(b: pa.Table) -> pa.Table:
        rh, rp = ray.get(rules_ref)
        host = b.column("source")
        host = host.combine_chunks() if isinstance(host, pa.ChunkedArray) else host
        path = pc.binary_join_element_wise(
            "p/", pc.cast(b.column("doc_id"), pa.string()), ""
        )
        out = pa.table({"doc_id": b.column("doc_id"), "host": host, "path": path})
        if len(rh) == 0:
            return out
        hv = host.to_numpy(zero_copy_only=False)
        # O(log R) per DISTINCT host: dedup the batch's hosts first,
        # then broadcast the per-unique verdicts back by inverse index
        uh, inv = np.unique(hv, return_inverse=True)
        idx = np.minimum(np.searchsorted(rh, uh), len(rh) - 1)
        has_rule = (rh[idx] == uh)[inv]
        # disallow prefixes are fixed-width ('p/<digit>'), so the
        # per-row varying-prefix match is one slice-equality kernel
        row_prefix = pa.array(np.where(has_rule, rp[idx][inv], ""))
        head = pc.utf8_slice_codeunits(path, 0, 3)
        hit = pc.and_(pa.array(has_rule), pc.equal(head, row_prefix))
        return out.filter(pc.invert(hit))

    return docs.map_batches(keep, batch_format="pyarrow")


def _sql_robots_filter() -> str:
    from .stages.hashing import sql_h31

    h = sql_h31("source")
    return f"""
WITH rules AS (
  SELECT source AS host, 'p/' || CAST(({h}) % 10 AS VARCHAR) AS prefix
  FROM (SELECT DISTINCT source FROM documents)
  WHERE ({h}) % 3 = 0
)
SELECT d.doc_id, d.source AS host, 'p/' || CAST(d.doc_id AS VARCHAR) AS path
FROM documents d LEFT JOIN rules r ON d.source = r.host
WHERE r.prefix IS NULL OR NOT starts_with('p/' || CAST(d.doc_id AS VARCHAR), r.prefix)
"""


DELTA_SNAPSHOT_MOD = 5  # doc_id % 5 == 0 rows play the prior crawl


def q_dedup_delta(sf_dir: str):
    """Snapshot-DELTA dedup — the incremental-crawl mode every
    production pipeline runs monthly: drop new documents whose content
    already appears in the prior snapshot (here the doc_id % 5 == 0
    rows; in production a crawl-id column). ONE bounded shuffle on the
    content-hash bucket; the text dies at the projection (32 B/row
    travels), no broadcast snapshot index, no driver compute.
    Output: surviving new doc_ids."""
    from .stages.dedup import DELTA_BUCKETS, delta_hash_rows, delta_new_rows

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    db_n = _buckets(sf_dir, DELTA_BUCKETS)
    rows = ds.map_batches(
        lambda b: delta_hash_rows(b, DELTA_SNAPSHOT_MOD, n_buckets=db_n),
        batch_format="pyarrow",
    )
    return (
        rows.repartition(_rwidth(sf_dir, db_n))
        .groupby("db")
        .map_groups(delta_new_rows, batch_format="pyarrow")
    )


def _sql_dedup_delta() -> str:
    from .stages.hashing import sql_h62

    h = sql_h62("COALESCE(text, '')")
    m = DELTA_SNAPSHOT_MOD
    return f"""
WITH hashed AS (SELECT doc_id, {h} AS h FROM documents)
SELECT doc_id FROM hashed
WHERE doc_id % {m} != 0
  AND h NOT IN (SELECT h FROM hashed WHERE doc_id % {m} = 0)
"""


def q_chunk_docs(sf_dir: str):
    """RAG/embedding-prep chunking: every document → overlapping
    CHUNK_W-word windows at CHUNK_STRIDE — entirely map-side (each doc
    chunks independently; no shuffle, no state). Output: (doc_id,
    chunk_idx, chunk_text)."""
    from .stages.packing import chunk_rows

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(chunk_rows, batch_format="pyarrow")


def _sql_chunk_docs() -> str:
    from .stages.packing import CHUNK_STRIDE, CHUNK_W

    w, s = CHUNK_W, CHUNK_STRIDE
    return f"""
WITH d AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS words,
         CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n
  FROM documents
)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
       array_to_string(words[CAST(k * {s} + 1 AS BIGINT):CAST(LEAST(k * {s} + {w}, n) AS BIGINT)], ' ') AS chunk_text
FROM (SELECT doc_id, words, n, unnest(generate_series(0, (n + {s} - 1) // {s} - 1)) AS k FROM d)
"""


def q_lines_routed(sf_dir: str):
    """J3 real spatial routing: street segments (pre-key DROPPED) →
    every 1° admin cell their geometry intersects with positive
    length, via the map-side bbox-cover + exact integer Liang-Barsky
    kernel (stages/routing.py) — no shuffle; a segment running along
    a shared cell border honestly lands in BOTH cells.
    Output: (line_id, gadm) pairs."""
    import ray

    from .stages.routing import make_route_fn

    ds = ray.data.from_arrow(_lines_e6_table())
    return ds.map_batches(
        make_route_fn(world.GADM_E6, world.N_GADM_AXIS), batch_format="pyarrow"
    )


def _sql_lines_routed() -> str:
    from .stages.routing import sql_segment_rect

    G = world.GADM_E6
    pred = sql_segment_rect(
        "x0_e6", "y0_e6", "x1_e6", "y1_e6",
        f"cgx*{G}", f"cgy*{G}", f"(cgx+1)*{G}", f"(cgy+1)*{G}",
    )
    return f"""
WITH {_sql_lines_cte()},
cells AS (SELECT a.gx AS cgx, b.gy AS cgy FROM ax a, ay b)
SELECT line_id, 'G'||cgx||'_'||cgy AS gadm
FROM lines, cells
WHERE {pred}
"""


def q_lines_sharded(sf_dir: str):
    """J4 dilated-lines ⋈ blocks shard map: segments dilated by
    2×STREET_EPS (L∞) against the street-inset block rectangles —
    the per-block street shard each reblock task needs; a block's
    bounding streets land in its shard from both sides of the border.
    Same kernel as J3 with the dilation moved onto the rectangles
    (Minkowski). Output: (line_id, block_id) pairs."""
    import ray

    from .stages.routing import block_ids_vec, make_route_fn

    ds = ray.data.from_arrow(_lines_e6_table())
    return ds.map_batches(
        make_route_fn(
            world.BLOCK_E6,
            world.N_BLOCKS,
            dilate_e6=2 * world.STREET_EPS_E6,
            inset_e6=world.STREET_EPS_E6,
            ids_vec=block_ids_vec,
            out_col="block_id",
        ),
        batch_format="pyarrow",
    )


def _sql_lines_sharded() -> str:
    from .stages.routing import sql_segment_rect

    e = world.STREET_EPS_E6
    pred = sql_segment_rect(
        "x0_e6", "y0_e6", "x1_e6", "y1_e6",
        f"(xmin_e6 - {2 * e})", f"(ymin_e6 - {2 * e})",
        f"(xmax_e6 + {2 * e})", f"(ymax_e6 + {2 * e})",
    )
    return f"""
WITH {_sql_lines_cte()},
blocks AS ({SQL_BLOCKS_DERIVED})
SELECT line_id, block_id
FROM lines, blocks
WHERE xmin_e6 - {2 * e} <= GREATEST(x0_e6, x1_e6)
  AND xmax_e6 + {2 * e} >= LEAST(x0_e6, x1_e6)
  AND ymin_e6 - {2 * e} <= GREATEST(y0_e6, y1_e6)
  AND ymax_e6 + {2 * e} >= LEAST(y0_e6, y1_e6)
  AND {pred}
"""


def q_curate_corpus(sf_dir: str):
    """END-TO-END curation pipeline — the composed webtext flagship:

      documents → per-host cap (first HOST_CAP by doc_id)
                → corpus-wide line dedup (CCNet) → cleaned text
                → quality gate (Gopher/C4 rules on the CLEANED text)
                → exact dedup (keep min doc_id per distinct clean text)

    Four bounded all-to-alls (host bucket, line bucket, doc bucket,
    text-hash bucket), each a shuffle the standalone operators already
    use; no joins back to the corpus (text rides the host shuffle), no
    broadcast sets, no driver compute. Output: (doc_id, clean_text)
    of the surviving training corpus."""
    from .stages.curation import (
        DOC_BUCKETS,
        HOST_BUCKETS,
        KB_BUCKETS,
        LINE_BUCKETS,
        dedup_keep_min,
        doc_line_rows,
        host_rank_keep_text,
        line_flag_rows,
        reassemble_docs,
    )
    from .stages.hashing import hash_strings, hash_strings62
    from .stages.textops import quality_score

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    from functools import partial

    hb_n = _buckets(sf_dir, HOST_BUCKETS)
    lb_n = _buckets(sf_dir, LINE_BUCKETS, fanout=16)
    db_n = _buckets(sf_dir, DOC_BUCKETS)
    kb_n = _buckets(sf_dir, KB_BUCKETS)

    def host_key(b: pa.Table) -> pa.Table:
        host = b.column("source").combine_chunks() if isinstance(
            b.column("source"), pa.ChunkedArray
        ) else b.column("source")
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "host": host,
                "text": b.column("text"),
                "hb": pa.array(hash_strings(host) % hb_n, pa.int64()),
            }
        )

    capped = (
        ds.map_batches(host_key, batch_format="pyarrow")
        .repartition(_rwidth(sf_dir, hb_n))  # full doc stream
        .groupby("hb")
        .map_groups(host_rank_keep_text, batch_format="pyarrow")
    )
    lines = capped.map_batches(
        partial(doc_line_rows, n_buckets=lb_n), batch_format="pyarrow"
    )
    flagged = (
        lines.repartition(_rwidth(sf_dir, lb_n, fanout=16))  # line rows
        .groupby("lb")
        .map_groups(partial(line_flag_rows, doc_buckets=db_n), batch_format="pyarrow")
    )
    cleaned = (
        flagged.repartition(_rwidth(sf_dir, db_n, fanout=16))
        .groupby("db")
        .map_groups(reassemble_docs, batch_format="pyarrow")
    )

    def quality_gate(b: pa.Table) -> pa.Table:
        q = quality_score(
            pa.table({"doc_id": b.column("doc_id"), "text": b.column("clean_text")})
        )
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(q.column("n_words"), 20),
                pc.greater_equal(q.column("stopword_hits"), 1),
            ),
            pc.less_equal(q.column("mean_wlen_x100"), 900),
        )
        kept = pa.table(
            {"doc_id": b.column("doc_id"), "clean_text": b.column("clean_text")}
        ).filter(mask)
        ct = kept.column("clean_text").combine_chunks() if isinstance(
            kept.column("clean_text"), pa.ChunkedArray
        ) else kept.column("clean_text")
        return kept.append_column(
            "kb", pa.array(hash_strings62(ct) % kb_n, pa.int64())
        )

    return (
        cleaned.map_batches(quality_gate, batch_format="pyarrow")
        .repartition(_rwidth(sf_dir, kb_n))  # surviving doc stream
        .groupby("kb")
        .map_groups(dedup_keep_min, batch_format="pyarrow")
    )


def _sql_curate_corpus() -> str:
    from .stages.curation import HOST_CAP
    from .stages.textops import STOPWORDS

    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH capped AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn <= {HOST_CAP}
),
{_sql_lines("capped")},
c AS (SELECT line, COUNT(*) AS cnt FROM l GROUP BY 1),
cleaned AS (
  SELECT l.doc_id,
         COALESCE(string_agg(CASE WHEN c.cnt < 2 THEN l.line END, ' '
                             ORDER BY l.line_idx), '') AS clean_text
  FROM l JOIN c USING (line) GROUP BY 1
),
qw AS (
  SELECT doc_id, clean_text, string_split(clean_text, ' ') AS words,
         strlen(clean_text) AS n_chars
  FROM cleaned
),
kept AS (
  SELECT doc_id, clean_text FROM qw
  WHERE len(words) >= 20
    AND len(list_filter(words, x -> x IN ({stops}))) >= 1
    AND (n_chars - (len(words) - 1)) * 100 // len(words) <= 900
)
SELECT doc_id, clean_text FROM kept
QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY clean_text)
"""


# ---------------------------------------------------------------------------
# registry

QUERIES: Dict[str, Callable] = {
    "extract_text": q_extract_text,
    "warc_extract": q_warc_extract,
    "geocode": q_geocode,
    "pip_join": q_pip_join,
    "knn_parcels": q_knn_parcels,
    "tile_rollup": q_tile_rollup,
    "match_count_qc": q_match_count_qc,
    "dist_quantiles": q_dist_quantiles,
    "top_blocks": q_top_blocks,
    "semi_join_aoi": q_semi_join_aoi,
    "anti_join_empty_gadm": q_anti_join_empty_gadm,
    "dedup_exact": q_dedup_exact,
    "lineitem_pricing": q_lineitem_pricing,
    "segment_revenue": q_segment_revenue,
    "events_hourly": q_events_hourly,
    "blocks_derived": q_blocks_derived,
    "blocks_diagonal": q_blocks_diagonal,
    "parcels_ladder": q_parcels_ladder,
    "block_complexity": q_block_complexity,
    "complexity_hist": q_complexity_hist,
    "token_counts": q_token_counts,
    "text_quality": q_text_quality,
    "quality_filter": q_quality_filter,
    "decontaminate": q_decontaminate,
    "corpus_sample": q_corpus_sample,
    "redact_pii": q_redact_pii,
    "lang_id": q_lang_id,
    "lang_id_trigram": q_lang_id_trigram,
    "doc_fingerprint": q_fingerprint,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_embedding": q_dedup_embedding,
    "ann_topk": q_ann_topk,
    "ann_stream": q_ann_stream,
    "ann_topk_lsh": q_ann_topk_lsh,
    "ann_topk_ivf": q_ann_topk_ivf,
    "media_meta": q_media_meta,
    "frame_sample": q_frame_sample,
    "media_pixels": q_media_pixels,
    "frame_pixels": q_frame_pixels,
    "reblock": q_reblock,
    "reblock_terminals": q_reblock_terminals,
    "reblock_interior": q_reblock_interior,
    "sessionize": q_sessionize,
    "event_props": q_event_props,
    "points_union": q_points_union,
    "nation_revenue": q_nation_revenue,
    "blocks_buffered": q_blocks_buffered,
    "cell_counts_salted": q_cell_counts_salted,
    "zonal_raster": q_zonal_raster,
    "parcels_derived": q_parcels_derived,
    "pip_join_sharded": q_pip_join_sharded,
    "dedup_corpus": q_dedup_corpus,
    "block_inventory": q_block_inventory,
    "aoi_polygon_filter": q_aoi_polygon_filter,
    "knn_parcels_sharded": q_knn_parcels_sharded,
    "events_sliding": q_events_sliding,
    "pip_join_holes": q_pip_join_holes,
    "knn_parcels_k3": q_knn_parcels_k3,
    "blocks_periphery": q_blocks_periphery,
    "events_asof": q_events_asof,
    "events_range": q_events_range,
    "knn_parcels_k3_sharded": q_knn_parcels_k3_sharded,
    "pip_join_holes_sharded": q_pip_join_holes_sharded,
    "host_stats": q_host_stats,
    "host_cap": q_host_cap,
    "line_dedup": q_line_dedup,
    "repetition_signals": q_repetition_signals,
    "dedup_clusters": q_dedup_clusters,
    "host_pagerank": q_host_pagerank,
    "extract_links": q_extract_links,
    "link_pagerank": q_link_pagerank,
    "doc_surprisal": q_doc_surprisal,
    "dedup_keep_best": q_dedup_keep_best,
    "anchor_texts": q_anchor_texts,
    "normalize_text": q_normalize_text,
    "embedding_gram": q_embedding_gram,
    "embedding_pca": q_embedding_pca,
    "jsonl_ingest": q_jsonl_ingest,
    "jsonl_lenient": q_jsonl_lenient,
    "host_components": q_host_components,
    "anchor_texts_rich": q_anchor_texts_rich,
    "events_late": q_events_late,
    "tfidf_topk": q_tfidf_topk,
    "ngram_topk": q_ngram_topk,
    "dup_spans": q_dup_spans,
    "dup_spans_exact": q_dup_spans_exact,
    "seq_pack": q_seq_pack,
    "shuffle_rank": q_shuffle_rank,
    "lines_routed": q_lines_routed,
    "lines_sharded": q_lines_sharded,
    "curate_corpus": q_curate_corpus,
    "chunk_docs": q_chunk_docs,
    "embedding_centroids": q_embedding_centroids,
    "dedup_delta": q_dedup_delta,
    "dedup_embedding_ann": q_dedup_embedding_ann,
    "ann_topk_pq": q_ann_topk_pq,
    "ccnet_tiers": q_ccnet_tiers,
    "canonical_urls": q_canonical_urls,
    "robots_filter": q_robots_filter,
    "train_pack": q_train_pack,
    "qc_report": q_qc_report,
}

def _sql_golden(name: str) -> str:
    """Oracle for a geometry-family query: its frozen golden table
    (tools/make_goldens.py — regenerate only after an intentional
    kernel change whose pytest goldens were re-derived first). The
    fixtures are deterministic and sf-independent, so one golden per
    query covers every sf_dir the driver runs."""
    import os

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "goldens")
    return f"SELECT * FROM read_parquet('{os.path.join(os.path.abspath(d), name)}.parquet')"


ORACLES: Dict[str, str] = {
    "reblock": _sql_golden("reblock"),
    "reblock_interior": _sql_golden("reblock_interior"),
    "block_complexity": _sql_golden("block_complexity"),
    "complexity_hist": _sql_golden("complexity_hist"),
    "parcels_ladder": _sql_golden("parcels_ladder"),
    "extract_text": SQL_EXTRACT,
    "warc_extract": SQL_WARC_EXTRACT,
    "geocode": SQL_GEOCODE,
    "pip_join": SQL_PIP_JOIN,
    "knn_parcels": SQL_KNN,
    "tile_rollup": SQL_TILE,
    "match_count_qc": SQL_QC,
    "dist_quantiles": SQL_QUANTILES,
    "top_blocks": SQL_TOP_BLOCKS,
    "semi_join_aoi": SQL_SEMI_JOIN,
    "anti_join_empty_gadm": SQL_ANTI_JOIN,
    "dedup_exact": _sql_dedup_exact(),
    "lineitem_pricing": SQL_LINEITEM_PRICING,
    "segment_revenue": SQL_SEGMENT_REVENUE,
    "events_hourly": SQL_EVENTS_HOURLY,
    "blocks_derived": SQL_BLOCKS_DERIVED,
    "blocks_diagonal": _sql_blocks_diagonal(),
    "token_counts": _sql_token_counts(),
    "text_quality": _sql_text_quality(),
    "quality_filter": _sql_quality_filter(),
    "decontaminate": _sql_decontaminate(),
    "corpus_sample": _sql_corpus_sample(),
    "redact_pii": _sql_redact_pii(),
    "lang_id": _sql_lang_id(),
    "lang_id_trigram": _sql_lang_id_trigram(),
    "doc_fingerprint": _sql_fingerprint(),
    "dedup_minhash": _sql_dedup_minhash(),
    "dedup_simhash": _sql_dedup_simhash(),
    "dedup_jaccard": SQL_DEDUP_JACCARD,
    "dedup_embedding": SQL_DEDUP_EMBEDDING,
    "ann_topk": SQL_ANN_TOPK,
    "ann_stream": SQL_ANN_TOPK,
    "media_meta": SQL_MEDIA_META,
    "frame_sample": SQL_FRAME_SAMPLE,
    "media_pixels": SQL_MEDIA_PIXELS,
    "frame_pixels": SQL_FRAME_PIXELS,
    "reblock_terminals": SQL_REBLOCK_TERMINALS,
    "sessionize": SQL_SESSIONIZE,
    "event_props": SQL_EVENT_PROPS,
    "points_union": SQL_POINTS_UNION,
    "nation_revenue": SQL_NATION_REVENUE,
    "blocks_buffered": SQL_BLOCKS_DERIVED,  # method parity: same oracle
    "cell_counts_salted": SQL_CELL_COUNTS,
    "zonal_raster": _sql_zonal(),
    "parcels_derived": SQL_PARCELS_DERIVED,
    "pip_join_sharded": SQL_PIP_JOIN,  # sharded path ≡ broadcast path
    "dedup_corpus": _sql_dedup_corpus(),
    "block_inventory": SQL_BLOCK_INVENTORY,
    "aoi_polygon_filter": _sql_aoi(),
    "knn_parcels_sharded": SQL_KNN,  # halo'd shards ≡ broadcast
    "events_sliding": SQL_EVENTS_SLIDING,
    "pip_join_holes": SQL_PIP_HOLES,
    "knn_parcels_k3": SQL_KNN_K3,
    "blocks_periphery": _sql_blocks_periphery(),
    "events_asof": SQL_EVENTS_ASOF,
    "events_range": SQL_EVENTS_RANGE,
    "knn_parcels_k3_sharded": SQL_KNN_K3,  # halo'd shards ≡ broadcast
    "pip_join_holes_sharded": SQL_PIP_HOLES,  # cell shards ≡ broadcast
    "host_stats": SQL_HOST_STATS,
    "host_cap": _sql_host_cap(),
    "line_dedup": _sql_line_dedup(),
    "repetition_signals": _sql_repetition(),
    "dedup_clusters": _sql_dedup_clusters(),
    "host_pagerank": _sql_host_pagerank(),
    "extract_links": SQL_EXTRACT_LINKS,
    "link_pagerank": _sql_link_pagerank(),
    "doc_surprisal": _sql_doc_surprisal(),
    "dedup_keep_best": _sql_dedup_keep_best(),
    "anchor_texts": SQL_ANCHOR_TEXTS,
    "normalize_text": SQL_NORMALIZE_TEXT,
    "embedding_gram": SQL_EMBEDDING_GRAM,
    "jsonl_ingest": SQL_JSONL_INGEST,
    "jsonl_lenient": SQL_JSONL_INGEST,  # same contract: only the
    # injected garbage lines disappear
    "host_components": _sql_host_components(),
    "anchor_texts_rich": SQL_ANCHOR_TEXTS_RICH,
    "events_late": _sql_events_late(),
    "tfidf_topk": _sql_tfidf_topk(),
    "ngram_topk": _sql_ngram_topk(),
    "dup_spans": _sql_dup_spans(),
    "dup_spans_exact": _sql_dup_spans_exact(),
    "seq_pack": _sql_seq_pack(),
    "shuffle_rank": _sql_shuffle_rank(),
    "lines_routed": _sql_lines_routed(),
    "lines_sharded": _sql_lines_sharded(),
    "curate_corpus": _sql_curate_corpus(),
    "chunk_docs": _sql_chunk_docs(),
    "embedding_centroids": SQL_EMBEDDING_CENTROIDS,
    "dedup_delta": _sql_dedup_delta(),
    "ccnet_tiers": SQL_CCNET_TIERS,
    "canonical_urls": SQL_CANONICAL_URLS,
    "robots_filter": _sql_robots_filter(),
    "train_pack": _sql_train_pack(),
    "qc_report": _sql_qc_report(),
    # block_complexity / complexity_hist: geometry not SQL-expressible;
    # ann_topk_lsh: approximate by design → rows-only driver checks.
}
