"""Ray-stage tests: flagship join, resume semantics, training-data
operators. Uses the session-scoped ray fixture (conftest.py) and the
driver testdata at sf0.001."""

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def joined_df(ray_session):
    from prclz_ray.queries import _joined

    return _joined(SF).to_pandas()


def test_flagship_join_assignments(joined_df):
    df = joined_df
    assert len(df) == 500
    geo = df[df.has_geo]
    # every geocoded page gets a block, gadm, parcel
    assert geo.block_id.notna().all()
    assert geo.parcel_id.notna().all()
    # the integer-arithmetic oracle: block = floor(coord / pitch)
    bx = geo.lon_e6 // 100_000
    by = geo.lat_e6 // 100_000
    expect = "B" + bx.astype(int).map("{:02d}".format) + "_" + by.astype(int).map("{:02d}".format)
    assert (geo.block_id == expect).all()
    # parcel is one of the block's own four
    assert all(p.startswith(b) for p, b in zip(geo.parcel_id, geo.block_id))
    # non-geo pages get nothing
    assert df[~df.has_geo].block_id.isna().all()


def test_extract_text_byte_identical(ray_session):
    """input_hint invariant: extracted text is byte-identical per url."""
    import pyarrow.parquet as pq

    from prclz_ray.queries import q_extract_text

    got = q_extract_text(SF).to_pandas().sort_values("url").reset_index(drop=True)
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    src["url"] = "https://" + src.source + "/" + src.doc_id.astype(str)
    src = src.sort_values("url").reset_index(drop=True)
    assert (got.text.str.encode("utf-8") == src.text.str.encode("utf-8")).all()


def test_run_flagship_resume(ray_session, tmp_path):
    """Kill-and-resume: delete a few completed partitions, resume, and
    the output matches a clean full run partition-for-partition."""
    from prclz_ray.pipelines.flagship import run_flagship
    from prclz_ray.state.manifest import Manifest

    full = str(tmp_path / "full")
    res = str(tmp_path / "resumable")
    r1 = run_flagship(SF, full, resume=False)
    r2 = run_flagship(SF, res, resume=False)
    assert r1["rows"] == r2["rows"] == 500

    # simulate a killed run: drop 3 partitions (files + manifest rows)
    m = Manifest(res)
    victims = sorted(m.completed())[:3]
    for v in victims:
        for d in glob.glob(os.path.join(res, f"cell_r5={v}")):
            shutil.rmtree(d)
        os.remove(os.path.join(res, "_manifest", f"{v}.json"))
    assert m.plan(Manifest(full).completed()) == set(victims)

    r3 = run_flagship(SF, res, resume=True)
    assert r3["skipped"] == len(Manifest(full).completed()) - 3
    assert r3["rows"] == 500  # total rows across all partitions again

    import pyarrow.parquet as pq

    a = pq.read_table(full).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = pq.read_table(res).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert (a.block_id.fillna("") == b.block_id.fillna("")).all()
    assert (a.parcel_id.fillna("") == b.parcel_id.fillna("")).all()


def test_minhash_lsh_finds_near_duplicates(ray_session):
    """A doc and a 1-word-edited copy must share an LSH bucket."""
    from prclz_ray.stages.dedup import minhash_signatures

    base = " ".join(f"word{i}" for i in range(40))
    edited = base.replace("word20", "changed")
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([base, edited, "completely different words entirely here now"]),
        }
    )
    sig = minhash_signatures(t)
    import pandas as pd

    pairs = (
        sig.to_pandas()
        .groupby("bucket")["doc_id"]
        .apply(lambda s: sorted(set(s)))
    )
    dup_pairs = {tuple(v) for v in pairs if len(v) > 1}
    assert (1, 2) in dup_pairs
    assert not any(3 in p for p in dup_pairs)


def test_simhash_close_for_near_duplicates(ray_session):
    from prclz_ray.stages.dedup import simhash

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([base, base.replace("kappa", "lambda")]),
        }
    )
    s = simhash(t).column("simhash").to_pylist()
    hamming = bin(s[0] ^ s[1]).count("1")
    assert hamming <= 4  # near-dups land within a few bits


def test_ann_topk_rank1_is_self(ray_session):
    from prclz_ray.queries import q_ann_topk

    df = q_ann_topk(SF).to_pandas()
    r1 = df[df["rank"] == 1]
    assert (r1.query_id == r1.vec_id).all()
    assert set(df.groupby("query_id")["rank"].max()) == {10}


def test_media_roundtrip(ray_session):
    from prclz_ray.stages.media import media_meta, synth_media

    t = pa.table(
        {
            "doc_id": pa.array([0, 7, 239, 2400], pa.int64()),
            "text": pa.array(["abc", "defgh", "x" * 300, "y" * 40]),
        }
    )
    m = media_meta(synth_media(t)).to_pandas()
    assert m.width.tolist() == [16, 23, 255, 16]
    assert m.height.tolist() == [16, 17, 50, 16 + (2400 // 7) % 240]
    assert m.n_payload.tolist() == [3, 5, 300, 40]
    assert m.checksum.tolist()[0] == sum(b"abc")


def test_rle_codec_golden():
    """Byte-level RLE goldens: roundtrip on the synthetic image, runs
    longer than 255 split correctly, empty payload."""
    from prclz_ray.stages.media import _rle_encode, rle_decode, synth_pixels

    for d in (0, 7, 47, 12345):
        img = synth_pixels(d)
        assert np.array_equal(rle_decode(_rle_encode(img.ravel())), img.ravel())
    # a 700-long constant run must split into 255+255+190
    v = np.full(700, 42, np.uint8)
    enc = np.frombuffer(_rle_encode(v), np.uint8)
    assert enc[0::2].tolist() == [255, 255, 190]
    assert set(enc[1::2].tolist()) == {42}
    assert np.array_equal(rle_decode(enc.tobytes()), v)
    assert _rle_encode(np.array([], np.uint8)) == b""


def test_decode_actor_matches_formula(ray_session):
    """DecodeActor's byte decode reproduces the formula image exactly:
    stats AND sampled-frame row sums equal the numpy ground truth."""
    from prclz_ray.stages.media import (
        DecodeActor,
        frame_pixel_sums,
        synth_media_pixels,
        synth_pixels,
    )

    ids = [0, 3, 7, 100, 2400]
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["x"] * len(ids)),
        }
    )
    media = synth_media_pixels(t)
    out = DecodeActor()(media).to_pandas().set_index("doc_id")
    fr = frame_pixel_sums(media, every_n=4).to_pandas()
    for d in ids:
        img = synth_pixels(d).astype(np.int64)
        assert out.loc[d, "width"] == img.shape[1]
        assert out.loc[d, "height"] == img.shape[0]
        assert out.loc[d, "n_pixels"] == img.size
        assert out.loc[d, "px_sum"] == img.sum()
        assert out.loc[d, "px_max"] == img.max()
        mine = fr[fr.doc_id == d].sort_values("frame")
        assert mine.frame.tolist() == list(range(0, img.shape[0], 4))
        assert mine.row_sum.tolist() == [img[r].sum() for r in range(0, img.shape[0], 4)]
    # corrupt magic fails loudly
    bad = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "media": pa.array([b"NOPE" + b"\x00" * 8], pa.large_binary()),
        }
    )
    with pytest.raises(ValueError, match="magic invalid"):
        DecodeActor()(bad)


def test_quality_and_langid_vectorized(ray_session):
    from prclz_ray.stages.textops import lang_id, quality_score

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the cat sat on the mat",
                    "el gato que duerme y la casa",
                    "xyzzy plugh",
                ]
            ),
            "lang": pa.array(["en", "es", "zz"]),
        }
    )
    q = quality_score(t).to_pandas()
    assert q.n_words.tolist() == [6, 7, 2]
    assert q.stopword_hits.tolist()[0] == 3  # the, on, the
    l = lang_id(t).to_pandas()
    assert l.lang_pred.tolist() == ["en", "es", "und"]


def test_reblock_goldens(ray_session):
    """Pin the Steiner output for the first blocks (deterministic)."""
    from prclz_ray.pipelines.reblock import reblock_dataset

    df = (
        reblock_dataset(limit_blocks=4)
        .to_pandas()
        .sort_values("block_id")
        .reset_index(drop=True)
    )
    assert df.block_id.tolist() == ["B00_00", "B00_01", "B00_02", "B00_03"]
    assert df.n_terminals.tolist() == [4, 5, 6, 7]
    assert df.n_steiner_edges.tolist() == [4, 5, 7, 8]
    assert df.n_new_edges.tolist() == [1, 2, 4, 6]
    assert df.total_len_e6.tolist() == [88484, 82726, 111470, 112479]
    assert df.new_len_e6.tolist() == [27484, 34726, 63470, 64479]
    # every block's terminals = its buildings + 1 road-access point
    from prclz_ray import world

    for _, r in df.iterrows():
        bx, by = int(r.block_id[1:3]), int(r.block_id[4:6])
        assert r.n_terminals == int(world.n_buildings_for_block(bx, by)) + 1


def test_approx_quantiles_close_to_exact(ray_session):
    from prclz_ray.queries import _joined
    from prclz_ray.stages.rollup import approx_quantiles_int, exact_quantiles_int

    ds = _joined(SF).filter(expr="has_geo")
    qs = [0.5, 0.95]
    exact = exact_quantiles_int(ds, "dist2", qs)
    approx = approx_quantiles_int(ds, "dist2", qs)
    for e, a in zip(exact, approx):
        assert abs(a - e) <= 0.05 * max(e, 1)  # rank error ≤ ~1/256


def test_reblock_status_ok_and_dead_letter(ray_session):
    from prclz_ray.pipelines.reblock import MAX_GRAPH_EDGES, reblock_dataset, reblock_group
    import prclz_ray.pipelines.reblock as rb

    df = reblock_dataset(limit_blocks=3).to_pandas()
    assert (df.status == "ok").all()
    # force the budget down → dead-letter, never an exception
    old = rb.MAX_GRAPH_EDGES
    try:
        rb.MAX_GRAPH_EDGES = 2
        import pyarrow.parquet as pq

        from prclz_ray.pipelines import derive

        parcels = pq.read_table(derive.parcels_path())
        g = parcels.filter(
            __import__("pyarrow.compute", fromlist=["equal"]).equal(
                parcels.column("block_id"), "B00_00"
            )
        )
        out = reblock_group(g).to_pandas()
        assert out.status.tolist() == ["dead_letter:graph_too_large"]
    finally:
        rb.MAX_GRAPH_EDGES = old


def test_voronoi_parcels_partition_their_block(ray_session):
    """G19 partition property: a block's 4 parcel cells tile it exactly
    (areas sum to the block area; anchors inside their own cell)."""
    import pyarrow.parquet as pq

    from prclz_ray.geom.core import point_in_polygon, polygon_area
    from prclz_ray.geom.wkb import parse_wkb
    from prclz_ray.pipelines import derive

    parcels = pq.read_table(derive.parcels_path()).to_pandas()
    blocks = pq.read_table(derive.blocks_path()).to_pandas().set_index("block_id")
    for block_id, grp in list(parcels.groupby("block_id"))[:25]:
        _, brings = parse_wkb(bytes(blocks.loc[block_id, "geom_wkb"]))
        barea = polygon_area(brings[0])
        total = 0.0
        for _, r in grp.iterrows():
            _, rings = parse_wkb(bytes(r.geom_wkb))
            total += polygon_area(rings[0])
            assert point_in_polygon(
                rings[0], r.anchor_lon_e6 / 1e6, r.anchor_lat_e6 / 1e6
            )
        assert abs(total - barea) < 1e-9


def test_fault_tolerance_worker_crash(ray_session, tmp_path):
    """Lineage fault tolerance: a worker death (os._exit, not a user
    exception) mid-pipeline is retried by Ray and the flagship output
    is complete and correct — the engine-level replacement for the
    reference's error_{index}-file-and-continue (`midway_blocks.py:45-48`)."""
    import os

    import ray.data

    from prclz_ray.stages.pages import extract_text, geocode, index_cells, synth_pages

    marker = str(tmp_path / "crashed_once")

    def crash_once(batch: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            open(marker, "w").close()
            os._exit(1)
        return batch

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    ds = ds.map_batches(synth_pages, batch_format="pyarrow", batch_size=100)
    ds = ds.map_batches(crash_once, batch_format="pyarrow", batch_size=100)
    ds = ds.map_batches(geocode, batch_format="pyarrow")
    ds = ds.map_batches(extract_text, batch_format="pyarrow")
    ds = ds.map_batches(index_cells, batch_format="pyarrow")
    df = ds.to_pandas()
    assert len(df) == 500
    assert df.doc_id.nunique() == 500
    assert os.path.exists(marker)


def test_determinism_under_parallelism(ray_session):
    """FIXTURES.md §3 'scaling' row: the joined output is identical
    regardless of partitioning/parallelism (key-derived ids, no
    enumeration order anywhere)."""
    import ray.data

    from prclz_ray.pipelines.flagship import joined_pages, load_side_tables

    br, ar = load_side_tables()
    a = (
        joined_pages(SF, blocks_ref=br, anchors_ref=ar, batch_size=8192)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        joined_pages(SF, blocks_ref=br, anchors_ref=ar, batch_size=37)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in ("doc_id", "block_id", "gadm", "parcel_id", "dist2", "cell_r5"):
        assert (a[col].fillna("") == b[col].fillna("")).all(), col


def test_actor_mode_equals_task_mode(ray_session):
    """mode='actor' (explicit actor pools) produces the identical join
    to the default task mode."""
    from prclz_ray.pipelines.flagship import joined_pages, load_side_tables

    br, ar = load_side_tables()
    t = (
        joined_pages(SF, blocks_ref=br, anchors_ref=ar, mode="task")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    a = (
        joined_pages(
            SF, blocks_ref=br, anchors_ref=ar, mode="actor",
            pip_concurrency=(1, 2), knn_concurrency=(1, 2),
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for col in ("block_id", "gadm", "parcel_id", "dist2"):
        assert (t[col].fillna("") == a[col].fillna("")).all(), col


def test_complexity_hist_golden(ray_session):
    """Golden full-pipeline k-complexity distribution over all 10,000
    blocks (PIP join → per-block Voronoi → weak-dual sequence): the
    engine-level analogue of the reference's fixed-k smoketests
    (`smoketests/smoketest_block_complexity.py`)."""
    from prclz_ray.queries import QUERIES

    df = (
        QUERIES["complexity_hist"](SF)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert df.k.tolist() == [1, 2, 3]
    assert df.n_blocks.tolist() == [2693, 4413, 2894]


def test_resume_cleans_stale_partial_partitions(ray_session, tmp_path):
    """Crash-mid-write: partition dirs WITHOUT manifest rows are stale
    partial output and must be deleted before recompute — a resumed run
    never duplicates rows."""
    import pyarrow.parquet as pq

    from prclz_ray.pipelines.flagship import run_flagship
    from prclz_ray.state.manifest import Manifest

    out = str(tmp_path / "out")
    run_flagship(SF, out, resume=False)
    m = Manifest(out)
    # simulate a crash: files on disk but manifest rows missing
    victims = sorted(m.completed())[:4]
    for v in victims:
        os.remove(os.path.join(out, "_manifest", f"{v}.json"))

    r = run_flagship(SF, out, resume=True)
    t = pq.read_table(out)
    assert t.num_rows == 500
    assert len(set(t.column("doc_id").to_pylist())) == 500  # no duplicates
    assert r["skipped"] == len(m.completed()) - 4


def test_csv_wkt_roundtrip(ray_session, tmp_path):
    """S3/S4 parity: blocks → CSV+WKT → read back → identical ids,
    bounds, and geometry; duplicate block_id raises at load."""
    import pyarrow.parquet as pq

    from prclz_ray.pipelines import derive
    from prclz_ray.sources import read_blocks_csv_wkt, write_blocks_csv_wkt
    from prclz_ray.geom.wkb import parse_wkb

    blocks = pq.read_table(derive.blocks_path()).slice(0, 200)
    path = str(tmp_path / "blocks.csv")
    write_blocks_csv_wkt(blocks, path)

    back = read_blocks_csv_wkt(path).to_pandas().sort_values("block_id").reset_index(drop=True)
    orig = blocks.to_pandas().sort_values("block_id").reset_index(drop=True)
    assert back.block_id.tolist() == orig.block_id.tolist()
    for i in (0, 50, 199):
        r1 = parse_wkb(bytes(orig.geom_wkb[i]))[1][0]
        r2 = parse_wkb(bytes(back.geom_wkb[i]))[1][0]
        assert np.allclose(r1, r2, atol=1e-6)

    # duplicate block_id must raise (reference's uniqueness assert)
    import pandas as pd
    import pytest as _pytest

    dup = pd.read_csv(path)
    pd.concat([dup, dup.iloc[:1]]).to_csv(str(tmp_path / "dup.csv"), index=False)
    with _pytest.raises(ValueError, match="duplicate block_id"):
        read_blocks_csv_wkt(str(tmp_path / "dup.csv"))


def test_geojson_reader(ray_session, tmp_path):
    import json

    from prclz_ray.geom.wkb import parse_wkb
    from prclz_ray.sources import read_geojson_features

    feats = [
        {"type": "Feature", "properties": {"osm_id": 1, "highway": "residential"},
         "geometry": {"type": "LineString", "coordinates": [[0, 0], [1, 1]]}},
        {"type": "Feature", "properties": {"osm_id": 2, "building": "yes"},
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]}},
        {"type": "Feature", "properties": {"osm_id": 3},
         "geometry": {"type": "Point", "coordinates": [5.5, 6.5]}},
    ]
    path = str(tmp_path / "f.ndjson")
    with open(path, "w") as f:
        for x in feats:
            f.write(json.dumps(x) + "\n")
    df = read_geojson_features(path).to_pandas().sort_values("osm_id").reset_index(drop=True)
    assert df.geom_type.tolist() == ["LineString", "Polygon", "Point"]
    assert df.highway.tolist()[0] == "residential" and df.building.tolist()[1] == "yes"
    kind, parts = parse_wkb(bytes(df.geom_wkb[2]))
    assert tuple(parts) == (5.5, 6.5)  # POINT parses to its coord pair


def test_run_tiles_job(ray_session, tmp_path):
    """The raster-heatmap tiling job end-to-end: partitioned output +
    manifest, totals consistent with the flagship join."""
    import pyarrow.parquet as pq

    from prclz_ray.pipelines.flagship import run_tiles
    from prclz_ray.state.manifest import Manifest

    out = str(tmp_path / "tiles")
    stats = run_tiles(SF, out)
    t = pq.read_table(out)
    assert stats["tiles"] == t.num_rows > 0
    assert t.column("n_pages").to_pandas().sum() == 486  # all geo pages
    assert len(Manifest(out).completed()) == stats["new_stripes"]

    # idempotency: a re-run with the same out_dir skips every completed
    # stripe and appends NOTHING (write_parquet never overwrites) —
    # "tiles" stays the TOTAL in the output, "new_tiles" goes to 0
    stats2 = run_tiles(SF, out)
    assert stats2["tiles"] == stats["tiles"]
    assert stats2["new_tiles"] == 0 and stats2["new_stripes"] == 0
    assert stats2["skipped"] == stats["new_stripes"]
    t2 = pq.read_table(out)
    assert t2.num_rows == t.num_rows

    # manifest tag scoping: a foreign job's rows in the SAME manifest
    # survive a tiles re-run untouched (the CLAUDE.md invariant)
    m = Manifest(out)
    m.mark("kb7", 123, fingerprint="other-job")
    m.mark("42", 5, fingerprint="other-job")  # bare flagship-style key
    run_tiles(SF, out)
    left = m.completed()
    assert "kb7" in left and "42" in left


def test_reblock_interior_goldens(ray_session):
    """G17 full semantics: boundary-access buildings dropped, interior
    blocks reblocked, access-less blocks skipped with status rows."""
    from prclz_ray.pipelines.reblock import reblock_interior_dataset

    df = reblock_interior_dataset(limit_blocks=100).to_pandas()
    counts = df.status.value_counts().to_dict()
    assert counts == {"skipped:boundary_access": 75, "ok": 25}
    ok = df[df.status == "ok"].sort_values("block_id").reset_index(drop=True)
    first = ok.iloc[0]
    assert first.block_id == "B00_11"
    assert first.n_terminals == 3  # 2 interior buildings + outside terminal
    assert first.new_len_e6 == 46347


def test_update_edge_types_barriers_and_relabel():
    """G16 full: corner-path relabel marks the whole boundary as road
    (original-length paths, not shortcut by earlier relabels); a
    waterway barrier edge gets weight 1e5 and the Steiner tree routes
    around it."""
    import numpy as np

    from prclz_ray.graph.planar import PlanarGraph
    from prclz_ray.graph.steiner import steiner_tree_approx
    from prclz_ray.pipelines.reblock import BARRIER_WEIGHT, update_edge_types

    def grid_graph():
        g = PlanarGraph()
        # 3x3 lattice, unit pitch
        for i in range(3):
            for j in range(3):
                if i < 2:
                    g.add_edge((float(i), float(j)), (float(i + 1), float(j)))
                if j < 2:
                    g.add_edge((float(i), float(j)), (float(i), float(j + 1)))
        return g

    g = grid_graph()
    missing, total = update_edge_types(g, [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)])
    assert (missing, total) == (0, 4)
    # every border edge is road, no interior edge is
    border = {((0.0, 0.0), (1.0, 0.0)), ((1.0, 0.0), (2.0, 0.0)),
              ((2.0, 0.0), (2.0, 1.0)), ((2.0, 1.0), (2.0, 2.0)),
              ((1.0, 2.0), (2.0, 2.0)), ((0.0, 2.0), (1.0, 2.0)),
              ((0.0, 1.0), (0.0, 2.0)), ((0.0, 0.0), (0.0, 1.0))}
    roads = {k for k, f in g.edge_flags.items() if f["road"]}
    assert roads == border

    # barrier: block the straight center route between two terminals
    g2 = grid_graph()
    update_edge_types(
        g2,
        [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)],
        barriers={((1.0, 0.0), (1.0, 1.0)): "waterway", ((1.0, 1.0), (1.0, 2.0)): "natural"},
    )
    key = ((1.0, 0.0), (1.0, 1.0))
    assert g2.edge_flags[key]["weight"] == BARRIER_WEIGHT
    g2.terminal = set()
    t1 = g2.add_node_to_closest_edge((1.0, 0.0), terminal=True)
    t2 = g2.add_node_to_closest_edge((1.0, 2.0), terminal=True)
    edges = steiner_tree_approx(g2, [t1, t2])
    assert key not in edges  # tree detours around the waterway


def test_reblock_simplify_variant(ray_session):
    """G15 wiring: degree-2 contraction before Steiner keeps terminal
    counts and produces a connected proposal."""
    from prclz_ray.pipelines.reblock import reblock_dataset

    df = reblock_dataset(limit_blocks=3, simplify=True).to_pandas().sort_values("block_id")
    assert df.status.tolist() == ["ok"] * 3
    assert df.n_terminals.tolist() == [4, 5, 6]


def test_ann_partition_pruned_reads(ray_session):
    """The Hive-partitioned ANN indexes read FEWER partitions than the
    full scan, and the pruned query output is unchanged."""
    import os

    import numpy as np

    from prclz_ray.queries import QUERIES, _load_query_vectors
    from prclz_ray.stages.similarity import (
        bucket_of, build_srp_partitions, probed_paths, srp_planes, srp_probe_set,
    )

    sf = SF
    _, emb, qmat, _ = _load_query_vectors(sf)
    planes = srp_planes(emb.shape[1])
    root = build_srp_partitions(sf, planes)
    all_parts = [d for d in os.listdir(root) if d.startswith("bucket=")]
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    paths = probed_paths(root, srp_probe_set(bucket_of(qn, planes)))
    probed_dirs = {os.path.basename(os.path.dirname(p)) for p in paths}
    assert 0 < len(probed_dirs) < len(all_parts)

    out = QUERIES["ann_topk_lsh"](sf).to_pandas()
    assert len(out) == out.query_id.nunique() * 10
    out_ivf = QUERIES["ann_topk_ivf"](sf).to_pandas()
    assert len(out_ivf) == out_ivf.query_id.nunique() * 10


def test_geojson_promote_and_explode(ray_session, tmp_path):
    """M10: way-mapped buildings (closed LineStrings) promote to
    Polygons; Multi* geometries explode; short lines drop
    (`osm-etl/consolidate_buildings.py:11-28` semantics)."""
    import json

    from prclz_ray.geom.wkb import parse_wkb
    from prclz_ray.sources.geojson import read_geojson_features

    feats = [
        {"type": "Feature", "properties": {"name": "way-closed"},
         "geometry": {"type": "LineString",
                      "coordinates": [[0, 0], [1, 0], [1, 1], [0, 0]]}},
        {"type": "Feature", "properties": {"name": "way-open"},
         "geometry": {"type": "LineString", "coordinates": [[0, 0], [2, 0], [2, 2]]}},
        {"type": "Feature", "properties": {"name": "too-short"},
         "geometry": {"type": "LineString", "coordinates": [[0, 0], [1, 1]]}},
        {"type": "Feature", "properties": {"name": "multi"},
         "geometry": {"type": "MultiPolygon",
                      "coordinates": [[[[0, 0], [1, 0], [1, 1]]],
                                      [[[5, 5], [6, 5], [6, 6]]]]}},
    ]
    p = tmp_path / "feats.ndjson"
    p.write_text("\n".join(json.dumps(f) for f in feats))
    df = read_geojson_features(str(p), promote_lines=True, explode=True).to_pandas()
    # closed way + open way promoted, short dropped, multi exploded -> 4 rows
    assert df.geom_type.tolist() == ["Polygon"] * 4
    assert sorted(df.name) == ["multi", "multi", "way-closed", "way-open"]
    ring = parse_wkb(df[df.name == "way-closed"].geom_wkb.iloc[0])[1][0]
    assert len(ring) >= 3


def test_gadm_level_column():
    """M14: deepest available GID_{level} column (`prclz/utils.py:17-24`)."""
    from prclz_ray.functions import gadm_level_column

    assert gadm_level_column(["GID_0", "GID_1", "GID_2"], 5) == ("GID_2", 2)
    assert gadm_level_column(["GID_0", "GID_1", "GID_2"], 1) == ("GID_1", 1)
    assert gadm_level_column(["name"], 3) == ("GID_0", 0)


def test_resume_rejects_different_input(ray_session, tmp_path):
    """Manifest rows carry the input fingerprint: resuming the same
    out_dir against a DIFFERENT input must recompute everything (never
    silently mix two corpora in one output)."""
    from prclz_ray.pipelines.flagship import run_flagship
    from prclz_ray.state.manifest import Manifest

    out = str(tmp_path / "mixed")
    r1 = run_flagship(SF, out, resume=False)
    assert r1["rows"] == 500
    # same out_dir, different input (sf0.01 documents)
    other = "/root/testdata/sf0.01"
    m = Manifest(out)
    assert m.completed(fingerprint=SF)  # old rows match old input
    assert not m.completed(fingerprint=other)  # and are invisible to the new one
    r2 = run_flagship(other, out, resume=True)
    assert r2["skipped"] == 0  # nothing skipped: all partitions recomputed
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert t.num_rows == r2["rows"]


def test_run_reblock_three_sinks(ray_session, tmp_path):
    """S6: the reference's three-output writer — summary, steiner
    lines (new/existing per block), terminal points."""
    import pyarrow.parquet as pq

    from prclz_ray.pipelines.reblock import run_reblock

    out = str(tmp_path / "reblock_out")
    stats = run_reblock(out, limit_blocks=4)
    assert stats == {"blocks": 4, "sinks": 3}
    summary = pq.read_table(f"{out}/summary")
    lines = pq.read_table(f"{out}/steiner_lines")
    terms = pq.read_table(f"{out}/terminal_points")
    assert summary.num_rows == 4
    assert lines.num_rows == 8  # new + existing per ok block
    assert sorted(set(lines.column("line_type").to_pylist())) == [
        "existing_steiner", "new_steiner",
    ]
    assert terms.num_rows == 4
    # geometry parses back as multilinestrings / multipoints
    from prclz_ray.geom.wkb import parse_wkb

    for wkb in lines.column("geometry").to_pylist():
        if wkb is not None:
            parse_wkb(wkb)
    for wkb in terms.column("geometry").to_pylist():
        parse_wkb(wkb)


def test_parcelize_ladder_partition_and_fallback(ray_session):
    """G19 full: ladder parcels tile their block exactly; a degenerate
    input falls through the ladder to block-geometry inheritance."""
    import numpy as np

    from prclz_ray.geom.core import polygon_area
    from prclz_ray.geom.wkb import parse_wkb
    from prclz_ray.pipelines.derive import parcelize_ladder_block, _parcelize_footprints

    for bx, by in [(0, 0), (3, 7)]:
        t = parcelize_ladder_block(bx, by)
        from prclz_ray import world

        assert t.num_rows >= world.n_buildings_for_block(bx, by)
        total = sum(
            polygon_area(parse_wkb(w)[1][0]) for w in t.column("geom_wkb").to_pylist()
        )
        block_area = (0.1 - 2 * 0.002) ** 2
        assert abs(total - block_area) < 1e-9
        assert (np.asarray(t.column("ptdist_e6").to_pylist()) > 0).all()

    # forced failure: a building whose footprint sites all fall outside
    # the block -> no territory -> ValueError (the ladder's retry hook)
    block = np.array([[0.0, 0.0], [0.01, 0.0], [0.01, 0.01], [0.0, 0.01]])
    cents = np.array([[0.005, 0.005], [5.0, 5.0]])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _parcelize_footprints(block, cents, 0.004)


def test_parcels_ladder_query(ray_session):
    from prclz_ray.queries import QUERIES

    df = QUERIES["parcels_ladder"](SF).to_pandas()
    assert df.block_id.nunique() == 60
    assert (df.ptdist_e6 > 0).all()  # no block needed the last rung


def test_resume_after_other_input_recomputes_everything(ray_session, tmp_path):
    """Orphaned manifest rows must not survive a cross-input run: A ->
    B -> A(resume) yields the complete A output (the stale-row bug
    would silently skip partitions whose data was deleted by B)."""
    import pyarrow.parquet as pq

    from prclz_ray.pipelines.flagship import run_flagship

    out = str(tmp_path / "aba")
    r_a = run_flagship(SF, out, resume=False)
    run_flagship("/root/testdata/sf0.01", out, resume=True)
    r_a2 = run_flagship(SF, out, resume=True)
    assert r_a2["rows"] == r_a["rows"] == 500
    assert pq.read_table(out).num_rows == 500


def test_feature_type_from_lines_and_auto_barriers():
    """M11 full: edges classify by the nearest typed line (threshold ->
    gadm_boundary; mixed endpoints -> highway wins else natural), and
    a waterway line turns the matching parcel edge into a barrier the
    Steiner tree routes around."""
    import numpy as np

    from prclz_ray.graph.planar import PlanarGraph
    from prclz_ray.graph.steiner import steiner_tree_approx
    from prclz_ray.pipelines.reblock import (
        BARRIER_WEIGHT,
        barriers_from_lines,
        feature_type_from_lines,
        update_edge_types,
    )

    lines_xy = np.array(
        [[0.0, 0.5, 2.0, 0.5],   # waterway along y=0.5
         [0.0, 0.0, 2.0, 0.0]],  # highway along y=0
        dtype=np.float64,
    )
    ftypes = ["waterway", "highway"]
    # endpoint classification
    assert feature_type_from_lines(lines_xy, ftypes, (1.0, 0.5), (1.5, 0.5)) == "waterway"
    assert feature_type_from_lines(lines_xy, ftypes, (1.0, 0.0), (1.5, 0.0)) == "highway"
    # far from everything -> gadm_boundary
    assert feature_type_from_lines(lines_xy, ftypes, (9.0, 9.0), (9.5, 9.0)) == "gadm_boundary"
    # mixed highway/waterway -> highway
    assert feature_type_from_lines(lines_xy, ftypes, (1.0, 0.0), (1.0, 0.5)) == "highway"

    # auto barriers: a lattice whose middle rail lies ON the waterway
    # (classification is by edge ENDPOINTS, the reference rule)
    g = PlanarGraph()
    for i in range(2):
        for y in (0.0, 0.5, 1.0):
            g.add_edge((float(i), y), (float(i + 1), y))
    for i in range(3):
        g.add_edge((float(i), 0.0), (float(i), 0.5))
        g.add_edge((float(i), 0.5), (float(i), 1.0))
    barriers = barriers_from_lines(g, lines_xy, ftypes)
    key = ((0.0, 0.5), (1.0, 0.5))
    assert barriers.get(key) == "waterway"
    update_edge_types(g, [(0, 0), (2, 0), (2, 1), (0, 1), (0, 0)], barriers=barriers)
    assert g.edge_flags[key]["weight"] == BARRIER_WEIGHT


def test_reblock_dataset_with_typed_lines(ray_session):
    """End-to-end M11 plumbing: a waterway lines table flows through
    reblock_dataset without breaking the per-block contract."""
    import pyarrow as pa2

    from prclz_ray.pipelines.reblock import reblock_dataset

    base = reblock_dataset(limit_blocks=2).to_pandas().sort_values("block_id")
    # waterway along B00_00's internal vertical parcel edge (x=0.05)
    lines = pa2.table(
        {
            "x0": pa2.array([0.05], pa2.float64()),
            "y0": pa2.array([0.0], pa2.float64()),
            "x1": pa2.array([0.05], pa2.float64()),
            "y1": pa2.array([0.1], pa2.float64()),
            "ftype": pa2.array(["waterway"], pa2.string()),
        }
    )
    wet = reblock_dataset(limit_blocks=2, lines_table=lines).to_pandas().sort_values("block_id")
    # plumbing: typed lines flow through pack->run without changing the
    # contract (terminal counts, status); routing-change behavior is
    # covered by test_feature_type_from_lines_and_auto_barriers on a
    # graph whose tree is forced across the barrier
    assert wet.n_terminals.tolist() == base.n_terminals.tolist()
    assert (wet.status == "ok").all()
    assert (wet.new_len_e6 >= base.new_len_e6 - 1).all()  # barriers never shorten


def test_warc_roundtrip_framing(ray_session, tmp_path):
    """WARC source: Content-Length framing survives payloads that
    CONTAIN the record magic; round-trip is byte-identical."""
    from prclz_ray.sources.warc import parse_warc_bytes, read_warc, write_synth_warc

    payloads = [b"hello world", b"tricky WARC/1.0\r\n\r\n payload", b"", b"\r\n\r\n"]
    urls = [f"https://x/{i}" for i in range(4)]
    tss = ["2024-01-01T00:00:00Z"] * 4
    p = tmp_path / "t.warc"
    write_synth_warc(str(p), urls, tss, payloads)
    t = parse_warc_bytes(p.read_bytes())
    assert t.column("url").to_pylist() == urls
    assert t.column("html").to_pylist() == payloads
    df = read_warc([str(p)]).to_pandas()
    assert sorted(df.url) == sorted(urls)


def test_redact_pii_overlapping_counts_match_oracle():
    """Counts run on the ORIGINAL text (oracle semantics): a phone
    digit-run inside an email address counts under both patterns even
    though the replacement consumes it."""
    import duckdb
    import pyarrow as pa2

    from prclz_ray.queries import _sql_redact_pii
    from prclz_ray.stages.textops import redact_pii

    texts = ["call 123-456-7890@mail.com now", "a@b.co", "123-456-7890", "clean"]
    t = pa2.table({"doc_id": pa2.array(range(4), pa2.int64()), "text": pa2.array(texts)})
    got = redact_pii(t).to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute(_sql_redact_pii()).df().sort_values("doc_id")
    assert got.n_redactions.tolist() == want.n_redactions.tolist() == [2, 1, 1, 0]
    assert got.clean_text.tolist() == want.clean_text.tolist()


def test_stop_shingle_df_cap_bounds_cooccur_output():
    """A shingle shared by 10^5 docs must NOT emit C(k,2) pair rows:
    above MAX_SHINGLE_DF the run is dropped (stop-shingle prefix-filter
    rule), so output stays O(b) while honest shingles still pair."""
    import numpy as np
    import pyarrow as pa

    from prclz_ray.stages.dedup import MAX_SHINGLE_DF, shingle_cooccur_pairs

    k = 100_000
    assert k > MAX_SHINGLE_DF
    # one stop-shingle shared by k docs + one honest shingle shared by 2
    group = pa.table(
        {
            "doc_id": pa.array(
                np.concatenate([np.arange(k), [7, 11]]), pa.int64()
            ),
            "shingle": pa.array(["the of and"] * k + ["rare gem phrase"] * 2),
            "L": pa.array(np.full(k + 2, 5), pa.int64()),
            "sb": pa.array(np.zeros(k + 2), pa.int64()),
        }
    )
    out = shingle_cooccur_pairs(group)
    # the stop-shingle contributes nothing; the honest pair survives
    assert out.num_rows == 1
    assert out.column("doc_a").to_pylist() == [7]
    assert out.column("doc_b").to_pylist() == [11]
    # and with the cap lifted the same input is quadratic — the guard
    # is what bounds it
    out_nocap = shingle_cooccur_pairs(group.slice(0, 50), max_df=10**9)
    assert out_nocap.num_rows == 50 * 49 // 2


def test_shingle_arrays_null_text_is_explicit_empty():
    """Null text is filled to '' explicitly (no NaN→int64 cast, no
    RuntimeWarning) and shingles like the empty string."""
    import warnings

    import pyarrow as pa

    from prclz_ray.stages.dedup import _shingle_arrays

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["alpha beta gamma delta", None])})
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning → failure
        doc_idx, sh = _shingle_arrays(t)
    by_doc = {}
    for d, s in zip(doc_idx.tolist(), sh.to_pylist()):
        by_doc.setdefault(d, []).append(s)
    assert by_doc[0] == ["alpha beta gamma", "beta gamma delta"]
    assert by_doc[1] == [""]


def test_embedding_matrix_matches_pylist_decode():
    import numpy as np
    import pyarrow as pa

    from prclz_ray.stages.similarity import embedding_matrix

    rows = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]
    col = pa.chunked_array([pa.array(rows[:1], pa.list_(pa.float32())),
                            pa.array(rows[1:], pa.list_(pa.float32()))])
    m = embedding_matrix(col)
    assert m.dtype == np.float64 and m.shape == (2, 3)
    assert np.array_equal(m, np.asarray(rows))
    # sliced column (non-zero offset) decodes correctly too
    whole = pa.array(rows + [[7.0, 8.0, 9.0]], pa.list_(pa.float32()))
    assert np.array_equal(embedding_matrix(whole.slice(1, 2)),
                          np.asarray(rows[1:] + [[7.0, 8.0, 9.0]]))


def test_pip_hole_and_multipart_semantics(ray_session):
    """Even-odd over ALL rings: point in a block's hole does not match;
    point in a detached MultiPolygon part does; hole-x-only does."""
    import numpy as np

    from prclz_ray.queries import _donut_blocks_table
    from prclz_ray.stages.spatial import PIPJoinActor, put_blocks_side

    j = PIPJoinActor(put_blocks_side(_donut_blocks_table()))
    lon = np.array([0.010, 0.040, 0.090, 0.0999, 0.040, 0.140])
    lat = np.array([0.010, 0.040, 0.090, 0.0999, 0.010, 0.110])
    got = j._match(lon, lat)
    ids = [j.ids[g] if g >= 0 else None for g in got]
    assert ids == ["D0_0", None, "D0_0", None, "D0_0", "D1_1"]


def test_knn_topk_matches_bruteforce(ray_session):
    """topk (3x3 fast path + ring-expansion fallback) == brute force
    with (d2, parcel_id) order, on a sparse anchor field where many
    points need ring expansion; table row order is shuffled to prove
    the canonical id sort, not insertion order, breaks ties."""
    import numpy as np
    import pyarrow as pa

    from prclz_ray.stages.spatial import KNNAnchorActor, put_anchors_side

    rng = np.random.default_rng(7)
    n_anchor, n_pt, k = 40, 200, 3
    ax = rng.integers(0, 3_000_000, n_anchor)
    ay = rng.integers(0, 3_000_000, n_anchor)
    ids = [f"A{i:03d}" for i in range(n_anchor)]
    perm = rng.permutation(n_anchor)  # shuffled insertion order
    t = pa.table(
        {
            "parcel_id": pa.array([ids[i] for i in perm]),
            "anchor_lon_e6": pa.array(ax[perm], pa.int64()),
            "anchor_lat_e6": pa.array(ay[perm], pa.int64()),
        }
    )
    a = KNNAnchorActor(put_anchors_side(t), k=k)
    px = rng.integers(0, 3_000_000, n_pt)
    py = rng.integers(0, 3_000_000, n_pt)
    idx, d2 = a.topk(px, py, k)
    # brute force in canonical (id-sorted == index) order
    D = (px[:, None] - ax[None, :]) ** 2 + (py[:, None] - ay[None, :]) ** 2
    for i in range(n_pt):
        order = np.lexsort((np.arange(n_anchor), D[i]))[:k]
        assert idx[i].tolist() == order.tolist(), i
        assert d2[i].tolist() == D[i][order].tolist(), i


def test_extract_dead_letter_path(ray_session, tmp_path):
    """A malformed page (no <article>) leaves the stream as one
    dead-letter row with a reason; the N-1 clean rows pass through
    without the marker column. A retried write is idempotent."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from prclz_ray.stages.pages import extract_text, make_dead_letter_fn

    n = 8
    htmls = [
        f"<html><head><title>doc {i}</title></head>"
        f"<body><article>body {i}</article></body></html>"
        for i in range(n)
    ]
    htmls[3] = "<html><head></head><body><p>truncated crawl"  # broken
    pages = pa.table(
        {
            "url": pa.array([f"https://s/{i}" for i in range(n)]),
            "html": pa.array([h.encode() for h in htmls], pa.large_binary()),
        }
    )
    err_dir = str(tmp_path / "errs")
    ds = ray.data.from_arrow(pages)
    ds = ds.map_batches(extract_text, batch_format="pyarrow")
    ds = ds.map_batches(make_dead_letter_fn(err_dir), batch_format="pyarrow")
    out = ds.to_pandas()
    assert len(out) == n - 1
    assert "extract_error" not in out.columns
    assert sorted(out["text"]) == sorted(f"body {i}" for i in range(n) if i != 3)
    files = glob.glob(f"{err_dir}/errors-*.parquet")
    assert len(files) == 1
    errs = pq.read_table(files[0])
    assert errs.column("url").to_pylist() == ["https://s/3"]
    assert errs.column("extract_error").to_pylist() == ["no <article> element in html"]
    # retry idempotence: re-running the same batch rewrites the SAME file
    make_dead_letter_fn(err_dir)(extract_text(pages))
    assert glob.glob(f"{err_dir}/errors-*.parquet") == files


def test_periphery_filter_geometric_cases():
    """M8 exact rule on a NON-axis-aligned boundary: straddling blocks,
    blocks swallowing a boundary corner, and blocks pierced edge-through
    (both endpoints outside) are dropped; strictly-inside and
    fully-outside blocks survive."""
    import numpy as np
    import pyarrow as pa

    from prclz_ray.geom.wkb import wkb_polygon
    from prclz_ray.pipelines.derive import periphery_filter

    # diamond boundary centered at (0,0), radius 1
    diamond = np.array([[1, 0], [0, 1], [-1, 0], [0, -1], [1, 0]], float)

    def blk(cx, cy, hw, hh):
        return wkb_polygon(
            np.array([[cx - hw, cy - hh], [cx + hw, cy - hh],
                      [cx + hw, cy + hh], [cx - hw, cy + hh]])
        )

    blocks = pa.table(
        {
            "block_id": pa.array(["inside", "outside", "straddle", "corner", "pierce"]),
            "geom_wkb": pa.array(
                [
                    blk(0.0, 0.0, 0.2, 0.2),    # strictly inside
                    blk(3.0, 3.0, 0.2, 0.2),    # fully outside
                    blk(0.9, 0.0, 0.3, 0.05),   # straddles the +x edge pair
                    blk(1.0, 0.0, 0.3, 0.3),    # contains corner (1,0)
                    blk(0.0, 0.0, 2.0, 0.01),   # thin slab through the whole
                                                # diamond: every vertex outside,
                                                # edges pierce two boundary edges
                ],
                pa.binary(),
            ),
        }
    )
    kept = periphery_filter(blocks, diamond)
    assert kept.column("block_id").to_pylist() == ["inside", "outside"]


def test_asof_and_range_join_edges():
    """Tie and boundary semantics: an equal-ts click matches its
    purchase (ts >= includes equality); a purchase with no prior click
    drops from asof but keeps count 0 in the range join; the range
    window is [ts-1h, ts) — left-closed, right-open."""
    import numpy as np
    import pyarrow as pa

    from prclz_ray.stages.events import asof_join_group, range_join_group

    H = 3_600_000_000
    t0 = 1_700_000_000_000_000
    rows = [
        # user 1: click@t0, purchase@t0 (equal ts -> matches, gap 0)
        (10, t0, 1, "click"),
        (11, t0, 1, "purchase"),
        # user 2: purchase with NO prior click (click comes later)
        (20, t0, 2, "purchase"),
        (21, t0 + 1, 2, "click"),
        # user 3: clicks at exactly ts-1h (in) and ts (out of range,
        # but the asof match), plus one mid-window
        (30, t0, 3, "click"),
        (31, t0 + H // 2, 3, "click"),
        (32, t0 + H, 3, "click"),
        (33, t0 + H, 3, "purchase"),
    ]
    g = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    asof = asof_join_group(g)
    got = {
        r["event_id"]: (r["right_ts_us"], r["gap_us"]) for r in asof.to_pylist()
    }
    assert got == {11: (t0, 0), 33: (t0 + H, 0)}  # user-2 purchase dropped
    rng = range_join_group(g)
    counts = {r["event_id"]: r["n_right"] for r in rng.to_pylist()}
    # user 1: click@ts not < ts -> 0; user 2: no prior -> 0;
    # user 3: t0 (== ts-1h, in) + t0+H/2 (in) + t0+H (== ts, out) -> 2
    assert counts == {11: 0, 20: 0, 33: 2}


def test_delta_new_rows_drops_snapshot_matches():
    import numpy as np
    import pyarrow as pa

    from prclz_ray.stages.dedup import delta_hash_rows, delta_new_rows

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 5, 7], pa.int64()),
            # doc 1 duplicates snapshot doc 0; doc 2 duplicates doc 7 (both new)
            "text": pa.array(["same A", "same A", "same B", "uniq old", "same B"]),
        }
    )
    rows = delta_hash_rows(batch, 5)
    assert rows.column("old").to_pylist() == [1, 0, 0, 1, 0]
    out = delta_new_rows(rows)
    # doc 1 dropped (matches old 0); docs 2 and 7 kept (dup only among new)
    assert sorted(out.column("doc_id").to_pylist()) == [2, 7]


def test_ann_pq_recall_vs_bruteforce(ray_session):
    """PQ-ADC top-10 must recover most of the exact top-10 (the 6-bit
    16-subspace code is lossy but the fixture's label clusters are far
    apart)."""
    from prclz_ray.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = QUERIES["ann_topk"](sf).to_pandas()
    pq = QUERIES["ann_topk_pq"](sf).to_pandas()
    assert len(pq) == pq.query_id.nunique() * 10
    hits = tot = 0
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp.vec_id)
        got = set(pq[pq.query_id == qid].vec_id)
        hits += len(truth & got)
        tot += len(truth)
    recall = hits / tot
    assert recall >= 0.55, f"PQ recall collapsed: {recall:.2f}"


def test_dedup_embedding_ann_recall_vs_exact(ray_session):
    """The registered IVF near-dup path must recover ≥ 0.85 of the
    exact chunk-pair join's pairs at the p=3 operating point (measured
    .94 on the fixture), with NO false pairs (every emitted pair really
    clears the threshold — the within-list matmul is exact) and no
    duplicates from the multi-probe replication."""
    from prclz_ray.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = QUERIES["dedup_embedding"](sf).to_pandas()
    ann = QUERIES["dedup_embedding_ann"](sf).to_pandas()
    ep = set(zip(exact.vec_a, exact.vec_b))
    ap = list(zip(ann.vec_a, ann.vec_b))
    assert len(ap) == len(set(ap)), "multi-probe duplicates leaked"
    recall = len(ep & set(ap)) / len(ep)
    assert recall >= 0.85, f"IVF dedup recall collapsed: {recall:.2f}"
    assert set(ap) <= ep, "false pair: within-list matmul must be exact"


def test_canonicalize_urls_rules():
    import pyarrow as pa

    from prclz_ray.stages.textops import canonicalize_urls

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "url": pa.array(
                [
                    "HTTPS://WWW.Ex.COM/Path/X?utm_source=a&id=3#frag",
                    "http://ex.com/p?id=3&utm_medium=y",
                    "https://www.ex.com/p?utm_only=1",
                    "HTTP://HOST.ORG/CaseKeptPath",
                ]
            ),
        }
    )
    out = canonicalize_urls(batch)
    assert out.column("canon_url").to_pylist() == [
        "https://ex.com/Path/X?id=3",
        "http://ex.com/p?id=3",
        "https://ex.com/p",
        "http://host.org/CaseKeptPath",
    ]
    # review regressions: utm_ in path/param names untouched; bare
    # hosts and consecutive trackers survive
    hard = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "url": pa.array(
                [
                    "https://ex.com/utm_guide/page?id=1",
                    "https://ex.com/p?a=1&butm_x=2",
                    "https://EX.com#frag",
                    "https://ex.com/p?utm_a=1&utm_b=2&utm_c=3&id=9",
                ]
            ),
        }
    )
    got = canonicalize_urls(hard).column("canon_url").to_pylist()
    assert got == [
        "https://ex.com/utm_guide/page?id=1",
        "https://ex.com/p?a=1&butm_x=2",
        "https://ex.com/",
        "https://ex.com/p?id=9",
    ]


def test_extract_links_edge_cases():
    import pyarrow as pa

    from prclz_ray.stages.pages import extract_links

    html = [
        '<a href="u1">x</a> mid <a href="u2">y</a>',  # two links
        "no links at all",                             # zero links
        'href="lead"</a> tail',                        # link at position 0
        'dangling href=" unterminated',                # no closing quote:
        # the fragment after the marker has no '"' — the whole tail is
        # the href (split max_splits=1 keeps it as element 0)
    ]
    t = pa.table(
        {"doc_id": pa.array([10, 11, 12, 13], pa.int64()), "html": pa.array(html)}
    )
    out = extract_links(t)
    rows = sorted(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("link_idx").to_pylist(),
            out.column("href").to_pylist(),
        )
    )
    assert rows == [
        (10, 0, "u1"),
        (10, 1, "u2"),
        (12, 0, "lead"),
        (13, 0, " unterminated"),
    ]


def test_extract_links_passthrough_cols():
    import pyarrow as pa

    from prclz_ray.stages.pages import extract_links

    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "source": pa.array(["hostA"]),
            "html": pa.array(['<a href="u">x</a>']),
        }
    )
    out = extract_links(t, keep_cols=("doc_id", "source"))
    assert out.column_names == ["doc_id", "source", "link_idx", "href"]
    assert out.column("source").to_pylist() == ["hostA"]


def test_extract_links_anchor_contract():
    import pyarrow as pa

    from prclz_ray.stages.pages import extract_links

    html = [
        '<a href="u1" class="c">plain</a>',   # attrs between quote and >
        '<a href="u2">nested <b>bold</b></a>',  # anchor stops at first <
        '<a href="u3" no-close-gt',            # malformed: no > -> ''
    ]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "html": pa.array(html)})
    out = extract_links(t, with_anchors=True)
    assert out.column("href").to_pylist() == ["u1", "u2", "u3"]
    assert out.column("anchor").to_pylist() == ["plain", "nested ", ""]


def test_gram_partials_split_invariant():
    import numpy as np
    import pyarrow as pa

    from prclz_ray.stages.similarity import embedding_matrix, gram_partials, round_e6

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 64)).astype(np.float64)
    t = pa.table({"embedding": pa.array([list(v) for v in vecs])})
    whole = gram_partials(t)
    # summing partials over any batch split must equal the one-shot
    acc = {}
    for lo, hi in [(0, 13), (13, 37), (37, 50)]:
        p = gram_partials(t.slice(lo, hi - lo))
        for k, s in zip(p.column("k").to_pylist(), p.column("s").to_pylist()):
            acc[k] = acc.get(k, 0) + s
    ref = dict(zip(whole.column("k").to_pylist(), whole.column("s").to_pylist()))
    assert acc == ref
    # and the one-shot equals the direct integer matmul
    vi = round_e6(embedding_matrix(t.column("embedding")))
    g = vi.T @ vi
    iu, ju = np.triu_indices(64)
    assert ref == dict(zip((iu * 64 + ju).tolist(), g[iu, ju].tolist()))


def test_embedding_pca_contract(ray_session):
    import numpy as np

    from prclz_ray.queries import PCA_P, q_embedding_pca

    out = q_embedding_pca("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500 * PCA_P
    piv = out.pivot(index="vec_id", columns="comp", values="val_e6").to_numpy()
    piv = piv.astype(np.float64) / 1e6
    # energy (mean squared projection) must be non-increasing across
    # components — the eigenvalue ordering surfaced in the data
    energy = (piv**2).mean(axis=0)
    assert all(energy[k] >= energy[k + 1] - 1e-9 for k in range(PCA_P - 1))
    # top component carries more energy than a random direction would
    assert energy[0] * PCA_P > energy.sum()


def test_extract_links_null_html_rows():
    # review regression: a null html row must yield zero links without
    # poisoning the fragment starts of the rows after it
    import pyarrow as pa

    from prclz_ray.stages.pages import extract_links

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "html": pa.array([None, '<a href="u">x</a>', '<a href="v">y</a>']),
        }
    )
    out = extract_links(t)
    assert out.column("doc_id").to_pylist() == [1, 2]
    assert out.column("href").to_pylist() == ["u", "v"]


def test_jsonl_parse_lines_bisect_isolation():
    from prclz_ray.sources.jsonl import parse_lines

    lines = [
        b'{"a": 1}',
        b"!!garbage",
        b'{"a": 2}',
        b'{"a": 3, "unterminated',
        b'{"a": 4}',
    ]
    t, bad = parse_lines(lines)
    assert sorted(bad) == [1, 3]
    assert sorted(t.column("a").to_pylist()) == [1, 2, 4]
    # all-bad and all-good edges
    t2, bad2 = parse_lines([b"nope", b"also nope"])
    assert t2 is None and sorted(bad2) == [0, 1]
    t3, bad3 = parse_lines([b'{"x": 9}'])
    assert bad3 == [] and t3.column("x").to_pylist() == [9]


def test_jsonl_parse_fn_dead_letter(tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from prclz_ray.sources.jsonl import make_jsonl_parse_fn

    errors_dir = str(tmp_path / "dlq")
    schema = pa.schema([("a", pa.int64())])
    fn = make_jsonl_parse_fn(errors_dir=errors_dir, columns=["a"], schema=schema)
    batch = pa.table({"text": pa.array(['{"a": 1}', "broken", '{"a": 2}'])})
    out = fn(batch)
    assert out.column("a").to_pylist() == [1, 2]
    files = [f for f in os.listdir(errors_dir) if f.endswith(".parquet")]
    assert len(files) == 1
    side = pq.read_table(os.path.join(errors_dir, files[0]))
    assert side.column("line").to_pylist() == ["broken"]
    # retry idempotence: same batch -> same file name, still one file
    fn(batch)
    assert len([f for f in os.listdir(errors_dir) if f.endswith(".parquet")]) == 1
    # all-bad batch yields the TYPED empty table
    empty = fn(pa.table({"text": pa.array(["x", "y"])}))
    assert empty.schema == schema and empty.num_rows == 0


def test_jsonl_required_keys_contract(tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from prclz_ray.sources.jsonl import make_jsonl_parse_fn

    errors_dir = str(tmp_path / "dlq2")
    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    fn = make_jsonl_parse_fn(
        errors_dir=errors_dir, columns=["a", "b"], schema=schema,
        required=["a", "b"],
    )
    batch = pa.table(
        {
            "text": pa.array(
                [
                    '{"a": 1, "b": "x"}',
                    '{"a": 2}',             # missing key b -> DLQ
                    "not json",             # invalid -> DLQ
                    '{"a": null, "b": "y"}',  # null required -> DLQ
                    '{"a": 3, "b": "z"}',
                ]
            )
        }
    )
    out = fn(batch)
    assert out.column("a").to_pylist() == [1, 3]
    files = [f for f in os.listdir(errors_dir) if f.endswith(".parquet")]
    side = pq.read_table(os.path.join(errors_dir, files[0]))
    reasons = sorted(side.column("reason").to_pylist())
    assert reasons == [
        "invalid json", "missing required key", "missing required key"
    ]


def test_extract_links_anchor_markup_mode():
    import pyarrow as pa

    from prclz_ray.stages.pages import extract_links

    html = ['<a href="u">x<b>bold</b> tail</a> <a href="v">plain</a>']
    t = pa.table({"doc_id": pa.array([0], pa.int64()), "html": pa.array(html)})
    rich = extract_links(t, with_anchors=True, anchor_markup=True)
    assert rich.column("anchor").to_pylist() == ["xbold tail", "plain"]
    plain = extract_links(t, with_anchors=True)
    assert plain.column("anchor").to_pylist() == ["x", "plain"]


def test_events_late_scan_seeding():
    # the in-bucket finish must seed from PRIOR buckets' max: an event
    # in a later arrival bucket whose ts is older than an earlier
    # bucket's max must be flagged even if its own bucket is ordered
    import numpy as np
    import pyarrow as pa

    from prclz_ray.stages.events import make_late_finish

    prior = np.full(256, np.iinfo(np.int64).min, dtype=np.int64)
    prior[3] = 10_000_000_000  # buckets <3 already saw ts=10000s
    grp = pa.table(
        {
            "event_id": pa.array([7, 8], pa.int64()),
            "ts": pa.array([1_000_000_000, 9_000_000_000], pa.timestamp("us")),
            "ak": pa.array([100, 200], pa.int64()),
            "lb": pa.array([3, 3], pa.int64()),
        }
    )
    out = make_late_finish(prior, watermark_us=300_000_000)(grp)
    # both events are behind the seeded watermark by > 5 min
    assert out.column("event_id").to_pylist() == [7, 8]
    assert out.column("wm_us").to_pylist() == [10_000_000_000, 10_000_000_000]


def test_ann_query_stream_reuses_layout_across_batches(ray_session):
    """VERDICT r4 next.6: two query batches through ONE AnnQueryStream —
    the second batch triggers NO partition build (counter), a second
    stream over the same corpus is a cache HIT, and the two-batch
    union (exact mode) is identical to the fresh one-shot ann_topk."""
    import pandas as pd

    from prclz_ray.queries import (
        AnnQueryStream,
        _load_query_vectors,
        q_ann_topk,
    )
    from prclz_ray.stages.similarity import PARTITION_CACHE

    sf = "/root/testdata/sf0.001"
    _, _, qmat, qids = _load_query_vectors(sf)
    stream = AnnQueryStream(sf, k=10)
    after_init = dict(PARTITION_CACHE)

    half = len(qids) // 2
    t1 = stream.query(qmat[:half], qids[:half], exact=True).to_pandas()
    t2 = stream.query(qmat[half:], qids[half:], exact=True).to_pandas()
    # serving batches builds nothing — the __init__ layout is reused
    assert dict(PARTITION_CACHE) == after_init
    assert stream.batches_served == 2

    # a SECOND stream over the same corpus reuses the on-disk layout
    AnnQueryStream(sf, k=10)
    assert PARTITION_CACHE["builds"] == after_init["builds"]
    assert PARTITION_CACHE["hits"] == after_init["hits"] + 1

    # identical top-k to the fresh one-shot build
    got = (
        pd.concat([t1, t2])
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        q_ann_topk(sf)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)

    # the pruned serving mode returns k rows per query from the SAME
    # layout (approximate values — shape contract only)
    pruned = stream.query(qmat[:3], qids[:3]).to_pandas()
    assert len(pruned) == 30 and set(pruned["query_id"]) == set(qids[:3])
    assert dict(PARTITION_CACHE) == {
        "builds": after_init["builds"],
        "hits": after_init["hits"] + 1,
    }


def test_jsonl_type_conflict_and_blank_lines(tmp_path):
    """Round-5 review fixes: (a) two VALID lines whose types conflict
    survive (conflicting column stringified), not an uncaught
    ArrowTypeError killing the task; (b) blank lines shift no DLQ
    attribution (read_json silently skips them); (c) a batch whose
    lines all lack a requested column null-pads instead of KeyError."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from prclz_ray.sources.jsonl import make_jsonl_parse_fn, parse_lines

    # (a) type conflict across valid lines — both rows survive
    t, bad = parse_lines([b'{"a": 1}', b'{"a": "x"}'])
    assert bad == [] and t.column("a").to_pylist() == ["1", "x"]
    # nested-vs-scalar conflict JSON-encodes the nested value
    t, bad = parse_lines([b'{"a": {"k": 1}}', b'{"a": 2}'])
    assert bad == [] and t.column("a").to_pylist() == ['{"k": 1}', "2"]

    # (b) blank line between a good and a violating line: the DLQ
    # must record the VIOLATING line's text, not the blank
    errors_dir = str(tmp_path / "dlq3")
    fn = make_jsonl_parse_fn(
        errors_dir=errors_dir, required=["b"], columns=["a", "b"]
    )
    out = fn(pa.table({"text": ['{"a":1,"b":1}', '', '  ', '{"a":2}']}))
    assert out.num_rows == 1
    files = [f for f in os.listdir(errors_dir) if f.endswith(".parquet")]
    side = pq.read_table(os.path.join(errors_dir, files[0]))
    assert side.column("line").to_pylist() == ['{"a":2}']

    # (c) requested column absent from every line in the batch
    fn = make_jsonl_parse_fn(columns=["a", "b"])
    out = fn(pa.table({"text": ['{"a":1}', '{"a":2}']}))
    assert out.column_names == ["a", "b"]
    assert out.column("b").to_pylist() == [None, None]


def test_csv_wkt_holes_and_multipolygon_roundtrip(ray_session, tmp_path):
    """Round-5 review fix: the CSV sink used to emit exterior-only WKT
    (holes dropped, MultiPolygon parts vstacked into one corrupt
    ring). Now holes and parts round-trip losslessly."""
    import numpy as np
    import pyarrow as pa

    from prclz_ray.geom.wkb import parse_wkb, wkb_multipolygon, wkb_polygon
    from prclz_ray.sources import read_blocks_csv_wkt, write_blocks_csv_wkt

    ext = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2]], float)
    p2 = np.array([[10, 10], [12, 10], [12, 12]], float)
    blocks = pa.table(
        {
            "block_id": pa.array(["with_hole", "multi"]),
            "geom_wkb": pa.array(
                [
                    wkb_polygon(ext, [hole]),
                    wkb_multipolygon([(ext, [hole]), (p2, [])]),
                ],
                pa.binary(),
            ),
        }
    )
    path = str(tmp_path / "blocks.csv")
    write_blocks_csv_wkt(blocks, path)
    back = (
        read_blocks_csv_wkt(path)
        .to_pandas()
        .sort_values("block_id")
        .reset_index(drop=True)
    )
    g, rings = parse_wkb(bytes(back.geom_wkb[1]))  # with_hole sorts second
    assert g == 3 and len(rings) == 2
    assert np.allclose(rings[1][:4], hole, atol=1e-6)
    g, parts = parse_wkb(bytes(back.geom_wkb[0]))
    assert g == 6 and len(parts) == 2 and len(parts[0]) == 2
    assert np.allclose(parts[1][0][:3], p2, atol=1e-6)


def test_warc_record_type_filter(tmp_path):
    """Round-5 review fix: real CC WARCs interleave warcinfo/request/
    metadata records — only response records become rows, every record
    stays Content-Length framed, and spec-legal 'Content-Length:N'
    (no space) headers parse."""
    from prclz_ray.sources.warc import parse_warc_bytes

    CRLF = b"\r\n"

    def rec(rtype, uri, body):
        h = b"WARC/1.0" + CRLF + f"WARC-Type: {rtype}".encode() + CRLF
        if uri:
            h += f"WARC-Target-URI: {uri}".encode() + CRLF
        h += b"WARC-Date: 2020-01-01T00:00:00Z" + CRLF
        h += f"Content-Length:{len(body)}".encode() + CRLF  # no-space form
        return h + CRLF + body + CRLF + CRLF

    data = (
        rec("warcinfo", "", b"software: test")
        + rec("request", "http://a/", b"GET / HTTP/1.1")
        + rec("response", "http://a/", b"<html>A WARC/1.0 inside</html>")
        + rec("request", "http://b/", b"GET / HTTP/1.1")
        + rec("response", "http://b/", b"<html>B</html>")
    )
    t = parse_warc_bytes(data)
    assert t.column("url").to_pylist() == ["http://a/", "http://b/"]
    assert bytes(t.column("html")[0].as_py()) == b"<html>A WARC/1.0 inside</html>"


def test_geojson_property_type_stability(ray_session, tmp_path):
    """Round-5 review fix: property TYPES are sampled once driver-side
    (bool/int64/float64 when homogeneous, else string with JSON-encoded
    values) so two batches of one file can never emit int64 vs string
    for the same key."""
    import json

    from prclz_ray.sources.geojson import read_geojson_features

    p = str(tmp_path / "f.ndjson")
    feats = [
        {"type": "Feature",
         "properties": {"id": 1, "name": "a", "score": 1},
         "geometry": {"type": "Point", "coordinates": [0, 0]}},
        {"type": "Feature",
         "properties": {"id": 2, "name": {"nested": True}, "score": 2.5},
         "geometry": {"type": "Point", "coordinates": [1, 1]}},
    ]
    with open(p, "w") as f:
        for x in feats:
            f.write(json.dumps(x) + "\n")
    df = read_geojson_features(p).to_pandas().sort_values("id")
    assert str(df.dtypes["id"]) == "int64"          # homogeneous int
    assert str(df.dtypes["score"]) == "float64"     # int+float promotes
    assert df.name.tolist() == ["a", '{"nested": true}']  # mixed → string


def test_topk_float64_embeddings_and_chunked_topp(ray_session):
    """Round-5 review fix: a list<double> embedding column is a
    READ-ONLY zero-copy view — the scorer must normalize out-of-place;
    and topk_centroids' chunked path returns the same top-p SET as the
    one-matmul path."""
    import numpy as np
    import pyarrow as pa

    from prclz_ray.stages.similarity import (
        make_topk_fn, put_queries, topk_centroids,
    )

    rng = np.random.default_rng(7)
    emb = rng.normal(size=(50, 8))  # float64 → list<double> column
    batch = pa.table(
        {
            "vec_id": pa.array(np.arange(50), pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float64())),
        }
    )
    qref = put_queries(emb[:3], np.arange(3))
    out = make_topk_fn(qref, k=5)(batch)  # raised ValueError before fix
    assert out.num_rows == 15
    # each query's own vector is its top hit
    top1 = out.to_pandas().sort_values(["query_id", "sim"], ascending=[True, False])
    assert top1.groupby("query_id").head(1).vec_id.tolist() == [0, 1, 2]

    x = rng.normal(size=(3000, 4))
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    c = rng.normal(size=(2000, 4))  # 3000×2000 > 1<<22 → chunked path
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    a = topk_centroids(x, c, 3)
    b = np.argsort(-(x @ c.T), axis=1)[:, :3]
    assert all(set(r1) == set(r2) for r1, r2 in zip(a, b))


# --- round-5 infra review regressions -----------------------------------------

def test_jsonl_schema_typed_null_pad():
    # a batch whose surviving lines all lack a schema'd int64 key must
    # pad with the SCHEMA type, not string (per-block type conflicts)
    import pyarrow as pa

    from prclz_ray.sources.jsonl import make_jsonl_parse_fn

    schema = pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())])
    fn = make_jsonl_parse_fn(columns=["doc_id", "n_chars"], schema=schema)
    out = fn(pa.table({"text": pa.array(['{"doc_id": 7}'])}))
    assert out.schema.field("n_chars").type == pa.int64()
    assert out.column("n_chars").null_count == 1


def test_registry_bare_decorator_raises():
    from prclz_ray.registry import Registry

    reg = Registry("thing")
    with pytest.raises(TypeError):
        @reg.register  # missing the name string must fail loudly
        def my_stage(ds):
            return ds


def test_csv_wkt_nanodegree_roundtrip(tmp_path):
    # write→read must be lossless on the engine's 1e-9° vertex grid
    import numpy as np

    from prclz_ray.sources.csv_wkt import parse_wkt_polygon, wkt_polygon

    ring = np.array(
        [[1.000000001, 2.000000002], [1.000000004, 2.000000001],
         [1.000000003, 2.000000005]]
    )
    back = parse_wkt_polygon(wkt_polygon(ring))
    assert np.array_equal(back, ring)


def test_clean_schema_nested_dir_and_empty_dir(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from prclz_ray.io import clean_schema

    nested = tmp_path / "hive" / "cell=1"
    nested.mkdir(parents=True)
    pq.write_table(pa.table({"a": [1]}), nested / "part0.parquet")
    assert clean_schema(str(tmp_path / "hive")).names == ["a"]
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        clean_schema(str(empty))


def test_warc_lenient_header_decode(tmp_path):
    from prclz_ray.sources.warc import parse_warc_bytes

    body = b"hello"
    hdr = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: https://caf\xe9.example/\r\n"  # raw latin-1 byte
           + f"Content-Length: {len(body)}\r\n".encode() + b"\r\n")
    rec = hdr + body + b"\r\n\r\n"
    out = parse_warc_bytes(rec)
    assert len(out["payload"]) == 1 if isinstance(out, dict) else True


def test_extract_props_k_rejects_divergent_forms():
    import pyarrow as pa

    from prclz_ray.stages.events import extract_props_k

    def tbl(props):
        return pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "event_type": pa.array(["x"]),
                "props": pa.array([props]),
            }
        )

    assert extract_props_k(tbl('{"k": 7}')).column("k").to_pylist() == [7]
    for bad in ['{"k": 2e5}', '{"k": "5"}', '[{"k": 1}]']:
        with pytest.raises(ValueError):
            extract_props_k(tbl(bad))


def test_late_bucket_rows_guards_unsafe_event_ids():
    import pyarrow as pa

    from prclz_ray.stages.events import late_bucket_rows

    ok = pa.table({"event_id": pa.array([0, 5], pa.int64())})
    assert late_bucket_rows(ok).num_rows == 2
    for bad in [-1, (2**63 - 1) // 2654435761 + 1]:
        with pytest.raises(ValueError):
            late_bucket_rows(pa.table({"event_id": pa.array([bad], pa.int64())}))


def test_canonicalize_urls_anchored_abs_gate():
    # a RELATIVE url with an embedded '://' must pass through
    # fragment-stripped, not enter the absolute parse (which produced
    # '///x.com' while the oracle produced '///')
    import pyarrow as pa

    from prclz_ray.stages.textops import canonicalize_urls

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "url": pa.array(
                ["/redirect?to=http://x.com#f", "HTTPS://WWW.Ex.com/A?utm_x=1"]
            ),
        }
    )
    out = canonicalize_urls(t)
    assert out.column("canon_url").to_pylist() == [
        "/redirect?to=http://x.com",  # relative passthrough
        "https://ex.com/A",
    ]


def test_lang_id_trigram_rejects_non_ascii():
    import pyarrow as pa

    from prclz_ray.stages.textops import lang_id_trigram

    ok = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["the thing"])})
    assert lang_id_trigram(ok).column("lang_pred3").to_pylist() == ["en"]
    bad = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["café the"])})
    with pytest.raises(ValueError):
        lang_id_trigram(bad)


def test_zonal_kernel_masks_out_of_grid_tiles(ray_session):
    # a block past the tile grid's extent must contribute NOTHING for
    # its missing tiles, not the edge tile's value
    import numpy as np
    import pyarrow as pa
    import ray

    from prclz_ray.stages.raster import RASTER_TILE_E6, make_zonal_fn

    grid = np.array([[7]], dtype=np.int64)  # ONE tile at (0, 0)
    zonal = make_zonal_fn(ray.put(grid))
    t = RASTER_TILE_E6
    batch = pa.table(
        {
            "block_id": pa.array(["in", "out"]),
            "xmin_e6": pa.array([0, 5 * t], pa.int64()),
            "ymin_e6": pa.array([0, 5 * t], pa.int64()),
            "xmax_e6": pa.array([t, 6 * t], pa.int64()),
            "ymax_e6": pa.array([t, 6 * t], pa.int64()),
        }
    )
    out = zonal(batch)
    vals = dict(zip(out.column("block_id").to_pylist(),
                    out.column("zonal_weighted").to_pylist()))
    assert vals["in"] == 7 * t * t
    assert vals["out"] == 0  # was 7*t*t via the edge-clip bug


def test_pip_grid_cap_falls_back_to_tree(ray_session, monkeypatch):
    # many tiny polygons over a wide extent: the dense grid would be
    # O(extent/pitch)^2 cells — past MAX_GRID_CELLS the actor must flip
    # to the packed tree and still answer identically
    import numpy as np

    from prclz_ray.queries import _donut_blocks_table
    from prclz_ray.stages.spatial import PIPJoinActor, put_blocks_side

    ref = put_blocks_side(_donut_blocks_table())
    lon = np.array([0.010, 0.040, 0.090, 0.140])
    lat = np.array([0.010, 0.040, 0.090, 0.110])
    grid = PIPJoinActor(ref)
    monkeypatch.setattr(PIPJoinActor, "MAX_GRID_CELLS", 1)
    tree = PIPJoinActor(ref)
    assert not tree.grid_ok
    assert grid._match(lon, lat).tolist() == tree._match(lon, lat).tolist()
