"""Pages-table stages: synthesis from the driver's ``documents`` table,
HTML→text extraction, geocoding, and cell indexing.

The pages table is the engine's input corpus per BASELINE.json
``input_hint``: (url:string, warc_ts:timestamp[us], html:binary,
text:large_string, lang:string). The driver testdata carries
``documents`` (doc_id, text, lang, source, n_chars); ``synth_pages``
derives pages from it deterministically (FIXTURES.md §1.1) so DuckDB
oracles can recompute every downstream value from ``documents``.

Extraction parity: ``extract_text`` must reproduce the ``text`` column
byte-identically from ``html`` (the role of the reference's
tag-filtering ogr2ogr extract, `osm-etl/extract.sh:25-27`, transplanted
to web pages). All stages are vectorized pyarrow.compute kernels — no
Python row loops.
"""

from __future__ import annotations

from ..io import read_parquet_clean as _read_parquet_clean

import pyarrow as pa
import pyarrow.compute as pc

from .. import world
from ..geom.cells import RES_FINE, RES_PARTITION, cell_id_e6

WARC_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
WARC_STEP_US = 37_000_000  # 37 s per doc_id

_GEO_RE = r'<meta name="geo\.position" content="(?P<lat_e6>-?[0-9]+);(?P<lon_e6>-?[0-9]+)">'
_ARTICLE_RE = r"<article>(?P<body>(?s:.*))</article>"


def _escape(col: pa.Array) -> pa.Array:
    # html-escape; & first so later entities are not double-escaped
    col = pc.replace_substring(col, "&", "&amp;")
    col = pc.replace_substring(col, "<", "&lt;")
    col = pc.replace_substring(col, ">", "&gt;")
    return col


def _unescape(col: pa.Array) -> pa.Array:
    # exact inverse of _escape: entities first, ampersand last
    col = pc.replace_substring(col, "&lt;", "<")
    col = pc.replace_substring(col, "&gt;", ">")
    col = pc.replace_substring(col, "&amp;", "&")
    return col


def synth_pages(batch: pa.Table) -> pa.Table:
    """documents → pages. Deterministic, fully vectorized.

    html layout: title, optional geo.position meta (integer microdegree
    lat;lon from the world geocode arithmetic), body text inside
    <article> (html-escaped).
    """
    doc_id = batch.column("doc_id")
    text = batch.column("text").cast(pa.large_string())
    d = doc_id.to_numpy(zero_copy_only=False)

    has_geo, lat_e6, lon_e6 = world.geocode_from_doc_id(d)

    LS = pa.large_string()

    def _s(v):  # scalar literal as large_string (kernel needs uniform types)
        return pa.scalar(v, LS)

    doc_s = pc.cast(doc_id, pa.string()).cast(LS)
    url = pc.binary_join_element_wise(
        _s("https://"), batch.column("source").cast(LS), _s("/"), doc_s, _s("")
    ).cast(pa.string())
    warc_ts = pa.array(WARC_EPOCH_US + d * WARC_STEP_US).cast(pa.timestamp("us"))

    geo_meta = pc.binary_join_element_wise(
        _s('<meta name="geo.position" content="'),
        pa.array(lat_e6.astype("int64")).cast(pa.string()).cast(LS),
        _s(";"),
        pa.array(lon_e6.astype("int64")).cast(pa.string()).cast(LS),
        _s('">'),
        _s(""),
    )
    geo_meta = pc.if_else(pa.array(has_geo), geo_meta, _s(""))

    body = _escape(text)
    html = pc.binary_join_element_wise(
        _s("<html><head><title>doc "),
        doc_s,
        _s("</title>"),
        geo_meta,
        _s("</head><body><article>"),
        body,
        _s("</article></body></html>"),
        _s(""),
    )
    return pa.table(
        {
            "doc_id": doc_id,
            "url": url,
            "warc_ts": warc_ts,
            "html": html.cast(pa.large_binary()),
            "text": text,
            "lang": batch.column("lang"),
            "n_chars": batch.column("n_chars"),
        }
    )


EXTRACT_ERR = "extract_error"
_ERR_NO_ARTICLE = "no <article> element in html"


def extract_text(batch: pa.Table) -> pa.Table:
    """html → extracted text (byte-identical to the original corpus text).

    Drops the wide ``html`` column immediately after extraction so it
    never enters a shuffle (SURVEY.md §7.4 "wide binary rows").

    Malformed pages (the ``<article>`` regex misses) get null ``text``
    plus a reason in the ``extract_error`` column — the dead-letter
    marker ``make_dead_letter_fn`` routes to a side sink, mirroring the
    reference's per-feature ``error_{index}`` files
    (`midway/midway_blocks.py:45-48`). A miss is never silent.
    """
    html = batch.column("html").cast(pa.large_string())
    body = pc.struct_field(pc.extract_regex(html, _ARTICLE_RE), "body")
    extracted = _unescape(body).cast(pa.large_string())
    cols = {name: batch.column(name) for name in batch.column_names if name != "html"}
    cols["text"] = extracted
    cols[EXTRACT_ERR] = pc.if_else(
        pc.is_valid(body),
        pa.scalar(None, pa.string()),
        pa.scalar(_ERR_NO_ARTICLE, pa.string()),
    )
    return pa.table(cols)


def make_dead_letter_fn(errors_dir: str):
    """Dead-letter split stage: rows whose ``extract_error`` is set are
    written to ``errors_dir`` as (url, extract_error) parquet and
    REMOVED from the stream; clean rows pass through without the marker
    column. The side file is named by a content hash of its error urls,
    so a retried task rewrites the same file — idempotent, not
    duplicated (the footer-walk counting rule applied to the DLQ)."""
    import pyarrow.parquet as pq

    def dead_letter(batch: pa.Table) -> pa.Table:
        err = pc.is_valid(batch.column(EXTRACT_ERR))
        if pc.any(err).as_py():
            import hashlib
            import os

            bad = batch.filter(err)
            side = pa.table(
                {"url": bad.column("url").cast(pa.string()),
                 "extract_error": bad.column(EXTRACT_ERR)}
            )
            tag = hashlib.md5("\n".join(side.column("url").to_pylist()).encode()).hexdigest()[:16]
            os.makedirs(errors_dir, exist_ok=True)
            tmp = os.path.join(errors_dir, f".errors-{tag}.tmp")
            pq.write_table(side, tmp)
            os.replace(tmp, os.path.join(errors_dir, f"errors-{tag}.parquet"))
            batch = batch.filter(pc.invert(err))
        return batch.drop_columns([EXTRACT_ERR])

    return dead_letter


def geocode(batch: pa.Table) -> pa.Table:
    """Parse the geo.position meta tag out of ``html`` → integer
    microdegree lat/lon (+ ``has_geo``). Pages without the tag get
    lat_e6 = lon_e6 = -1."""
    html = batch.column("html").cast(pa.large_string())
    m = pc.extract_regex(html, _GEO_RE)
    lat = pc.cast(pc.struct_field(m, "lat_e6"), pa.int64())
    lon = pc.cast(pc.struct_field(m, "lon_e6"), pa.int64())
    has_geo = pc.is_valid(lat)
    out = dict(zip(batch.column_names, batch.columns))
    out["has_geo"] = has_geo
    out["lat_e6"] = pc.fill_null(lat, -1)
    out["lon_e6"] = pc.fill_null(lon, -1)
    return pa.table(out)


def index_cells(batch: pa.Table) -> pa.Table:
    """Attach the partitioning cell ids (res-5 route key, res-7 fine)."""
    lat = batch.column("lat_e6").to_numpy(zero_copy_only=False)
    lon = batch.column("lon_e6").to_numpy(zero_copy_only=False)
    has = batch.column("has_geo").to_numpy(zero_copy_only=False)
    r5 = cell_id_e6(lat, lon, RES_PARTITION)
    r7 = cell_id_e6(lat, lon, RES_FINE)
    r5[~has] = -1
    r7[~has] = -1
    out = dict(zip(batch.column_names, batch.columns))
    out["cell_r5"] = pa.array(r5)
    out["cell_r7"] = pa.array(r7)
    return pa.table(out)


def pages_dataset(input_dir: str, batch_size: int = 8192, errors_dir: str | None = None):
    """The canonical pages stage chain (synth → geocode → extract →
    cell index) — single definition shared by the flagship pipeline and
    the query surface so the two can never diverge.

    ``errors_dir``: when set, extraction failures leave the stream as
    (url, extract_error) dead-letter parquet there; when None the rows
    stay in-stream with null text + the ``extract_error`` marker."""
    ds = _read_parquet_clean(f"{input_dir}/documents.parquet")
    ds = ds.map_batches(synth_pages, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(geocode, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(extract_text, batch_format="pyarrow", batch_size=batch_size)
    if errors_dir is not None:
        ds = ds.map_batches(
            make_dead_letter_fn(errors_dir), batch_format="pyarrow", batch_size=batch_size
        )
    return ds.map_batches(index_cells, batch_format="pyarrow", batch_size=batch_size)


def extract_links(batch: pa.Table, col: str = "html",
                  keep_cols: tuple = ("doc_id",),
                  with_anchors: bool = False,
                  anchor_markup: bool = False) -> pa.Table:
    """Vectorized multi-match ``href="..."`` extraction — the crawl-side
    producer of the link table ``stages.curation.pagerank`` consumes
    (and the outlink half of any frontier/anchor-text pipeline).

    One row per (page, link) with the link's document-order index.
    Loop-free multi-match on Arrow kernels: split on ``href="`` (every
    fragment after the first starts with a link target), then
    ``split('"', max_splits=1)[0]`` per fragment; fragment→page mapping
    via list parent indices. Pure map-side — no shuffle, the wide html
    column never leaves the stage. Output: (*keep_cols passthrough, link_idx, href).

    Reference analogue: engine-new surface (the reference ingests
    geodata, not hyperlinked pages); extraction-parity contract mirrors
    ``extract_text`` above (oracle = DuckDB regexp_extract_all over the
    same bytes).
    """
    import numpy as np

    from .hashing import arrow_combined as comb

    # null html (e.g. rows the dead-letter path keeps in-stream) must
    # yield zero links, not poison the fragment starts: a null list
    # length becomes NaN → INT64_MIN under astype and silently drops
    # every link of every later row in the batch
    html = pc.fill_null(batch.column(col).cast(pa.large_string()), "")
    parts = pc.split_pattern(html, 'href="')
    par = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    flat = comb(pc.list_flatten(parts))
    nl = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(nl)])[:-1]
    local = np.arange(len(flat), dtype=np.int64) - starts[par]
    keep = local > 0  # fragment 0 of each page precedes its first href
    flat_k = flat.filter(pa.array(keep))
    split_q = pc.split_pattern(flat_k, '"', max_splits=1)
    href = pc.list_element(split_q, 0)
    taken = pa.array(par[keep])
    cols = {name: comb(batch.column(name)).take(taken) for name in keep_cols}
    cols["link_idx"] = pa.array(local[keep] - 1, pa.int64())
    cols["href"] = href.cast(pa.string())
    if with_anchors:
        if anchor_markup:
            # markup-tolerant: capture non-greedily up to </a>, then
            # strip inner tags — anchors like 'x<b>y</b>' yield 'xy'.
            # Contract: links must close with </a> (the plain mode
            # below tolerates unclosed tags; this one requires the
            # terminator, like the oracle's (.*?)</a> group).
            m = pc.extract_regex(flat_k, r'^[^"]*"[^>]*>(?P<a>.*?)</a>')
            a = pc.replace_substring_regex(
                pc.fill_null(pc.struct_field(m, "a"), ""), r"<[^>]*>", ""
            )
            cols["anchor"] = a.cast(pa.string())
        else:
            # anchor text = the [^<]* run after the tag's closing '>'
            # — one vectorized RE2 pass per fragment, the same regex
            # shape as the oracle's href="[^"]*"[^>]*>([^<]*). A
            # fragment whose tag never closes (no '>') yields anchor
            # '' (fill_null), the documented malformed-tag contract.
            m = pc.extract_regex(flat_k, r'^[^"]*"[^>]*>(?P<a>[^<]*)')
            cols["anchor"] = pc.fill_null(
                pc.struct_field(m, "a"), ""
            ).cast(pa.string())
    return pa.table(cols)
