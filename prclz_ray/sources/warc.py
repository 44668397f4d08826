"""WARC source — the Common-Crawl container format of the north-star
corpus (`input_hint`: CC-style pages). Minimal WARC/1.0 response
records: header block (CRLF-terminated fields, Content-Length framed
payload) + payload + blank-line separator.

Distributed read shape: one task per WARC file
(``ray.data.read_binary_files``) parsing its records into
(url, warc_ts, html) rows — the standard CC layout of many ~1 GB
.warc files maps 1:1 onto Ray's file-parallel read. Header parsing is
per-record Python over tiny header bytes; payload bytes pass through
as zero-copy slices.

The synth writer (`write_synth_warc`) serializes the documents table
so round-trip byte-identity is oracle-checkable — the engine-side
analogue of the reference's bulk downloader outputs (S9 stays
driver-side per SURVEY §2.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"


def write_synth_warc(path: str, urls: list[str], timestamps: list[str], payloads: list[bytes]) -> None:
    """Serialize records as minimal WARC/1.0 responses (one file)."""
    with open(path, "wb") as fh:
        for url, ts, payload in zip(urls, timestamps, payloads):
            fh.write(b"WARC/1.0" + _CRLF)
            fh.write(b"WARC-Type: response" + _CRLF)
            fh.write(f"WARC-Target-URI: {url}".encode() + _CRLF)
            fh.write(f"WARC-Date: {ts}".encode() + _CRLF)
            fh.write(f"Content-Length: {len(payload)}".encode() + _CRLF)
            fh.write(_CRLF)
            fh.write(payload)
            fh.write(_CRLF + _CRLF)


def parse_warc_bytes(data: bytes, record_types: tuple = ("response",)) -> pa.Table:
    """One WARC file's bytes → (url, warc_ts, html) rows.

    Content-Length-framed scan: never splits on payload content, so
    binary payloads containing 'WARC/1.0' parse correctly. Only
    ``record_types`` (default: response) become rows — real CC WARCs
    interleave warcinfo/request/metadata records with each response,
    and emitting those would double row counts with bogus
    (url, html=HTTP-request-bytes) pages. Every record is still FRAMED
    (Content-Length consumed) so skipping never desyncs the scan.
    Header field names are case-insensitive and a missing colon-space
    ('Content-Length:123', spec-legal) still parses."""
    want = {t.lower() for t in record_types}
    urls: list[str] = []
    tss: list[str] = []
    payloads: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip record separators / leading blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header at byte {pos}")
        # lenient decode: one raw latin-1 byte in a header (common in
        # real crawl URIs) must not kill the whole per-file parse task
        header = data[pos:hdr_end].decode("utf-8", "replace")
        fields = {}
        for line in header.split("\r\n")[1:]:  # [0] is the version line
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except KeyError:
            raise ValueError(
                f"WARC record at byte {pos} has no Content-Length — "
                "unframed records cannot be skipped safely"
            ) from None
        body_start = hdr_end + 4
        if fields.get("warc-type", "").lower() in want:
            payloads.append(data[body_start : body_start + length])
            urls.append(fields.get("warc-target-uri", ""))
            tss.append(fields.get("warc-date", ""))
        pos = body_start + length
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.string()),
            "html": pa.array(payloads, pa.large_binary()),
        }
    )


def read_warc(paths):
    """WARC file(s) → Dataset of (url, warc_ts, html) — one parse task
    per file (`read_binary_files` keeps whole records together)."""
    import ray.data

    ds = ray.data.read_binary_files(paths)

    def decode(batch: pa.Table) -> pa.Table:
        # per-FILE parse (not per record): a batch holds whole WARC
        # files; the loop runs once per file, records parse vectorized
        tables = [parse_warc_bytes(b) for b in batch.column("bytes").to_pylist()]
        if not tables:
            return parse_warc_bytes(b"")
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow")
