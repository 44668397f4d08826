"""Lenient NDJSON reading — real crawl JSONL contains malformed lines,
and pyarrow's NDJSON parser rejects the whole buffer on the first one.

Strategy: **optimistic batch parse + bisect isolation**. Each batch of
text lines is parsed with ONE C-speed ``pyarrow.json.read_json`` call;
only when that fails does a recursive bisect re-parse halves, isolating
each bad line in O(log n) extra parses while every clean run still goes
through the vectorized parser. Bad lines are never silent: they route
to a dead-letter parquet sink (the ``make_dead_letter_fn`` pattern of
``stages/pages.py``) or are counted by the caller.

Reference analogue: the per-feature ``error_{index}`` files of
`midway/midway_blocks.py:45-48`, applied to source-side parse errors.
"""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.json as pj


def _concat_promote(tabs: list[pa.Table]) -> pa.Table:
    """concat with promotion; on a cross-run TYPE conflict (two valid
    JSON lines disagree, e.g. {"a":1} vs {"a":"x"} — ArrowTypeError,
    which promotion does NOT resolve), lenient-mode semantics kick in:
    the conflicting columns are stringified in every run and the concat
    retried, so both rows survive instead of killing the Ray task."""
    try:
        return pa.concat_tables(tabs, promote_options="default")
    except (pa.ArrowTypeError, pa.ArrowInvalid):
        types: dict[str, set] = {}
        for t in tabs:
            for f in t.schema:
                types.setdefault(f.name, set()).add(f.type)
        conflict = {c for c, ts in types.items() if len(ts) > 1}
        fixed = []
        for t in tabs:
            for c in conflict & set(t.column_names):
                i = t.column_names.index(c)
                col = t.column(c)
                try:
                    s = col.cast(pa.string())
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    # nested types: JSON-encode per value (conflict
                    # paths only — the clean fast path never gets here)
                    import json

                    s = pa.array(
                        [None if v is None else json.dumps(v)
                         for v in col.to_pylist()],
                        pa.string(),
                    )
                t = t.set_column(i, c, s)
            fixed.append(t)
        return pa.concat_tables(fixed, promote_options="default")


def parse_lines(lines: list[bytes]):
    """Parse NDJSON lines → (table | None, bad line indices).

    One ``read_json`` per contiguous clean run; a failing run bisects.
    A single line that still fails is the bad line. Schemas of the
    surviving runs unify with promotion (missing keys → null); runs
    whose TYPES conflict unify by stringifying the conflicting column
    (see ``_concat_promote``). Callers must pre-filter blank lines —
    ``read_json`` silently skips them, which would desync the
    parsed-row ↔ line-index mapping."""
    if not lines:
        return None, []
    try:
        return pj.read_json(io.BytesIO(b"\n".join(lines))), []
    except pa.ArrowInvalid:
        if len(lines) == 1:
            return None, [0]
        mid = len(lines) // 2
        lt, lb = parse_lines(lines[:mid])
        rt, rb = parse_lines(lines[mid:])
        tabs = [x for x in (lt, rt) if x is not None]
        t = _concat_promote(tabs) if tabs else None
        return t, lb + [mid + i for i in rb]


def make_jsonl_parse_fn(errors_dir: str | None = None,
                        columns: list[str] | None = None,
                        schema: pa.Schema | None = None,
                        required: list[str] | None = None):
    """map_batches stage over ``ray.data.read_text`` output: parse each
    batch's lines leniently; malformed lines go to ``errors_dir`` as
    (line, reason) parquet — content-hash-named, so task retries
    rewrite the same file (idempotent DLQ) — or are dropped with the
    count recorded in the file when no dir is given.

    ``required``: schema-contract mode — a line that parses as valid
    JSON but is missing any of these keys (absent column OR null
    value: promotion turns absent keys into nulls) is ALSO routed to
    the DLQ with reason 'missing required key', not silently kept as
    a null-padded row."""

    def parse(batch: pa.Table) -> pa.Table:
        all_lines = [t.encode() for t in batch.column("text").to_pylist()]
        # blank/whitespace-only lines are neither rows nor errors —
        # read_json SKIPS them silently, which would shift every
        # parsed-row → source-line index after the blank (DLQ rows
        # would name the wrong line). Drop them up front so
        # "parsed row order == good-line order" actually holds.
        keep = [i for i, ln in enumerate(all_lines) if ln.strip()]
        lines = [all_lines[i] for i in keep]
        t, bad_local = parse_lines(lines)
        bad = [(keep[i], "invalid json") for i in bad_local]
        if t is not None and required is not None and t.num_rows:
            import numpy as np
            import pyarrow.compute as pc

            viol = np.zeros(t.num_rows, dtype=bool)
            for c in required:
                if c in t.column_names:
                    viol |= pc.is_null(t.column(c)).to_numpy(
                        zero_copy_only=False
                    )
                else:
                    viol[:] = True
            if viol.any():
                # map violating parsed rows back to their source lines:
                # parsed row order == good-(nonblank)-line order, and
                # keep[] lifts that back to the original batch index
                bad_set = set(bad_local)
                good_idx = [
                    keep[i] for i in range(len(lines))
                    if i not in bad_set
                ]
                bad += [
                    (good_idx[r], "missing required key")
                    for r in np.flatnonzero(viol)
                ]
                t = t.filter(pa.array(~viol))
        if bad and errors_dir is not None:
            import hashlib
            import os

            import pyarrow.parquet as pq

            side = pa.table(
                {
                    "line": pa.array(
                        [all_lines[i].decode("utf-8", "replace")
                         for i, _ in bad]
                    ),
                    "reason": pa.array([r for _, r in bad]),
                }
            )
            tag = hashlib.md5(
                b"\n".join(all_lines[i] for i, _ in bad)
            ).hexdigest()[:16]
            os.makedirs(errors_dir, exist_ok=True)
            import tempfile

            # writer-unique tmp (manifest.py idiom): two concurrent
            # tasks with identical bad lines share the SAME tag, so a
            # content-derived tmp path would interleave their writes
            fd, tmp = tempfile.mkstemp(
                prefix=f".jsonl-errors-{tag}.", suffix=".tmp", dir=errors_dir
            )
            os.close(fd)
            pq.write_table(side, tmp)
            os.replace(tmp, os.path.join(errors_dir, f"jsonl-errors-{tag}.parquet"))
        if t is None or t.num_rows == 0:
            # an all-bad batch must still emit a TYPED empty table —
            # a schema-less block breaks downstream unions/joins (the
            # CLAUDE.md empty-partition hazard)
            if schema is not None:
                return schema.empty_table()
            if columns is not None:
                # no dtypes known: string is the JSONL-safe default —
                # promote_options="default" upcasts it downstream when
                # other batches carry typed values
                return pa.schema(
                    [(c, pa.string()) for c in columns]
                ).empty_table()
            raise ValueError(
                "jsonl_lenient: a batch yielded no parseable rows and "
                "neither schema= nor columns= was given — a zero-column "
                "block would poison downstream unions/joins; pass the "
                "expected schema (or columns) for lenient mode"
            )
        if columns is not None:
            # a non-empty batch whose lines all lack a requested key
            # must null-pad it — NDJSON keys vary per batch, so whether
            # a key appears is an accident of which lines landed here,
            # and select() would otherwise KeyError. When schema= is
            # given the pad MUST use its field type: a string pad next
            # to another block's int64 column gives the same dataset
            # conflicting types per block (string is only the fallback
            # the schemaless empty-batch branch uses too)
            for c in columns:
                if c not in t.column_names:
                    typ = schema.field(c).type if (
                        schema is not None and schema.get_field_index(c) >= 0
                    ) else pa.string()
                    t = t.append_column(c, pa.nulls(t.num_rows, typ))
            return t.select(columns)
        return t

    return parse
