"""Per-partition lineage manifest.

One JSON file per completed partition under ``<out_dir>/_manifest/``:
partition key, input fingerprint, row count, wall seconds. A restarted
run anti-joins its planned partitions against the manifest (J10/D4
semantics — the reference's completed-set reload at
`reblock/i_reblock.py:120-125` and residual set-difference at
`prclz/parcelization/midway_parcelization_residual.sh:31-44`) and only
computes the missing ones. Files are written atomically (tmp+rename)
so a killed run never leaves a half-written manifest row.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterable, Set


STALE_TMP_S = 3600  # sweep .tmp droppings older than this on open


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)
        # a run killed between mkstemp and os.replace leaves a .tmp
        # file forever; sweep old ones so crashed runs don't grow the
        # dir unboundedly. AGE-GATED: a concurrent live run's tmp is
        # milliseconds old — deleting it would break its os.replace.
        now = time.time()
        for f in os.listdir(self.dir):
            if f.endswith(".tmp"):
                p = os.path.join(self.dir, f)
                try:
                    if now - os.path.getmtime(p) > STALE_TMP_S:
                        os.unlink(p)
                except OSError:
                    pass  # raced another sweeper / the writer finished

    def _path(self, partition: str) -> str:
        return os.path.join(self.dir, f"{partition}.json")

    def completed(self, fingerprint: str | None = None) -> Set[str]:
        """Completed partition keys. With ``fingerprint`` given, a
        partition only counts when its stored input_fingerprint
        matches — resuming against a DIFFERENT input must not skip
        partitions completed from the old one (they are recomputed and
        their stale dirs removed by the caller's crash cleanup)."""
        # half-written rows are excluded by NAMING: writers only ever
        # hold ".tmp"-suffixed files (mark() above) until the atomic
        # replace — the .json filter is the whole protection
        keys = {
            f[: -len(".json")]
            for f in os.listdir(self.dir)
            if f.endswith(".json")
        }
        if fingerprint is None:
            return keys
        out = set()
        for k in keys:
            try:
                if self.read(k).get("input_fingerprint", "") == fingerprint:
                    out.add(k)
            except (OSError, json.JSONDecodeError):
                pass  # unreadable row → treat as incomplete
        return out

    def plan(self, partitions: Iterable[str], fingerprint: str | None = None) -> Set[str]:
        """Anti-join: planned partitions not yet completed."""
        return set(partitions) - self.completed(fingerprint)

    def mark(self, partition: str, rows: int, fingerprint: str = "", wall_s: float = 0.0):
        rec = {
            "partition": partition,
            "rows": int(rows),
            "input_fingerprint": fingerprint,
            "wall_s": round(wall_s, 3),
            "ts": time.time(),
        }
        import tempfile

        # unique tmp per writer → os.replace is atomic even when two
        # runs race to mark the same partition
        fd, tmp = tempfile.mkstemp(prefix=f"{partition}.", suffix=".tmp", dir=self.dir)
        with os.fdopen(fd, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._path(partition))

    def read(self, partition: str) -> Dict:
        with open(self._path(partition)) as f:
            return json.load(f)

    def unmark(self, partition: str) -> None:
        """Remove a partition's row (its data was invalidated) — a
        stale row left behind after its dir is deleted would make a
        later resume with the ORIGINAL input skip a partition whose
        data no longer exists."""
        try:
            os.remove(self._path(partition))
        except FileNotFoundError:
            pass
