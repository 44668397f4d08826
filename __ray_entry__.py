"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
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
