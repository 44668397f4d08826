"""GADM admin-hierarchy helpers (M14).

`prclz/utils.py:17-24` ``get_gadm_level_column``: given a GADM table,
find the deepest available ``GID_{level}`` column at or below the
requested level — real GADM exports carry only as many levels as the
country defines, so callers ask for level 5 and get what exists.
"""

from __future__ import annotations

from typing import Iterable


def gadm_level_column(columns: Iterable[str], level: int = 5) -> tuple[str, int]:
    """(column name, effective level) of the deepest ``GID_{n}`` column
    with n ≤ ``level`` present in ``columns``; falls back to GID_0.

    Mirrors `prclz/utils.py:17-24` including the level-0 floor (the
    reference's loop stops at ``level > 0``, returning ``GID_0``
    whether or not it exists — here too, so schema errors surface at
    the column access, same as the reference).
    """
    cols = set(columns)
    col = f"GID_{level}"
    while col not in cols and level > 0:
        level -= 1
        col = f"GID_{level}"
    return col, level
