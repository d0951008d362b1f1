"""Null-safe JSON path walking — the reference's ``get_from_json``.

The reference duplicates this helper 9× (SURVEY.md §1.1: e.g.
/root/reference/1.samsclub/parse_samsclub.py:31-42,
costco/parse_costco.py:24-33, walmart/parse_walmart.py:18-27). We implement
the *safe* samsclub variant (bounds-checked list indices, parse_samsclub.py:37-38)
once: any miss → None, exactly Spark's ``get_json_object`` /
``try_element_at`` semantics, so column-level equivalents stay drop-in.
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

__all__ = ["get_from_json", "walk_first"]


def get_from_json(obj: Any, path: Iterable) -> Any:
    """Walk dict keys (str) / list indices (int); None on any miss."""
    cur = obj
    for step in path:
        if cur is None:
            return None
        if isinstance(step, int):
            if isinstance(cur, (list, tuple)) and -len(cur) <= step < len(cur):
                cur = cur[step]
            else:
                return None
        else:
            if isinstance(cur, dict):
                cur = cur.get(step)
            else:
                return None
    return cur


def walk_first(obj: Any, paths: Iterable[Iterable]) -> Any:
    """coalesce(get_from_json(p) for p in paths) — fallback chains (T15)."""
    for p in paths:
        v = get_from_json(obj, p)
        if v is not None:
            return v
    return None
