"""Shared parsing for "column [asc|desc]" ordering strings — the
spelling sort.apply's and topk.apply's registered examples use.
"""

from __future__ import annotations


def split_dir(item: str) -> tuple[str, bool]:
    """'name' / 'name desc' / 'name asc' -> (name, descending?)."""
    s = item.strip()
    if " " in s:
        name, _, suffix = s.rpartition(" ")
        if suffix.lower() in ("asc", "desc"):
            return name.strip(), suffix.lower() == "desc"
    return s, False
