"""Query suite — the driver-facing registry (``__spark_entry__.py`` contract).

Each domain module contributes ``QUERIES: dict[str, Query]``; this package
merges them. Every operator from SURVEY.md §2 (plus the BASELINE.json
extension operators) has exactly one named entry here, with a DuckDB
oracle twin where SQL-expressible.
"""

from __future__ import annotations

from .base import Query
from . import (
    dedup,
    events,
    joins2,
    maps,
    multimodal,
    parity,
    relational,
    scalars2,
    similarity,
    stats,
    text,
    udfs,
)


def all_queries() -> dict[str, Query]:
    merged: dict[str, Query] = {}
    for mod in (
        parity,
        relational,
        joins2,
        stats,
        scalars2,
        maps,
        events,
        text,
        dedup,
        similarity,
        multimodal,
        udfs,
    ):
        for name, q in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r}")
            merged[name] = q
    return merged


__all__ = ["Query", "all_queries"]
