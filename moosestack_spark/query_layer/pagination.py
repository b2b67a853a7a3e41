"""Limit/offset/pagination helpers with the reference's clamping rules.

Port target: ts-moose-lib/src/query-layer/sql-utils.ts:233-260 (limit, offset,
paginate) and query-model.ts:783-794 (defaults + maxLimit clamp; `limit`+
`page` mutually exclusive with `offset`).  Reference defaults: request limit
100, maxLimit 1000 (query-model.ts:394,789 — same caps as the MCP query tool,
mcp/tools/query_olap.rs:19-21).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

DEFAULT_LIMIT = 100
MAX_LIMIT = 1000


def clamp_limit(requested: Optional[int], max_limit: int = MAX_LIMIT) -> int:
    """None -> DEFAULT_LIMIT; otherwise clamp to [1, max_limit]."""
    if requested is None:
        return min(DEFAULT_LIMIT, max_limit)
    return max(1, min(int(requested), max_limit))


def paginate(df: DataFrame, page_size: int, page: int) -> DataFrame:
    """LIMIT page_size OFFSET page_size*page (sql-utils.ts:243-251).

    Compiles to a single top-(offset+limit) per partition + driver merge —
    no global sort materialization.
    """
    if page_size <= 0:
        raise ValueError("page_size must be positive")
    if page < 0:
        raise ValueError("page must be >= 0")
    return df.offset(page_size * page).limit(page_size)


def limit_offset(
    df: DataFrame, limit: Optional[int], offset: int = 0, max_limit: int = MAX_LIMIT
) -> DataFrame:
    n = clamp_limit(limit, max_limit)
    return df.offset(offset).limit(n) if offset else df.limit(n)
