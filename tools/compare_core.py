"""Shared oracle-comparison core for the two driver-gate mirrors
(tools/oracle_check.py and scripts/dress_rehearsal.py).

One normalization, one table list, one sf dir: the round-6 review found
the two mirrors had already drifted (:.9g floats without nan handling vs
:.10g with), so a query could pass one gate and fail the other on the
same fixtures. Every future tweak lands here once.
"""
from __future__ import annotations

import math

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_val(v) -> str:
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.10g}"
    return str(v)


def rowset(cols, rows):
    """Column-name-sorted, value-normalized, row-sorted tuples — the
    driver-gate comparison shape."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in idx) for r in rows)


def register_views(con, sf_dir: str = SF_DIR) -> None:
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
