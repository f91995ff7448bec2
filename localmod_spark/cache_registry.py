"""Session-scoped registry for operator-internal persisted stages.

Operators that persist an intermediate whose lifetime must outlive their
own call (the MinHash/SimHash band tables, shard-mode wide-bucket
control tables, the token-budget histogram input) register it here so a
long-lived driver can release every block between jobs — without a
release hook each such call would accumulate MEMORY_AND_DISK blocks for
the rest of the session.  bench.py additionally clears the SQL cache
between timing repeats; any other long-lived driver should call
:func:`release_stage_caches` between jobs.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

_STAGE_CACHES: List[DataFrame] = []


def register_stage_cache(df: DataFrame) -> DataFrame:
    """Record a persisted stage table for later release; returns it."""
    _STAGE_CACHES.append(df)
    return df


def release_stage_caches() -> int:
    """Unpersist every registered stage table in this session; returns
    how many were released."""
    n = 0
    while _STAGE_CACHES:
        df = _STAGE_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return n
