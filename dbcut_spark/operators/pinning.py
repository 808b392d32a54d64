"""Ownership-tracked persist() for multi-consumer intermediates.

Several operators persist an internal frame that feeds 2-3 branches of
the SAME returned plan (LSH signatures, simhash values, shingle rows).
The cache is live only while the returned DataFrame executes, but a
bare ``.persist()`` leaks it for the life of the session — in a
long-lived bench/CLI/notebook session those caches accumulate until
executor storage evicts them under pressure (wasted memory, noisy
evictions at scale).

Operators call :func:`pin` instead of ``.persist()``; any driver that
runs queries in sequence (bench.py, the CLI, the parity checker) calls
:func:`release_pinned` after each query's terminal action. Releasing is
always safe: ``unpersist`` on a frame mid-use only degrades to
recompute, never wrong results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """persist() + register for later :func:`release_pinned`."""
    df.persist()
    _PINNED.append(df)
    return df


def release_pinned() -> int:
    """Unpersist every frame pinned since the last release; returns how
    many were released."""
    n = len(_PINNED)
    for df in _PINNED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _PINNED.clear()
    return n
