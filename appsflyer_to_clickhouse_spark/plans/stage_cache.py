"""Session-scoped materialization of shared pipeline stages.

A production corpus build materializes stage outputs (quality-gated
docs, dedup survivors, signatures) to storage between phases, and every
downstream consumer reads the materialized form instead of re-deriving
the lineage. This module is the in-session analogue: the first consumer
of a stage persists it (MEMORY_AND_DISK — spills, never recomputes),
and later consumers get the SAME DataFrame object, so Spark's
CacheManager serves them from the materialized blocks.

Sharing is keyed per (SparkSession, stage, sf_dir): results are
deterministic functions of the input tables, so reuse can never change
a query's answer — only how often the upstream is computed. Each query
remains independently correct when run alone (it just materializes the
stage itself). Nothing here is driver-side state: the cache holds
lazy DataFrame handles, the data lives in executor block storage.

Session identity is checked by OBJECT IDENTITY against a stored
reference, never by ``id()`` alone: CPython reuses addresses after
garbage collection, so an ``id()``-keyed lookup could hand a new
session a DataFrame bound to a dead one. Entries are keyed by
(stage, sf_dir) and replaced when the owning session changes, which
also bounds the cache to one persisted frame per stage instead of
accumulating one per session lifetime.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

# (stage, sf_dir) -> (owning session, persisted frame)
_CACHE: dict[tuple, tuple[SparkSession, DataFrame]] = {}


def shared_stage(
    spark: SparkSession, key: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the memoized, persisted DataFrame for ``key``, building
    it with ``build()`` on first use. Session-scoped: a new
    SparkSession gets fresh stages (stale handles from a stopped
    session are never returned — ownership is verified by object
    identity, and a superseded entry is dropped)."""
    entry = _CACHE.get(key)
    if entry is not None:
        owner, df = entry
        if owner is spark:
            return df
        # a different (possibly stopped) session owned this stage:
        # drop the stale handle and rebuild under the current session.
        # Unpersist first — if the old session is still live (two
        # sessions alternating over the same stage), its persisted
        # blocks would otherwise leak in that session's block manager;
        # on a stopped session this raises and is harmless to skip.
        try:
            df.unpersist()
        except Exception:
            pass
        del _CACHE[key]
    df = build().persist(StorageLevel.MEMORY_AND_DISK)
    _CACHE[key] = (spark, df)
    return df
