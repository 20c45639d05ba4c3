"""Shared-cache handle lifecycle (VERDICT r14 #4).

Operators that ``persist()`` a subtree their lazy result re-reads expose
the persisted DataFrames on the RETURNED DataFrame as
``df._gmrs_shared_caches`` (a tuple), so eager callers — checkpointing
graph ops, the accounting tests, any consumer that materializes the
result and wants the memory back — can release exactly what the
operator registered instead of leaking it until the harness-owned
``spark.catalog.clearCache()`` (bench.timed / the parity sweep).

Hand-attaching the attribute proved projection-fragile: ``.select()``
returns a NEW Python object, silently dropping the attribute, so a
composing operator that projects a subtree's result loses the nested
handles while the caches stay registered (the bug class round 14 fixed
twice by hand — commits 803f0a6/dfd285d — and ADVICE r14 found once
more in pipeline_drop_attribution).  This module makes the invariant
ONE function instead of a convention:

    out = ...final projection...
    return with_shared_caches(out, q, keepers, pairs_full)

Each source contributes (a) itself when it is persisted in the cache
manager and (b) every handle it already exposes — so nested
compositions propagate without the caller knowing which subtrees
persist.  ``tests/test_cache_hygiene.py`` pins the accounting
(persisted-RDD delta == len(handles)) for every handle-bearing
registry operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Attribute name — public contract with the tests and eager callers.
HANDLE_ATTR = "_gmrs_shared_caches"


def shared_cache_handles(df: DataFrame) -> tuple[DataFrame, ...]:
    """The cache handles ``df`` exposes (empty tuple when none)."""
    return tuple(getattr(df, HANDLE_ATTR, ()))


def _is_persisted(df: DataFrame) -> bool:
    """True when the cache manager holds an entry for ``df``.

    Deliberately NOT true for ``localCheckpoint`` results: their RDD
    blocks live outside the catalog and ``DataFrame.unpersist()`` cannot
    release them, so advertising them as releasable handles would lie to
    eager callers (ops that checkpoint manage those blocks themselves).
    """
    lvl = df.storageLevel
    return bool(lvl.useMemory or lvl.useDisk or lvl.useOffHeap)


def with_shared_caches(df: DataFrame, *sources: DataFrame) -> DataFrame:
    """Attach to ``df`` the union of cache handles derivable from its
    existing handles plus ``sources``, and return ``df``.

    Call it ON THE FINAL PROJECTION, passing every subtree the result
    rides on; order is stable (existing handles first, then each
    source's contributions) and duplicates are dropped by object
    identity — ``DataFrame.__eq__`` builds a Column, so ``in``/``set``
    membership would be wrong here.
    """
    handles: list[DataFrame] = []

    def add(h: DataFrame) -> None:
        if not any(existing is h for existing in handles):
            handles.append(h)

    for h in shared_cache_handles(df):
        add(h)
    for src in sources:
        if _is_persisted(src):
            add(src)
        for nested in shared_cache_handles(src):
            add(nested)
    setattr(df, HANDLE_ATTR, tuple(handles))
    return df


def release_shared_caches(df: DataFrame, blocking: bool = False) -> int:
    """Unpersist every handle ``df`` exposes; returns how many.  The
    eager-caller half of the lifecycle (neardup_pagerank's checkpoint,
    the accounting tests)."""
    handles = shared_cache_handles(df)
    for h in handles:
        h.unpersist(blocking=blocking)
    return len(handles)
