"""Tracked DataFrame persistence shared by operators that reuse an
expensive intermediate across plan branches (hashed shingles, normalized
embedding vectors).

Long-lived sessions call release_caches() once results are consumed;
without it, boundedness still holds because Spark's CacheManager dedupes
persist() by analyzed plan — repeated invocations reuse ONE entry per
(operator, dataset) — and eviction is LRU under memory pressure."""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []

# Session-shared tier: survives release_caches(). For tiny, deterministic
# intermediates that MULTIPLE registered queries rebuild identically in one
# session (e.g. the MinHash-LSH verified pair set feeds both the
# dedup_minhash_lsh query and dedup_clusters' edge list). Spark's
# CacheManager substitutes a cached relation into ANY later plan containing
# a canonically-identical fragment, so the second query hits this cache
# without holding a Python reference — the dict exists only to dedupe
# persist() calls and to release on demand. Keep entries SMALL (verified
# pair sets, not shingle explosions): they live for the whole session.
_SHARED: dict[str, DataFrame] = {}


def persisted(df: DataFrame) -> DataFrame:
    p = df.persist()
    _PERSISTED.append(p)
    return p


def persisted_shared(df: DataFrame) -> DataFrame:
    key = df._jdf.queryExecution().analyzed().canonicalized().toString()
    if key in _SHARED:
        return _SHARED[key]
    p = df.persist()
    _SHARED[key] = p
    return p


def release_caches() -> None:
    """Unpersist every per-query operator-persisted DataFrame (the shared
    tier survives — see _SHARED). Safe at any time — a later query simply
    re-persists."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()


def release_shared() -> None:
    """Unpersist the session-shared tier too (tests / session teardown)."""
    for p in _SHARED.values():
        p.unpersist()
    _SHARED.clear()
