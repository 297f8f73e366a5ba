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


def persisted(df: DataFrame) -> DataFrame:
    p = df.persist()
    _PERSISTED.append(p)
    return p


def release_caches() -> None:
    """Unpersist every operator-persisted DataFrame. Safe at any time — a
    later query simply re-persists."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
