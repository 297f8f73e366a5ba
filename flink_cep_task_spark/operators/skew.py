"""Skew-mitigation primitives: salted two-phase aggregation and a salted
(replicated) join for hot keys.

When AQE already covers you and when it doesn't: with
spark.sql.adaptive.skewJoin.enabled (on in session.py), runtime skew
splitting handles SORT-MERGE joins, and Spark's hash aggregate already
does map-side partial aggregation — so for algebraic aggregates over
skewed keys the engine is safe by default. The gaps these utilities
close:

  * aggregations whose partials do NOT reduce (exact count-distinct via
    two-stage grouping, collect-based accumulations): every row of a hot
    key lands on one reducer. `salted_two_phase_distinct` spreads the
    first grouping over (key, salt) shards and merges exact partials.
  * broadcast-ineligible joins against a hot-keyed build side where AQE's
    skew split cannot apply (e.g. stream-static joins, or a forced
    shuffled-hash strategy): `salted_join` shards the hot side by a
    deterministic salt and replicates the other side across shards.

Both transformations are RESULT-IDENTICAL to their unsalted forms — the
salt never leaks into the output — so they oracle-check against the
plain SQL. Salts are deterministic (hash of the full row / key), keeping
every run and both engines reproducible; n_salts bounds the replication
factor, the usual cost knob (shard count × small-side size).

Reference scope note: the reference engine (852-line Flink CEP job) has
no skew story — its keyed state simply hot-spots (CEPTaskRunner.java
keyBy). This module is part of the 100 TB hardening the PySpark port
adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _salt_of(cols: list[str], n_salts: int) -> Column:
    # xxhash64 of the listed columns, folded to [0, n_salts) — stable
    # across runs/partitionings (no rand(): a nondeterministic salt breaks
    # task retry semantics and cross-engine checks)
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_two_phase_distinct(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    n_salts: int = DEFAULT_SALTS,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) GROUP BY keys, skew-safely.

    Phase 1 groups by (keys, salt(distinct_col)) and collects the exact
    per-shard distinct count; because the salt is a function OF THE
    DISTINCT COLUMN, a value's duplicates all land in one shard and the
    per-shard counts are disjoint — phase 2 just sums them. A hot group
    key spreads across n_salts reducers instead of melting one."""
    shard = (
        df.groupBy(*keys, _salt_of([distinct_col], n_salts).alias("__salt"))
        .agg(F.count_distinct(F.col(distinct_col)).alias("__d"))
    )
    return shard.groupBy(*keys).agg(F.sum("__d").cast("long").alias(out_col))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join where `skewed` has hot keys: shard the skewed side by a
    deterministic salt (of the whole row by default — so a hot key's rows
    spread over n_salts shards), replicate `other` across all shards, and
    join on (key, shard). Replication costs n_salts × |other| — use for
    moderate-size `other` when broadcast is ineligible and AQE's runtime
    skew split cannot see the join (stream-static, shuffled-hash hint).
    Pass salt_cols explicitly when the skewed side carries unhashable
    columns (MAP types).

    Only ``inner`` and ``left`` (outer) joins are result-identical to the
    unsalted form: `other` is REPLICATED across shards, so a right/full
    outer join would emit each unmatched `other` row once per shard, and
    semi/anti joins have no `other` columns to select — all rejected
    explicitly rather than silently corrupting results.

    Output columns = the plain join's (shard column dropped)."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only (got {how!r}): the "
            "replicated side would duplicate unmatched rows under "
            "right/full, and semi/anti drop the replicated side entirely"
        )
    out_cols = list(skewed.columns)
    other_cols = list(other.columns)
    s = skewed.withColumn(
        "__shard", _salt_of(salt_cols or out_cols, n_salts)
    )
    o = other.withColumn(
        "__shard",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"), F.lit(n_salts - 1).cast("bigint")
            )
        ),
    )
    joined = s.join(
        o, (s[skewed_key] == o[other_key]) & (s["__shard"] == o["__shard"]), how
    )
    return joined.select(*[s[c] for c in out_cols], *[o[c] for c in other_cols])
