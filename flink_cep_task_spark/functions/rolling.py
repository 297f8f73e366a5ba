"""Shared composition for the day-over-day (rolling) maintenance-loop
oracles: every family member's oracle is the SAME N-day shape — day i
recomputed from scratch against the corpus minus days i..N (days not yet
crawled as of day i), tagged with an INT day column and unioned. One
composer, so a change to the day-window convention applies to the whole
family (minhash signatures, winnowing fingerprints, rollup partials, IVF
inverted file, NB counts, cluster labels) at once.

Round 11 generalized the composer from the 2-day demo shape to N days
(VERDICT r10 task #6) and widened the minhash and substring members to
N=3 in the gated registry — a day-3 match reachable only through two
consecutive store advances; round 12 widened the remaining members
(cluster labels, rollup partials, IVF inverted file, NB counts) to the
same 3-day cadence through this one composer."""

from __future__ import annotations


def day_union_sql(day_sqls: list[str]) -> str:
    """UNION ALL of per-day oracle blocks, each tagged day=i+1."""
    return "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS INT) AS day, * FROM ({q})"
        for i, q in enumerate(day_sqls)
    )


def day_union(parts):
    """DataFrame-side twin of day_union_sql: tag each day's frame with
    its 1-based day index and UNION ALL — the ONE fold every rolling
    loop and composed cycle uses, so the day-tagging convention can't
    drift between families (it must stay in lockstep with the SQL
    composer above, or every gated rolling oracle hash-flips)."""
    from pyspark.sql import functions as F

    tagged = [
        p.select(F.lit(i + 1).cast("int").alias("day"), "*")
        for i, p in enumerate(parts)
    ]
    out = tagged[0]
    for p in tagged[1:]:
        out = out.unionByName(p)
    return out


def two_day_union_sql(day1_sql: str, day2_sql: str) -> str:
    return day_union_sql([day1_sql, day2_sql])
