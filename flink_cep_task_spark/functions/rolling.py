"""Shared composition for the day-over-day (rolling) maintenance-loop
oracles: every family member's oracle is the SAME two-day shape — day 1
recomputed from scratch against the corpus minus both days, day 2
against everything except itself — tagged with an INT day column and
unioned. One composer, so a change to the day-window convention applies
to the whole family (minhash signatures, winnowing fingerprints, rollup
partials, IVF inverted file, NB counts) at once."""

from __future__ import annotations


def two_day_union_sql(day1_sql: str, day2_sql: str) -> str:
    return (
        f"SELECT CAST(1 AS INT) AS day, * FROM ({day1_sql})\n"
        f"UNION ALL\nSELECT CAST(2 AS INT) AS day, * FROM ({day2_sql})"
    )
