"""ANSI-SQL (DuckDB-dialect-safe) oracle generator for CEP rule evaluation.

For a given rule set over the driver's `events` table, emits SQL computing
exactly what plans.cep.evaluate_rules_on_events computes — same epoch
arithmetic, same exact-decimal aggregation, same rounding — so a DuckDB run
hash-matches the Spark result. Used by __spark_entry__.oracle_sql() and the
pytest parity harness.

Portability contract (kept in lockstep with operators/windows.py):
  * timestamps → epoch seconds via floor(epoch(ts)) == Spark CAST(ts AS LONG)
  * measures aggregated as DECIMAL(18,2) (exact, order-independent)
  * final value CAST to DOUBLE, compared unrounded in HAVING, rounded(4)
    in the projection
"""

from __future__ import annotations

from flink_cep_task_spark.rules import Rule, compact_rule_list

# tag/measure name → SQL expression over the raw `events` view; mirror of
# sources.tables.events_to_metrics.
TAG_SQL = {
    "t_event_type": "event_type",
    "t_user": "CAST(user_id AS VARCHAR)",
}
MEASURE_SQL = {
    "value": "CAST(value AS DECIMAL(18,2))",
}

TS_S = "CAST(floor(epoch(ts)) AS BIGINT)"


_compact = compact_rule_list  # shared python mirror of compact_rules



def _fmul(x: str, n: int) -> str:
    """SQL for floor(x/n)*n over exact integers — DuckDB's integer `//`
    TRUNCATES toward zero (probed: (-7201)//3600 = -2, floor = -3), so a
    `//`-built window start diverges from the engine's F.floor bucketing
    for negative operands (pre-1970 events; sliding's t-size near the
    epoch). The mod identity x - ((x % n) + n) % n is exact at any
    magnitude and matches floor for both signs (DuckDB % follows the
    dividend's sign, like Spark's pmod-free %)."""
    return f"(({x}) - ((({x}) % {n}) + {n}) % {n})"

def _value_sql(r: Rule) -> str:
    m = MEASURE_SQL[r.agg_field]
    if r.agg_type == "SUM":
        return f"CAST(sum({m}) AS DOUBLE)"
    if r.agg_type == "AVG":
        return f"CAST(sum({m}) AS DOUBLE) / count({m})"
    if r.agg_type == "MIN":
        return f"CAST(min({m}) AS DOUBLE)"
    return f"CAST(max({m}) AS DOUBLE)"


def _group_sql(r: Rule) -> str:
    # no grouping keys ⇒ bare ruleId group (reference PartitionEngine.java:
    # 72-81 appends nothing; mirror of fanout.py group_id).
    if r.grouping_keys:
        gexpr = " || '_' || ".join(TAG_SQL[k] for k in r.grouping_keys)
        return f"concat('{r.rule_id}_', {gexpr})"
    return f"'{r.rule_id}'"


def _rule_sql(r: Rule, events: str = "events") -> str:
    group_id = _group_sql(r)
    val = _value_sql(r)
    having = f"{val} {r.limit_op} CAST('{r.limit}' AS DOUBLE)"
    head = (
        f"SELECT CAST({r.rule_id} AS INTEGER) AS rule_id, {group_id} AS group_id"
    )
    # floor(x·1e4 + 0.5)/1e4, NOT round(x, 4): DuckDB's round works on the
    # raw binary double while Spark's F.round re-parses the shortest repr —
    # they disagree within one ulp of a half. The engine rounds agg_value
    # with this exact double formula everywhere (operators.windows.
    # round_half_up), so the oracle must too.
    tail = (
        f"'{r.agg_type}' AS agg_type, "
        f"floor(({val}) * 10000.0 + 0.5) / 10000.0 AS agg_value"
    )
    if r.window_type == "tumbling":
        size = r.window_minutes * 60
        ws = _fmul(TS_S, size)
        return (
            f"{head}, {ws} AS window_start, {ws} + {size} AS window_end, {tail} "
            f"FROM {events} GROUP BY group_id, window_start HAVING {having}"
        )
    if r.window_type == "sliding":
        size = r.window_minutes * 60
        slide = r.window_slide_minutes * 60
        return (
            f"{head}, w.window_start AS window_start, w.window_start + {size} AS window_end, {tail} "
            f"FROM (SELECT *, {TS_S} AS ts_s FROM {events}) e, "
            f"LATERAL (SELECT unnest(generate_series({_fmul('e.ts_s - ' + str(size), slide)} + {slide}, "
            f"{_fmul('e.ts_s', slide)}, {slide})) AS window_start) w "
            f"GROUP BY group_id, w.window_start HAVING {having}"
        )
    if r.window_type == "session":
        # gap-based sessions (engine extension): classic islands build —
        # a session break is a spacing STRICTLY greater than gap seconds
        # since the previous event of the group (Spark merges an event
        # landing exactly on the previous session's end — verified by
        # tests/test_windows.py::test_session_merge_and_exact_gap_boundary);
        # cumulative break count numbers the islands. Session bounds are
        # [min(ts), max(ts) + gap) — Spark session_window's semantics.
        gap = r.window_minutes * 60
        sess_head = f"SELECT CAST({r.rule_id} AS INTEGER) AS rule_id, grp AS group_id"
        return (
            f"{sess_head}, min(ts_s) AS window_start, max(ts_s) + {gap} AS window_end, {tail} "
            f"FROM (SELECT *, sum(brk) OVER (PARTITION BY grp ORDER BY ts_s "
            f"ROWS UNBOUNDED PRECEDING) AS sess FROM ("
            f"SELECT *, CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY grp ORDER BY ts_s) "
            f"> {gap} THEN 1 ELSE 0 END AS brk FROM "
            f"(SELECT *, {TS_S} AS ts_s, {_group_sql(r)} AS grp FROM {events}) b) i) s "
            f"GROUP BY grp, sess HAVING {having}"
        )
    # global window: one unbounded window per group (AllWindowAssigner.java:23-30)
    return (
        f"{head}, CAST(NULL AS BIGINT) AS window_start, CAST(NULL AS BIGINT) AS window_end, {tail} "
        f"FROM {events} GROUP BY group_id HAVING {having}"
    )


def cep_oracle_sql(rules: list[Rule], events: str = "events") -> str:
    """UNION ALL of per-rule SQL over the compacted ACTIVE rule set.

    (The Spark engine evaluates all rules in one pass; SQL has no
    rules-as-data construct, so the oracle expands per rule.)
    """
    active = _compact(rules)
    if not active:
        raise ValueError("no active rules")
    return "\nUNION ALL\n".join(_rule_sql(r, events) for r in active)
