"""Two-phase replay parity: mid-replay rule upsert (Q6 made checkable)
and the watermark late-data policy (T2/T3's principled replacement made
explicit). The gated queries run these at fixed sf0.01 limits; here the
same machinery runs at sf0.001-sized limits so every assertion is
non-vacuous at the test fixture scale."""

from __future__ import annotations

import pytest

from flink_cep_task_spark.plans.cep_queries import (
    IN_DELAY_STRAGGLER,
    LATE_STRAGGLERS,
    _daily_sum_rule_doc,
    _late_data_oracle_sql,
    _rule_update_oracle_sql,
    _run_two_phase_live,
)
from tests.conftest import SF_DIR, assert_parity


def test_rule_upsert_gates_open_windows_with_new_limit(spark, ddb):
    # v1=300 / v2=400 straddle the sf0.001 daily-sum median (~301), so
    # both config regimes gate non-trivially
    got = _run_two_phase_live(
        spark, SF_DIR,
        _daily_sum_rule_doc(8, "300"),
        rule_doc_v2=_daily_sum_rule_doc(8, "400"),
    )
    sql = _rule_update_oracle_sql().replace("'2500'", "'300'").replace(
        "'3500'", "'400'"
    )
    assert_parity(got, ddb, sql)
    # the mixed gating must differ from EITHER static config — otherwise
    # the upsert was a no-op and the parity proves nothing
    n = got.count()
    pure_v1 = sql.replace("ELSE CAST('400'", "ELSE CAST('300'")
    pure_v2 = sql.replace("THEN CAST('300'", "THEN CAST('400'")
    n1 = ddb.execute(pure_v1).df().shape[0]
    n2 = ddb.execute(pure_v2).df().shape[0]
    assert n != n1 and n != n2, (
        f"upsert vacuous at this SF: mixed={n} pure_v1={n1} pure_v2={n2}"
    )


def test_late_data_policy_drops_and_keeps_exactly(spark, ddb):
    # limit 10: essentially every (type, day) window emits, so the
    # straggler windows are all visible for direct value assertions
    got = _run_two_phase_live(
        spark, SF_DIR,
        _daily_sum_rule_doc(9, "10"),
        extra_batch2_rows=LATE_STRAGGLERS + [IN_DELAY_STRAGGLER],
    )
    sql = _late_data_oracle_sql().replace(
        "CAST('2500' AS DOUBLE)", "CAST('10' AS DOUBLE)"
    )
    assert_parity(got, ddb, sql)

    rows = {
        (r.group_id, r.window_start): r.agg_value for r in got.collect()
    }

    def base_sum(etype: str, ws: int) -> float:
        v = ddb.execute(
            "SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) "
            "FROM events WHERE event_type = ? AND "
            f"CAST(floor(epoch(ts)) AS BIGINT) - "
            f"((CAST(floor(epoch(ts)) AS BIGINT) % 86400) + 86400) % 86400 = {ws}",
            [etype],
        ).fetchone()[0]
        return float(v or 0.0)

    # one straggler INSIDE the watermark delay IS counted: its window's
    # value is the base sum PLUS the injected 77.77
    etype, ts_s, val = IN_DELAY_STRAGGLER
    ws = ts_s - ts_s % 86400
    assert rows[(f"9_{etype}", ws)] == pytest.approx(
        base_sum(etype, ws) + float(val), abs=1e-4
    )

    # the beyond-watermark stragglers are dropped: their windows carry
    # EXACTLY the base sum (a leak of 99999.99/88888.88 is unmissable)
    for etype, ts_s, val in LATE_STRAGGLERS:
        ws = ts_s - ts_s % 86400
        assert rows[(f"9_{etype}", ws)] == pytest.approx(
            base_sum(etype, ws), abs=1e-4
        )


def test_rollup_partials_idempotent_under_batch_retry(spark, tmp_path):
    """foreachBatch is at-least-once: replaying batch N must not
    double-count. The per-bid overwrite makes the write idempotent —
    the merged store after a simulated retry equals the single-write
    merge exactly."""
    from pyspark.sql import functions as F

    from flink_cep_task_spark.plans.cep_queries import _append_rollup_partials
    from flink_cep_task_spark.sources.tables import events_to_metrics, load_table

    batch = events_to_metrics(load_table(spark, SF_DIR, "events").limit(200))
    store = str(tmp_path / "partials")

    def merged():
        return sorted(
            (r.event_type, r.n_events, r.n_vals, str(r.s))
            for r in spark.read.parquet(store)
            .groupBy("event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("n_vals").alias("n_vals"),
                F.sum("sum_value").alias("s"),
            )
            .collect()
        )

    _append_rollup_partials(batch, store, 0)
    once = merged()
    _append_rollup_partials(batch, store, 0)  # the retry
    assert merged() == once
    _append_rollup_partials(batch, store, 1)  # a REAL new batch does add
    assert merged() != once
