"""End-to-end CEP rule evaluation vs. the DuckDB oracle (SURVEY.md §5 (2)).

Every registered CEP query must hash-match its oracle SQL — this mirrors
the driver's CORRECTNESS gate exactly, at sf0.001 for speed.
"""

from __future__ import annotations

import pytest

from flink_cep_task_spark.plans.cep_queries import CEP_QUERIES
from tests.conftest import SF_DIR, assert_parity


@pytest.mark.parametrize("name", sorted(CEP_QUERIES))
def test_cep_query_matches_oracle(spark, ddb, name):
    fn, sql = CEP_QUERIES[name]
    assert sql is not None
    df = fn(spark, SF_DIR)
    assert_parity(df, ddb, sql)


def test_multi_rule_result_nonempty(spark):
    fn, _ = CEP_QUERIES["cep_multi_rule"]
    assert fn(spark, SF_DIR).count() > 0


def test_missing_agg_field_yields_no_rows(spark):
    """A rule aggregating a measure absent from every event: fan-out still
    matches (tag containment only), but all agg inputs are null → null
    aggregate → threshold never passes. No crash, no rows (the engine-side
    analog of the reference's missing-field ZERO, fixed to SQL semantics)."""
    from flink_cep_task_spark.plans.cep import evaluate_rules_on_events
    from flink_cep_task_spark.rules import Rule

    rule = Rule(rule_id=50, window_type="tumbling", window_minutes=1440,
                grouping_keys=("t_event_type",), agg_type="SUM",
                agg_field="no_such_measure", limit_op=">", limit="0")
    assert evaluate_rules_on_events(spark, SF_DIR, [rule]).count() == 0


def test_all_pause_rules_yield_no_rows(spark):
    """PAUSE rules stop matching (Rule.java:65) — an all-PAUSE set fans
    out nothing."""
    from flink_cep_task_spark.plans.cep import evaluate_rules_on_events
    from flink_cep_task_spark.rules import Rule

    rule = Rule(rule_id=51, rule_state="PAUSE", window_type="tumbling",
                window_minutes=1440, grouping_keys=("t_event_type",),
                agg_type="SUM", agg_field="value", limit_op=">", limit="0")
    assert evaluate_rules_on_events(spark, SF_DIR, [rule]).count() == 0


def test_malformed_metric_lines_dropped(spark):
    """Bad JSON / missing eventTime / non-numeric measures drop silently
    (parse-error→null→filter, CEPTaskRunner.java:68-70) — no ANSI-mode
    cast crash."""
    from flink_cep_task_spark.sources.jsonline import parse_metric_lines

    lines = spark.createDataFrame(
        [
            ('{"eventTime": 1700000000000, "t_g": "a", "m": 5}',),
            ("not json at all {",),
            ('{"t_g": "a", "m": 5}',),                      # no eventTime
            ('{"eventTime": "never", "t_g": "a", "m": 5}',),  # bad eventTime
            ('{"eventTime": 1700000000000, "t_g": "b", "m": "NaNish"}',),
        ],
        ["value"],
    )
    rows = parse_metric_lines(lines).collect()
    # row 1 parses fully; row 5 parses with the bad measure dropped from
    # the metrics map (tags keep it alive)
    assert len(rows) == 2
    good = next(r for r in rows if r.tags["t_g"] == "a")
    assert int(good.metrics["m"]) == 5
    bad_measure = next(r for r in rows if r.tags["t_g"] == "b")
    assert "m" not in bad_measure.metrics
