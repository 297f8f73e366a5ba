"""Wire-format rule ingestion (P3/P4): the Python parser, the DataFrame
parser, and their agreement — pinned against the reference's lenient
fastjson semantics (CEPTaskRunner.java:54-56, Rule.java:99-107)."""

from __future__ import annotations

import pytest

from flink_cep_task_spark.plans.cep_queries import WIRE_RULE_LINES
from flink_cep_task_spark.rules import (
    Rule,
    compact_rules,
    parse_rule_lines,
    parse_rule_lines_df,
)


def test_python_parser_semantics():
    rules = parse_rule_lines(WIRE_RULE_LINES)
    by_id_seq = {(r.rule_id, r.seq): r for r in rules}
    # bad JSON, missing windowMinutes, bad operator symbol → dropped
    assert len(rules) == 5
    assert {r.rule_id for r in rules} == {21, 22, 23, 26}
    # bare-string groupingKeyNames → singleton list
    assert by_id_seq[(22, 2)].grouping_keys == ("t_event_type",)
    # symbolic operator preserved
    assert by_id_seq[(22, 2)].limit_op == "<="
    # unknown windowType ⇒ global (CEPEngine.java:75-81)
    assert by_id_seq[(23, 3)].window_type == "global"
    # explicit seq from the doc; limit normalized to the internal
    # DECIMAL(18,4) form the DataFrame twin produces
    assert (21, 6) in by_id_seq and by_id_seq[(21, 6)].limit == "500.0000"
    # session is first-class on the wire (engine extension keyword)
    assert by_id_seq[(26, 7)].window_type == "session"
    assert by_id_seq[(26, 7)].window_minutes == 180


def test_from_wire_defaults_and_delete():
    r = Rule.from_wire({"ruleId": 9})
    assert r.window_type == "global" and r.grouping_keys == ()
    assert r.agg_type == "SUM" and r.limit_op == ">"
    d = Rule.from_wire({"ruleId": 9, "ruleState": "DELETE"})
    assert d.rule_state == "DELETE"
    with pytest.raises(ValueError):
        Rule.from_wire({"ruleId": 9, "limitOperatorType": "~"})
    with pytest.raises(ValueError):
        Rule.from_wire({"ruleId": 9, "windowType": "tumbling"})  # no size


def test_df_parser_agrees_with_python(spark):
    """Both parsers produce the same rule rows for the same wire lines."""
    lines_df = spark.createDataFrame([(l,) for l in WIRE_RULE_LINES], ["value"])
    df_rules = {
        (r.rule_id, r.seq, r.rule_state, r.window_type, r.window_minutes,
         r.window_slide_minutes, tuple(r.grouping_keys), r.agg_type,
         r.agg_field, r.limit_op, float(r.limit))
        for r in parse_rule_lines_df(lines_df).collect()
    }
    py_rules = {
        (r.rule_id, r.seq, r.rule_state, r.window_type, r.window_minutes,
         r.window_slide_minutes, tuple(r.grouping_keys), r.agg_type,
         r.agg_field, r.limit_op, float(r.limit))
        for r in parse_rule_lines(WIRE_RULE_LINES)
    }
    assert df_rules == py_rules


def test_df_parser_compaction(spark):
    lines = WIRE_RULE_LINES + ['{"ruleId": 22, "ruleState": "DELETE", "seq": 8}']
    lines_df = spark.createDataFrame([(l,) for l in lines], ["value"])
    compacted = compact_rules(parse_rule_lines_df(lines_df)).collect()
    assert {r.rule_id for r in compacted} == {21, 23, 26}
    lim = {r.rule_id: float(r.limit) for r in compacted}
    assert lim[21] == 500.0  # seq-6 upsert won


def test_session_is_first_class_on_the_wire(spark):
    """'session' (this engine's extension keyword, never emitted by the
    reference) parses as a session rule in BOTH parser twins; a session
    doc missing windowMinutes is invalid and drops; truly-unknown window
    types still coerce to global (CEPEngine.java:75-81)."""
    from flink_cep_task_spark.rules import Rule, parse_rule_lines, parse_rule_lines_df

    lines = [
        '{"ruleId": 1, "windowType": "session", "windowMinutes": 3,'
        ' "groupingKeyNames": ["t_g"], "aggregatorFunctionType": "SUM",'
        ' "aggregateFieldName": "m", "limitOperatorType": ">", "limit": 0}',
        '{"ruleId": 2, "windowType": "session",'
        ' "aggregatorFunctionType": "SUM"}',          # no gap → dropped
        '{"ruleId": 3, "windowType": "lifetime",'
        ' "aggregatorFunctionType": "MAX", "aggregateFieldName": "m",'
        ' "limitOperatorType": ">=", "limit": 1}',    # unknown → global
    ]
    py = {r.rule_id: r for r in parse_rule_lines(lines)}
    assert py[1].window_type == "session" and py[1].window_minutes == 3
    assert 2 not in py
    assert py[3].window_type == "global"

    df = {
        r["rule_id"]: r
        for r in parse_rule_lines_df(
            spark.createDataFrame([(ln,) for ln in lines], ["value"])
        ).collect()
    }
    assert df[1]["window_type"] == "session" and df[1]["window_minutes"] == 3
    assert 2 not in df
    assert df[3]["window_type"] == "global"
