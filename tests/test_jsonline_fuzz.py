"""Hypothesis fuzz of the JSON-line metric parser against a pure-python
reference model of the documented contract (CEPTaskRunner.java:59-72 +
divergences Q7): arbitrary byte soup must never crash the plan (ANSI mode
try_cast discipline), and for structurally-valid JSON objects the parsed
(event_time, tags, metrics) must match the model exactly."""

from __future__ import annotations

import json
import math
from decimal import Decimal, ROUND_HALF_UP

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_cep_task_spark.sources.jsonline import parse_metric_lines

# keys across the three roles the parser distinguishes
_keys = st.sampled_from(
    ["t_g", "t_user", "eventTime", "m", "value", "host_t_name", "t_", "k2"]
)
# JSON floats are excluded: Spark's from_json(map<string,string>) formats
# a JSON number through Java's Double.toString ("1.0E7"), while python
# json keeps "10000000.0" — engine repr trivia, not ingest contract.
# Decimal measures are covered via numeric STRINGS, which both engines
# pass through verbatim before the DECIMAL cast.
_num_str = st.from_regex(r"-?[0-9]{1,10}\.[0-9]{1,2}", fullmatch=True)
# printable-ASCII text only: python's int()/Decimal() accept underscores
# ("1_0") and non-ASCII unicode digits ("٥") that Spark's casts reject —
# that's cast-implementation trivia, not ingest contract; the model guard
# below rejects underscores for the same reason
_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=8
)
_scalars = st.one_of(
    st.integers(min_value=-(10**12), max_value=10**12),
    _num_str,
    _ascii_text,
    st.none(),
    st.booleans(),
)
_doc = st.dictionaries(_keys, _scalars, max_size=6)
_garbage = st.text(max_size=30)
_line = st.one_of(_doc.map(json.dumps), _garbage)


def _model(line: str):
    """The contract: JSON object of string->scalar; t_-prefixed keys are
    string tags; 'eventTime' (integer millis) is the timestamp; every
    other key is a DECIMAL(18,2) measure when its STRING form casts;
    anything unparseable is dropped. Mirrors from_json(map<string,string>)
    semantics: scalars are read back as their JSON-ish string forms."""
    try:
        doc = json.loads(line)
    except ValueError:
        return None
    if not isinstance(doc, dict) or not doc:
        # from_json yields null for non-objects; an EMPTY object parses to
        # an empty map whose eventTime lookup is null → row dropped too
        return None

    def as_str(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            # Spark's map<string,string> read of a JSON float keeps the
            # literal text; json.dumps round-trips the same repr
            return json.dumps(v)
        return str(v)

    m = {k: as_str(v) for k, v in doc.items()}
    # from_json's map keeps NULL-valued entries, and map_filter only looks
    # at keys — a null tag survives (and counts toward the non-empty test)
    tags = {k: v for k, v in m.items() if k.startswith("t_")}
    metrics = {}
    for k, v in m.items():
        if k.startswith("t_") or k == "eventTime" or v is None:
            continue
        if "_" in v:
            continue  # python Decimal accepts 1_0; Spark's cast does not
        try:
            d = Decimal(v)
            if not d.is_finite():
                continue
            d = d.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
            if abs(d) >= Decimal(10) ** 16:
                continue  # out of DECIMAL(18,2) range → cast null
        except ArithmeticError:
            continue
        metrics[k] = d
    et = m.get("eventTime")
    try:
        ts_ms = (
            int(et)
            if et is not None and "." not in et and "_" not in et
            else None
        )
    except ValueError:
        ts_ms = None
    if ts_ms is None:
        return None  # parser drops rows with no valid event time
    if not tags and not metrics:
        return None  # payload-free rows are dropped (nothing to evaluate)
    return ts_ms, tags, metrics


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(lines=st.lists(_line, min_size=1, max_size=12))
def test_parser_matches_model_and_never_crashes(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    rows = parse_metric_lines(df).collect()
    expected = [m for m in map(_model, lines) if m is not None]
    got = [
        (
            # round, not int(): timestamp()*1000 is float and a negative
            # sub-second epoch like -63 ms lands at -62.999…, which int()
            # truncates toward zero to -62 (hypothesis found this)
            round(r.event_time.timestamp() * 1000)
            if r.event_time is not None
            else None,
            dict(r.tags),
            {k: v for k, v in dict(r.metrics).items()},
        )
        for r in rows
    ]
    # compare as multisets (row order is not part of the contract). Tag
    # values must normalize through a TOTAL order: a null-valued tag
    # ({"t_g": null} — kept by from_json's map and by the model alike)
    # sorting against another row's string value for the same key raised
    # TypeError(None < str) here — hypothesis found the comparator bug,
    # not an engine divergence (parser and model agreed on the rows).
    tag_key = lambda kv: (kv[0], kv[1] is not None, kv[1] or "")
    norm = lambda trip: (
        trip[0],
        tuple(sorted(trip[1].items(), key=tag_key)),
        tuple(sorted((k, str(v)) for k, v in trip[2].items())),
    )
    key = lambda t: (t[0] is not None, t[0] or 0,
                     tuple(map(tag_key, t[1])), t[2])
    assert sorted(map(norm, got), key=key) == sorted(map(norm, expected), key=key)
