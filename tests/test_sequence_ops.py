"""Model checks for the event-sequence operators.

funnel_single_pass's cascade claim — the running-min formulation equals
the global "first view, first click strictly after it, first purchase
strictly after that" semantics — is checked against a brute-force
Python model on adversarial orderings (ties, out-of-order event_ids,
stalled funnels), plus driver-style parity so the oracle SQL encodes
the same semantics. event_transitions is checked against a bigram
model over the same composite order."""

from __future__ import annotations

import datetime

import duckdb
import pytest

from flink_cep_task_spark.plans.analytics import (
    EVENT_TRANSITIONS_SQL,
    FUNNEL_SINGLE_PASS_SQL,
    event_transitions,
    funnel_single_pass,
)
from tests.conftest import assert_parity

BASE = 1_700_000_000

# (event_id, ts_off_s, user_id, event_type) — adversarial sequencing:
EVENTS = [
    # user 1: clean view -> click -> purchase
    (1, 0, 1, "view"),
    (2, 10, 1, "click"),
    (3, 20, 1, "purchase"),
    # user 2: click BEFORE any view never qualifies; the later click does
    (4, 0, 2, "click"),
    (5, 10, 2, "view"),
    (6, 20, 2, "click"),
    (7, 15, 2, "purchase"),  # before the qualifying click -> stage 2
    # user 3: click at the SAME second as the first view — strictly-after
    # semantics, must not qualify (event_id tiebreak orders view first)
    (8, 0, 3, "view"),
    (9, 0, 3, "click"),
    (10, 50, 3, "purchase"),  # no qualifying click -> purchase can't fire
    # user 4: multiple views — the FIRST one anchors the funnel even
    # though a later view is closer to the click
    (11, 0, 4, "view"),
    (12, 100, 4, "view"),
    (13, 50, 4, "click"),
    (14, 60, 4, "purchase"),
    # user 5: purchase only -> stage 0
    (15, 0, 5, "purchase"),
    # user 6: view only -> stage 1
    (16, 0, 6, "view"),
    # user 7: same-second purchase after click (strict again)
    (17, 0, 7, "view"),
    (18, 10, 7, "click"),
    (19, 10, 7, "purchase"),
]


def _model_funnel():
    by_user: dict[int, list] = {}
    for eid, off, uid, t in EVENTS:
        by_user.setdefault(uid, []).append((BASE + off, eid, t))
    out = {}
    for uid, evs in by_user.items():
        views = [ts for ts, _, t in evs if t == "view"]
        t1 = min(views) if views else None
        clicks = [ts for ts, _, t in evs if t == "click" and t1 is not None and ts > t1]
        t2 = min(clicks) if clicks else None
        purch = [
            ts for ts, _, t in evs if t == "purchase" and t2 is not None and ts > t2
        ]
        t3 = min(purch) if purch else None
        stage = (t1 is not None) + (t2 is not None) + (t3 is not None)
        out[uid] = (t1, t2, t3, stage)
    return out


def _model_transitions():
    import collections

    by_user: dict[int, list] = {}
    for eid, off, uid, t in EVENTS:
        by_user.setdefault(uid, []).append((BASE + off, eid, t))
    c = collections.Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            c[(a, b)] += 1
    return dict(c)


@pytest.fixture(scope="module")
def seq_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("seq_sf")
    rows = [
        (
            eid,
            datetime.datetime.fromtimestamp(
                BASE + off, tz=datetime.timezone.utc
            ).replace(tzinfo=None),
            uid,
            t,
            1.0,
            None,
        )
        for eid, off, uid, t in EVENTS
    ]
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_funnel_single_pass_matches_model(spark, seq_sf_dir):
    got = {
        r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"], r["stage"])
        for r in funnel_single_pass(spark, seq_sf_dir).collect()
    }
    assert got == _model_funnel()
    # spot-check the adversarial users explicitly
    assert got[2][3] == 2  # pre-view click ignored, purchase-before-click stalls
    assert got[3] == (BASE, None, None, 1)  # same-second click not strictly after
    assert got[4][1] == BASE + 50  # FIRST view anchors, later view irrelevant
    assert got[7][3] == 2  # same-second purchase not strictly after click


def test_funnel_single_pass_oracle_parity(spark, seq_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{seq_sf_dir}/events.parquet/*.parquet')"
    )
    assert_parity(funnel_single_pass(spark, seq_sf_dir), con, FUNNEL_SINGLE_PASS_SQL)
    con.close()


def test_event_transitions_matches_model(spark, seq_sf_dir):
    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in event_transitions(spark, seq_sf_dir).collect()
    }
    assert got == _model_transitions()


def test_event_transitions_oracle_parity(spark, seq_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{seq_sf_dir}/events.parquet/*.parquet')"
    )
    assert_parity(event_transitions(spark, seq_sf_dir), con, EVENT_TRANSITIONS_SQL)
    con.close()


def test_event_transitions_shares_sum_to_one(spark, seq_sf_dir):
    import collections

    shares = collections.defaultdict(float)
    for r in event_transitions(spark, seq_sf_dir).collect():
        shares[r["from_type"]] += r["share"]
    for ft, s in shares.items():
        assert abs(s - 1.0) < 1e-4, (ft, s)
