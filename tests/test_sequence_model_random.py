"""Randomized model sweeps for the sequence operators and BPE.

The fixed adversarial cases live in tests/test_sequence_ops.py and
tests/test_bpe.py; these sweeps drive the same operators with seeded
random inputs — heavy timestamp ties, duplicate users, skewed type
mixes, random word/frequency tables — against independent brute-force
models, the randomized-coverage pattern the winnowing engine uses
(tests/test_winnow_model_random.py)."""

from __future__ import annotations

import collections
import datetime

import numpy as np
import pytest

from flink_cep_task_spark.operators.text import BPE_N_MERGES, bpe_merges_report
from flink_cep_task_spark.plans.analytics import (
    event_transitions,
    funnel_single_pass,
)

TYPES = ["view", "click", "purchase", "error", "signup"]
BASE = 1_700_000_000


def _random_events(seed: int):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(120, 260))
    rows = []
    for eid in range(1, n + 1):
        uid = int(rng.integers(1, 12))  # few users -> long per-user chains
        # coarse time grid -> frequent exact-second ties
        off = int(rng.integers(0, 40)) * 10
        t = TYPES[int(rng.integers(0, len(TYPES)))]
        rows.append((eid, off, uid, t))
    return rows


def _write(spark, rows, d):
    data = [
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
        for eid, off, uid, t in rows
    ]
    spark.createDataFrame(
        data,
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    ).coalesce(2).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def _model_funnel(rows):
    by_user: dict[int, list] = {}
    for eid, off, uid, t in rows:
        by_user.setdefault(uid, []).append((BASE + off, eid, t))
    out = {}
    for uid, evs in by_user.items():
        views = [ts for ts, _, t in evs if t == "view"]
        t1 = min(views) if views else None
        clicks = [
            ts for ts, _, t in evs if t == "click" and t1 is not None and ts > t1
        ]
        t2 = min(clicks) if clicks else None
        purch = [
            ts for ts, _, t in evs if t == "purchase" and t2 is not None and ts > t2
        ]
        t3 = min(purch) if purch else None
        out[uid] = (t1, t2, t3, (t1 is not None) + (t2 is not None) + (t3 is not None))
    return out


def _model_transitions(rows):
    by_user: dict[int, list] = {}
    for eid, off, uid, t in rows:
        by_user.setdefault(uid, []).append((BASE + off, eid, t))
    c: collections.Counter = collections.Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            c[(a, b)] += 1
    return dict(c)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_funnel_and_transitions_match_model_random(spark, tmp_path, seed):
    rows = _random_events(seed)
    sf = _write(spark, rows, tmp_path)
    got_f = {
        r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"], r["stage"])
        for r in funnel_single_pass(spark, sf).collect()
    }
    assert got_f == _model_funnel(rows)
    got_t = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in event_transitions(spark, sf).collect()
    }
    assert got_t == _model_transitions(rows)


# the ONE reference BPE implementation — shared with the fixed-case
# suite so both assert against the same model
from tests.test_bpe import _model as _bpe_model  # noqa: E402


@pytest.mark.parametrize("seed", [0, 1])
def test_bpe_matches_model_random(spark, seed):
    rng = np.random.default_rng(seed)
    alphabet = list("abcdefg")  # small alphabet -> dense ties + runs
    vocab = {}
    for _ in range(25):
        w = "".join(rng.choice(alphabet, size=int(rng.integers(2, 9))))
        vocab[w] = vocab.get(w, 0) + int(rng.integers(1, 9))
    rows, doc_id = [], 0
    for w, f in vocab.items():
        for _ in range(f):
            rows.append((doc_id, w))
            doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = [
        (r["rank"], r["lft"], r["rgt"], r["merged"], r["pair_count"])
        for r in bpe_merges_report(docs).orderBy("rank").collect()
    ]
    assert got == _bpe_model(vocab), f"seed {seed}: got {got}"
