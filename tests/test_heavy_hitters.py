"""Model checks for the exact heavy-hitters operator.

The operator's completeness claim — every token with global frequency
> N / HH_COUNTERS survives the per-partition Misra-Gries candidate pass
and is therefore counted exactly — is checked two ways: against an
independent pandas model on randomized Zipf-ish corpora, and on an
adversarial layout that spreads one heavy token thinly across every
partition inside a sea of partition-local noise (the case a naive
"per-partition top-k" candidate pass gets wrong)."""

from __future__ import annotations

import collections

import numpy as np
import pytest

from flink_cep_task_spark.operators.text import HH_COUNTERS, heavy_hitters_report


def _expected(token_lists: list[list[str]]):
    counts = collections.Counter(t for doc in token_lists for t in doc)
    n = sum(counts.values())
    heavy = {t: c for t, c in counts.items() if c * HH_COUNTERS > n}
    ranked = sorted(heavy.items(), key=lambda kv: (-kv[1], kv[0]))
    return n, {t: (c, i + 1) for i, (t, c) in enumerate(ranked)}


def _run(spark, token_lists: list[list[str]], n_parts: int):
    docs = spark.createDataFrame(
        [(i, " ".join(doc)) for i, doc in enumerate(token_lists)],
        "doc_id LONG, text STRING",
    ).repartition(n_parts)
    got = {
        r["token"]: (r["n_occurrences"], r["rank"])
        for r in heavy_hitters_report(docs).collect()
    }
    n, want = _expected(token_lists)
    assert got == want, f"N={n}: got {got} want {want}"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_heavy_hitters_matches_model_random(spark, seed):
    rng = np.random.default_rng(seed)
    # Zipf-ish vocabulary: a few very hot tokens + a long rare tail, far
    # more distinct tokens than MG counters so reductions actually fire
    vocab = [f"tok{i}" for i in range(4 * HH_COUNTERS)]
    weights = 1.0 / (np.arange(len(vocab)) + 1) ** 1.3
    weights /= weights.sum()
    token_lists = [
        list(rng.choice(vocab, size=rng.integers(20, 120), p=weights))
        for _ in range(80)
    ]
    _run(spark, token_lists, n_parts=7)


def test_heavy_hitters_adversarial_thin_spread(spark):
    # one globally-heavy token at ~1/16 of the stream, never locally
    # dominant: each doc is mostly doc-unique noise tokens, so every
    # partition's MG summary is under constant reduction pressure. The
    # mergeable-MG guarantee (survives iff freq > n_p/HH_COUNTERS in
    # some partition) must still surface it; 1/16 >> 1/HH_COUNTERS.
    docs = []
    for d in range(64):
        noise = [f"noise_{d}_{j}" for j in range(30)]
        docs.append(noise + ["needle"] * 2)
    _run(spark, docs, n_parts=8)


def test_heavy_hitters_empty_and_uniform(spark):
    # a perfectly uniform corpus has NO heavy hitters (every count is
    # exactly N/|vocab| with |vocab| > HH_COUNTERS) — output must be
    # empty, not "top of the candidate list"
    vocab = [f"u{i}" for i in range(2 * HH_COUNTERS)]
    docs = [[vocab[(i * 31 + j) % len(vocab)] for j in range(50)] for i in range(40)]
    _run(spark, docs, n_parts=5)
