"""Property-style exactness checks for the set-similarity join: the
positional prefix filter must find EVERY pair with Jaccard ≥ τ — including
pairs dominated by hot (high-df) shingles, the case the filter prunes
hardest on."""

from __future__ import annotations

import random
import re

from flink_cep_task_spark.operators.dedup import (
    JACCARD_TAU,
    SHINGLE,
    dedup_ngram_jaccard,
)


def _shingle_set(text: str) -> set[str]:
    toks = re.split(r"\s+", text.strip().lower())
    if len(toks) < SHINGLE:
        return set()
    return {" ".join(toks[k : k + SHINGLE]) for k in range(len(toks) - SHINGLE + 1)}


def test_prefix_filter_finds_all_pairs(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(25)]  # tiny vocab ⇒ very hot shingles
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 30)))
        for _ in range(60)
    ]
    # inject guaranteed near-duplicates (one-token mutations)
    for i in range(0, 12, 2):
        toks = docs[i].split()
        if len(toks) > 6:
            toks[3] = "unique_zz"
        docs.append(" ".join(toks))

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {(r.doc_a, r.doc_b): r.jaccard for r in dedup_ngram_jaccard(df).collect()}

    sets = {i: _shingle_set(t) for i, t in enumerate(docs)}
    exp = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= JACCARD_TAU:
                exp[(a, b)] = j

    assert set(got) == set(exp), (
        f"missing={set(exp) - set(got)} extra={set(got) - set(exp)}"
    )
    for pair, j in exp.items():
        assert abs(got[pair] - j) < 1e-6
    assert len(exp) >= 6  # the injected near-dups actually exercised the path
