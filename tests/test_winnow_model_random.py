"""Independent-model check for dedup_substring: seeded random corpora
with planted duplicate structure are evaluated by BOTH the Spark engine
and a from-scratch pure-Python winnowing implementation (same contract:
\\s+ tokenization of lower(trim(text)), md5 k-gram hashes, window-min
selection with the short-doc single-window rule, distinct fingerprints,
over-common cull, min-shared pair threshold, containment rounding). Any
divergence in the HOF/explode/join plan shows up as a set mismatch —
the same independent-evaluator pattern test_cep_model_random uses for
the CEP engine."""

from __future__ import annotations

import hashlib
import random
import re

from flink_cep_task_spark.operators.dedup import (
    WINNOW_K,
    WINNOW_MAX_DOCS_PER_FP,
    WINNOW_MIN_SHARED,
    WINNOW_W,
    dedup_substring,
)


def _model_fps(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> set[str]:
    toks = re.split(r"\s+", text.strip().lower())
    if len(toks) < k:
        return set()
    kgrams = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(len(toks) - k + 1)
    ]
    m = len(kgrams)
    if m < w:
        return {min(kgrams)}
    return {min(kgrams[j : j + w]) for j in range(m - w + 1)}


def _model_pairs(docs: dict[int, str]) -> dict[tuple[int, int], tuple]:
    fps = {d: _model_fps(t) for d, t in docs.items()}
    freq: dict[str, int] = {}
    for s in fps.values():
        for f in s:
            freq[f] = freq.get(f, 0) + 1
    out = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = {
                f
                for f in fps[a] & fps[b]
                if freq[f] <= WINNOW_MAX_DOCS_PER_FP
            }
            if len(shared) >= WINNOW_MIN_SHARED:
                cont = round(len(shared) / min(len(fps[a]), len(fps[b])), 6)
                out[(a, b)] = (len(shared), len(fps[a]), len(fps[b]), cont)
    return out


def test_winnowing_engine_matches_independent_model(spark):
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(40)]  # small vocab -> colliding k-grams
    docs: dict[int, str] = {}
    for d in range(50):
        docs[d] = " ".join(
            rng.choice(vocab) for _ in range(rng.randint(3, 60))
        )
    # planted structure: shifted copies, embedded passages, short dups
    base = docs[0]
    docs[100] = "padtok " + base                       # one-word shift
    docs[101] = base + " extratok moretok"             # suffix growth
    phrase = " ".join(rng.choice(vocab) for _ in range(WINNOW_K + WINNOW_W))
    docs[102] = "x1 x2 x3 " + phrase + " y1 y2"
    docs[103] = phrase + " z1 z2 z3 z4 z5"

    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], ["doc_id", "text"]
    )
    got = {
        (r.doc_a, r.doc_b): (r.shared_fps, r.n_fps_a, r.n_fps_b, r.containment)
        for r in dedup_substring(df).collect()
    }
    want = _model_pairs(docs)
    assert got == want, (
        f"engine-only: {set(got) - set(want)}; model-only: {set(want) - set(got)}; "
        f"value diffs: { {k: (got[k], want[k]) for k in set(got) & set(want) if got[k] != want[k]} }"
    )
    assert want, "model produced no pairs — test corpus is vacuous"
