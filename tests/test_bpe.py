"""Model checks for BPE merge induction.

bpe_merges_report is compared against a direct Python implementation of
word-frequency BPE (the HuggingFace-trainer formulation: count adjacent
symbol pairs weighted by word frequency, merge the argmax with
lexicographic tie-break, repeat) on corpora engineered to exercise the
subtle cases: greedy left-to-right application inside repeated runs
('ababab'), merges OF merged symbols across rounds, and tie-breaking."""

from __future__ import annotations

import collections

import pytest

from flink_cep_task_spark.operators.text import BPE_N_MERGES, bpe_merges_report


def _model(word_freqs: dict[str, int]):
    segs = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(1, BPE_N_MERGES + 1):
        counts: collections.Counter = collections.Counter()
        for w, f in word_freqs.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        # "count desc, then (lft, rgt) lexicographically asc"
        top = max(counts.values())
        lft, rgt = min(p for p, c in counts.items() if c == top)
        merges.append((rank, lft, rgt, lft + rgt, top))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lft and s[i + 1] == rgt:
                    out.append(lft + rgt)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def _run(spark, word_freqs: dict[str, int]):
    rows = []
    doc_id = 0
    for w, f in word_freqs.items():
        for _ in range(f):
            rows.append((doc_id, w))
            doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = [
        (r["rank"], r["lft"], r["rgt"], r["merged"], r["pair_count"])
        for r in bpe_merges_report(docs).orderBy("rank").collect()
    ]
    assert got == _model(word_freqs), f"got {got}\nwant {_model(word_freqs)}"


def test_bpe_greedy_runs_and_chained_merges(spark):
    # 'ababab': greedy left-to-right gives (ab)(ab)(ab) — 3 'ab' pairs
    # per word, and later rounds must merge MERGED symbols (ab+ab)
    _run(spark, {"ababab": 10, "abab": 5, "zq": 1})


def test_bpe_tie_break_lexicographic(spark):
    # 'cd' and 'ce' tie on count — (c, d) must win lexicographically
    _run(spark, {"cd": 7, "ce": 7, "xy": 3})


def test_bpe_exhausted_vocabulary(spark):
    # two-char words fully merge in round 1+2; later rounds have no
    # pairs left and the report must STOP, not crash or emit nulls
    _run(spark, {"ab": 3, "cd": 2})


def test_bpe_matches_model_on_mixed_corpus(spark):
    _run(
        spark,
        {
            "lower": 9, "slower": 7, "lowest": 4, "newer": 6, "wider": 3,
            "new": 11, "widest": 2, "low": 8,
        },
    )
