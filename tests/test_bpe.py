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


# --- bpe_apply_report: encoding against a direct Python BPE encoder ------


def _model_encode(text: str, merges) -> list[str]:
    """Reference encoder: per word, apply each learned merge in rank
    order, greedy left-to-right non-overlapping — standard BPE
    application."""
    import re

    out = []
    for w in text.lower().strip().split():
        if not re.fullmatch("[a-z0-9]+", w):
            continue
        s = list(w)
        for _rank, lft, rgt, _m, _c in merges:
            nxt, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lft and s[i + 1] == rgt:
                    nxt.append(lft + rgt)
                    i += 2
                else:
                    nxt.append(s[i])
                    i += 1
            s = nxt
        out.extend(s)
    return out


def _run_apply(spark, docs_rows):
    from flink_cep_task_spark.operators.text import bpe_apply_report

    docs = spark.createDataFrame(docs_rows, "doc_id LONG, text STRING")
    word_freqs: collections.Counter = collections.Counter()
    import re

    for _id, text in docs_rows:
        for w in text.lower().strip().split():
            if re.fullmatch("[a-z0-9]+", w):
                word_freqs[w] += 1
    merges = _model(dict(word_freqs))
    got = {r["doc_id"]: r.asDict() for r in bpe_apply_report(docs).collect()}
    assert set(got) == {d for d, _ in docs_rows}
    for doc_id, text in docs_rows:
        toks = _model_encode(text, merges)
        words = [
            w for w in text.lower().strip().split()
            if re.fullmatch("[a-z0-9]+", w)
        ]
        r = got[doc_id]
        assert r["n_words"] == len(words), (doc_id, r)
        assert r["n_chars"] == sum(len(w) for w in words), (doc_id, r)
        assert r["n_bpe_tokens"] == len(toks), (
            f"doc {doc_id}: engine {r['n_bpe_tokens']} tokens, "
            f"model {len(toks)} ({toks})"
        )
        if words:
            assert r["fertility"] == round(len(toks) / len(words), 6)


def test_bpe_apply_matches_model_encoder(spark):
    _run_apply(
        spark,
        [
            (0, "the lower slower tower went lower"),
            (1, "ababab abab ab ba"),
            (2, "new newer newest wide wider widest"),
            (3, ""),                     # empty doc -> 0 everywhere
            (4, "!!! ### $%^"),          # no in-vocabulary words
            (5, "lowlow lowlowlow"),     # merged-symbol runs inside words
        ],
    )


def test_bpe_apply_matches_model_on_random_corpus(spark):
    import random

    rng = random.Random(8)
    alphabet = "abc"
    rows = [
        (
            i,
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
                for _ in range(rng.randint(0, 12))
            ),
        )
        for i in range(40)
    ]
    _run_apply(spark, rows)
