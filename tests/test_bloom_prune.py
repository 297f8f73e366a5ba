"""Functional checks for bloom-pruned incremental dedup.

The gate already hash-matches dedup_bloom_prune against its DuckDB
oracle on the fixtures; these tests cover what the fixtures cannot:
exactness under forced bloom false positives (a tiny bitmap makes
collisions certain), the empty-incoming edge (the bloom is an empty
map — every corpus row must be pruned, not crash), and normalization
equivalence (punctuation-variant duplicates still match)."""

from __future__ import annotations

import pytest

import flink_cep_task_spark.operators.dedup as D


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, source STRING"
    )


def _expected_plain(rows, incoming_source="src0"):
    import hashlib
    import re

    def key(text):
        if text is None:
            return "\x00null"
        t = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", text.strip().lower()))
        return t.strip()

    corp = {}
    for doc_id, text, src in rows:
        if src != incoming_source:
            k = key(text)
            corp[k] = min(corp.get(k, doc_id), doc_id)
    out = {}
    for doc_id, text, src in rows:
        if src == incoming_source:
            m = corp.get(key(text))
            out[doc_id] = (m, m is not None)
    return out


def _run(spark, rows):
    got = {
        r["doc_id"]: (r["corpus_match_id"], r["is_corpus_dup"])
        for r in D.dedup_bloom_prune(_docs(spark, rows)).collect()
    }
    assert got == _expected_plain(rows)


def test_bloom_prune_exact_under_forced_false_positives(spark, monkeypatch):
    # shrink the bitmap to 64 bits: the bloom is built over the INCOMING
    # keys, so 40 incoming keys x 5 hashes saturate it and every corpus
    # row — matching or not — becomes a bloom positive. The exact verify
    # join must still produce the plain left-join answer (false
    # positives survive the bloom but find no incoming key to match)
    monkeypatch.setattr(D, "BLOOM_BITS", 64)
    rows = [(100 + i, f"incoming text {i}", "src0") for i in range(40)]
    rows += [
        (1, "incoming text 7", "src1"),     # true corpus dup of doc 107
        (2, "Incoming, text; 9!", "src1"),  # dup of doc 109 via normalization
        (3, "corpus only body a", "src1"),  # bloom false positive, no match
        (4, "corpus only body b", "src2"),
        (5, "corpus only body c", "src2"),
    ]
    _run(spark, rows)


def test_bloom_prune_empty_incoming(spark):
    # no incoming docs: the bloom build aggregates zero rows into an
    # empty map; every corpus probe must miss and the output is empty
    rows = [(i, f"text {i}", "src1") for i in range(5)]
    out = D.dedup_bloom_prune(_docs(spark, rows)).collect()
    assert out == []


def test_bloom_prune_batch_internal_dups_and_nulls(spark):
    # two incoming docs sharing one corpus key both report the same
    # corpus canonical; NULL text keys to the sentinel and matches a
    # NULL-text corpus doc
    rows = [
        (1, "shared body", "src1"),
        (2, None, "src1"),
        (10, "shared  body", "src0"),
        (11, "SHARED body!", "src0"),
        (12, None, "src0"),
    ]
    _run(spark, rows)


def test_bloom_prune_matches_oracle_shape_on_min_ids(spark):
    # corpus_match_id is the MIN corpus doc id of the key cluster even
    # when a larger corpus id appears first in the data
    rows = [
        (50, "dup body", "src2"),
        (3, "dup body", "src1"),
        (200, "dup body", "src0"),
    ]
    got = {r["doc_id"]: r["corpus_match_id"]
           for r in D.dedup_bloom_prune(_docs(spark, rows)).collect()}
    assert got == {200: 3}
