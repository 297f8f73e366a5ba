"""Model checks for the NB quality classifier.

nb_doc_scores / quality_nb_classifier are compared against a direct
Python multinomial Naive Bayes (Laplace-smoothed token likelihoods,
log-prior from class doc counts) on synthetic corpora where the right
answer is hand-checkable: tokens exclusive to one class must pull the
log-odds hard toward it, shared tokens must cancel, and the keep gate
(log_odds > 0) must follow. The hard cross-engine float gate is the
DuckDB oracle in the registry; this test pins the MATH."""

from __future__ import annotations

import math

from flink_cep_task_spark.operators.text import (
    nb_doc_scores,
    quality_nb_classifier,
)

DOCS = [
    # (doc_id, text, lang, source) — lang='en' is the positive label
    (0, "alpha alpha beta common", "en", "sA"),
    (1, "alpha beta beta common", "en", "sA"),
    (2, "gamma delta common", "de", "sB"),
    (3, "gamma gamma delta common common", "de", "sB"),
    (4, "alpha common", "fr", "sA"),       # neg doc wearing pos tokens
    (5, "gamma common", "en", "sB"),       # pos doc wearing neg tokens
]


def _model_scores():
    from collections import Counter

    pos_toks: Counter = Counter()
    neg_toks: Counter = Counter()
    n_pos = n_neg = 0
    for _id, text, lang, _src in DOCS:
        toks = text.lower().strip().split()
        if lang == "en":
            pos_toks.update(toks)
            n_pos += 1
        else:
            neg_toks.update(toks)
            n_neg += 1
    vocab = set(pos_toks) | set(neg_toks)
    t_pos, t_neg, v = sum(pos_toks.values()), sum(neg_toks.values()), len(vocab)
    prior = math.log(n_pos / n_neg)
    out = {}
    for doc_id, text, _lang, _src in DOCS:
        s = prior
        for t in text.lower().strip().split():
            s += math.log((pos_toks[t] + 1) / (t_pos + v))
            s -= math.log((neg_toks[t] + 1) / (t_neg + v))
        out[doc_id] = s
    return out


def test_nb_doc_scores_match_model(spark):
    docs = spark.createDataFrame(
        DOCS, "doc_id LONG, text STRING, lang STRING, source STRING"
    )
    got = {r["doc_id"]: float(r["log_odds"]) for r in nb_doc_scores(docs).collect()}
    want = _model_scores()
    assert set(got) == set(want)
    for doc_id, s in want.items():
        # engine rounds each per-token weight to 9 dp before the exact
        # decimal sum; with <= 7 tokens the accumulated difference from
        # the unrounded model is < 1e-8
        assert abs(got[doc_id] - s) < 1e-6, (doc_id, got[doc_id], s)
    # pure-positive-token docs keep, pure-negative drop, and the
    # tokens-vs-label mismatches follow the TOKENS (that is the point
    # of a content classifier)
    assert got[0] > 0 and got[1] > 0
    assert got[2] < 0 and got[3] < 0
    assert got[4] > 0   # 'alpha common' scores positive despite lang=fr
    assert got[5] < 0   # 'gamma common' scores negative despite lang=en


def test_stored_model_scores_match_python_nb(spark, tmp_path):
    """write_nb_model_store + quality_nb_score_from_store vs a direct
    Python NB fit on the CORPUS slice, scoring the INCOMING slice —
    including the out-of-vocabulary constant (incoming doc 6 carries a
    token the corpus never saw)."""
    from flink_cep_task_spark.operators.text import (
        quality_nb_score_from_store,
        write_nb_model_store,
    )

    corpus_rows = [r for r in DOCS]
    incoming_rows = [
        (6, "alpha zzznovel common", "en", "sIn"),   # zzznovel is unseen
        (7, "gamma gamma", "de", "sIn"),
        (8, "zzznovel zzznovel", "fr", "sIn"),       # all-unseen doc
    ]
    corpus = spark.createDataFrame(
        corpus_rows, "doc_id LONG, text STRING, lang STRING, source STRING"
    )
    incoming = spark.createDataFrame(
        incoming_rows, "doc_id LONG, text STRING, lang STRING, source STRING"
    )
    path = str(tmp_path / "nb_model")
    write_nb_model_store(corpus, path)
    got = {
        r["doc_id"]: r.asDict()
        for r in quality_nb_score_from_store(
            incoming, spark.read.parquet(path)
        ).collect()
    }

    # python model fit on the corpus only
    from collections import Counter

    pos_toks: Counter = Counter()
    neg_toks: Counter = Counter()
    n_pos = n_neg = 0
    for _id, text, lang, _src in corpus_rows:
        toks = text.split()
        if lang == "en":
            pos_toks.update(toks); n_pos += 1
        else:
            neg_toks.update(toks); n_neg += 1
    vocab = set(pos_toks) | set(neg_toks)
    t_pos, t_neg, v = sum(pos_toks.values()), sum(neg_toks.values()), len(vocab)
    prior = math.log(n_pos / n_neg)
    for doc_id, text, _lang, _src in incoming_rows:
        s = prior
        for t in text.split():
            s += math.log((pos_toks[t] + 1) / (t_pos + v))
            s -= math.log((neg_toks[t] + 1) / (t_neg + v))
        r = got[doc_id]
        assert r["n_tokens"] == len(text.split())
        assert abs(r["log_odds"] - s) < 1e-6, (doc_id, r["log_odds"], s)
        assert r["keep"] == (s > 0)
    # on this symmetric corpus (t_pos == t_neg == 10) the unseen constant
    # is exactly 0 and the prior ln(3/3) is 0, so the all-unseen doc must
    # score exactly 0 and fall on the DROP side of the strict gate
    assert got[8]["log_odds"] == 0.0 and got[8]["keep"] is False


def test_quality_report_aggregates_scores(spark):
    docs = spark.createDataFrame(
        DOCS, "doc_id LONG, text STRING, lang STRING, source STRING"
    )
    rep = {r["source"]: r.asDict() for r in quality_nb_classifier(docs).collect()}
    want = _model_scores()
    for src in ("sA", "sB"):
        ids = [d for d, _t, _l, s in DOCS if s == src]
        assert rep[src]["n_docs"] == len(ids)
        assert rep[src]["n_keep"] == sum(want[d] > 0 for d in ids)
        model_avg = sum(want[d] for d in ids) / len(ids)
        assert abs(rep[src]["avg_log_odds"] - model_avg) < 1e-5
        assert rep[src]["min_log_odds"] <= rep[src]["max_log_odds"]


def test_nb_stream_scores_across_multiple_batches(spark):
    """The streaming twin must actually replay MULTIPLE micro-batches
    (bid=N sink dirs) and score every document exactly once — a
    single-batch drain would make the streaming claim vacuous."""
    import duckdb

    from flink_cep_task_spark.plans.cep_queries import q_quality_nb_stream

    sf = "/root/testdata/sf0.001"
    df = q_quality_nb_stream(spark, sf)
    bids = {f.split("bid=")[1].split("/")[0] for f in df.inputFiles() if "bid=" in f}
    assert len(bids) >= 2, f"replay collapsed to one micro-batch: {bids}"
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/documents.parquet')"
    ).fetchone()[0]
    assert df.count() == n_docs
    assert df.select("doc_id").distinct().count() == n_docs


def test_partial_model_store_fails_loudly(spark):
    """A model frame missing the 'prior'/'unseen' const rows (a partial
    or future writer) must raise a descriptive ValueError naming the
    schema contract at collect time, not an opaque KeyError at plan
    build (ADVICE r8)."""
    import pytest

    from flink_cep_task_spark.operators.text import nb_model_consts

    partial = spark.createDataFrame(
        [("alpha", "0.123456789", "w"), (None, "0.5", "prior")],
        "tok STRING, w STRING, kind STRING",
    ).selectExpr("tok", "CAST(w AS DECIMAL(18,9)) AS w", "kind")
    with pytest.raises(ValueError, match="unseen"):
        nb_model_consts(partial)
