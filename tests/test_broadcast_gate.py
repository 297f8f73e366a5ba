"""Size-gated broadcast fallbacks (VERDICT r8 task #3).

Each gated operator must produce IDENTICAL results on both paths —
broadcast (gate open, the fixture default) and shuffled fallback (gate
forced shut via the conf) — and the fallback plan must actually drop
the broadcast hint from the gated join (checked by walking the
optimized plan's JoinHints, same machinery as
test_no_static_broadcast_on_sf_scaling_tables). AQE may still choose a
broadcast join at runtime for fixture-sized sides — the contract is
that the engine no longer FORCES it past the gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_cep_task_spark.operators.broadcast_gate import (
    BROADCAST_ROWS_GATE_CONF,
    gated_broadcast,
)
from flink_cep_task_spark.sources.tables import load_table, widen_small_scan
from tests.conftest import SF_DIR


@pytest.fixture
def gate_shut(spark):
    spark.conf.set(BROADCAST_ROWS_GATE_CONF, "0")
    yield spark
    spark.conf.unset(BROADCAST_ROWS_GATE_CONF)


def _broadcast_hinted_joins(df) -> int:
    plan = df._jdf.queryExecution().optimizedPlan()

    def nodes(p):
        yield p
        ch = p.children()
        for i in range(ch.size()):
            yield from nodes(ch.apply(i))

    n = 0
    for node in nodes(plan):
        if node.nodeName() != "Join":
            continue
        h = node.hint()
        for opt in (h.leftHint(), h.rightHint()):
            if opt.isDefined():
                strat = opt.get().strategy()
                if strat.isDefined() and "broadcast" in strat.get().toString().lower():
                    n += 1
    return n


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_gated_broadcast_hints_iff_under_gate(spark, gate_shut):
    small = spark.range(10).withColumnRenamed("id", "k")
    big = spark.range(100).withColumnRenamed("id", "k")
    assert _broadcast_hinted_joins(big.join(gated_broadcast(small, 10), "k")) == 0
    spark.conf.set(BROADCAST_ROWS_GATE_CONF, "10")
    assert _broadcast_hinted_joins(big.join(gated_broadcast(small, 10), "k")) == 1
    assert _broadcast_hinted_joins(big.join(gated_broadcast(small, 11), "k")) == 0


def test_heavy_hitters_identical_on_both_paths(spark, gate_shut):
    from flink_cep_task_spark.operators.text import heavy_hitters_report

    docs = widen_small_scan(load_table(spark, SF_DIR, "documents"))
    fallback_df = heavy_hitters_report(docs)
    # gate shut: the candidate recount join must carry NO broadcast hint
    # (the single-row total join keeps its — provably bounded — hint)
    assert _broadcast_hinted_joins(fallback_df) == 1
    fallback = _rows(fallback_df)
    spark.conf.unset(BROADCAST_ROWS_GATE_CONF)
    bcast_df = heavy_hitters_report(docs)
    assert _broadcast_hinted_joins(bcast_df) == 2
    assert _rows(bcast_df) == fallback
    assert len(fallback) > 0


def test_nb_classifier_identical_on_both_paths(spark, gate_shut):
    from flink_cep_task_spark.operators.text import quality_nb_classifier

    docs = widen_small_scan(load_table(spark, SF_DIR, "documents"))
    fallback_df = quality_nb_classifier(docs)
    # gate shut: the vocab-weight join loses its hint; the single-row
    # totals/priors scalar joins keep theirs
    n_fallback = _broadcast_hinted_joins(fallback_df)
    fallback = _rows(fallback_df)
    spark.conf.unset(BROADCAST_ROWS_GATE_CONF)
    bcast_df = quality_nb_classifier(docs)
    assert _broadcast_hinted_joins(bcast_df) == n_fallback + 1
    assert _rows(bcast_df) == fallback
    assert len(fallback) > 0


def test_nb_stored_scorer_identical_on_both_paths(spark, gate_shut, tmp_path):
    from flink_cep_task_spark.operators.text import (
        quality_nb_score_from_store,
        write_nb_model_store,
    )

    docs = widen_small_scan(load_table(spark, SF_DIR, "documents"))
    corpus = docs.filter(F.col("source") != "src0")
    incoming = docs.filter(F.col("source") == "src0")
    path = str(tmp_path / "nb_model")
    write_nb_model_store(corpus, path)
    model = spark.read.parquet(path)
    fallback_df = quality_nb_score_from_store(incoming, model)
    assert _broadcast_hinted_joins(fallback_df) == 0
    fallback = _rows(fallback_df)
    spark.conf.unset(BROADCAST_ROWS_GATE_CONF)
    bcast_df = quality_nb_score_from_store(incoming, model)
    assert _broadcast_hinted_joins(bcast_df) == 1
    assert _rows(bcast_df) == fallback
    assert len(fallback) > 0


def test_unigram_logprob_identical_on_both_paths(spark, gate_shut):
    from flink_cep_task_spark.operators.text import unigram_logprob_score

    docs = widen_small_scan(load_table(spark, SF_DIR, "documents"))
    fallback_df = unigram_logprob_score(docs)
    # gate shut: the vocab join loses its hint; the single-row total
    # scalar join keeps its provably-bounded one
    assert _broadcast_hinted_joins(fallback_df) == 1
    fallback = _rows(fallback_df)
    spark.conf.unset(BROADCAST_ROWS_GATE_CONF)
    bcast_df = unigram_logprob_score(docs)
    assert _broadcast_hinted_joins(bcast_df) == 2
    assert _rows(bcast_df) == fallback
    assert len(fallback) > 0
