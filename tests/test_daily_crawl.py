"""The composed daily production cycle (VERDICT r9 task #1).

What the registry oracle can't isolate: that day-2's decisions flow
through stores DAY 1'S OWN ADMISSIONS advanced — a day-2 doc whose only
near-dup partner is a day-1 doc, and a day-2 doc whose only EXACT
duplicate is a day-1 doc, are both caught purely via stored state (the
signature store's minhash rows and its ride-along exact keys); and the
whole two-day cycle re-runs idempotently against the mutated stores.
Also pins the events-side admission: the registered query lands each
day's rollup partial in the shared rolling store without disturbing
incremental_rollup_rolling's pinned reads.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_cep_task_spark.operators.dedup import (
    release_caches,
    write_minhash_signature_store,
    write_winnow_fingerprint_store,
)
from flink_cep_task_spark.operators.text import write_nb_count_store
from flink_cep_task_spark.plans.datapipe import _daily_cycle, daily_crawl_cycles

BASE_EN = "the quick brown fox jumps over the lazy dog before breakfast today"
BASE_DE = "der schnelle braune fuchs springt am morgen ueber den faulen hund"
D1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi"
# a 16-word passage unique to day-1 doc 12: long enough for the k+w-1
# winnowing guarantee, short relative to either carrier doc so the
# whole-doc Jaccard stays under the minhash tier's 0.5 threshold —
# substring_dup must come from the FINGERPRINT store, not ride near_dup
PASSAGE = ("one two three four five six seven eight "
           "nine ten eleven twelve thirteen fourteen fifteen sixteen")

ROWS = [
    (1, BASE_EN, "en", "base"),
    (2, BASE_DE, "de", "base"),
    (3, "tiny doc", "en", "base"),   # < SHINGLE tokens: key-only store row
    (10, D1, "en", "d1"),            # novel on day 1
    (11, BASE_EN, "en", "d1"),       # exact dup of a CORPUS doc
    (12, PASSAGE + " red orange yellow green blue indigo violet pink "
         "gray black", "en", "d1"),  # day-1 carrier of the passage
    (20, D1 + " omega", "en", "d2"), # near-dup of the day-1 doc ONLY
    (21, D1, "en", "d2"),            # exact dup of the day-1 doc ONLY
    (22, "tiny doc", "en", "d2"),    # exact dup of the SHORT corpus doc
    (23, "north south east west up down left right near far deep "
         "shallow " + PASSAGE, "en", "d2"),  # shares ONLY the passage,
                                             # shifted, with day-1's 12
]
SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING"


def _setup(spark, tmp_path):
    docs = spark.createDataFrame(ROWS, SCHEMA)
    corpus = docs.filter(~F.col("source").isin("d1", "d2"))
    sig_path = str(tmp_path / "signatures")
    write_minhash_signature_store(corpus, sig_path)
    nb_path = str(tmp_path / "nb_counts")
    write_nb_count_store(corpus, nb_path)
    fp_path = str(tmp_path / "fingerprints")
    write_winnow_fingerprint_store(corpus, fp_path)
    release_caches()
    return docs, sig_path, nb_path, fp_path


def _run(spark, docs, sig_path, nb_path, fp_path):
    return {
        (r["day"], r["doc_id"]): r
        for r in daily_crawl_cycles(
            spark, docs, sig_path, nb_path, fp_path, day1="d1", day2="d2"
        ).collect()
    }


def test_day2_decisions_flow_through_day1_admissions(spark, tmp_path):
    docs, sig_path, nb_path, fp_path = _setup(spark, tmp_path)
    got = _run(spark, docs, sig_path, nb_path, fp_path)
    # day 1 vs the corpus store: the copy is exact-flagged, the novel
    # doc is clean on both dedup tiers
    assert got[(1, 11)]["is_exact_dup"] is True
    assert got[(1, 10)]["is_exact_dup"] is False
    assert got[(1, 10)]["near_status"] == "new"
    # day 2: BOTH tiers advance through day-1's single signature-store
    # admission — the near-dup via stored minhash rows, the exact dup
    # via the ride-along key column; neither partner exists in the
    # original corpus
    assert got[(2, 20)]["near_status"] == "near_dup"
    assert got[(2, 20)]["match_id"] == 10
    assert got[(2, 20)]["is_exact_dup"] is False
    assert got[(2, 21)]["is_exact_dup"] is True
    # a document too short to shingle still has an exact key in the
    # store (self-review r10: the key column rides the doc list via a
    # LEFT join, not the shingle aggregation — an inner join silently
    # dropped short docs from the exact tier while the oracle kept them)
    assert got[(2, 22)]["is_exact_dup"] is True
    assert got[(2, 22)]["near_status"] == "new"  # no shingles → no pairs
    # the day-2 NB score exists (model derived from base ∪ day-1 counts;
    # merge ≡ refit is pinned in tests/test_rolling_store.py)
    assert got[(2, 20)]["log_odds"] is not None
    # SUBSTRING tier: the day-2 doc shares only a shifted 16-word
    # passage with day-1's doc 12 — caught via day-1's STORED winnowing
    # fingerprints (its text is never re-tokenized), while the minhash
    # tier correctly calls the whole doc new (Jaccard < 0.5)
    assert got[(1, 12)]["substring_status"] == "new"
    assert got[(2, 23)]["substring_status"] == "substring_dup"
    assert got[(2, 23)]["near_status"] == "new"
    assert got[(2, 23)]["curated"] is False


def test_day2_without_admission_misses_both_tiers(spark, tmp_path):
    # negative control: probe day 2 against the UN-advanced corpus
    # store — both day-1 partners are invisible, so the positive test
    # can't pass through some fallback recompute of day-1 text
    from flink_cep_task_spark.operators.text import nb_model_from_counts

    docs, sig_path, nb_path, fp_path = _setup(spark, tmp_path)
    model = nb_model_from_counts(
        spark.read.parquet(nb_path).filter(F.col("batch") == "base")
    )
    got = {
        r["doc_id"]: r
        for r in _daily_cycle(spark, docs, "d2", sig_path,
                              ~F.col("source").isin("d1", "d2"), model,
                              fp_path).collect()
    }
    assert got[20]["near_status"] == "new"
    assert got[21]["is_exact_dup"] is False
    assert got[23]["substring_status"] == "new"


def test_full_cycle_reruns_identically(spark, tmp_path):
    # idempotence against the stores the first run mutated: every store
    # read inside the cycle is pinned to the partitions its day expects,
    # and every admission is a dynamic partition overwrite
    import glob
    import os

    docs, sig_path, nb_path, fp_path = _setup(spark, tmp_path)
    first = sorted(map(tuple, daily_crawl_cycles(
        spark, docs, sig_path, nb_path, fp_path, day1="d1", day2="d2").collect()))
    dirs = {
        os.path.dirname(p)
        for p in glob.glob(os.path.join(nb_path, "**", "*.parquet"), recursive=True)
    }
    second = sorted(map(tuple, daily_crawl_cycles(
        spark, docs, sig_path, nb_path, fp_path, day1="d1", day2="d2").collect()))
    assert second == first
    assert dirs == {
        os.path.dirname(p)
        for p in glob.glob(os.path.join(nb_path, "**", "*.parquet"), recursive=True)
    }


def test_nb_model_prep_feeds_cycle_identically(spark, tmp_path):
    """Round-14 optimization pin (_nb_model_prep): pre-paying the NB
    model's driver-synced scalars inside an admission barrier must be
    pure SCHEDULING — the prep-fed cycle's decisions are row-identical
    to the self-deriving cycle's, and the prep's weight frame is the
    very derivation quality_nb_score_from_store performs on demand
    (same analyzed plan), so nothing about the computation changed,
    only when the driver round-trips run."""
    from flink_cep_task_spark.operators.text import nb_model_from_counts
    from flink_cep_task_spark.plans.datapipe import _nb_model_prep

    docs, sig_path, nb_path, fp_path = _setup(spark, tmp_path)
    corpus_pred = ~F.col("source").isin("d1", "d2")

    prep = _nb_model_prep(spark, nb_path, ["base"])
    assert set(prep) == {"model", "consts", "weights", "n_weights"}
    assert {"prior", "unseen"} <= set(prep["consts"])
    assert prep["n_weights"] == prep["weights"].count() > 0

    # the weight frame IS the on-demand derivation — identical analyzed
    # plan, not merely equal rows
    on_demand = prep["model"].filter(F.col("kind") == "w").select("tok", "w")
    assert (
        prep["weights"]._jdf.queryExecution().analyzed().toString()
        == on_demand._jdf.queryExecution().analyzed().toString()
    )

    plain = _daily_cycle(
        spark, docs, "d1", sig_path, corpus_pred, prep["model"], fp_path
    )
    fed = _daily_cycle(
        spark, docs, "d1", sig_path, corpus_pred, prep["model"], fp_path,
        nb_consts=prep["consts"], nb_weights=prep["weights"],
        nb_n_weights=prep["n_weights"],
    )
    rows = lambda df: sorted(tuple(str(x) for x in r) for r in df.collect())
    got, exp = rows(fed), rows(plain)
    assert got and got == exp
    release_caches()


def test_registered_pipeline_advances_rollup_store_without_breaking_peers(
    spark, ddb
):
    # the events-side admission: the registered query lands each day's
    # rollup partial under its own day partition of the SHARED rolling
    # store, each equal to a direct recompute of that day's window; and
    # incremental_rollup_rolling — whose day-2 batch is the unbounded
    # tail — still matches its full-recompute oracle afterwards, because
    # its store reads are pinned to day <= day-1's index
    from flink_cep_task_spark.plans.analytics import (
        ROLLUP_CUTOFF_TS_S,
        ROLLUP_DAY2_TS_S,
        _rolling_rollup_store,
        read_rollup_partial_store,
    )
    from flink_cep_task_spark.registry import all_queries
    from flink_cep_task_spark.sources.tables import load_events_between
    from tests.conftest import SF_DIR, assert_parity

    queries = all_queries()
    queries["daily_crawl_pipeline"][0](spark, SF_DIR).collect()
    path = _rolling_rollup_store(spark, SF_DIR)
    store = read_rollup_partial_store(spark, path)
    day2_idx = ROLLUP_DAY2_TS_S // 86_400
    got = {
        (r["day"], r["event_type"]): (r["n_events"], str(r["sum_value"]))
        for r in store.filter(F.col("day").isin(day2_idx - 1, day2_idx)).collect()
    }
    direct = (
        load_events_between(
            spark, SF_DIR, ROLLUP_CUTOFF_TS_S, ROLLUP_DAY2_TS_S + 86_400
        )
        .groupBy((F.unix_timestamp("ts") / 86_400).cast("long").alias("day"),
                 "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
    )
    want = {
        (r["day"], r["event_type"]): (r["n_events"], str(r["sum_value"]))
        for r in direct.collect()
    }
    assert want and got == want
    fn, sql = queries["incremental_rollup_rolling"]
    assert_parity(fn(spark, SF_DIR), ddb, sql)
