"""Day-over-day signature-store maintenance (VERDICT r8 task #1).

The crux the registry oracle can't isolate: a day-2 document whose ONLY
near-dup partner is a day-1 document. If the write-back (admission) step
didn't actually advance the store, the day-2 probe would classify it
'new'; catching it as 'near_dup' with the day-1 doc as match proves the
probe is reading signatures the QUERY ITSELF admitted — the maintenance
loop a daily crawl runs, not a single-shot demo.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_cep_task_spark.operators.dedup import (
    append_minhash_signatures,
    dedup_minhash_rolling,
    write_minhash_signature_store,
)

BASE = "the quick brown fox jumps over the lazy dog before breakfast today"
D1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi"
# one word appended: 11 of 12 3-shingles shared → jaccard ≈ 0.92, and the
# 16 min-hashes are near-unchanged so all 4 bands collide (verified
# deterministic with the fixed md5 permutations — near-dup, not exact)
D2 = D1 + " omega"

ROWS = [
    (1, BASE, "en", "base"),
    (10, D1, "en", "d1"),
    (20, D2, "en", "d2"),
]
SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING"


def _docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _store(spark, tmp_path) -> str:
    path = str(tmp_path / "signatures")
    write_minhash_signature_store(
        _docs(spark).filter(~F.col("source").isin("d1", "d2")), path
    )
    return path


def test_day2_matches_day1_via_advanced_store(spark, tmp_path):
    path = _store(spark, tmp_path)
    got = {
        (r["day"], r["doc_id"]): (r["status"], r["match_id"])
        for r in dedup_minhash_rolling(
            spark, _docs(spark), path, day1="d1", day2="d2"
        ).collect()
    }
    # day 1: novel vs the corpus
    assert got[(1, 10)] == ("new", None)
    # day 2: near-dup of the day-1 doc ONLY — provable only if the
    # admission write-back actually advanced the store
    assert got[(2, 20)] == ("near_dup", 10)


def test_day2_without_admission_misses_the_day1_partner(spark, tmp_path):
    # negative control: probe day 2 against the UN-advanced store — the
    # day-1 partner is invisible, so the positive test above cannot be
    # passing vacuously (e.g. via some fallback re-shingle of day 1)
    from flink_cep_task_spark.operators.dedup import (
        dedup_incremental_minhash_from_store,
    )

    path = _store(spark, tmp_path)
    got = {
        r["doc_id"]: r["status"]
        for r in dedup_incremental_minhash_from_store(
            _docs(spark), spark.read.parquet(path), "d2"
        ).collect()
    }
    assert got[20] == "new"


def test_admission_is_idempotent(spark, tmp_path):
    # a retried admission (at-least-once delivery, re-crawled day) must
    # rewrite the day's partition, not append duplicate signature rows
    path = _store(spark, tmp_path)
    day1 = _docs(spark).filter(F.col("source") == "d1")
    append_minhash_signatures(day1, path)
    once = spark.read.parquet(path).count()
    append_minhash_signatures(day1, path)
    assert spark.read.parquet(path).count() == once
    # and the whole rolling query re-runs cleanly on the mutated store
    rows = dedup_minhash_rolling(
        spark, _docs(spark), path, day1="d1", day2="d2"
    ).collect()
    assert {(r["day"], r["doc_id"], r["status"]) for r in rows} == {
        (1, 10, "new"),
        (2, 20, "near_dup"),
    }


def test_admission_touches_only_the_batch_partition(spark, tmp_path):
    # the admission job's scale contract: existing store partitions are
    # never rewritten (their files survive byte-identical), only the
    # batch's own source partition lands
    import glob
    import os

    path = _store(spark, tmp_path)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    }
    append_minhash_signatures(
        _docs(spark).filter(F.col("source") == "d1"), path
    )
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    }
    assert set(before) <= set(after)
    for p, mt in before.items():
        assert after[p] == mt, f"pre-existing store file rewritten: {p}"
    assert any("source=d1" in p for p in set(after) - set(before))


def test_ivf_admission_touches_only_its_batch_partitions(spark):
    # the IVF admission's scale contract, mirroring the minhash one:
    # existing inverted-file partitions (batch=base) survive
    # byte-identical; only batch=d1 directories appear; a retried
    # admission is idempotent (same file count, base still untouched)
    import glob
    import os

    from flink_cep_task_spark.operators.similarity import (
        IVF_ROLLING_DAY1_LABEL,
        append_ivf_assignments,
    )
    from flink_cep_task_spark.plans.datapipe import _rolling_ivf_store
    from flink_cep_task_spark.sources.tables import load_table, widen_small_scan
    from tests.conftest import SF_DIR

    emb = widen_small_scan(load_table(spark, SF_DIR, "embeddings"))
    path = _rolling_ivf_store(spark, SF_DIR)
    inv = os.path.join(path, "inv_file")

    def snap():
        return {
            p: os.path.getmtime(p)
            for p in glob.glob(os.path.join(inv, "**", "*.parquet"), recursive=True)
        }

    before = snap()
    append_ivf_assignments(emb, path, IVF_ROLLING_DAY1_LABEL, "d1")
    mid = snap()
    base_before = {p for p in before if "batch=base" in p}
    assert base_before == {p for p in mid if "batch=base" in p}
    for p in base_before:
        assert mid[p] == before[p], f"base partition rewritten: {p}"
    d1_dirs = {os.path.dirname(p) for p in mid if "batch=d1" in p}
    assert d1_dirs, "admission produced no batch=d1 partitions"
    n_rows = spark.read.parquet(inv).count()
    # retry: same partition DIRECTORIES (files are rewritten — that's
    # what overwrite means), same row count, base still byte-untouched
    append_ivf_assignments(emb, path, IVF_ROLLING_DAY1_LABEL, "d1")
    after = snap()
    assert {os.path.dirname(p) for p in after if "batch=d1" in p} == d1_dirs
    assert spark.read.parquet(inv).count() == n_rows
    for p in base_before:
        assert after[p] == before[p]


def test_day1_probe_pinned_against_later_admissions(spark, tmp_path):
    # rerun-safety the other way around (self-review r9): after day-2
    # has ALSO been admitted, a day-1 rerun must still see only the
    # original corpus — doc 10's only near-dup partner is the day-2 doc,
    # so an unpinned day-1 store read would flip it to 'near_dup'
    path = _store(spark, tmp_path)
    append_minhash_signatures(_docs(spark).filter(F.col("source") == "d1"), path)
    append_minhash_signatures(_docs(spark).filter(F.col("source") == "d2"), path)
    got = {
        (r["day"], r["doc_id"]): r["status"]
        for r in dedup_minhash_rolling(
            spark, _docs(spark), path, day1="d1", day2="d2"
        ).collect()
    }
    assert got[(1, 10)] == "new"
    assert got[(2, 20)] == "near_dup"


PASSAGE = (
    "zephyr quince bramble osprey tundra velvet cobalt marrow "
    "sickle plume gossamer ember lattice drift harrow tonic "
    "mica fable sprocket vane crag nimbus ledger fjord pylon "
    "saffron grotto whelk tarn rill"
)  # 30 distinctive words: guarantees >= WINNOW_MIN_SHARED shared fps
SS_ROWS = [
    (1, BASE, "en", "base"),
    (10, "one two three " + PASSAGE, "en", "d1"),
    # same passage SHIFTED inside otherwise-new day-2 text
    (20, "red orange yellow green blue " + PASSAGE + " indigo violet",
     "en", "d2"),
]


def test_substring_day2_matches_day1_via_advanced_store(spark, tmp_path):
    # the substring-tier crux, mirroring the minhash one: day-2's only
    # shared passage is with a day-1 doc — catching it proves the probe
    # reads fingerprints the query itself admitted; and a day-1 rerun
    # AFTER day-2's admission stays pinned to the original corpus
    from flink_cep_task_spark.operators.dedup import (
        append_winnow_fingerprints,
        dedup_substring_rolling,
        write_winnow_fingerprint_store,
    )

    docs = spark.createDataFrame(SS_ROWS, SCHEMA)
    path = str(tmp_path / "fingerprints")
    write_winnow_fingerprint_store(
        docs.filter(~F.col("source").isin("d1", "d2")), path
    )
    got = {
        (r["day"], r["doc_id"]): (r["status"], r["match_id"])
        for r in dedup_substring_rolling(
            spark, docs, path, day1="d1", day2="d2"
        ).collect()
    }
    assert got[(1, 10)] == ("new", None)
    assert got[(2, 20)] == ("substring_dup", 10)
    # pin check: admit day 2 too, rerun — day 1 must not see tomorrow
    append_winnow_fingerprints(docs.filter(F.col("source") == "d2"), path)
    rerun = {
        (r["day"], r["doc_id"]): r["status"]
        for r in dedup_substring_rolling(
            spark, docs, path, day1="d1", day2="d2"
        ).collect()
    }
    assert rerun[(1, 10)] == "new"
    assert rerun[(2, 20)] == "substring_dup"


# sliding 20-word windows over a 32-word vocabulary: consecutive windows
# (4-word step) share 14 of 18 3-shingles (jaccard 0.636 >= tau AND all
# verified band-colliding for this vocabulary), windows two steps apart
# share 10/26 (0.385 < tau) — a pure CHAIN A1~A2~D~E with no shortcut
# edges, so each hop is provable only through the stored state of the
# previous day
_CHAIN_W = [f"ta{i:02d}" for i in range(1, 33)]


def _chain_txt(a: int, b: int) -> str:
    return " ".join(_CHAIN_W[a - 1 : b])


CHAIN_ROWS = [
    (1, _chain_txt(1, 20), "en", "base"),   # A1: corpus cluster min
    (2, _chain_txt(5, 24), "en", "base"),   # A2 ~ A1 (stored star edge)
    (10, _chain_txt(9, 28), "en", "d1"),    # D ~ A2 only
    (20, _chain_txt(13, 32), "en", "d2"),   # E ~ D only
]


def _chain_stores(spark, tmp_path):
    from flink_cep_task_spark.operators.dedup import (
        CLUSTER_BASE_EPOCH,
        _cluster_from_pairs,
        minhash_pairs_from_store,
        write_cluster_label_store,
    )

    docs = spark.createDataFrame(CHAIN_ROWS, SCHEMA)
    sig_path = str(tmp_path / "signatures")
    write_minhash_signature_store(
        docs.filter(~F.col("source").isin("d1", "d2")), sig_path
    )
    sig = spark.read.parquet(sig_path)
    lab_path = str(tmp_path / "labels")
    write_cluster_label_store(
        _cluster_from_pairs(sig.select("doc_id"), minhash_pairs_from_store(sig)),
        lab_path,
        epoch=CLUSTER_BASE_EPOCH,
    )
    return docs, lab_path, sig_path


def test_clusters_day2_joins_day1_cluster_via_advanced_stores(spark, tmp_path):
    # the cluster loop's crux: E(day 2) has ONE near-dup partner, D
    # (day 1) — labeling E with the corpus cluster's min (doc 1) needs
    # BOTH admissions the query itself performs: D's membership arrives
    # via the day-1 label epoch, the E~D edge via D's stored signatures
    from flink_cep_task_spark.operators.dedup import dedup_clusters_rolling

    docs, lab_path, sig_path = _chain_stores(spark, tmp_path)
    got = {
        (r["day"], r["doc_id"]): (r["cluster_id"], r["is_canonical"])
        for r in dedup_clusters_rolling(
            spark, docs, lab_path, sig_path, day1="d1", day2="d2"
        ).collect()
    }
    # day 1: D joins the corpus cluster through the stored A2→A1 star
    # edge (D is NOT a near-dup of A1 directly)
    assert got[(1, 10)] == (1, False)
    assert got[(1, 1)] == (1, True) and got[(1, 2)] == (1, False)
    # day 2: E lands in the same cluster purely via stored state
    assert got[(2, 20)] == (1, False)
    assert got[(2, 10)] == (1, False)


def test_clusters_day2_without_admission_misses_the_chain(spark, tmp_path):
    # negative control: against the UN-advanced stores (base labels,
    # corpus-only signatures) E has no visible partner — the positive
    # test cannot be passing through some fallback full recompute
    from flink_cep_task_spark.operators.dedup import (
        CLUSTER_BASE_EPOCH,
        dedup_clusters_from_store,
        read_cluster_label_store,
    )

    docs, lab_path, sig_path = _chain_stores(spark, tmp_path)
    lab = read_cluster_label_store(spark, lab_path, CLUSTER_BASE_EPOCH)
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup_clusters_from_store(
            docs, lab, spark.read.parquet(sig_path), "d2"
        ).collect()
    }
    assert got[20] == (20, True)


def test_clusters_day1_pinned_and_rerun_idempotent(spark, tmp_path):
    # rerun safety: after day-2 signatures land AND a poisoned label set
    # sits under a foreign epoch (cluster_id -99 would propagate as the
    # new min through ANY unpinned label read), a full rerun of the
    # rolling query must return the identical report and leave the
    # store's partition set stable
    from flink_cep_task_spark.operators.dedup import (
        dedup_clusters_rolling,
        write_cluster_label_store,
    )

    docs, lab_path, sig_path = _chain_stores(spark, tmp_path)
    first = sorted(
        map(tuple, dedup_clusters_rolling(
            spark, docs, lab_path, sig_path, day1="d1", day2="d2"
        ).collect())
    )
    append_minhash_signatures(docs.filter(F.col("source") == "d2"), sig_path)
    poisoned = docs.select(
        "doc_id", F.lit(-99).cast("long").alias("cluster_id"),
        F.lit(False).alias("is_canonical"),
    )
    write_cluster_label_store(poisoned, lab_path, epoch="d2", dynamic=True)
    import glob
    import os

    dirs_before = {
        os.path.dirname(p)
        for p in glob.glob(os.path.join(lab_path, "**", "*.parquet"), recursive=True)
    }
    rerun = sorted(
        map(tuple, dedup_clusters_rolling(
            spark, docs, lab_path, sig_path, day1="d1", day2="d2"
        ).collect())
    )
    assert rerun == first
    dirs_after = {
        os.path.dirname(p)
        for p in glob.glob(os.path.join(lab_path, "**", "*.parquet"), recursive=True)
    }
    assert dirs_before == dirs_after


def test_cluster_base_labels_from_store_equal_full_recompute(spark, tmp_path):
    # the base build's derivation claim: labels computed purely from the
    # signature store (banded candidates + stored-set verify — no text
    # re-shingle) must equal dedup_clusters over the same corpus
    from flink_cep_task_spark.operators.dedup import (
        _cluster_from_pairs,
        dedup_clusters,
        minhash_pairs_from_store,
    )

    docs, _lab, sig_path = _chain_stores(spark, tmp_path)
    corpus = docs.filter(~F.col("source").isin("d1", "d2"))
    sig = spark.read.parquet(sig_path)
    from_store = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in _cluster_from_pairs(
            sig.select("doc_id"), minhash_pairs_from_store(sig)
        ).collect()
    }
    full = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup_clusters(corpus).collect()
    }
    assert from_store == full


def test_nb_count_merge_equals_refit(spark, tmp_path):
    # the NB maintenance loop's crux: the day-2 model derived from
    # SUMMED count partitions (base ∪ d1) must score bit-identically to
    # a from-scratch weight-store fit on corpus ∪ day-1 — count-merge ≡
    # refit, which is what makes advancing the store legal
    from flink_cep_task_spark.operators.text import (
        quality_nb_rolling,
        quality_nb_score_from_store,
        write_nb_count_store,
        write_nb_model_store,
    )

    rows = [
        (1, "alpha alpha beta common", "en", "base"),
        (2, "gamma delta common common", "de", "base"),
        (3, "alpha beta beta epsilon", "en", "d1"),
        (4, "gamma gamma epsilon", "de", "d1"),
        (10, "alpha epsilon zzznovel common", "en", "d2"),
        (11, "gamma epsilon", "de", "d2"),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    cpath = str(tmp_path / "nb_counts")
    write_nb_count_store(docs.filter(F.col("source") == "base"), cpath)
    rolling = {
        (r["day"], r["doc_id"]): (r["n_tokens"], r["log_odds"], r["keep"])
        for r in quality_nb_rolling(spark, docs, cpath, "d1", "d2").collect()
    }
    # from-scratch refit on corpus ∪ day-1, scoring day-2
    wpath = str(tmp_path / "nb_weights")
    write_nb_model_store(docs.filter(F.col("source").isin("base", "d1")), wpath)
    refit = {
        r["doc_id"]: (r["n_tokens"], r["log_odds"], r["keep"])
        for r in quality_nb_score_from_store(
            docs.filter(F.col("source") == "d2"), spark.read.parquet(wpath)
        ).collect()
    }
    assert {d: v for (day, d), v in rolling.items() if day == 2} == refit
    # and day-1 was scored by the PRE-admission model: refit on base only
    wpath1 = str(tmp_path / "nb_weights_base")
    write_nb_model_store(docs.filter(F.col("source") == "base"), wpath1)
    refit1 = {
        r["doc_id"]: (r["n_tokens"], r["log_odds"], r["keep"])
        for r in quality_nb_score_from_store(
            docs.filter(F.col("source") == "d1"), spark.read.parquet(wpath1)
        ).collect()
    }
    assert {d: v for (day, d), v in rolling.items() if day == 1} == refit1


def test_three_day_rolling_operator_chain(spark, tmp_path):
    """The N-day generalization (VERDICT r10 task #6) run by the
    operator itself: day 3's partner arrived on day 2, whose partner
    arrived on day 1 — the chain exists only through two consecutive
    admissions inside ONE dedup_minhash_rolling call."""
    from tests.test_store_compaction import ROWS, SCHEMA

    docs = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "sig3")
    write_minhash_signature_store(
        docs.filter(~F.col("source").isin("d1", "d2", "d3")), path
    )
    got = {
        (r["day"], r["doc_id"]): (r["status"], r["match_id"])
        for r in dedup_minhash_rolling(
            spark, docs, path, days=["d1", "d2", "d3"]
        ).collect()
    }
    assert got[(1, 10)] == ("new", None)
    assert got[(2, 20)] == ("near_dup", 10)
    assert got[(3, 30)] == ("near_dup", 20)


def test_day_union_composers_stay_in_lockstep(spark):
    """day_union (DataFrame) and day_union_sql (oracle) implement the ONE
    day-tagging convention every rolling family rides; a drift in either
    (tag base, column name, dtype) would hash-flip all six gated rolling
    oracles at once — pin them against each other directly."""
    import duckdb

    from flink_cep_task_spark.functions.rolling import day_union, day_union_sql

    parts = [spark.createDataFrame([(v,)], "x INT") for v in (10, 20, 30)]
    df = day_union(parts)
    got = sorted((r["day"], r["x"]) for r in df.collect())
    sql = day_union_sql(["SELECT 10 AS x", "SELECT 20 AS x", "SELECT 30 AS x"])
    exp = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == exp == [(1, 10), (2, 20), (3, 30)]
    assert dict(df.dtypes)["day"] == "int"
