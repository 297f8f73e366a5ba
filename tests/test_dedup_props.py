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


def test_dedup_exact_keeps_null_and_empty_texts(spark, ddb):
    """NULL text must not be silently dropped by a NULL join key (ADVICE r2):
    all-null texts form ONE duplicate cluster, empty/whitespace texts form
    another, and both engines agree."""
    import duckdb

    from flink_cep_task_spark.operators.dedup import DEDUP_EXACT_SQL, dedup_exact
    from tests.conftest import assert_parity

    rows = [
        (1, "alpha beta"),
        (2, None),
        (3, "alpha  beta!"),   # normalizes to doc 1's text
        (4, None),
        (5, ""),
        (6, "   "),            # whitespace-only ⇒ same normalized form as ""
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.canonical_id, r.is_duplicate) for r in dedup_exact(df).collect()}
    assert len(out) == 6, "every document must survive dedup_exact"
    assert out[3] == (1, True)
    assert out[2] == (2, False) and out[4] == (2, True)  # null cluster
    assert out[5] == (5, False) and out[6] == (5, True)  # empty cluster

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, {'NULL' if t is None else t!r})" for i, t in rows)
                + ") AS t(doc_id, text)")
    assert_parity(dedup_exact(df), con, DEDUP_EXACT_SQL)
    con.close()


def test_release_caches_leaves_no_cache_entries(spark):
    """Long-lived-session hygiene: release_caches() drops every per-query
    cache (the heavy shingle frames); the deliberately session-shared tier
    (the tiny verified pair set, reused by dedup_clusters) survives it and
    is dropped by release_shared() — after both, the CacheManager is
    empty."""
    from flink_cep_task_spark.operators import dedup as D
    from flink_cep_task_spark.operators.cache import release_shared

    release_shared()  # isolate from earlier tests' shared entries
    spark.catalog.clearCache()  # clean slate for the emptiness assertion
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} common tail text") for i in range(30)],
        ["doc_id", "text"],
    )
    D.dedup_minhash_lsh(docs).collect()
    D.dedup_ngram_jaccard(docs).collect()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert not cm.isEmpty(), "expected the shingle frames to be cached"
    D.release_caches()
    release_shared()
    assert cm.isEmpty(), "release left cache entries behind"


def test_dedup_clusters_equal_union_find(spark):
    """The distributed min-label propagation must produce exactly the
    connected components of the pair graph — checked against an
    independent driver-side union-find over the same edges, on the real
    documents fixture."""
    from flink_cep_task_spark.operators.dedup import dedup_clusters, dedup_minhash_lsh
    from flink_cep_task_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    edges = [(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(docs).collect()]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    got = {r.doc_id: (r.cluster_id, r.is_canonical) for r in dedup_clusters(docs).collect()}
    all_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    assert set(got) == set(all_ids), "every document must be labeled"
    # canonical root per component = min doc_id reachable; singletons self
    comp_min: dict[int, int] = {}
    for x in list(parent):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, r), x)
    for doc in all_ids:
        expected = comp_min[find(doc)] if doc in parent else doc
        assert got[doc] == (expected, doc == expected), f"doc {doc}"
    assert len(edges) > 0, "fixture produced no near-dup edges — vacuous test"


def test_shared_tier_reuses_one_handle_and_survives_release(spark):
    """The session-shared tier must (a) return the SAME checkpointed
    handle for a canonically-identical rebuild — that identity is what
    lets dedup_clusters / ann_recall_report skip whole pipelines — and
    (b) keep its materialized data across release_caches(), the per-query
    cache boundary (a persist()-backed tier silently lost its buffers
    there: Spark recompiles dependent cache entries when a subplan is
    unpersisted)."""
    from flink_cep_task_spark.operators import dedup as D
    from flink_cep_task_spark.operators.cache import release_shared

    release_shared()
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} common tail text") for i in range(30)],
        ["doc_id", "text"],
    )
    first = D.dedup_minhash_lsh(docs)
    first.collect()  # materialize the lazy checkpoint
    D.release_caches()
    second = D.dedup_minhash_lsh(docs)
    assert second is first, "canonically-identical rebuild missed the shared tier"
    release_shared()


def test_dedup_clusters_restores_session_confs(spark):
    """The small-graph fixpoint loop pins AQE off and a narrow shuffle
    width for its own jobs only — the session confs must come back even
    though the sf0.001 graph takes the small path."""
    from flink_cep_task_spark.operators.dedup import dedup_clusters
    from tests.conftest import SF_DIR
    from flink_cep_task_spark.sources.tables import load_table

    before = {
        k: spark.conf.get(k)
        for k in ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
    }
    dedup_clusters(load_table(spark, SF_DIR, "documents")).collect()
    after = {k: spark.conf.get(k) for k in before}
    assert after == before, f"session confs not restored: {after} != {before}"


def test_incremental_minhash_store_matches_inline_for_other_sources(spark, tmp_path):
    """The incoming_source parameter is real, not decorative: for a
    NON-default batch source the store-backed probe must classify
    identically to the inline variant, and both must match the DuckDB
    oracle built with the same argument (dedup_incremental_minhash_sql
    tracks its caller — ADVICE r5's builder pattern)."""
    import duckdb

    from flink_cep_task_spark.operators.dedup import (
        dedup_incremental_minhash,
        dedup_incremental_minhash_from_store,
        dedup_incremental_minhash_sql,
        write_minhash_signature_store,
    )
    from flink_cep_task_spark.sources.tables import load_table, widen_small_scan
    from tests.conftest import SF_DIR

    sf = SF_DIR
    docs = widen_small_scan(load_table(spark, sf, "documents"))
    store_path = str(tmp_path / "sigs")
    write_minhash_signature_store(docs, store_path)
    store = spark.read.parquet(store_path)

    for src in ("src1", "src2"):
        inline = {
            tuple(r) for r in dedup_incremental_minhash(docs, src).collect()
        }
        stored = {
            tuple(r)
            for r in dedup_incremental_minhash_from_store(docs, store, src).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        oracle = {
            tuple(r)
            for r in con.execute(dedup_incremental_minhash_sql(src))
            .df()
            .itertuples(index=False)
        }
        norm = lambda s: {
            (d, st, None if m is None or m != m else int(m),
             None if j is None or j != j else round(float(j), 6))
            for d, st, m, j in s
        }
        assert norm(inline) == norm(stored) == norm(oracle), src


def test_winnowing_catches_one_word_shift_that_passages_misses(spark):
    """The defining property of dedup_substring (VERDICT r6 task #1): a
    duplicated passage shifted by ONE word realigns every non-overlapping
    chunk, so dedup_passages sees nothing — winnowing fingerprints are
    computed over every overlapping k-gram, so the shifted copy still
    collides."""
    from flink_cep_task_spark.operators.dedup import (
        dedup_passages,
        dedup_substring,
    )

    body = " ".join(f"tok{i}" for i in range(40))  # 40 distinct words
    df = spark.createDataFrame(
        [
            (1, body),
            (2, "shiftpad " + body),  # same text, offset by one word
            (3, " ".join(f"other{i}" for i in range(40))),  # unrelated
        ],
        ["doc_id", "text"],
    )

    # passages: every 8-word chunk of doc 2 straddles doc 1's chunk
    # boundaries, so NO passage recurs anywhere
    pas = {r.doc_id: r.n_dup_passages for r in dedup_passages(df).collect()}
    assert pas == {1: 0, 2: 0, 3: 0}

    # winnowing: the pair is caught, with near-total containment
    subs = {(r.doc_a, r.doc_b): r for r in dedup_substring(df).collect()}
    assert set(subs) == {(1, 2)}
    r = subs[(1, 2)]
    assert r.shared_fps >= 2
    assert r.containment >= 0.8


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's coverage guarantee: ANY shared run of >= k+w-1 words
    produces at least one identical fingerprint, wherever it sits in
    either document. Embed the same 8-word phrase at different offsets
    inside otherwise-disjoint documents."""
    import random

    from flink_cep_task_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        dedup_substring,
    )

    rng = random.Random(11)
    phrase = " ".join(f"shared{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    rows = []
    for d in range(6):
        pre = " ".join(f"a{d}x{i}" for i in range(rng.randint(0, 15)))
        post = " ".join(f"b{d}y{i}" for i in range(rng.randint(5, 15)))
        rows.append((d, f"{pre} {phrase} {post}".strip()))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup_substring(df, min_shared=1).collect()
    }
    want = {(a, b) for a in range(6) for b in range(a + 1, 6)}
    assert got >= want, f"missing pairs: {want - got}"


def test_winnowing_short_doc_keeps_one_fingerprint(spark):
    """Documents with fewer than w k-grams still emit one fingerprint
    (the global minimum), so short duplicated snippets remain findable."""
    from flink_cep_task_spark.operators.dedup import dedup_substring

    snippet = "alpha beta gamma delta epsilon zeta"  # 6 words -> 2 kgrams < w
    df = spark.createDataFrame(
        [(1, snippet), (2, snippet), (3, "one two three four five six")],
        ["doc_id", "text"],
    )
    got = {(r.doc_a, r.doc_b): r for r in dedup_substring(df, min_shared=1).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)].n_fps_a == got[(1, 2)].n_fps_b == 1


def test_incremental_substring_catches_embedded_shifted_passage(spark, tmp_path):
    """The incremental story end-to-end: a corpus passage re-appears at a
    DIFFERENT offset inside an otherwise-new incoming document — the
    store probe flags it substring_dup against the right corpus doc,
    while a genuinely new doc stays 'new'. Also pins store-vs-inline
    agreement: probing the materialized store equals computing corpus
    fingerprints inline."""
    from flink_cep_task_spark.operators.dedup import (
        dedup_substring_incremental_from_store,
        write_winnow_fingerprint_store,
    )

    passage = " ".join(f"shared{i}" for i in range(20))
    corpus_doc = "intro words here " + passage + " trailing corpus words"
    rows = [
        (1, corpus_doc, "corp"),
        (2, " ".join(f"other{i}" for i in range(30)), "corp"),
        # incoming: the same passage, shifted to a new offset in new text
        (10, " ".join(f"fresh{i}" for i in range(11)) + " " + passage, "today"),
        (11, " ".join(f"novel{i}" for i in range(25)), "today"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    store_path = str(tmp_path / "fingerprints")
    write_winnow_fingerprint_store(df, store_path)
    store = spark.read.parquet(store_path)
    got = {
        r.doc_id: r
        for r in dedup_substring_incremental_from_store(
            df, store, incoming_source="today"
        ).collect()
    }
    assert got[10].status == "substring_dup" and got[10].match_id == 1
    assert got[10].shared_fps >= 2
    assert got[11].status == "new" and got[11].match_id is None
