"""Tracked DataFrame persistence shared by operators that reuse an
expensive intermediate across plan branches (hashed shingles, normalized
embedding vectors).

Long-lived sessions call release_caches() once results are consumed;
without it, boundedness still holds because Spark's CacheManager dedupes
persist() by analyzed plan — repeated invocations reuse ONE entry per
(operator, dataset) — and eviction is LRU under memory pressure."""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []

# Per-query eager localCheckpoint()s (the CC fixpoint's converged
# mapping). A checkpointed frame is NOT freed by unpersist() on the
# DataFrame — its materialized blocks belong to the RDD inside the
# plan's LogicalRDD node (see release_shared) — so without tracking,
# each clustering call leaked a small pinned RDD until the JVM
# ContextCleaner collected it (ADVICE r10). Tracked separately from
# _PERSISTED because freeing needs the LogicalRDD handle, and because
# the free is DESTRUCTIVE: a local checkpoint has no lineage to
# recompute from, so a post-release re-execution of a plan containing
# it fails instead of re-persisting. That matches the call discipline
# release_caches already has (called at query boundaries, after the
# previous query's result is fully consumed — __spark_entry__._wrap
# releases BEFORE each build, never after), but it is why producers
# must checkpoint only frames whose every consumer executes within the
# same query.
_CHECKPOINTED: list[DataFrame] = []

# Session-shared tier: survives release_caches(). For tiny, deterministic
# result sets that MULTIPLE registered queries rebuild identically in one
# session (the MinHash-LSH verified pair set feeds both the
# dedup_minhash_lsh query and dedup_clusters' edge list; the kNN/LSH/IVF
# top-k sets feed ann_recall_report). Entries are localCheckpoint()ed,
# not persist()ed: a persist()ed entry's plan still CONTAINS the
# per-query-persisted subplans (hashed shingles, normalized vectors), and
# unpersisting those in release_caches() makes Spark recompile the
# dependent cache entry and DROP its materialized buffers — measured as
# the shared tier silently losing its data on every query boundary. The
# checkpoint truncates lineage to a materialized RDD, so nothing
# release_caches() touches can invalidate it. Reuse happens through the
# producing function: a canonically-identical build returns the stored
# handle from this dict. Keep entries SMALL (verified pair sets, top-k
# lists — not corpus-sized intermediates): they live for the whole
# session, and a local checkpoint trades lineage-based recovery for
# speed (an executor loss would fail the job instead of recomputing —
# the right trade for kilobyte model/audit outputs, wrong for data).
_SHARED: dict[tuple, DataFrame] = {}


def copy_provenance(dst: DataFrame, src: DataFrame) -> DataFrame:
    """Carry the source-file provenance attribute through a
    transformation. inputFiles() is unreliable for provenance once ANY
    canonically-equal plan sits in Spark's CacheManager (cache
    substitution hides the file scan and it returns []), so operators
    whose results feed file-keyed caches thread the attribute explicitly
    from load_table onward."""
    files = getattr(src, "_graft_input_files", None)
    if files:
        dst._graft_input_files = files
    target = getattr(src, "_graft_widen_target", None)
    if target:
        dst._graft_widen_target = target
    return dst


def persisted(df: DataFrame) -> DataFrame:
    # Provenance for file-keyed caches (the IVF fit memo, the shared
    # result tier): prefer the explicitly-threaded attribute; fall back to
    # inputFiles(), which works only when the plan is neither persisted
    # nor shadowed by a canonically-equal CacheManager entry — both bit
    # this code before (refit per query; a second pair-set build missing
    # the shared cache because its provenance came back empty).
    files = getattr(df, "_graft_input_files", None)
    if not files:
        try:
            files = tuple(sorted(df.inputFiles()))
        except Exception:
            files = ()
    p = df.persist()
    p._graft_input_files = files
    _PERSISTED.append(p)
    return p


def persisted_shared(df: DataFrame, src: DataFrame | None = None) -> DataFrame:
    # The canonicalized plan does NOT identify the input dataset — file
    # relations print as `Relation [none#…] parquet` with NO path, so two
    # structurally-identical queries over DIFFERENT datasets collide (the
    # scaling audit returned 1× results for 16× inputs before this key
    # carried provenance). inputFiles() on the cached-plan side is empty
    # once an ancestor is persist()ed, so callers pass their persisted
    # source handle (`src`), which carries the pre-persist file list that
    # cache.persisted stashed on it.
    prov: tuple = ()
    for cand in (src, df):
        if cand is None:
            continue
        files = getattr(cand, "_graft_input_files", None)
        if not files:
            try:
                files = tuple(sorted(cand.inputFiles()))
            except Exception:
                files = ()
        if files:
            prov = files
            break
    if not prov:
        # no file provenance (e.g. createDataFrame input): the key would
        # degenerate to the canonicalized plan STRING alone, and two
        # different in-memory datasets with the same plan shape would
        # collide (LocalRelation prints no data) — the bug class the
        # provenance component exists to prevent. semanticHash covers the
        # LocalRelation's rows, so it discriminates datasets; it is only
        # stable for rebuilds from the SAME source handle (a fresh
        # createDataFrame of identical rows hashes differently), which is
        # exactly the shared tier's reuse pattern — a cold miss there is
        # a recompute, never a wrong result.
        prov = ("semhash", df.semanticHash())
    key = (
        df._jdf.queryExecution().analyzed().canonicalized().toString(),
        prov,
    )
    if key in _SHARED:
        return _SHARED[key]
    p = df.localCheckpoint(eager=False)
    _SHARED[key] = p
    return p


def track_checkpoint(df: DataFrame) -> DataFrame:
    """Register an eagerly-localCheckpoint()ed PER-QUERY frame so
    release_caches() can free its pinned RDD blocks (via the LogicalRDD
    handle — a plain unpersist() on the frame frees nothing, see
    release_shared). Only for frames consumed entirely within one query:
    after release the blocks are gone and there is no lineage to rebuild
    them."""
    _CHECKPOINTED.append(df)
    return df


def release_caches() -> None:
    """Unpersist every per-query operator-persisted DataFrame (the shared
    tier survives — see _SHARED). For the persisted tier this is safe at
    any time — a later query simply re-persists — but tracked per-query
    checkpoints (track_checkpoint) are freed DESTRUCTIVELY: their blocks
    have no lineage to rebuild from, so call this only at query
    boundaries, after the results are consumed."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
    while _CHECKPOINTED:
        p = _CHECKPOINTED.pop()
        try:
            p._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass  # never-materialized / non-RDD plan


def release_shared() -> None:
    """Drop the session-shared tier too (tests / session teardown).

    The storage handle matters: a localCheckpoint()ed DataFrame's `.rdd`
    (and queryExecution().toRdd()) are freshly DERIVED RDDs with no
    storage level — unpersisting them frees nothing (verified against
    sc.getPersistentRDDs). The materialized blocks belong to the RDD
    inside the plan's LogicalRDD node; unpersisting THAT drops the entry
    from the persistent-RDD registry immediately."""
    for p in _SHARED.values():
        try:
            p._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass  # never-materialized lazy checkpoint / non-RDD plan
    _SHARED.clear()
