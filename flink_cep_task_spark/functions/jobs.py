"""Driver-side overlap of INDEPENDENT Spark actions (optimization guide
§2.6 "Overlap independent jobs").

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially. The composed maintenance cycles (daily_crawl_*,
cluster_label_maintenance, dedup_clusters_rolling) end each day with a
GROUP of small admission writes to DISTINCT stores — at any scale each
write spends most of its wall in fixed per-job cost (planning, task
scheduling, the output committer), so running a day's writes from a
small thread pool overlaps those fixed costs instead of paying them
end-to-end.

Safety contract (every call site must hold it):

* the thunks are pairwise independent — no two touch the same store
  path or partition, none reads what a sibling writes;
* `run_parallel` is a BARRIER: it returns only after every thunk has
  settled, so cross-GROUP ordering (probe reads created after the
  admissions that rewrite partitions they keep — the file-listing
  discipline _rolling_sig_store documents) is untouched;
* never used for store BUILDS: _store_path's build step calls
  release_caches(), which would unpersist a sibling thread's live
  caches mid-job.

Plain threads suffice here (the guide notes the same): Spark session
objects are thread-safe for submitting jobs, the default FIFO scheduler
back-fills naturally, and nothing below changes session conf from a
thread."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

# a day's admission group is 2-4 writes; more in-flight jobs would just
# fight for the same executor slots (guide §2.6: "2-3 jobs in flight is
# plenty")
MAX_PARALLEL_ACTIONS = 4


def run_parallel(*thunks):
    """Run independent no-arg Spark actions concurrently; barrier until
    ALL have settled (no write is ever left mid-flight), then return
    their results in call order. The first exception (in call order)
    propagates after the barrier. None entries are skipped-in-place so
    call sites can splice optional admissions without branching."""
    live = [t for t in thunks if t is not None]
    if len(live) <= 1:
        return [t() for t in live]
    with ThreadPoolExecutor(
        max_workers=min(MAX_PARALLEL_ACTIONS, len(live))
    ) as pool:
        futures = [pool.submit(t) for t in live]
        results, first_err = [], None
        for f in futures:
            try:
                results.append(f.result())
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                if first_err is None:
                    first_err = exc
                results.append(None)
        if first_err is not None:
            raise first_err
        return results
