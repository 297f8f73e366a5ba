"""Load-robust query measurement for bench.py (VERDICT r11 task #1).

Three rounds running, the committed bench total and the driver's fresh
run diverged 15-30% and the adjudication — tenant load on the shared
box — happened after the fact, from the per-query load columns. This
module builds the defense into the measurement itself:

* ``cpu_total_s`` — the bench's OWN busy CPU-seconds per query, summed
  over the whole process TREE (driver python + the Spark JVM + the
  pyspark.daemon + every Python UDF worker). This closes the documented
  ``jvm_cpu_s`` floor: worker CPU accrues to the worker processes (and,
  when a worker dies, folds into its parent's cutime/cstime — which the
  tree sum also counts), so Arrow-UDF-heavy queries are no longer
  under-attributed. CPU-seconds are load-independent to first order
  (the scheduler stretches WALL under contention, not the work), so
  round-over-round drift detection keys on Σ cpu_total_s, not wall.

* ``ext_cpu_s`` — host busy CPU-seconds minus our tree's: the CPU other
  tenants burned while the query ran. ``ext_cpu_s / wall`` is the
  external core pressure, the mechanical retry trigger: 1-min loadavg
  is too sluggish for per-query decisions (it decays over minutes and
  includes the bench's own threads), whereas ext cores are measured
  exactly over the query's own interval and exclude us by construction.

* ``measure_with_retry`` — re-run a squeezed query once and keep the
  faster attempt (both walls recorded). A global retry budget bounds
  the worst case: under a sustained wave the suite degrades to at most
  budget extra query runs, never a doubling.

The jiffies accounting: for every pid in our subtree, utime+stime is
its own CPU and cutime+cstime its REAPED children's. Summing all four
over the live tree is monotone across snapshots — a worker that exits
mid-query moves its jiffies into its parent's cutime rather than
vanishing — so deltas are exact whenever the tree's ROOT (this
process) survives, which it does.
"""

from __future__ import annotations

import os
import time

HZ = float(os.sysconf("SC_CLK_TCK"))


def host_jiffies() -> int | None:
    """Whole-box busy jiffies (all cores, all tenants): the /proc/stat
    cpu line minus idle+iowait."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()[1:]
        vals = [int(x) for x in parts[:8]]
        # user nice system [idle iowait] irq softirq steal
        return vals[0] + vals[1] + vals[2] + vals[5] + vals[6] + vals[7]
    except Exception:
        return None


def _stat_jiffies(pid: int) -> tuple[int, int] | None:
    """(utime+stime, cutime+cstime) of one pid in jiffies, None if gone —
    the ONE /proc/<pid>/stat parser (comm can contain spaces/parens, so
    split after the LAST ')' to keep field indices stable)."""
    try:
        with open(f"/proc/{pid}/stat") as fh:
            tail = fh.read().rsplit(")", 1)[1].split()
        return int(tail[11]) + int(tail[12]), int(tail[13]) + int(tail[14])
    except Exception:
        return None


def _proc_self_and_reaped(pid: int) -> int | None:
    """utime+stime+cutime+cstime of one pid (jiffies), None if gone."""
    j = _stat_jiffies(pid)
    return None if j is None else j[0] + j[1]


def _children(pid: int) -> list[int]:
    kids: list[int] = []
    try:
        for tid in os.listdir(f"/proc/{pid}/task"):
            try:
                with open(f"/proc/{pid}/task/{tid}/children") as fh:
                    kids.extend(int(c) for c in fh.read().split())
            except Exception:
                continue
    except Exception:
        pass
    return kids


def tree_jiffies(pid: int) -> int | None:
    """Busy jiffies of `pid` plus every live descendant (and, via
    cutime/cstime, every reaped one)."""
    total, seen, stack = 0, set(), [pid]
    any_read = False
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        j = _proc_self_and_reaped(p)
        if j is not None:
            total += j
            any_read = True
        stack.extend(_children(p))
    return total if any_read else None


class QueryMeter:
    """Per-query wall + load + CPU attribution. `root_pid` defaults to
    this process (whose subtree contains the Spark JVM and its Python
    workers); `jvm_pid` keeps the JVM-only floor column for continuity
    with earlier rounds' BENCH_DETAIL files."""

    def __init__(self, root_pid: int | None = None, jvm_pid: int | None = None):
        self.root_pid = root_pid or os.getpid()
        self.jvm_pid = jvm_pid

    def measure(self, fn) -> dict:
        load_pre = os.getloadavg()[0]
        h0 = host_jiffies()
        t0 = tree_jiffies(self.root_pid)
        j0 = _proc_jiffies(self.jvm_pid) if self.jvm_pid else None
        start = time.perf_counter()
        fn()
        wall = round(time.perf_counter() - start, 3)
        h1 = host_jiffies()
        t1 = tree_jiffies(self.root_pid)
        j1 = _proc_jiffies(self.jvm_pid) if self.jvm_pid else None
        rec: dict = {
            "wall": wall,
            "load_pre": round(load_pre, 2),
            "load_post": round(os.getloadavg()[0], 2),
        }
        if h0 is not None and h1 is not None:
            rec["host_cpu_s"] = round((h1 - h0) / HZ, 2)
        if t0 is not None and t1 is not None:
            # clamp: if an in-tree intermediate (pyspark.daemon, the JVM)
            # dies mid-query, its live descendants reparent to init and
            # leave the tree, which can make the raw delta negative —
            # report 0 rather than poisoning Σ cpu_total_s / ext_cpu_s
            rec["cpu_total_s"] = round(max(0, t1 - t0) / HZ, 2)
        if j0 is not None and j1 is not None:
            rec["jvm_cpu_s"] = round((j1 - j0) / HZ, 2)
        if "host_cpu_s" in rec and "cpu_total_s" in rec:
            rec["ext_cpu_s"] = round(
                max(0.0, rec["host_cpu_s"] - rec["cpu_total_s"]), 2
            )
        return rec


def _proc_jiffies(pid: int) -> int | None:
    """utime+stime of one pid (no children) — the legacy jvm_cpu_s floor."""
    j = _stat_jiffies(pid)
    return None if j is None else j[0]


class RetryBudget:
    """Caps suite-wide retries so a sustained tenant wave can't double
    the run: each take() spends one slot until empty."""

    def __init__(self, limit: int):
        self.left = limit

    def take(self) -> bool:
        if self.left <= 0:
            return False
        self.left -= 1
        return True


def measure_with_retry(
    run_once,
    budget: RetryBudget,
    ext_cores: float = 4.0,
    min_wall: float = 1.0,
) -> dict:
    """Run `run_once` (returns a QueryMeter.measure dict, possibly with
    extra keys); if the attempt was squeezed — external tenants burned
    >= `ext_cores` CPU cores over its interval AND the wall is big
    enough to matter — run it once more and keep the faster attempt.
    Both walls and both external pressures are recorded on the kept
    record, so BENCH_DETAIL shows exactly what the retry adjudicated.

    One-time costs ride a handicap: when a record carries
    `wall_handicap` (bench.py sets it to wall minus the attempt's
    one-time store-build seconds), attempts compare on the handicap —
    otherwise a first attempt that paid a per-process store build would
    lose to a build-free retry regardless of load, silently dropping
    the paid build from the suite's accounting. `build_all` records
    both attempts' build_s so the caller can re-attach the total."""
    first = run_once()
    ext = first.get("ext_cpu_s")
    wall = first["wall"]
    squeezed = (
        ext is not None and wall >= min_wall and (ext / max(wall, 1e-9)) >= ext_cores
    )
    if not squeezed or not budget.take():
        return first

    def key(rec):
        return rec.get("wall_handicap", rec["wall"])

    second = run_once()
    kept = second if key(second) <= key(first) else first
    kept = dict(kept)
    kept["retried"] = True
    kept["wall_all"] = [first["wall"], second["wall"]]
    kept["ext_all"] = [first.get("ext_cpu_s"), second.get("ext_cpu_s")]
    if "build_s" in first or "build_s" in second:
        kept["build_all"] = [first.get("build_s"), second.get("build_s")]
    return kept
