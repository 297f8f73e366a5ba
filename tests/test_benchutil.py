"""Pins bench.py's load-robustness mechanism (VERDICT r11 task #1):
cpu_total_s attributes the bench's own process-tree CPU (including
reaped children), ext_cpu_s isolates other tenants' CPU over the
query's exact interval, and measure_with_retry re-runs a squeezed
query once under a budget. The external load is synthesized with a
DOUBLE-FORKED burner — its processes reparent to init, so they are
outside our tree exactly like a real tenant."""

from __future__ import annotations

import subprocess
import sys
import time

import os

import pytest

from flink_cep_task_spark.benchutil import (
    HZ,
    QueryMeter,
    RetryBudget,
    measure_with_retry,
    tree_jiffies,
)

# the load tests need enough cores that 8 external burners are actually
# measurable as >= 4 external cores alongside the test's own work
needs_cores = pytest.mark.skipif(
    (os.cpu_count() or 1) < 12, reason="needs >=12 CPUs for the burner load"
)

BURNER = """
import os, sys, time
pids = []
for _ in range({procs}):
    pid = os.fork()
    if pid == 0:
        # release BOTH captured pipes NOW — the parent's subprocess.run
        # reads until EOF on stdout AND stderr, and an inherited open
        # fd would make it block for the whole burn
        os.close(1)
        os.close(2)
        end = time.time() + {secs}
        while time.time() < end:
            pass
        os._exit(0)
    pids.append(pid)
print(" ".join(map(str, pids)), flush=True)
os._exit(0)
"""


def _start_burners(procs: int, secs: int) -> list[int]:
    out = subprocess.run(
        [sys.executable, "-c", BURNER.format(procs=procs, secs=secs)],
        check=True, capture_output=True, text=True,
    )
    return [int(p) for p in out.stdout.split()]


def _stop_burners(pids: list[int]) -> None:
    # the burners were reparented to init; kill them so their load
    # can't bleed into whatever timing-sensitive test runs next
    for p in pids:
        try:
            os.kill(p, 9)
        except OSError:
            pass


def _busy(cpu_s: float = 0.5) -> None:
    t0 = time.process_time()
    while time.process_time() - t0 < cpu_s:
        pass


def test_tree_jiffies_counts_reaped_children():
    """A child's CPU folds into our cutime when reaped — the tree delta
    must see it (this is the Python-UDF-worker accounting)."""
    import os

    t0 = tree_jiffies(os.getpid())
    subprocess.run(
        [sys.executable, "-c",
         "import time\nt0=time.process_time()\n"
         "while time.process_time()-t0<0.5: pass"],
        check=True,
    )
    t1 = tree_jiffies(os.getpid())
    assert (t1 - t0) / HZ >= 0.4


def test_meter_without_load_does_not_retry():
    meter = QueryMeter()
    budget = RetryBudget(5)
    calls = []

    def run_once():
        calls.append(1)
        return meter.measure(lambda: _busy(0.4))

    # astronomically high threshold: even a loaded tenant box can't trip it
    rec = measure_with_retry(run_once, budget, ext_cores=10**6, min_wall=0.1)
    assert len(calls) == 1 and "retried" not in rec
    # the busy loop is our own CPU: attributed to cpu_total_s
    assert 0.3 <= rec["cpu_total_s"] <= 1.5
    assert budget.left == 5


@needs_cores
def test_retry_fires_under_external_load_and_cpu_total_stays_flat():
    """The crux: an out-of-tree burner inflates host_cpu_s/ext_cpu_s but
    NOT cpu_total_s, the squeeze trips the retry, and both attempts'
    walls land on the kept record."""
    # 8 detached cores — reparented to init, outside our tree
    pids = _start_burners(8, 12)
    try:
        time.sleep(0.3)  # let the burners spin up
        meter = QueryMeter()
        budget = RetryBudget(5)
        cpu_per_attempt = []

        def run_once():
            rec = meter.measure(lambda: _busy(0.5))
            cpu_per_attempt.append(rec["cpu_total_s"])
            return rec

        rec = measure_with_retry(run_once, budget, ext_cores=4.0, min_wall=0.1)
        assert rec.get("retried") is True
        assert len(rec["wall_all"]) == 2 and budget.left == 4
        # our own CPU is load-independent: ~0.5 s per attempt in both
        # runs, while the burner's CPU showed up only in host/ext
        assert all(0.3 <= c <= 1.6 for c in cpu_per_attempt)
        assert rec["ext_cpu_s"] >= 2.0
    finally:
        _stop_burners(pids)


@needs_cores
def test_retry_budget_bounds_the_suite():
    pids = _start_burners(8, 8)
    try:
        time.sleep(0.3)
        meter = QueryMeter()
        calls = []

        def run_once():
            calls.append(1)
            return meter.measure(lambda: _busy(0.3))

        rec = measure_with_retry(
            run_once, RetryBudget(0), ext_cores=4.0, min_wall=0.1
        )
        assert len(calls) == 1 and "retried" not in rec
    finally:
        _stop_burners(pids)


def test_retry_compares_on_build_free_handicap():
    """A first attempt that paid a one-time store build must not lose to
    its build-free retry on raw wall: selection keys on wall_handicap
    and build_all carries both attempts' builds for re-attachment
    (bench.py then charges the paid build exactly once)."""
    attempts = iter(
        [
            # wall 12 = 7 build + 5 probe, squeezed hard
            {"wall": 12.0, "build_s": 7.0, "wall_handicap": 5.0,
             "ext_cpu_s": 120.0, "cpu_total_s": 5.0, "host_cpu_s": 125.0},
            # retry: store reused, probe 6 — SLOWER probe than attempt 1
            {"wall": 6.0, "build_s": 0.0, "wall_handicap": 6.0,
             "ext_cpu_s": 1.0, "cpu_total_s": 5.0, "host_cpu_s": 6.0},
        ]
    )
    rec = measure_with_retry(
        lambda: next(attempts), RetryBudget(5), ext_cores=4.0, min_wall=0.1
    )
    assert rec["retried"] and rec["wall"] == 12.0, (
        "the build-paying attempt has the faster PROBE and must win"
    )
    assert rec["build_all"] == [7.0, 0.0]
    assert rec["wall_all"] == [12.0, 6.0]
