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

from flink_cep_task_spark.benchutil import (
    HZ,
    QueryMeter,
    RetryBudget,
    measure_with_retry,
    tree_jiffies,
)

BURNER = """
import os, time
for _ in range({procs}):
    if os.fork() == 0:
        end = time.time() + {secs}
        while time.time() < end:
            pass
        os._exit(0)
os._exit(0)
"""


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


def test_retry_fires_under_external_load_and_cpu_total_stays_flat():
    """The crux: an out-of-tree burner inflates host_cpu_s/ext_cpu_s but
    NOT cpu_total_s, the squeeze trips the retry, and both attempts'
    walls land on the kept record."""
    # 8 detached cores for 12 s — reparented to init, outside our tree
    subprocess.run(
        [sys.executable, "-c", BURNER.format(procs=8, secs=12)], check=True
    )
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
    # our own CPU is load-independent: ~0.5 s per attempt in both runs,
    # while the burner's CPU showed up only in host/ext
    assert all(0.3 <= c <= 1.6 for c in cpu_per_attempt)
    assert rec["ext_cpu_s"] >= 2.0


def test_retry_budget_bounds_the_suite():
    subprocess.run(
        [sys.executable, "-c", BURNER.format(procs=8, secs=5)], check=True
    )
    time.sleep(0.3)
    meter = QueryMeter()
    calls = []

    def run_once():
        calls.append(1)
        return meter.measure(lambda: _busy(0.3))

    rec = measure_with_retry(run_once, RetryBudget(0), ext_cores=4.0, min_wall=0.1)
    assert len(calls) == 1 and "retried" not in rec
