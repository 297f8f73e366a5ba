"""Timer-fired tumbling windows (streaming/timers.py): the
transformWithStateInPandas operator with per-window registered EVENT-TIME
timers must produce exactly the batch tumbling aggregation — and the fired
window's state must be evicted (re-fire impossible)."""

from __future__ import annotations

import importlib.util
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flink_cep_task_spark.streaming.pipeline import await_stream
from flink_cep_task_spark.streaming.timers import timer_tumbling_windows

# transformWithStateInPandas speaks protobuf to the JVM state server; the
# sandbox image ships no google.protobuf and installs are disallowed, so
# this test runs wherever the dependency exists (any standard PySpark 4
# deployment) and SKIPS here — the operator itself is plain public API.
def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


_needs_protobuf = pytest.mark.skipif(
    not _has_protobuf(),
    reason="google.protobuf absent in this container; "
    "transformWithState state protocol requires it",
)

BASE = 1_700_000_000  # epoch seconds


def _write_batches(dirpath, batches):
    """One parquet file per batch, mtimes ordered so maxFilesPerTrigger=1
    replays them as separate micro-batches."""
    schema = pa.schema(
        [
            pa.field("event_time", pa.timestamp("us"), nullable=False),
            pa.field("group_id", pa.string(), nullable=False),
            pa.field("v", pa.int64(), nullable=False),
        ]
    )
    t0 = time.time() - 60
    for i, rows in enumerate(batches):
        tbl = pa.Table.from_pylist(
            [
                {"event_time": (BASE + off) * 1_000_000, "group_id": g, "v": v}
                for off, g, v in rows
            ],
            schema=schema,
        )
        p = os.path.join(dirpath, f"{i:04d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (t0 + i, t0 + i))


# The shared oracle: both timer operators replay the same 3-batch stream
# and must produce exactly these windows (also the batch tumbling result).
TIMER_EXPECTED = {
    ("g1", BASE - BASE % 60, BASE - BASE % 60 + 60): (12, 2, 5, 7),
    ("g1", BASE + 90 - (BASE + 90) % 60, BASE + 90 - (BASE + 90) % 60 + 60): (1, 1, 1, 1),
    ("g2", BASE - BASE % 60, BASE - BASE % 60 + 60): (3, 1, 3, 3),
}


def _run_timer_replay(spark, tmp_path, build) -> str:
    """Replay the canonical 3-batch stream through a timer operator
    builder; returns the memory-sink table name."""
    src = tmp_path / "timer-src"
    src.mkdir()
    day = 86_400
    _write_batches(
        src,
        [
            # batch 0: two windows of g1, one of g2
            [(0, "g1", 5), (30, "g1", 7), (90, "g1", 1), (10, "g2", 3)],
            # batch 1: watermark pusher (its own window fires later)
            [(day, "zz", 0)],
            # batch 2: second pusher — watermark passes every data window end
            [(day + 120, "zz", 0)],
        ],
    )
    stream = (
        spark.readStream.schema("event_time TIMESTAMP, group_id STRING, v LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = build(stream, size_s=60, watermark="1 minute")
    name = f"timer_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_timer"))
        .trigger(availableNow=True)
        .start()
    )
    await_stream(q, 180)
    return name


def _assert_timer_oracle(spark, name: str) -> None:
    got = {
        (r.group_id, r.window_start, r.window_end): (
            r.agg_sum,
            r.agg_cnt,
            r.agg_min,
            r.agg_max,
        )
        for r in spark.sql(f"select * from {name}").collect()
        if r.group_id != "zz"
    }
    assert got == TIMER_EXPECTED, f"timer windows diverged: {got}"
    # each window fired exactly once (fire-then-evict): no duplicates in
    # append output
    rows = spark.sql(f"select group_id, window_start, count(*) c from {name} "
                     "group by group_id, window_start having count(*) > 1").collect()
    assert not rows, f"window fired more than once: {rows}"


@_needs_protobuf
def test_timer_windows_match_batch_and_evict(spark, tmp_path):
    name = _run_timer_replay(spark, tmp_path, timer_tumbling_windows)
    _assert_timer_oracle(spark, name)


def test_groupstate_timer_windows_match_batch_and_evict(spark, tmp_path):
    """The timer-fired path END-TO-END in this container: the GroupState
    edition (applyInPandasWithState EventTimeTimeout — no protobuf state
    server) replays the same stream as the transformWithState test and
    must hit the identical oracle. This is the runnable proof of the
    T1/T3 timer semantics (register at window end, fire-then-evict) that
    the protobuf-gated twin can only provide on full deployments."""
    from flink_cep_task_spark.streaming.timers import timer_tumbling_windows_gs

    name = _run_timer_replay(spark, tmp_path, timer_tumbling_windows_gs)
    _assert_timer_oracle(spark, name)


class _FakeMapState:
    def __init__(self):
        self.d = {}

    def containsKey(self, key):
        return key in self.d

    def getValue(self, key):
        return self.d[key]

    def updateValue(self, key, value):
        self.d[key] = value

    def removeKey(self, key):
        del self.d[key]


class _FakeHandle:
    def __init__(self):
        self.state = _FakeMapState()
        self.timers = []

    def getMapState(self, name, kschema, vschema):
        return self.state

    def registerTimer(self, expiry_ms):
        self.timers.append(expiry_ms)


def test_processor_logic_with_fake_handle():
    """The operator's STATE/TIMER logic runs fine without Spark (the
    protobuf-gated test above covers the plumbing on full deployments):
    per-window running aggregates merge across batches, one timer per
    window registered on first touch, fire-then-evict on expiry."""
    import pandas as pd

    from flink_cep_task_spark.streaming.timers import TumblingTimerProcessor

    p = TumblingTimerProcessor(size_s=60)
    handle = _FakeHandle()
    p.init(handle)

    key = ("g1",)
    batch1 = pd.DataFrame({"ts_s": [0, 30, 90], "v": [5, 7, 1]})
    list(p.handleInputRows(key, iter([batch1]), None))
    assert handle.state.d == {(0,): (12, 2, 5, 7), (60,): (1, 1, 1, 1)}
    assert sorted(handle.timers) == [60_000, 120_000]

    # second batch touches an EXISTING window: merged, no re-registration
    batch2 = pd.DataFrame({"ts_s": [59], "v": [100]})
    list(p.handleInputRows(key, iter([batch2]), None))
    assert handle.state.d[(0,)] == (112, 3, 5, 100)
    assert len(handle.timers) == 2

    class _Info:
        def getExpiryTimeInMs(self):
            return 60_000

    fired = list(p.handleExpiredTimer(key, None, _Info()))
    assert len(fired) == 1
    row = fired[0].iloc[0]
    assert (row["window_start"], row["window_end"]) == (0, 60)
    assert (row["agg_sum"], row["agg_cnt"], row["agg_min"], row["agg_max"]) == (112, 3, 5, 100)
    assert (0,) not in handle.state.d, "fired window not evicted"
    # re-fire of the same timer finds no state and emits nothing
    assert list(p.handleExpiredTimer(key, None, _Info())) == []


def test_groupstate_timer_restart_resume(spark, tmp_path):
    """R1 for the timer path: stop after half the input (nothing has fired
    yet — the first window's partials live only in state), restart a NEW
    query from the SAME checkpoint, feed the rest + the watermark pusher.
    Every window fires exactly once, including the one whose partials were
    built before the restart."""
    from flink_cep_task_spark.streaming.timers import timer_tumbling_windows_gs

    src = tmp_path / "timer-rs-src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_timer_rs")
    out_dir = str(tmp_path / "timer_rs_out")
    day = 86_400

    def run_once() -> None:
        stream = (
            spark.readStream.schema("event_time TIMESTAMP, group_id STRING, v LONG")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = timer_tumbling_windows_gs(stream, size_s=60, watermark="1 minute")
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_stream(q, 180)

    # run 1: first half — watermark never passes a window end, so all
    # partials are state-only at shutdown
    _write_batches(src, [[(0, "g1", 5), (30, "g1", 7), (10, "g2", 3)]])
    run_once()
    if os.path.exists(out_dir):
        assert spark.read.parquet(out_dir).count() == 0

    # run 2 (SAME checkpoint): second half + pusher
    schema_rows = [
        [(90, "g1", 1)],
        [(day, "zz", 0)],
    ]
    # append with later mtimes than run 1's files
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            pa.field("event_time", pa.timestamp("us"), nullable=False),
            pa.field("group_id", pa.string(), nullable=False),
            pa.field("v", pa.int64(), nullable=False),
        ]
    )
    t0 = time.time() - 30
    for i, rows in enumerate(schema_rows):
        tbl = pa.Table.from_pylist(
            [
                {"event_time": (BASE + off) * 1_000_000, "group_id": g, "v": v}
                for off, g, v in rows
            ],
            schema=schema,
        )
        p = os.path.join(str(src), f"late_{i:04d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (t0 + i, t0 + i))
    run_once()

    got = {
        (r.group_id, r.window_start, r.window_end): (
            r.agg_sum, r.agg_cnt, r.agg_min, r.agg_max
        )
        for r in spark.read.parquet(out_dir).collect()
        if r.group_id != "zz"
    }
    assert got == TIMER_EXPECTED, f"restart lost or duplicated windows: {got}"


class _FakeGroupState:
    """Pure-python GroupState for model-testing the update function."""

    def __init__(self):
        self.value = None
        self.timeout = None
        self.wm = 0
        self.hasTimedOut = False

    @property
    def exists(self):
        return self.value is not None

    @property
    def get(self):
        return self.value

    def update(self, v):
        self.value = v

    def remove(self):
        self.value = None
        self.timeout = None

    def setTimeoutTimestamp(self, ms):
        self.timeout = ms

    def getCurrentWatermarkMs(self):
        return self.wm


def test_groupstate_timer_model_random():
    """Property test of the timer update function against a pandas batch
    oracle, replaying Spark's invocation protocol with a fake state:
    per micro-batch, data keys get hasTimedOut=False calls; expired
    dataless keys get hasTimedOut=True calls; the watermark advances
    from the PREVIOUS batches' max event time. Every non-late row is
    aggregated into its epoch window, every window fires exactly once,
    and all state is removed after the final flush."""
    import random

    import pandas as pd

    from flink_cep_task_spark.streaming.timers import timer_tumbling_windows_gs

    # reach the inner update function through the public builder is not
    # possible without a stream; reimplement the invocation instead by
    # importing the module and building the closure via a tiny shim
    import flink_cep_task_spark.streaming.timers as timers_mod

    size = 60
    delay_ms = 60_000
    rng = random.Random(7)

    for trial in range(8):
        n = rng.randint(1, 60)
        rows = [
            (rng.randint(0, 600), rng.choice(["g0", "g1", "g2"]), rng.randint(-5, 50))
            for _ in range(n)
        ]
        n_batches = rng.randint(1, 4)
        batches = [rows[i::n_batches] for i in range(n_batches)]
        batches.append([(100_000, "zz", 0)])  # flush pusher

        # --- build the same update closure the operator uses ---------
        captured = {}

        class _CaptureGroupBy:
            def applyInPandasWithState(self, fn, **kw):
                captured["fn"] = fn
                raise RuntimeError("capture-only")

        class _CaptureDF:
            def withWatermark(self, *a):
                return self

            def select(self, *a):
                return self

            def groupBy(self, *a):
                return _CaptureGroupBy()

        try:
            timer_tumbling_windows_gs(_CaptureDF(), size_s=size)
        except RuntimeError:
            pass
        update = captured["fn"]

        # --- replay Spark's protocol ---------------------------------
        states: dict[str, _FakeGroupState] = {}
        fired: list[tuple] = []
        oracle: dict[tuple, list] = {}
        wm = 0
        seen_max_ms = 0
        for batch in batches + [[]]:  # trailing no-data batch
            by_group: dict[str, list] = {}
            for ts, g, v in batch:
                by_group.setdefault(g, []).append((ts, v))
                seen_max_ms = max(seen_max_ms, ts * 1000)
            for g, evs in by_group.items():
                st = states.setdefault(g, _FakeGroupState())
                st.wm, st.hasTimedOut = wm, False
                pdf = pd.DataFrame(
                    {"ts_s": [e[0] for e in evs], "v": [e[1] for e in evs]}
                )
                for out in update((g,), iter([pdf]), st):
                    fired.extend(map(tuple, out.itertuples(index=False)))
                # oracle: non-late rows only (window end past current wm)
                for ts, v in evs:
                    ws = (ts // size) * size
                    if (ws + size) * 1000 <= wm:
                        continue
                    agg = oracle.setdefault((g, ws), [0, 0, None, None])
                    agg[0] += v
                    agg[1] += 1
                    agg[2] = v if agg[2] is None else min(agg[2], v)
                    agg[3] = v if agg[3] is None else max(agg[3], v)
            # end of batch: watermark advances, expired dataless keys fire
            wm = max(wm, seen_max_ms - delay_ms)
            for g, st in states.items():
                if g in by_group or st.timeout is None or st.timeout > wm:
                    continue
                st.wm, st.hasTimedOut = wm, True
                st.timeout = None
                for out in update((g,), iter([]), st):
                    fired.extend(map(tuple, out.itertuples(index=False)))

        got = {
            (g, ws, we): (s, c, mn, mx) for g, ws, we, s, c, mn, mx in fired
            if g != "zz"
        }
        expected = {
            (g, ws, ws + size): tuple(agg)
            for (g, ws), agg in oracle.items()
            if g != "zz"
        }
        assert got == expected, f"trial {trial}: {got} != {expected}"
        assert len(got) == len([k for k in fired if k[0] != "zz"]), "double fire"
        # after the flush, every data key's state is fully removed
        for g, st in states.items():
            if g != "zz":
                assert not st.exists, f"state leak for {g}: {st.value}"
