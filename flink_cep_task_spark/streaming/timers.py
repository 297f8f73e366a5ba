"""Timer-fired tumbling windows via transformWithStateInPandas — the
engine's analog of the reference's trigger/timer machinery with REAL
registered timers (T1/T3).

The reference registers a wall-clock Timer at each window end
(TriggerCenter.java:22-26, register(...) schedules `fire()` at
window.getEnd()) and REFUSES past-due registrations — so any window whose
end has already passed when its first event arrives silently never fires
(SURVEY quirk Q4; the deliberate non-port T3). This operator keeps the
register-a-timer-per-window SHAPE but swaps the clock: timers are
EVENT-TIME timers that expire when the WATERMARK passes the window end —
replay-safe, late-data-aware, and a window can never be lost to slow
wall-clock scheduling. The rest of the engine reaches the same semantics
declaratively (watermark + windowed aggregation); this operator exists
for parity with rule engines that need per-key timer side effects
(timeout alarms, state eviction on inactivity) that pure windowed
aggregation cannot express.

State per (group) key: MapState[window_start → (sum, cnt, min, max)]
running aggregates over exact pre-scaled integer measures (cents), so
results are order-independent and bit-comparable to the batch twin. One
event-time timer per live window, registered on the window's FIRST event;
handleExpiredTimer emits the finished window and evicts its state — the
fire-then-clear of Window.java:58-63 + state eviction, minus the
wall-clock defect.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

if TYPE_CHECKING:  # imported lazily by Spark workers otherwise
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        TimerValues,
    )

TIMER_OUTPUT_SCHEMA = (
    "group_id STRING, window_start LONG, window_end LONG, "
    "agg_sum LONG, agg_cnt LONG, agg_min LONG, agg_max LONG"
)


class TumblingTimerProcessor(StatefulProcessor):
    """Per-key tumbling windows fired by per-window event-time timers."""

    def __init__(self, size_s: int) -> None:
        self.size_s = size_s

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.win = handle.getMapState(
            "win", "ws LONG", "s LONG, c LONG, mn LONG, mx LONG"
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        size = self.size_s
        for pdf in rows:
            ws_col = (pdf["ts_s"] // size) * size
            grouped = pdf.assign(ws=ws_col).groupby("ws")["v"]
            stats = grouped.agg(["sum", "count", "min", "max"])
            for ws, row in stats.iterrows():
                ws = int(ws)
                if self.win.containsKey((ws,)):
                    s, c, mn, mx = self.win.getValue((ws,))
                    self.win.updateValue(
                        (ws,),
                        (
                            s + int(row["sum"]),
                            c + int(row["count"]),
                            min(mn, int(row["min"])),
                            max(mx, int(row["max"])),
                        ),
                    )
                else:
                    self.win.updateValue(
                        (ws,),
                        (int(row["sum"]), int(row["count"]), int(row["min"]), int(row["max"])),
                    )
                    # first event of this window ⇒ register ITS timer at the
                    # window end (TriggerCenter.register), event-time clock
                    self.handle.registerTimer((ws + size) * 1000)
        return iter([])

    def handleExpiredTimer(
        self, key: Any, timerValues: "TimerValues", expiredTimerInfo: "ExpiredTimerInfo"
    ) -> Iterator[pd.DataFrame]:
        we = expiredTimerInfo.getExpiryTimeInMs() // 1000
        ws = we - self.size_s
        if not self.win.containsKey((ws,)):
            return iter([])
        s, c, mn, mx = self.win.getValue((ws,))
        self.win.removeKey((ws,))  # fire-then-evict (Window.java:58-63)
        return iter(
            [
                pd.DataFrame(
                    {
                        "group_id": [key[0]],
                        "window_start": [ws],
                        "window_end": [we],
                        "agg_sum": [s],
                        "agg_cnt": [c],
                        "agg_min": [mn],
                        "agg_max": [mx],
                    }
                )
            ]
        )

    def close(self) -> None:
        pass


GS_STATE_SCHEMA = (
    "starts ARRAY<LONG>, sums ARRAY<LONG>, cnts ARRAY<LONG>, "
    "mins ARRAY<LONG>, maxs ARRAY<LONG>"
)


def timer_tumbling_windows_gs(
    metrics: DataFrame, size_s: int, watermark: str = "1 minute"
) -> DataFrame:
    """GroupState edition of timer_tumbling_windows: identical contract and
    output schema, driven by applyInPandasWithState EVENT-TIME timeouts —
    which need no protobuf runtime (unlike transformWithState's state
    server protocol), so the timer-fired path is end-to-end testable in
    every environment, including this container.

    The GroupState API carries ONE timeout per key, so the reference's
    one-timer-per-window registration (TriggerCenter.java:22-26) is
    emulated the standard way: the timeout always sits at the EARLIEST
    open window's end; firing emits every window the watermark has passed
    (fire-then-evict, Window.java:58-63) and re-arms for the next earliest.
    Observationally identical — each window fires exactly once when the
    watermark passes its end."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    size = size_s

    def load(state: "GroupState") -> dict[int, list[int]]:
        if not state.exists:
            return {}
        starts, sums, cnts, mins, maxs = state.get
        return {
            ws: [s, c, mn, mx]
            for ws, s, c, mn, mx in zip(starts, sums, cnts, mins, maxs)
        }

    def fire_and_save(
        key: tuple, win: dict[int, list[int]], state: "GroupState", wm: int
    ):
        closed = {
            ws: agg for ws, agg in win.items() if (ws + size) * 1000 <= wm
        }
        for ws in closed:
            del win[ws]  # fire-then-evict: a re-fire finds no state
        if win:
            state.update((
                list(win.keys()),
                [a[0] for a in win.values()],
                [a[1] for a in win.values()],
                [a[2] for a in win.values()],
                [a[3] for a in win.values()],
            ))
            # timer for the earliest still-open window end (strictly past
            # the current watermark, as the API requires)
            state.setTimeoutTimestamp(max((min(win) + size) * 1000, wm + 1))
        elif state.exists:
            # last window fired: REMOVE the key's state instead of keeping
            # an empty-arrays entry forever — with churning keys an
            # un-removed entry per key-ever-seen is an unbounded state leak
            state.remove()
        if not closed:
            return
        starts = sorted(closed)
        yield pd.DataFrame(
            {
                "group_id": [key[0]] * len(starts),
                "window_start": starts,
                "window_end": [ws + size for ws in starts],
                "agg_sum": [closed[ws][0] for ws in starts],
                "agg_cnt": [closed[ws][1] for ws in starts],
                "agg_min": [closed[ws][2] for ws in starts],
                "agg_max": [closed[ws][3] for ws in starts],
            }
        )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        win = load(state)
        if not state.hasTimedOut:
            for pdf in pdfs:
                ws_col = (pdf["ts_s"] // size) * size
                stats = (
                    pdf.assign(ws=ws_col).groupby("ws")["v"]
                    .agg(["sum", "count", "min", "max"])
                )
                for ws, row in stats.iterrows():
                    ws = int(ws)
                    if (ws + size) * 1000 <= wm:
                        continue  # late row: its window already fired
                    agg = win.get(ws)
                    if agg is None:
                        win[ws] = [
                            int(row["sum"]), int(row["count"]),
                            int(row["min"]), int(row["max"]),
                        ]
                    else:
                        agg[0] += int(row["sum"])
                        agg[1] += int(row["count"])
                        agg[2] = min(agg[2], int(row["min"]))
                        agg[3] = max(agg[3], int(row["max"]))
        yield from fire_and_save(key, win, state, wm)

    src = metrics.withWatermark("event_time", watermark).select(
        "group_id",
        F.col("event_time").cast("long").alias("ts_s"),
        "v",
        "event_time",
    )
    return src.groupBy("group_id").applyInPandasWithState(
        update,
        outputStructType=TIMER_OUTPUT_SCHEMA,
        stateStructType=GS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def timer_tumbling_windows(
    metrics: DataFrame, size_s: int, watermark: str = "1 minute"
) -> DataFrame:
    """Streaming tumbling windows whose firing is driven by registered
    event-time timers. `metrics` needs (event_time TIMESTAMP, group_id
    STRING, v LONG) — v pre-scaled to an exact integer unit by the caller.
    """
    from pyspark.sql import functions as F

    src = (
        metrics.withWatermark("event_time", watermark)
        .select(
            "group_id",
            F.col("event_time").cast("long").alias("ts_s"),
            "v",
            "event_time",
        )
    )
    return src.groupBy("group_id").transformWithStateInPandas(
        statefulProcessor=TumblingTimerProcessor(size_s),
        outputStructType=TIMER_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
