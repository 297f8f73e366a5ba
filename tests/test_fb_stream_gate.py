"""Gate-twins for the stream-stream interval-join parity queries.

The driver-shaped check runs at sf0.001 (fast) — parity is the
headline, but the regression this file exists to pin is the TAIL FLUSH:
with a single watermark pusher (or a pusher that doesn't survive the
per-side event_type filters above withWatermark), the left-outer join
retains unmatched clicks from the last (interval + delay) of the data
forever, because join state eviction — which is what EMITS outer-null
rows — only runs in batches that process data. The scaffold's dual
both-type pushers exist for exactly that; the max-ts click assertion
below fails if they regress."""

from __future__ import annotations

import duckdb
import pytest

from flink_cep_task_spark.plans.cep_queries import (
    FOLLOWED_BY_STREAM_SQL,
    NOT_FOLLOWED_BY_STREAM_SQL,
    q_followed_by_stream,
    q_not_followed_by_stream,
)
from tests.conftest import SF_DIR, assert_parity


@pytest.fixture(scope="module")
def events_con():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    yield con
    con.close()


def test_followed_by_stream_parity(spark, events_con):
    assert_parity(q_followed_by_stream(spark, SF_DIR), events_con,
                  FOLLOWED_BY_STREAM_SQL)


def test_not_followed_by_stream_parity_and_tail_flush(spark, events_con):
    got = q_not_followed_by_stream(spark, SF_DIR)
    assert_parity(got, events_con, NOT_FOLLOWED_BY_STREAM_SQL)
    rows = got.collect()
    # no pusher sentinel leaks
    assert all(r["user_id"] >= 0 for r in rows)
    # the tail-flush pin: the latest click in the corpus sits within
    # (interval + delay) of the stream's end — precisely the state the
    # no-data batch never evicts — and must still be emitted
    last_click_ts, = events_con.execute(
        "SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) FROM events "
        "WHERE event_type = 'click'"
    ).fetchone()
    assert any(r["first_ts"] == last_click_ts for r in rows), (
        "tail click not flushed — outer-join state retained past the drain"
    )


def test_fb_workdir_empty_event_types(spark, tmp_path):
    # an events fixture with no click/purchase rows must yield an EMPTY
    # stream-join result (matching the trivially-empty oracle), not a
    # NoneType crash in the scaffold's time-range arithmetic
    import datetime

    from flink_cep_task_spark.plans.cep_queries import q_followed_by_stream

    d = tmp_path / "nofb_sf"
    d.mkdir()
    spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1, "view", 1.0, None)],
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    assert q_followed_by_stream(spark, str(d)).collect() == []
