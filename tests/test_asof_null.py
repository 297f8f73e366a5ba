"""Divergence test for the max_by NULL-argument semantics gap.

Spark's max_by returns the value at the max key even when that value is
NULL; DuckDB's max_by SKIPS NULL arguments and surfaces an earlier
event's value. state_asof_snapshot coalesces the value to an
out-of-range sentinel before the fold (and nullif's it back in both
engines) so a NULL at a user's latest pre-cutoff event yields NULL from
BOTH, instead of a silent hash mismatch. The fixtures have no NULL
values, so this case needs a synthetic table."""

from __future__ import annotations

import datetime

import duckdb
import pytest

from flink_cep_task_spark.plans.analytics import (
    SNAPSHOT_ASOF_TS_S,
    STATE_ASOF_SQL,
    state_asof_snapshot,
)
from tests.conftest import assert_parity


@pytest.fixture(scope="module")
def null_value_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("asof_null_sf")
    base = SNAPSHOT_ASOF_TS_S

    def ts(off_s: int):
        return datetime.datetime.fromtimestamp(
            base + off_s, tz=datetime.timezone.utc
        ).replace(tzinfo=None)

    rows = [
        # user 1: latest pre-cutoff event has NULL value -> snapshot value NULL
        (1, ts(-3600), 1, "click", 10.0, None),
        (2, ts(-60), 1, "purchase", None, None),
        # user 2: NULL mid-history, latest value present -> snapshot 7.5
        (3, ts(-7200), 2, "click", None, None),
        (4, ts(-120), 2, "view", 7.5, None),
        # user 3: post-cutoff NULL must not matter
        (5, ts(-30), 3, "click", 3.25, None),
        (6, ts(+600), 3, "purchase", None, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_state_asof_null_value_parity(spark, null_value_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_value_sf_dir}/events.parquet/*.parquet')"
    )
    got = state_asof_snapshot(spark, null_value_sf_dir)
    assert_parity(got, con, STATE_ASOF_SQL)
    by_user = {r["user_id"]: r for r in (x.asDict() for x in got.collect())}
    assert by_user[1]["value"] is None  # NULL at latest survives the fold
    assert by_user[2]["value"] == 7.5
    assert by_user[3]["value"] == 3.25  # post-cutoff NULL excluded
    con.close()


def test_sentinel_outside_value_domain():
    """The sentinel trick assumes no legitimate value equals the
    sentinel (a collision would be silently reported as NULL, and
    oracle parity can't catch it because both engines apply the same
    transform). Pin the assumption against the real fixture domain AT
    EVERY SF THE GATES RUN (driver gate sf0.01, bench sf0.1 — checking
    only sf0.001 would miss a domain change in the larger fixtures):
    events.value is a non-negative metric, so the DECIMAL(18,2) floor
    sentinel is unreachable."""
    import duckdb

    # DuckDB scan instead of Spark: min() over all three parquet
    # fixtures in well under a second, no session work
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        mn = duckdb.sql(
            f"SELECT min(value) FROM read_parquet('/root/testdata/{sf}/events.parquet')"
        ).fetchone()[0]
        assert mn is not None and mn >= 0, (
            f"events.value domain changed at {sf} (min={mn}); revisit the "
            "max_by NULL sentinel in state_asof_snapshot/_diff_snap_exprs"
        )


def test_snapshot_diff_null_value_parity(spark, null_value_sf_dir):
    # snapshot_diff reuses the same sentinel-coalesced max_by fold for
    # BOTH snapshots; on this fixture user 1's state is (purchase, NULL)
    # at both cutoffs (unchanged, with NULLs compared via IS DISTINCT
    # FROM), and user 3 gains a post-t1 NULL-valued purchase (changed,
    # new_value NULL) — the exact max_by NULL cases that diverge between
    # engines without the sentinel
    from flink_cep_task_spark.plans.analytics import (
        SNAPSHOT_DIFF_SQL,
        snapshot_diff,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_value_sf_dir}/events.parquet/*.parquet')"
    )
    got = snapshot_diff(spark, null_value_sf_dir)
    assert_parity(got, con, SNAPSHOT_DIFF_SQL)
    by_user = {r["user_id"]: r.asDict() for r in got.collect()}
    assert by_user[1]["change"] == "unchanged"
    assert by_user[1]["old_value"] is None and by_user[1]["new_value"] is None
    assert by_user[3]["change"] == "changed"
    assert by_user[3]["old_value"] == 3.25 and by_user[3]["new_value"] is None
    con.close()
