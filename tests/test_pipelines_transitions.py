"""Session transition counts: planted session-boundary semantics
(edges never cross a >gap break), intra-user ordering, empty input,
and DuckDB oracle equality at sf0.001."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.analytics import session_transitions

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"


def _events(rows):
    us = 1_000_000
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array(list(range(len(rows))), pa.int64()),
            "ts": pa.array(
                [r[1] * us for r in rows], pa.timestamp("us")
            ),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_gap_cuts_edge_and_order_is_by_ts():
    # user 7: a->b within gap, b->c across a 2000 s gap (NO edge),
    # c->d within gap again; user 9: single event (no edges).
    t = _events(
        [
            (7, 0, "a"),
            (7, 100, "b"),
            (7, 2200, "c"),
            (7, 2300, "d"),
            (9, 50, "x"),
        ]
    )
    got = session_transitions(rd.from_arrow(t).repartition(3)).take_all()
    assert got == [
        {"from_type": "a", "to_type": "b", "n_transitions": 1},
        {"from_type": "c", "to_type": "d", "n_transitions": 1},
    ]


def test_interleaved_users_do_not_mix():
    # rows arrive interleaved across users; edges must be per-user
    t = _events(
        [(1, 0, "a"), (2, 10, "p"), (1, 20, "b"), (2, 30, "q")]
    )
    got = session_transitions(rd.from_arrow(t).repartition(2)).take_all()
    assert got == [
        {"from_type": "a", "to_type": "b", "n_transitions": 1},
        {"from_type": "p", "to_type": "q", "n_transitions": 1},
    ]


def test_empty():
    t = _events([])
    assert session_transitions(rd.from_arrow(t)).take_all() == []


def test_oracle_equality_sf0001():
    import duckdb

    import __ray_entry__ as entry

    got = entry._q_session_transitions(SF).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    exp = con.sql(entry.oracle_sql()["session_transitions"]).df()
    assert got.columns.tolist() == exp.columns.tolist()
    assert got.equals(exp)
