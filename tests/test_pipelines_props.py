"""JSON props rollup: malformed/missing-key exclusion, distinct-k
correctness across partitions that split a bucket, and DuckDB oracle
equality at sf0.001."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.analytics import props_rollup

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"


def _events(rows):
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "props": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_planted_rollup_and_malformed_rows():
    rows = [
        ("view", '{"k": 3}'),
        ("view", '{"k": 3}'),
        ("view", '{"k": 7}'),
        ("view", '{"k": 12}'),
        ("view", "not json"),        # excluded
        ("view", '{"other": 1}'),    # excluded (no k)
        ("click", '{"k": 3}'),
    ]
    got = props_rollup(rd.from_arrow(_events(rows))).take_all()
    assert got == [
        {
            "event_type": "click", "k_bucket": 0,
            "n_events": 1, "n_distinct_k": 1, "sum_k": 3,
        },
        {
            "event_type": "view", "k_bucket": 0,
            "n_events": 3, "n_distinct_k": 2, "sum_k": 13,
        },
        {
            "event_type": "view", "k_bucket": 1,
            "n_events": 1, "n_distinct_k": 1, "sum_k": 12,
        },
    ]


def test_distinct_exact_across_partitions():
    # the same (type, k) spread over many blocks must count distinct
    # ONCE (the per-block partial is a distinct, not a count)
    rows = [("view", '{"k": 5}')] * 50 + [("view", '{"k": 6}')] * 50
    got = props_rollup(
        rd.from_arrow(_events(rows)).repartition(10)
    ).take_all()
    assert got == [
        {
            "event_type": "view", "k_bucket": 0,
            "n_events": 100, "n_distinct_k": 2, "sum_k": 550,
        }
    ]


def test_oracle_equality_sf0001():
    import duckdb

    import __ray_entry__ as entry

    got = entry._q_props_rollup(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    exp = con.sql(entry.oracle_sql()["props_rollup"]).df()
    assert got.columns.tolist() == exp.columns.tolist()
    assert got.equals(exp)
