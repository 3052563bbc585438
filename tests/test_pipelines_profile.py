"""Table profiler: null/distinct/min-max correctness on a planted
table, integer (not lexicographic) min/max merging, type refusal,
empty input, and DuckDB oracle equality at sf0.001."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.profile import profile_table

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"


def test_planted_nulls_and_distincts():
    t = pa.table(
        {
            "a": pa.array([5, None, 100, 9, 9, None], pa.int64()),
            "s": pa.array(["x", "y", None, "x", "z", "y"], pa.string()),
        }
    )
    got = {
        r["col"]: r
        for r in profile_table(rd.from_arrow(t).repartition(3)).take_all()
    }
    assert got["a"] == {
        "col": "a", "n": 6, "n_null": 2, "n_distinct": 3,
        "min_v": "5", "max_v": "100",
    }
    # "100" < "9" lexicographically — integer merge must say max=100
    assert got["s"] == {
        "col": "s", "n": 6, "n_null": 1, "n_distinct": 3,
        "min_v": "x", "max_v": "z",
    }


def test_unsupported_type_refused():
    t = pa.table({"f": pa.array([1.5], pa.float64())})
    with pytest.raises(ValueError, match="integer/string"):
        profile_table(rd.from_arrow(t)).take_all()


def test_empty_dataset():
    t = pa.table({"a": pa.array([], pa.int64())})
    got = profile_table(rd.from_arrow(t)).take_all()
    assert got == [
        {
            "col": "a", "n": 0, "n_null": 0, "n_distinct": 0,
            "min_v": None, "max_v": None,
        }
    ]


def test_oracle_equality_sf0001():
    import duckdb

    import __ray_entry__ as entry

    got = entry._q_table_profile(SF).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = con.sql(entry.oracle_sql()["table_profile"]).df()
    assert got.columns.tolist() == exp.columns.tolist()
    assert got.equals(exp)
