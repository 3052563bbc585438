"""Sorted-neighborhood blocking: planted window semantics (only pairs
within the window are candidates), block-boundary carry-in correctness
under aggressive partitioning, threshold margins, and DuckDB oracle
equality at sf0.001."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.snm import sorted_neighborhood_pairs

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"


def _docs(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_window_bounds_candidates():
    # ids 0/1 are identical twins (adjacent in length order); id 9 is
    # ALSO identical but pushed > window-1 positions away by 7 decoy
    # docs of intermediate lengths -> SNM must miss it (recall < 1 is
    # the documented trade), and find only the adjacent twin.
    twin = "alpha beta gamma delta epsilon"
    rows = [(0, twin), (1, twin)]
    rows += [(2 + i, "x" * (31 + i) + " y z") for i in range(7)]
    rows.append((9, twin + "          "))  # longer byte length, same tokens
    got = (
        sorted_neighborhood_pairs(rd.from_arrow(_docs(rows)), window=3)
        .sort(["id_a", "id_b"])
        .take_all()
    )
    assert [(r["id_a"], r["id_b"]) for r in got] == [(0, 1)]


def test_boundary_pairs_survive_partitioning():
    # identical docs adjacent in sort order must pair regardless of
    # how many blocks the sorted dataset lands in (carry-in path)
    rows = [(i, f"w{'x' * (i // 2)} common tail tokens here") for i in range(40)]
    for parts in (1, 13):
        got = (
            sorted_neighborhood_pairs(
                rd.from_arrow(_docs(rows)).repartition(parts), window=4
            )
            .sort(["id_a", "id_b"])
            .take_all()
        )
        pairs = [(r["id_a"], r["id_b"]) for r in got]
        # every (2k, 2k+1) twin shares its full text -> jaccard 1
        expect = [(2 * k, 2 * k + 1) for k in range(20)]
        assert pairs == expect


def test_carry_guard_refuses_oversized_driver_state():
    # r5: the blocks x (window-1) driver carry is measured and refused
    # above the guard instead of silently growing the driver dict
    t = _docs([(i, f"doc number {i} with words") for i in range(40)])
    with pytest.raises(ValueError, match="driver guard"):
        sorted_neighborhood_pairs(
            rd.from_arrow(t).repartition(8), window=4, carry_guard_rows=2
        ).materialize()
    # bytes guard fires independently
    with pytest.raises(ValueError, match="driver guard"):
        sorted_neighborhood_pairs(
            rd.from_arrow(t).repartition(8), window=4, carry_guard_bytes=8
        ).materialize()


def test_rejects_tiny_window():
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(rd.from_arrow(_docs([(1, "a")])), window=1)


def test_measured_threshold_margins():
    import duckdb

    import __ray_entry__ as entry

    # candidate jaccards must stay clear of the 0.7 membership cut by
    # orders more than the ~1e-16 int/int division parity error
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = entry.oracle_sql()["sorted_neighborhood"]
    nothr = sql.replace(
        "WHERE CAST(ix AS DOUBLE) / (na.sz + nb.sz - ix) >= 0.7 ", ""
    )
    m = con.sql(
        f"SELECT min(abs(jaccard - 0.7)) FROM ({nothr})"
    ).fetchone()[0]
    assert m > 0.1  # measured 0.164 at sf0.001, 0.157 at sf0.01


def test_oracle_equality_sf0001():
    import duckdb

    import __ray_entry__ as entry

    got = entry._q_sorted_neighborhood(SF).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = con.sql(entry.oracle_sql()["sorted_neighborhood"]).df()
    assert got.columns.tolist() == exp.columns.tolist()
    assert len(got) == 38
    assert got.equals(exp)
