"""Efraimidis-Spirakis weighted sample: weight monotonicity on a
planted corpus, non-positive-weight exclusion, k > n, partitioning
invariance, MEASURED float margins (the CLAUDE.md float-parity
protocol for the ln() key), and DuckDB oracle equality at sf0.001."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.core.fingerprint import hll_hash64_array
from textalyzer_ray.pipelines.curation import weighted_sample

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"


def _docs(ids, weights):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array(weights, pa.int64()),
        }
    )


def _keys(ids, weights):
    h = hll_hash64_array([str(i) for i in ids]).astype(np.float64)
    return np.log((h + 0.5) / 2.0**64) / np.asarray(weights, np.float64)


def test_matches_numpy_reference_and_partitioning():
    ids = list(range(200))
    ws = [(i % 7) * 100 + 1 for i in ids]
    key = _keys(ids, ws)
    order = np.lexsort((ids, -key))[:16]
    expect = [int(i) for i in np.asarray(ids)[order]]
    for parts in (1, 9):
        got = (
            weighted_sample(
                rd.from_arrow(_docs(ids, ws)).repartition(parts), k=16
            )
            .to_pandas()
        )
        assert got["doc_id"].tolist() == expect
        assert got["rank"].tolist() == list(range(1, 17))


def test_nonpositive_weights_excluded():
    ids = [1, 2, 3, 4]
    got = weighted_sample(
        rd.from_arrow(_docs(ids, [0, -5, 10, 10])), k=10
    ).to_pandas()
    assert set(got["doc_id"]) == {3, 4}


def test_k_larger_than_corpus():
    got = weighted_sample(
        rd.from_arrow(_docs([7, 8], [1, 1])), k=100
    ).to_pandas()
    assert len(got) == 2


def test_heavier_rows_dominate_in_expectation():
    # two planted weight classes 1 vs 1000 in equal numbers: the top
    # quarter of ranks must be overwhelmingly heavy-class (ES property)
    ids = list(range(400))
    ws = [1000 if i % 2 else 1 for i in ids]
    got = weighted_sample(rd.from_arrow(_docs(ids, ws)), k=100).to_pandas()
    heavy = sum(1 for d in got["doc_id"][:25] if d % 2)
    assert heavy >= 23


def test_measured_margins_sf0001():
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    key = _keys(t["doc_id"].to_pylist(), t["n_chars"].to_numpy())
    s = np.sort(key)[::-1][:128]
    gaps = -np.diff(s)
    rel = gaps / np.abs(s[:-1])
    # cross-engine ln() disagrees at ~1e-16 relative; the rank order
    # is safe while adjacent gaps stay orders above that
    assert rel.min() > 1e-9


def test_oracle_equality_sf0001():
    import duckdb

    import __ray_entry__ as entry

    got = entry._q_weighted_sample(SF).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = con.sql(entry.oracle_sql()["weighted_sample"]).df()
    assert got.columns.tolist() == exp.columns.tolist()
    assert got.equals(exp)
