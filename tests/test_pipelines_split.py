"""Stratified split: exact per-stratum counts, frac == 1 boundary
(the target-equals-total cut path), partitioning invariance, tiny
strata, and DuckDB oracle equality at sf0.001."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.curation import stratified_split

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"


def _docs(ids, langs):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def test_exact_counts_per_stratum():
    t = _docs(list(range(100)), ["en"] * 60 + ["de"] * 37 + ["zh"] * 3)
    res = stratified_split(rd.from_arrow(t).repartition(5)).to_pandas()
    got = res.groupby("lang").is_train.sum().to_dict()
    # floor(n * 4/5) exactly: 60->48, 37->29, 3->2
    assert got == {"en": 48, "de": 29, "zh": 2}


def test_frac_one_trains_everything():
    t = _docs(list(range(20)), ["en"] * 20)
    res = stratified_split(
        rd.from_arrow(t).repartition(3), train_num=1, train_den=1
    ).to_pandas()
    assert res.is_train.sum() == 20


def test_tiny_fraction_zero_rows():
    # floor(3 * 1/5) == 0: the stratum must train nothing, not crash
    t = _docs([1, 2, 3], ["zh"] * 3)
    res = stratified_split(
        rd.from_arrow(t), train_num=1, train_den=5
    ).to_pandas()
    assert res.is_train.sum() == 0


def test_partitioning_invariant():
    t = _docs(list(range(64)), ["en" if i % 3 else "de" for i in range(64)])
    a = (
        stratified_split(rd.from_arrow(t))
        .sort("doc_id")
        .to_pandas()
    )
    b = (
        stratified_split(rd.from_arrow(t).repartition(11))
        .sort("doc_id")
        .to_pandas()
    )
    assert a.equals(b)


def test_invalid_fraction_rejected():
    with pytest.raises(ValueError, match="fraction"):
        stratified_split(rd.from_arrow(_docs([1], ["en"])), train_num=6, train_den=5)


def test_oracle_equality_sf0001():
    import duckdb

    import __ray_entry__ as entry

    got = entry._q_stratified_split(SF).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = con.sql(entry.oracle_sql()["stratified_split"]).df()
    assert got.columns.tolist() == exp.columns.tolist()
    assert got.equals(exp)
