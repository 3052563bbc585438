"""SRP (sign-random-projection) LSH: the SQL hash chain pinned
bit-for-bit to core hll_hash64 (this catches the mistyped fmix
literals the 31-word vocab masked), sign-matrix determinism, measured
float margins (projection signs + cosine threshold) vs the
cross-engine error, small/distributed path equality, and DuckDB
oracle equality at sf0.001."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.core.fingerprint import hll_hash64
from textalyzer_ray.pipelines.srp import (
    _cosines,
    sign_matrix,
    srp_candidate_pairs,
)

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"


def test_sql_hash_chain_is_hll_hash64():
    """The _hll_hash64_oracle_ctes chain must reproduce hll_hash64
    exactly for arbitrary ASCII keys — not just keys whose downstream
    statistic is insensitive to the hash (the 31-word vocabulary let
    three wrong fmix literals pass every sketch oracle)."""
    import duckdb

    import __ray_entry__ as entry

    keys = [str(j) for j in range(64)] + ["hello", "a", "zz9", "portal"]
    con = duckdb.connect()
    # NB: the chain uses "i" as an internal position alias — the id
    # column must not be named "i"
    con.register("keys_src", pa.table({"k": keys, "kid": range(len(keys))}))
    chain = entry._hll_hash64_oracle_ctes("ks", "k", "kid")
    q = (
        "WITH RECURSIVE ks AS (SELECT k, kid FROM keys_src), "
        f"{chain} SELECT kid, hi, lo FROM bx3 ORDER BY kid"
    )
    for kid, hi, lo in con.sql(q).fetchall():
        assert (hi << 32) + lo == hll_hash64(keys[kid]), keys[kid]


def test_sign_matrix_deterministic_and_balanced():
    s = sign_matrix(64)
    assert s.shape == (64, 64)
    assert set(np.unique(s)) == {-1.0, 1.0}
    assert np.array_equal(s, sign_matrix(64))
    # hyperplanes must not be constant-sign (hash avalanche sanity)
    assert (np.abs(s.sum(axis=1)) < 40).all()


def _vectors(sf):
    import duckdb

    con = duckdb.connect()
    t = con.sql(
        f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in t])
    x = np.array([r[1] for r in t], dtype=np.float64)
    return ids, x


def test_measured_float_margins():
    import duckdb

    ids, x = _vectors(SF)
    s = sign_matrix(64)
    proj = x @ s.T
    # sign margin: min |projection| far above the ~1e-13 sum-order bound
    assert np.abs(proj).min() > 1e-7
    # cosine-threshold margin over ALL pairs vs the engine disagreement
    norms = np.linalg.norm(x, axis=1)
    xn = x / norms[:, None]
    cos = xn @ xn.T
    iu = np.triu_indices(len(ids), 1)
    margin = np.abs(cos[iu] - 0.3).min()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    dd = con.sql(
        "SELECT e1.vec_id, e2.vec_id, "
        "list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]), "
        "CAST(e2.embedding AS DOUBLE[])) AS c "
        "FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id "
        "LIMIT 20000"
    ).fetchall()
    maxdiff = max(
        abs(
            float(c)
            - float(
                _cosines(
                    x[ids.searchsorted(a)][None, :],
                    x[ids.searchsorted(b)][None, :],
                )[0]
            )
        )
        for a, b, c in dd
    )
    assert maxdiff < 1e-12
    assert margin > 1e5 * maxdiff, (margin, maxdiff)


def test_small_and_distributed_paths_equal():
    from textalyzer_ray.sources.tables import read_table

    emb = read_table(SF, "embeddings", columns=["vec_id", "embedding"])
    emb = emb.materialize()
    small = srp_candidate_pairs(emb, threshold=0.3).take_all()
    dist = srp_candidate_pairs(
        emb, threshold=0.3, small_threshold=0
    ).take_all()
    assert small == dist
    assert len(small) > 0


def test_oracle_equality_sf0001():
    import duckdb

    import __ray_entry__ as entry

    got = entry._q_srp_pairs(SF).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    exp = con.sql(entry.oracle_sql()["srp_pairs"]).df()
    assert got.columns.tolist() == exp.columns.tolist()
    assert len(got) == len(exp) > 0
    assert got.equals(exp)


def test_empty_input():
    t = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }
    )
    assert srp_candidate_pairs(rd.from_arrow(t)).take_all() == []
