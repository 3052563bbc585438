"""Edit-distance similarity join: Myers bit-parallel kernel pinned to
the Wagner-Fischer reference (hypothesis), prefix-filter recall-1 vs
brute force on adversarial random corpora, sentinel short-string
recall, cross-path (small/distributed) equality, SQL string parity,
and DuckDB oracle equality at sf0.001."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from textalyzer_ray.core.editdist import (
    gram_ids,
    levenshtein_batch,
    levenshtein_ref,
)
from textalyzer_ray.pipelines.editsim import edit_similarity_join

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"


@given(
    st.lists(
        st.tuples(
            st.binary(min_size=0, max_size=64),
            st.binary(min_size=0, max_size=80),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=60, deadline=None)
def test_myers_kernel_matches_reference(pairs):
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    got = levenshtein_batch(pats, txts)
    exp = np.array([levenshtein_ref(a, b) for a, b in pairs])
    assert (got == exp).all()


def test_long_patterns_route_to_multiword_kernel():
    # r5: patterns > 64 bytes take the multi-word Myers kernel instead
    # of raising — exactness incl. the 64/65 word boundary
    got = levenshtein_batch(
        [b"a" * 65, b"a" * 64, b"ab" * 64], [b"b", b"a" * 65, b"ba" * 64]
    )
    assert got.tolist() == [
        levenshtein_ref(b"a" * 65, b"b"),
        levenshtein_ref(b"a" * 64, b"a" * 65),
        levenshtein_ref(b"ab" * 64, b"ba" * 64),
    ]


def test_featurize_rejects_overlong_strings():
    # the JOIN still bounds string length via max_bytes (default 64)
    from textalyzer_ray.pipelines.editsim import _featurize_table

    t = pa.table({"doc_id": [1], "s": ["a" * 65]})
    with pytest.raises(ValueError):
        _featurize_table(t, "doc_id", "s", 2, pa.int64())
    out = _featurize_table(t, "doc_id", "s", 2, pa.int64(), max_bytes=128)
    assert out["slen"].to_pylist() == [65]


def test_gram_ids_distinct_sorted():
    g = gram_ids(b"ababab", 2)
    assert g.tolist() == sorted(set([ord("a") * 256 + ord("b"),
                                     ord("b") * 256 + ord("a")]))
    assert gram_ids(b"x", 2).size == 0


def brute(ids, strs, d):
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            dist = levenshtein_ref(
                strs[i].encode("utf-8"), strs[j].encode("utf-8")
            )
            if dist <= d:
                out.append((ids[i], ids[j], dist))
    return sorted(out)


def run(tbl, d, **kw):
    got = (
        edit_similarity_join(rd.from_arrow(tbl).repartition(4), d, **kw)
        .sort(["id_a", "id_b"])
        .take_all()
    )
    return [(r["id_a"], r["id_b"], r["dist"]) for r in got]


def _random_corpus(seed, n, alpha="abcdef", min_len=0, max_len=30):
    rng = random.Random(seed)
    base = "".join(rng.choice(alpha) for _ in range(max_len))
    strs = []
    for _ in range(n):
        # mutate the shared base so near pairs are dense
        s = list(base[: rng.randint(min_len, max_len)])
        for _ in range(rng.randint(0, 4)):
            op = rng.randint(0, 2)
            p = rng.randint(0, max(0, len(s) - 1)) if s else 0
            if op == 0 and s:
                s[p] = rng.choice(alpha)
            elif op == 1 and s:
                del s[p]
            else:
                s.insert(p, rng.choice(alpha))
        strs.append("".join(s))
    return strs


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_recall_one_vs_brute_force(seed):
    strs = _random_corpus(seed, 60)
    ids = list(range(len(strs)))
    tbl = pa.table({"doc_id": ids, "s": strs})
    for d in (1, 2):
        assert run(tbl, d) == brute(ids, strs, d)


def test_short_string_sentinel_recall():
    # every string has <= q*d distinct grams; qualifying pairs can
    # share NO grams — only the sentinel block can catch them
    strs = ["ab", "cd", "a", "", "xy", "abx"]
    ids = list(range(len(strs)))
    tbl = pa.table({"doc_id": ids, "s": strs})
    assert run(tbl, 2) == brute(ids, strs, 2)


@given(
    st.lists(
        st.tuples(
            st.binary(min_size=0, max_size=200),
            st.binary(min_size=0, max_size=260),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=40, deadline=None)
def test_multiword_myers_matches_reference(pairs):
    # force the multi-word path even when hypothesis draws short
    # strings: one long sentinel pattern raises the batch word count
    pairs = pairs + [(b"z" * 129, b"z" * 128)]
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    got = levenshtein_batch(pats, txts)
    exp = np.array([levenshtein_ref(a, b) for a, b in pairs])
    assert (got == exp).all()


@given(
    st.lists(st.text(alphabet="abcxyz 01", max_size=40), min_size=1, max_size=30),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=40, deadline=None)
def test_vectorized_featurize_matches_gram_ids(strs, q):
    # r5 featurize is one numpy pass over the batch's concatenated
    # bytes — pinned blob/count-equal to the scalar core.gram_ids
    from textalyzer_ray.pipelines.editsim import _featurize_table

    t = pa.table({"doc_id": list(range(len(strs))), "s": strs})
    out = _featurize_table(t, "doc_id", "s", q, pa.int64())
    for s, blob, ng, slen in zip(
        strs,
        out["grams"].to_pylist(),
        out["ng"].to_pylist(),
        out["slen"].to_pylist(),
    ):
        g = gram_ids(s.encode("utf-8"), q)
        assert blob == g.tobytes()
        assert ng == len(g)
        assert slen == len(s.encode("utf-8"))


@pytest.mark.parametrize("seed", [11, 12])
def test_recall_one_vs_brute_force_long_strings(seed):
    # 64–256-byte strings: blocks verify through the multi-word kernel
    strs = _random_corpus(seed, 40, min_len=64, max_len=240)
    assert max(len(s) for s in strs) > 64
    ids = list(range(len(strs)))
    tbl = pa.table({"doc_id": ids, "s": strs})
    for d in (1, 2):
        assert run(tbl, d, max_bytes=256) == brute(ids, strs, d)
    # the <= 64 B contract still raises without the opt-in
    with pytest.raises(Exception):
        run(tbl, 2)


def test_small_and_distributed_paths_equal():
    import __ray_entry__ as entry

    ds = entry._editsim_strings(SF).materialize()
    small = (
        edit_similarity_join(ds, 2)
        .sort(["id_a", "id_b"])
        .take_all()
    )
    dist = (
        edit_similarity_join(ds, 2, small_threshold=0)
        .sort(["id_a", "id_b"])
        .take_all()
    )
    assert small == dist
    assert len(small) > 0


def test_oracle_equality_sf0001():
    import duckdb

    import __ray_entry__ as entry

    got = entry._q_editsim_pairs(SF).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = con.sql(entry.oracle_sql()["editsim_pairs"]).df()
    assert got.columns.tolist() == exp.columns.tolist()
    assert len(got) == len(exp) > 0
    assert got.equals(exp)


def test_sql_string_parity_sf0001():
    import duckdb

    import __ray_entry__ as entry

    t = pa.concat_tables(
        list(
            entry._editsim_strings(SF).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
    ).sort_by("doc_id")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = (
        "WITH es AS (SELECT doc_id, 'log entry ' || (doc_id // 5) || "
        "' host srv' || ((doc_id // 5) % 7) || '"
        + entry._EDITSIM_SUFFIX
        + "' AS b, doc_id % 5 AS v FROM documents) "
        "SELECT doc_id, CASE v WHEN 0 THEN b "
        "WHEN 1 THEN substr(b, 1, length(b)-1) || 'x' "
        "WHEN 2 THEN substr(b, 1, length(b)-2) "
        "WHEN 3 THEN substr(b, 1, length(b)-7) || 'z' || "
        "substr(b, length(b)-5) "
        "ELSE substr(b, 1, length(b)-11) || substr(b, length(b)-9) END AS s "
        "FROM es ORDER BY doc_id"
    )
    exp = dict(con.sql(sql).fetchall())
    got = dict(zip(t["doc_id"].to_pylist(), t["s"].to_pylist()))
    assert got == exp
    assert max(len(s.encode()) for s in got.values()) <= 64


def test_long_oracle_equality_sf0001():
    import duckdb

    import __ray_entry__ as entry

    got = entry._q_editsim_long_pairs(SF).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = con.sql(entry.oracle_sql()["editsim_long_pairs"]).df()
    assert got.columns.tolist() == exp.columns.tolist()
    assert len(got) == len(exp) > 0
    assert got.equals(exp)


def test_long_sql_string_parity_sf0001():
    import duckdb

    import __ray_entry__ as entry

    t = pa.concat_tables(
        list(
            entry._editsim_long_strings(SF).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
    ).sort_by("doc_id")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = (
        "WITH es AS (" + entry._editsim_long_base_sql() + ") "
        "SELECT doc_id, CASE v WHEN 0 THEN b "
        "WHEN 1 THEN substr(b, 1, length(b)-1) || 'x' "
        "WHEN 2 THEN substr(b, 1, length(b)-2) "
        "WHEN 3 THEN substr(b, 1, length(b)-7) || 'z' || "
        "substr(b, length(b)-5) "
        "ELSE substr(b, 1, length(b)-11) || substr(b, length(b)-9) END AS s "
        "FROM es ORDER BY doc_id"
    )
    exp = dict(con.sql(sql).fetchall())
    got = dict(zip(t["doc_id"].to_pylist(), t["s"].to_pylist()))
    assert got == exp
    lens = [len(s.encode()) for s in got.values()]
    # the whole corpus exercises the multi-word kernel: > 64 B always
    assert min(lens) > 64 and max(lens) <= 256


def test_duplicate_free_and_empty_inputs():
    far = pa.table(
        {"doc_id": [0, 1, 2], "s": ["aaaaaaaaaa", "bbbbbbbbbb", "cccccccccc"]}
    )
    assert run(far, 2) == []
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "s": pa.array([], pa.string())}
    )
    got = (
        edit_similarity_join(rd.from_arrow(empty), 2)
        .take_all()
    )
    assert got == []


def test_rejects_oversize_strings():
    tbl = pa.table({"doc_id": [0], "s": ["a" * 65]})
    with pytest.raises(Exception, match="64 bytes"):
        run(tbl, 2)
