"""Distributed Lloyd k-means (pipelines/similarity.kmeans_assign):
numpy-reference equality, empty-cluster carry, and the measured
float-parity margins that certify the DuckDB hash oracle."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.similarity import kmeans_assign

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _emb_table(n=60, dim=8, seed=11):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim).astype(np.float32)
    return (
        pa.table(
            {
                "vec_id": list(range(n)),
                "embedding": pa.array(
                    [r.tolist() for r in m], pa.list_(pa.float32())
                ),
            }
        ),
        m.astype(np.float64),
    )


def _reference(m: np.ndarray, k: int, n_iter: int):
    """Pure-numpy Lloyd matching the pipeline contract: init = first k
    rows (id order), n_iter mean updates with empty-cluster carry, one
    final assignment. Returns (assignments, per-round min margins)."""
    cents = m[:k].copy()
    margins = []
    for it in range(n_iter + 1):
        d2 = ((m[:, None, :] - cents[None]) ** 2).sum(axis=2)
        p = np.partition(d2, 1, axis=1)
        margins.append(float((p[:, 1] - p[:, 0]).min()))
        a = np.argmin(d2, axis=1)
        if it == n_iter:
            break
        new = cents.copy()
        for j in range(k):
            sel = m[a == j]
            if len(sel):
                new[j] = sel.sum(axis=0) / len(sel)
        cents = new
    return a, margins


class TestKmeansAssign:
    def test_matches_numpy_reference_synthetic(self):
        t, m = _emb_table()
        got = (
            kmeans_assign(rd.from_arrow(t), k=5, n_iter=3)
            .sort("vec_id")
            .to_pandas()
        )
        want, _ = _reference(m, k=5, n_iter=3)
        assert got["vec_id"].tolist() == list(range(len(m)))
        assert got["cluster"].tolist() == want.tolist()
        assert str(got["cluster"].dtype) == "int64"

    def test_shuffled_input_order_invariant(self):
        t, m = _emb_table(n=40, seed=3)
        perm = np.random.RandomState(0).permutation(40)
        shuffled = t.take(pa.array(perm))
        got = (
            kmeans_assign(rd.from_arrow(shuffled), k=4, n_iter=2)
            .sort("vec_id")
            .to_pandas()
        )
        want, _ = _reference(m, k=4, n_iter=2)
        assert got["cluster"].tolist() == want.tolist()

    def test_empty_cluster_keeps_centroid(self):
        # two tight clusters far apart, k=3: the third init centroid
        # (row 2, inside cluster A) loses all points after round 1 in
        # the reference iff every point is closer to an updated mean —
        # either way pipeline must equal the reference exactly.
        m = np.zeros((20, 4), dtype=np.float32)
        m[:10] += 0.01 * np.arange(10)[:, None].astype(np.float32)
        m[10:] += 100.0
        m[10:] += 0.01 * np.arange(10)[:, None].astype(np.float32)
        t = pa.table(
            {
                "vec_id": list(range(20)),
                "embedding": pa.array(
                    [r.tolist() for r in m], pa.list_(pa.float32())
                ),
            }
        )
        got = (
            kmeans_assign(rd.from_arrow(t), k=3, n_iter=4)
            .sort("vec_id")
            .to_pandas()
        )
        want, _ = _reference(m.astype(np.float64), k=3, n_iter=4)
        assert got["cluster"].tolist() == want.tolist()

    def test_fewer_rows_than_k_raises(self):
        t, _ = _emb_table(n=3)
        with pytest.raises(ValueError, match="fewer than k"):
            kmeans_assign(rd.from_arrow(t), k=8, n_iter=1)

    @pytest.mark.parametrize("sf_dir", SF_DIRS)
    def test_oracle_margin_certified(self, sf_dir):
        """The kmeans_clusters DuckDB oracle compares integer
        assignments whose floats were computed independently in each
        engine; the comparison is sound only while the min assignment
        margin dwarfs the cross-engine sum-order error (~1e-12 for
        <=64-dim distances over <=2000-point means). Pin that measured
        gap (CLAUDE.md float-parity rule)."""
        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        ids = t["vec_id"].to_numpy()
        m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        m = m[np.argsort(ids, kind="stable")]
        _, margins = _reference(m, k=8, n_iter=4)
        assert min(margins) > 1e-7, margins

    def test_sf0001_matches_reference(self):
        from textalyzer_ray.sources.tables import read_table

        sf = "/root/testdata/sf0.001"
        ds = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
        got = kmeans_assign(ds, k=8, n_iter=4).sort("vec_id").to_pandas()
        t = pq.read_table(f"{sf}/embeddings.parquet")
        ids = t["vec_id"].to_numpy()
        m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        order = np.argsort(ids, kind="stable")
        want, _ = _reference(m[order], k=8, n_iter=4)
        assert got["vec_id"].tolist() == sorted(ids.tolist())
        assert got["cluster"].tolist() == want.tolist()


class TestClusterBalancedSample:
    def _reference(self, m, k, n_iter, per_cluster):
        a, _ = _reference(m, k, n_iter)
        out = []
        for c in range(k):
            ids = np.flatnonzero(a == c)
            h = (ids.astype(np.uint64) & 0xFFFFFFFF) * 2654435761 & 0xFFFFFFFF
            order = np.lexsort((ids, h))
            out.extend(int(i) for i in ids[order][:per_cluster])
        return sorted(out), a

    def test_matches_brute_force(self):
        from textalyzer_ray.pipelines.similarity import cluster_balanced_sample

        t, m = _emb_table(n=80, seed=7)
        got = (
            cluster_balanced_sample(
                rd.from_arrow(t), per_cluster=5, k=4, n_iter=2
            )
            .sort("vec_id")
            .to_pandas()
        )
        want_ids, a = self._reference(m, 4, 2, 5)
        assert got["vec_id"].tolist() == want_ids
        assert got["cluster"].tolist() == [int(a[i]) for i in want_ids]

    def test_partitioning_invariant(self):
        from textalyzer_ray.pipelines.similarity import cluster_balanced_sample

        t, _ = _emb_table(n=80, seed=7)
        one = (
            cluster_balanced_sample(
                rd.from_arrow(t), per_cluster=5, k=4, n_iter=2
            )
            .sort("vec_id")
            .to_pandas()
        )
        many = (
            cluster_balanced_sample(
                rd.from_arrow(t).repartition(7), per_cluster=5, k=4, n_iter=2
            )
            .sort("vec_id")
            .to_pandas()
        )
        assert one.equals(many)

    def test_small_cluster_returns_all_members(self):
        from textalyzer_ray.pipelines.similarity import cluster_balanced_sample

        # two far-apart tight clusters of sizes 3 and 17, per_cluster=10:
        # the small cluster yields all 3 rows, the big one exactly 10
        m = np.zeros((20, 4), dtype=np.float32)
        m[3:] += 50.0
        m += 0.01 * np.arange(20)[:, None].astype(np.float32)
        t = pa.table(
            {
                "vec_id": list(range(20)),
                "embedding": pa.array(
                    [r.tolist() for r in m], pa.list_(pa.float32())
                ),
            }
        )
        got = (
            cluster_balanced_sample(
                rd.from_arrow(t), per_cluster=10, k=2, n_iter=3
            )
            .sort("vec_id")
            .to_pandas()
        )
        sizes = got.groupby("cluster").size()
        assert sorted(sizes.tolist()) == [3, 10]


class TestPassthroughCols:
    def test_metadata_rides_final_pass(self):
        t, m = _emb_table(n=30, seed=2)
        t = t.append_column("label", pa.array([i % 3 for i in range(30)], pa.int32()))
        got = (
            kmeans_assign(
                rd.from_arrow(t), k=3, n_iter=2, passthrough_cols=["label"]
            )
            .sort("vec_id")
            .to_pandas()
        )
        want, _ = _reference(m, k=3, n_iter=2)
        assert got["cluster"].tolist() == want.tolist()
        assert got["label"].tolist() == [i % 3 for i in range(30)]
        assert list(got.columns) == ["vec_id", "cluster", "label"]


class TestKmeansPaths:
    """small_threshold=0 forces the per-round Dataset path; both paths
    must produce identical assignments (margins dwarf sum-order)."""

    def test_paths_agree(self):
        t, m = _emb_table(n=70, seed=9)
        small = (
            kmeans_assign(rd.from_arrow(t), k=4, n_iter=3)
            .sort("vec_id")
            .to_pandas()
        )
        big = (
            kmeans_assign(
                rd.from_arrow(t), k=4, n_iter=3, small_threshold=0
            )
            .sort("vec_id")
            .to_pandas()
        )
        assert small.equals(big)
        want, _ = _reference(m, k=4, n_iter=3)
        assert small["cluster"].tolist() == want.tolist()

    def test_passthrough_on_small_path(self):
        t, _ = _emb_table(n=30, seed=2)
        t = t.append_column(
            "label", pa.array([i % 3 for i in range(30)], pa.int32())
        )
        got = (
            kmeans_assign(
                rd.from_arrow(t), k=3, n_iter=2, passthrough_cols=["label"]
            )
            .sort("vec_id")
            .to_pandas()
        )
        assert got["label"].tolist() == [i % 3 for i in range(30)]
