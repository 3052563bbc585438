"""Bloom-filter build/probe: scalar reference vs vectorized stages,
driver vs distributed OR-merge, false-positive semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.core.bloom import (
    bloom_build,
    bloom_maybe_contains,
    bloom_positions,
    bloom_positions_array,
)
from textalyzer_ray.pipelines.bloom import (
    bloom_build_distributed,
    bloom_dedup_against,
)

pytestmark = pytest.mark.usefixtures("quiet_data_context")

M = 1 << 19  # 64 KiB bitmap = exactly one merge chunk
K = 7


def keys(n, prefix="https://ex.com/doc/"):
    return [f"{prefix}{i}" for i in range(n)]


class TestCoreBloom:
    def test_vectorized_positions_match_scalar(self):
        ks = keys(200) + ["", "a", "über/ß"]
        vec = bloom_positions_array(ks, M, K)
        for i, key in enumerate(ks):
            assert vec[i].tolist() == bloom_positions(key, M, K)

    def test_no_false_negatives(self):
        ks = keys(500)
        bm = bloom_build(ks, M, K)
        assert bloom_maybe_contains(bm, ks, K).all()

    def test_false_positives_exist_but_are_rare_at_this_load(self):
        seen = keys(500)
        bm = bloom_build(seen, M, K)
        probe = keys(5000, prefix="https://other.com/p/")
        fp = int(bloom_maybe_contains(bm, probe, K).sum())
        # ~3500 set bits in 2^19 -> per-probe FP ~ (n*k/m)^k ~ 1e-16;
        # anything above a handful means the probe math is broken.
        assert fp <= 2

    def test_positions_spread_over_both_halves(self):
        # regression guard: h2 must contribute (not constant-stride)
        pos = bloom_positions_array(keys(100), M, K)
        assert len(np.unique(pos.ravel())) > 500


class TestBloomPipelines:
    def _seen_ds(self, n=300):
        return rd.from_arrow(
            pa.table({"url": pa.array(keys(n), pa.string())})
        )

    def test_distributed_build_equals_scalar_reference(self):
        ref = bloom_build(keys(300), M, K)
        got = bloom_build_distributed(self._seen_ds(), m_bits=M, k=K)
        assert np.array_equal(ref, got)

    def test_forced_chunked_merge_path_equality(self):
        ref = bloom_build(keys(300), M, K)
        got = bloom_build_distributed(
            self._seen_ds(), m_bits=M, k=K, driver_merge_rows=1
        )
        assert np.array_equal(ref, got)

    def test_dedup_against_flags_exactly_the_seen_keys(self):
        all_ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(600), pa.int64()),
                    "url": pa.array(keys(600), pa.string()),
                }
            )
        )
        flagged = bloom_dedup_against(all_ds, self._seen_ds(300), m_bits=M, k=K)
        rows = {r["doc_id"]: r["maybe_seen"] for r in flagged.take_all()}
        # every seen key flagged (no false negatives)
        assert all(rows[i] == 1 for i in range(300))
        # at this load the 300 new keys should all be definitely-new
        # unless probing is broken (FP ~ 1e-16 per probe)
        assert sum(rows[i] for i in range(300, 600)) == 0

    def test_empty_seen_set(self):
        empty = rd.from_arrow(pa.table({"url": pa.array([], pa.string())}))
        bm = bloom_build_distributed(empty, m_bits=M, k=K)
        assert not bm.any()
