"""Z-order layout: Morton-code correctness, equi-depth shards,
zone-map pruning advantage over time-ordered sharding."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.layout import (
    zone_maps,
    zorder_layout,
    zorder_value,
)

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def brute_morton(x, y):
    out = 0
    for b in range(31):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


class TestZOrder:
    def test_morton_matches_bitwise_reference(self):
        rng = np.random.default_rng(3)
        x = rng.integers(0, 2**31, 500, dtype=np.int64)
        y = rng.integers(0, 2**31, 500, dtype=np.int64)
        got = zorder_value(x, y)
        want = np.array(
            [brute_morton(int(a), int(b)) for a, b in zip(x, y)], dtype=np.int64
        )
        assert (got == want).all()

    def _grid(self, n_users=64, n_hours=64):
        ids, us, hs = [], [], []
        k = 0
        for u in range(n_users):
            for h in range(n_hours):
                ids.append(k)
                us.append(u)
                hs.append(h)
                k += 1
        return pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "user_id": pa.array(us, pa.int64()),
                "hr": pa.array(hs, pa.int64()),
            }
        )

    def test_equi_depth_shards_and_rank_formula(self):
        t = self._grid(16, 16)
        lay = zorder_layout(
            rd.from_arrow(t).repartition(5), "user_id", "hr", n_shards=8
        ).take_all()
        assert len(lay) == 256
        counts: dict = {}
        for r in lay:
            counts[r["shard_id"]] = counts.get(r["shard_id"], 0) + 1
        assert counts == {s: 32 for s in range(8)}
        # shard ids are nondecreasing along the z-order
        by_z = sorted(lay, key=lambda r: (r["zval"], r["event_id"]))
        sids = [r["shard_id"] for r in by_z]
        assert sids == sorted(sids)

    def test_zone_map_pruning_beats_time_order(self):
        """The point of the layout: for a single-user probe, the
        fraction of shards whose [min_user, max_user] zone intersects
        must be far smaller under z-order than under hour-ordered
        sharding (where every shard spans every user)."""
        t = self._grid(64, 64)
        src = rd.from_arrow(t).materialize()
        lay = zorder_layout(src, "user_id", "hr", n_shards=16)
        zm = zone_maps(lay, src, ["user_id", "hr"]).to_pylist()
        assert sum(r["n_rows"] for r in zm) == 64 * 64

        def hit_fraction(maps, probe_user):
            hit = [
                m for m in maps
                if m["min_user_id"] <= probe_user <= m["max_user_id"]
            ]
            return len(hit) / len(maps)

        z_frac = np.mean([hit_fraction(zm, u) for u in (0, 17, 63)])
        # hour-ordered sharding: shard = hr bucket -> every shard holds
        # every user -> zone maps never prune
        t2 = sorted(t.to_pylist(), key=lambda r: (r["hr"], r["event_id"]))
        per = len(t2) // 16
        tmaps = []
        for s in range(16):
            rows = t2[s * per : (s + 1) * per]
            tmaps.append(
                {
                    "min_user_id": min(r["user_id"] for r in rows),
                    "max_user_id": max(r["user_id"] for r in rows),
                }
            )
        t_frac = np.mean([hit_fraction(tmaps, u) for u in (0, 17, 63)])
        assert t_frac == 1.0  # time sharding cannot prune user probes
        assert z_frac <= 0.5, z_frac  # z-order prunes at least half

    def test_empty(self):
        t = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "hr": pa.array([], pa.int64()),
            }
        )
        assert zorder_layout(rd.from_arrow(t), "user_id", "hr").take_all() == []


class TestZOrderProperties:
    def test_morton_bijective_and_monotone_in_each_dim(self):
        """Property sweep (deterministic grid + random): deinterleaving
        the z-value recovers both inputs exactly, and fixing one
        coordinate makes z monotone in the other."""
        import numpy as np

        from textalyzer_ray.pipelines.layout import spread_bits

        rng = np.random.default_rng(11)
        x = rng.integers(0, 2**31, 2000, dtype=np.int64)
        y = rng.integers(0, 2**31, 2000, dtype=np.int64)
        z = zorder_value(x, y).astype(np.uint64)

        def unspread(v):
            v = v & np.uint64(0x5555555555555555)
            for shift, mask in (
                (1, 0x3333333333333333),
                (2, 0x0F0F0F0F0F0F0F0F),
                (4, 0x00FF00FF00FF00FF),
                (8, 0x0000FFFF0000FFFF),
                (16, 0x00000000FFFFFFFF),
            ):
                v = (v | (v >> np.uint64(shift))) & np.uint64(mask)
            return v.astype(np.int64)

        assert (unspread(z) == x).all()
        assert (unspread(z >> np.uint64(1)) == y).all()
        # monotone in x for fixed y
        xs = np.arange(1000, dtype=np.int64)
        fixed = np.full(1000, 77, dtype=np.int64)
        zz = zorder_value(xs, fixed)
        assert (np.diff(zz) > 0).all()
        zz2 = zorder_value(fixed, xs)
        assert (np.diff(zz2) > 0).all()


class TestRangeSplitters:
    def _brute(self, ids, n_shards):
        from textalyzer_ray.core.fingerprint import hll_hash64_array

        ks = sorted(hll_hash64_array([str(i) for i in ids]).tolist())
        n = len(ks)
        return [
            ks[(j * n + n_shards - 1) // n_shards - 1]
            for j in range(1, n_shards)
        ]

    def _run(self, ids, n_shards):
        from textalyzer_ray.pipelines.layout import range_splitters

        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64())})
        ).repartition(4)
        t = range_splitters(ds, n_shards=n_shards)
        return [
            (h << 32) | lo
            for h, lo in zip(
                t["hi"].to_pylist(), t["lo"].to_pylist()
            )
        ]

    def test_matches_sorted_selection(self, ray_session):
        ids = list(range(500))
        for n_shards in (2, 4, 8, 13):
            assert self._run(ids, n_shards) == self._brute(ids, n_shards)

    def test_fewer_rows_than_shards(self, ray_session):
        ids = [3, 11, 42]
        assert self._run(ids, 8) == self._brute(ids, 8)

    def test_empty(self, ray_session):
        from textalyzer_ray.pipelines.layout import range_splitters

        ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
        assert range_splitters(ds, n_shards=8).num_rows == 0
