"""Same-session A/B of the LSH-index shard-actor hot paths (r4 judge
item #1): the r3 per-row dict loops vs the r4 columnar polars shards
(state/lsh_index.py). Both run as real zero-cpu Ray actors on identical
synthetic posting streams, so the numbers compare the ACTOR-side ingest
and lookup ceilings that bound a 100 TB crawl loop (task pools feed
shards far faster than a single-threaded Python loop can drain).

Usage: python tools/bench_shard_ingest.py [n_rows] — prints one JSON
line with rows/s for add + lookup, old vs new, and the speedups.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import ray


@ray.remote(num_cpus=0)
class _OldBandShard:
    """r3 implementation (git 369c095 state/lsh_index.py:49-78),
    reproduced verbatim as the A/B control (plus an in-actor clock)."""

    def __init__(self) -> None:
        self._post: dict[tuple[int, int], list[int]] = {}
        self.busy_s = 0.0

    def add(self, bands, hashes, ids) -> int:
        t0 = time.monotonic()
        post = self._post
        for b, h, i in zip(bands.tolist(), hashes.tolist(), ids.tolist()):
            post.setdefault((b, h), []).append(i)
        self.busy_s += time.monotonic() - t0
        return len(ids)

    def lookup(self, bands, hashes, qids):
        t0 = time.monotonic()
        post = self._post
        out_q: list[int] = []
        out_r: list[int] = []
        for b, h, q in zip(bands.tolist(), hashes.tolist(), qids.tolist()):
            hits = post.get((b, h))
            if hits:
                out_q.extend([q] * len(hits))
                out_r.extend(hits)
        out = (
            np.asarray(out_q, dtype=np.int64),
            np.asarray(out_r, dtype=np.int64),
        )
        self.busy_s += time.monotonic() - t0
        return out

    def busy(self) -> float:
        return self.busy_s


def _instrument(shard_cls):
    """Subclass the production shard with the same in-actor clock."""

    class _Timed(shard_cls.__ray_metadata__.modified_class):  # type: ignore
        def __init__(self):
            super().__init__()
            self.busy_s = 0.0

        def add(self, bands, hashes, ids):
            t0 = time.monotonic()
            out = super().add(bands, hashes, ids)
            self.busy_s += time.monotonic() - t0
            return out

        def lookup(self, bands, hashes, qids):
            t0 = time.monotonic()
            out = super().lookup(bands, hashes, qids)
            self.busy_s += time.monotonic() - t0
            return out

        def busy(self):
            return self.busy_s

    return ray.remote(num_cpus=0)(_Timed)


def _mk_waves(n_rows: int, n_waves: int, bands: int, seed: int = 7):
    """Synthetic posting stream: bands cycle 0..bands-1, hashes drawn
    from a pool sized for ~2 rows/key (so lookups return real hits)."""
    rng = np.random.default_rng(seed)
    per = n_rows // n_waves
    waves = []
    pool = rng.integers(0, 2**63, size=max(n_rows // 2, 1), dtype=np.int64)
    for w in range(n_waves):
        b = (np.arange(per, dtype=np.int64) % bands).astype(np.int64)
        h = pool[rng.integers(0, len(pool), size=per)].astype(np.uint64)
        i = (w * per + np.arange(per)).astype(np.int64)
        waves.append((b, h, i))
    return waves


def _drive(actor, waves, batch_rows: int = 65536):
    """Feed waves in batch-sized RPCs (the task-pool shape). Adds are
    pipelined (acks gathered per wave, exactly like LshIndex.add's
    ingest fn); timings come from the IN-ACTOR clock, so they measure
    the single-threaded shard drain rate that bounds 100 TB ingest —
    not driver round-trip latency or hypervisor steal on the driver.
    Waves INTERLEAVE add and lookup (add wave k, then query wave k —
    the lsh_index_dedup access pattern), so per-wave consolidation
    costs land where they do in production.
    Returns (add_busy_s, lookup_busy_s, n_hits)."""
    add_s = lookup_s = prev = 0.0
    hits = 0
    for b, h, i in waves:
        acks = [
            actor.add.remote(
                b[s : s + batch_rows],
                h[s : s + batch_rows],
                i[s : s + batch_rows],
            )
            for s in range(0, len(b), batch_rows)
        ]
        ray.get(acks)
        cur = ray.get(actor.busy.remote())
        add_s += cur - prev
        prev = cur
        futs = [
            actor.lookup.remote(
                b[s : s + batch_rows],
                h[s : s + batch_rows],
                i[s : s + batch_rows],
            )
            for s in range(0, len(b), batch_rows)
        ]
        for q, r in ray.get(futs):
            hits += len(q)
        cur = ray.get(actor.busy.remote())
        lookup_s += cur - prev
        prev = cur
    return add_s, lookup_s, hits


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=4, include_dashboard=False,
            ignore_reinit_error=True,
        )
    from textalyzer_ray.state.lsh_index import _BandShard

    waves = _mk_waves(n_rows, n_waves=8, bands=32)
    n = sum(len(w[0]) for w in waves)

    old = _OldBandShard.remote()
    old_add, old_lk, old_hits = _drive(old, waves)
    ray.kill(old)

    new = _instrument(_BandShard).remote()
    new_add, new_lk, new_hits = _drive(new, waves)
    # correctness guard: identical candidate volume from both stores
    assert new_hits == old_hits, (new_hits, old_hits)
    ray.kill(new)

    out = {
        "metric": "lsh_band_shard_ingest_ab",
        "n_rows": n,
        "old_add_rows_per_sec": round(n / old_add),
        "new_add_rows_per_sec": round(n / new_add),
        "add_speedup": round(old_add / new_add, 2),
        "old_lookup_rows_per_sec": round(n / old_lk),
        "new_lookup_rows_per_sec": round(n / new_lk),
        "lookup_speedup": round(old_lk / new_lk, 2),
        "total_speedup": round((old_add + old_lk) / (new_add + new_lk), 2),
        "n_candidate_hits": old_hits,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
