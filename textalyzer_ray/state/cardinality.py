"""Incremental distinct-count service — HyperLogLog registers as
shared mutable state (fifth stateful service).

A batch HLL estimate (``pipelines.frequency.approx_distinct_words``)
rescans the corpus per question; an ingest loop wants a standing
cardinality counter that waves merge INTO and that answers "how many
distinct tokens so far" at any point. HLL registers merge by
element-wise max — associative, commutative, idempotent — so the
wave-merged estimate equals the one-shot batch estimate EXACTLY, and
the existing SQL-recomputable oracle (polyhash64 token hash + exact
bit-length ranks, CLAUDE.md) carries over unchanged.

Layout: per-batch partial register sets (4 KiB each,
``stages.sketch.hll_partial_batch``) are computed in a task pool and
RPC'd to one zero-cpu accumulator actor per register STRIPE (the
4 KiB sketch is split across ``n_shards`` actors so no single actor
serializes all merge traffic at high wave parallelism); estimates
reassemble the stripes. The sketch is tiny — the sharding here is
about RPC serialization, not memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


@ray.remote(num_cpus=0)
class _RegisterStripe:
    """max-merge accumulator over one contiguous register slice."""

    def __init__(self, size: int) -> None:
        self._regs = np.zeros(size, dtype=np.uint8)

    def merge(self, regs: np.ndarray) -> int:
        np.maximum(self._regs, regs, out=self._regs)
        return int(self._regs.max())

    def dump(self) -> np.ndarray:
        return self._regs


class CardinalityService:
    """Driver-side handle: ``add_wave`` streams a column's tokens (or
    raw values) into the registers; ``estimate`` answers at any time."""

    def __init__(self, p: int = 12, n_shards: int = 2) -> None:
        from textalyzer_ray.stages.sketch import HyperLogLog

        self.p = p
        self.m = 1 << p
        self.hll = HyperLogLog(p)
        bounds = np.linspace(0, self.m, n_shards + 1).astype(int)
        self.bounds = bounds
        self.stripes = [
            _RegisterStripe.remote(int(hi - lo))
            for lo, hi in zip(bounds[:-1], bounds[1:])
        ]

    def add_wave(self, ds: Dataset, text_col: str = "text") -> int:
        """Tokenize + sketch each batch, max-merge into the stripes.
        Returns rows ingested; blocks until every stripe acknowledged."""
        from textalyzer_ray.stages.sketch import hll_partial_batch

        stripes = self.stripes
        bounds = self.bounds
        p = self.p

        def ingest(t: pa.Table) -> pa.Table:
            part = hll_partial_batch(t, text_col, p)
            regs = np.frombuffer(part["registers"][0].as_py(), dtype=np.uint8)
            acks = [
                s.merge.remote(regs[lo:hi])
                for s, lo, hi in zip(stripes, bounds[:-1], bounds[1:])
            ]
            ray.get(acks)
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        stats = ds.select_columns([text_col]).map_batches(
            ingest, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        return int(sum(r["n"] for r in stats))

    def estimate(self) -> int:
        regs = np.concatenate(ray.get([s.dump.remote() for s in self.stripes]))
        return self.hll.estimate(regs)

    def shutdown(self) -> None:
        for s in self.stripes:
            ray.kill(s)
        self.stripes = []


def hll_service_distinct(
    waves: list[Dataset], text_col: str = "text", p: int = 12
) -> int:
    """Gate composition: ingest every wave, return the final estimate —
    equal to the one-shot batch estimate by max-merge algebra."""
    svc = CardinalityService(p=p)
    try:
        for w in waves:
            svc.add_wave(w, text_col)
        return svc.estimate()
    finally:
        svc.shutdown()
