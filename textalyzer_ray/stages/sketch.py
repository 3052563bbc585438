"""Mergeable sketches (ray_guide "Aggregation at scale": emit one
serialized sketch per batch, merge in a tiny second stage).

HyperLogLog (Flajolet et al. '07) with the standard bias corrections:
one uint8[2^p] register array per batch -> elementwise max to merge ->
deterministic estimate. Registers ride between stages as a single
binary value per batch, so a 10^12-row distinct-count shuffles only
``blocks x 2^p`` bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p

    def registers_for(self, hashes: np.ndarray) -> np.ndarray:
        """uint64 hashes -> register array. rank = position of the first
        set bit in the low 64-p bits (from the top). Bit length comes
        from ``np.frexp``'s exponent, which is EXACT for w < 2^53 (the
        low 52 bits at p=12 always qualify) — the earlier float-log2
        version was off by one near power-of-two boundaries, which the
        sketch tolerated but the SQL oracle (DuckDB ``length(bin(w))``,
        exact) does not."""
        regs = np.zeros(self.m, dtype=np.uint8)
        if len(hashes) == 0:
            return regs
        bits = 64 - self.p
        assert bits <= 52, "frexp bit-length exactness needs w < 2^53"
        idx = (hashes >> np.uint64(bits)).astype(np.int64)
        w = hashes & np.uint64((1 << bits) - 1)
        rank = np.full(len(hashes), bits + 1, dtype=np.uint8)
        nz = w > 0
        bl = np.frexp(w[nz].astype(np.float64))[1]  # == bit_length, exact
        rank[nz] = (bits - bl + 1).astype(np.uint8)
        np.maximum.at(regs, idx, rank)
        return regs

    @staticmethod
    def merge(reg_list: list[np.ndarray]) -> np.ndarray:
        out = reg_list[0].copy()
        for r in reg_list[1:]:
            np.maximum(out, r, out=out)
        return out

    def estimate(self, regs: np.ndarray) -> int:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(regs == 0))
            if zeros:
                est = m * np.log(m / zeros)
        # floor(x+0.5), not round(): Python round() is banker's, SQL
        # round() is half-away — floor(+0.5) is the one convention both
        # engines express identically (cross-engine oracle parity)
        return int(np.floor(est + 0.5))


def hll_partial_batch(
    table: pa.Table, text_col: str = "text", p: int = 12
) -> pa.Table:
    """Per-batch HLL registers over the batch's distinct tokens ->
    one row (registers: binary).

    Token hash is ``hll_hash64`` (core.fingerprint: polyhash64 +
    murmur fmix64 finalizer) — SQL-recomputable, so the driver's DuckDB
    oracle can rebuild the registers and the estimate exactly (the same
    trick that hard-oracles SimHash). The batch's tokens are deduped
    FIRST (registers only see max-rank per bucket, so distinct-hashing
    is equivalent) and hashed via the vectorized column-Horner
    ``hll_hash64_array``."""
    import polars as pl

    from textalyzer_ray.core.fingerprint import hll_hash64_array
    from textalyzer_ray.stages.tokenize import _flat_tokens

    tokens, _ = _flat_tokens(table, text_col)
    vocab = (
        pl.from_arrow(pa.table({"t": tokens}))["t"].unique().to_list()
    )
    h = hll_hash64_array(vocab)
    hll = HyperLogLog(p)
    regs = hll.registers_for(h)
    return pa.table({"registers": pa.array([regs.tobytes()], pa.binary())})
