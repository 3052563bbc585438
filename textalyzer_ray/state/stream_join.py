"""Streaming band join with bounded state — the stream-stream join
service (fourth stateful operator, beside the LSH / vector indexes and
the windowed aggregator).

The batch banded join (``pipelines/joins.py range_join_by_key``)
shuffles both full tables; a streaming ingest sees time-ordered WAVES
of interleaved left/right events and must emit pairs as they become
joinable while holding only the band-width of history. Standard
symmetric-hash-join-with-watermark semantics:

- pair (l, r) qualifies iff same key and
  ``l.ts - lower_s <= r.ts <= l.ts + upper_s``;
- each wave: incoming rows join against buffered state AND each other
  (new_left x (state_right + new_right), state_left x new_right — every
  pair found exactly once regardless of intra-wave task order, because
  an actor call sees earlier same-wave calls as state);
- after each wave the watermark advances to the max ts seen, and rows
  that can no longer pair with ANY future arrival are evicted:
  left rows with ``ts + upper_s < wm``, right rows with
  ``ts + lower_s < wm``.

Precondition (documented, asserted by the soak): waves arrive in
nondecreasing event-time order (ts-ordered wave split), so future
arrivals have ts >= watermark and eviction is lossless — the emitted
pair set EQUALS the batch band join bit-for-bit while peak state stays
O(key-rate x band width), never O(stream).

State layout: per-key rows live in ``user_id % n_shards`` actors;
wave work is a map_batches task pool that routes batch rows to shard
actors and emits returned pairs as its output batch — the pair stream
is a Dataset, not a driver collection.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray
from ray.data import Dataset

_STATE_SCHEMA = {"id": pl.Int64, "key": pl.Int64, "us": pl.Int64}


@ray.remote(num_cpus=0)
class _JoinShard:
    """Buffered left/right rows for the keys of this shard."""

    def __init__(self, lower_us: int, upper_us: int) -> None:
        self.lo = lower_us
        self.hi = upper_us
        self._left = pl.DataFrame(schema=_STATE_SCHEMA)
        self._right = pl.DataFrame(schema=_STATE_SCHEMA)
        self.peak_rows = 0

    @staticmethod
    def _frame(ids, keys, us) -> pl.DataFrame:
        return pl.DataFrame(
            {"id": ids, "key": keys, "us": us},
            schema=_STATE_SCHEMA,
        )

    def _band_pairs(self, left: pl.DataFrame, right: pl.DataFrame):
        if left.height == 0 or right.height == 0:
            return None
        j = (
            left.rename({"id": "lid", "us": "lus"})
            .join(right.rename({"id": "rid", "us": "rus"}), on="key")
            .filter(
                (pl.col("rus") >= pl.col("lus") - self.lo)
                & (pl.col("rus") <= pl.col("lus") + self.hi)
            )
            .select(["lid", "rid"])
        )
        return j if j.height else None

    def process(
        self,
        l_ids: np.ndarray, l_keys: np.ndarray, l_us: np.ndarray,
        r_ids: np.ndarray, r_keys: np.ndarray, r_us: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Ingest one routed slice; return the newly joinable pairs."""
        new_l = self._frame(l_ids, l_keys, l_us)
        new_r = self._frame(r_ids, r_keys, r_us)
        outs = [
            self._band_pairs(new_l, pl.concat([self._right, new_r])),
            self._band_pairs(self._left, new_r),
        ]
        self._left = pl.concat([self._left, new_l])
        self._right = pl.concat([self._right, new_r])
        self.peak_rows = max(
            self.peak_rows, self._left.height + self._right.height
        )
        outs = [o for o in outs if o is not None]
        if not outs:
            e = np.empty(0, dtype=np.int64)
            return e, e
        allp = pl.concat(outs)
        return (
            allp["lid"].to_numpy().astype(np.int64),
            allp["rid"].to_numpy().astype(np.int64),
        )

    def evict(self, watermark_us: int) -> tuple[int, int]:
        """Drop rows that cannot pair with any future (ts >= watermark)
        arrival; returns the remaining (left, right) state sizes."""
        self._left = self._left.filter(
            pl.col("us") + self.hi >= watermark_us
        )
        self._right = self._right.filter(
            pl.col("us") + self.lo >= watermark_us
        )
        return self._left.height, self._right.height

    def stats(self) -> dict:
        return {
            "left": self._left.height,
            "right": self._right.height,
            "peak_rows": self.peak_rows,
        }


class StreamBandJoin:
    """Driver-side handle: feed ts-ordered waves, collect pair rows."""

    def __init__(
        self,
        lower_s: int = 3600,
        upper_s: int = 0,
        n_shards: int = 2,
        key_col: str = "user_id",
        ts_col: str = "ts",
        id_col: str = "event_id",
        check_monotonic: bool = True,
    ) -> None:
        self.lo_us = lower_s * 1_000_000
        self.hi_us = upper_s * 1_000_000
        self.key_col, self.ts_col, self.id_col = key_col, ts_col, id_col
        # Exactness vs the batch band join rests on waves arriving in
        # nondecreasing event-time order; with check_monotonic a wave
        # batch whose min ts predates the current watermark raises
        # instead of silently dropping pairs (its partners may already
        # be evicted). Disable ONLY when a weaker per-key precondition
        # provably holds (e.g. key-disjoint substreams each wholly
        # contained in single waves — the soak's replicated corpus).
        self.check_monotonic = check_monotonic
        self.shards = [
            _JoinShard.remote(self.lo_us, self.hi_us) for _ in range(n_shards)
        ]
        self.watermark: int | None = None

    def process_wave(
        self, ds_wave: Dataset, left_type: str, right_type: str,
        type_col: str = "event_type",
    ) -> Dataset:
        """One wave -> the Dataset of newly joinable (id_col,
        id_col_right) pairs. Consume it (it drives the RPCs), then call
        ``advance_watermark``."""
        shards = self.shards
        ns = len(shards)
        key_col, ts_col, id_col = self.key_col, self.ts_col, self.id_col
        # watermark snapshot BEFORE the wave: intra-wave batch order is
        # arbitrary, so each batch checks against the pre-wave mark
        wm_check = self.watermark if self.check_monotonic else None
        out_schema = pa.schema(
            [
                pa.field(id_col, pa.int64()),
                pa.field(id_col + "_right", pa.int64()),
            ]
        )

        def wave_batch(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return out_schema.empty_table()
            us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            if wm_check is not None and us.size and int(us.min()) < wm_check:
                raise ValueError(
                    "stream join wave violates the nondecreasing-"
                    f"event-time precondition: batch min ts {us.min()} "
                    f"< watermark {wm_check} — partners may already be "
                    "evicted. Pass check_monotonic=False only if a "
                    "per-key ordering argument holds."
                )
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            types = np.asarray(t[type_col].to_pylist())
            is_l = types == left_type
            is_r = types == right_type
            shard = keys % ns
            futs = []
            for s in range(ns):
                lm = is_l & (shard == s)
                rm = is_r & (shard == s)
                if lm.any() or rm.any():
                    futs.append(
                        shards[s].process.remote(
                            ids[lm], keys[lm], us[lm],
                            ids[rm], keys[rm], us[rm],
                        )
                    )
            parts = ray.get(futs)
            if parts:
                lid = np.concatenate([p[0] for p in parts])
                rid = np.concatenate([p[1] for p in parts])
            else:
                lid = rid = np.empty(0, dtype=np.int64)
            return pa.table(
                {id_col: pa.array(lid), id_col + "_right": pa.array(rid)},
                schema=out_schema,
            )

        return ds_wave.select_columns(
            [id_col, key_col, ts_col, type_col]
        ).map_batches(wave_batch, batch_format="pyarrow", zero_copy_batch=True)

    def advance_watermark(self, wave_max_us: int) -> dict:
        self.watermark = (
            wave_max_us
            if self.watermark is None
            else max(self.watermark, wave_max_us)
        )
        sizes = ray.get([a.evict.remote(self.watermark) for a in self.shards])
        return {
            "watermark_us": self.watermark,
            "state_left": sum(s[0] for s in sizes),
            "state_right": sum(s[1] for s in sizes),
        }

    def stats(self) -> dict:
        per = ray.get([a.stats.remote() for a in self.shards])
        return {
            "state_rows": sum(p["left"] + p["right"] for p in per),
            "peak_rows": sum(p["peak_rows"] for p in per),
        }

    def shutdown(self) -> None:
        for a in self.shards:
            ray.kill(a)
        self.shards = []


def stream_range_join(
    ds_events: Dataset,
    n_waves: int = 4,
    left_type: str = "purchase",
    right_type: str = "view",
    lower_s: int = 3600,
    upper_s: int = 0,
    n_shards: int = 2,
    id_col: str = "event_id",
    check_monotonic: bool = True,
) -> Dataset:
    """Gate composition: split ts-ordered events into ``n_waves``
    contiguous id ranges (ts is nondecreasing in event_id for this
    stream — the precondition), stream them through StreamBandJoin,
    and return all pairs sorted. Equals the batch banded join
    exactly; peak state is reported by tests/the soak."""
    import pyarrow.compute as pc

    import ray.data as rd

    empty = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field(id_col + "_right", pa.int64()),
        ]
    ).empty_table()
    base = ds_events.materialize()
    if base.count() == 0:
        return rd.from_arrow(empty)
    ids = base.select_columns([id_col])
    lo_id = int(ids.min(id_col))
    hi_id = int(ids.max(id_col))
    span = hi_id - lo_id + 1
    per = -(-span // n_waves)
    jn = StreamBandJoin(
        lower_s=lower_s,
        upper_s=upper_s,
        n_shards=n_shards,
        id_col=id_col,
        check_monotonic=check_monotonic,
    )
    try:
        results = []
        for w in range(n_waves):
            lo, hi = lo_id + w * per, lo_id + (w + 1) * per
            wave = base.map_batches(
                lambda t, lo=lo, hi=hi: t.filter(
                    pc.and_(
                        pc.greater_equal(t[id_col], lo),
                        pc.less(t[id_col], hi),
                    )
                ),
                batch_format="pyarrow",
            ).materialize()
            if wave.count() == 0:
                continue
            pairs = jn.process_wave(
                wave, left_type, right_type
            ).materialize()
            results.append(pairs)
            wave_max = int(
                wave.select_columns(["ts"]).map_batches(
                    lambda t: pa.table(
                        {
                            "m": pa.array(
                                [
                                    int(
                                        pc.max(
                                            t["ts"].cast(pa.int64())
                                        ).as_py()
                                    )
                                ],
                                pa.int64(),
                            )
                        }
                    )
                    if t.num_rows
                    else pa.table({"m": pa.array([], pa.int64())}),
                    batch_format="pyarrow",
                ).max("m")
            )
            jn.advance_watermark(wave_max)
        if not results:
            return rd.from_arrow(empty)
        out = results[0]
        for r in results[1:]:
            out = out.union(r)
        return out.sort([id_col, id_col + "_right"])
    finally:
        jn.shutdown()
