"""Streaming event-time tumbling windows with watermark + late-data
drop — the stateful streaming-window operator (the third shared-state
service beside the LSH and vector indexes).

Batch windowing (``pipelines/analytics.py`` events_hourly/hopping)
assumes the whole stream is present; a streaming ingest sees WAVES of
events arriving out of event-time order and must decide, per event,
"window still open?" against a WATERMARK while holding only open
window partials — never the stream. This module implements the
standard dataflow-model semantics (Akidau et al., The Dataflow Model,
VLDB 2015):

- tumbling windows of ``window_s`` over event time;
- after each wave the watermark advances to
  ``max(event time seen) - allowed_lateness``;
- an event arriving in a later wave whose window END is at or below
  the CURRENT watermark is dropped as late (tallied per type under
  ``window_id = -1``), everything else accumulates.

State layout: (window, event_type) -> count partials live in
hash-sharded zero-cpu ``_WindowShard`` actors (``window % n_shards``;
the late tally on shard 0). Per-wave work is a ``map_batches`` task
pool: vectorized window/lateness math per batch, one polars partial
group-by, one RPC per touched shard, plus a per-block max-ts row so
the driver's watermark advance reduces O(blocks) scalars — the
convergence-probe pattern. Memory per shard is open-windows x types,
never events.

Determinism: with waves fixed (the gate splits by the repo's standard
multiplicative id hash, which interleaves event time), the drop
decision per event is a pure function of wave maxima — exactly
re-playable in SQL as a running per-wave max.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray
from ray.data import Dataset


@ray.remote(num_cpus=0)
class _WindowShard:
    """(window_id, event_type) -> count accumulator."""

    def __init__(self) -> None:
        self._counts: dict[tuple[int, str], int] = {}

    def add(self, wins: np.ndarray, types: list[str], ns: np.ndarray) -> int:
        c = self._counts
        for w, t, n in zip(wins.tolist(), types, ns.tolist()):
            k = (w, t)
            c[k] = c.get(k, 0) + n
        return len(ns)

    def dump(self) -> pa.Table:
        items = sorted(self._counts.items())
        return pa.table(
            {
                "window_id": pa.array([k[0] for k, _ in items], pa.int64()),
                "event_type": pa.array([k[1] for k, _ in items], pa.string()),
                "n": pa.array([v for _, v in items], pa.int64()),
            }
        )


class StreamWindowAgg:
    """Driver-side handle; feed waves with ``process_wave``, read the
    final (window_id, event_type, n) table with ``result``."""

    def __init__(
        self,
        window_s: int = 3600,
        allowed_lateness_s: int = 1800,
        n_shards: int = 2,
        ts_col: str = "ts",
        type_col: str = "event_type",
    ) -> None:
        self.window_us = window_s * 1_000_000
        self.late_us = allowed_lateness_s * 1_000_000
        self.ts_col = ts_col
        self.type_col = type_col
        self.shards = [_WindowShard.remote() for _ in range(n_shards)]
        self.watermark: int | None = None  # None = -inf (no wave yet)
        self.n_on_time = 0
        self.n_late = 0

    def process_wave(self, ds_wave: Dataset) -> dict:
        """Accumulate one wave, then advance the watermark."""
        shards = self.shards
        ns_ = len(shards)
        win_us = self.window_us
        wm = self.watermark
        ts_col, type_col = self.ts_col, self.type_col

        def wave_batch(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {
                        "max_us": pa.array([], pa.int64()),
                        "on_time": pa.array([], pa.int64()),
                        "late": pa.array([], pa.int64()),
                    }
                )
            us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            win = us // win_us
            wend = (win + 1) * win_us
            late = (
                np.zeros(len(us), dtype=bool)
                if wm is None
                else wend <= wm
            )
            out_win = np.where(late, np.int64(-1), win)
            part = (
                pl.DataFrame(
                    {
                        "window_id": out_win,
                        "event_type": pl.Series(
                            t[type_col].to_pylist(), dtype=pl.String
                        ),
                    }
                )
                .group_by(["window_id", "event_type"])
                .agg(pl.len().cast(pl.Int64).alias("n"))
            )
            pw = part["window_id"].to_numpy()
            pt = part["event_type"].to_list()
            pn = part["n"].to_numpy()
            shard = np.where(pw < 0, 0, pw % ns_)
            acks = []
            for s in range(ns_):
                m = shard == s
                if m.any():
                    acks.append(
                        shards[s].add.remote(
                            pw[m], [pt[i] for i in np.nonzero(m)[0]], pn[m]
                        )
                    )
            ray.get(acks)
            n_late = int(late.sum())
            return pa.table(
                {
                    "max_us": pa.array([int(us.max())], pa.int64()),
                    "on_time": pa.array([len(us) - n_late], pa.int64()),
                    "late": pa.array([n_late], pa.int64()),
                }
            )

        stats = ds_wave.select_columns([ts_col, type_col]).map_batches(
            wave_batch, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        if stats:
            wave_max = max(r["max_us"] for r in stats)
            new_wm = wave_max - self.late_us
            self.watermark = (
                new_wm if wm is None else max(wm, new_wm)
            )
            self.n_on_time += sum(r["on_time"] for r in stats)
            self.n_late += sum(r["late"] for r in stats)
        return {
            "watermark_us": self.watermark,
            "on_time": self.n_on_time,
            "late": self.n_late,
        }

    def result(self) -> Dataset:
        """Final (window_id, event_type, n), sorted; shard dumps are
        key-disjoint by construction so a plain union suffices."""
        import ray.data as rd

        tables = ray.get([a.dump.remote() for a in self.shards])
        return rd.from_arrow(pa.concat_tables(tables)).sort(
            ["window_id", "event_type"]
        )

    def shutdown(self) -> None:
        for a in self.shards:
            ray.kill(a)
        self.shards = []


def hash_waves(
    ds: Dataset, n_waves: int, id_col: str = "event_id"
) -> list[Dataset]:
    """Deterministic wave split by the repo's standard multiplicative
    id hash ((id % 2^32) * 2654435761 % 2^32) % n_waves — interleaves
    event time, so late arrivals actually occur. ``ds`` is materialized
    once; each wave is a vectorized filter over the cached blocks."""
    base = ds.materialize()

    def wave_filter(w: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = (ids % np.uint64(2**32)) * np.uint64(2654435761) % np.uint64(
                2**32
            )
            return t.filter(pa.array((h % np.uint64(n_waves)) == w))

        return f

    return [
        base.map_batches(wave_filter(w), batch_format="pyarrow")
        for w in range(n_waves)
    ]


def stream_windows(
    ds_events: Dataset,
    n_waves: int = 4,
    window_s: int = 3600,
    allowed_lateness_s: int = 1800,
    n_shards: int = 2,
    id_col: str = "event_id",
) -> Dataset:
    """The gate composition: hash-split ``ds_events`` into waves,
    stream them through StreamWindowAgg in wave order, return the final
    (window_id, event_type, n) — late drops under window_id = -1."""
    agg = StreamWindowAgg(
        window_s=window_s,
        allowed_lateness_s=allowed_lateness_s,
        n_shards=n_shards,
    )
    try:
        for wave in hash_waves(
            ds_events.select_columns([id_col, "ts", "event_type"]),
            n_waves,
            id_col,
        ):
            agg.process_wave(wave)
        return agg.result().materialize()
    finally:
        agg.shutdown()
