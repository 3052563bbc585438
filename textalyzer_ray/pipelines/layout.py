"""Z-order (Morton) data layout + zone maps — the lakehouse
data-clustering step (Delta/Iceberg Z-ORDER): interleave the bits of
two columns so rows close in BOTH dimensions land in the same output
shard, then per-shard min/max zone maps let range scans prune shards
on either column.

Scale shape: the z-value is pure per-row bit math (vectorized numpy,
one pass); the only wide step is ONE global sort by (zval, id) — the
same sort any layout rewrite pays — followed by the repo's
distributed prefix-scan (token_shards pattern: one (first-key, count)
scalar per block to the driver, exclusive offsets broadcast back) to
turn sorted position into an equi-depth shard id. Zone maps are a
per-shard aggregate over the result.

Cross-engine exactness: inputs are masked to 31 bits, so every shift/
mask stays inside signed-64 range and the identical spread chain runs
in DuckDB BIGINT operators — zval, rank and shard_id are all
integer-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

_MASKS = (
    (16, np.uint64(0x0000FFFF0000FFFF)),
    (8, np.uint64(0x00FF00FF00FF00FF)),
    (4, np.uint64(0x0F0F0F0F0F0F0F0F)),
    (2, np.uint64(0x3333333333333333)),
    (1, np.uint64(0x5555555555555555)),
)


def spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 31 bits of ``v`` onto even bit positions (the
    Morton interleave half), uint64 vectorized."""
    x = v.astype(np.uint64) & np.uint64(0x7FFFFFFF)
    for shift, mask in _MASKS:
        x = (x | (x << np.uint64(shift))) & mask
    return x


def zorder_value(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton code of (x, y), 31 bits each -> 62-bit int64."""
    return (spread_bits(x) | (spread_bits(y) << np.uint64(1))).astype(
        np.int64
    )


def zorder_layout(
    ds: Dataset,
    x_col: str,
    y_col: str,
    n_shards: int = 16,
    id_col: str = "event_id",
) -> Dataset:
    """(id_col, zval, shard_id): z-value per row and its equi-depth
    shard under the z-order sort (shard = global_rank * n_shards // N).
    Sorted by id_col."""
    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("zval", pa.int64()),
            pa.field("shard_id", pa.int64()),
        ]
    )

    def zval_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "zval": pa.array([], pa.int64()),
                }
            )
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {id_col: t[id_col], "zval": pa.array(zorder_value(x, y))}
        )

    zs = (
        ds.map_batches(zval_batch, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["zval", id_col])
        .materialize()
    )

    def block_head(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "z0": pa.array([], pa.int64()),
                    "i0": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "z0": pa.array([t["zval"][0].as_py()], pa.int64()),
                "i0": pa.array([t[id_col][0].as_py()], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    heads = zs.map_batches(
        block_head, batch_format="pyarrow", batch_size=None
    ).take_all()
    heads.sort(key=lambda r: (r["z0"], r["i0"]))
    total = sum(r["n"] for r in heads)
    if total == 0:
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())
    offsets = {}
    run = 0
    for r in heads:
        # block offsets are keyed by the block's first (zval, id) row
        # after the (zval, id) sort — duplicate id_col values could
        # make two blocks share a head key and misassign a whole block
        if (r["z0"], r["i0"]) in offsets:
            raise ValueError(
                f"zorder_layout requires unique {id_col!r} values: "
                f"duplicate head key (zval={r['z0']}, id={r['i0']})"
            )
        offsets[(r["z0"], r["i0"])] = run
        run += r["n"]

    import ray

    oref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        from textalyzer_ray.stages.groups import _worker_object_cache

        cache = _worker_object_cache()
        offs = cache.get(oref.hex())
        if offs is None:
            offs = cache[oref.hex()] = ray.get(oref)
        base = offs[(t["zval"][0].as_py(), t[id_col][0].as_py())]
        rank = base + np.arange(t.num_rows, dtype=np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "zval": t["zval"],
                "shard_id": pa.array(rank * n_shards // total),
            },
            schema=out_schema,
        )

    return zs.map_batches(
        assign, batch_format="pyarrow", batch_size=None
    ).sort(id_col)


def zone_maps(
    layout: Dataset,
    source: Dataset,
    cols: list[str],
    id_col: str = "event_id",
) -> pa.Table:
    """Per-shard min/max zone maps of ``cols`` (driver-sized: one row
    per shard). Joins the layout's shard assignment back to the source
    columns via a broadcast of the shard map (layouts are id -> small
    int; at corpus scale use union_tag_lookup instead)."""
    import polars as pl
    import ray

    lay = pa.concat_tables(ray.get(layout.to_arrow_refs()))
    lref = ray.put(lay.select([id_col, "shard_id"]))

    def tag(t: pa.Table) -> pa.Table:
        from textalyzer_ray.stages.groups import _worker_object_cache

        cache = _worker_object_cache()
        lm = cache.get(lref.hex())
        if lm is None:
            lm = cache[lref.hex()] = pl.from_arrow(ray.get(lref))
        return (
            pl.from_arrow(t.select([id_col] + cols))
            .join(lm, on=id_col, how="inner")
            .to_arrow()
        )

    tagged = source.map_batches(tag, batch_format="pyarrow")
    aggs = []
    for c in cols:
        aggs += [
            pl.col(c).min().alias(f"min_{c}"),
            pl.col(c).max().alias(f"max_{c}"),
        ]

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by("shard_id")
            .agg(*aggs, pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    parts = [
        b
        for b in tagged.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    merged = pl.from_arrow(pa.concat_tables(parts))
    fin = []
    for c in cols:
        fin += [
            pl.col(f"min_{c}").min().alias(f"min_{c}"),
            pl.col(f"max_{c}").max().alias(f"max_{c}"),
        ]
    return (
        merged.group_by("shard_id")
        .agg(*fin, pl.col("n").sum().alias("n_rows"))
        .sort("shard_id")
        .to_arrow()
    )


def rendezvous_shards(
    ds: Dataset,
    n_nodes: int = 16,
    id_col: str = "doc_id",
) -> Dataset:
    """Rendezvous (highest-random-weight) shard assignment — Thaler &
    Ravishankar 1996, the placement rule consistent routing layers use
    because removing one node reassigns ONLY that node's keys (1/n of
    the data moves, vs ~all for mod-N). owner(key) = argmax over nodes
    of hll_hash64(f"{key}:{node}"); ties (never observed; 2^-64) break
    to the lowest node, and the SQL oracle re-derives every hash with
    the verified fmix chain (__ray_entry__._hll_hash64_oracle_ctes).

    Zero-shuffle: one vectorized hash pass per batch (n_nodes hashes
    per row, numpy uint64), argmax per row. Output (id_col, owner,
    hash_hi, hash_lo) — the winning hash split into two BIGINT halves
    — sorted by id_col."""
    import numpy as np

    from textalyzer_ray.core.fingerprint import hll_hash64_array

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("owner", pa.int64()),
            pa.field("hash_hi", pa.int64()),
            pa.field("hash_lo", pa.int64()),
        ]
    )

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        hs = np.stack(
            [
                hll_hash64_array([f"{i}:{n}" for i in ids.tolist()])
                for n in range(n_nodes)
            ],
            axis=1,
        )  # (rows, n_nodes) uint64
        owner = np.argmax(hs, axis=1)  # first max -> lowest node on tie
        win = hs[np.arange(len(ids)), owner]
        return pa.table(
            {
                id_col: t[id_col],
                "owner": pa.array(owner.astype(np.int64)),
                "hash_hi": pa.array((win >> np.uint64(32)).astype(np.int64)),
                "hash_lo": pa.array(
                    (win & np.uint64(0xFFFFFFFF)).astype(np.int64)
                ),
            },
            schema=out_schema,
        )

    return ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    ).sort(id_col)


def range_splitters(
    ds: Dataset,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> pa.Table:
    """EXACT range-partition boundaries of a 64-bit hash key WITHOUT a
    global sort: the multi-round radix selection a shuffle planner
    runs to pick balanced splitters before a range exchange. The
    column_quantiles histogram trick needs a bounded value domain; a
    64-bit key has none, so instead each of 4 rounds refines 16 more
    bits — one zero-shuffle counting pass per round over the needed
    prefixes only, with driver state bounded by
    (n_shards-1) x 65536 counters, never by rows. At 10^12 rows this
    is 4 streaming scans and ~2 MB of driver state where a sort-based
    splitter pays a full all-to-all exchange.

    key = hll_hash64(str(id)) (the SQL-recomputable fmix chain);
    splitter j (1..n_shards-1) = the key at 1-based rank
    ceil(j*n/n_shards) = (j*n + n_shards - 1) // n_shards of the
    sorted key multiset — the same integer rank arithmetic the DuckDB
    oracle applies to row_number() over the recomputed hashes.

    Returns an in-memory Arrow table (splitter, hi, lo) — splitters
    are a scalar summary (the thing you broadcast to a range
    exchange), not a dataset. hi/lo are the u64 key's two BIGINT
    halves (driver contract: no u64 column crosses engines whole)."""
    import numpy as np

    from textalyzer_ray.core.fingerprint import hll_hash64_array

    if n_shards < 2:
        raise ValueError("n_shards must be >= 2")

    def to_keys(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        ks = hll_hash64_array([str(i) for i in ids.tolist()])
        return pa.table({"k": pa.array(ks.view(np.int64))})

    keys = ds.select_columns([id_col]).map_batches(
        to_keys, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n = keys.count()
    out_schema = pa.schema(
        [
            pa.field("splitter", pa.int64()),
            pa.field("hi", pa.int64()),
            pa.field("lo", pa.int64()),
        ]
    )
    if n == 0:
        return out_schema.empty_table()

    # splitter j -> [running 16-bit-refined prefix, residual rank]
    state = {
        j: [np.uint64(0), (j * n + n_shards - 1) // n_shards]
        for j in range(1, n_shards)
    }

    for rnd in range(4):
        shift = np.uint64(48 - 16 * rnd)
        needed = np.unique(
            np.array([p for p, _ in state.values()], dtype=np.uint64)
        )

        def count_pass(
            t: pa.Table, _shift=shift, _needed=needed, _rnd=rnd
        ) -> pa.Table:
            k = t["k"].to_numpy(zero_copy_only=False).view(np.uint64)
            if _rnd == 0:
                sel = k
            else:
                prev = k >> np.uint64(64 - 16 * _rnd)
                sel = k[np.isin(prev, _needed)]
            # (prefix << 16 | bucket) == the key's top 16*(rnd+1) bits
            pb, cnt = np.unique(sel >> _shift, return_counts=True)
            return pa.table(
                {
                    "pb": pa.array(pb.view(np.int64)),
                    "n": pa.array(cnt.astype(np.int64)),
                }
            )

        # tiny: <= (n_shards-1) x 65536 (prefix, bucket) rows total
        agg: dict[int, int] = {}
        for r in keys.map_batches(
            count_pass, batch_format="pyarrow", zero_copy_batch=True
        ).take_all():
            pb = int(np.int64(r["pb"]).view(np.uint64))
            agg[pb] = agg.get(pb, 0) + int(r["n"])

        by_prefix: dict[int, list[tuple[int, int]]] = {}
        for pb, c in agg.items():
            by_prefix.setdefault(pb >> 16, []).append((pb & 0xFFFF, c))
        for buckets in by_prefix.values():
            buckets.sort()
        for j, (prefix, rank) in state.items():
            cum = 0
            for b, c in by_prefix[int(prefix)]:
                if cum + c >= rank:
                    state[j] = [
                        (prefix << np.uint64(16)) | np.uint64(b),
                        rank - cum,
                    ]
                    break
                cum += c
            else:  # pragma: no cover - rank <= prefix count by invariant
                raise AssertionError("rank exceeded prefix population")

    vals = [int(state[j][0]) for j in sorted(state)]
    assert vals == sorted(vals)
    return pa.table(
        {
            "splitter": pa.array(sorted(state), pa.int64()),
            "hi": pa.array([v >> 32 for v in vals], pa.int64()),
            "lo": pa.array([v & 0xFFFFFFFF for v in vals], pa.int64()),
        },
        schema=out_schema,
    )
