"""Join strategies (ray_guide "Joins and lookups").

The reference has no joins (SURVEY.md §2.4); a web-scale engine needs
two shapes:

- ``broadcast_join``: small side (dimension table) shipped ONCE via
  ``ray.put``; each batch does a vectorized polars join against it. No
  shuffle — the pattern for vocab/dimension/blocklist lookups.
- ``bucketed_join``: both sides large — explicit partitioned hash join:
  add ``bucket = hash(key) % B`` to both sides, tag, union, group by
  bucket, join each bucket pairwise inside ``map_groups``. B is the
  partitioning knob; skewed keys need salting into sub-buckets (the
  bucket count is small, so Ray's per-group overhead is irrelevant
  here).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import ray
from ray.data import Dataset


def broadcast_join(
    big: Dataset,
    small: pa.Table,
    key: str,
    how: str = "inner",
) -> Dataset:
    """Join a large Dataset against a small Arrow table (broadcast).

    Runs as a TASK pool with the per-worker-process object cache (the
    stages.groups pattern): an actor pool here can deadlock against a
    hash-shuffle operator elsewhere in the same plan (both reserve CPUs;
    the join aggregators never start at small num_cpus), and tasks avoid
    pool spin-up anyway — the broadcast table is deserialized once per
    worker process, not per task."""
    small_ref = ray.put(small)

    def join_batch(batch: pa.Table) -> pa.Table:
        from textalyzer_ray.stages.groups import _worker_object_cache

        cache = _worker_object_cache()
        ck = small_ref.hex()
        sm = cache.get(ck)
        if sm is None:
            sm = cache[ck] = pl.from_arrow(ray.get(small_ref))
        return pl.from_arrow(batch).join(sm, on=key, how=how).to_arrow()

    return big.map_batches(join_batch, batch_format="pyarrow")


def bucketed_join(
    left: Dataset,
    right: Dataset,
    left_key: str,
    right_key: str | None = None,
    num_partitions: int = 32,
    how: str = "inner",
) -> Dataset:
    """Partitioned hash join of two large Datasets.

    Delegates to Ray Data's native ``Dataset.join`` (hash-partitioned,
    Ray 2.49+; supports inner/outer/semi/anti) — verified to run without
    the HASH_SHUFFLE-strategy deadlock even at num_cpus=4.
    ``num_partitions`` is the explicit partitioning knob: each partition
    joins independently, so it bounds per-partition memory; size it to
    corpus_bytes / (worker_heap / 4) at scale. Skewed keys: pre-salt the
    hot key into ``key || '#' || salt`` on both sides before calling.
    """
    right_key = right_key or left_key
    return left.join(
        right,
        how,
        num_partitions=num_partitions,
        on=(left_key,),
        right_on=(right_key,),
    )


def asof_join_by_key(
    left: Dataset,
    right: Dataset,
    key: str,
    ts_col: str = "ts",
    suffix: str = "_right",
) -> Dataset:
    """As-of join: for each left row, the LATEST right row with the same
    ``key`` and ``right.ts <= left.ts`` (ray_guide "As-of / range
    join"): rename the right side's columns up front (so the aligned
    union is unambiguous), hash-partition both sides by key into the
    same blocks, then ONE vectorized ``polars.join_asof`` per block
    handles every key in it at once (VERDICT r1 #8 — no per-group
    Python, no Ray per-group finalization).

    Partitioning assumption: one key's rows fit one block partition
    (true for per-user event streams; a hot key would need
    time-bucketed sub-splits).
    """
    import pyarrow as pa_

    r_ts = ts_col + suffix

    def rename_right(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [c if c == key else c + suffix for c in t.column_names]
        )

    right_r = right.map_batches(rename_right, batch_format="pyarrow")

    l_schema = left.schema().base_schema
    r_schema = [
        pa_.field(f.name if f.name == key else f.name + suffix, f.type)
        for f in right.schema().base_schema
    ]
    all_fields = list(l_schema) + [f for f in r_schema if f.name != key]
    names = [f.name for f in all_fields]
    if len(set(names)) != len(names):
        raise ValueError(f"column collision after suffixing: {names}")

    def tag_and_pad(side: str):
        def fn(t: pa.Table) -> pa.Table:
            for f in all_fields:
                if f.name not in t.column_names:
                    t = t.append_column(f.name, pa_.nulls(t.num_rows, f.type))
            t = t.select(names)
            return t.append_column("__side", pa_.array([side] * t.num_rows))

        return fn

    both = left.map_batches(tag_and_pad("l"), batch_format="pyarrow").union(
        right_r.map_batches(tag_and_pad("r"), batch_format="pyarrow")
    )

    l_names = [f.name for f in l_schema]
    r_names = [f.name for f in r_schema if f.name != key] + [key]
    out_schema = pa_.schema(all_fields)

    from textalyzer_ray.stages.groups import grouped_apply

    def merge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t)
        l = df.filter(pl.col("__side") == "l").select(l_names).sort(ts_col)
        r = (
            df.filter(pl.col("__side") == "r")
            .select(r_names)
            # join_asof consumes right_on; duplicate it so the right ts
            # stays a payload column like pandas merge_asof keeps it
            .with_columns(pl.col(r_ts).alias("__on"))
            .sort("__on")
        )
        out = l.join_asof(
            r, left_on=ts_col, right_on="__on", by=key, strategy="backward"
        )
        return out.select(names).to_arrow().cast(out_schema)

    return grouped_apply(both, [key], merge_block)


def range_join_by_key(
    left: Dataset,
    right: Dataset,
    key: str,
    ts_col: str = "ts",
    lower_s: int = 3600,
    upper_s: int = 0,
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> Dataset:
    """Banded RANGE join: every (left, right) pair sharing ``key`` with
    ``left.ts - lower_s <= right.ts <= left.ts + upper_s`` (defaults:
    right events in the hour BEFORE each left event — the
    "views leading up to each purchase" attribution shape). Returns
    (left_id, right_id_right) pairs sorted by (left_id, right_id).

    Same partitioning as the as-of join: both sides hash-align on the
    key, and each block resolves the band with ONE vectorized polars
    inequality join over all its keys at once — no per-group Python.
    Output size is inherently |matching pairs|; the band bounds it
    (each left row matches only right rows inside a fixed window).
    Partitioning assumption: one key's rows fit one block (per-user
    event streams; a hot key needs time-bucketed sub-splits)."""
    import polars as pl
    import pyarrow as pa_

    from textalyzer_ray.stages.groups import grouped_apply, id_type_of

    lo_us = lower_s * 1_000_000
    hi_us = upper_s * 1_000_000
    out_schema = pa_.schema(
        [
            pa_.field(left_id, id_type_of(left, left_id)),
            pa_.field(right_id + "_right", id_type_of(right, right_id)),
        ]
    )

    def tag(side: str, id_name: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa_.table(
                {
                    key: t[key],
                    "__id": t[id_name],
                    "__ts": t[ts_col].combine_chunks().cast(pa_.int64()),
                    "__side": pa_.array([side] * t.num_rows),
                }
            )

        return fn

    both = left.map_batches(tag("l", left_id), batch_format="pyarrow").union(
        right.map_batches(tag("r", right_id), batch_format="pyarrow")
    )

    def band_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t)
        l = df.filter(pl.col("__side") == "l").select(
            [key, pl.col("__id").alias("__lid"), pl.col("__ts").alias("__lts")]
        )
        r = df.filter(pl.col("__side") == "r").select(
            [key, pl.col("__id").alias("__rid"), pl.col("__ts").alias("__rts")]
        )
        out = (
            l.join(r, on=key, how="inner")
            .filter(
                (pl.col("__rts") >= pl.col("__lts") - lo_us)
                & (pl.col("__rts") <= pl.col("__lts") + hi_us)
            )
            .select(
                [
                    pl.col("__lid").alias(left_id),
                    pl.col("__rid").alias(right_id + "_right"),
                ]
            )
        )
        return out.to_arrow().cast(out_schema)

    return grouped_apply(both, [key], band_block).sort(
        [left_id, right_id + "_right"]
    )


def union_tag_lookup(
    big: Dataset,
    lookup: Dataset,
    key_col: str,
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> Dataset:
    """Join-free distributed lookup: attach ``lookup[value_col]`` to
    every ``big`` row whose ``key_col`` matches (inner), via ONE
    union-tag hash exchange + a per-block polars join — the
    host_pagerank pattern generalized. Unlike ``bucketed_join`` this
    never touches acero, so hash partitions with fewer distinct keys
    than partitions (schema-less empty blocks, CLAUDE.md) are harmless.

    ``lookup`` must be unique on ``key_col`` (counts/degree tables are
    by construction); ``big`` keeps its column order, ``out_col``
    appended."""
    import pyarrow as pa_

    from textalyzer_ray.stages.groups import grouped_apply, id_type_of

    big_schema = big.schema()
    if big_schema is None:
        return big  # lazy-empty lineage: nothing to attach
    big_fields = list(big_schema.base_schema)
    if out_col in [f.name for f in big_fields]:
        raise ValueError(f"{out_col} already in big's schema")
    val_type = id_type_of(lookup, value_col)
    tag_fields = big_fields + [
        pa_.field(out_col, val_type),
        pa_.field("__side", pa_.int8()),
    ]
    tag_schema = pa_.schema(tag_fields)
    names = [f.name for f in big_fields]

    def tag_big(t: pa.Table) -> pa.Table:
        n = t.num_rows
        t = t.select(names)
        t = t.append_column(out_col, pa_.nulls(n, val_type))
        return t.append_column(
            "__side", pa_.array([1] * n, pa_.int8())
        ).cast(tag_schema)

    def tag_lookup(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for f in big_fields:
            cols[f.name] = (
                t[key_col].cast(f.type)
                if f.name == key_col
                else pa_.nulls(n, f.type)
            )
        cols[out_col] = t[value_col].cast(val_type)
        cols["__side"] = pa_.array([0] * n, pa_.int8())
        return pa_.table(cols, schema=tag_schema)

    both = big.map_batches(tag_big, batch_format="pyarrow").union(
        lookup.map_batches(tag_lookup, batch_format="pyarrow")
    )
    out_schema = pa_.schema(big_fields + [pa_.field(out_col, val_type)])

    def merge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t)
        vm = df.filter(pl.col("__side") == 0).select(
            [key_col, pl.col(out_col).alias("__v")]
        )
        cand = df.filter(pl.col("__side") == 1).drop([out_col, "__side"])
        out = cand.join(vm, on=key_col, how="inner").rename({"__v": out_col})
        # chunk-sliced cast: a blob-heavy partition can exceed the
        # int32 offset capacity of one binary chunk (r5 soak finding)
        from textalyzer_ray.stages.groups import cast_table_chunked

        return cast_table_chunked(
            out.select([f.name for f in out_schema]).to_arrow(), out_schema
        )

    return grouped_apply(both, [key_col], merge_block, num_partitions)
