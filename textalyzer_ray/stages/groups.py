"""High-cardinality grouped COUNT/MIN without per-group Python.

Ray Data's ``groupby().aggregate()`` finalizes groups in a Python loop
(~0.1 ms per group — measured 21 s for 153k groups whose sort took
0.11 s). For high-cardinality keys (distinct lines, LSH band hashes,
content hashes) that overhead dominates everything. This module keeps
those aggregations fully vectorized:

- ``key_counts``: per-batch polars ``group_by`` partials (count + opt.
  min columns) -> tree merge via ``repartition`` + whole-block polars
  merges. No Ray groupby anywhere; every step is a vectorized kernel.
- ``duplicate_keys``: the keys with count >= min_count, collected (the
  candidate set is small by construction — it is the *duplicated*
  fraction). Broadcast it with ``ray.put`` and filter the big dataset
  down to colliding rows BEFORE any Ray groupby, so the per-group
  overhead only ever applies to real candidate groups.

Scale note: the merge tree ends in one block of all distinct keys —
fine up to ~10^8 distinct keys per node; beyond that raise
``fanout``/add a level or swap the final merge for a cluster hash
shuffle. The filter-before-group pattern itself is the 100 TB shape
(dup-key set -> bloom filter broadcast).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
from ray.data import Dataset


def _to_arrow_counts(
    df: pl.DataFrame, keys: list[str], min_cols: list[str], sum_cols: list[str]
) -> pa.Table:
    cols = keys + ["count"] + [f"min_{c}" for c in min_cols] + [
        f"sum_{c}" for c in sum_cols
    ]
    return df.select(cols).to_arrow()


def key_counts(
    ds: Dataset,
    keys: list[str],
    min_cols: list[str] | None = None,
    sum_cols: list[str] | None = None,
    fanout: int = 8,
    levels: int = 2,
    distributed: bool | None = None,
    auto_threshold: int = 20_000_000,
) -> Dataset:
    """-> Dataset[keys..., count:int64 (+ min_<c> / sum_<c>)], one row
    per distinct key combination. All merging is polars.

    ``distributed=None`` (default, r3): AUTO — the per-block partials
    are materialized and their MEASURED total row count picks the merge:
    tree below ``auto_threshold`` partial rows, key-aligned above (so a
    10^7-vocabulary corpus can never silently funnel into the
    single-block final merge). The probe is one metadata count over
    blocks the merge was about to read anyway.

    ``distributed=False``: tree merge ending in ONE block — right when
    the result is collected anyway (dup-key sets) and fine to ~10^8
    distinct keys per node. ``distributed=True``: final merge via
    key-aligned ``grouped_apply`` — no single-node bottleneck, the
    10^12-scale path (result stays partitioned)."""
    import logging

    min_cols = list(min_cols or [])
    sum_cols = list(sum_cols or [])

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(keys + min_cols + sum_cols))
        aggs = (
            [pl.len().cast(pl.Int64).alias("count")]
            + [pl.col(c).min().alias(f"min_{c}") for c in min_cols]
            + [pl.col(c).sum().cast(pl.Int64).alias(f"sum_{c}") for c in sum_cols]
        )
        return _to_arrow_counts(
            df.group_by(keys).agg(aggs), keys, min_cols, sum_cols
        )

    def merge(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        aggs = (
            [pl.col("count").sum().alias("count")]
            + [pl.col(f"min_{c}").min().alias(f"min_{c}") for c in min_cols]
            + [pl.col(f"sum_{c}").sum().alias(f"sum_{c}") for c in sum_cols]
        )
        return _to_arrow_counts(
            df.group_by(keys).agg(aggs), keys, min_cols, sum_cols
        )

    cur = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    n_partial = None
    if distributed is None:
        cur = cur.materialize()
        n_partial = cur.count()
        distributed = n_partial > auto_threshold
        if distributed:
            logging.getLogger(__name__).info(
                "key_counts: %d partial rows > auto_threshold=%d — "
                "key-aligned final merge", n_partial, auto_threshold,
            )
    if distributed:
        num_partitions = (
            partitions_for(n_partial, rows_per_part=5_000_000)
            if n_partial is not None
            else None
        )
        return grouped_apply(cur, keys, merge, num_partitions=num_partitions)
    # tree merge: each level coalesces blocks by `fanout` and merges
    # whole blocks (batch_size=None = one batch per block)
    for level in range(levels - 1):
        cur = cur.repartition(max(1, fanout ** (levels - 1 - level))).map_batches(
            merge, batch_format="pyarrow", batch_size=None
        )
    return cur.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


def duplicate_keys(
    ds: Dataset,
    keys: list[str],
    min_count: int = 2,
    min_cols: list[str] | None = None,
) -> pa.Table:
    """Collected table of key combinations appearing >= min_count times."""
    import pyarrow.compute as pc

    # distributed=False explicitly: the result is COLLECTED right below,
    # so the tree-to-one-block final is inherent to this helper's
    # contract and the r3 auto-probe's materialize+count would be pure
    # overhead on this path (it exists for callers that keep the counts
    # distributed).
    counts = key_counts(ds, keys, min_cols=min_cols, distributed=False)
    dup = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["count"], min_count)),
        batch_format="pyarrow",
    )
    tables = [b for b in dup.iter_batches(batch_size=None, batch_format="pyarrow")]
    if not tables:
        schema = pa.schema(
            [pa.field(k, pa.string()) for k in keys] + [pa.field("count", pa.int64())]
        )
        return schema.empty_table()
    return pa.concat_tables(tables)


def filter_to_keys(
    ds: Dataset, keys: list[str], keytable_ref, concurrency=None
) -> Dataset:
    """Keep only rows whose key tuple appears in the broadcast key table
    (``ray.put`` of a pyarrow Table holding the key columns). Fully
    vectorized: one polars semi-join per batch — no per-row Python (the
    old ``tup in keyset`` loop sat on the hot path of G2 and minhash).
    Runs as tasks; the key table is deserialized once per WORKER PROCESS
    via a small cache (workers are reused across tasks)."""
    import ray

    def key_filter(t: pa.Table) -> pa.Table:
        cache = _worker_object_cache()
        ck = keytable_ref.hex() if hasattr(keytable_ref, "hex") else str(keytable_ref)
        keydf = cache.get(ck)
        if keydf is None:
            keydf = cache[ck] = pl.from_arrow(ray.get(keytable_ref)).select(keys).unique()
        out = pl.from_arrow(t).join(keydf, on=keys, how="semi").to_arrow()
        return out.cast(t.schema)

    return ds.map_batches(key_filter, batch_format="pyarrow")


def cast_table_chunked(
    t: pa.Table, schema: pa.Schema, limit: int = (1 << 31) - 64
) -> pa.Table:
    """Schema cast that survives > 2 GiB binary/string columns (r5
    soak finding: polars emits single-chunk large_binary, and Arrow
    cannot cast one chunk whose byte extent exceeds int32 offsets into
    ``binary`` — "input array too large"). A CHUNKED column of
    < 2 GiB slices IS a valid binary column, so oversized chunks are
    row-sliced along their offsets buffer to fit ``limit`` bytes each,
    cast per slice, and reassembled. Columns already at the target
    type pass through zero-copy."""
    cols = []
    for field in schema:
        col = t.column(t.schema.get_field_index(field.name))
        if col.type == field.type:
            cols.append(col)
            continue
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        out_chunks = []
        for ch in chunks:
            out_chunks.extend(_cast_chunk_sliced(ch, field.type, limit))
        cols.append(
            pa.chunked_array(
                out_chunks if out_chunks else [pa.array([], field.type)],
                field.type,
            )
        )
    return pa.table(cols, schema=schema)


def _cast_chunk_sliced(ch: pa.Array, target: pa.DataType, limit: int):
    import numpy as np

    src = ch.type
    need_slice = (
        pa.types.is_large_binary(src) or pa.types.is_large_string(src)
    ) and (pa.types.is_binary(target) or pa.types.is_string(target))
    if not need_slice or len(ch) == 0:
        return [ch.cast(target)]
    off = np.frombuffer(ch.buffers()[1], np.int64)[
        ch.offset : ch.offset + len(ch) + 1
    ]
    # plain cast rewrites offsets against the ORIGINAL shared data
    # buffer, so it fails whenever the ABSOLUTE end offset passes
    # int32 — even for a small slice near the end (measured). Safe
    # only when the whole buffer extent ends below the limit.
    if int(off[-1]) <= limit:
        return [ch.cast(target)]
    out = []
    start = 0
    while start < len(ch):
        end = int(
            np.searchsorted(off, off[start] + limit, side="right")
        ) - 1
        end = max(end, start + 1)
        out.append(_compact_cast(ch.slice(start, end - start), target))
        start = end
    return out


def _compact_cast(sl: pa.Array, target: pa.DataType) -> pa.Array:
    """Cast a (sliced) large_binary/large_string array to its 32-bit
    type by COMPACTING into fresh buffers — rebased int32 offsets +
    the slice's own byte segment — so absolute positions in the source
    buffer never matter. Validity bitmap is re-packed for the slice."""
    import numpy as np

    off = np.frombuffer(sl.buffers()[1], np.int64)[
        sl.offset : sl.offset + len(sl) + 1
    ]
    buf = sl.buffers()[2]
    data = (
        np.frombuffer(buf, np.uint8) if buf is not None else np.empty(0, np.uint8)
    )
    seg = data[off[0] : off[-1]]
    new_off = (off - off[0]).astype(np.int32)
    validity = None
    nulls = sl.null_count
    vbuf = sl.buffers()[0]
    if vbuf is not None and nulls:
        bits = np.unpackbits(
            np.frombuffer(vbuf, np.uint8), bitorder="little"
        )[sl.offset : sl.offset + len(sl)]
        validity = pa.py_buffer(
            np.packbits(bits, bitorder="little").tobytes()
        )
    return pa.Array.from_buffers(
        target,
        len(sl),
        [validity, pa.py_buffer(new_off.tobytes()), pa.py_buffer(seg.tobytes())],
        null_count=nulls if validity is not None else 0,
    )


_WORKER_CACHE: dict = {}


def _worker_object_cache(max_entries: int = 4) -> dict:
    """Per-worker-process cache for broadcast objects."""
    while len(_WORKER_CACHE) > max_entries:
        _WORKER_CACHE.pop(next(iter(_WORKER_CACHE)))
    return _WORKER_CACHE


def partitions_for(n_rows: int, rows_per_part: int = 1_000_000) -> int:
    """Hash-shuffle partition count sized to the MEASURED row count:
    each HashShuffleOperator pays ~1-2 s aggregator-actor startup per
    partition (CLAUDE.md), so defaulting to cluster_cpus over a small
    keyed dataset multiplies fixed cost 10x+. ~1M rows per partition
    bounds partition memory at scale and keeps small runs at 2-way."""
    return max(2, -(-n_rows // rows_per_part))


def grouped_apply(
    ds: Dataset,
    keys: list[str],
    fn,
    num_partitions: int | None = None,
) -> Dataset:
    """Key-aligned grouped apply: hash-partition by ``keys`` so each key
    lands entirely in ONE block, then run ``fn`` once per block
    (pyarrow in/out, whole-block batches). ``fn`` sees every row of each
    of its keys — per-block polars group_by is therefore globally
    correct, with zero per-group Python.

    The HASH_SHUFFLE strategy requirement is scoped to THIS pipeline's
    lineage via the dataset's own captured DataContext (setting it
    globally deadlocks small-cpu sessions — textalyzer_ray/context.py).
    NOTE the context object is shared along the lineage, so the INPUT
    dataset and any downstream ops of the result also carry the hash
    strategy; sorts and groupbys still work under it (asserted in
    tests), but callers should treat the input dataset as consumed.
    """
    from ray.data.context import ShuffleStrategy

    if num_partitions is None:
        from textalyzer_ray.sources.tables import cluster_cpus

        num_partitions = max(cluster_cpus(), 2)
    pipe = ds.repartition(num_partitions, keys=list(keys))
    pipe.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return pipe.map_batches(fn, batch_format="pyarrow", batch_size=None)


def id_type_of(ds, col: str) -> "pa.DataType":
    """Arrow type of ``col`` with an int64 fallback: Dataset.schema()
    is None for lazy-empty lineages (filter stages emit schema-less
    empty tables), and every id column in this repo is int64."""
    sch = ds.schema()
    return sch.base_schema.field(col).type if sch is not None else pa.int64()
