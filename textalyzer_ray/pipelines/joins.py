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
    """Join a large Dataset against a small Arrow table (broadcast)."""
    small_ref = ray.put(small)

    class JoinBatch:
        def __init__(self, ref, key: str, how: str):
            self.small = pl.from_arrow(ray.get(ref))  # fetched once per actor
            self.key = key
            self.how = how

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = pl.from_arrow(batch).join(self.small, on=self.key, how=self.how)
            return out.to_arrow()

    from textalyzer_ray.stages.pools import default_pool

    return big.map_batches(
        JoinBatch,
        fn_constructor_args=(small_ref, key, how),
        batch_format="pyarrow",
        concurrency=default_pool(),
    )


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
