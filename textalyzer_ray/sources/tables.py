"""Size-aware parquet readers.

Ray Data's default block-splitting aims at large inputs; on a small
file it can fan a few MB out into dozens of blocks, and every
downstream stage and shuffle then pays per-block overhead (measured:
64 blocks for a 1.5 MB table made the word-histogram 17x slower than 8
blocks). ``read_table`` picks ``override_num_blocks`` from the FILE
SIZE so the same code is efficient at every scale:

  block_size = clamp(bytes / cpus, 4 MiB, 128 MiB)
  blocks     = ceil(bytes / block_size)

- small file (< 4 MiB x cpus): few blocks, no per-block overhead storm.
- large input: converges to Ray's own ~128 MiB target, blocks scale
  linearly with data (100 TB -> ~800k blocks across the cluster).

IMPORTANT: Ray Data never splits one block across tasks — ``batch_size``
only slices batches WITHIN a task — so block count bounds stage
parallelism. Pipelines with expensive per-row work (HTML parsing,
scoring) must pass ``min_blocks ~ 2x cpus``; cheap vectorized aggregate
paths should NOT (small blocks there just buy per-block overhead —
measured both ways).

Always pass ``columns=`` — prune at the read (ray_guide).
"""

from __future__ import annotations

import math
import os

import ray
from ray.data import Dataset

_MIN_BLOCK = 4 << 20
_MAX_BLOCK = 128 << 20


def cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


def _num_blocks_for(total_bytes: int) -> int:
    block = min(max(total_bytes // max(cluster_cpus(), 1), _MIN_BLOCK), _MAX_BLOCK)
    return max(1, math.ceil(total_bytes / block))


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    num_blocks: int | None = None,
    min_blocks: int | None = None,
) -> Dataset:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    path = os.path.join(sf_dir, f"{name}.parquet")
    if num_blocks is None:
        num_blocks = _num_blocks_for(os.path.getsize(path))
    if min_blocks is not None:
        num_blocks = max(num_blocks, min_blocks)
        # never shatter a small table into <128-row blocks — per-block
        # overhead would dominate whatever min_blocks was buying
        n_rows = pq.read_metadata(path).num_rows
        num_blocks = min(num_blocks, max(1, n_rows // 128))
    # Explicit metadata-FREE schema: parquet written via pandas carries
    # b'pandas' schema metadata, and pyarrow 16.1 Schema.__hash__ fails
    # on it ("unhashable type: 'dict'") — every downstream
    # unify_schemas() then logs a warning and loses its early-exit
    # schema dedup (VERDICT r2 #8). Stripping here fixes the whole
    # lineage at zero per-row cost.
    file_schema = pq.read_schema(path).remove_metadata()
    schema = (
        pa.schema([file_schema.field(c) for c in columns])
        if columns
        else file_schema
    )
    return rd.read_parquet(
        path, columns=columns, schema=schema, override_num_blocks=num_blocks
    )


def cpu_heavy_min_blocks() -> int:
    """Block floor for pipelines dominated by per-row compute: ~4 tasks
    per core so the last wave's straggler tail is short."""
    return 4 * cluster_cpus()


def read_jsonl(paths, columns: list[str] | None = None):
    """Line-delimited JSON shards -> Dataset (the other common raw-dump
    interchange format besides WARC). One read task per shard via
    ray.data.read_json (pyarrow JSON reader — C++, not per-line
    Python); ``columns`` prunes AFTER parse (JSON is row-major on disk,
    so unlike parquet the read itself cannot skip columns — prefer
    parquet for anything read more than once)."""
    import ray.data as rd

    ds = rd.read_json(paths, file_extensions=["jsonl", "json"])
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl_shards(
    out_dir: str, table, n_shards: int = 4, id_col: str = "doc_id"
) -> int:
    """Deterministic .jsonl shards from an Arrow table (test/bench
    fixture writer; round-robin by row position)."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    cols = table.column_names
    rows = [dict(zip(cols, r)) for r in zip(*(table[c].to_pylist() for c in cols))]
    files = [
        open(
            os.path.join(out_dir, f"part-{s}.jsonl"), "w", encoding="utf-8"
        )
        for s in range(n_shards)
    ]
    try:
        for i, r in enumerate(rows):
            files[i % n_shards].write(json.dumps(r, ensure_ascii=False) + "\n")
    finally:
        for f in files:
            f.close()
    return len(rows)


def read_csv_shards(paths, columns: list[str] | None = None):
    """CSV shards -> Dataset (the spreadsheet/export interchange
    format). One read task per shard via ray.data.read_csv (Arrow C++
    CSV reader); ``newlines_in_values`` is on because document text
    legitimately contains line breaks — Arrow then parses quoted
    multi-line fields correctly but cannot split a single file into
    chunks, so parallelism = shard count (write many shards). Like
    JSONL, the read can't prune columns on disk; prefer parquet for
    anything read more than once."""
    import pyarrow.csv as pcsv
    import ray.data as rd

    ds = rd.read_csv(
        paths,
        file_extensions=["csv"],
        parse_options=pcsv.ParseOptions(newlines_in_values=True),
    )
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_csv_shards(
    out_dir: str, table, n_shards: int = 4, id_col: str = "doc_id"
) -> int:
    """Deterministic .csv shards from an Arrow table (test/bench
    fixture writer; round-robin by row position, stdlib csv quoting so
    embedded commas/quotes/newlines survive the round trip)."""
    import csv
    import os

    os.makedirs(out_dir, exist_ok=True)
    cols = table.column_names
    rows = list(zip(*(table[c].to_pylist() for c in cols)))
    files, writers = [], []
    try:
        for s in range(n_shards):
            f = open(
                os.path.join(out_dir, f"part-{s}.csv"),
                "w",
                encoding="utf-8",
                newline="",
            )
            files.append(f)
            w = csv.writer(f, quoting=csv.QUOTE_MINIMAL)
            w.writerow(cols)
            writers.append(w)
        for i, r in enumerate(rows):
            writers[i % n_shards].writerow(r)
    finally:
        for f in files:
            f.close()
    return len(rows)
