"""Partition-addressed resumable output (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Ray Data gives task-level lineage within one run; it does NOT give
job-level resume (SURVEY.md §4). This module adds it:

- Output layout: ``out_dir/part=<pid>/*.parquet`` — one directory per
  input partition, written ATOMICALLY (write to ``part=<pid>.tmp-*``,
  fsync-free directory rename) so a crash never leaves a half-complete
  partition that looks complete.
- Lineage manifest: ``out_dir/_manifests/<pid>.json`` with the input
  fragment list, row count, schema, content fingerprint (order-
  insensitive xor of row hashes — cheap, deterministic), metric
  counters, wall time and engine version. Written AFTER the data rename;
  a partition is complete iff its manifest exists and parses.
- Resume: ``PartitionedRunner.run`` skips partitions whose manifest is
  complete; everything else is (re)built. Deterministic pipelines +
  content fingerprints let a verifier confirm a resumed run equals a
  fresh one.

At 10^12 scale partitions map to input file ranges / key ranges; here
each partition is whatever ``build(partition)`` reads (typically one
parquet fragment list).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import asdict, dataclass, field
from typing import Any, Callable

import pyarrow as pa

from textalyzer_ray import __version__

MANIFEST_DIR = "_manifests"


@dataclass
class PartitionManifest:
    pid: str
    inputs: list[str]
    row_count: int
    schema: list[str]
    fingerprint: str
    metrics: dict[str, Any] = field(default_factory=dict)
    wall_time_s: float = 0.0
    engine_version: str = __version__

    @classmethod
    def load(cls, path: str) -> "PartitionManifest | None":
        try:
            with open(path) as f:
                return cls(**json.load(f))
        except (OSError, ValueError, TypeError):
            return None


def _fingerprint_batches(batches) -> tuple[str, int]:
    """Order-insensitive content fingerprint: xor of per-row 64-bit
    hashes (polars) over all columns, plus the row count."""
    import polars as pl

    acc = 0
    n = 0
    for b in batches:
        if b.num_rows == 0:
            continue
        df = pl.from_arrow(b)
        h = df.hash_rows(seed=0).to_numpy()
        n += len(h)
        x = 0
        for v in h:
            x ^= int(v)
        acc ^= x
    return f"{acc:016x}", n


class PartitionedRunner:
    """Run ``build(partition) -> ray.data.Dataset`` per partition with
    atomic partition-addressed output and manifest-gated resume."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)

    def _manifest_path(self, pid: str) -> str:
        return os.path.join(self.out_dir, MANIFEST_DIR, f"{pid}.json")

    def _part_dir(self, pid: str) -> str:
        return os.path.join(self.out_dir, f"part={pid}")

    def _sweep_tmp_dirs(self) -> None:
        """Delete ``part=*.tmp-*`` dirs leaked by a crash between
        write_parquet and the atomic rename — they match ``part=*`` globs
        and recursive reads of out_dir, so a consumer could double-count
        rows from a dead run (ADVICE r1)."""
        for name in os.listdir(self.out_dir):
            if name.startswith("part=") and ".tmp-" in name:
                shutil.rmtree(os.path.join(self.out_dir, name), ignore_errors=True)

    def completed(self) -> dict[str, PartitionManifest]:
        out = {}
        mdir = os.path.join(self.out_dir, MANIFEST_DIR)
        for name in sorted(os.listdir(mdir)):
            if name.endswith(".json"):
                m = PartitionManifest.load(os.path.join(mdir, name))
                if m is not None and os.path.isdir(self._part_dir(m.pid)):
                    out[m.pid] = m
        return out

    def run(
        self,
        partitions: list[dict],
        build: Callable[[dict], "Any"],
        resume: bool = True,
    ) -> dict[str, Any]:
        """partitions: [{"pid": str, "inputs": [str, ...], ...}].

        Returns summary {"completed": [...], "skipped": [...], "ran": [...]}.
        """
        self._sweep_tmp_dirs()
        done = self.completed() if resume else {}
        skipped, ran = [], []
        for part in partitions:
            pid = str(part["pid"])
            # Skip only if the manifest's recorded inputs equal this
            # plan's inputs for the pid — a rerun with different
            # n_partitions or regenerated input must NOT silently reuse a
            # colliding pid that covers different rows (ADVICE r1).
            cur_inputs = [str(x) for x in part.get("inputs", [])]
            if pid in done and done[pid].inputs == cur_inputs:
                skipped.append(pid)
                continue
            t0 = time.monotonic()
            ds = build(part)
            tmp = os.path.join(self.out_dir, f"part={pid}.tmp-{uuid.uuid4().hex[:8]}")
            final = self._part_dir(pid)
            if os.path.isdir(final):
                shutil.rmtree(final)  # stale partial from a dead run
            ds.write_parquet(tmp)
            # a zero-row partition writes no files AND no directory —
            # materialize the empty dir so the rename/manifest protocol
            # (and resume) treat it as completed-with-0-rows
            os.makedirs(tmp, exist_ok=True)
            # fingerprint from what was actually written (read-back =
            # verifies the files too)
            import pyarrow.parquet as pq

            files = [
                os.path.join(tmp, f) for f in sorted(os.listdir(tmp)) if f.endswith(".parquet")
            ]
            tables = [pq.read_table(f) for f in files]
            fp, n_rows = _fingerprint_batches(tables)
            schema_names = list(tables[0].schema.names) if tables else []
            os.rename(tmp, final)
            manifest = PartitionManifest(
                pid=pid,
                inputs=[str(x) for x in part.get("inputs", [])],
                row_count=n_rows,
                schema=schema_names,
                fingerprint=fp,
                metrics=dict(part.get("metrics", {})),
                wall_time_s=round(time.monotonic() - t0, 3),
            )
            tmp_manifest = self._manifest_path(pid) + ".tmp"
            with open(tmp_manifest, "w") as f:
                json.dump(asdict(manifest), f, indent=1)
            os.rename(tmp_manifest, self._manifest_path(pid))
            ran.append(pid)
        return {"skipped": skipped, "ran": ran, "completed": sorted(set(skipped) | set(ran))}


def partition_documents_path(sf_dir: str, n_partitions: int) -> list[dict]:
    """Split the documents table into row-range partitions (driver-side
    plan only; each build() reads its own range)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    n_rows = pq.read_metadata(path).num_rows
    step = max(1, (n_rows + n_partitions - 1) // n_partitions)
    return [
        {
            "pid": f"{i:05d}",
            "inputs": [f"{path}#rows={lo}-{min(lo + step, n_rows)}"],
            "row_range": (lo, min(lo + step, n_rows)),
            "path": path,
        }
        for i, lo in enumerate(range(0, n_rows, step))
    ]


def partition_documents_by_id(
    sf_dir: str, n_partitions: int, id_col: str = "doc_id"
) -> list[dict]:
    """Split the documents table into equal ID-RANGE partitions from
    the parquet row-group statistics (no data scan). Unlike
    ``partition_documents_path`` this stays correct for sparse /
    offset id spaces (e.g. replica-offset soak corpora): every id
    falls in exactly one range, empty ranges are legal. For dense
    0..n-1 ids the plan coincides with the row-range plan."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    md = pq.read_metadata(path)
    idx = pq.read_schema(path).get_field_index(id_col)
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            mins, maxs = [], []
            break
        mins.append(st.min)
        maxs.append(st.max)
    if mins:
        lo_id, hi_id = min(mins), max(maxs) + 1
    else:  # stats missing: one cheap single-column scan
        t = pq.read_table(path, columns=[id_col])
        import pyarrow.compute as pc

        lo_id = pc.min(t[id_col]).as_py()
        hi_id = pc.max(t[id_col]).as_py() + 1
    step = max(1, (hi_id - lo_id + n_partitions - 1) // n_partitions)
    return [
        {
            "pid": f"{i:05d}",
            "inputs": [f"{path}#ids={lo}-{min(lo + step, hi_id)}"],
            "row_range": (lo, min(lo + step, hi_id)),
            "path": path,
        }
        for i, lo in enumerate(range(lo_id, hi_id, step))
    ]
