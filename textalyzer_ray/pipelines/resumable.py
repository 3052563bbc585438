"""Partition-addressed, resumable flagship runs (north_rule: streaming
execution with per-partition lineage + checkpoint resume).

``resumable_flagship`` splits the input into row-range partitions and
runs read -> synthesize pages -> extract -> score per partition through
``state.PartitionedRunner``: each partition lands atomically in
``out_dir/part=<pid>/`` with a lineage manifest (inputs, row count,
schema, content fingerprint, metrics, wall time); a rerun skips
complete partitions and rebuilds only lost/corrupt ones. Deterministic
pipelines make the resume verifiable: fingerprints equal a fresh run's.
"""

from __future__ import annotations

import pyarrow.compute as pc

from textalyzer_ray.state.manifest import (
    PartitionedRunner,
    partition_documents_by_id,
    partition_documents_path,
)


def resumable_flagship(
    sf_dir: str,
    out_dir: str,
    n_partitions: int = 8,
    resume: bool = True,
) -> dict:
    """Run the flagship extraction+metrics pipeline partition-by-
    partition with checkpoint resume. Returns the runner summary plus
    per-partition manifests."""
    from textalyzer_ray.pipelines.extraction import page_metrics
    from textalyzer_ray.sources.tables import read_table
    from textalyzer_ray.sources.webgen import pages_batch

    def build(part: dict):
        lo, hi = part["row_range"]
        docs = read_table(sf_dir, "documents").map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.greater_equal(t["doc_id"], lo), pc.less(t["doc_id"], hi)
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        pages = docs.map_batches(
            pages_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        return page_metrics(pages)

    runner = PartitionedRunner(out_dir)
    summary = runner.run(
        partition_documents_path(sf_dir, n_partitions), build, resume=resume
    )
    summary["manifests"] = {
        pid: {"row_count": m.row_count, "fingerprint": m.fingerprint}
        for pid, m in runner.completed().items()
    }
    return summary


class _ForcedAbort(RuntimeError):
    """Raised by the drill hook to simulate a mid-run crash."""


def resumable_funnel(
    sf_dir: str,
    out_dir: str,
    explode_fn,
    rules: list[str] | None = None,
    n_partitions: int = 8,
    train_fraction: float = 0.875,
    resume: bool = True,
    abort_after_builds: int | None = None,
) -> dict:
    """Partition-addressed, resumable curation funnel — the corpus-wide
    stage checkpointed separately from the per-document stage, so a
    crashed 100 TB run resumes without redoing the global shuffle:

    - ``lines-<pid>`` (phase 1): the GLOBAL C4 first-occurrence winners
      (Gopher gate -> line explode -> dedup_lines_winners, one
      distributed hash-aligned job), written split by doc-id range.
      Winners are computed at most ONCE per process (lazy cache) and
      only if some lines-* partition is missing — a resume whose
      phase 1 is complete never re-runs the global stage.
    - ``docs-<pid>`` (phase 2): reads ONLY its own ``part=lines-<pid>``
      output, reassembles documents (rebuild_documents) and applies
      the deterministic hash split — per-partition, no cross-partition
      dependency, so lost partitions rebuild independently.

    The final (doc_id, text, split) set over all docs-* partitions
    equals ``curation_funnel`` exactly (asserted by tests and the
    driver oracle). ``abort_after_builds`` is the crash drill hook:
    raise after N build() calls in THIS run (the forced mid-run abort
    of the north_rule's resume criterion)."""
    import glob

    import pyarrow.parquet as pq_
    import ray.data as rd

    from textalyzer_ray.pipelines.curation import (
        curation_gate,
        dedup_lines_winners,
        hash_split,
        rebuild_documents,
        rebuild_table_fn,
    )
    from textalyzer_ray.sources.tables import read_table

    cache: dict = {}

    def winners():
        if "w" not in cache:
            docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
            kept = curation_gate(docs, rules=rules)
            lines = kept.map_batches(explode_fn, batch_format="pyarrow")
            w, _, _ = dedup_lines_winners(lines)
            cache["w"] = w.materialize()
        return cache["w"]

    # id-range plan (NOT row-range): phase filters are id-based, and
    # id ranges stay correct for sparse / replica-offset id spaces
    parts = partition_documents_by_id(sf_dir, n_partitions)
    plan: list[dict] = []
    for p in parts:
        plan.append(
            {
                "pid": f"lines-{p['pid']}",
                "inputs": p["inputs"],
                "row_range": p["row_range"],
                "phase": 1,
            }
        )
    for p in parts:
        plan.append(
            {
                "pid": f"docs-{p['pid']}",
                "inputs": [f"{out_dir}/part=lines-{p['pid']}"],
                "row_range": p["row_range"],
                "phase": 2,
            }
        )

    n_builds = [0]

    def build(part: dict):
        if (
            abort_after_builds is not None
            and n_builds[0] >= abort_after_builds
        ):
            raise _ForcedAbort(
                f"drill abort after {abort_after_builds} builds"
            )
        n_builds[0] += 1
        lo, hi = part["row_range"]
        if part["phase"] == 1:
            return winners().map_batches(
                lambda t: t.filter(
                    pc.and_(
                        pc.greater_equal(t["doc_id"], lo),
                        pc.less(t["doc_id"], hi),
                    )
                ),
                batch_format="pyarrow",
            )
        src_dir = part["inputs"][0]
        files = sorted(glob.glob(f"{src_dir}/*.parquet"))
        if not files:
            # a doc range can lose every doc to the gate: empty
            # partition, final schema
            import pyarrow as pa_

            return rd.from_arrow(
                pa_.schema(
                    [
                        pa_.field("doc_id", pa_.int64()),
                        pa_.field("text", pa_.string()),
                        pa_.field("split", pa_.string()),
                    ]
                ).empty_table()
            )
        # own files: strip the written schema metadata anyway (the
        # repo-wide unify_schemas hygiene, CLAUDE.md r3)
        schema = pq_.read_schema(files[0]).remove_metadata()
        # explicit columns: drop the hive-inferred "part" dir column so
        # no stray string rides the rebuild exchange
        kept = rd.read_parquet(files, schema=schema).select_columns(
            ["doc_id", "line_number", "content"]
        )
        n_rows = sum(pq_.read_metadata(f).num_rows for f in files)
        if n_rows <= 2_000_000:
            # measured-small path: a doc-range partition already
            # co-locates every line of a doc, so the reassembly needs
            # no exchange — one block, one polars pass (the
            # word_triangles/kmeans small-path pattern; partitions at
            # scale are SIZED to stay under this by the plan)
            import pyarrow as pa_

            out_schema = pa_.schema(
                [
                    pa_.field("doc_id", schema.field("doc_id").type),
                    pa_.field("text", pa_.string()),
                ]
            )
            rebuilt = kept.repartition(1).map_batches(
                rebuild_table_fn(
                    "doc_id", "line_number", "content", " ", out_schema
                ),
                batch_format="pyarrow",
                batch_size=None,
            ).sort("doc_id")
        else:
            rebuilt = rebuild_documents(
                kept, id_type=schema.field("doc_id").type
            )
        return hash_split(rebuilt, "doc_id", train_fraction)

    runner = PartitionedRunner(out_dir)
    summary = runner.run(plan, build, resume=resume)
    summary["manifests"] = {
        pid: {"row_count": m.row_count, "fingerprint": m.fingerprint}
        for pid, m in runner.completed().items()
    }
    return summary


def funnel_output(out_dir: str):
    """The final (doc_id, text, split) dataset of a completed
    resumable_funnel run (docs-* partitions only)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq_
    import ray.data as rd

    dirs = sorted(glob.glob(f"{out_dir}/part=docs-*"))
    files = [f for d in dirs for f in sorted(glob.glob(f"{d}/*.parquet"))]
    if not files:
        return rd.from_arrow(pa.schema([]).empty_table())
    schema = pq_.read_schema(files[0]).remove_metadata()
    # select the file columns explicitly: read_parquet hive-infers a
    # "part" column from the part=docs-* directory names otherwise
    return rd.read_parquet(files, schema=schema).select_columns(
        ["doc_id", "text", "split"]
    )
