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
