"""Benchmark harness (driver contract: prints ONE JSON line).

Headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1):

- flagship   : documents -> synthesized pages -> main-content extraction
               (actor pool) -> readability+quality metrics -> count
               (the north-star extraction+metrics pipeline)
- word_hist  : corpus word-frequency histogram (partial+final groupby)
- line_length: line-length histogram (partial histograms, tiny shuffle)
- single_dups: derived-line exact duplication groups (hash groupby)
- minhash    : MinHash/LSH near-dup candidate pairs + verification
- topk       : brute-force cosine top-10 over embeddings

``--scaling`` reruns the whole bench in two fresh processes
(RAY_GRAFT_CPUS=8 and 32), reporting both wall times and the scaling
efficiency (t8/t32)/(32/8) — the sandbox stand-in for the N vs 4N
cluster criterion (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from textalyzer_ray.pipelines.extraction import page_metrics
    from textalyzer_ray.pipelines.frequency import word_histogram
    from textalyzer_ray.pipelines.line_length import line_length_histogram
    from textalyzer_ray.pipelines.dedup import minhash_duplicate_pairs
    from textalyzer_ray.pipelines.similarity import brute_force_topk
    from textalyzer_ray.sources.tables import read_table
    from textalyzer_ray.sources.webgen import pages_batch
    import __ray_entry__ as contract

    docs_path = f"{sf_dir}/documents.parquet"
    # warm the OS page cache so we measure compute+shuffle, not first I/O
    pq.read_table(docs_path)
    meta = pq.read_table(docs_path, columns=["n_chars"])
    n_docs = meta.num_rows
    total_chars = int(np.sum(meta["n_chars"].to_numpy()))

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    def docs():
        return read_table(sf_dir, "documents")

    # flagship: pages -> extract -> metrics
    def flagship():
        pages = docs().map_batches(
            pages_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        return page_metrics(pages).count()

    n_out = timed("flagship", flagship)
    assert n_out == n_docs, (n_out, n_docs)
    extra["flagship_docs_per_sec"] = round(n_docs / timings["flagship"], 1)
    extra["flagship_mb_per_sec"] = round(
        total_chars / 1e6 / timings["flagship"], 2
    )

    timed(
        "word_hist",
        lambda: word_histogram(docs().select_columns(["text"])).take_all(),
    )
    timed(
        "line_length",
        lambda: line_length_histogram(docs().select_columns(["text"])).take_all(),
    )
    timed(
        "single_dups",
        lambda: contract._q_single_line_dups(sf_dir).count(),
    )
    timed(
        "minhash",
        lambda: minhash_duplicate_pairs(
            docs().select_columns(["doc_id", "text"]), bands=32
        ).count(),
    )

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.asarray(emb["embedding"].to_pylist()[:8], dtype=np.float64)

    def topk():
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        return brute_force_topk(ds, q, k=10).count()

    timed("topk", topk)

    ray.shutdown()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "extraction+metrics pipeline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        **extra,
    }


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (8 -> 32 cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "queries_8": r_lo["queries"],
        "queries_32": r_hi["queries"],
        "flagship_docs_per_sec_8": r_lo.get("flagship_docs_per_sec"),
        "flagship_docs_per_sec_32": r_hi.get("flagship_docs_per_sec"),
        "sf": r_hi["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
