"""bench.py contract smoke: one JSON line with the required fields
(the driver parses this output verbatim each round)."""

import json
import os
import subprocess
import sys


def test_bench_emits_single_json_line():
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        RAY_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    for field in ("metric", "value", "unit", "queries", "sf", "num_cpus"):
        assert field in data, field
    assert data["unit"] == "sec"
    assert data["value"] > 0
    assert set(data["queries"]) == {
        "flagship",
        "word_hist",
        "line_length",
        "single_dups",
        "minhash",
        "topk",
        "near_dedup",
        "funnel",
        "cosine_pairs",
        "linkgraph",
        "rep_signals",
        "classifier",
        "dup_ngram_cov",
        "lm_surprisal",
        "kmeans",
        "dup_span_removal",
        "bpe_doc_tokens",
        "bm25",
        "word_triangles",
        "zorder",
        "lsh_wave_dedup",
        "vector_probe",
        "setjoin",
        "events_gapfill",
        "editsim",
        "cdc",
        "srp",
        "table_profile",
        "transitions",
        "strat_split",
        "weighted_sample",
        "snm",
        "robots",
        "trending",
        "decayed",
        "deciles",
        "rrf",
        "outliers",
        "crawl_schedule",
        "url_templates",
        "range_splitters",
        "novelty",
        "coverage_select",
        "exact_substr",
        "editsim_long",
    }
    assert data["n_docs"] == 500
