"""Larger-than-suite soak (VERDICT r2 #6): one streaming pass each of
the curation funnel, the near-dedup chain, and the bigram-LM surprisal
scorer over a replicated sf0.1 corpus, with memory evidence.

Usage: python tools/soak.py [--funnel-repl N] [--dedup-repl N]
       [--lm-repl N] [--span-repl N] [--kmeans-repl N]
       [--bpe-vocab N] [--bpe-rounds N]

Two workloads, sized differently on purpose:

- FUNNEL (default 704x = 3.52M docs, ~1 GB of text): Gopher gate -> C4
  line dedup + doc rebuild -> hash split. Replicas carry DISTINCT ids
  but SHARED text, so the corpus-wide line dedup must kill every
  replica — the shuffles still move the full replicated line volume
  (the point of the soak), and the expected output equals the
  single-copy run's (an end-to-end correctness check at volume).
- NEAR-DEDUP (default 32x = 160k docs): minhash pairs -> connected
  components -> anti-join keep. Replicas get a replica tag token
  interleaved every 2 tokens, making cross-replica shingle sets
  DISJOINT: work scales linearly with input (real "more data"), not
  quadratically with replica count (which would measure candidate
  explosion, not throughput). Expected pairs = per-copy pairs x repl.

Memory evidence: a sampler thread reads ray.available_resources()
['object_store_memory'] at 4 Hz; peak usage = total - min(available).
Spill evidence: the session's raylet.out is scanned for "Spilled".
Prints ONE JSON line; numbers go to BASELINE.md.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import threading
import time


def _sampler(stop, samples):
    import ray

    while not stop.is_set():
        try:
            avail = ray.available_resources().get("object_store_memory", 0.0)
            samples.append(avail)
        except Exception:
            pass
        stop.wait(0.25)


def _spill_bytes() -> int:
    """Sum of spilled bytes reported by the current session's raylet."""
    import re

    total = 0
    for path in glob.glob("/tmp/ray/session_latest/logs/raylet.out"):
        try:
            with open(path, errors="ignore") as f:
                for line in f:
                    m = re.search(r"Spilled (\d+) MiB", line)
                    if m:
                        total = max(total, int(m.group(1)) * (1 << 20))
        except OSError:
            pass
    return total


def main() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    args = sys.argv[1:]

    def arg(name, default):
        return int(args[args.index(name) + 1]) if name in args else default

    funnel_repl = arg("--funnel-repl", 704)
    dedup_repl = arg("--dedup-repl", 32)

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from textalyzer_ray.pipelines.curation import curation_funnel
    from textalyzer_ray.pipelines.dedup import minhash_dedup
    from textalyzer_ray.sources.tables import cpu_heavy_min_blocks, read_table
    from __ray_entry__ import _FUNNEL_RULES, _chunk_lines_table

    # warm workers + shuffle operators outside timed regions (bench.py
    # protocol)
    rd.range(num_cpus * 8, override_num_blocks=num_cpus * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).repartition(4).count()

    meta = pq.read_table(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    n_docs = meta.num_rows
    chars_per_copy = int(np.sum(meta["n_chars"].to_numpy()))

    total_store = ray.cluster_resources().get("object_store_memory", 0.0)
    samples: list[float] = []
    stop = threading.Event()
    t = threading.Thread(target=_sampler, args=(stop, samples), daemon=True)
    t.start()

    out: dict = {
        "metric": "soak: funnel + near-dedup over replicated sf0.1",
        "unit": "sec",
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }

    # ---- funnel soak: shared text, distinct ids ----
    def replicate_shared(t: pa.Table) -> pa.Table:
        parts = []
        for r in range(funnel_repl):
            parts.append(
                t.set_column(
                    t.schema.get_field_index("doc_id"),
                    "doc_id",
                    pa.compute.add(t["doc_id"], r * 10_000_000),
                )
            )
        return pa.concat_tables(parts)

    t0 = time.monotonic()
    docs = read_table(
        sf_dir, "documents", columns=["doc_id", "text"],
        min_blocks=cpu_heavy_min_blocks(),
    )
    big = docs.map_batches(
        replicate_shared, batch_format="pyarrow", batch_size=64
    ).repartition(cpu_heavy_min_blocks())
    kept = curation_funnel(
        big, explode_fn=_chunk_lines_table, rules=_FUNNEL_RULES
    ).count()
    out["funnel_sec"] = round(time.monotonic() - t0, 3)
    out["funnel_docs"] = n_docs * funnel_repl
    out["funnel_text_mb"] = round(chars_per_copy * funnel_repl / 1e6, 1)
    out["funnel_kept"] = kept
    out["funnel_docs_per_sec"] = round(
        n_docs * funnel_repl / out["funnel_sec"], 1
    )
    # correctness at volume: line dedup must reduce the replicated corpus
    # to the single-copy keep set
    single = curation_funnel(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        explode_fn=_chunk_lines_table,
        rules=_FUNNEL_RULES,
    ).count()
    out["funnel_kept_single_copy"] = single
    assert kept == single, (kept, single)

    # ---- near-dedup soak: disjoint shingles per replica ----
    def replica_tag(r: int) -> str:
        # LETTERS ONLY: the reference tokenizer splits on non-alphabetic
        # chars, so a digit suffix ("soakrep0") would be stripped and
        # every replica would collapse onto the same tag token — turning
        # the intended disjoint-shingle corpus into one giant near-dup
        # cluster (measured: the first soak run did exactly that).
        s = []
        r += 1
        while r:
            s.append(chr(ord("a") + r % 26))
            r //= 26
        return "soakrep" + "".join(s)

    def replicate_tagged(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_ids, out_texts = [], []
        for r in range(dedup_repl):
            tag = replica_tag(r)
            for i, txt in zip(ids, texts):
                toks = (txt or "").split(" ")
                tagged = []
                for j in range(0, len(toks), 2):
                    tagged.extend(toks[j : j + 2])
                    tagged.append(tag)
                out_ids.append(i + r * 10_000_000)
                out_texts.append(" ".join(tagged))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "text": pa.array(out_texts, pa.string()),
            }
        )

    # Synthetic-corpus generation happens OUTSIDE the timed region (like
    # the page-cache warmup): minhash_dedup legitimately consumes its
    # input twice (featurize + the final keep filter), and without
    # materializing, each pass would re-run the replicate+repartition
    # lineage — timing corpus synthesis, not the chain.
    docs = read_table(
        sf_dir, "documents", columns=["doc_id", "text"],
        min_blocks=cpu_heavy_min_blocks(),
    )
    big = (
        docs.map_batches(replicate_tagged, batch_format="pyarrow", batch_size=64)
        .repartition(cpu_heavy_min_blocks())
        .materialize()
    )
    t0 = time.monotonic()
    kept_dedup = minhash_dedup(big, bands=32).count()
    out["dedup_sec"] = round(time.monotonic() - t0, 3)
    out["dedup_docs"] = n_docs * dedup_repl
    out["dedup_kept"] = kept_dedup
    out["dedup_docs_per_sec"] = round(n_docs * dedup_repl / out["dedup_sec"], 1)

    # ---- exact set-similarity join soak (r4 addition) ----
    # Same disjoint-shingle tagged corpus (`big`), plus a planted
    # near-copy of every 16th doc (drop first token, prepend a marker —
    # the _augmented_docs edit applied AFTER tagging, so each copy
    # shares its source's replica tag). Replicas are isomorphic under
    # tag substitution, so the recall-1 join must return EXACTLY
    # repl x the single-replica pair count, every pair intra-replica.
    from textalyzer_ray.pipelines.setjoin import set_similarity_join

    def plant_copies(tt: pa.Table) -> pa.Table:
        ids = tt["doc_id"].to_numpy(zero_copy_only=False)
        keep = (ids % 10_000_000) % 16 == 0
        src = tt.filter(pa.array(keep))
        texts = [
            "xyzzy " + (x.split(" ", 1)[1] if " " in x else x)
            for x in src["text"].to_pylist()
        ]
        copies = pa.table(
            {
                "doc_id": pa.compute.add(src["doc_id"], 500_000_000),
                "text": pa.array(texts, pa.string()),
            }
        )
        return pa.concat_tables([tt, copies])

    # r5: the leg runs at its own replication (--sj-repl, default 8 =
    # 40k docs) — candidate volume on this self-similar corpus grows
    # superlinearly with corpus size (inherent to prefix-filter joins),
    # and the 32x point is recorded separately in BASELINE.md (r5
    # verify rework: disk-full crash -> 420 s zero-spill).
    sj_repl = arg("--sj-repl", 8)

    def keep_sj_replicas(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % 500_000_000) // 10_000_000 < sj_repl))

    base_sj = (
        big
        if sj_repl >= dedup_repl
        else big.map_batches(
            keep_sj_replicas, batch_format="pyarrow"
        ).materialize()
    )
    big_sj = base_sj.map_batches(
        plant_copies, batch_format="pyarrow"
    ).materialize()
    t0 = time.monotonic()
    sj_pairs = set_similarity_join(
        big_sj, threshold=0.7, df_broadcast_max=0
    ).materialize()
    out["setjoin_sec"] = round(time.monotonic() - t0, 3)
    out["setjoin_docs"] = big_sj.count()
    out["setjoin_pairs"] = sj_pairs.count()
    out["setjoin_docs_per_sec"] = round(
        out["setjoin_docs"] / out["setjoin_sec"], 1
    )

    def pair_replicas(tt: pa.Table) -> pa.Table:
        ra = (tt["id_a"].to_numpy(zero_copy_only=False) % 500_000_000) // 10_000_000
        rb = (tt["id_b"].to_numpy(zero_copy_only=False) % 500_000_000) // 10_000_000
        return pa.table({"ra": ra, "rb": rb})

    reps = pa.concat_tables(
        list(
            sj_pairs.map_batches(
                pair_replicas, batch_format="pyarrow"
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        )
    )
    ra = reps["ra"].to_numpy()
    rb = reps["rb"].to_numpy()
    assert (ra == rb).all(), "cross-replica setjoin pair leaked"
    per_rep = np.bincount(ra, minlength=sj_repl)[:sj_repl]
    assert (per_rep == per_rep[0]).all() and per_rep[0] > 0, per_rep[:8]
    out["setjoin_pairs_per_replica"] = int(per_rep[0])

    # ---- LM-surprisal soak (r3 addition): distinct ids, shared text ----
    # Train on the doc_id % 10 slice of the REPLICATED corpus (the count
    # shuffle sees the full replicated token volume), then the
    # zero-shuffle scoring pass over everything. Replication multiplies
    # every model count by lm_repl and V is unchanged, so per-doc
    # n_bigrams must equal the single-copy run's exactly.
    lm_repl = arg("--lm-repl", 32)
    from textalyzer_ray.pipelines.lm import lm_surprisal_scores

    def lm_slice(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 10 == 0))

    def replicate_shared_lm(t: pa.Table) -> pa.Table:
        parts = []
        for r in range(lm_repl):
            parts.append(
                t.set_column(
                    t.schema.get_field_index("doc_id"),
                    "doc_id",
                    pa.compute.add(t["doc_id"], r * 10_000_000),
                )
            )
        return pa.concat_tables(parts)

    docs = read_table(
        sf_dir, "documents", columns=["doc_id", "text"],
        min_blocks=cpu_heavy_min_blocks(),
    )
    big_lm = (
        docs.map_batches(
            replicate_shared_lm, batch_format="pyarrow", batch_size=64
        )
        .repartition(cpu_heavy_min_blocks())
        .materialize()  # consumed twice: model slice + scoring pass
    )
    t0 = time.monotonic()
    scored = lm_surprisal_scores(
        big_lm, big_lm.map_batches(lm_slice, batch_format="pyarrow")
    )
    n_scored = scored.count()
    out["lm_sec"] = round(time.monotonic() - t0, 3)
    out["lm_docs"] = n_docs * lm_repl
    assert n_scored == out["lm_docs"], (n_scored, out["lm_docs"])
    out["lm_docs_per_sec"] = round(out["lm_docs"] / out["lm_sec"], 1)

    # ---- dup-span-removal soak (late-r3): shared text, distinct ids ----
    # Every 5-gram of every replicated doc is shared across replicas
    # (df == span_repl >= 2), so the removal must cover EVERY position
    # of every doc with >= 5 tokens: kept == n_tokens for short docs, 0
    # otherwise — an exact per-doc invariant at volume. The gram
    # doc-frequency shuffle and the rebuild pass both see the full
    # replicated token volume.
    span_repl = arg("--span-repl", 32)
    from textalyzer_ray.pipelines.curation import dup_span_removal

    docs = read_table(
        sf_dir, "documents", columns=["doc_id", "text"],
        min_blocks=cpu_heavy_min_blocks(),
    )
    def replicate_span(tt: pa.Table) -> pa.Table:
        return pa.concat_tables(
            tt.set_column(
                tt.schema.get_field_index("doc_id"),
                "doc_id",
                pa.compute.add(tt["doc_id"], r * 10_000_000),
            )
            for r in range(span_repl)
        )

    big_span = (
        docs.map_batches(replicate_span, batch_format="pyarrow", batch_size=64)
        .repartition(cpu_heavy_min_blocks())
        .materialize()  # consumed twice: gram df pass + rebuild pass
    )
    t0 = time.monotonic()
    span = dup_span_removal(big_span, n=5)

    def span_check(tt: pa.Table) -> pa.Table:
        nt = tt["n_tokens"].to_numpy(zero_copy_only=False)
        rm = tt["removed_tokens"].to_numpy(zero_copy_only=False)
        want = np.where(nt >= 5, nt, 0)
        return pa.table({"bad": [int((rm != want).sum())], "rows": [tt.num_rows]})

    chk = pa.concat_tables(
        span.map_batches(span_check, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    out["span_sec"] = round(time.monotonic() - t0, 3)
    out["span_docs"] = n_docs * span_repl
    out["span_docs_per_sec"] = round(out["span_docs"] / out["span_sec"], 1)
    n_rows = int(pa.compute.sum(chk["rows"]).as_py())
    n_bad = int(pa.compute.sum(chk["bad"]).as_py())
    assert n_rows == out["span_docs"], n_rows
    if span_repl >= 2:  # full coverage only when every gram has df >= 2
        assert n_bad == 0, n_bad

    # ---- kmeans soak (late-r3): replicated embeddings, distinct ids ----
    # Identical vectors under distinct ids: assignments replicate, so
    # every cluster size must be exactly kmeans_repl x the single-copy
    # size (margins measured >= 6.7e-6 dwarf the extra summation error).
    kmeans_repl = arg("--kmeans-repl", 64)
    from textalyzer_ray.pipelines.similarity import kmeans_assign

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def replicate_emb(tt: pa.Table) -> pa.Table:
        return pa.concat_tables(
            tt.set_column(
                tt.schema.get_field_index("vec_id"),
                "vec_id",
                pa.compute.add(tt["vec_id"], r * 10_000_000),
            )
            for r in range(kmeans_repl)
        )

    big_emb = (
        emb.map_batches(replicate_emb, batch_format="pyarrow", batch_size=256)
        .repartition(num_cpus)
        .materialize()  # consumed n_iter + 2 times
    )
    n_vecs = emb.count()
    t0 = time.monotonic()
    sizes_big = dict(
        (r["cluster"], r["count()"])
        # force the per-round path — the soak measures the distributed
        # trainer's scale shape, not the one-task small path
        for r in kmeans_assign(big_emb, k=8, n_iter=4, small_threshold=0)
        .groupby("cluster")
        .count()
        .take_all()
    )
    out["kmeans_sec"] = round(time.monotonic() - t0, 3)
    out["kmeans_vecs"] = n_vecs * kmeans_repl
    out["kmeans_vecs_per_sec"] = round(out["kmeans_vecs"] / out["kmeans_sec"], 1)
    sizes_one = dict(
        (r["cluster"], r["count()"])
        for r in kmeans_assign(emb, k=8, n_iter=4)
        .groupby("cluster")
        .count()
        .take_all()
    )
    assert sizes_big == {c: n * kmeans_repl for c, n in sizes_one.items()}, (
        sizes_big,
        sizes_one,
    )

    # ---- BPE-train soak (late-r3): large synthetic vocabulary ----
    # The trainer's scale axis is DISTINCT WORDS (it never sees the
    # corpus), so the soak generates a big vocabulary from pure id
    # arithmetic (base-26 words, id-arithmetic counts) and checks the
    # distributed merges against the sequential reference in-process.
    bpe_vocab = arg("--bpe-vocab", 200_000)
    bpe_rounds = arg("--bpe-rounds", 4)
    from textalyzer_ray.pipelines.bpe import bpe_train

    def word_of(i: int) -> str:
        s = []
        i += 26  # min 2 chars
        while i:
            s.append(chr(ord("a") + i % 26))
            i //= 26
        return "".join(s)

    vocab_words = [word_of(i) for i in range(bpe_vocab)]
    vocab_counts = [(i * 7) % 101 + 1 for i in range(bpe_vocab)]
    vds = rd.from_arrow(
        pa.table(
            {
                "word": pa.array(vocab_words, pa.string()),
                "count": pa.array(vocab_counts, pa.int64()),
            }
        )
    ).repartition(num_cpus).materialize()
    t0 = time.monotonic()
    # force the per-round Dataset path — the soak's point is the
    # distributed trainer's scale shape, not the one-task small path
    got = bpe_train(vds, n_merges=bpe_rounds, small_threshold=0)
    out["bpe_sec"] = round(time.monotonic() - t0, 3)
    out["bpe_vocab"] = bpe_vocab
    out["bpe_words_per_sec"] = round(
        bpe_vocab * bpe_rounds / out["bpe_sec"], 1
    )
    # sequential reference over the same vocabulary
    seqs = {w: list(w) for w in vocab_words}
    wc = dict(zip(vocab_words, vocab_counts))
    want = []
    for _ in range(bpe_rounds):
        stats: dict = {}
        for w, c in wc.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] = stats.get((s[i], s[i + 1]), 0) + c
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((a, b, cnt))
        for w in seqs:
            s, o, i = seqs[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    o.append(a + b)
                    i += 2
                else:
                    o.append(s[i])
                    i += 1
            seqs[w] = o
    got_rows = list(
        zip(
            got["left"].to_pylist(),
            got["right"].to_pylist(),
            got["pair_count"].to_pylist(),
        )
    )
    assert got_rows == want, (got_rows, want)

    # ---- incremental LSH-index soak (r3 continuation) ----
    # Reuses the tagged replicated corpus: replicas have disjoint
    # shingle sets and id-disjoint increasing ranges, so splitting the
    # replica axis into waves gives id-ordered waves (the index's
    # global-semantics precondition) and the kept count must equal the
    # single-replica kept count x repl exactly.
    from textalyzer_ray.state.lsh_index import lsh_index_dedup

    lsh_waves = arg("--lsh-waves", 4)
    per_wave = max(1, dedup_repl // lsh_waves)

    def replica_slice(lo: int, hi: int):
        def f(tt: pa.Table) -> pa.Table:
            r = tt["doc_id"].to_numpy(zero_copy_only=False) // 10_000_000
            return tt.filter(pa.array((r >= lo) & (r < hi)))

        return f

    waves = [
        big.map_batches(
            replica_slice(w * per_wave, (w + 1) * per_wave if w < lsh_waves - 1 else dedup_repl),
            batch_format="pyarrow",
        )
        for w in range(lsh_waves)
    ]
    t0 = time.monotonic()
    kept_lsh = lsh_index_dedup(waves, bands=32).count()
    out["lsh_sec"] = round(time.monotonic() - t0, 3)
    out["lsh_docs"] = n_docs * dedup_repl
    out["lsh_waves"] = lsh_waves
    out["lsh_kept"] = kept_lsh
    out["lsh_docs_per_sec"] = round(n_docs * dedup_repl / out["lsh_sec"], 1)
    # single-replica reference (replica 0; kept structure is
    # tag-invariant by symmetry)
    kept_one = lsh_index_dedup(
        [big.map_batches(replica_slice(0, 1), batch_format="pyarrow")],
        bands=32,
    ).count()
    assert kept_lsh == kept_one * dedup_repl, (kept_lsh, kept_one, dedup_repl)

    # ---- crash-resume drill: LSH index service (r4 judge item #2) ----
    # Operational recovery story at soak volume: checkpoint after wave
    # k, HARD-KILL every shard actor (simulated node loss mid-run),
    # restore fresh actors from the per-shard parquet manifests, finish
    # the remaining waves, and assert the total kept count equals the
    # uninterrupted run's (kept_lsh above).
    import shutil
    import tempfile

    from textalyzer_ray.state.lsh_index import LshIndex

    def kept_count(res) -> int:
        return res.map_batches(
            lambda t: t.filter(pa.compute.invert(t["dropped"])),
            batch_format="pyarrow",
        ).count()

    lsh_ckpt = os.path.join(tempfile.gettempdir(), "soak_lsh_ckpt")
    shutil.rmtree(lsh_ckpt, ignore_errors=True)
    crash_after = max(1, lsh_waves // 2)
    wave_mats = [w.materialize() for w in waves]
    t0 = time.monotonic()
    idx = LshIndex(bands=32)
    kept_resumed = 0
    for w in range(crash_after):
        idx.add(wave_mats[w])
        kept_resumed += kept_count(idx.query_earlier(wave_mats[w]))
    t_ck = time.monotonic()
    idx.save(lsh_ckpt)
    out["lsh_ckpt_save_sec"] = round(time.monotonic() - t_ck, 3)
    for a in idx.band_shards + idx.doc_shards:
        ray.kill(a)  # node loss: no graceful shutdown, state is gone
    t_ld = time.monotonic()
    idx2 = LshIndex.load(lsh_ckpt)
    out["lsh_ckpt_load_sec"] = round(time.monotonic() - t_ld, 3)
    for w in range(crash_after, lsh_waves):
        idx2.add(wave_mats[w])
        kept_resumed += kept_count(idx2.query_earlier(wave_mats[w]))
    idx2.shutdown()
    out["lsh_resume_sec"] = round(time.monotonic() - t0, 3)
    out["lsh_resume_crash_after_wave"] = crash_after
    out["lsh_resume_kept"] = kept_resumed
    assert kept_resumed == kept_lsh, (kept_resumed, kept_lsh)
    shutil.rmtree(lsh_ckpt, ignore_errors=True)

    # ---- crash-resume drill: vector index service ----
    # Same story for the IVF index: fit once on wave 0 (deterministic
    # centroids), index waves, checkpoint, kill, restore, finish; the
    # exact top-k answer (full probe) must equal the uninterrupted
    # run's row-for-row.
    from textalyzer_ray.state.vector_index import VectorIndex

    vi_waves_n = 4
    vi_per = max(1, kmeans_repl // vi_waves_n)

    def vi_slice(lo: int, hi: int):
        def f(tt: pa.Table) -> pa.Table:
            r = tt["vec_id"].to_numpy(zero_copy_only=False) // 10_000_000
            return tt.filter(pa.array((r >= lo) & (r < hi)))

        return f

    vi_waves = [
        big_emb.map_batches(
            vi_slice(
                w * vi_per,
                (w + 1) * vi_per if w < vi_waves_n - 1 else kmeans_repl,
            ),
            batch_format="pyarrow",
        ).materialize()
        for w in range(vi_waves_n)
    ]
    queries = emb.materialize()

    def topk_rows(res) -> list:
        return sorted(
            (r["qid"], r["rank"], r["vec_id"]) for r in res.take_all()
        )

    t0 = time.monotonic()
    vi = VectorIndex(n_centroids=16, n_shards=4)
    vi.fit(vi_waves[0])
    for w in vi_waves:
        vi.add(w)
    want_topk = topk_rows(vi.query_topk(queries, k=5))
    vi_vectors = vi.stats()["vectors"]
    vi.shutdown()
    out["vi_full_sec"] = round(time.monotonic() - t0, 3)
    out["vi_vectors"] = vi_vectors

    vi_ckpt = os.path.join(tempfile.gettempdir(), "soak_vi_ckpt")
    shutil.rmtree(vi_ckpt, ignore_errors=True)
    t0 = time.monotonic()
    vi = VectorIndex(n_centroids=16, n_shards=4)
    vi.fit(vi_waves[0])
    for w in vi_waves[:2]:
        vi.add(w)
    t_ck = time.monotonic()
    vi.save(vi_ckpt)
    out["vi_ckpt_save_sec"] = round(time.monotonic() - t_ck, 3)
    for a in vi.shards:
        ray.kill(a)
    t_ld = time.monotonic()
    vi2 = VectorIndex.load(vi_ckpt)
    out["vi_ckpt_load_sec"] = round(time.monotonic() - t_ld, 3)
    for w in vi_waves[2:]:
        vi2.add(w)
    got_topk = topk_rows(vi2.query_topk(queries, k=5))
    assert vi2.stats()["vectors"] == vi_vectors
    vi2.shutdown()
    out["vi_resume_sec"] = round(time.monotonic() - t0, 3)
    assert got_topk == want_topk, (got_topk[:5], want_topk[:5])
    shutil.rmtree(vi_ckpt, ignore_errors=True)

    # ---- resumable-funnel crash drill at volume (r4 judge item #6) ----
    # The tagged dedup corpus (disjoint line contents per replica, so
    # the kept volume scales with input) is written to a /tmp sf-dir;
    # resumable_funnel runs it partition-addressed. A forced abort
    # lands after phase 1 + a quarter of phase 2; the resume run must
    # skip the global winners stage and every finished partition, and
    # the final kept set must equal the one-shot curation_funnel's
    # (count + id/byte-sum aggregates compared at volume; exact row
    # equality is the sf0.01 gate's job).
    from textalyzer_ray.pipelines.resumable import (
        _ForcedAbort,
        funnel_output,
        resumable_funnel,
    )

    rf_sf = os.path.join(tempfile.gettempdir(), "soak_rfunnel_sf")
    shutil.rmtree(rf_sf, ignore_errors=True)
    os.makedirs(rf_sf)
    pq.write_table(
        pa.concat_tables(
            ray.get(big.to_arrow_refs())
        ).combine_chunks(),
        os.path.join(rf_sf, "documents.parquet"),
    )

    def funnel_stats(ds) -> dict:
        def proj(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_text": pa.compute.binary_length(
                        t["text"].cast(pa.binary())
                    ).cast(pa.int64()),
                    "is_train": pa.compute.cast(
                        pa.compute.equal(t["split"], "train"), pa.int64()
                    ),
                }
            )

        p = ds.map_batches(proj, batch_format="pyarrow").materialize()
        return {
            "n": p.count(),
            "sum_id": p.sum("doc_id"),
            "sum_bytes": p.sum("n_text"),
            "n_train": p.sum("is_train"),
        }

    want_stats = funnel_stats(
        curation_funnel(
            read_table(rf_sf, "documents", columns=["doc_id", "text"]),
            explode_fn=_chunk_lines_table,
            rules=_FUNNEL_RULES,
        )
    )
    rf_parts = 8
    rf_full = os.path.join(tempfile.gettempdir(), "soak_rfunnel_full")
    shutil.rmtree(rf_full, ignore_errors=True)
    t0 = time.monotonic()
    resumable_funnel(
        rf_sf, rf_full, _chunk_lines_table, rules=_FUNNEL_RULES,
        n_partitions=rf_parts,
    )
    out["rfunnel_full_sec"] = round(time.monotonic() - t0, 3)
    assert funnel_stats(funnel_output(rf_full)) == want_stats
    rf_crash = os.path.join(tempfile.gettempdir(), "soak_rfunnel_crash")
    shutil.rmtree(rf_crash, ignore_errors=True)
    abort_at = rf_parts + max(1, rf_parts // 4)
    try:
        resumable_funnel(
            rf_sf, rf_crash, _chunk_lines_table, rules=_FUNNEL_RULES,
            n_partitions=rf_parts, abort_after_builds=abort_at,
        )
        raise AssertionError("drill abort did not fire")
    except _ForcedAbort:
        pass
    t0 = time.monotonic()
    s_res = resumable_funnel(
        rf_sf, rf_crash, _chunk_lines_table, rules=_FUNNEL_RULES,
        n_partitions=rf_parts,
    )
    out["rfunnel_resume_sec"] = round(time.monotonic() - t0, 3)
    out["rfunnel_resume_skipped"] = len(s_res["skipped"])
    out["rfunnel_resume_ran"] = len(s_res["ran"])
    assert len(s_res["skipped"]) == abort_at, s_res
    assert funnel_stats(funnel_output(rf_crash)) == want_stats
    assert out["rfunnel_resume_sec"] < out["rfunnel_full_sec"], out
    out["rfunnel_docs"] = n_docs * dedup_repl
    shutil.rmtree(rf_full, ignore_errors=True)
    shutil.rmtree(rf_crash, ignore_errors=True)
    shutil.rmtree(rf_sf, ignore_errors=True)

    # ---- streaming-window soak (r3 continuation) ----
    # Events replicated with id offsets (hash waves interleave event
    # time, forcing heavy late-drop traffic through the watermark
    # path); invariants: nothing lost (sum n == total events) and the
    # result is shard-count-invariant.
    from textalyzer_ray.state.stream_window import stream_windows

    sw_repl = arg("--sw-repl", 32)
    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "event_type"])
    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows

    def replicate_events(tt: pa.Table) -> pa.Table:
        parts = []
        for r in range(sw_repl):
            parts.append(
                tt.set_column(
                    tt.schema.get_field_index("event_id"),
                    "event_id",
                    pa.compute.add(tt["event_id"], r * 100_000_000),
                )
            )
        return pa.concat_tables(parts)

    big_ev = (
        ev.map_batches(replicate_events, batch_format="pyarrow")
        .repartition(num_cpus)
        .materialize()
    )
    t0 = time.monotonic()
    sw = stream_windows(big_ev, n_waves=4, n_shards=2).take_all()
    out["sw_sec"] = round(time.monotonic() - t0, 3)
    out["sw_events"] = n_events * sw_repl
    out["sw_events_per_sec"] = round(n_events * sw_repl / out["sw_sec"], 1)
    assert sum(r["n"] for r in sw) == n_events * sw_repl
    out["sw_late_events"] = sum(r["n"] for r in sw if r["window_id"] == -1)
    sw4 = stream_windows(big_ev, n_waves=4, n_shards=4).take_all()
    assert sw4 == sw  # shard-count invariance

    # ---- streaming band-join soak (r3 continuation) ----
    # Replicas offset BOTH ids and users (disjoint user spaces), so the
    # pair count must be exactly per-copy pairs x repl while the
    # watermark keeps peak state band-sized, not stream-sized.
    from textalyzer_ray.state.stream_join import StreamBandJoin, stream_range_join

    def replicate_events_users(tt: pa.Table) -> pa.Table:
        parts = []
        for r in range(sw_repl):
            c = tt.set_column(
                tt.schema.get_field_index("event_id"),
                "event_id",
                pa.compute.add(tt["event_id"], r * 100_000_000),
            )
            c = c.set_column(
                c.schema.get_field_index("user_id"),
                "user_id",
                pa.compute.add(c["user_id"], r * 10_000_000),
            )
            parts.append(c)
        return pa.concat_tables(parts)

    evj = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )
    big_evj = (
        evj.map_batches(replicate_events_users, batch_format="pyarrow")
        .repartition(num_cpus)
        .materialize()
    )
    # check_monotonic=False: the replicated stream violates the GLOBAL
    # nondecreasing-ts precondition (each id-offset replica restarts
    # the ts range), but replicas use DISJOINT user keys and each
    # replica is a ~1e5-id sliver at the head of its 1e8-id block, so
    # wave boundaries (span/8 apart) fall in the empty gaps and no
    # sliver straddles a wave — every key's substream is wholly inside
    # one wave and eviction can never drop a partner. The exact
    # pair-count invariant below (pairs == single x repl) is the proof.
    t0 = time.monotonic()
    n_pairs = stream_range_join(
        big_evj, n_waves=8, n_shards=4, check_monotonic=False
    ).count()
    out["sj_sec"] = round(time.monotonic() - t0, 3)
    out["sj_events"] = n_events * sw_repl
    out["sj_pairs"] = n_pairs
    out["sj_events_per_sec"] = round(n_events * sw_repl / out["sj_sec"], 1)
    single_pairs = stream_range_join(evj, n_waves=8, n_shards=4).count()
    assert n_pairs == single_pairs * sw_repl, (n_pairs, single_pairs)
    # peak-state evidence: run one instrumented pass and record the max
    # buffered rows across shards (must be far below the stream size)
    jn = StreamBandJoin(n_shards=4, check_monotonic=False)  # same rationale
    base_ids = big_evj.select_columns(["event_id"])
    lo_id, hi_id = int(base_ids.min("event_id")), int(base_ids.max("event_id"))
    per = -(-(hi_id - lo_id + 1) // 8)
    for w in range(8):
        lo, hi = lo_id + w * per, lo_id + (w + 1) * per
        wave = big_evj.map_batches(
            lambda t, lo=lo, hi=hi: t.filter(
                pa.compute.and_(
                    pa.compute.greater_equal(t["event_id"], lo),
                    pa.compute.less(t["event_id"], hi),
                )
            ),
            batch_format="pyarrow",
        ).materialize()
        if wave.count() == 0:
            continue
        jn.process_wave(wave, "purchase", "view").count()
        wm = int(
            wave.select_columns(["ts"]).map_batches(
                lambda t: pa.table(
                    {"m": pa.array([int(pa.compute.max(t["ts"].cast(pa.int64())).as_py())], pa.int64())}
                )
                if t.num_rows
                else pa.table({"m": pa.array([], pa.int64())}),
                batch_format="pyarrow",
            ).max("m")
        )
        jn.advance_watermark(wm)
    out["sj_peak_state_rows"] = jn.stats()["peak_rows"]
    jn.shutdown()
    assert out["sj_peak_state_rows"] < (n_events * sw_repl) // 2

    # ---- robots-frontier soak (r4 late session) ----
    # Candidate URLs synthesized by pure arithmetic (the webgen target
    # shape) with a 4x duplication factor, so the key-aligned distinct
    # exchange does real collapsing work; the invariant is the exact
    # closed-form allowed count re-derived vectorized on the driver
    # from the same longest-prefix rule.
    from textalyzer_ray.pipelines.robots import (
        frontier_robots_filter,
        robots_rules_for_sites,
    )

    rb_n = arg("--robots-urls", 2_000_000)
    rb_dup = 4

    def synth_urls(tt: pa.Table) -> pa.Table:
        import numpy as np
        import polars as pl_

        ids = tt["id"].to_numpy(zero_copy_only=False) % rb_n
        df = pl_.DataFrame({"t": ids})
        return (
            df.select(
                (
                    pl_.lit("https://site")
                    + (pl_.col("t") % 50).cast(pl_.String)
                    + pl_.lit(".example/page/")
                    + pl_.col("t").cast(pl_.String)
                ).alias("url")
            )
            .to_arrow()
            .cast(pa.schema([pa.field("url", pa.string())]))
        )

    cand = (
        rd.range(rb_n * rb_dup, override_num_blocks=num_cpus * 4)
        .map_batches(synth_urls, batch_format="pyarrow")
        .materialize()
    )
    t0 = time.monotonic()
    verdicts = frontier_robots_filter(
        cand, robots_rules_for_sites(50)
    ).materialize()
    n_verdicts = verdicts.count()
    n_allowed = verdicts.map_batches(
        lambda t: pa.table(
            {"s": pa.array([int(pa.compute.sum(t["allowed"]).as_py() or 0)], pa.int64())}
        ),
        batch_format="pyarrow",
    ).sum("s")
    out["robots_sec"] = round(time.monotonic() - t0, 3)
    out["robots_input_urls"] = rb_n * rb_dup
    out["robots_distinct"] = n_verdicts
    out["robots_urls_per_sec"] = round(rb_n * rb_dup / out["robots_sec"], 1)
    assert n_verdicts == rb_n, (n_verdicts, rb_n)
    import numpy as np

    tvals = np.arange(rb_n, dtype=np.int64)
    h = tvals % 50
    tstr = tvals.astype("U")
    starts_1 = np.char.startswith(tstr, "1")
    starts_12 = np.char.startswith(tstr, "12")
    # longest match wins: /page/12 > /page/1 > /page/
    allow = np.where(
        starts_12, h % 2 == 0, np.where(starts_1, h % 3 == 0, h % 3 != 0)
    )
    expected_allowed = int(allow.sum())
    assert n_allowed == expected_allowed, (n_allowed, expected_allowed)
    out["robots_allowed"] = int(n_allowed)

    # ---- BFS hop-distance soak (r4 late session) ----
    # Functional graph by id arithmetic (3 affine out-edges per node);
    # the pipeline takes the DISTRIBUTED round loop (edges > the
    # measured-size threshold) and the invariant is exact (node, dist)
    # equality vs a driver numpy BFS over the same arithmetic.
    from textalyzer_ray.pipelines.graph import hop_distance

    bfs_n = arg("--bfs-nodes", 4_000_000)
    bfs_rounds = 8

    def synth_edges(tt: pa.Table) -> pa.Table:
        ids = tt["id"].to_numpy(zero_copy_only=False)
        srcs = np.concatenate([ids, ids, ids])
        dsts = np.concatenate(
            [
                (ids * 2 + 1) % bfs_n,
                (ids * 3 + 7) % bfs_n,
                (ids * 5 + 11) % bfs_n,
            ]
        )
        return pa.table(
            {
                "src": pa.array(srcs, pa.int64()),
                "dst": pa.array(dsts, pa.int64()),
            }
        )

    bfs_edges = (
        rd.range(bfs_n, override_num_blocks=num_cpus * 2)
        .map_batches(synth_edges, batch_format="pyarrow")
        .materialize()
    )
    bfs_seeds = rd.from_arrow(
        pa.table({"node": pa.array([0, 1], pa.int64())})
    )
    t0 = time.monotonic()
    got_bfs = hop_distance(
        bfs_edges, bfs_seeds, n_rounds=bfs_rounds, small_threshold=2_000_000
    ).take_all()
    out["bfs_sec"] = round(time.monotonic() - t0, 3)
    out["bfs_edges"] = bfs_n * 3
    out["bfs_reached"] = len(got_bfs)
    out["bfs_edges_per_sec"] = round(bfs_n * 3 / out["bfs_sec"], 1)
    # driver numpy reference BFS (arithmetic graph, no edge table)
    dist_ref = {0: 0, 1: 0}
    frontier = np.array([0, 1], dtype=np.int64)
    for k in range(1, bfs_rounds + 1):
        neigh = np.unique(
            np.concatenate(
                [
                    (frontier * 2 + 1) % bfs_n,
                    (frontier * 3 + 7) % bfs_n,
                    (frontier * 5 + 11) % bfs_n,
                ]
            )
        )
        new = np.array(
            [v for v in neigh.tolist() if v not in dist_ref], dtype=np.int64
        )
        for v in new.tolist():
            dist_ref[v] = k
        frontier = new
    assert {r["node"]: r["dist"] for r in got_bfs} == dist_ref, (
        len(got_bfs),
        len(dist_ref),
    )

    # ---- decayed-counts soak (r4 late session) ----
    # Replicas offset user ids only (ts untouched, so t_ref and every
    # age bucket are unchanged); invariant: each replica user's
    # (n_events, score_units) equals the single-copy run exactly.
    from textalyzer_ray.pipelines.analytics import decayed_counts

    dc_repl = sw_repl
    ev_dc = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def replicate_users_only(tt: pa.Table) -> pa.Table:
        parts = []
        for r in range(dc_repl):
            parts.append(
                tt.set_column(
                    tt.schema.get_field_index("user_id"),
                    "user_id",
                    pa.compute.add(tt["user_id"], r * 10_000_000),
                )
            )
        return pa.concat_tables(parts)

    big_dc = (
        ev_dc.map_batches(replicate_users_only, batch_format="pyarrow")
        .repartition(num_cpus)
        .materialize()
    )
    t0 = time.monotonic()
    dc = decayed_counts(big_dc).take_all()
    out["decay_sec"] = round(time.monotonic() - t0, 3)
    out["decay_events"] = n_events * dc_repl
    out["decay_events_per_sec"] = round(
        n_events * dc_repl / out["decay_sec"], 1
    )
    single_dc = {
        r["user_id"]: (r["n_events"], r["score_units"])
        for r in decayed_counts(ev_dc).take_all()
    }
    got_dc = {
        r["user_id"]: (r["n_events"], r["score_units"]) for r in dc
    }
    assert len(got_dc) == len(single_dc) * dc_repl
    for uid, v in got_dc.items():
        assert v == single_dc[uid % 10_000_000], (uid, v)

    # ---- SNM soak leg with driver-RSS note (r5 judge item #5) ----
    # Shared-text replicas with distinct ids: identical texts sort
    # adjacently under (klen, id), so the windowed verify sees dense
    # true duplicates while candidate volume stays EXACTLY n x (w-1)
    # (SNM's skew-proof bound). The leg evidences the new measured
    # carry guard at volume: driver RSS around the take_all'd carry
    # metadata plus wall time.
    import resource

    from textalyzer_ray.pipelines.snm import sorted_neighborhood_pairs

    snm_repl = arg("--snm-repl", 16)

    def replicate_shared_snm(t: pa.Table) -> pa.Table:
        parts = []
        for r in range(snm_repl):
            parts.append(
                t.set_column(
                    t.schema.get_field_index("doc_id"),
                    "doc_id",
                    pa.compute.add(t["doc_id"], r * 10_000_000),
                )
            )
        return pa.concat_tables(parts)

    big_snm = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(replicate_shared_snm, batch_format="pyarrow", batch_size=64)
        .repartition(cpu_heavy_min_blocks())
        .materialize()
    )
    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.monotonic()
    snm_pairs = sorted_neighborhood_pairs(
        big_snm, window=8, threshold=0.9
    ).materialize()
    out["snm_sec"] = round(time.monotonic() - t0, 3)
    out["snm_docs"] = n_docs * snm_repl
    out["snm_pairs"] = snm_pairs.count()
    out["snm_docs_per_sec"] = round(out["snm_docs"] / out["snm_sec"], 1)
    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    out["snm_driver_rss_mb_before"] = round(rss_before / 1024, 1)
    out["snm_driver_rss_mb_after"] = round(rss_after / 1024, 1)
    assert out["snm_pairs"] <= out["snm_docs"] * 7  # n x (w-1) bound
    sample = snm_pairs.take(1000)
    assert all(
        r["id_a"] < r["id_b"] and r["jaccard"] >= 0.9 for r in sample
    )

    # ---- byte-level ExactSubstr soak leg (r5 family) ----
    # Shared-text replicas make EVERY >= L-byte document fully
    # duplicated, so the exact output is ONE span (0, len) per such doc
    # — a byte-exact invariant at volume that also deliberately
    # stresses the verify exchange with the worst case (candidates ==
    # all window positions of a fully-duplicated corpus).
    from textalyzer_ray.pipelines.exactsubstr import exact_substr_spans

    es_repl = arg("--es-repl", 8)

    def replicate_shared_es(t: pa.Table) -> pa.Table:
        parts = []
        for r in range(es_repl):
            parts.append(
                t.set_column(
                    t.schema.get_field_index("doc_id"),
                    "doc_id",
                    pa.compute.add(t["doc_id"], r * 10_000_000),
                )
            )
        return pa.concat_tables(parts)

    big_es = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(replicate_shared_es, batch_format="pyarrow", batch_size=64)
        .repartition(cpu_heavy_min_blocks())
        .materialize()
    )
    es_min_len = 40

    def doc_lens(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "len": pa.compute.binary_length(
                    t["text"].cast(pa.binary())
                ).cast(pa.int64()),
            }
        )

    lens_tbl = pa.concat_tables(
        list(
            big_es.map_batches(doc_lens, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
    )
    want_es = {
        (d, 0, ln)
        for d, ln in zip(
            lens_tbl["doc_id"].to_pylist(), lens_tbl["len"].to_pylist()
        )
        if ln >= es_min_len
    }
    t0 = time.monotonic()
    es_spans = exact_substr_spans(big_es, min_len=es_min_len).materialize()
    out["es_sec"] = round(time.monotonic() - t0, 3)
    out["es_docs"] = n_docs * es_repl
    out["es_spans"] = es_spans.count()
    out["es_docs_per_sec"] = round(out["es_docs"] / out["es_sec"], 1)
    got_es = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in es_spans.take_all()
    }
    assert got_es == want_es, (
        len(got_es), len(want_es), list(got_es ^ want_es)[:5]
    )

    stop.set()
    t.join(timeout=2)
    if samples and total_store:
        out["object_store_total_mb"] = round(total_store / 1e6, 1)
        out["object_store_peak_mb"] = round(
            (total_store - min(samples)) / 1e6, 1
        )
    out["spilled_bytes"] = _spill_bytes()
    ray.shutdown()
    out["value"] = round(
        out["funnel_sec"]
        + out["dedup_sec"]
        + out["setjoin_sec"]
        + out["lm_sec"]
        + out["span_sec"]
        + out["kmeans_sec"]
        + out["bpe_sec"]
        + out["lsh_sec"]
        + out["sw_sec"]
        + out["sj_sec"]
        + out["robots_sec"]
        + out["bfs_sec"]
        + out["decay_sec"]
        + out["snm_sec"]
        + out["es_sec"],
        3,
    )
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
