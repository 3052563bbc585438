"""Corpus deduplication pipelines (training-data extensions).

- ``exact_dedup``: hash-partition + per-group keep-first (min id).
- ``minhash_duplicate_pairs`` / ``minhash_dedup``: MinHash+LSH candidate
  generation -> Jaccard verification -> connected components by
  min-label propagation (groupby rounds, no driver union-find on big
  data) -> keep the min-id representative per cluster.
- ``simhash_duplicate_pairs``: 64-bit simhash, hamming<=t within prefix
  buckets.
- ``ngram_jaccard_pairs``: exact n-gram Jaccard verification for a
  candidate pair list (the verification kernel used by minhash).

Shuffle keys are always fixed-width hashes. Candidate groups are capped
(``max_group``) with logged truncation — an LSH bucket holding the whole
corpus is a pathological key (SURVEY.md §4 skew).
"""

from __future__ import annotations

import logging

import pyarrow as pa
from ray.data import Dataset

from textalyzer_ray.core.fingerprint import jaccard
from textalyzer_ray.core.textmetrics import tokenize
from textalyzer_ray.stages.dedup import MinHasher, SimHasher, add_content_hash
from textalyzer_ray.stages.pools import default_pool

logger = logging.getLogger(__name__)


def exact_dedup(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """Keep the minimum-id row per distinct text. Returns (doc_id, text,
    n_copies). Shuffles 8-byte hashes; collisions are resolved by
    comparing the actual text inside the group.

    Scale note: group count == number of distinct texts, so Ray's
    ~0.1 ms/group finalization applies to the whole corpus — at 10^12
    docs swap the groupby for sort(content_hash) + per-block polars
    dedup with block-boundary reconciliation, or key-aligned
    repartition once HASH_SHUFFLE can be scoped per-stage
    (textalyzer_ray/context.py)."""

    def hash_stage(t: pa.Table) -> pa.Table:
        return add_content_hash(t.select([id_col, text_col]), text_col)

    def keep_first(g: pa.Table) -> pa.Table:
        by_text: dict[str, list] = {}
        for i, txt in zip(g[id_col].to_pylist(), g[text_col].to_pylist()):
            by_text.setdefault(txt, []).append(i)
        ids, texts, copies = [], [], []
        for txt, members in by_text.items():
            ids.append(min(members))
            texts.append(txt)
            copies.append(len(members))
        return pa.table(
            {
                id_col: pa.array(ids, g.schema.field(id_col).type),
                text_col: pa.array(texts, pa.string()),
                "n_copies": pa.array(copies, pa.int64()),
            }
        )

    return (
        ds.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("content_hash")
        .map_groups(keep_first, batch_format="pyarrow")
    )


def exact_dedup_distributed(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_partitions: int | None = None,
) -> Dataset:
    """Scale path for exact dedup: key-aligned hash partition on the
    content hash (stages.groups.grouped_apply) + ONE vectorized polars
    group_by per block — zero per-group Python, fully distributed (no
    single-block merge), correct because every content hash lands
    entirely in one block. Same output as ``exact_dedup``."""
    import polars as pl

    from textalyzer_ray.stages.groups import grouped_apply

    def hash_stage(t: pa.Table) -> pa.Table:
        return add_content_hash(t.select([id_col, text_col]), text_col)

    def keep_first_block(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t)
            .group_by(text_col)  # by text, not hash: collision-proof
            .agg(
                pl.col(id_col).min().alias(id_col),
                pl.len().cast(pl.Int64).alias("n_copies"),
            )
            .select([id_col, text_col, "n_copies"])
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    pa.field(id_col, t.schema.field(id_col).type),
                    pa.field(text_col, pa.string()),
                    pa.field("n_copies", pa.int64()),
                ]
            )
        )

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_apply(
        hashed, ["content_hash"], keep_first_block, num_partitions=num_partitions
    )


def minhash_duplicate_pairs(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    shingle_k: int = 3,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    max_group: int = 1000,
) -> Dataset:
    """(id_a, id_b, jaccard) verified near-duplicate pairs, id_a < id_b.

    texts ride to the verification group via the band explode join-free:
    the LSH rows carry (id, band, band_hash); verification re-reads the
    text by joining... — instead we ship (id, text) through the band
    rows once (text duplicated per band: bounded by bands x corpus; for
    10^12 docs switch to shipping token-hash arrays instead of text).
    """
    hasher_kwargs = dict(
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        shingle_k=shingle_k,
        bands=bands,
    )

    def band_with_text(batch: pa.Table) -> pa.Table:
        # task pool, not actors: the only state (permutation tables) is
        # microseconds to rebuild, and task scheduling avoids pool
        # spin-up latency (see stages/pools.py rationale)
        hasher = MinHasher(**hasher_kwargs)
        rows = hasher(batch)
        texts = dict(
            zip(batch[id_col].to_pylist(), batch[text_col].to_pylist())
        )
        return rows.append_column(
            "text", pa.array([texts[i] for i in rows[id_col].to_pylist()])
        )

    bands_ds = ds.map_batches(
        band_with_text, batch_format="pyarrow", batch_size=256
    )

    # Vectorized collision detection (stages.groups): count band keys
    # without Ray's per-group overhead, then filter the band rows down to
    # the colliding keys before the (now tiny) verification groupby.
    import ray
    import ray.data as rd

    from textalyzer_ray.stages.groups import duplicate_keys, filter_to_keys

    bands_ds = bands_ds.materialize()
    dup = duplicate_keys(bands_ds, ["band", "band_hash"])
    if dup.num_rows == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    keyset = set(zip(dup["band"].to_pylist(), dup["band_hash"].to_pylist()))
    bands_ds = filter_to_keys(bands_ds, ["band", "band_hash"], ray.put(keyset))

    def verify_block(block: pa.Table) -> pa.Table:
        """One key-aligned block holding MANY whole LSH buckets
        (stages.groups.grouped_apply): iterate buckets in-process — no
        Ray per-group machinery — with a per-block token cache so a doc
        surfacing in several buckets tokenizes once."""
        import polars as pl

        a_out, b_out, j_out = [], [], []
        tok_cache: dict = {}
        df = pl.from_arrow(block)
        for _, bucket in df.group_by(["band", "band_hash"]):
            uniq = dict(zip(bucket[id_col].to_list(), bucket["text"].to_list()))
            members = sorted(uniq)
            if len(members) < 2:
                continue
            if len(members) > max_group:
                logger.warning(
                    "LSH bucket truncated: %d members > max_group=%d",
                    len(members),
                    max_group,
                )
                members = members[:max_group]
            for i in members:
                if i not in tok_cache:
                    tok_cache[i] = tokenize(uniq[i] or "")
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    ja = jaccard(
                        tok_cache[members[x]], tok_cache[members[y]], shingle_k
                    )
                    if ja >= jaccard_threshold:
                        a_out.append(members[x])
                        b_out.append(members[y])
                        j_out.append(ja)
        return pa.table(
            {
                "id_a": pa.array(a_out),
                "id_b": pa.array(b_out),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )

    from textalyzer_ray.stages.groups import grouped_apply

    pairs = grouped_apply(bands_ds, ["band", "band_hash"], verify_block)

    # distinct pairs (the same pair surfaces from several bands): the
    # verified pair set is small by construction, so coalesce and take
    # polars-unique in one vectorized pass instead of a pair-keyed
    # Ray groupby shuffle.
    def distinct_pairs(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t)
            .unique(["id_a", "id_b"], keep="first", maintain_order=True)
            .to_arrow()
            .cast(t.schema)
        )

    return pairs.repartition(1).map_batches(
        distinct_pairs, batch_format="pyarrow", batch_size=None
    )


def connected_components(pairs: Dataset, max_rounds: int = 10) -> Dataset:
    """(id_a, id_b) edges -> (doc_id, cluster_id=min reachable id) by
    iterative min-label propagation: each round joins every node's
    current label with its neighbors' and keeps the min; converges in
    O(cluster diameter) rounds (near-dup clusters are shallow).
    Distributed-safe: only groupby-min shuffles, no driver union-find.
    """
    import pyarrow.compute as pc
    from ray.data import DataContext
    from ray.data.aggregate import Min

    edges = pairs.select_columns(["id_a", "id_b"]).materialize()
    # the pairs lineage may carry a scoped HASH_SHUFFLE context
    # (grouped_apply); the label-propagation loop below runs many small
    # groupbys, and hash-shuffle aggregator-actor startup per round is
    # pure overhead — flip the (already-materialized) dataset back to
    # the session default strategy.
    edges.context.shuffle_strategy = DataContext.get_current().shuffle_strategy

    def expand(t: pa.Table) -> pa.Table:
        # undirected: emit both directions plus self-labels
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        t["id_a"].combine_chunks(),
                        t["id_b"].combine_chunks(),
                    ]
                ),
                "label": pa.concat_arrays(
                    [
                        t["id_b"].combine_chunks(),
                        t["id_a"].combine_chunks(),
                    ]
                ),
            }
        )

    labels = (
        edges.map_batches(expand, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
    )
    labels = labels.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "label": pc.min_element_wise(t["node"], t["label"]),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_rounds):
        # propagate: node's label -> its neighbors via the edge list
        lab_rows = labels.take_all()
        lab = {r["node"]: r["label"] for r in lab_rows}

        def relabel(t: pa.Table, lab=lab) -> pa.Table:
            a = t["id_a"].to_pylist()
            b = t["id_b"].to_pylist()
            return pa.table(
                {
                    "node": a + b,
                    "label": [min(lab.get(y, y), lab.get(x, x)) for x, y in zip(a, b)]
                    + [min(lab.get(x, x), lab.get(y, y)) for x, y in zip(a, b)],
                }
            )

        new_labels = (
            edges.map_batches(relabel, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        new = {r["node"]: r["label"] for r in new_labels.take_all()}
        if new == lab:
            break
        labels = new_labels

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )


def minhash_dedup(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> Dataset:
    """Full near-dedup: docs -> verified pairs -> clusters -> keep one
    representative (min id) per cluster. Returns the KEPT (id, text).

    The pair->cluster label map is collected to the driver (size = number
    of near-duplicate docs, a small fraction of the corpus by
    construction) and broadcast into the final filter.
    """
    import ray

    pairs = minhash_duplicate_pairs(ds, id_col, text_col, **kwargs)
    labels = connected_components(pairs)
    drop = {
        r["doc_id"] for r in labels.take_all() if r["doc_id"] != r["cluster_id"]
    }
    drop_ref = ray.put(drop)

    class Keep:
        def __init__(self, ref):
            self.drop = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pa.array([i not in self.drop for i in t[id_col].to_pylist()])
            return t.filter(mask)

    return ds.map_batches(
        Keep,
        fn_constructor_args=(drop_ref,),
        batch_format="pyarrow",
        concurrency=default_pool(),
    )


def simhash_duplicate_pairs(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_group: int = 2000,
) -> Dataset:
    """(id_a, id_b, hamming) candidate near-dups: simhash per doc (actor
    pool), bucket by 16-bit prefix, pairwise hamming within bucket.
    (Prefix bucketing misses pairs differing inside the prefix — the
    standard multi-table permutation fix is noted in the docstring for
    the scale path; one table suffices for the fixtures.)"""
    from textalyzer_ray.core.fingerprint import hamming64

    sim = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=default_pool(),
    )

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_pylist()
        hs = g["simhash"].to_pylist()
        order = sorted(range(len(ids)), key=lambda i: ids[i])[:max_group]
        a_out, b_out, d_out = [], [], []
        for xi in range(len(order)):
            for yi in range(xi + 1, len(order)):
                x, y = order[xi], order[yi]
                d = hamming64(int(hs[x]), int(hs[y]))
                if d <= max_hamming:
                    a_out.append(ids[x])
                    b_out.append(ids[y])
                    d_out.append(d)
        return pa.table(
            {
                "id_a": pa.array(a_out),
                "id_b": pa.array(b_out),
                "hamming": pa.array(d_out, pa.int32()),
            }
        )

    return sim.groupby("simhash_prefix").map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    )


def ngram_jaccard_pairs(
    ds: Dataset,
    candidate_pairs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.0,
) -> Dataset:
    """Exact n-gram Jaccard for an explicit candidate pair list
    (id_a, id_b) — the verification kernel exposed standalone so any
    candidate generator (LSH, simhash, embeddings) can reuse it.

    The texts for candidate ids are broadcast via ray.put (candidate
    sets are the near-duplicate fraction — small by construction; a cap
    would go here if a pathological generator emitted the cross
    product)."""
    import ray

    ids_needed = set()
    pair_rows = candidate_pairs.select_columns(["id_a", "id_b"]).take_all()
    for r in pair_rows:
        ids_needed.add(r["id_a"])
        ids_needed.add(r["id_b"])
    needed_ref = ray.put(ids_needed)

    class CollectTexts:
        def __init__(self, ref):
            self.needed = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pa.array([i in self.needed for i in t[id_col].to_pylist()])
            return t.select([id_col, text_col]).filter(mask)

    texts = {}
    filtered = ds.map_batches(
        CollectTexts,
        fn_constructor_args=(needed_ref,),
        batch_format="pyarrow",
        concurrency=default_pool(),
    )
    for r in filtered.take_all():
        texts[r[id_col]] = r[text_col]

    out_a, out_b, out_j = [], [], []
    for r in pair_rows:
        ta = tokenize(texts.get(r["id_a"], "") or "")
        tb = tokenize(texts.get(r["id_b"], "") or "")
        j = jaccard(ta, tb, shingle_k)
        if j >= threshold:
            out_a.append(r["id_a"])
            out_b.append(r["id_b"])
            out_j.append(j)
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array(out_a),
                "id_b": pa.array(out_b),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )
    )
