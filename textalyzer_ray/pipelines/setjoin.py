"""Exact set-similarity joins via prefix filtering (AllPairs/PPJoin).

Public algorithms: Chaudhuri-Ganti-Kaushik "A Primitive Operator for
Similarity Joins" (ICDE 2006, prefix filter), Bayardo-Ma-Srikant
"Scaling Up All Pairs Similarity Search" (WWW 2007), and the
distributed 3-stage shape of Vernica-Carey-Li "Efficient Parallel
Set-Similarity Joins Using MapReduce" (SIGMOD 2010).

Two operators over per-document shingle-hash sets:

- ``set_similarity_join`` — symmetric: all unordered pairs with
  Jaccard >= t.
- ``containment_join`` — asymmetric: all ORDERED pairs (a, b) with
  |Sa n Sb| / |Sa| >= t (subset/quote duplication: a small doc wholly
  contained in a larger one scores 1.0 regardless of the size gap that
  keeps its Jaccard low). The probe side keeps only its prefix; the
  index side must stay FULL (no length filter exists on the superset
  side) — a genuinely different exchange shape from the symmetric join.

Unlike the MinHash-LSH family (pipelines/dedup.py — probabilistic
recall tuned by bands), both joins are EXACT by construction: order
every set by a global (df, hash) key and keep only the first
``n - ceil(t*n) + 1`` elements of the probe; the prefix-filter
pigeonhole guarantees any qualifying pair shares a probe-prefix
element, so candidate recall is 1 and the verified output equals the
brute-force all-pairs join. Rare shingles sort first, so the inverted
index is probed on exactly the elements whose postings are short — hot
shingles (huge df) sort last and almost never enter a prefix, which is
what bounds group skew without any truncation cap.

Scale shape (no text or list column through any shuffle):
1. ONE featurize pass: per-doc unique-sorted shingle-hash set rides as
   a binary blob; text dies here.
2. Shingle df via stages.groups.key_counts (partial + tree/key-aligned
   merge, auto-switched on measured size).
3. df attach: broadcast (ray.put + per-worker cache, vectorized
   searchsorted) below ``df_broadcast_max`` distinct shingles, else the
   join-free union-tag exchange + one doc-key grouped_apply — the
   decontaminate-style measured auto-switch.
4. Prefix rows are 24-byte (h, id, n) triples; candidates come from a
   per-block polars join inside ONE key-aligned exchange; a pair seen
   from several shared prefix elements is collapsed by a second
   (id_a, id_b)-aligned exchange sized to the measured candidate count.
5. Verification attaches the featurized blobs back to the candidate
   ids (two join-free union-tag lookups — acero rejects the schema-less
   empty hash partitions small candidate sets produce, CLAUDE.md r3)
   and computes the exact hash-set overlap — int/int division,
   bit-identical to the SQL oracle's DOUBLE.

Measured-size switch (the triangles/kcore pattern): when the corpus's
TOTAL element count is at most ``small_threshold``, the prefix/
candidate/verify chain runs in ONE remote task over the feature block
refs — the exchanges it replaces are pure fixed-cost hash-aggregator
startup at that size (measured at sf0.1: 11.3 -> 4.8 s). The featurize
pass stays distributed either way; all paths are pytest-pinned equal.

Reference analogue: none (the reference detects duplication only via
exact line groups, textalyzer/src/duplication.rs); this is the §2.9
extension surface.
"""

from __future__ import annotations

import logging

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset

from textalyzer_ray.core.fingerprint import shingle_hash_set
from textalyzer_ray.core.textmetrics import tokenize

logger = logging.getLogger(__name__)

_T_DEN = 10**6


def _ceil_tn(t_num: int, n: int) -> int:
    """Exact ceil(threshold * n) in integer math. float ceil(0.7*20)
    is 15 (0.7*20 == 14.000000000000002), which would SHORTEN the
    prefix below the theorem's bound and silently lose recall."""
    return -((-t_num * n) // _T_DEN)


def _t_num_of(threshold: float) -> int:
    """floor, not round: t_num/_T_DEN <= threshold keeps the prefix
    length (and any length filter) CONSERVATIVE so recall stays exact;
    the verification compare uses the caller's float threshold."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    return int(threshold * _T_DEN)


def _blob_arrays(t: pa.Table, id_col: str):
    """(ids, sizes, flat u64) from a feature table's hash blobs."""
    blobs = t["hashes"].to_pylist()
    ids = t[id_col].to_numpy(zero_copy_only=False)
    sizes = np.fromiter((len(b) // 8 for b in blobs), np.int64, len(blobs))
    flat = (
        np.frombuffer(b"".join(blobs), dtype=np.uint64)
        if blobs
        else np.empty(0, np.uint64)
    )
    return blobs, ids, sizes, flat


def _prefix_table(
    ids: np.ndarray,
    sizes: np.ndarray,
    hs: np.ndarray,
    dfs: np.ndarray,
    t_num: int,
    id_col: str,
    id_type: pa.DataType,
    full: bool = False,
) -> pa.Table:
    """Vectorized prefix emit for a batch of docs given the flat
    (h, df) element arrays and per-doc sizes: global (df, h) order
    within each doc, keep the first n - ceil(t*n) + 1 elements
    (``full=True`` keeps every element — the containment index side)."""
    schema = pa.schema(
        [
            pa.field("h", pa.uint64()),
            pa.field(id_col, id_type),
            pa.field("n", pa.int64()),
        ]
    )
    if len(hs) == 0:
        return schema.empty_table()
    if full:
        doc_ix = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        return pa.table(
            {
                "h": pa.array(hs),
                id_col: pa.array(ids[doc_ix]).cast(id_type),
                "n": pa.array(sizes[doc_ix].astype(np.int64)),
            },
            schema=schema,
        )
    starts = np.zeros(len(sizes) + 1, np.int64)
    np.cumsum(sizes, out=starts[1:])
    doc_ix = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    # one lexsort for the whole batch: (doc, df, h)
    order = np.lexsort((hs, dfs, doc_ix))
    rank_in_doc = np.arange(len(hs), dtype=np.int64) - starts[doc_ix[order]]
    plen = sizes - (-(-t_num * sizes) // _T_DEN) + 1  # n - ceil(t*n) + 1
    keep = rank_in_doc < plen[doc_ix[order]]
    sel = order[keep]
    return pa.table(
        {
            "h": pa.array(hs[sel]),
            id_col: pa.array(ids[doc_ix[sel]]).cast(id_type),
            "n": pa.array(sizes[doc_ix[sel]].astype(np.int64)),
        },
        schema=schema,
    )


def _df_lut(df_tbl: pa.Table):
    """(h sorted, df aligned) lookup arrays from a (h, count) table."""
    h_np = df_tbl["h"].to_numpy(zero_copy_only=False)
    ordk = np.argsort(h_np, kind="stable")
    return h_np[ordk], df_tbl["count"].to_numpy(zero_copy_only=False)[ordk]


def _overlaps(
    cand: pa.Table, blob_of, value_col: str, threshold: float, denom: str
) -> pa.Table:
    """Exact per-pair overlap from blob arrays: ``denom='union'`` gives
    Jaccard, ``denom='left'`` gives containment |Sa n Sb| / |Sa|."""
    ia = cand["id_a"].to_pylist()
    ib = cand["id_b"].to_pylist()
    out = np.empty(len(ia), np.float64)
    for i, (a, b) in enumerate(zip(ia, ib)):
        va = np.frombuffer(blob_of(i, "a"), dtype=np.uint64)
        vb = np.frombuffer(blob_of(i, "b"), dtype=np.uint64)
        ix = np.intersect1d(va, vb, assume_unique=True).size
        d = (len(va) + len(vb) - ix) if denom == "union" else len(va)
        out[i] = ix / d if d else 1.0
    keep = out >= threshold
    return pa.table(
        {
            "id_a": cand["id_a"].filter(pa.array(keep)),
            "id_b": cand["id_b"].filter(pa.array(keep)),
            value_col: pa.array(out[keep], pa.float64()),
        }
    )


def _prepare(ds, id_col, text_col, shingle_k):
    """Shared front half of both joins: featurized blobs (materialized
    — consumed by df count, prefix emit, and verification), the shingle
    df table, the vocabulary size, and the measured total element
    count (== sum of dfs; per-block sums + driver reduce, Dataset.sum
    plans a HashAggregate — CLAUDE.md)."""
    from textalyzer_ray.stages.groups import id_type_of, key_counts

    id_type = id_type_of(ds, id_col)
    feat_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field("hashes", pa.binary()),
            pa.field("n", pa.int64()),
        ]
    )

    def featurize(t: pa.Table) -> pa.Table:
        sets = [
            shingle_hash_set(tokenize(txt or ""), shingle_k)
            for txt in t[text_col].to_pylist()
        ]
        return pa.table(
            {
                id_col: t[id_col],
                "hashes": pa.array([s.tobytes() for s in sets], pa.binary()),
                "n": pa.array([len(s) for s in sets], pa.int64()),
            },
            schema=feat_schema,
        )

    feats = (
        ds.select_columns([id_col, text_col])
        .map_batches(featurize, batch_format="pyarrow", batch_size=256)
        .materialize()
    )

    def explode_hashes(t: pa.Table) -> pa.Table:
        _, ids, sizes, flat = _blob_arrays(t, id_col)
        return pa.table(
            {"h": pa.array(flat), id_col: pa.array(np.repeat(ids, sizes))}
        )

    exploded = feats.map_batches(explode_hashes, batch_format="pyarrow")
    df_ds = key_counts(exploded, ["h"]).materialize()
    vocab = df_ds.count()

    def df_block_sum(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        s = pc_.sum(t["count"]).as_py() if t.num_rows else 0
        return pa.table({"s": [int(s or 0)]})

    total_elems = sum(
        r["s"]
        for r in df_ds.map_batches(
            df_block_sum, batch_format="pyarrow", batch_size=None
        ).take_all()
    )
    return feats, exploded, df_ds, vocab, total_elems, id_type


def _emit_rows(
    feats, df_ds, vocab, df_broadcast_max, t_num, id_col, id_type, full
):
    """The (h, id, n) row stream for one side — prefix rows
    (full=False) or every element (full=True, the containment index).
    Broadcast df lookup below ``df_broadcast_max`` distinct shingles,
    else the join-free union-tag exchange + one doc-key grouped_apply."""
    import ray

    from textalyzer_ray.pipelines.joins import union_tag_lookup
    from textalyzer_ray.stages.groups import _worker_object_cache, grouped_apply

    if vocab <= df_broadcast_max:
        df_tbl = pa.concat_tables(
            list(df_ds.iter_batches(batch_size=None, batch_format="pyarrow"))
        )
        df_ref = ray.put(_df_lut(df_tbl))

        def emit_broadcast(t: pa.Table) -> pa.Table:
            cache = _worker_object_cache()
            ck = df_ref.hex()
            lut = cache.get(ck)
            if lut is None:
                lut = cache[ck] = ray.get(df_ref)
            hs_lut, dfs_lut = lut
            _, ids, sizes, flat = _blob_arrays(t, id_col)
            dfs = dfs_lut[np.searchsorted(hs_lut, flat)]
            return _prefix_table(
                ids, sizes, flat, dfs, t_num, id_col, id_type, full=full
            )

        return feats.map_batches(emit_broadcast, batch_format="pyarrow")

    def explode_hashes(t: pa.Table) -> pa.Table:
        _, ids, sizes, flat = _blob_arrays(t, id_col)
        return pa.table(
            {"h": pa.array(flat), id_col: pa.array(np.repeat(ids, sizes))}
        )

    with_df = union_tag_lookup(
        feats.map_batches(explode_hashes, batch_format="pyarrow"),
        df_ds,
        key_col="h",
        value_col="count",
        out_col="df",
    )

    def emit_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _prefix_table(
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, np.uint64),
                np.empty(0, np.int64),
                t_num,
                id_col,
                id_type,
                full=full,
            )
        df = (
            pl.from_arrow(t)
            .sort(id_col)
            .group_by(id_col, maintain_order=True)
            .agg([pl.col("h"), pl.col("df")])
        )
        ids = df[id_col].to_numpy()
        hs = df["h"].explode().to_numpy().astype(np.uint64, copy=False)
        dfs = df["df"].explode().to_numpy()
        sizes = df["h"].list.len().to_numpy().astype(np.int64)
        return _prefix_table(
            ids, sizes, hs, dfs, t_num, id_col, id_type, full=full
        )

    return grouped_apply(with_df, [id_col], emit_block)


def _distinct_then_verify(
    cands_ds,
    n_cand,
    feats,
    threshold,
    value_col,
    denom,
    pair_schema,
    id_col,
):
    """Collapse duplicate candidates in one key-aligned exchange sized
    to the measured candidate count, then attach the feature blobs via
    two union-tag lookups and verify exactly."""
    from textalyzer_ray.pipelines.joins import union_tag_lookup
    from textalyzer_ray.sources.tables import cluster_cpus
    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    cand_schema = pa.schema(
        [pair_schema.field("id_a"), pair_schema.field("id_b")]
    )

    def distinct_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cand_schema.empty_table()
        return (
            pl.from_arrow(t)
            .unique(["id_a", "id_b"])
            .to_arrow()
            .cast(cand_schema)
        )

    pairs = grouped_apply(
        cands_ds,
        ["id_a", "id_b"],
        distinct_block,
        num_partitions=min(
            max(cluster_cpus(), 2), partitions_for(n_cand, 2_000_000)
        ),
    )

    n_parts = max(2, min(cluster_cpus() // 2, n_cand // 10_000 + 1))
    j = pairs
    for side, out_col in (("id_a", "ha"), ("id_b", "hb")):
        j = union_tag_lookup(
            j,
            feats.map_batches(
                lambda t, s=side: pa.table(
                    {s: t[id_col], "hashes": t["hashes"]}
                ),
                batch_format="pyarrow",
            ),
            key_col=side,
            value_col="hashes",
            out_col=out_col,
            num_partitions=n_parts,
        )

    def verify(t: pa.Table) -> pa.Table:
        ha = t["ha"].to_pylist()
        hb = t["hb"].to_pylist()
        return _overlaps(
            t,
            lambda i, s: ha[i] if s == "a" else hb[i],
            value_col,
            threshold,
            denom,
        ).cast(pair_schema)

    return j.map_batches(verify, batch_format="pyarrow")


def set_similarity_join(
    ds: Dataset,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    df_broadcast_max: int = 2_000_000,
    small_threshold: int = 2_000_000,
) -> Dataset:
    """(id_a, id_b, jaccard) — ALL unordered pairs with shingle-set
    Jaccard >= ``threshold``, id_a < id_b, exact recall (module
    docstring). ``threshold`` binds exactly at 1e-6 resolution for the
    prefix bound; the verification compare is the same IEEE
    ``ix/union >= threshold`` a SQL oracle computes. ``id_col`` must be
    unique."""
    import ray
    import ray.data as rd

    from textalyzer_ray.sources.tables import cluster_cpus
    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    t_num = _t_num_of(threshold)
    feats, _, df_ds, vocab, total_elems, id_type = _prepare(
        ds, id_col, text_col, shingle_k
    )
    pair_schema = pa.schema(
        [
            pa.field("id_a", id_type),
            pa.field("id_b", id_type),
            pa.field("jaccard", pa.float64()),
        ]
    )
    cand_schema = pa.schema(
        [pa.field("id_a", id_type), pa.field("id_b", id_type)]
    )

    def pairs_in_block(t: pa.Table) -> pa.Table:
        """Key-aligned block: polars self-join on h gives every
        candidate pair of this block's prefix groups at once (no
        per-group Python); the symmetric PPJoin length filter
        ``t*max(na,nb) <= min(na,nb)`` prunes before the pair leaves."""
        if t.num_rows == 0:
            return cand_schema.empty_table()
        df = pl.from_arrow(t)
        left = df.rename({id_col: "id_a", "n": "na"})
        right = df.rename({id_col: "id_b", "n": "nb"})
        out = (
            left.join(right, on="h", how="inner")
            .filter(pl.col("id_a") < pl.col("id_b"))
            .filter(pl.col("nb") * _T_DEN >= pl.col("na") * t_num)
            .filter(pl.col("na") * _T_DEN >= pl.col("nb") * t_num)
            .select(["id_a", "id_b"])
            .unique()
        )
        return out.to_arrow().cast(cand_schema)

    if total_elems <= small_threshold and vocab <= df_broadcast_max:
        logger.info(
            "set_similarity_join: one-task small path (%d elements)",
            total_elems,
        )
        df_tbl = pa.concat_tables(
            list(df_ds.iter_batches(batch_size=None, batch_format="pyarrow"))
        )

        @ray.remote
        def setjoin_task(df_t: pa.Table, *blocks: pa.Table) -> pa.Table:
            f = pa.concat_tables(blocks)
            blobs, ids_np, sizes, flat = _blob_arrays(f, id_col)
            hs_lut, dfs_lut = _df_lut(df_t)
            dfs = dfs_lut[np.searchsorted(hs_lut, flat)]
            # the whole corpus is one key-complete block, so the same
            # prefix emit + in-block pairing used per partition is
            # globally correct here (and its unique() is global)
            cand = pairs_in_block(
                _prefix_table(ids_np, sizes, flat, dfs, t_num, id_col, id_type)
            )
            if cand.num_rows == 0:
                return pair_schema.empty_table()
            blob_by_id = dict(zip(ids_np.tolist(), blobs))
            ia = cand["id_a"].to_pylist()
            ib = cand["id_b"].to_pylist()
            return _overlaps(
                cand,
                lambda i, s: blob_by_id[ia[i] if s == "a" else ib[i]],
                "jaccard",
                threshold,
                "union",
            ).cast(pair_schema)

        refs = feats.to_arrow_refs()
        return rd.from_arrow_refs([setjoin_task.remote(df_tbl, *refs)])

    prefix_rows = _emit_rows(
        feats, df_ds, vocab, df_broadcast_max, t_num, id_col, id_type, False
    ).materialize()
    n_prefix = prefix_rows.count()
    if n_prefix == 0:
        return rd.from_arrow(pair_schema.empty_table())

    cands = grouped_apply(
        prefix_rows,
        ["h"],
        pairs_in_block,
        num_partitions=min(
            max(cluster_cpus(), 2), partitions_for(n_prefix, 2_000_000)
        ),
    ).materialize()
    n_cand = cands.count()
    logger.info(
        "set_similarity_join: %d prefix rows -> %d candidate rows",
        n_prefix,
        n_cand,
    )
    if n_cand == 0:
        return rd.from_arrow(pair_schema.empty_table())
    return _distinct_then_verify(
        cands, n_cand, feats, threshold, "jaccard", "union", pair_schema,
        id_col,
    )


def containment_join(
    ds: Dataset,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    df_broadcast_max: int = 2_000_000,
    small_threshold: int = 2_000_000,
) -> Dataset:
    """(id_a, id_b, containment) — ALL ordered pairs a != b with
    |Sa n Sb| / |Sa| >= ``threshold`` (Sa = a's shingle set): the
    subset/quote-duplication join. Exact recall: |Sa n Sb| >=
    ceil(t*|Sa|) forces a common element into Sa's (df, h)-ordered
    prefix of length |Sa| - ceil(t*|Sa|) + 1 (pigeonhole), so probing
    the FULL index with prefix rows misses nothing. No length filter
    exists (the superset side is unbounded). Docs with empty shingle
    sets never match (the SQL oracle has no grams for them)."""
    import ray
    import ray.data as rd

    from textalyzer_ray.sources.tables import cluster_cpus
    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    t_num = _t_num_of(threshold)
    feats, _, df_ds, vocab, total_elems, id_type = _prepare(
        ds, id_col, text_col, shingle_k
    )
    pair_schema = pa.schema(
        [
            pa.field("id_a", id_type),
            pa.field("id_b", id_type),
            pa.field("containment", pa.float64()),
        ]
    )
    cand_schema = pa.schema(
        [pa.field("id_a", id_type), pa.field("id_b", id_type)]
    )

    def probe_index_block(probe: pa.Table, index: pa.Table) -> pa.Table:
        """Candidates of one key-aligned block: probe prefix rows
        against full index rows on h; ordered pairs, a != b."""
        if probe.num_rows == 0 or index.num_rows == 0:
            return cand_schema.empty_table()
        left = pl.from_arrow(probe).rename({id_col: "id_a"}).drop("n")
        right = pl.from_arrow(index).rename({id_col: "id_b"}).drop("n")
        out = (
            left.join(right, on="h", how="inner")
            .filter(pl.col("id_a") != pl.col("id_b"))
            .select(["id_a", "id_b"])
            .unique()
        )
        return out.to_arrow().cast(cand_schema)

    if total_elems <= small_threshold and vocab <= df_broadcast_max:
        logger.info(
            "containment_join: one-task small path (%d elements)",
            total_elems,
        )
        df_tbl = pa.concat_tables(
            list(df_ds.iter_batches(batch_size=None, batch_format="pyarrow"))
        )

        @ray.remote
        def containment_task(df_t: pa.Table, *blocks: pa.Table) -> pa.Table:
            f = pa.concat_tables(blocks)
            blobs, ids_np, sizes, flat = _blob_arrays(f, id_col)
            hs_lut, dfs_lut = _df_lut(df_t)
            dfs = dfs_lut[np.searchsorted(hs_lut, flat)]
            probe = _prefix_table(
                ids_np, sizes, flat, dfs, t_num, id_col, id_type
            )
            index = _prefix_table(
                ids_np, sizes, flat, dfs, t_num, id_col, id_type, full=True
            )
            cand = probe_index_block(probe, index)
            if cand.num_rows == 0:
                return pair_schema.empty_table()
            blob_by_id = dict(zip(ids_np.tolist(), blobs))
            ia = cand["id_a"].to_pylist()
            ib = cand["id_b"].to_pylist()
            return _overlaps(
                cand,
                lambda i, s: blob_by_id[ia[i] if s == "a" else ib[i]],
                "containment",
                threshold,
                "left",
            ).cast(pair_schema)

        refs = feats.to_arrow_refs()
        return rd.from_arrow_refs([containment_task.remote(df_tbl, *refs)])

    # distributed: tag probe prefix rows and full index rows into one
    # schema, ONE h-aligned exchange pairs them per block
    tagged_schema = pa.schema(
        [
            pa.field("h", pa.uint64()),
            pa.field(id_col, id_type),
            pa.field("n", pa.int64()),
            pa.field("side", pa.int8()),
        ]
    )

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, np.int8))
            ).cast(tagged_schema)

        return f

    probe_rows = _emit_rows(
        feats, df_ds, vocab, df_broadcast_max, t_num, id_col, id_type, False
    ).map_batches(tag(1), batch_format="pyarrow")
    index_rows = _emit_rows(
        feats, df_ds, vocab, df_broadcast_max, t_num, id_col, id_type, True
    ).map_batches(tag(0), batch_format="pyarrow")
    both = probe_rows.union(index_rows).materialize()
    n_rows = both.count()
    if n_rows == 0:
        return rd.from_arrow(pair_schema.empty_table())

    def pairs_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cand_schema.empty_table()
        df = pl.from_arrow(t)
        return probe_index_block(
            df.filter(pl.col("side") == 1).drop("side").to_arrow(),
            df.filter(pl.col("side") == 0).drop("side").to_arrow(),
        )

    cands = grouped_apply(
        both,
        ["h"],
        pairs_block,
        num_partitions=min(
            max(cluster_cpus(), 2), partitions_for(n_rows, 2_000_000)
        ),
    ).materialize()
    n_cand = cands.count()
    logger.info(
        "containment_join: %d tagged rows -> %d candidate rows",
        n_rows,
        n_cand,
    )
    if n_cand == 0:
        return rd.from_arrow(pair_schema.empty_table())
    return _distinct_then_verify(
        cands, n_cand, feats, threshold, "containment", "left", pair_schema,
        id_col,
    )
