"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin).

Public algorithms: Chaudhuri-Ganti-Kaushik "A Primitive Operator for
Similarity Joins" (ICDE 2006, prefix filter), Bayardo-Ma-Srikant
"Scaling Up All Pairs Similarity Search" (WWW 2007), and the
distributed 3-stage shape of Vernica-Carey-Li "Efficient Parallel
Set-Similarity Joins Using MapReduce" (SIGMOD 2010).

Unlike the MinHash-LSH family (pipelines/dedup.py — probabilistic
recall tuned by bands), this join is EXACT by construction: order every
document's shingle set by a global (df, hash) key and keep only each
set's PREFIX of length ``n - ceil(t*n) + 1``; the prefix-filter theorem
guarantees any pair with Jaccard >= t shares at least one prefix
element, so candidate recall is 1 and the verified output equals the
brute-force all-pairs join. Rare shingles sort first, so the inverted
index is built on exactly the elements whose postings lists are short —
hot shingles (huge df) sort last and almost never enter a prefix, which
is what bounds group skew without any truncation cap.

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
   per-block polars self-join inside ONE key-aligned exchange; a pair
   seen from several shared prefix elements is collapsed by a second
   (id_a, id_b)-aligned exchange sized to the measured candidate count.
5. Verification joins the candidate ids back to the featurized blobs
   (two join-free union-tag lookups) and computes exact hash-set
   Jaccard — int/int
   division, bit-identical to the SQL oracle's DOUBLE.

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


def set_similarity_join(
    ds: Dataset,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    df_broadcast_max: int = 2_000_000,
    small_threshold: int = 2_000_000,
) -> Dataset:
    """(id_a, id_b, jaccard) — ALL pairs with shingle-set Jaccard >=
    ``threshold``, id_a < id_b, exact recall (see module docstring).

    ``threshold`` is interpreted exactly at 1e-6 resolution (0.8 means
    the rational 800000/1000000 for the prefix-length bound); the
    verification compare is the same IEEE ``ix/union >= threshold`` a
    SQL oracle computes. ``id_col`` must be unique.

    Measured-size switch (the triangles/kcore pattern): when the
    corpus's TOTAL shingle-set element count (measured from the
    featurize pass) is at most ``small_threshold``, the prefix/
    candidate/verify chain runs in ONE remote task over the feature
    block refs — the three hash exchanges it replaces are pure
    fixed-cost actor startup at that size. Larger corpora run the
    distributed chain; both paths are pinned equal in tests."""
    import ray
    import ray.data as rd

    from textalyzer_ray.pipelines.joins import union_tag_lookup
    from textalyzer_ray.sources.tables import cluster_cpus
    from textalyzer_ray.stages.groups import (
        _worker_object_cache,
        grouped_apply,
        id_type_of,
        key_counts,
        partitions_for,
    )

    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    # floor, not round: t_num/_T_DEN <= threshold keeps the prefix
    # length and length filter CONSERVATIVE (recall stays exact); the
    # verification compare uses the caller's float threshold itself.
    t_num = int(threshold * _T_DEN)

    id_type = id_type_of(ds, id_col)
    pair_schema = pa.schema(
        [
            pa.field("id_a", id_type),
            pa.field("id_b", id_type),
            pa.field("jaccard", pa.float64()),
        ]
    )
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

    # consumed three times (df count, prefix emit, verification joins)
    feats = (
        ds.select_columns([id_col, text_col])
        .map_batches(featurize, batch_format="pyarrow", batch_size=256)
        .materialize()
    )

    def explode_hashes(t: pa.Table) -> pa.Table:
        blobs = t["hashes"].to_pylist()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        lens = np.fromiter((len(b) // 8 for b in blobs), np.int64, len(blobs))
        flat = (
            np.frombuffer(b"".join(blobs), dtype=np.uint64)
            if blobs
            else np.empty(0, np.uint64)
        )
        return pa.table(
            {"h": pa.array(flat), id_col: pa.array(np.repeat(ids, lens))}
        )

    exploded = feats.map_batches(explode_hashes, batch_format="pyarrow")
    df_ds = key_counts(exploded, ["h"]).materialize()
    vocab = df_ds.count()

    prefix_schema = pa.schema(
        [
            pa.field("h", pa.uint64()),
            pa.field(id_col, id_type),
            pa.field("n", pa.int64()),
        ]
    )

    def prefix_rows_of(
        ids: np.ndarray, sizes: np.ndarray, hs: np.ndarray, dfs: np.ndarray
    ) -> pa.Table:
        """Vectorized prefix emit for a batch of docs given the flat
        (h, df) element arrays and per-doc sizes: global (df, h) order
        within each doc, keep the first n - ceil(t*n) + 1 elements."""
        if len(hs) == 0:
            return prefix_schema.empty_table()
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
            schema=prefix_schema,
        )

    cand_schema = pa.schema(
        [pa.field("id_a", id_type), pa.field("id_b", id_type)]
    )

    def pairs_in_block(t: pa.Table) -> pa.Table:
        """Key-aligned block: polars self-join on h gives every
        candidate pair of this block's prefix groups at once (no
        per-group Python); the PPJoin length filter
        ``n_b >= ceil(t * n_a)`` prunes before the pair leaves."""
        if t.num_rows == 0:
            return cand_schema.empty_table()
        df = pl.from_arrow(t)
        left = df.rename({id_col: "id_a", "n": "na"})
        right = df.rename({id_col: "id_b", "n": "nb"})
        out = (
            left.join(right, on="h", how="inner")
            .filter(pl.col("id_a") < pl.col("id_b"))
            .filter(
                pl.col("nb") * _T_DEN >= pl.col("na") * t_num,
            )
            .filter(
                pl.col("na") * _T_DEN >= pl.col("nb") * t_num,
            )
            .select(["id_a", "id_b"])
            .unique()
        )
        return out.to_arrow().cast(cand_schema)

    # total element volume == sum of shingle dfs (one per (doc, h) row);
    # per-block sums + driver reduce (Dataset.sum plans a HashAggregate)
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
            blobs = f["hashes"].to_pylist()
            ids_np = f[id_col].to_numpy(zero_copy_only=False)
            sizes = np.fromiter(
                (len(b) // 8 for b in blobs), np.int64, len(blobs)
            )
            flat = (
                np.frombuffer(b"".join(blobs), dtype=np.uint64)
                if blobs
                else np.empty(0, np.uint64)
            )
            h_np = df_t["h"].to_numpy(zero_copy_only=False)
            ordk = np.argsort(h_np, kind="stable")
            hs_lut = h_np[ordk]
            dfs_lut = df_t["count"].to_numpy(zero_copy_only=False)[ordk]
            dfs = dfs_lut[np.searchsorted(hs_lut, flat)]
            # the whole corpus is one key-complete block, so the same
            # prefix emit + in-block pairing used per partition is
            # globally correct here (and its unique() is global)
            cand = pairs_in_block(prefix_rows_of(ids_np, sizes, flat, dfs))
            if cand.num_rows == 0:
                return pair_schema.empty_table()
            blob_by_id = dict(zip(ids_np.tolist(), blobs))
            ia = cand["id_a"].to_pylist()
            ib = cand["id_b"].to_pylist()
            out_j = np.empty(len(ia), np.float64)
            for i, (a, b) in enumerate(zip(ia, ib)):
                va = np.frombuffer(blob_by_id[a], dtype=np.uint64)
                vb = np.frombuffer(blob_by_id[b], dtype=np.uint64)
                ix = np.intersect1d(va, vb, assume_unique=True).size
                u = len(va) + len(vb) - ix
                out_j[i] = ix / u if u else 1.0
            keep = out_j >= threshold
            return pa.table(
                {
                    "id_a": cand["id_a"].filter(pa.array(keep)),
                    "id_b": cand["id_b"].filter(pa.array(keep)),
                    "jaccard": pa.array(out_j[keep], pa.float64()),
                }
            ).cast(pair_schema)

        refs = feats.to_arrow_refs()
        return rd.from_arrow_refs([setjoin_task.remote(df_tbl, *refs)])

    if vocab <= df_broadcast_max:
        logger.info("set_similarity_join: broadcast df path (vocab=%d)", vocab)
        df_tbl = pa.concat_tables(
            list(df_ds.iter_batches(batch_size=None, batch_format="pyarrow"))
        )
        h_sorted = np.sort(df_tbl["h"].to_numpy(zero_copy_only=False))
        df_sorted = df_tbl["count"].to_numpy(zero_copy_only=False)[
            np.argsort(df_tbl["h"].to_numpy(zero_copy_only=False), kind="stable")
        ]
        df_ref = ray.put((h_sorted, df_sorted))

        def emit_prefix_broadcast(t: pa.Table) -> pa.Table:
            cache = _worker_object_cache()
            ck = df_ref.hex()
            lut = cache.get(ck)
            if lut is None:
                lut = cache[ck] = ray.get(df_ref)
            hs_lut, dfs_lut = lut
            blobs = t["hashes"].to_pylist()
            ids = t[id_col].to_numpy(zero_copy_only=False)
            sizes = np.fromiter(
                (len(b) // 8 for b in blobs), np.int64, len(blobs)
            )
            flat = (
                np.frombuffer(b"".join(blobs), dtype=np.uint64)
                if blobs
                else np.empty(0, np.uint64)
            )
            dfs = dfs_lut[np.searchsorted(hs_lut, flat)]
            return prefix_rows_of(ids, sizes, flat, dfs)

        prefix_rows = feats.map_batches(
            emit_prefix_broadcast, batch_format="pyarrow"
        )
    else:
        logger.info(
            "set_similarity_join: distributed df path (vocab=%d)", vocab
        )
        with_df = union_tag_lookup(
            exploded, df_ds, key_col="h", value_col="count", out_col="df"
        )

        def emit_prefix_block(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return prefix_schema.empty_table()
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
            return prefix_rows_of(ids, sizes, hs, dfs)

        prefix_rows = grouped_apply(with_df, [id_col], emit_prefix_block)

    prefix_rows = prefix_rows.materialize()
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

    def distinct_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cand_schema.empty_table()
        return (
            pl.from_arrow(t).unique(["id_a", "id_b"]).to_arrow().cast(
                cand_schema
            )
        )

    pairs = grouped_apply(
        cands,
        ["id_a", "id_b"],
        distinct_block,
        num_partitions=min(
            max(cluster_cpus(), 2), partitions_for(n_cand, 2_000_000)
        ),
    )

    # join-free lookups, not bucketed_join: a candidate set smaller
    # than the partition count leaves schema-less empty hash partitions
    # that acero rejects (CLAUDE.md r3) — union_tag_lookup is immune
    n_parts = max(2, min(cluster_cpus() // 2, n_cand // 10_000 + 1))
    j1 = union_tag_lookup(
        pairs,
        feats.map_batches(
            lambda t: pa.table({"id_a": t[id_col], "hashes": t["hashes"]}),
            batch_format="pyarrow",
        ),
        key_col="id_a",
        value_col="hashes",
        out_col="ha",
        num_partitions=n_parts,
    )
    j2 = union_tag_lookup(
        j1,
        feats.map_batches(
            lambda t: pa.table({"id_b": t[id_col], "hashes": t["hashes"]}),
            batch_format="pyarrow",
        ),
        key_col="id_b",
        value_col="hashes",
        out_col="hb",
        num_partitions=n_parts,
    )

    def verify(t: pa.Table) -> pa.Table:
        ha = t["ha"].to_pylist()
        hb = t["hb"].to_pylist()
        out_j = np.empty(t.num_rows, dtype=np.float64)
        for i in range(t.num_rows):
            va = np.frombuffer(ha[i], dtype=np.uint64)
            vb = np.frombuffer(hb[i], dtype=np.uint64)
            ix = np.intersect1d(va, vb, assume_unique=True).size
            u = len(va) + len(vb) - ix
            out_j[i] = ix / u if u else 1.0
        keep = out_j >= threshold
        return pa.table(
            {
                "id_a": t["id_a"].filter(pa.array(keep)),
                "id_b": t["id_b"].filter(pa.array(keep)),
                "jaccard": pa.array(out_j[keep], pa.float64()),
            }
        ).cast(pair_schema)

    return j2.map_batches(verify, batch_format="pyarrow")
