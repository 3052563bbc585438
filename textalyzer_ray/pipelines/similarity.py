"""Similarity search pipelines over the ``embeddings`` table
(vec_id, embedding: list<float>, label).

- ``brute_force_topk``: exact cosine top-k. Query matrix is ray.put once;
  each batch computes local top-k (numpy matmul); global answer = tiny
  sort+limit over (batches x k) rows. Nothing but top-k rows shuffle.
- ``ivf_topk``: IVF approximation — deterministic centroids from a
  sample, assign cells (actor pool), probe the closest cells only.
- ``embedding_near_dup_pairs``: cosine >= threshold pairs within IVF
  cells (embedding-space near-duplicate detection, multi-assignment).
- ``cosine_pairs_exact`` / ``knn_self_join``: EXACT all-pairs threshold
  pairs and the exact top-k neighbor graph via triangle partitioning
  (_triangle_replicate) — each bucket-pair group computes one block of
  the similarity matrix; every pair scored exactly once; the oracles
  for the approximate paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from textalyzer_ray.stages.similarity import (
    BruteForceTopK,
    IvfAssigner,
    _stack_embeddings,
    deterministic_centroids,
    normalize_rows,
)


def brute_force_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """-> (query_idx, vec_id, cosine) global top-k per query, sorted by
    (query_idx, cosine desc, vec_id)."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))

    def local_topk(batch: pa.Table) -> pa.Table:
        # task pool: the broadcast matrix is a zero-copy object-store
        # read per task; no actor spin-up (stages/pools.py rationale)
        return BruteForceTopK(qref, id_col=id_col, emb_col=emb_col, k=k)(batch)

    local = ds.map_batches(local_topk, batch_format="pyarrow")

    def global_topk(g: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(g)
            .sort(["cosine", id_col], descending=[True, False])
            .head(k)
        )
        return df.to_arrow().cast(g.schema)

    return (
        local.groupby("query_idx")
        .map_groups(global_topk, batch_format="pyarrow")
        .sort(["query_idx", "cosine", id_col], descending=[False, True, False])
    )


def build_centroids(
    ds: Dataset,
    n_centroids: int = 16,
    sample_limit: int = 4096,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic centroids from the ``sample_limit`` smallest-id
    vectors (stable sample => stable centroids => resumable index).

    No global sort (VERDICT r1 #10): the global smallest-id head is
    contained in the union of per-block heads, so each block contributes
    its local head (vectorized argpartition) and only blocks x <=
    sample_limit candidate rows leave the dataset; the final reduce is a
    driver-side argsort of that small candidate set."""
    import pyarrow.compute as pc

    def local_head(t: pa.Table) -> pa.Table:
        t = t.select([id_col, emb_col])
        if t.num_rows <= sample_limit:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False)
        take = np.argpartition(ids, sample_limit - 1)[:sample_limit]
        return t.take(pa.array(np.sort(take)))

    cand = pa.concat_tables(
        ds.map_batches(
            local_head, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    ids = cand[id_col].to_numpy(zero_copy_only=False)
    take = np.argsort(ids, kind="stable")[:sample_limit]  # id-ascending
    m = _stack_embeddings(cand.take(pa.array(take)), emb_col)
    return deterministic_centroids(m, n_centroids)


def ivf_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Approximate top-k probing the ``n_probe`` nearest IVF cells per
    query. Same output schema as brute_force_topk."""
    cents = build_centroids(ds, n_centroids, emb_col=emb_col, id_col=id_col)
    cref = ray.put(cents)
    assigned = ds.map_batches(
        lambda t: IvfAssigner(cref, emb_col=emb_col)(t), batch_format="pyarrow"
    )
    q = normalize_rows(np.asarray(queries, dtype=np.float64))
    probe_cells = set()
    sims = q @ cents.T
    for qi in range(q.shape[0]):
        for c in np.argsort(-sims[qi])[:n_probe]:
            probe_cells.add(int(c))

    cell_set = pa.array(sorted(probe_cells))

    def in_probed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.is_in(t["ivf_cell"], value_set=cell_set.cast(t["ivf_cell"].type))
        )

    pruned = assigned.map_batches(in_probed, batch_format="pyarrow")
    return brute_force_topk(pruned, q, k=k, id_col=id_col, emb_col=emb_col)


def _triangle_replicate(nb: int, id_col: str, emb_col: str):
    """map_batches GENERATOR for triangle partitioning (shared by the
    exact all-pairs kernels): bucket each vector by id, emit one output
    batch per bucket-pair partner c — yielding instead of concatenating
    keeps per-task peak memory at ONE copy of the input block instead
    of n_buckets copies (the shuffle downstream splits batches anyway).
    Invariant: pair_key = lo*nb + hi; every vector reaches exactly the
    nb unordered bucket pairs containing its bucket, so every vector
    pair co-locates in exactly one group."""

    def replicate(t: pa.Table):
        t = t.select([id_col, emb_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        b = (ids % nb).astype(np.int64)
        for c in range(nb):
            lo = np.minimum(b, c)
            hi = np.maximum(b, c)
            yield (
                t.append_column("bucket", pa.array(b))
                .append_column("pair_key", pa.array(lo * nb + hi))
            )

    return replicate


def cosine_pairs_exact(
    ds: Dataset,
    threshold: float = 0.45,
    n_buckets: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """EXACT (id_a, id_b) pairs with cosine >= threshold, id_a < id_b,
    via triangle partitioning: bucket each vector by id into
    ``n_buckets``, replicate it to every unordered bucket pair that
    contains its bucket, and let each of the n(n+1)/2 bucket-pair groups
    compute one block-pair of the similarity matrix (triangular within
    the diagonal groups, full cross-product otherwise). Every pair is
    computed in EXACTLY one group, so no distinct pass is needed.

    Scale notes: O(n^2) similarity work is inherent to the exact kernel
    — this spreads it over bucket-pair groups whose per-group memory is
    2*n/n_buckets vectors (n_buckets sized from the measured count);
    replication factor through the shuffle is n_buckets. For corpora
    where n^2 is not payable, use ``embedding_near_dup_pairs`` (IVF
    cells + multi-assignment) — this exact kernel is its oracle."""
    import polars as pl

    from textalyzer_ray.sources.tables import cluster_cpus
    from textalyzer_ray.stages.groups import grouped_apply

    n = ds.count()
    if n_buckets is None:
        # ~4096 vectors per side per group bounds the per-group matmul
        n_buckets = max(2, -(-2 * n // 4096))
    nb = n_buckets
    from textalyzer_ray.stages.groups import id_type_of

    id_type = id_type_of(ds, id_col)
    pair_schema = pa.schema(
        [
            pa.field("id_a", id_type),
            pa.field("id_b", id_type),
            pa.field("cosine", pa.float64()),
        ]
    )

    replicate = _triangle_replicate(nb, id_col, emb_col)

    def pairs_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pair_schema.empty_table()
        ids_np = block[id_col].to_numpy(zero_copy_only=False)
        m_all = normalize_rows(_stack_embeddings(block, emb_col))
        buckets = block["bucket"].to_numpy(zero_copy_only=False)
        df = pl.DataFrame(
            {
                "pair_key": block["pair_key"].to_numpy(zero_copy_only=False),
                "row": np.arange(block.num_rows, dtype=np.int64),
            }
        )
        parts = []
        for key_vals, grp in df.group_by(["pair_key"]):
            key = int(key_vals[0])
            lo, hi = key // nb, key % nb
            rows = np.asarray(grp["row"].to_list())
            if lo == hi:
                order = rows[np.argsort(ids_np[rows], kind="stable")]
                m = m_all[order]
                sims = m @ m.T
                ai, bi = np.where(np.triu(sims >= threshold, k=1))
                ida, idb = ids_np[order][ai], ids_np[order][bi]
                cos = sims[ai, bi]
            else:
                ra = rows[buckets[rows] == lo]
                rb = rows[buckets[rows] == hi]
                if len(ra) == 0 or len(rb) == 0:
                    continue
                sims = m_all[ra] @ m_all[rb].T
                ai, bi = np.where(sims >= threshold)
                ia, ib = ids_np[ra][ai], ids_np[rb][bi]
                ida, idb = np.minimum(ia, ib), np.maximum(ia, ib)
                cos = sims[ai, bi]
            if len(ida):
                parts.append(
                    pa.table(
                        {
                            "id_a": pa.array(ida, id_type),
                            "id_b": pa.array(idb, id_type),
                            "cosine": pa.array(cos, pa.float64()),
                        }
                    )
                )
        if not parts:
            return pair_schema.empty_table()
        return pa.concat_tables(parts).cast(pair_schema)

    replicated = ds.map_batches(replicate, batch_format="pyarrow")
    n_groups = nb * (nb + 1) // 2
    return grouped_apply(
        replicated,
        ["pair_key"],
        pairs_block,
        num_partitions=max(2, min(n_groups, cluster_cpus())),
    ).sort(["id_a", "id_b"])


def knn_self_join(
    ds: Dataset,
    k: int = 10,
    n_buckets: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """EXACT k-nearest-neighbor graph over the corpus: for every vector,
    its top-k cosine neighbors (self excluded) as
    (vec_id, rank, neighbor_id, cosine), rank 1-based by
    (cosine desc, neighbor_id asc).

    Same triangle partitioning as ``cosine_pairs_exact``: each
    bucket-pair group scores one block-pair of the similarity matrix and
    emits its LOCAL top-k per vector (both directions), so only
    n * n_buckets * k candidate rows — never full similarity rows —
    reach the final per-vector merge, a key-aligned grouped top-k.
    O(n^2) score work is inherent to the exact graph; the approximate
    path at corpus scale is ``ivf_topk`` per query batch."""
    import polars as pl

    from textalyzer_ray.sources.tables import cluster_cpus
    from textalyzer_ray.stages.groups import grouped_apply

    n = ds.count()
    if n_buckets is None:
        n_buckets = max(2, -(-2 * n // 4096))
    nb = n_buckets
    from textalyzer_ray.stages.groups import id_type_of

    id_type = id_type_of(ds, id_col)
    cand_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field("neighbor_id", id_type),
            pa.field("cosine", pa.float64()),
        ]
    )

    replicate = _triangle_replicate(nb, id_col, emb_col)

    def local_topk(side_ids, other_ids, sims):
        # sims: (len(side), len(other)); local top-k of each side row.
        # PRECONDITION: other_ids ascending — lowest column index ==
        # lowest neighbor id, so a stable value sort realizes the
        # documented (cosine desc, neighbor_id asc) order.
        kk = min(k, sims.shape[1])
        if kk == 0:
            return None
        m = sims.shape[1]
        if m > kk:
            # O(m) argpartition of the top kk+1 + EXACT boundary-tie
            # repair: a plain argpartition keeps an arbitrary tied
            # neighbor, so rows where the (kk+1)-th value ties the
            # kk-th (the tie straddles the cutoff) fall back to a full
            # stable argsort; ties are measure-zero for real cosines,
            # so the repair almost never runs but exactness never
            # depends on that.
            part = np.argpartition(-sims, kk, axis=1)[:, : kk + 1]
            part.sort(axis=1)  # ascending col idx == ascending id
            vals = np.take_along_axis(sims, part, axis=1)
            ord2 = np.argsort(-vals, axis=1, kind="stable")
            part = np.take_along_axis(part, ord2, axis=1)
            vals = np.take_along_axis(vals, ord2, axis=1)
            bad = vals[:, kk] == vals[:, kk - 1]
            part = part[:, :kk].copy()
            if bad.any():
                part[bad] = np.argsort(
                    -sims[bad], axis=1, kind="stable"
                )[:, :kk]
        else:
            part = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(side_ids, kk)
        cols = other_ids[part.ravel()]
        vals = np.take_along_axis(sims, part, axis=1).ravel()
        keep = vals > -1.5  # drop the self-exclusion sentinel (-2)
        return rows[keep], cols[keep], vals[keep]

    def cands_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return cand_schema.empty_table()
        ids_np = block[id_col].to_numpy(zero_copy_only=False)
        m_all = normalize_rows(_stack_embeddings(block, emb_col))
        buckets = block["bucket"].to_numpy(zero_copy_only=False)
        df = pl.DataFrame(
            {
                "pair_key": block["pair_key"].to_numpy(zero_copy_only=False),
                "row": np.arange(block.num_rows, dtype=np.int64),
            }
        )

        def by_id(rows):
            return rows[np.argsort(ids_np[rows], kind="stable")]

        out_r, out_c, out_v = [], [], []
        for key_vals, grp in df.group_by(["pair_key"]):
            key = int(key_vals[0])
            lo, hi = key // nb, key % nb
            rows = np.asarray(grp["row"].to_list())
            if lo == hi:
                rows = by_id(rows)
                ids = ids_np[rows]
                sims = m_all[rows] @ m_all[rows].T
                np.fill_diagonal(sims, -2.0)  # exclude self
                res = local_topk(ids, ids, sims)
                if res:
                    out_r.append(res[0]); out_c.append(res[1]); out_v.append(res[2])
            else:
                ra = by_id(rows[buckets[rows] == lo])
                rb = by_id(rows[buckets[rows] == hi])
                if len(ra) == 0 or len(rb) == 0:
                    continue
                sims = m_all[ra] @ m_all[rb].T
                for side, other, s in (
                    (ids_np[ra], ids_np[rb], sims),
                    (ids_np[rb], ids_np[ra], sims.T),
                ):
                    res = local_topk(side, other, s)
                    if res:
                        out_r.append(res[0]); out_c.append(res[1]); out_v.append(res[2])
        if not out_r:
            return cand_schema.empty_table()
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_r), id_type),
                "neighbor_id": pa.array(np.concatenate(out_c), id_type),
                "cosine": pa.array(np.concatenate(out_v), pa.float64()),
            }
        )

    out_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field("rank", pa.int64()),
            pa.field("neighbor_id", id_type),
            pa.field("cosine", pa.float64()),
        ]
    )

    def merge_topk(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .sort([id_col, "cosine", "neighbor_id"], descending=[False, True, False])
            .group_by(id_col, maintain_order=True)
            .head(k)
            .with_columns(
                (pl.col("cosine").rank("ordinal", descending=True).over(id_col))
                .cast(pl.Int64)
                .alias("rank")
            )
            .select([id_col, "rank", "neighbor_id", "cosine"])
            .to_arrow()
            .cast(out_schema)
        )

    replicated = ds.map_batches(replicate, batch_format="pyarrow")
    n_groups = nb * (nb + 1) // 2
    cands = grouped_apply(
        replicated,
        ["pair_key"],
        cands_block,
        num_partitions=max(2, min(n_groups, cluster_cpus())),
    )
    return grouped_apply(
        cands,
        [id_col],
        merge_topk,
        num_partitions=max(2, min(-(-n // 50_000), 64)),
    ).sort([id_col, "rank"])


def embedding_near_dup_pairs(
    ds: Dataset,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_cell: int = 4096,
    n_assign: int = 2,
) -> Dataset:
    """(id_a, id_b, cosine) pairs with cosine >= threshold, computed
    within IVF cells. ``n_assign`` > 1 replicates each vector into its
    n nearest cells (multi-assignment — the standard fix for the
    cell-boundary recall loss); a pair sharing several cells is emitted
    ONLY from its first common cell (the same distinct-by-construction
    trick as minhash), so multi-assignment adds no dedup shuffle."""
    import polars as pl

    from textalyzer_ray.sources.tables import cluster_cpus
    from textalyzer_ray.stages.groups import grouped_apply

    cents = build_centroids(ds, n_centroids, emb_col=emb_col, id_col=id_col)
    cref = ray.put(cents)
    assigned = ds.map_batches(
        lambda t: IvfAssigner(cref, emb_col=emb_col, n_assign=n_assign)(t),
        batch_format="pyarrow",
    )
    from textalyzer_ray.stages.groups import id_type_of

    id_type = id_type_of(ds, id_col)
    pair_schema = pa.schema(
        [
            pa.field("id_a", id_type),
            pa.field("id_b", id_type),
            pa.field("cosine", pa.float64()),
        ]
    )
    multi = n_assign > 1

    def pairs_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pair_schema.empty_table()
        ids_np = np.asarray(block[id_col].to_pylist())
        m_all = normalize_rows(_stack_embeddings(block, emb_col))
        if multi:
            cl = block["ivf_cells"].combine_chunks()
            offs = cl.offsets.to_numpy(zero_copy_only=False)
            cvals = cl.values.to_numpy(zero_copy_only=False)
        df = pl.DataFrame(
            {
                "cell": block["ivf_cell"].to_numpy(zero_copy_only=False),
                "row": np.arange(block.num_rows, dtype=np.int64),
            }
        )
        parts = []
        for key_vals, bucket in df.group_by(["cell"]):
            cur = int(key_vals[0])
            rows = np.asarray(bucket["row"].to_list())
            if len(rows) < 2:
                continue
            order = rows[np.argsort(ids_np[rows], kind="stable")][:max_cell]
            m = m_all[order]
            sims = m @ m.T
            ai, bi = np.where(np.triu(sims >= threshold, k=1))
            if multi and len(ai):
                keep = np.ones(len(ai), dtype=bool)
                for i, (x, y) in enumerate(zip(order[ai], order[bi])):
                    common = np.intersect1d(
                        cvals[offs[x] : offs[x + 1]],
                        cvals[offs[y] : offs[y + 1]],
                        assume_unique=True,
                    )
                    keep[i] = len(common) > 0 and int(common[0]) == cur
                ai, bi = ai[keep], bi[keep]
            parts.append(
                pa.table(
                    {
                        "id_a": pa.array(ids_np[order][ai], id_type),
                        "id_b": pa.array(ids_np[order][bi], id_type),
                        "cosine": pa.array(sims[ai, bi], pa.float64()),
                    }
                )
            )
        if not parts:
            return pair_schema.empty_table()
        return pa.concat_tables(parts).cast(pair_schema)

    return grouped_apply(
        assigned, ["ivf_cell"], pairs_block,
        num_partitions=max(2, cluster_cpus() // 4),
    )


def semdedup(
    ds: Dataset,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    policy: str = "min_id",
    broadcast_threshold: int = 50_000_000,
) -> Dataset:
    """SemDeDup (Abbas et al. 2023): semantic deduplication over an
    embedding column — cosine-similarity clusters, then ONE kept
    representative per cluster. Returns the per-id audit view
    ``(id, cluster_id, kept)`` (all int64; filter kept==1 for the
    deduplicated corpus).

    Clusters are connected components of the exact cosine >= threshold
    pair graph (``cosine_pairs_exact`` triangle partitioning ->
    ``connected_components`` measured-size union-find/label
    propagation); singletons keep cluster_id = own id and kept = 1.

    ``policy``:
    - ``"min_id"``: keep the lowest id per cluster (== the cluster
      label, so the flag is pure arithmetic — and SQL-exact, the
      driver-oracle policy).
    - ``"centroid_low"``: the paper's policy — keep the member with the
      LOWEST cosine similarity to its cluster centroid (the least
      redundant example). Ties: members are pre-sorted by id and
      np.argmin keeps the first minimum, so ties break to the lowest
      id deterministically (engineered-tie rule, CLAUDE.md). Float
      scoring -> pytest-pinned, not SQL-oracled.

    Scale shape, picked from the MEASURED clustered-node count (the
    duplicated fraction, small by construction — the minhash_dedup
    auto-switch pattern):
    - ``<= broadcast_threshold``: the label table is ``ray.put``
      broadcast; assignment is one streaming map over ``ds`` (per-batch
      polars left join, per-worker object cache). centroid reps come
      from a broadcast semi-join of member vectors + one cluster-aligned
      ``grouped_apply``.
    - above it: join-free union-tag merges (host_pagerank pattern):
      ids+labels hash-align by id for assignment; member vectors ride
      one id-aligned then one cluster-aligned exchange for reps
      (fixed-dim vectors, same payload class the triangle kernel
      ships); rep flags merge back by id. No driver materialization
      anywhere on this path.

    Consumes ``ds`` 2-3x (pair graph, assignment, centroid members) —
    pass a parquet-backed or materialized dataset."""
    import logging

    import polars as pl

    from textalyzer_ray.pipelines.dedup import connected_components
    from textalyzer_ray.stages.groups import (
        _worker_object_cache,
        grouped_apply,
        partitions_for,
    )

    if policy not in ("min_id", "centroid_low"):
        raise ValueError(f"unknown semdedup policy: {policy!r}")

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("cluster_id", pa.int64()),
            pa.field("kept", pa.int64()),
        ]
    )
    lab_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("cluster_id", pa.int64())]
    )

    pairs = cosine_pairs_exact(
        ds, threshold=threshold, id_col=id_col, emb_col=emb_col
    )
    labels = connected_components(pairs).materialize()
    n_labels = labels.count()

    def rep_block(t: pa.Table) -> pa.Table:
        # one row per cluster: the member with the lowest cosine to the
        # cluster centroid (pre-sorted by id; np.argmin keeps the first
        # minimum). Cluster count is the duplicated fraction, so the
        # per-cluster loop is bounded; the numpy work is vectorized.
        df = pl.from_arrow(t).sort([ "cluster_id", id_col])
        cids, rids = [], []
        for (cid,), g in df.partition_by(
            "cluster_id", maintain_order=True, as_dict=True
        ).items():
            m = _stack_embeddings(g.select(emb_col).to_arrow(), emb_col)
            centroid = m.mean(axis=0)
            cn = np.linalg.norm(centroid)
            centroid = centroid / (cn if cn else 1.0)
            cos = normalize_rows(m) @ centroid
            rids.append(int(g[id_col][int(np.argmin(cos))]))
            cids.append(int(cid))
        return pa.table(
            {
                "cluster_id": pa.array(cids, pa.int64()),
                "rep_id": pa.array(rids, pa.int64()),
            }
        )

    if n_labels <= broadcast_threshold:
        lab_batches = list(
            labels.iter_batches(batch_size=None, batch_format="pyarrow")
        )
        lab_tbl = (
            pa.concat_tables([b.select(["doc_id", "cluster_id"]) for b in lab_batches])
            .cast(lab_schema)
            if lab_batches
            else lab_schema.empty_table()
        )
        lab_ref = ray.put(lab_tbl)

        rep_ref = None
        if policy == "centroid_low" and lab_tbl.num_rows:

            def member_vecs(t: pa.Table) -> pa.Table:
                cache = _worker_object_cache()
                ck = "semdedup_lab_" + lab_ref.hex()
                ldf = cache.get(ck)
                if ldf is None:
                    ldf = cache[ck] = pl.from_arrow(ray.get(lab_ref)).rename(
                        {"doc_id": id_col}
                    )
                return (
                    pl.from_arrow(t.select([id_col, emb_col]))
                    .cast({id_col: pl.Int64})
                    .join(ldf, on=id_col, how="inner")
                    .to_arrow()
                )

            reps = grouped_apply(
                ds.map_batches(member_vecs, batch_format="pyarrow"),
                ["cluster_id"],
                rep_block,
                num_partitions=partitions_for(n_labels, rows_per_part=2_000_000),
            )
            rep_tbl = pa.concat_tables(
                list(reps.iter_batches(batch_size=None, batch_format="pyarrow"))
            )
            rep_ref = ray.put(rep_tbl.select(["rep_id"]))

        def assign(t: pa.Table) -> pa.Table:
            cache = _worker_object_cache()
            ck = "semdedup_lab_assign_" + lab_ref.hex()
            ldf = cache.get(ck)
            if ldf is None:
                ldf = cache[ck] = pl.from_arrow(ray.get(lab_ref)).rename(
                    {"doc_id": id_col}
                )
            out = (
                pl.from_arrow(t.select([id_col]))
                .cast({id_col: pl.Int64})
                .join(ldf, on=id_col, how="left")
                .with_columns(
                    pl.col("cluster_id").is_not_null().alias("_clustered"),
                    pl.coalesce(pl.col("cluster_id"), pl.col(id_col)).alias(
                        "cluster_id"
                    ),
                )
            )
            if policy == "min_id":
                out = out.with_columns(
                    (pl.col(id_col) == pl.col("cluster_id"))
                    .cast(pl.Int64)
                    .alias("kept")
                )
            else:
                rk = "semdedup_rep_" + (rep_ref.hex() if rep_ref else "none")
                rdf = cache.get(rk)
                if rdf is None:
                    rdf = cache[rk] = (
                        pl.from_arrow(ray.get(rep_ref)).rename(
                            {"rep_id": id_col}
                        )
                        if rep_ref is not None
                        else pl.DataFrame({id_col: pl.Series([], dtype=pl.Int64)})
                    )
                out = out.with_columns(
                    (
                        ~pl.col("_clustered")
                        | pl.col(id_col).is_in(rdf[id_col])
                    )
                    .cast(pl.Int64)
                    .alias("kept")
                )
            return out.select(out_schema.names).to_arrow().cast(out_schema)

        return ds.map_batches(assign, batch_format="pyarrow")

    logging.getLogger(__name__).info(
        "semdedup: %d clustered ids > broadcast_threshold=%d — union-tag "
        "distributed path", n_labels, broadcast_threshold,
    )
    npart = partitions_for(n_labels, rows_per_part=5_000_000)
    tag_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("cluster_id", pa.int64()),
            pa.field("_lab", pa.int64()),
        ]
    )

    def base_rows(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select([id_col]))
            .cast({id_col: pl.Int64})
            .with_columns(
                pl.col(id_col).alias("cluster_id"),
                pl.lit(0, dtype=pl.Int64).alias("_lab"),
            )
            .to_arrow()
            .cast(tag_schema)
        )

    def lab_rows(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["doc_id", "cluster_id"]))
            .rename({"doc_id": id_col})
            .with_columns(pl.lit(1, dtype=pl.Int64).alias("_lab"))
            .to_arrow()
            .cast(tag_schema)
        )

    tagged = ds.map_batches(base_rows, batch_format="pyarrow").union(
        labels.map_batches(lab_rows, batch_format="pyarrow")
    )

    def pick(t: pa.Table) -> pa.Table:
        # per id: the label row wins when present; clustered iff one is
        return (
            pl.from_arrow(t)
            .sort([id_col, "_lab"], descending=[False, True])
            .unique(subset=[id_col], keep="first")
            .rename({"_lab": "_clustered"})
            .to_arrow()
        )

    assign = grouped_apply(tagged, [id_col], pick, num_partitions=npart)

    if policy == "min_id":

        def finish_min(t: pa.Table) -> pa.Table:
            return (
                pl.from_arrow(t)
                .with_columns(
                    (pl.col(id_col) == pl.col("cluster_id"))
                    .cast(pl.Int64)
                    .alias("kept")
                )
                .select(out_schema.names)
                .to_arrow()
                .cast(out_schema)
            )

        return assign.map_batches(finish_min, batch_format="pyarrow")

    # centroid_low, distributed: attach clusters to member vectors by an
    # id-aligned merge, reps by a cluster-aligned one, flags back by id
    def vec_rows(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select([id_col, emb_col]))
            .cast({id_col: pl.Int64, emb_col: pl.List(pl.Float64)})
            .with_columns(
                pl.lit(None, dtype=pl.Int64).alias("cluster_id"),
            )
            .select([id_col, "cluster_id", emb_col])
            .to_arrow()
        )

    def lab_rows_v(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "cluster_id"])).rename(
            {"doc_id": id_col}
        )
        return df.with_columns(
            pl.lit(None, dtype=pl.List(pl.Float64)).alias(emb_col)
        ).select([id_col, "cluster_id", emb_col]).to_arrow()

    def join_members(t: pa.Table) -> pa.Table:
        # groups (by id) holding a label row are members: emit the
        # vector row stamped with the label's cluster
        df = pl.from_arrow(t)
        lab = df.filter(pl.col("cluster_id").is_not_null()).select(
            id_col, "cluster_id"
        )
        vec = df.filter(pl.col("cluster_id").is_null()).select(id_col, emb_col)
        return vec.join(lab, on=id_col, how="inner").select(
            ["cluster_id", id_col, emb_col]
        ).to_arrow()

    vec_union = ds.map_batches(vec_rows, batch_format="pyarrow").union(
        labels.map_batches(lab_rows_v, batch_format="pyarrow")
    )
    members = grouped_apply(vec_union, [id_col], join_members, num_partitions=npart)
    reps = grouped_apply(members, ["cluster_id"], rep_block, num_partitions=npart)

    flag_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("cluster_id", pa.int64()),
            pa.field("_clustered", pa.int64()),
            pa.field("_rep", pa.int64()),
        ]
    )

    def assign_rows(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .with_columns(pl.lit(0, dtype=pl.Int64).alias("_rep"))
            .select(flag_schema.names)
            .to_arrow()
            .cast(flag_schema)
        )

    def rep_rows(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .rename({"rep_id": id_col})
            .with_columns(
                pl.lit(0, dtype=pl.Int64).alias("_clustered"),
                pl.lit(1, dtype=pl.Int64).alias("_rep"),
            )
            .select(flag_schema.names)
            .to_arrow()
            .cast(flag_schema)
        )

    flagged = assign.map_batches(assign_rows, batch_format="pyarrow").union(
        reps.map_batches(rep_rows, batch_format="pyarrow")
    )

    def finish_centroid(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by(id_col)
            .agg(
                pl.col("cluster_id").max().alias("cluster_id"),
                pl.col("_clustered").max().alias("_clustered"),
                pl.col("_rep").max().alias("_rep"),
            )
            .with_columns(
                ((pl.col("_clustered") == 0) | (pl.col("_rep") == 1))
                .cast(pl.Int64)
                .alias("kept")
            )
            .select(out_schema.names)
            .to_arrow()
            .cast(out_schema)
        )

    return grouped_apply(flagged, [id_col], finish_centroid, num_partitions=npart)


def kmeans_assign(
    ds: Dataset,
    k: int = 8,
    n_iter: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    passthrough_cols: list[str] | None = None,
    small_threshold: int = 1_000_000,
) -> Dataset:
    """Distributed Lloyd k-means over an embedding column -> one
    (id, cluster:int64) row per vector, the canonical iterative-ML
    shape on Ray Data (topic bucketing / cluster-balanced sampling a
    curation pipeline hangs off the ``embeddings`` table; the in-memory
    analogue is ``deterministic_centroids`` in stages/similarity.py).

    Determinism + scale shape:

    - Init: the embeddings of the ``k`` smallest ids, collected via
      per-block heads (the ``build_centroids`` no-global-sort pattern) —
      cluster label j == rank-j smallest init id in BOTH engines.
    - Each of the ``n_iter`` Lloyd rounds broadcasts the (k, dim)
      float64 centroid matrix (``ray.put`` once, zero-copy per task)
      and streams ONE map_batches pass emitting per-block partials:
      (cluster, count, sum-vector as a float64 binary blob — list
      columns don't ride shuffles, CLAUDE.md). The driver reduce is
      O(blocks * k * dim) — never data-sized — mirroring the PageRank
      per-block-sum lesson.
    - Empty clusters keep their previous centroid (deterministic,
      SQL-expressible as a NOT IN carry).
    - Final pass assigns against the post-update centroids; argmin
      tie-break is lowest cluster index (numpy first-occurrence ==
      SQL ORDER BY d, c).

    Float parity with the DuckDB oracle is MEASURED, not assumed
    (CLAUDE.md PageRank precedent): tests/test_kmeans.py computes the
    min assignment margin |d2_second - d2_best| across every round and
    checks it clears the cross-engine sum-order error bound by orders
    of magnitude. Only integer columns leave the pipeline.

    Consumes ``ds`` n_iter + 3 times (row count + init + rounds +
    final) — pass a parquet-backed (or materialized) dataset, never an
    ephemeral lineage (CLAUDE.md minhash_dedup lesson).

    Measured-size small path (CLAUDE.md one-task-loop lesson): below
    ``small_threshold`` vectors (~0.5 GB at dim 64), ONE remote task
    runs every Lloyd round over the block refs with the same kernels —
    iterative Dataset loops otherwise pay per-round operator startup.
    Cross-path assignment equality is safe by the same measured margins
    that certify the oracle (sum-order differences ~1e-13).
    """
    import pyarrow.compute as pc

    from textalyzer_ray.stages.similarity import _stack_embeddings

    # --- init: k smallest-id embeddings, per-block heads only ---
    def local_head(t: pa.Table) -> pa.Table:
        t = t.select([id_col, emb_col])
        if t.num_rows <= k:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False)
        take = np.argpartition(ids, k - 1)[:k]
        return t.take(pa.array(np.sort(take)))

    cand = pa.concat_tables(
        ds.map_batches(
            local_head, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    ids = cand[id_col].to_numpy(zero_copy_only=False)
    take = np.argsort(ids, kind="stable")[:k]
    cents = _stack_embeddings(cand.take(pa.array(take)), emb_col)
    if cents.shape[0] < k:
        raise ValueError(f"kmeans_assign: fewer than k={k} input rows")

    partial_schema = pa.schema(
        [
            pa.field("cluster", pa.int64()),
            pa.field("count", pa.int64()),
            pa.field("sumvec", pa.binary()),
        ]
    )

    def _assign(m: np.ndarray, c: np.ndarray) -> np.ndarray:
        # expanded |x|^2 - 2 x.c + |c|^2 (BLAS matmul): measured 820x
        # faster than the broadcast (x-c)^2 form at 128k x 64 (which
        # allocates batch*k*dim temporaries), and its rounding differs
        # from the oracle's sum((x-c)^2) by <= ~1e-13 — five orders
        # under the certified >= 6.7e-6 assignment margins
        d2 = (
            (m * m).sum(axis=1)[:, None]
            - 2.0 * (m @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        return np.argmin(d2, axis=1)  # first occurrence on ties

    extra = list(passthrough_cols or [])

    def _out_schema(t: pa.Table) -> pa.Schema:
        return pa.schema(
            [pa.field(id_col, pa.int64()), pa.field("cluster", pa.int64())]
            + [t.schema.field(c) for c in extra]
        )

    if ds.count() <= small_threshold:
        import ray.data as rd

        @ray.remote
        def lloyd_local(c0: np.ndarray, *blocks: pa.Table) -> pa.Table:
            t = pa.concat_tables(blocks)
            m = _stack_embeddings(t, emb_col)
            c = c0.copy()
            for _ in range(n_iter):
                a = _assign(m, c)
                new = c.copy()
                for j in range(k):
                    sel = m[a == j]
                    if len(sel):
                        new[j] = sel.sum(axis=0) / len(sel)
                c = new
            a = _assign(m, c)
            cols = {
                id_col: pc.cast(t[id_col], pa.int64()),
                "cluster": pa.array(a.astype(np.int64)),
            }
            for name in extra:
                cols[name] = t[name]
            return pa.table(cols, schema=_out_schema(t))

        # assignments stay in the object store (from_arrow_refs)
        return rd.from_arrow_refs(
            [lloyd_local.remote(cents, *ds.to_arrow_refs())]
        )

    for _ in range(n_iter):
        cref = ray.put(cents)

        def partial(t: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            m = _stack_embeddings(t, emb_col)
            if m.size == 0:
                return partial_schema.empty_table()
            a = _assign(m, c)
            rows = {"cluster": [], "count": [], "sumvec": []}
            for j in np.unique(a):
                sel = m[a == j]
                rows["cluster"].append(int(j))
                rows["count"].append(int(sel.shape[0]))
                rows["sumvec"].append(sel.sum(axis=0).tobytes())
            return pa.table(rows, schema=partial_schema)

        sums = np.zeros_like(cents)
        counts = np.zeros(k, dtype=np.int64)
        for b in ds.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            for j, n, blob in zip(
                b["cluster"].to_pylist(),
                b["count"].to_pylist(),
                b["sumvec"].to_pylist(),
            ):
                sums[j] += np.frombuffer(blob, dtype=np.float64)
                counts[j] += n
        nonempty = counts > 0
        cents = np.where(
            nonempty[:, None], sums / np.maximum(counts, 1)[:, None], cents
        )

    cref = ray.put(cents)

    def final(t: pa.Table, _cref=cref) -> pa.Table:
        # passthrough columns ride the final batch-local pass, so
        # attaching metadata to assignments costs no join/shuffle
        out_schema = _out_schema(t)
        c = ray.get(_cref)
        m = _stack_embeddings(t, emb_col)
        if m.size == 0:
            return out_schema.empty_table()
        a = _assign(m, c)
        cols = {
            id_col: pc.cast(t[id_col], pa.int64()),
            "cluster": pa.array(a.astype(np.int64)),
        }
        for name in extra:
            cols[name] = t[name]
        return pa.table(cols, schema=out_schema)

    return ds.map_batches(final, batch_format="pyarrow")


def cluster_balanced_sample(
    ds: Dataset,
    per_cluster: int,
    k: int = 8,
    n_iter: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Cluster-balanced curation sample: run ``kmeans_assign`` and keep
    the ``per_cluster`` rows of each cluster with the smallest
    multiplicative id hash — the embedding-space diversity sampler
    (uniform within each k-means cell) behind cluster-balanced data
    selection (SemDeDup-family curation, Abbas et al. 2023 §2; same
    RNG-free bottom-k idiom as curation.hash_sample, here partitioned
    by the learned cluster). Ties (hash collisions) break by id, so
    the selection is total and engine-independent.

    Scale shape: assignments stream out of kmeans_assign; a per-block
    per-cluster bottom-k prune caps what leaves each block at
    k * per_cluster rows, and the global head runs cluster-aligned on
    that candidate set (grouped_apply with a 2-way shuffle — the
    candidate volume is blocks * k * per_cluster, never corpus-sized).
    Output: (id, cluster, kept ordered by hash) — the sample only.
    """
    import polars as pl

    from textalyzer_ray.pipelines.curation import _KNUTH, _M32
    from textalyzer_ray.stages.groups import grouped_apply

    out_schema = pa.schema(
        [pa.field(id_col, pa.int64()), pa.field("cluster", pa.int64())]
    )
    assign = kmeans_assign(
        ds, k=k, n_iter=n_iter, id_col=id_col, emb_col=emb_col
    )

    def with_hash(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids & (_M32 - 1)) * _KNUTH) & (_M32 - 1)
        return t.append_column("_h", pa.array(h.astype(np.int64)))

    def local_head(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(with_hash(t))
            .sort(["_h", id_col])
            .group_by("cluster", maintain_order=True)
            .head(per_cluster)
            .select([id_col, "cluster", "_h"])
            .to_arrow()
            .cast(
                pa.schema(
                    list(out_schema) + [pa.field("_h", pa.int64())]
                )
            )
        )

    def global_head(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .sort(["_h", id_col])
            .group_by("cluster", maintain_order=True)
            .head(per_cluster)
            .select(list(out_schema.names))
            .to_arrow()
            .cast(out_schema)
        )

    cands = assign.map_batches(local_head, batch_format="pyarrow")
    return grouped_apply(cands, ["cluster"], global_head, num_partitions=2)


def pq_codes(
    ds: Dataset,
    n_subspaces: int = 4,
    k: int = 8,
    n_iter: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    small_threshold: int = 1_000_000,
) -> Dataset:
    """Product-quantization codebook training + encoding (Jégou,
    Douze & Schmid 2011): split the embedding into ``n_subspaces``
    contiguous sub-vectors, train an independent deterministic Lloyd
    codebook per subspace (same init / update / tie rules as
    ``kmeans_assign``, so the measured float-parity story carries
    over), and emit each vector's code word per subspace ->
    (vec_id, code_0..code_{m-1}) sorted by vec_id. PQ is the
    compression layer a billion-vector ANN index stores instead of
    raw floats (k^m cells from m tiny codebooks).

    Scale shape: ONE fused streaming pass per Lloyd round computes
    the per-block partials of ALL subspaces at once (cluster sums as
    float64 blobs; the driver reduce is O(blocks * m * k * subdim) —
    never data-sized), and one final pass emits every code column, so
    the full encode costs n_iter + 1 data passes regardless of m — not
    m separate k-means jobs. Measured-small one-task path below
    ``small_threshold`` vectors (cross-path equality pytest-pinned)."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = ds.select_columns([id_col, emb_col])
    first = ds.take(1)
    if not first:
        return rd.from_arrow(
            pa.schema(
                [pa.field(id_col, pa.int64())]
                + [
                    pa.field(f"code_{j}", pa.int64())
                    for j in range(n_subspaces)
                ]
            ).empty_table()
        )
    dim = len(first[0][emb_col])
    bounds = [dim * j // n_subspaces for j in range(n_subspaces + 1)]
    if any(bounds[j + 1] - bounds[j] < 1 for j in range(n_subspaces)):
        raise ValueError("n_subspaces exceeds embedding dim")

    # init: the k smallest ids' sub-vectors (the kmeans_assign rule)
    def local_head(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False)
        take = np.argpartition(ids, k - 1)[:k]
        return t.take(pa.array(np.sort(take)))

    cand = pa.concat_tables(
        ds.map_batches(
            local_head, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    ids = cand[id_col].to_numpy(zero_copy_only=False)
    take = np.argsort(ids, kind="stable")[:k]
    init_full = _stack_embeddings(cand.take(pa.array(take)), emb_col)
    if init_full.shape[0] < k:
        raise ValueError(f"pq_codes: fewer than k={k} input rows")
    cents = [
        init_full[:, bounds[j] : bounds[j + 1]].copy()
        for j in range(n_subspaces)
    ]

    def _assign(m: np.ndarray, c: np.ndarray) -> np.ndarray:
        d2 = (
            (m * m).sum(axis=1)[:, None]
            - 2.0 * (m @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        return np.argmin(d2, axis=1)

    out_schema = pa.schema(
        [pa.field(id_col, pa.int64())]
        + [pa.field(f"code_{j}", pa.int64()) for j in range(n_subspaces)]
    )

    def _lloyd_step(m_full: np.ndarray, cs: list[np.ndarray]):
        """One local Lloyd update over a full matrix (small path)."""
        new = []
        for j, c in enumerate(cs):
            sub = m_full[:, bounds[j] : bounds[j + 1]]
            a = _assign(sub, c)
            nc = c.copy()
            for q in range(k):
                sel = sub[a == q]
                if len(sel):
                    nc[q] = sel.sum(axis=0) / len(sel)
            new.append(nc)
        return new

    if ds.count() <= small_threshold:
        @ray.remote
        def pq_local(c0: list, *blocks: pa.Table) -> pa.Table:
            t = pa.concat_tables(blocks)
            m_full = _stack_embeddings(t, emb_col)
            cs = [c.copy() for c in c0]
            for _ in range(n_iter):
                cs = _lloyd_step(m_full, cs)
            cols = {"__id": t[id_col]}
            for j, c in enumerate(cs):
                sub = m_full[:, bounds[j] : bounds[j + 1]]
                cols[f"code_{j}"] = pa.array(
                    _assign(sub, c).astype(np.int64)
                )
            out = pa.table(
                {
                    id_col: pc.cast(cols["__id"], pa.int64()),
                    **{
                        f"code_{j}": cols[f"code_{j}"]
                        for j in range(n_subspaces)
                    },
                },
                schema=out_schema,
            )
            return out

        return rd.from_arrow_refs(
            [pq_local.remote(cents, *ds.to_arrow_refs())]
        ).sort(id_col)

    partial_schema = pa.schema(
        [
            pa.field("sub", pa.int64()),
            pa.field("cluster", pa.int64()),
            pa.field("count", pa.int64()),
            pa.field("sumvec", pa.binary()),
        ]
    )
    for _ in range(n_iter):
        cref = ray.put(cents)

        def partial(t: pa.Table, _cref=cref) -> pa.Table:
            cs = ray.get(_cref)
            m_full = _stack_embeddings(t, emb_col)
            if m_full.size == 0:
                return partial_schema.empty_table()
            rows = {"sub": [], "cluster": [], "count": [], "sumvec": []}
            for j, c in enumerate(cs):
                sub = m_full[:, bounds[j] : bounds[j + 1]]
                a = _assign(sub, c)
                for q in np.unique(a):
                    sel = sub[a == q]
                    rows["sub"].append(j)
                    rows["cluster"].append(int(q))
                    rows["count"].append(int(sel.shape[0]))
                    rows["sumvec"].append(sel.sum(axis=0).tobytes())
            return pa.table(rows, schema=partial_schema)

        sums = [np.zeros_like(c) for c in cents]
        counts = [np.zeros(k, dtype=np.int64) for _ in cents]
        for b in ds.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            for j, q, n, blob in zip(
                b["sub"].to_pylist(),
                b["cluster"].to_pylist(),
                b["count"].to_pylist(),
                b["sumvec"].to_pylist(),
            ):
                sums[j][q] += np.frombuffer(blob, dtype=np.float64)
                counts[j][q] += n
        cents = [
            np.where(
                (counts[j] > 0)[:, None],
                sums[j] / np.maximum(counts[j], 1)[:, None],
                cents[j],
            )
            for j in range(n_subspaces)
        ]

    cref = ray.put(cents)

    def encode(t: pa.Table, _cref=cref) -> pa.Table:
        cs = ray.get(_cref)
        m_full = _stack_embeddings(t, emb_col)
        if m_full.size == 0:
            return out_schema.empty_table()
        cols = {id_col: pc.cast(t[id_col], pa.int64())}
        for j, c in enumerate(cs):
            sub = m_full[:, bounds[j] : bounds[j + 1]]
            cols[f"code_{j}"] = pa.array(_assign(sub, c).astype(np.int64))
        return pa.table(cols, schema=out_schema)

    return ds.map_batches(encode, batch_format="pyarrow").sort(id_col)
