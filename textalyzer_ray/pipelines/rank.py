"""Global ranking operators: distributed total-order rank, exact
NTILE bucketing, and reciprocal-rank fusion (RRF).

A corpus-scale curation loop constantly needs "where does this row sit
in the GLOBAL order" — quality-score deciles to cut the bottom 10%,
rank features for mixture weighting, fused rankings from several
retrieval signals. Ray Data has the sort but not the rank; this module
adds it with the repo's distributed prefix-scan pattern
(pipelines/layout.py `zorder_layout`, token_shards): ONE global sort by
(keys..., id) — the same exchange any ranking pays — then one scalar
(head-key, count) per block to the driver, exclusive offsets broadcast
back, rank = offset + arange inside each block. Nothing corpus-sized
ever touches the driver.

Cross-engine exactness:

- ``global_rank`` / ``score_deciles``: rank and tile are pure integers;
  the tile formula is the SQL-standard NTILE bucket rule (first
  ``n % k`` buckets get ``n//k + 1`` rows), pinned against DuckDB in
  tests.
- ``rrf_fusion``: score = sum over lists of 1/(k + rank+1). Each term
  is one exactly-rounded IEEE division; with two lists the sum is a
  single addition (commutative, so any engine summing the same two
  doubles agrees bit-for-bit). With >2 lists the accumulation order is
  fixed (list order) but SQL SUM order is engine-chosen — certify a
  margin before hash-gating >2 lists.

RRF reference: Cormack, Clarke & Buettcher, SIGIR 2009 (k=60).
"""

from __future__ import annotations

from functools import cmp_to_key

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _ranked(
    ds: Dataset,
    sort_cols: list[str],
    descending: list[bool],
    id_col: str,
    keep_cols: list[str],
):
    """Sort ``ds`` by (sort_cols..., id_col ASC) and attach a 0-based
    global ``rank`` column. Returns (dataset, total_rows). ``id_col``
    values must be unique (the tie-break that makes the order total and
    each block's head key distinct)."""
    import ray

    keys = list(sort_cols) + [id_col]
    flags = list(descending) + [False]
    out_schema = pa.schema(
        [pa.field(id_col, pa.int64())]
        + [pa.field(c, pa.int64()) for c in keep_cols]
        + [pa.field("rank", pa.int64())]
    )

    srt = (
        ds.select_columns(list(dict.fromkeys([id_col] + keep_cols + sort_cols)))
        .sort(keys, descending=flags)
        .materialize()
    )

    def block_head(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    **{f"k{i}": pa.array([], t.schema.field(c).type)
                       for i, c in enumerate(keys)},
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                **{f"k{i}": t[c].slice(0, 1) for i, c in enumerate(keys)},
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    heads = srt.map_batches(
        block_head, batch_format="pyarrow", batch_size=None
    ).take_all()

    def _cmp(a, b):
        for i, desc in enumerate(flags):
            v1, v2 = a[f"k{i}"], b[f"k{i}"]
            if v1 == v2:
                continue
            lt = v1 < v2
            if desc:
                return 1 if lt else -1
            return -1 if lt else 1
        return 0

    heads.sort(key=cmp_to_key(_cmp))
    total = sum(r["n"] for r in heads)
    if total == 0:
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table()), 0
    offsets = {}
    run = 0
    for r in heads:
        hk = tuple(r[f"k{i}"] for i in range(len(keys)))
        if hk in offsets:
            raise ValueError(
                f"global_rank requires unique {id_col!r} values: "
                f"duplicate block head key {hk}"
            )
        offsets[hk] = run
        run += r["n"]
    oref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        from textalyzer_ray.stages.groups import _worker_object_cache

        cache = _worker_object_cache()
        offs = cache.get(oref.hex())
        if offs is None:
            offs = cache[oref.hex()] = ray.get(oref)
        hk = tuple(t[c][0].as_py() for c in keys)
        base = offs[hk]
        rank = base + np.arange(t.num_rows, dtype=np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                **{c: t[c] for c in keep_cols},
                "rank": pa.array(rank),
            },
            schema=out_schema,
        )

    ranked = srt.map_batches(assign, batch_format="pyarrow", batch_size=None)
    return ranked, total


def global_rank(
    ds: Dataset,
    sort_cols: list[str],
    descending: list[bool] | None = None,
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> Dataset:
    """0-based global rank of every row under the total order
    (sort_cols with the given direction flags, id_col ASC tie-break).
    Output: (id_col, keep_cols..., rank), in total order."""
    if descending is None:
        descending = [False] * len(sort_cols)
    ranked, _ = _ranked(ds, sort_cols, descending, id_col, keep_cols or [])
    return ranked


def ntile_of_rank(rank: np.ndarray, total: int, n_tiles: int) -> np.ndarray:
    """SQL-standard NTILE bucket (1-based) for 0-based global ranks:
    with q, r = divmod(total, n_tiles), the first r buckets hold q+1
    rows. Pinned against DuckDB ntile() in tests."""
    q, r = divmod(total, n_tiles)
    cut = r * (q + 1)
    small = np.maximum(q, 1)  # guard q == 0 (total < n_tiles)
    return np.where(
        rank < cut, rank // (q + 1), r + (rank - cut) // small
    ).astype(np.int64) + 1


def score_deciles(
    ds: Dataset,
    value_col: str,
    id_col: str = "doc_id",
    n_tiles: int = 10,
    descending: bool = True,
) -> Dataset:
    """Exact global NTILE over a value column — the "cut the bottom
    decile" curation step, distributed: one sort + the prefix scan,
    then the tile is per-row arithmetic. Output (id_col, value_col,
    rank, tile) sorted by id_col."""
    ranked, total = _ranked(
        ds, [value_col], [descending], id_col, [value_col]
    )

    def tile(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    value_col: pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "tile": pa.array([], pa.int64()),
                }
            )
        rank = t["rank"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "tile", pa.array(ntile_of_rank(rank, total, n_tiles))
        )

    return ranked.map_batches(tile, batch_format="pyarrow").sort(id_col)


def rrf_fusion(
    rankings: list[Dataset],
    depth: int = 200,
    k: int = 60,
    topn: int = 100,
    id_col: str = "doc_id",
) -> Dataset:
    """Reciprocal-rank fusion of depth-bounded rank lists (Cormack et
    al. 2009): each input is a (id_col, rank) dataset (0-based ranks,
    e.g. from ``global_rank``); only rows with rank < depth contribute
    1/(k + rank + 1). Output: top ``topn`` by (rrf DESC, id ASC) as
    (id_col, rrf, n_lists).

    The fused candidate set is <= len(rankings) * depth rows BY
    DEFINITION (RRF is specified over truncated lists), so collecting
    it on the driver is bounded regardless of corpus size — the
    depth filter runs distributed; only the truncated lists move."""
    import pyarrow.compute as pc

    contribs: dict[int, list[int]] = {}
    for ranking in rankings:
        rows = ranking.filter(
            lambda r, d=depth: r["rank"] < d
        ).take_all()
        for r in rows:
            contribs.setdefault(r[id_col], []).append(r["rank"])
    ids = sorted(contribs)
    rrf = [
        sum(1.0 / (k + rk + 1) for rk in contribs[i]) for i in ids
    ]
    n_lists = [len(contribs[i]) for i in ids]
    t = pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "rrf": pa.array(rrf, pa.float64()),
            "n_lists": pa.array([int(n) for n in n_lists], pa.int64()),
        }
    )
    order = pc.sort_indices(
        t, sort_keys=[("rrf", "descending"), (id_col, "ascending")]
    )
    import ray.data as rd

    return rd.from_arrow(t.take(order.slice(0, min(topn, t.num_rows))))
