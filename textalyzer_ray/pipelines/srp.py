"""Signed-random-projection LSH over an embedding column — the
bucketed scale path for embedding near-duplicate detection (the exact
counterpart lives in pipelines/similarity.py's triangle-partitioned
all-pairs kernels; pipelines/dedup.py holds the text-shingle LSH
family).

Public algorithm: Charikar's sign-random-projection (hyperplane) LSH
("Similarity estimation techniques from rounding algorithms", STOC
2002): bit b of a vector's signature is the sign of its projection on
hyperplane b, P(bit match) = 1 - angle/pi, so banded signatures bucket
high-cosine pairs with probability that rises steeply with similarity
while random pairs collide at ~2^-band_bits per band.

Determinism / oracle: hyperplane b's weight for dimension j is +1 when
bit b of ``hll_hash64(str(j))`` is set, else -1 — the SQL-recomputable
hash chain (core/fingerprint), so a DuckDB oracle rebuilds the exact
sign matrix, every projection, every band bucket, every candidate
pair, and the cosine verification. Floats enter twice, both with
MEASURED margins pinned by tests (the CLAUDE.md float-parity
protocol): min |projection| over the corpus (>= 7.7e-7 measured at
every sf, vs a ~1e-13 cross-engine sum-order bound) and min
|cosine - threshold| over candidates (>= 5.9e-7, vs a measured
list_cosine_similarity-vs-numpy maxdiff).

Output: (id_a, id_b, n_bands) for candidate pairs (>= 1 shared band
bucket) whose exact cosine >= ``threshold`` — all-integer columns, so
the driver hash is exact. Recall vs the exact all-pairs join is the
LSH trade-off (measured ~0.14 at the deliberately-low 0.3 threshold,
~1 for near-dup-grade cosine >= 0.8); the OUTPUT itself is
deterministic and exactly SQL-replayable.

Scale shape: signatures are computed per batch with one BLAS matmul
against the 64x64 sign matrix (rebuilt per worker from 64 hash calls —
nothing broadcast); band rows are 24-byte (band, bucket, id) triples
through one key-aligned exchange; pairs collapse in a second exchange
sized to the measured candidate count; verification attaches float64
embedding blobs via two join-free union-tag lookups (list columns
never ride a shuffle — CLAUDE.md r2). A measured-small input runs the
whole chain in ONE remote task.

Reference analogue: none; §2.9 extension surface.
"""

from __future__ import annotations

import logging

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset

from textalyzer_ray.core.fingerprint import hll_hash64

logger = logging.getLogger(__name__)


def sign_matrix(dim: int, n_bits: int = 64) -> np.ndarray:
    """(n_bits, dim) float64 +-1 hyperplane matrix: entry (b, j) = +1
    iff bit b of hll_hash64(str(j)) is set. Deterministic, rebuilt
    anywhere in O(dim) hash calls."""
    h = np.array([hll_hash64(str(j)) for j in range(dim)], dtype=np.uint64)
    bits = (
        (h[None, :] >> np.arange(n_bits, dtype=np.uint64)[:, None])
        & np.uint64(1)
    ).astype(np.int64)
    return (2 * bits - 1).astype(np.float64)


def _band_rows(
    t: pa.Table,
    s_mat: np.ndarray,
    n_bands: int,
    band_bits: int,
    id_col: str,
    vec_col: str,
) -> pa.Table:
    schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("band", pa.int64()),
            pa.field("bucket", pa.int64()),
        ]
    )
    if t.num_rows == 0:
        return schema.empty_table()
    import pyarrow.compute as pc

    flat = pc.list_flatten(t[vec_col]).to_numpy(zero_copy_only=False)
    dim = s_mat.shape[1]
    x = flat.astype(np.float64).reshape(t.num_rows, dim)
    proj = x @ s_mat.T  # (rows, n_bits)
    sig = proj >= 0
    ids = t[id_col].to_numpy(zero_copy_only=False)
    weights = 1 << np.arange(band_bits, dtype=np.int64)
    buckets = np.einsum(
        "rkb,b->rk",
        sig.reshape(t.num_rows, n_bands, band_bits).astype(np.int64),
        weights,
    )
    return pa.table(
        {
            id_col: pa.array(np.repeat(ids, n_bands).astype(np.int64)),
            "band": pa.array(
                np.tile(np.arange(n_bands, dtype=np.int64), t.num_rows)
            ),
            "bucket": pa.array(buckets.reshape(-1)),
        },
        schema=schema,
    )


def _pairs_in_bucket_block(t: pa.Table, id_col: str) -> pa.Table:
    schema = pa.schema(
        [pa.field("id_a", pa.int64()), pa.field("id_b", pa.int64())]
    )
    if t.num_rows == 0:
        return schema.empty_table()
    df = pl.from_arrow(t)
    left = df.rename({id_col: "id_a"})
    right = df.rename({id_col: "id_b"})
    out = (
        left.join(right, on=["band", "bucket"], how="inner")
        .filter(pl.col("id_a") < pl.col("id_b"))
        .select(["id_a", "id_b"])
    )
    return out.to_arrow().cast(schema)


def _cosines(xa: np.ndarray, xb: np.ndarray) -> np.ndarray:
    dots = np.einsum("ij,ij->i", xa, xb)
    na2 = np.einsum("ij,ij->i", xa, xa)
    nb2 = np.einsum("ij,ij->i", xb, xb)
    return dots / np.sqrt(na2 * nb2)


def srp_candidate_pairs(
    ds: Dataset,
    threshold: float = 0.3,
    n_bands: int = 8,
    band_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    small_threshold: int = 100_000,
) -> Dataset:
    """(id_a, id_b, n_bands) — unordered candidate pairs sharing >= 1
    SRP band bucket whose exact float64 cosine >= ``threshold``;
    n_bands counts the shared buckets (module docstring). ``id_col``
    must be unique int64; vectors must share one dimension."""
    import ray
    import ray.data as rd

    from textalyzer_ray.pipelines.joins import union_tag_lookup
    from textalyzer_ray.sources.tables import cluster_cpus
    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    n_bits = n_bands * band_bits
    if n_bits > 64:
        raise ValueError("n_bands * band_bits must be <= 64")
    pair_schema = pa.schema(
        [
            pa.field("id_a", pa.int64()),
            pa.field("id_b", pa.int64()),
            pa.field("n_bands", pa.int64()),
        ]
    )

    sch = ds.schema()
    if sch is None:
        return rd.from_arrow(pair_schema.empty_table())
    dim_probe = ds.limit(1).take_all()
    if not dim_probe:
        return rd.from_arrow(pair_schema.empty_table())
    dim = len(dim_probe[0][vec_col])
    s_mat = sign_matrix(dim, n_bits)

    feat_schema = pa.schema(
        [pa.field(id_col, pa.int64()), pa.field("vec", pa.binary())]
    )

    def featurize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return feat_schema.empty_table()
        import pyarrow.compute as pc

        flat = pc.list_flatten(t[vec_col]).to_numpy(zero_copy_only=False)
        x = flat.astype(np.float64).reshape(t.num_rows, dim)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "vec": pa.array(
                    [x[i].tobytes() for i in range(t.num_rows)], pa.binary()
                ),
            },
            schema=feat_schema,
        )

    ds = ds.select_columns([id_col, vec_col]).materialize()
    n_vecs = ds.count()
    if n_vecs == 0:
        return rd.from_arrow(pair_schema.empty_table())

    def verify_table(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        xa = np.frombuffer(
            b"".join(t["va"].to_pylist()), np.float64
        ).reshape(t.num_rows, dim)
        xb = np.frombuffer(
            b"".join(t["vb"].to_pylist()), np.float64
        ).reshape(t.num_rows, dim)
        keep = _cosines(xa, xb) >= threshold
        return pa.table(
            {
                "id_a": t["id_a"].filter(pa.array(keep)),
                "id_b": t["id_b"].filter(pa.array(keep)),
                "n_bands": t["nb"].filter(pa.array(keep)),
            },
            schema=pair_schema,
        )

    if n_vecs <= small_threshold:
        logger.info("srp_candidate_pairs: one-task small path (%d)", n_vecs)

        @ray.remote
        def srp_task(*blocks: pa.Table) -> pa.Table:
            if not blocks:
                return pair_schema.empty_table()
            t = pa.concat_tables(
                [b.select([id_col, vec_col]) for b in blocks]
            )
            bands = _band_rows(
                t, s_mat, n_bands, band_bits, id_col, vec_col
            )
            raw = _pairs_in_bucket_block(bands, id_col)
            if raw.num_rows == 0:
                return pair_schema.empty_table()
            nb = (
                pl.from_arrow(raw)
                .group_by(["id_a", "id_b"])
                .len()
                .rename({"len": "nb"})
                .cast({"nb": pl.Int64})
            )
            f = featurize(t)
            v_by_id = dict(zip(f[id_col].to_pylist(), f["vec"].to_pylist()))
            cand = nb.to_arrow()
            withv = cand.append_column(
                "va",
                pa.array(
                    [v_by_id[i] for i in cand["id_a"].to_pylist()],
                    pa.binary(),
                ),
            ).append_column(
                "vb",
                pa.array(
                    [v_by_id[i] for i in cand["id_b"].to_pylist()],
                    pa.binary(),
                ),
            )
            return verify_table(withv)

        refs = ds.to_arrow_refs()
        return rd.from_arrow_refs([srp_task.remote(*refs)]).sort(
            ["id_a", "id_b"]
        )

    feats = ds.map_batches(featurize, batch_format="pyarrow").materialize()
    bands = ds.map_batches(
        lambda t: _band_rows(t, s_mat, n_bands, band_bits, id_col, vec_col),
        batch_format="pyarrow",
    ).materialize()
    n_band_rows = bands.count()
    raw_pairs = grouped_apply(
        bands,
        ["band", "bucket"],
        lambda t: _pairs_in_bucket_block(t, id_col),
        num_partitions=min(
            max(cluster_cpus(), 2), partitions_for(n_band_rows, 2_000_000)
        ),
    ).materialize()
    n_raw = raw_pairs.count()
    logger.info(
        "srp_candidate_pairs: %d band rows -> %d raw pair rows",
        n_band_rows,
        n_raw,
    )
    if n_raw == 0:
        return rd.from_arrow(pair_schema.empty_table())

    def nb_block(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("id_a", pa.int64()),
                pa.field("id_b", pa.int64()),
                pa.field("nb", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by(["id_a", "id_b"])
            .len()
            .rename({"len": "nb"})
            .cast({"nb": pl.Int64})
            .select(["id_a", "id_b", "nb"])
            .to_arrow()
            .cast(schema)
        )

    cand = grouped_apply(
        raw_pairs,
        ["id_a", "id_b"],
        nb_block,
        num_partitions=min(
            max(cluster_cpus(), 2), partitions_for(n_raw, 2_000_000)
        ),
    )
    n_parts = max(2, min(cluster_cpus() // 2, n_raw // 10_000 + 1))
    j = cand
    for side, out_col in (("id_a", "va"), ("id_b", "vb")):
        j = union_tag_lookup(
            j,
            feats.map_batches(
                lambda t, s=side: pa.table({s: t[id_col], "blob": t["vec"]}),
                batch_format="pyarrow",
            ),
            key_col=side,
            value_col="blob",
            out_col=out_col,
            num_partitions=n_parts,
        )
    return j.map_batches(verify_table, batch_format="pyarrow").sort(
        ["id_a", "id_b"]
    )
