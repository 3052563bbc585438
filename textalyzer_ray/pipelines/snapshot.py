"""Corpus snapshot diff — the crawl-ops "what changed between
ingests" report: per doc id, whether it was added, removed, changed
(same id, different content) or unchanged between two snapshots.

Scale shape: text never rides the shuffle — each side reduces in-batch
to (id, blake2b-128 content digest, side); ONE id-aligned union-tag
exchange co-locates both sides' digests and a per-block polars pass
assigns statuses. A 128-bit digest makes hash equality content
equality for any physically possible corpus (collision odds ~2^-128;
the SQL oracle compares the raw text, so a collision would surface as
a gate mismatch — none can occur in practice).
"""

from __future__ import annotations

import hashlib

import polars as pl
import pyarrow as pa
from ray.data import Dataset


def _digest_side(side: int, id_col: str, text_col: str):
    schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("h", pa.binary()),
            pa.field("side", pa.int8()),
        ]
    )

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        digests = [
            hashlib.blake2b(
                (s or "").encode("utf-8", "surrogatepass"), digest_size=16
            ).digest()
            for s in t[text_col].to_pylist()
        ]
        return pa.table(
            {
                id_col: t[id_col],
                "h": pa.array(digests, pa.binary()),
                "side": pa.array([side] * t.num_rows, pa.int8()),
            },
            schema=schema,
        )

    return fn


def snapshot_diff(
    ds_a: Dataset,
    ds_b: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """(id_col, status) per id present in either snapshot: 'removed'
    (only in A), 'added' (only in B), 'changed' / 'unchanged' (both).
    Each id must be unique within its snapshot. Sorted by id."""
    from textalyzer_ray.stages.groups import grouped_apply

    out_schema = pa.schema(
        [pa.field(id_col, pa.int64()), pa.field("status", pa.string())]
    )

    both = ds_a.select_columns([id_col, text_col]).map_batches(
        _digest_side(0, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).union(
        ds_b.select_columns([id_col, text_col]).map_batches(
            _digest_side(1, id_col, text_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    def diff_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t)
        a = df.filter(pl.col("side") == 0).select(
            [id_col, pl.col("h").alias("ha")]
        )
        b = df.filter(pl.col("side") == 1).select(
            [id_col, pl.col("h").alias("hb")]
        )
        j = a.join(b, on=id_col, how="full", coalesce=True)
        out = j.select(
            pl.col(id_col),
            pl.when(pl.col("ha").is_null())
            .then(pl.lit("added"))
            .when(pl.col("hb").is_null())
            .then(pl.lit("removed"))
            .when(pl.col("ha") == pl.col("hb"))
            .then(pl.lit("unchanged"))
            .otherwise(pl.lit("changed"))
            .alias("status"),
        )
        return out.to_arrow().cast(out_schema)

    return grouped_apply(both, [id_col], diff_block).sort(id_col)
