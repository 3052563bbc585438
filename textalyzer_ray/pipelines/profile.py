"""Distributed table profiler: per-column row/null/distinct counts and
typed min/max, the metadata pass a 100 TB ingest runs before anything
else (schema sanity, null audits, join-key cardinality estimates).

Scale shape:
- n / n_null / min / max are PER-BLOCK partials (pyarrow compute, no
  shuffle) merged on the driver — the partial set is bounded by
  blocks x columns, never by rows. min/max ride the partials as
  strings but the driver re-types them per column dtype before
  comparing ("10" < "9" as strings), so integer columns merge
  numerically; the final report renders them as VARCHAR to keep one
  schema across column types (CAST parity with SQL is exact for
  integers and identity for strings — UTF-8 byte order == codepoint
  order on both engines).
- n_distinct is the one genuinely wide statistic: rows explode to
  (col, value-as-string) pairs, pre-DISTINCTed per block, then ONE
  (col, value)-aligned exchange counts survivors per column (each
  partition reports (col, partial_count); the driver sums a
  partitions x columns table). CAST to VARCHAR is injective for the
  supported types (integers, strings), so the distinct count equals
  SQL's count(DISTINCT col). NULLs are excluded, matching SQL.

Supported column types: integers and strings (the documents tables).
Floats/timestamps are refused loudly — their VARCHAR rendering is
engine-specific, which would poison both the distinct count and the
min/max parity.

Reference analogue: none; §2.9 extension surface.
"""

from __future__ import annotations

import logging

import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.types as pat
from ray.data import Dataset

logger = logging.getLogger(__name__)

_OUT_SCHEMA = pa.schema(
    [
        pa.field("col", pa.string()),
        pa.field("n", pa.int64()),
        pa.field("n_null", pa.int64()),
        pa.field("n_distinct", pa.int64()),
        pa.field("min_v", pa.string()),
        pa.field("max_v", pa.string()),
    ]
)

_PARTIAL_SCHEMA = pa.schema(
    [
        pa.field("col", pa.string()),
        pa.field("n", pa.int64()),
        pa.field("n_null", pa.int64()),
        pa.field("min_v", pa.string()),
        pa.field("max_v", pa.string()),
    ]
)


def _check_types(schema: pa.Schema, columns: list[str]) -> dict[str, bool]:
    """column -> is_integer; raises on unsupported types."""
    is_int = {}
    for c in columns:
        t = schema.field(c).type
        if pat.is_integer(t):
            is_int[c] = True
        elif pat.is_string(t) or pat.is_large_string(t):
            is_int[c] = False
        else:
            raise ValueError(
                f"profile_table supports integer/string columns only; "
                f"{c} is {t} (float/timestamp VARCHAR rendering is "
                "engine-specific — see module docstring)"
            )
    return is_int


def _partials_block(t: pa.Table, columns: list[str]) -> pa.Table:
    if t.num_rows == 0:
        return _PARTIAL_SCHEMA.empty_table()
    rows = {k: [] for k in ("col", "n", "n_null", "min_v", "max_v")}
    for c in columns:
        arr = t[c]
        mm = pc.min_max(arr)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        rows["col"].append(c)
        rows["n"].append(t.num_rows)
        rows["n_null"].append(arr.null_count)
        rows["min_v"].append(None if mn is None else str(mn))
        rows["max_v"].append(None if mx is None else str(mx))
    return pa.table(rows, schema=_PARTIAL_SCHEMA)


def _distinct_pairs_block(t: pa.Table, columns: list[str]) -> pa.Table:
    schema = pa.schema(
        [pa.field("col", pa.string()), pa.field("val", pa.string())]
    )
    if t.num_rows == 0:
        return schema.empty_table()
    parts = []
    for c in columns:
        vals = pc.drop_null(
            pc.cast(t[c].combine_chunks(), pa.string())
        ).unique()
        parts.append(
            pa.table(
                {
                    "col": pa.array([c] * len(vals), pa.string()),
                    "val": vals.cast(pa.string()),
                },
                schema=schema,
            )
        )
    return pa.concat_tables(parts) if parts else schema.empty_table()


def profile_table(ds: Dataset, columns: list[str] | None = None) -> Dataset:
    """(col, n, n_null, n_distinct, min_v, max_v) per profiled column,
    ordered by col — equal to the SQL UNION-ALL-per-column aggregate
    (module docstring)."""
    import ray.data as rd

    from textalyzer_ray.sources.tables import cluster_cpus
    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    schema = ds.schema()
    if schema is None:
        return rd.from_arrow(_OUT_SCHEMA.empty_table())
    base = schema.base_schema
    cols = list(columns) if columns is not None else list(base.names)
    is_int = _check_types(base, cols)
    ds = ds.select_columns(cols)

    # narrow pass: per-block partials, driver merge (blocks x cols)
    partial_rows = ds.map_batches(
        lambda t: _partials_block(t, cols),
        batch_format="pyarrow",
        batch_size=None,
    ).take_all()
    agg: dict[str, dict] = {
        c: {"n": 0, "n_null": 0, "min": None, "max": None} for c in cols
    }
    for r in partial_rows:
        a = agg[r["col"]]
        a["n"] += r["n"]
        a["n_null"] += r["n_null"]
        for key, better in (("min", min), ("max", max)):
            v = r[f"{key}_v"]
            if v is None:
                continue
            tv = int(v) if is_int[r["col"]] else v
            a[key] = tv if a[key] is None else better(a[key], tv)

    # wide pass: one (col, value)-aligned exchange for exact distincts
    pairs = ds.map_batches(
        lambda t: _distinct_pairs_block(t, cols),
        batch_format="pyarrow",
    ).materialize()
    n_pairs = pairs.count()
    counts: dict[str, int] = {c: 0 for c in cols}
    if n_pairs:

        def count_block(t: pa.Table) -> pa.Table:
            out_schema = pa.schema(
                [pa.field("col", pa.string()), pa.field("cnt", pa.int64())]
            )
            if t.num_rows == 0:
                return out_schema.empty_table()
            g = (
                pl.from_arrow(t)
                .unique(["col", "val"])
                .group_by("col")
                .len()
                .rename({"len": "cnt"})
                .cast({"cnt": pl.Int64})
                .select(["col", "cnt"])
            )
            return g.to_arrow().cast(out_schema)

        for r in grouped_apply(
            pairs,
            ["col", "val"],
            count_block,
            num_partitions=min(
                max(cluster_cpus(), 2), partitions_for(n_pairs, 2_000_000)
            ),
        ).take_all():
            counts[r["col"]] += r["cnt"]

    out = {
        "col": [],
        "n": [],
        "n_null": [],
        "n_distinct": [],
        "min_v": [],
        "max_v": [],
    }
    for c in sorted(cols):
        a = agg[c]
        out["col"].append(c)
        out["n"].append(a["n"])
        out["n_null"].append(a["n_null"])
        out["n_distinct"].append(counts[c])
        out["min_v"].append(None if a["min"] is None else str(a["min"]))
        out["max_v"].append(None if a["max"] is None else str(a["max"]))
    return rd.from_arrow(pa.table(out, schema=_OUT_SCHEMA))
