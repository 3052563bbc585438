"""Local emulation of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at the given sf and, where
an ``oracle_sql()`` entry exists, compares with DuckDB the way the
driver does: row count, schema (column names), order-insensitive value
hash (columns sorted by name, rows sorted, values stringified).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("float"):
            h.update(col.round(9).to_json().encode())
        else:
            h.update(col.astype(str).to_json().encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as contract

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = contract.queries()
    oracles = contract.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(res)} rows, cols={list(res.columns)} ({dt:.1f}s)")
            continue
        ora = con.sql(oracles[name]).df()
        a, b = canonical(res), canonical(ora)
        problems = []
        if len(a) != len(b):
            problems.append(f"rowcount {len(a)} != {len(b)}")
        if list(a.columns) != list(b.columns):
            problems.append(f"schema {list(a.columns)} != {list(b.columns)}")
        elif any(
            a[c].dtype != b[c].dtype
            and (
                pd.api.types.is_integer_dtype(a[c].dtype)
                or pd.api.types.is_integer_dtype(b[c].dtype)
            )
            for c in a.columns
        ):
            # Integer width/type must match the oracle exactly (the
            # driver gate requires BIGINT everywhere — CLAUDE.md); the
            # astype(str) hash below would mask e.g. int32 vs int64.
            # Non-integer repr differences (timestamp s vs us) stringify
            # identically, so only integer mismatches fail here.
            problems.append(
                "dtype " + str([f"{c}:{a[c].dtype}!={b[c].dtype}"
                                for c in a.columns if a[c].dtype != b[c].dtype])
            )
        elif len(a) == len(b) and value_hash(a) != value_hash(b):
            problems.append("value-hash mismatch")
            diff = (a.astype(str) != b.astype(str)).any(axis=1)
            idx = diff[diff].index[:3]
            for i in idx:
                problems.append(f"  row{i} ray={a.loc[i].to_dict()} sql={b.loc[i].to_dict()}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(a)} rows match ({dt:.1f}s)")
    ray.shutdown()
    print("---")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
