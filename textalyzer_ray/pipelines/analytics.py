"""Corpus analytics pipelines: rollups, top-k, windowed aggregates.

These generalize the reference's "collect + sort + render" outputs
(SURVEY.md §2.6: the reference prints everything; at corpus scale we add
sort+limit) and add the stream-shaped windowed aggregate over the
``events`` table (Ray Data has no event-time windows; a tumbling window
is a derived-key groupby — ray_guide "Streaming-shaped workloads").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from textalyzer_ray.stages.tokenize import doc_token_counts


def lang_rollup(ds_docs: Dataset) -> Dataset:
    """documents -> (lang, n_docs, total_chars, avg_chars) sorted by lang."""
    return (
        ds_docs.select_columns(["lang", "n_chars"])
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="total_chars"),
            Mean("n_chars", alias_name="avg_chars"),
        )
        .sort("lang")
    )


def source_rollup(ds_docs: Dataset) -> Dataset:
    """documents -> per-source doc counts + char extremes."""
    return (
        ds_docs.select_columns(["source", "n_chars"])
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
        )
        .sort("source")
    )


def top_k_longest(ds_docs: Dataset, k: int = 100) -> Dataset:
    """Sort + limit (deterministic tie-break on doc_id)."""
    return (
        ds_docs.select_columns(["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(k)
    )


def token_counts(ds_docs: Dataset) -> Dataset:
    """(doc_id, n_tokens) per document — vectorized Arrow kernel."""
    return ds_docs.map_batches(
        lambda t: doc_token_counts(t, "doc_id", "text"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def lexical_profile(ds_docs: Dataset) -> Dataset:
    """(doc_id, n_tokens, n_types, n_hapax, ttr) per document — the
    lexical-diversity signal an LM-data quality funnel scores on
    (machine-generated / template text has pathologically low
    type-token ratio; keyword-stuffed spam pathologically high hapax
    share). n_types = distinct tokens, n_hapax = tokens occurring once
    in THAT doc, ttr = n_types/n_tokens (0.0 for token-free docs).

    All of a doc's tokens sit in its own batch row, so the whole
    profile is one vectorized polars pass per block — nothing
    shuffles, the text column dies in the stage. ttr is one exact
    int/int double division (IEEE-identical in Python/polars and
    DuckDB, CLAUDE.md r2 rule), so it is value-hash safe raw."""
    import polars as pl

    from textalyzer_ray.stages.tokenize import exploded_tokens

    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("n_types", pa.int64()),
            pa.field("n_hapax", pa.int64()),
            pa.field("ttr", pa.float64()),
        ]
    )

    def prof(t: pa.Table) -> pa.Table:
        per = (
            pl.from_arrow(exploded_tokens(t, "doc_id", "text"))
            .group_by("doc_id", "word")
            .agg(pl.len().cast(pl.Int64).alias("c"))
        )
        agg = per.group_by("doc_id").agg(
            pl.col("c").sum().alias("n_tokens"),
            pl.len().cast(pl.Int64).alias("n_types"),
            (pl.col("c") == 1).sum().cast(pl.Int64).alias("n_hapax"),
        )
        base = pl.from_arrow(t.select(["doc_id"]))
        return (
            base.join(agg, on="doc_id", how="left", maintain_order="left")
            .with_columns(
                pl.col("n_tokens").fill_null(0),
                pl.col("n_types").fill_null(0),
                pl.col("n_hapax").fill_null(0),
            )
            .with_columns(
                pl.when(pl.col("n_tokens") > 0)
                .then(
                    pl.col("n_types").cast(pl.Float64)
                    / pl.col("n_tokens").cast(pl.Float64)
                )
                .otherwise(0.0)
                .alias("ttr")
            )
            .select("doc_id", "n_tokens", "n_types", "n_hapax", "ttr")
            .to_arrow()
            .cast(out_schema)
        )

    return ds_docs.select_columns(["doc_id", "text"]).map_batches(
        prof, batch_format="pyarrow", zero_copy_batch=True
    )


def events_tumbling_window(
    ds_events: Dataset, window_s: int = 3600
) -> Dataset:
    """events(ts, event_type, value) -> per (event_type, window_start)
    count + sum(value). Tumbling event-time window as a derived-key
    groupby: window_start = floor(epoch_us / window) * window."""
    win_us = window_s * 1_000_000

    def add_window(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())
        start = pc.multiply(pc.divide(epoch, win_us), win_us)  # int floor-div
        return t.append_column("window_start", pc.cast(start, pa.timestamp("us")))

    return (
        ds_events.select_columns(["ts", "event_type", "value"])
        .map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .sort(["event_type", "window_start"])
    )


def events_hopping_window(
    ds_events: Dataset, window_s: int = 3600, hop_s: int = 900
) -> Dataset:
    """events(ts, event_type, value) -> per (event_type, window_start)
    count + sum over OVERLAPPING (hopping/sliding) windows of
    ``window_s`` advancing by ``hop_s``. Each event explodes into
    window_s/hop_s derived keys (vectorized numpy repeat — the standard
    stream-processing window explode), then the same derived-key groupby
    as the tumbling window; no per-event state, scales like any groupby.
    """
    if window_s % hop_s != 0:
        raise ValueError("window_s must be a multiple of hop_s")
    win_us = window_s * 1_000_000
    hop_us = hop_s * 1_000_000
    k = window_s // hop_s

    def explode_windows(t: pa.Table) -> pa.Table:
        import numpy as np

        epoch = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        n = len(epoch)
        # last hop-aligned start <= ts, then k-1 earlier hops; keep
        # starts where ts < start + window (always true by construction)
        base = (epoch // hop_us) * hop_us
        offs = (np.arange(k, dtype=np.int64) * hop_us)[None, :]
        starts = (base[:, None] - offs).reshape(-1)
        idx = pa.array(np.repeat(np.arange(n), k))
        out = t.select(["event_type", "value"]).take(idx)
        return out.append_column(
            "window_start",
            pc.cast(pa.array(starts, pa.int64()), pa.timestamp("us")),
        )

    return (
        ds_events.select_columns(["ts", "event_type", "value"])
        .map_batches(explode_windows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .sort(["event_type", "window_start"])
    )


def user_sessionize(
    ds_events: Dataset, gap_s: int = 1800
) -> Dataset:
    """Session windows per user: events sorted by ts within each user;
    a gap > gap_s starts a new session. Returns per-session
    (user_id, session_id, n_events, start_ts, end_ts).

    Key-aligned + fully vectorized (VERDICT r1 #8): a user's rows land
    wholly in one block (grouped_apply hash partition), and the block
    kernel sessionizes EVERY user at once with polars window expressions
    — no per-group Python, no Ray per-group finalization (~0.1 ms/group
    matters at 10^9 users).
    """
    import polars as pl

    from textalyzer_ray.stages.groups import grouped_apply

    gap_us = gap_s * 1_000_000

    def sessions_block(t: pa.Table) -> pa.Table:
        ts_type = t.schema.field("ts").type
        out_schema = pa.schema(
            [
                pa.field("user_id", t.schema.field("user_id").type),
                pa.field("n_events", pa.int64()),
                pa.field("start_ts", ts_type),
                pa.field("end_ts", ts_type),
                pa.field("session_id", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .sort(["user_id", "ts"])
            .with_columns(
                (
                    pl.col("ts")
                    .cast(pl.Int64)
                    .diff()
                    .fill_null(gap_us + 1)
                    .over("user_id")
                    > gap_us
                )
                .cast(pl.Int64)
                .alias("_new")
            )
            .with_columns(pl.col("_new").cum_sum().over("user_id").alias("_sess"))
        )
        out = (
            df.group_by(["user_id", "_sess"])
            .agg(
                n_events=pl.len().cast(pl.Int64),
                start_ts=pl.col("ts").min(),
                end_ts=pl.col("ts").max(),
            )
            .with_columns((pl.col("_sess") - 1).cast(pl.Int64).alias("session_id"))
            .drop("_sess")
            .sort(["user_id", "session_id"])
        )
        return out.to_arrow().cast(out_schema)

    return grouped_apply(
        ds_events.select_columns(["user_id", "event_id", "ts"]),
        ["user_id"],
        sessions_block,
    )


def session_transitions(
    ds_events: Dataset, gap_s: int = 1800
) -> Dataset:
    """Markov transition counts over sessionized event streams: within
    each session (same gap rule as ``user_sessionize``, events ordered
    by (ts, event_id) within a user), every consecutive pair of events
    contributes one (from_type, to_type) edge. Returns
    (from_type, to_type, n_transitions BIGINT) sorted by the pair —
    the first-order behavior model sequence mining / next-event
    prediction pipelines train on.

    Shape: one user-aligned hash exchange (``grouped_apply``) so every
    user's events sit in one block; the block kernel sessionizes and
    shifts EVERY user at once in polars (no per-group Python) and
    emits per-block (from, to) partial counts — bounded by
    |event_type|^2 per block, never by event volume — which a tiny
    ``key_counts`` tree merge finishes. Skew note: a hot user inflates
    one block linearly (same exposure as sessionize/funnel); the edge
    keyspace itself cannot be hot because partials cap shuffle rows at
    blocks x |types|^2."""
    import polars as pl

    from textalyzer_ray.stages.groups import grouped_apply, key_counts

    gap_us = gap_s * 1_000_000
    out_schema = pa.schema(
        [
            pa.field("from_type", pa.string()),
            pa.field("to_type", pa.string()),
            pa.field("n", pa.int64()),
        ]
    )

    def transitions_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .sort(["user_id", "ts", "event_id"])
            .with_columns(
                (
                    pl.col("ts")
                    .cast(pl.Int64)
                    .diff()
                    .fill_null(gap_us + 1)
                    .over("user_id")
                    > gap_us
                )
                .cast(pl.Int64)
                .cum_sum()
                .over("user_id")
                .alias("_sess")
            )
            .with_columns(
                pl.col("event_type")
                .shift(-1)
                .over(["user_id", "_sess"])
                .alias("to_type")
            )
            .drop_nulls("to_type")
        )
        out = (
            df.group_by(["event_type", "to_type"])
            .agg(n=pl.len().cast(pl.Int64))
            .rename({"event_type": "from_type"})
            .select(["from_type", "to_type", "n"])
        )
        return out.to_arrow().cast(out_schema)

    partials = grouped_apply(
        ds_events.select_columns(["user_id", "event_id", "ts", "event_type"]),
        ["user_id"],
        transitions_block,
    )
    merged = key_counts(
        partials, ["from_type", "to_type"], sum_cols=["n"]
    ).map_batches(
        lambda t: pa.table(
            {
                "from_type": t["from_type"],
                "to_type": t["to_type"],
                "n_transitions": t["sum_n"],
            }
        ),
        batch_format="pyarrow",
    )
    return merged.sort(["from_type", "to_type"])


def props_rollup(
    ds_events: Dataset, bucket_width: int = 10
) -> Dataset:
    """Semi-structured extraction + rollup over the events stream's
    JSON ``props`` column (web payloads are JSON at the edge; parsing
    them INSIDE the batch kernel instead of a preprocessing job is the
    point): extract the integer field ``k``, then per
    (event_type, k_bucket = k // bucket_width) report
    ``n_events``, ``n_distinct_k`` and ``sum_k`` — all BIGINT.

    Shape: vectorized polars JSON-path extraction per batch; a
    per-block (event_type, k) distinct partial prunes event volume to
    at most types x |k| rows before the one small exchange; the bucket
    rollup then reads ``n_distinct_k`` for free as the deduped row
    count per bucket (each (type, k) appears exactly once after the
    merge). Rows whose props lack an integer ``k`` are excluded (both
    engines agree: NULL extraction drops)."""
    import polars as pl

    from textalyzer_ray.stages.groups import key_counts

    part_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("k", pa.int64()),
            pa.field("n", pa.int64()),
        ]
    )

    def extract_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        out = (
            pl.from_arrow(t.select(["event_type", "props"]))
            .with_columns(
                k=pl.col("props")
                .str.json_path_match("$.k")
                .cast(pl.Int64, strict=False)
            )
            .drop_nulls("k")
            .group_by(["event_type", "k"])
            .agg(n=pl.len().cast(pl.Int64))
            .select(["event_type", "k", "n"])
        )
        return out.to_arrow().cast(part_schema)

    per_k = key_counts(
        ds_events.select_columns(["event_type", "props"]).map_batches(
            extract_partial, batch_format="pyarrow"
        ),
        ["event_type", "k"],
        sum_cols=["n"],
    )
    out_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("k_bucket", pa.int64()),
            pa.field("n_events", pa.int64()),
            pa.field("n_distinct_k", pa.int64()),
            pa.field("sum_k", pa.int64()),
        ]
    )

    def bucket_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        # (event_type, k) rows are globally unique after the merge, so
        # len() per bucket IS the distinct-k count
        out = (
            pl.from_arrow(
                t.select(["event_type", "k", "sum_n"])
            )
            .with_columns(
                k_bucket=(pl.col("k") // bucket_width).cast(pl.Int64),
                kn=(pl.col("k") * pl.col("sum_n")).cast(pl.Int64),
            )
            .group_by(["event_type", "k_bucket"])
            .agg(
                n_events=pl.col("sum_n").sum().cast(pl.Int64),
                n_distinct_k=pl.len().cast(pl.Int64),
                sum_k=pl.col("kn").sum().cast(pl.Int64),
            )
            .select(
                [
                    "event_type",
                    "k_bucket",
                    "n_events",
                    "n_distinct_k",
                    "sum_k",
                ]
            )
        )
        return out.to_arrow().cast(out_schema)

    # the merged (type, k) table is small (types x |k| rows) but may
    # span blocks that SPLIT a bucket: finish with one more tiny
    # key-summed merge over the bucket partials
    parts = per_k.map_batches(bucket_partial, batch_format="pyarrow")
    merged = key_counts(
        parts,
        ["event_type", "k_bucket"],
        sum_cols=["n_events", "n_distinct_k", "sum_k"],
    ).map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "k_bucket": t["k_bucket"],
                "n_events": t["sum_n_events"],
                "n_distinct_k": t["sum_n_distinct_k"],
                "sum_k": t["sum_sum_k"],
            }
        ),
        batch_format="pyarrow",
    )
    return merged.sort(["event_type", "k_bucket"])


def cohort_retention(
    ds_events: Dataset, bucket_s: int = 86400
) -> Dataset:
    """Classic cohort-retention analysis over the events stream:
    cohort = the bucket (day by default) of each user's FIRST event;
    for every (cohort, offset) cell, the number of that cohort's users
    active ``offset`` buckets after their first one. Output
    (cohort_day, day_offset, n_users), all BIGINT, sorted.

    Shape: a per-batch distinct-(user, bucket) partial prunes the raw
    event volume to at most users x active-buckets rows BEFORE the one
    user-aligned hash exchange; the block kernel (each user wholly in
    one block) computes min-bucket + offsets for every user at once in
    polars; per-block (cohort, offset) counts are disjoint across
    blocks by user-alignment, so a tiny key_counts merge — bounded by
    cohorts x offsets, never by event rows — finishes."""
    import polars as pl

    from textalyzer_ray.stages.groups import grouped_apply, key_counts

    bucket_us = bucket_s * 1_000_000

    def distinct_partial(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        day = pc.divide(micros, bucket_us)  # int floor-div (ts >= epoch)
        return (
            pa.table({"user_id": t["user_id"], "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    uw = ds_events.select_columns(["user_id", "ts"]).map_batches(
        distinct_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    cell_schema = pa.schema(
        [
            pa.field("cohort_day", pa.int64()),
            pa.field("day_offset", pa.int64()),
            pa.field("n", pa.int64()),
        ]
    )

    def cells_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cell_schema.empty_table()
        return (
            pl.from_arrow(t)
            .unique()  # cross-batch duplicates of (user, day)
            .with_columns(pl.col("day").min().over("user_id").alias("cohort_day"))
            .with_columns((pl.col("day") - pl.col("cohort_day")).alias("day_offset"))
            .group_by(["cohort_day", "day_offset"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .select(["cohort_day", "day_offset", "n"])
            .to_arrow()
            .cast(cell_schema)
        )

    merged = key_counts(
        grouped_apply(uw, ["user_id"], cells_block),
        ["cohort_day", "day_offset"],
        sum_cols=["n"],
    )
    out_schema = pa.schema(
        [
            pa.field("cohort_day", pa.int64()),
            pa.field("day_offset", pa.int64()),
            pa.field("n_users", pa.int64()),
        ]
    )
    return merged.map_batches(
        lambda t: pa.table(
            {
                "cohort_day": t["cohort_day"],
                "day_offset": t["day_offset"],
                "n_users": t["sum_n"],
            },
            schema=out_schema,
        ),
        batch_format="pyarrow",
    ).sort(["cohort_day", "day_offset"])


def funnel_analysis(
    ds_events: Dataset,
    steps: tuple[str, ...] = ("signup", "view", "click", "purchase"),
    window_s: int = 86400,
) -> Dataset:
    """Ordered-funnel analysis (the product-analytics staple): per user,
    how many prefix steps of ``steps`` were completed, where step k
    counts only if an event of its type occurs STRICTLY after the
    chosen step-(k-1) event and within ``window_s`` of it, and each
    step greedily takes its EARLIEST qualifying event (the standard
    deterministic funnel semantics — greedy-earliest makes the answer
    unique). Output (stage, n_users): users whose completed-prefix
    length is exactly ``stage`` (0 = touched a funnel event type but
    never completed step 1). All BIGINT.

    Shape: filter to the funnel's event types at the read, one
    user-aligned hash exchange, then a per-block polars kernel runs the
    whole len(steps)-round min-filter chain for EVERY user in the block
    at once (no per-user Python); per-block (stage, count) partials are
    user-disjoint, so a |steps|+1-row key_counts merge finishes."""
    import polars as pl

    from textalyzer_ray.stages.groups import grouped_apply, key_counts

    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    win_us = window_s * 1_000_000
    step_list = list(steps)

    part_schema = pa.schema(
        [pa.field("stage", pa.int64()), pa.field("n", pa.int64())]
    )

    def stages_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        df = pl.from_arrow(t).with_columns(
            pl.col("ts").cast(pl.Int64).alias("us")
        )
        users = df.select("user_id").unique()
        cur = (
            df.filter(pl.col("event_type") == step_list[0])
            .group_by("user_id")
            .agg(pl.col("us").min().alias("t"))
        )
        marks = [cur.select("user_id")]
        for s in step_list[1:]:
            cur = (
                df.filter(pl.col("event_type") == s)
                .join(cur, on="user_id", how="inner")
                .filter(
                    (pl.col("us") > pl.col("t"))
                    & (pl.col("us") <= pl.col("t") + win_us)
                )
                .group_by("user_id")
                .agg(pl.col("us").min().alias("t"))
            )
            marks.append(cur.select("user_id"))
        # completions are prefix-contiguous, so stage = how many of the
        # per-step survivor sets contain the user
        stamped = pl.concat(marks).group_by("user_id").agg(
            pl.len().cast(pl.Int64).alias("stage")
        )
        return (
            users.join(stamped, on="user_id", how="left")
            .with_columns(pl.col("stage").fill_null(0))
            .group_by("stage")
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .select(["stage", "n"])
            .to_arrow()
            .cast(part_schema)
        )

    step_set = pa.array(step_list, pa.string())

    def keep_funnel_types(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"], value_set=step_set))

    ev = ds_events.select_columns(["user_id", "ts", "event_type"]).map_batches(
        keep_funnel_types, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = key_counts(
        grouped_apply(ev, ["user_id"], stages_block),
        ["stage"],
        sum_cols=["n"],
    )
    out_schema = pa.schema(
        [pa.field("stage", pa.int64()), pa.field("n_users", pa.int64())]
    )
    return merged.map_batches(
        lambda t: pa.table(
            {"stage": t["stage"], "n_users": t["sum_n"]}, schema=out_schema
        ),
        batch_format="pyarrow",
    ).sort("stage")


def column_quantiles(
    ds: Dataset, col: str, qs: list[float]
) -> "pa.Table":
    """EXACT quantiles of an integer column without a global sort:
    per-block value counts (a few hundred (value, count) rows per
    block), tree-merged into the full value histogram, then the rank
    walk is a driver-side cumulative sum over the distinct values —
    size bounded by the value domain, not the row count.

    Definition: quantile q = the value at 1-based rank ceil(q*n) of the
    sorted column (q=0 -> rank 1), matching the rank-arithmetic SQL
    oracle exactly — no interpolation, so integer-exact.

    Returns an in-memory Arrow table (q, value) — quantiles are a
    scalar summary, not a dataset. For unbounded/continuous domains use
    a t-digest-style sketch instead; this operator is for integer
    metrics (lengths, counts, sizes) whose distinct-value count is
    bounded."""
    import numpy as np

    from textalyzer_ray.stages.groups import key_counts

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t[col].combine_chunks())
        return pa.table(
            {
                col: vc.field("values"),
                "count": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    hist = key_counts(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [col],
        sum_cols=["count"],
    ).take_all()
    vals = np.array([r[col] for r in hist])
    cnts = np.array([r["sum_count"] for r in hist], dtype=np.int64)
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        import math

        # same double expression as the SQL oracle's ceil(q*n)
        rank = max(1, math.ceil(q * n))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(float(q))
        out_v.append(int(vals[idx]))
    return pa.table(
        {
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.int64()),
        }
    )


def compression_ratio(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text", level: int = 6
) -> Dataset:
    """(doc_id, n_bytes, n_compressed, ratio_bp): per-document zlib
    compression ratio — the classic cheap redundancy/quality signal
    (highly repetitive or templated text compresses far below prose;
    C4/Gopher-era pipelines threshold on it). Per-row zlib is inherent
    (no vectorized kernel exists), so this runs as plain task-pool
    batches; ratio_bp is integer basis points so the column stays
    BIGINT (floats only in rows-only queries — driver contract)."""
    import zlib

    def score(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        nb, nc = [], []
        for s in texts:
            b = (s or "").encode("utf-8")
            nb.append(len(b))
            nc.append(len(zlib.compress(b, level)))
        ratio = [
            (c * 10000) // b if b else 0 for b, c in zip(nb, nc)
        ]
        return pa.table(
            {
                id_col: t[id_col],
                "n_bytes": pa.array(nb, pa.int64()),
                "n_compressed": pa.array(nc, pa.int64()),
                "ratio_bp": pa.array(ratio, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort(id_col)


def skyline(
    ds: Dataset,
    max_col: str,
    min_col: str,
    id_col: str = "doc_id",
) -> Dataset:
    """Pareto skyline (preference query, VLDB-classic operator family):
    the rows not dominated by any other row under (maximize
    ``max_col``, minimize ``min_col``) — a dominates b iff a is >= on
    the max objective, <= on the min objective, and strictly better on
    at least one. Duplicate objective points are mutually undominated
    and all kept.

    Distributed via the skyline-of-skylines identity: a global skyline
    row survives its block's local skyline, so one vectorized local
    pass per block leaves only blocks x |front| candidate rows, and a
    single-block second pass finishes. Both passes run the same sorted
    prefix-min kernel (numpy) — no pairwise loop.
    """
    import numpy as np

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field(max_col, pa.int64()),
            pa.field(min_col, pa.int64()),
        ]
    )

    def local_skyline(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        mx = t[max_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mn = t[min_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        big = np.iinfo(np.int64).max
        # per distinct max-value: only rows at the group's min-col
        # minimum can survive, and the group survives iff that minimum
        # is STRICTLY below every strictly-larger max-value's minimum
        # (a suffix-min over ascending max values)
        vals, inv = np.unique(mx, return_inverse=True)
        gmin = np.full(len(vals), big)
        np.minimum.at(gmin, inv, mn)
        suffix = np.concatenate(
            [np.minimum.accumulate(gmin[::-1])[::-1][1:], [big]]
        )
        keep_val = gmin < suffix
        kept = keep_val[inv] & (mn == gmin[inv])
        return pa.table(
            {
                id_col: pa.array(ids[kept]),
                max_col: pa.array(mx[kept]),
                min_col: pa.array(mn[kept]),
            },
            schema=out_schema,
        )

    cands = ds.map_batches(local_skyline, batch_format="pyarrow").repartition(1)
    return cands.map_batches(local_skyline, batch_format="pyarrow")


def grouping_sets_rollup(
    ds: Dataset,
    cols: tuple[str, str] = ("lang", "source"),
    sum_col: str = "n_chars",
) -> Dataset:
    """GROUPING SETS in ONE input pass (the LMFAO batches-of-group-bys
    idea, VLDB 2020): every batch emits partial aggregates for ALL four
    groupings — (a, b), (a), (b), () — union-tagged with the SQL
    GROUPING() bitmask (bit set = column aggregated out, first column
    = MSB), and one keyed merge finishes. One corpus scan instead of
    four; aggregated-out string columns carry '' (disambiguated by the
    bitmask). Output: (gid, a, b, n_docs, sum_<col>).
    """
    import polars as pl

    from textalyzer_ray.stages.groups import key_counts

    a, b = cols
    out_schema = pa.schema(
        [
            pa.field("gid", pa.int64()),
            pa.field(a, pa.string()),
            pa.field(b, pa.string()),
            pa.field("n_docs", pa.int64()),
            pa.field(f"sum_{sum_col}", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([a, b, sum_col]))
        outs = []
        # SQL GROUPING(a, b) bitmask: LAST argument is the LSB, so
        # gid 1 = b aggregated out (grouping (a)), gid 2 = (b)
        for gid, keys in ((0, [a, b]), (1, [a]), (2, [b]), (3, [])):
            agg = (
                df.group_by(keys).agg(
                    pl.len().cast(pl.Int64).alias("n_docs"),
                    pl.col(sum_col).sum().cast(pl.Int64).alias(f"sum_{sum_col}"),
                )
                if keys
                else df.select(
                    pl.len().cast(pl.Int64).alias("n_docs"),
                    pl.col(sum_col).sum().cast(pl.Int64).alias(f"sum_{sum_col}"),
                )
            )
            agg = agg.with_columns(pl.lit(gid, dtype=pl.Int64).alias("gid"))
            for missing in (a, b):
                if missing not in keys:
                    agg = agg.with_columns(pl.lit("").alias(missing))
            outs.append(agg.select(out_schema.names))
        return pl.concat(outs).to_arrow().cast(out_schema)

    merged = key_counts(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["gid", a, b],
        sum_cols=["n_docs", f"sum_{sum_col}"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .select(
                pl.col("gid"),
                pl.col(a),
                pl.col(b),
                pl.col("sum_n_docs").alias("n_docs"),
                pl.col(f"sum_sum_{sum_col}").alias(f"sum_{sum_col}"),
            )
            .to_arrow()
            .cast(out_schema)
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def interval_counts(
    events: Dataset,
    intervals: list[tuple[int, int]],
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> Dataset:
    """Stream-frequency-over-intervals (the VLDB'18 problem shape):
    answer MANY interval-frequency queries from ONE scan. ``intervals``
    are half-open hour-aligned [start_hour, end_hour) pairs in epoch
    hours. One streaming pass builds per-batch (type, hour-bucket)
    partials; the merged bucket index — bounded by types x hours, never
    by event rows — is consulted dataset-side (each bucket row fans out
    to the intervals containing it), so the driver sees only the final
    |intervals| x |types| answer rows. Output:
    (interval_id, event_type, n), only non-empty cells, sorted upstream
    by the caller."""
    import numpy as np
    import polars as pl

    from textalyzer_ray.stages.groups import key_counts

    bounds = np.asarray(intervals, dtype=np.int64)

    bucket_schema = pa.schema(
        [
            pa.field(type_col, pa.string()),
            pa.field("bucket", pa.int64()),
            pa.field("n", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        micros = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return (
            pl.DataFrame(
                {
                    type_col: pl.from_arrow(
                        t[type_col].cast(pa.large_string())
                    ),
                    "bucket": micros // 3_600_000_000,
                }
            )
            .group_by([type_col, "bucket"])
            .len()
            .with_columns(pl.col("len").cast(pl.Int64).alias("n"))
            .select([type_col, "bucket", "n"])
            .to_arrow()
            .cast(bucket_schema)
        )

    index = key_counts(
        events.map_batches(partials, batch_format="pyarrow"),
        [type_col, "bucket"],
        sum_cols=["n"],
    )

    out_schema = pa.schema(
        [
            pa.field("interval_id", pa.int64()),
            pa.field(type_col, pa.string()),
            pa.field("n", pa.int64()),
        ]
    )

    def fan_out(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        n = t["sum_n"].to_numpy(zero_copy_only=False)
        types = pl.from_arrow(t[type_col].cast(pa.large_string()))
        # bucket x interval membership (K small by contract)
        hit = (b[:, None] >= bounds[None, :, 0]) & (
            b[:, None] < bounds[None, :, 1]
        )
        rows, cols = np.nonzero(hit)
        if len(rows) == 0:
            return out_schema.empty_table()
        return (
            pl.DataFrame(
                {
                    "interval_id": cols.astype(np.int64),
                    type_col: types.gather(rows),
                    "n": n[rows],
                }
            )
            .group_by(["interval_id", type_col])
            .agg(pl.col("n").sum().cast(pl.Int64))
            .to_arrow()
            .cast(out_schema)
        )

    return key_counts(
        index.map_batches(fan_out, batch_format="pyarrow"),
        ["interval_id", type_col],
        sum_cols=["n"],
    ).map_batches(
        lambda t: pa.table(
            {
                "interval_id": t["interval_id"],
                type_col: t[type_col],
                "n": t["sum_n"],
            },
            schema=out_schema,
        ),
        batch_format="pyarrow",
    )


def pivot_counts(
    events: Dataset,
    types: list[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
) -> Dataset:
    """Pivot the event stream to one WIDE row per key: (key_col,
    n_<type>...) with a BIGINT count column per entry of ``types``
    (the fixed, broadcast column list — a pivot with an unbounded
    type domain is a different operator). Types not in the list are
    ignored; keys appear iff they have at least one listed event.
    Sorted by key.

    Scale shape: one per-block polars partial (group by key,
    conditional sum per type — wide partials are key-bounded per
    block), then the standard partial-combine exchange (key_counts)
    over the wide columns. No row explosion, no per-type passes."""
    import polars as pl

    from textalyzer_ray.stages.groups import key_counts

    ncols = [f"n_{t}" for t in types]
    part_schema = pa.schema(
        [pa.field(key_col, pa.int64())]
        + [pa.field(c, pa.int64()) for c in ncols]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                key_col: pl.from_arrow(t[key_col].cast(pa.int64())),
                type_col: pl.from_arrow(
                    t[type_col].cast(pa.large_string())
                ),
            }
        )
        return (
            df.filter(pl.col(type_col).is_in(types))
            .group_by(key_col)
            .agg(
                [
                    (pl.col(type_col) == t)
                    .sum()
                    .cast(pl.Int64)
                    .alias(c)
                    for t, c in zip(types, ncols)
                ]
            )
            .to_arrow()
            .cast(part_schema)
        )

    wide = key_counts(
        events.select_columns([key_col, type_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        [key_col],
        sum_cols=ncols,
    )

    out_schema = part_schema

    def finish(t: pa.Table) -> pa.Table:
        cols = {key_col: t[key_col]}
        for c in ncols:
            cols[c] = t[f"sum_{c}"]
        return pa.table(cols, schema=out_schema)

    return wide.map_batches(finish, batch_format="pyarrow").sort(key_col)


def events_gapfill_rolling(
    ds_events: Dataset,
    window_s: int = 600,
    roll_w: int = 3,
    small_threshold: int = 4_000_000,
) -> Dataset:
    """Dense time-series resample with gap filling + rolling window:
    events(ts) -> one row per ``window_s`` bucket of the FULL observed
    range (missing buckets appear with n_events=0), plus the trailing
    ``roll_w``-bucket rolling event count — the `SUM OVER (ROWS BETWEEN
    w-1 PRECEDING AND CURRENT ROW)` window, computed WITHOUT a global
    sorted scan.

    Scale shape: a global windowed scan would serialize on one ordered
    pass; instead each bucket's count is REPLICATED to the ``roll_w``
    target buckets it contributes to (key-shift replication, the
    hopping-window trick applied to the aggregate side), unioned with
    zero rows for every grid bucket, and summed in ONE key-aligned
    exchange — rolling sums per bucket with no sort and no carried
    state. The dense grid is a ``ray.data.range`` over the measured
    [min, max] bucket span (metadata-cheap); grid cardinality is
    span-sized, not event-sized. Bucket ids are int64 floor-divided
    epoch-us on both engines (integer //, no float rounding).

    -> (hr:int64 bucket index, n_events:int64, rolling_n:int64),
    sorted by hr.
    """
    import numpy as np
    import polars as pl
    import ray.data as rd

    from textalyzer_ray.stages.groups import grouped_apply, key_counts

    win_us = window_s * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())
        return pa.table({"hr": pc.divide(epoch, win_us)})  # int floor-div

    counts = key_counts(
        ds_events.select_columns(["ts"]).map_batches(
            add_bucket, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["hr"],
    ).materialize()

    # global [min, max] bucket: per-block extrema + driver reduce over
    # one row per block (Dataset.min/max would plan a HashAggregate —
    # CLAUDE.md r2)
    def block_minmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        h = t["hr"]
        return pa.table({"lo": [pc.min(h).as_py()], "hi": [pc.max(h).as_py()]})

    mm = counts.map_batches(
        block_minmax, batch_format="pyarrow", batch_size=None
    ).take_all()
    if not mm:
        return rd.from_arrow(
            pa.schema(
                [
                    pa.field("hr", pa.int64()),
                    pa.field("n_events", pa.int64()),
                    pa.field("rolling_n", pa.int64()),
                ]
            ).empty_table()
        )
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    span = hi - lo + 1

    out_schema = pa.schema(
        [
            pa.field("hr", pa.int64()),
            pa.field("n_events", pa.int64()),
            pa.field("rolling_n", pa.int64()),
        ]
    )

    # measured-size switch: the grid/replicate/merge exchange replaces
    # a global sorted window scan, but at a small bucket span its hash
    # aggregator startup is pure fixed cost (CLAUDE.md) — one remote
    # numpy task over the (already aggregated) bucket-count block refs
    # is exact and shuffle-free. The event-volume scan above stays
    # distributed either way.
    if span <= small_threshold:
        import ray

        @ray.remote
        def gapfill_task(*blocks: pa.Table) -> pa.Table:
            dense = np.zeros(span, np.int64)
            for b in blocks:
                hrs = b["hr"].to_numpy(zero_copy_only=False)
                cnt = b["count"].to_numpy(zero_copy_only=False)
                dense[hrs - lo] += cnt
            roll = np.convolve(dense, np.ones(roll_w, np.int64), mode="full")[
                :span
            ]
            return pa.table(
                {
                    "hr": np.arange(lo, hi + 1, dtype=np.int64),
                    "n_events": dense,
                    "rolling_n": roll,
                },
                schema=out_schema,
            )

        return rd.from_arrow_refs(
            [gapfill_task.remote(*counts.to_arrow_refs())]
        )

    n_counts = counts.count()

    rep_schema = pa.schema(
        [
            pa.field("hr", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("own", pa.int64()),
        ]
    )

    def grid_zeros(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False) + lo
        z = np.zeros(len(ids), np.int64)
        return pa.table({"hr": ids, "n": z, "own": z + 1}, schema=rep_schema)

    def replicate(t: pa.Table) -> pa.Table:
        hr = t["hr"].to_numpy(zero_copy_only=False)
        n = t["count"].to_numpy(zero_copy_only=False)
        targets = (hr[:, None] + np.arange(roll_w, dtype=np.int64)).ravel()
        ns = np.repeat(n, roll_w)
        own = np.zeros(len(targets), np.int64)
        own[::roll_w] = 1  # j==0 replica carries the bucket's own count
        keep = targets <= hi
        return pa.table(
            {"hr": targets[keep], "n": ns[keep], "own": own[keep]},
            schema=rep_schema,
        )

    grid = rd.range(hi - lo + 1).map_batches(grid_zeros, batch_format="pyarrow")
    reps = counts.map_batches(replicate, batch_format="pyarrow")

    def merge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("hr")
            .agg(
                [
                    (pl.col("n") * pl.col("own")).sum().alias("n_events"),
                    pl.col("n").sum().alias("rolling_n"),
                ]
            )
            .select(["hr", "n_events", "rolling_n"])
            .to_arrow()
            .cast(out_schema)
        )

    from textalyzer_ray.sources.tables import cluster_cpus
    from textalyzer_ray.stages.groups import partitions_for

    # exchange rows = span grid zeros + roll_w replicas per bucket —
    # size partitions to that, not to the cluster (CLAUDE.md: aggregator
    # actors are per-partition fixed cost)
    n_parts = min(
        max(cluster_cpus(), 2),
        partitions_for(span + n_counts * roll_w, 2_000_000),
    )
    return grouped_apply(
        grid.union(reps), ["hr"], merge_block, num_partitions=n_parts
    ).sort("hr")


def decayed_counts(
    ds_events: Dataset,
    halflife_s: int = 86_400,
    max_halflives: int = 25,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> Dataset:
    """Exponentially time-decayed activity score per key — the
    "frecency" signal a crawl scheduler / trending rollup ranks on —
    made EXACT across engines by quantizing age to whole halflives:
    each event's weight is 2^-k with k = floor(age / halflife), so
    every weight is a dyadic rational and the per-key sum, carried as
    ``score_units`` = sum(2^(K-k)) in BIGINT (K = ``max_halflives``),
    is integer-exact; events older than K halflives fall outside the
    horizon and count zero. ``score`` = score_units / 2^K is one exact
    power-of-two division, so the DOUBLE hash-matches any engine that
    computes the same integers (guarded: score_units must stay below
    2^53). Reference for the decay shape: exponentially-decayed counters
    (Cormode et al. forward decay, VLDB 2009) — the quantization is
    what makes it oracle-exact.

    Two streaming passes: per-block max(ts) + an O(blocks) driver
    reduce for the reference time, then one vectorized weight pass
    feeding stages.groups.key_counts (per-block partial sums, tree or
    key-aligned merge — never a corpus-wide groupby). Output:
    (key_col, n_events, score_units, score), keys with no in-horizon
    event omitted, sorted by key."""
    import numpy as np

    from textalyzer_ray.stages.groups import key_counts

    hl_us = int(halflife_s) * 1_000_000
    K = int(max_halflives)

    def block_max(t: pa.Table) -> pa.Table:
        m = pc.max(t[ts_col]).value  # µs since epoch, None on empty
        return pa.table(
            {"m": pa.array([m if m is not None else -(2**62)], pa.int64())}
        )

    maxes = ds_events.select_columns([ts_col]).map_batches(
        block_max, batch_format="pyarrow"
    ).take_all()
    if not maxes:
        return_schema = pa.schema(
            [
                pa.field(key_col, pa.int64()),
                pa.field("n_events", pa.int64()),
                pa.field("score_units", pa.int64()),
                pa.field("score", pa.float64()),
            ]
        )
        import ray.data as rd

        return rd.from_arrow(return_schema.empty_table())
    t_ref = max(r["m"] for r in maxes)

    def weights(t: pa.Table) -> pa.Table:
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        k = (t_ref - ts) // hl_us
        keep = k <= K
        w = np.zeros(len(ts), dtype=np.int64)
        w[keep] = np.int64(1) << (K - k[keep])
        return pa.table(
            {
                key_col: t[key_col].filter(pa.array(keep)),
                "w_units": pa.array(w[keep], pa.int64()),
            }
        )

    counted = key_counts(
        ds_events.select_columns([key_col, ts_col]).map_batches(
            weights, batch_format="pyarrow", zero_copy_batch=True
        ),
        [key_col],
        sum_cols=["w_units"],
    )

    def finalize(t: pa.Table) -> pa.Table:
        su = t["sum_w_units"].to_numpy(zero_copy_only=False)
        if len(su) and int(su.max()) >= 2**53:
            raise ValueError(
                "score_units exceeds 2^53: exact-double contract broken; "
                "lower max_halflives"
            )
        return pa.table(
            {
                key_col: t[key_col],
                "n_events": t["count"],
                "score_units": t["sum_w_units"],
                "score": pa.array(su / float(1 << K), pa.float64()),
            }
        )

    return counted.map_batches(finalize, batch_format="pyarrow").sort(key_col)


def source_outliers(
    ds_docs: Dataset,
    group_col: str = "source",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    c: int = 3,
) -> Dataset:
    """Robust per-group outlier flags via median absolute deviation
    (MAD, Hampel's rule |x - med| > c * MAD) — the per-source length
    anomaly scan a crawl-ingest monitor runs to catch truncated or
    boilerplate-exploded feeds. Both statistics use the DISCRETE lower
    median (sorted[(n-1)//2], == DuckDB quantile_disc(0.5) and polars
    quantile(0.5, 'lower'), pinned in tests), so every output column is
    integer-exact across engines — no float quantile interpolation.

    Scale shape: ONE key-aligned hash exchange on ``group_col``
    (stages.groups.grouped_apply — every group wholly in one block)
    sized to the MEASURED row count, then a vectorized polars window
    pass per block (two lower-median windows + per-row arithmetic).
    Output: (id_col, group_col, value_col, med, mad, is_outlier),
    BIGINT stats, sorted by id_col.

    Groups must individually fit a block (true for per-source/per-host
    metadata groups; a corpus-sized single group needs the sketch-based
    variant instead — not this operator's contract)."""
    import polars as pl

    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field(group_col, pa.string()),
            pa.field(value_col, pa.int64()),
            pa.field("med", pa.int64()),
            pa.field("mad", pa.int64()),
            pa.field("is_outlier", pa.int64()),
        ]
    )

    def flag_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .with_columns(
                pl.col(value_col)
                .quantile(0.5, interpolation="lower")
                .over(group_col)
                .cast(pl.Int64)
                .alias("med")
            )
            .with_columns(
                (pl.col(value_col) - pl.col("med")).abs().alias("_dev")
            )
            .with_columns(
                pl.col("_dev")
                .quantile(0.5, interpolation="lower")
                .over(group_col)
                .cast(pl.Int64)
                .alias("mad")
            )
            .with_columns(
                (pl.col("_dev") > c * pl.col("mad"))
                .cast(pl.Int64)
                .alias("is_outlier")
            )
            .select([id_col, group_col, value_col, "med", "mad", "is_outlier"])
        )
        return df.to_arrow().cast(out_schema)

    narrow = ds_docs.select_columns(
        [id_col, group_col, value_col]
    ).materialize()
    return grouped_apply(
        narrow,
        [group_col],
        flag_block,
        num_partitions=partitions_for(narrow.count()),
    ).sort(id_col)


def cusum_alarms(
    ds_events: Dataset,
    window_s: int = 3600,
    h_mult: int = 4,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> Dataset:
    """Per-type CUSUM drift alarms over dense time windows (Page 1954,
    the one-sided cumulative-sum control chart a crawl/ingest monitor
    runs to catch sustained rate drift rather than single spikes).
    Self-calibrating and ALL-INTEGER by cross-multiplication: with W =
    dense window count and T_g = type g's total events, the per-window
    drift is d_i = W * x_i - T_g (zero-mean by construction), the
    CUSUM is its max(0, .)-reflected running sum via the prefix-sum
    identity S_t = P_t - min(0, min_{j<=t} P_j), and a window alarms
    when S_t > h_mult * T_g (a sustained excess worth ``h_mult``
    average windows). No float anywhere, so the SQL window-function
    oracle is exact.

    Scale shape: per-batch (window, type) partial counts -> ONE
    key_counts merge -> global [lo, hi] window span via per-block
    extrema + driver reduce (one row per block) -> ONE key-aligned
    exchange on type (every type's series wholly in a block; type
    cardinality is schema-bounded, not corpus-bounded — this is the
    module's per-key-series contract) -> vectorized numpy scatter +
    cumsum per type. Gap windows count 0 — the dense grid is arange,
    never a row explosion through the exchange.

    -> (event_type, window_start, n, cusum) for ALARM windows only,
    BIGINT everywhere, sorted (event_type, window_start).
    """
    import numpy as np
    import polars as pl
    import ray.data as rd

    from textalyzer_ray.stages.groups import (
        grouped_apply,
        key_counts,
        partitions_for,
    )

    win_us = int(window_s) * 1_000_000

    def partials(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t[ts_col], pa.int64())
        tbl = pa.table(
            {"w": pc.divide(epoch, win_us), type_col: t[type_col]}
        )
        return (
            pl.from_arrow(tbl)
            .group_by(["w", type_col])
            .len()
            .rename({"len": "n"})
            .with_columns(pl.col("n").cast(pl.Int64))
            .to_arrow()
            .cast(
                pa.schema(
                    [
                        pa.field("w", pa.int64()),
                        pa.field(type_col, pa.string()),
                        pa.field("n", pa.int64()),
                    ]
                )
            )
        )

    counts = key_counts(
        ds_events.select_columns([ts_col, type_col]).map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["w", type_col],
        sum_cols=["n"],
    ).materialize()

    out_schema = pa.schema(
        [
            pa.field(type_col, pa.string()),
            pa.field("window_start", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("cusum", pa.int64()),
        ]
    )

    def block_minmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}
            )
        h = t["w"]
        return pa.table({"lo": [pc.min(h).as_py()], "hi": [pc.max(h).as_py()]})

    mm = counts.map_batches(
        block_minmax, batch_format="pyarrow", batch_size=None
    ).take_all()
    if not mm:
        return rd.from_arrow(out_schema.empty_table())
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    n_windows = int(hi - lo + 1)

    def cusum_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t)
        parts = []
        # small loop over the block's types (schema-bounded cardinality
        # by contract); everything inside is numpy over the dense grid
        for (ty,), g in df.group_by([type_col]):
            w = g["w"].to_numpy()
            n = g["sum_n"].to_numpy().astype(np.int64)
            dense = np.zeros(n_windows, dtype=np.int64)
            dense[w - lo] = n
            total = int(dense.sum())
            p = np.cumsum(np.int64(n_windows) * dense - total)
            s = p - np.minimum(np.minimum.accumulate(p), 0)
            alarm = s > h_mult * total
            if not alarm.any():
                continue
            ix = np.flatnonzero(alarm)
            parts.append(
                pa.table(
                    {
                        type_col: pa.array([ty] * len(ix), pa.string()),
                        "window_start": pa.array(
                            (lo + ix) * window_s, pa.int64()
                        ),
                        "n": pa.array(dense[ix], pa.int64()),
                        "cusum": pa.array(s[ix], pa.int64()),
                    },
                    schema=out_schema,
                )
            )
        if not parts:
            return out_schema.empty_table()
        return pa.concat_tables(parts)

    return grouped_apply(
        counts,
        [type_col],
        cusum_block,
        num_partitions=partitions_for(counts.count()),
    ).sort([type_col, "window_start"])


def theil_sen_trends(
    ds_events: Dataset,
    window_s: int = 3600,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> Dataset:
    """Per-type Theil-Sen robust trend (Theil 1950 / Sen 1968): the
    LOWER median of all pairwise slopes (x_j - x_i)/(j - i) over the
    dense per-window count series — the rate-trend estimate a crawl
    monitor trusts because up to ~29% outlier windows cannot move it
    (vs least squares, which one hot window drags arbitrarily). Slopes
    are int/int double divisions — IEEE-identical in numpy and DuckDB
    (CLAUDE r2 parity rule) — and the lower median picks
    sorted[(n-1)//2], the engine-pinned quantile_disc convention, so
    the float output is value-hash safe.

    Scale shape: same dense-grid build as cusum_alarms (partial counts
    -> ONE key_counts merge -> span reduce -> ONE type-keyed
    exchange); the pairwise slope set is O(W^2) per series in one
    numpy broadcast — bounded by the WINDOW span, not the corpus (720
    hourly windows = 259k slopes; a multi-year span needs the
    repeated-median or sampled variant, documented not implemented).

    -> (event_type, n_windows, n_pairs, slope), sorted by type.
    Series with fewer than 2 windows emit nothing."""
    import numpy as np
    import polars as pl
    import ray.data as rd

    from textalyzer_ray.stages.groups import (
        grouped_apply,
        key_counts,
        partitions_for,
    )

    win_us = int(window_s) * 1_000_000

    def partials(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t[ts_col], pa.int64())
        tbl = pa.table(
            {"w": pc.divide(epoch, win_us), type_col: t[type_col]}
        )
        return (
            pl.from_arrow(tbl)
            .group_by(["w", type_col])
            .len()
            .rename({"len": "n"})
            .with_columns(pl.col("n").cast(pl.Int64))
            .to_arrow()
            .cast(
                pa.schema(
                    [
                        pa.field("w", pa.int64()),
                        pa.field(type_col, pa.string()),
                        pa.field("n", pa.int64()),
                    ]
                )
            )
        )

    counts = key_counts(
        ds_events.select_columns([ts_col, type_col]).map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["w", type_col],
        sum_cols=["n"],
    ).materialize()

    out_schema = pa.schema(
        [
            pa.field(type_col, pa.string()),
            pa.field("n_windows", pa.int64()),
            pa.field("n_pairs", pa.int64()),
            pa.field("slope", pa.float64()),
        ]
    )

    def block_minmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}
            )
        h = t["w"]
        return pa.table({"lo": [pc.min(h).as_py()], "hi": [pc.max(h).as_py()]})

    mm = counts.map_batches(
        block_minmax, batch_format="pyarrow", batch_size=None
    ).take_all()
    if not mm:
        return rd.from_arrow(out_schema.empty_table())
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    n_windows = int(hi - lo + 1)
    if n_windows < 2:
        return rd.from_arrow(out_schema.empty_table())

    def trend_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t)
        types, nw_out, np_out, sl_out = [], [], [], []
        # schema-bounded type loop; all-pairs slopes are one numpy
        # broadcast per series
        for (ty,), g in df.group_by([type_col]):
            w = g["w"].to_numpy()
            n = g["sum_n"].to_numpy().astype(np.int64)
            dense = np.zeros(n_windows, dtype=np.int64)
            dense[w - lo] = n
            iu, ju = np.triu_indices(n_windows, k=1)
            slopes = (dense[ju] - dense[iu]) / (ju - iu)
            slopes.sort(kind="stable")
            k = len(slopes)
            types.append(ty)
            nw_out.append(n_windows)
            np_out.append(k)
            sl_out.append(float(slopes[(k - 1) // 2]))
        return pa.table(
            {
                type_col: pa.array(types, pa.string()),
                "n_windows": pa.array(nw_out, pa.int64()),
                "n_pairs": pa.array(np_out, pa.int64()),
                "slope": pa.array(sl_out, pa.float64()),
            },
            schema=out_schema,
        )

    return grouped_apply(
        counts,
        [type_col],
        trend_block,
        num_partitions=partitions_for(counts.count()),
    ).sort(type_col)


def ols_trends(
    ds_events: Dataset,
    window_s: int = 3600,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> Dataset:
    """Per-type least-squares rate trend over the dense per-window
    count series — the classical companion to ``theil_sen_trends``
    (same grid, same exchange shape): slope and intercept of the OLS
    line fitted to (window index, event count). Exactness is
    engineered, not assumed: with x = 0..W-1 and integer counts y,
    both closed forms are ratios of INTEGER sums —

        slope     = (W*Sxy - Sx*Sy) / (W*Sxx - Sx*Sx)
        intercept = (Sy*Sxx - Sx*Sxy) / (W*Sxx - Sx*Sx)

    — accumulated as Python ints (arbitrary precision, matching
    DuckDB's HUGEINT sums bit-for-bit), then ONE int/int double
    division each (IEEE-identical across engines, CLAUDE.md r2 rule).
    Both operands are asserted < 2^53 so DuckDB's HUGEINT->DOUBLE
    operand cast is exact; beyond that the window span, not the
    corpus, is what grew — re-window before re-scaling.

    Scale shape: identical to cusum_alarms — per-batch (window, type)
    partials -> ONE key_counts merge -> per-block extrema + driver
    reduce for the global span -> ONE type-keyed exchange (type
    cardinality is schema-bounded) -> per-type numpy scatter and six
    integer sums. Gap windows count 0 via the dense grid.

    -> (event_type, n_windows, slope, intercept), sorted by type.
    Fewer than 2 windows -> empty (no line through one point)."""
    import numpy as np
    import polars as pl
    import ray.data as rd

    from textalyzer_ray.stages.groups import (
        grouped_apply,
        key_counts,
        partitions_for,
    )

    win_us = int(window_s) * 1_000_000

    def partials(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t[ts_col], pa.int64())
        tbl = pa.table(
            {"w": pc.divide(epoch, win_us), type_col: t[type_col]}
        )
        return (
            pl.from_arrow(tbl)
            .group_by(["w", type_col])
            .len()
            .rename({"len": "n"})
            .with_columns(pl.col("n").cast(pl.Int64))
            .to_arrow()
            .cast(
                pa.schema(
                    [
                        pa.field("w", pa.int64()),
                        pa.field(type_col, pa.string()),
                        pa.field("n", pa.int64()),
                    ]
                )
            )
        )

    counts = key_counts(
        ds_events.select_columns([ts_col, type_col]).map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["w", type_col],
        sum_cols=["n"],
    ).materialize()

    out_schema = pa.schema(
        [
            pa.field(type_col, pa.string()),
            pa.field("n_windows", pa.int64()),
            pa.field("slope", pa.float64()),
            pa.field("intercept", pa.float64()),
        ]
    )

    def block_minmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}
            )
        h = t["w"]
        return pa.table({"lo": [pc.min(h).as_py()], "hi": [pc.max(h).as_py()]})

    mm = counts.map_batches(
        block_minmax, batch_format="pyarrow", batch_size=None
    ).take_all()
    if not mm:
        return rd.from_arrow(out_schema.empty_table())
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    n_windows = int(hi - lo + 1)
    if n_windows < 2:
        return rd.from_arrow(out_schema.empty_table())

    def ols_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t)
        types, nw_out, sl_out, ic_out = [], [], [], []
        # schema-bounded type loop; the series itself is one numpy
        # scatter, the sums are exact Python ints
        W = n_windows
        sx = W * (W - 1) // 2
        sxx = (W - 1) * W * (2 * W - 1) // 6
        den = W * sxx - sx * sx
        for (ty,), g in df.group_by([type_col]):
            w = g["w"].to_numpy()
            n = g["sum_n"].to_numpy().astype(np.int64)
            dense = np.zeros(W, dtype=np.int64)
            dense[w - lo] = n
            sy = int(dense.sum())
            sxy = int((np.arange(W, dtype=np.int64) * dense).sum())
            num_s = W * sxy - sx * sy
            num_i = sy * sxx - sx * sxy
            # DuckDB casts each HUGEINT operand to DOUBLE before the
            # division; exact only below 2^53.
            for v in (num_s, num_i, den):
                if abs(v) >= 1 << 53:
                    raise ValueError(
                        "ols_trends: integer sum exceeds exact-double "
                        f"range ({v}); shrink the window span"
                    )
            types.append(ty)
            nw_out.append(W)
            sl_out.append(num_s / den)
            ic_out.append(num_i / den)
        return pa.table(
            {
                type_col: pa.array(types, pa.string()),
                "n_windows": pa.array(nw_out, pa.int64()),
                "slope": pa.array(sl_out, pa.float64()),
                "intercept": pa.array(ic_out, pa.float64()),
            },
            schema=out_schema,
        )

    return grouped_apply(
        counts,
        [type_col],
        ols_block,
        num_partitions=partitions_for(counts.count()),
    ).sort(type_col)


def sentence_stats(
    ds_docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Per-document sentence segmentation metrics: split on the
    boundary rule ``[.!?]+ `` (one or more terminators followed by a
    space — the RE2-class regex both polars' rust-regex and DuckDB's
    RE2 interpret identically; no lookbehind, which RE2 lacks), then
    count pieces and their byte lengths. The sentence-length profile
    is a standard prose-quality signal (machine text skews to extreme
    sentence lengths) and the unit every readability formula needs.

    Exact rule: every regex match becomes one boundary (empty pieces
    count — a leading/doubled boundary yields a zero-byte sentence;
    terminators at end-of-text are not followed by a space, so they
    stay inside the last piece in both engines).

    One vectorized polars pass per block (replace boundary -> NUL,
    split, explode, byte lengths, group by doc) — nothing shuffles,
    text dies in the stage. All-BIGINT output
    (doc_id, n_sentences, max_sent_bytes, sum_sent_bytes), by doc."""
    import polars as pl

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("n_sentences", pa.int64()),
            pa.field("max_sent_bytes", pa.int64()),
            pa.field("sum_sent_bytes", pa.int64()),
        ]
    )

    def stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        return (
            pl.from_arrow(t)
            .with_columns(
                pl.col(text_col)
                .str.replace_all(r"[.!?]+ ", "\x00")
                .str.split("\x00")
                .alias("s")
            )
            .select([id_col, "s"])
            .explode("s")
            .with_columns(
                pl.col("s").str.len_bytes().cast(pl.Int64).alias("b")
            )
            .group_by(id_col)
            .agg(
                pl.len().cast(pl.Int64).alias("n_sentences"),
                pl.col("b").max().alias("max_sent_bytes"),
                pl.col("b").sum().alias("sum_sent_bytes"),
            )
            .select(
                [id_col, "n_sentences", "max_sent_bytes", "sum_sent_bytes"]
            )
            .to_arrow()
            .cast(out_schema)
        )

    return ds_docs.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    ).sort(id_col)
