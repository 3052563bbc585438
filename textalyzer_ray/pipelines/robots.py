"""Robots-rules crawl-frontier filtering (longest-prefix-match).

A crawl loop's frontier step must drop candidate URLs the target host's
robots rules disallow BEFORE fetch scheduling. The reference CLI has no
crawl stage — this is a training-data-pipeline extension over the link
graph (pipelines/links.py), using the de-facto robots semantics
(Google's robots.txt spec, RFC 9309): among all rules of the URL's host
whose path-prefix matches the URL path, the LONGEST prefix wins, and on
an exact length tie ``allow`` beats ``disallow``. A URL whose host has
no matching rule is allowed by default.

Scale shape: the rules table is per-HOST metadata — many orders smaller
than the frontier (a 100 TB crawl has ~10^8 hosts vs ~10^12 candidate
URLs) but NOT driver-trivial at full scale. This module broadcasts the
rules once (``ray.put`` + per-worker-process cache, the
stages/groups.py pattern) and runs one vectorized polars
join+prefix-match per batch; above ``broadcast_max_rules`` it refuses
with the documented alternative (key-align both sides on host via
stages.groups.grouped_apply — the joins.union_tag_lookup shape) rather
than silently shipping an oversized object per worker.

Everything is deterministic: rule synthesis is pure host-index
arithmetic, so a DuckDB oracle re-derives every rule and every match
(see __ray_entry__ ``robots_filter``).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import ray
from ray.data import Dataset

_HOST_RE = r"^https?://([^/]+)"
# path = everything from the first '/' after the host (query strings
# included — robots prefixes match the raw path+query per RFC 9309)
_PATH_RE = r"^https?://[^/]+(/.*)?$"

RULES_SCHEMA = pa.schema(
    [
        pa.field("host", pa.string()),
        pa.field("prefix", pa.string()),
        pa.field("allow", pa.int64()),  # 1 allow / 0 disallow
    ]
)


def robots_rules_for_sites(n_sites: int = 50) -> pa.Table:
    """Deterministic per-host rule set for the synthetic cross-link
    hosts ``site{h}.example`` (webgen.cross_links_for targets) — pure
    host-index arithmetic so the SQL oracle re-derives it row-for-row:

    - ``/``         allow                      (explicit default)
    - ``/page/``    allow iff h % 3 != 0       (every 3rd host blocks
                                                the page tree)
    - ``/page/1``   allow iff h % 3 == 0       (longest-match override:
                                                flips the /page/ rule
                                                for paths whose id
                                                starts with digit 1)
    - ``/page/12``  allow iff h % 2 == 0       (a deeper override, so
                                                three prefix lengths
                                                compete on /page/12*)
    """
    hosts, prefixes, allows = [], [], []
    for h in range(n_sites):
        host = f"site{h}.example"
        for prefix, allow in (
            ("/", 1),
            ("/page/", 1 if h % 3 != 0 else 0),
            ("/page/1", 1 if h % 3 == 0 else 0),
            ("/page/12", 1 if h % 2 == 0 else 0),
        ):
            hosts.append(host)
            prefixes.append(prefix)
            allows.append(allow)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "prefix": pa.array(prefixes, pa.string()),
            "allow": pa.array(allows, pa.int64()),
        }
    )


def _rules_df(rules: pa.Table) -> pl.DataFrame:
    return pl.from_arrow(rules).with_columns(
        pl.col("prefix").str.len_bytes().alias("_plen")
    )


def _match_table(t: pa.Table, rdf: pl.DataFrame, url_col: str) -> pa.Table:
    """Winning robots verdict per URL row of one batch: polars join +
    prefix filter + stable sort. Pure (table, rules-df) -> table so the
    broadcast stage and the one-task small path share it."""
    out_schema = pa.schema(
        list(t.schema)
        + [
            pa.field("host", pa.string()),
            pa.field("allowed", pa.int64()),
            pa.field("rule_prefix", pa.string()),
        ]
    )
    if t.num_rows == 0:
        return out_schema.empty_table()
    df = pl.from_arrow(t).with_row_index("_rid")
    parsed = df.select(
        "_rid",
        pl.col(url_col).str.extract(_HOST_RE, 1).alias("host"),
        pl.col(url_col)
        .str.extract(_PATH_RE, 1)
        .fill_null("/")
        .alias("_path"),
    )
    hits = (
        parsed.join(rdf, on="host", how="inner")
        # prefix match on raw path bytes (RFC 9309 %-encoding parity
        # is the caller's normalization concern)
        .filter(
            pl.col("_path").str.slice(0, pl.col("_plen"))
            == pl.col("prefix")
        )
        .sort(
            ["_rid", "_plen", "allow", "prefix"],
            descending=[False, True, True, False],
        )
        .group_by("_rid", maintain_order=True)
        .first()
        .select("_rid", "allow", "prefix")
    )
    out = (
        df.join(
            parsed.select("_rid", "host"),
            on="_rid",
            how="left",
            maintain_order="left",
        )
        .join(hits, on="_rid", how="left", maintain_order="left")
        .with_columns(
            pl.col("allow").fill_null(1).alias("allowed"),
            pl.col("prefix").fill_null("").alias("rule_prefix"),
        )
        .drop("_rid", "allow", "prefix")
    )
    return out.to_arrow().cast(out_schema)


def robots_match(
    ds_urls: Dataset,
    rules: pa.Table,
    url_col: str = "url",
    broadcast_max_rules: int = 5_000_000,
) -> Dataset:
    """Attach the winning robots verdict to every URL row: output is
    the input columns plus ``host``, ``allowed`` (BIGINT 1/0) and
    ``rule_prefix`` (the winning rule's prefix, '' when the host has no
    matching rule — default allow).

    Longest-prefix-wins with allow-beats-disallow on ties, made a TOTAL
    order (prefix ASC as the final key) so the winner is deterministic
    even under duplicate rule rows. One ``_match_table`` pass per
    batch; the rules ship once per worker process via ``ray.put`` +
    the per-worker object cache."""
    if rules.num_rows > broadcast_max_rules:
        raise ValueError(
            f"rules table has {rules.num_rows} rows > broadcast_max_rules="
            f"{broadcast_max_rules}; key-align frontier and rules on host "
            "(stages.groups.grouped_apply) instead of broadcasting"
        )
    rules_ref = ray.put(rules)

    def match(t: pa.Table) -> pa.Table:
        from textalyzer_ray.stages.groups import _worker_object_cache

        cache = _worker_object_cache()
        ck = "robots:" + rules_ref.hex()
        rdf = cache.get(ck)
        if rdf is None:
            rdf = cache[ck] = _rules_df(ray.get(rules_ref))
        return _match_table(t, rdf, url_col)

    return ds_urls.map_batches(match, batch_format="pyarrow")


def frontier_robots_filter(
    ds_candidates: Dataset,
    rules: pa.Table,
    url_col: str = "url",
    small_threshold: int = 2_000_000,
) -> Dataset:
    """Frontier step: distinct candidate URLs -> robots verdict per
    URL. Distinctness is fully distributed: ONE key-aligned hash
    exchange on the url (stages.groups.grouped_apply puts every url
    entirely in one block) + a per-block polars ``unique`` — no URL
    set on the driver, dup-heavy frontiers collapse before the match
    pass. The exchange is sized to the MEASURED candidate count
    (partitions_for; defaulting to cluster_cpus multiplied shuffle
    actor startup ~10x on a 15k-row frontier — CLAUDE.md r2), and a
    frontier at or below ``small_threshold`` rows skips the exchange
    entirely: one remote task does unique + match (block refs in,
    result out, nothing on the driver). Returns
    (url, host, allowed, rule_prefix)."""
    import ray.data as rd

    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    cand = ds_candidates.select_columns([url_col]).materialize()
    n = cand.count()

    if n <= small_threshold:
        rules_ref = ray.put(rules)

        @ray.remote
        def filter_task(rules_tbl: pa.Table, *blocks: pa.Table) -> pa.Table:
            out_schema = pa.schema(
                [
                    pa.field(url_col, pa.string()),
                    pa.field("host", pa.string()),
                    pa.field("allowed", pa.int64()),
                    pa.field("rule_prefix", pa.string()),
                ]
            )
            tables = [b for b in blocks if b.num_rows]
            if not tables:
                return out_schema.empty_table()
            t = (
                pl.from_arrow(pa.concat_tables(tables))
                .unique(maintain_order=False)
                .to_arrow()
            )
            return _match_table(t, _rules_df(rules_tbl), url_col)

        refs = cand.to_arrow_refs()
        return rd.from_arrow_refs([filter_task.remote(rules_ref, *refs)])

    def distinct_block(t: pa.Table) -> pa.Table:
        return pl.from_arrow(t).unique(maintain_order=False).to_arrow().cast(
            t.schema
        )

    urls = grouped_apply(
        cand, [url_col], distinct_block, num_partitions=partitions_for(n)
    )
    return robots_match(urls, rules, url_col=url_col)


def crawl_schedule(
    ds_candidates: "Dataset",
    rules: pa.Table,
    url_col: str = "url",
    base_delay_mod: int = 3,
    small_threshold: int = 2_000_000,
) -> "Dataset":
    """Politeness scheduler over the allowed frontier: distinct
    candidate URLs pass the robots filter, then each HOST's allowed
    URLs are ranked (url ASC — deterministic FIFO) and assigned a fetch
    wave ``host_rank * crawl_delay`` — one fetch per host per
    ``crawl_delay`` scheduler ticks, hosts interleave freely (the
    standard per-host politeness model, e.g. Heydon & Najork's
    Mercator, 1999). ``crawl_delay`` is deterministic per-host metadata
    (1 + site_index % ``base_delay_mod`` for the synthetic
    site{N}.example hosts; 1 when the host has no site index), standing
    in for a robots Crawl-delay directive.

    Scale shape: the verdict step is frontier_robots_filter (one
    key-aligned url exchange + broadcast rules, measured-size one-task
    small path); the ranking is ONE more key-aligned exchange on host
    (grouped_apply — every host's URLs in one block) with a vectorized
    per-block polars sort + cumcount, sized to the measured verdict
    count. No driver materialization; waves are per-row arithmetic.
    A frontier whose verdicts fit ``small_threshold`` skips the host
    exchange too (the verdict pass already produced one block on the
    small path, so the schedule is a single map over it).

    Output: (url, host, host_rank, crawl_delay, fetch_wave), BIGINT
    ranks/waves, sorted by url.
    """
    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    verdicts = frontier_robots_filter(
        ds_candidates, rules, url_col=url_col,
        small_threshold=small_threshold,
    ).materialize()
    n_urls = verdicts.count()
    def keep_allowed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["allowed"], 1)).select([url_col, "host"])

    allowed = verdicts.map_batches(keep_allowed, batch_format="pyarrow")
    out_schema = pa.schema(
        [
            pa.field(url_col, pa.string()),
            pa.field("host", pa.string()),
            pa.field("host_rank", pa.int64()),
            pa.field("crawl_delay", pa.int64()),
            pa.field("fetch_wave", pa.int64()),
        ]
    )

    def schedule_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        site_idx = (
            pl.col("host").str.extract(r"^site(\d+)\.", 1).cast(
                pl.Int64, strict=False
            )
        )
        df = (
            pl.from_arrow(t)
            .sort(["host", url_col])
            .with_columns(
                pl.col(url_col).cum_count().over("host").alias("_one")
            )
            .with_columns(
                (pl.col("_one") - 1).cast(pl.Int64).alias("host_rank"),
                (
                    1
                    + pl.when(site_idx.is_not_null())
                    .then(site_idx % base_delay_mod)
                    .otherwise(0)
                ).cast(pl.Int64).alias("crawl_delay"),
            )
            .with_columns(
                (pl.col("host_rank") * pl.col("crawl_delay")).alias(
                    "fetch_wave"
                )
            )
            .select([url_col, "host", "host_rank", "crawl_delay", "fetch_wave"])
        )
        return df.to_arrow().cast(out_schema)

    if n_urls <= small_threshold:
        import ray.data as rd

        @ray.remote
        def sched_task(*blocks: pa.Table) -> pa.Table:
            tables = [b for b in blocks if b.num_rows]
            if not tables:
                return out_schema.empty_table()
            t = keep_allowed(pa.concat_tables(tables))
            return schedule_block(t).sort_by(url_col)

        refs = verdicts.to_arrow_refs()
        return rd.from_arrow_refs([sched_task.remote(*refs)])

    return grouped_apply(
        allowed,
        ["host"],
        schedule_block,
        num_partitions=partitions_for(n_urls),
    ).sort(url_col)
