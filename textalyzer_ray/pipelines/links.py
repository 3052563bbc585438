"""Link-graph pipelines: outlink extraction and host-level rollups.

Web-corpus curation needs the link graph (host outdegree feeds quality
priors, dst-host rollups feed domain caps and spam filters). The
reference CLI has no link stage — this is a training-data-pipeline
extension over the F1 page schema (sources/webgen.py), the same way the
dedup/curation families extend the reference's text ops.

Scale shape: href extraction is a single vectorized polars
``str.extract_all`` over each Arrow batch — the ``html`` column DIES in
that stage; only (doc_id, out_url, out_host) rows continue. Rollups go
through ``stages.groups.key_counts`` (per-block polars partials + tree
or key-aligned merge), so no host list ever materializes on the driver
and the hot-host skew (every page links docs.example boilerplate) is
pre-aggregated inside each block before any shuffle.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


@ray.remote
def _num_rows(block: pa.Table) -> int:
    return block.num_rows

_HREF_RE = r'href="([^"]*)"'
_HOST_RE = r"^(https?://[^/]+)"


def _batch_outlinks(batch: pa.Table) -> pa.Table:
    """(doc_id, url, html) -> one row per href occurrence, in document
    order: (doc_id, out_url, out_host). Relative hrefs resolve against
    the page's own scheme+host (path-relative resolution is not needed:
    webgen emits root-relative hrefs only, and crawl-garbage relative
    forms still produce a deterministic host-joined url)."""
    df = pl.from_arrow(batch.select(["doc_id", "url", "html"]))
    df = df.with_columns(
        pl.col("html").cast(pl.String, strict=False).alias("_h"),
        pl.col("url").str.extract(_HOST_RE, 1).alias("_base"),
    )
    links = (
        df.select(
            "doc_id",
            "_base",
            pl.col("_h").str.extract_all(_HREF_RE).alias("_m"),
        )
        .explode("_m")
        .drop_nulls("_m")
        .with_columns(pl.col("_m").str.extract(_HREF_RE, 1).alias("_href"))
        .with_columns(
            pl.when(pl.col("_href").str.starts_with("http"))
            .then(pl.col("_href"))
            .when(pl.col("_href").str.starts_with("/"))
            .then(pl.col("_base") + pl.col("_href"))
            # path-less relative crawl garbage: root-join with a "/" so
            # the host component stays the page's own host
            .otherwise(pl.col("_base") + "/" + pl.col("_href"))
            .alias("out_url")
        )
        .with_columns(
            pl.col("out_url").str.extract(_HOST_RE, 1).alias("_hosturl")
        )
        .with_columns(
            pl.col("_hosturl")
            .str.replace(r"^https?://", "")
            .alias("out_host")
        )
        .select("doc_id", "out_url", "out_host")
    )
    out = links.to_arrow()
    # polars emits large_string; normalize so downstream joins/unions
    # against native-Arrow datasets never hit the string/large_string
    # key mismatch (CLAUDE.md round-3 note).
    return out.cast(
        pa.schema(
            [
                pa.field("doc_id", out.schema.field("doc_id").type),
                pa.field("out_url", pa.string()),
                pa.field("out_host", pa.string()),
            ]
        )
    )


_ANCHOR_RE = r'<a href="([^"]*)"[^>]*>([^<]*)</a>'


def _batch_anchors(batch: pa.Table) -> pa.Table:
    """(doc_id, url, html) -> one row per <a> occurrence:
    (out_host, anchor). Host resolution mirrors ``_batch_outlinks``;
    the anchor is the raw inner text up to the first tag (webgen emits
    flat anchors; nested-markup anchors keep their leading text, a
    deterministic and documented simplification)."""
    df = pl.from_arrow(batch.select(["url", "html"]))
    df = df.with_columns(
        pl.col("html").cast(pl.String, strict=False).alias("_h"),
        pl.col("url").str.extract(_HOST_RE, 1).alias("_base"),
    )
    links = (
        df.select(
            "_base",
            pl.col("_h").str.extract_all(_ANCHOR_RE).alias("_m"),
        )
        .explode("_m")
        .drop_nulls("_m")
        .with_columns(
            pl.col("_m").str.extract(_ANCHOR_RE, 1).alias("_href"),
            pl.col("_m").str.extract(_ANCHOR_RE, 2).alias("anchor"),
        )
        .with_columns(
            pl.when(pl.col("_href").str.starts_with("http"))
            .then(pl.col("_href"))
            .when(pl.col("_href").str.starts_with("/"))
            .then(pl.col("_base") + pl.col("_href"))
            .otherwise(pl.col("_base") + "/" + pl.col("_href"))
            .alias("out_url")
        )
        .with_columns(
            pl.col("out_url")
            .str.extract(_HOST_RE, 1)
            .str.replace(r"^https?://", "")
            .alias("out_host")
        )
        .select("out_host", "anchor")
    )
    return links.to_arrow().cast(
        pa.schema(
            [pa.field("out_host", pa.string()), pa.field("anchor", pa.string())]
        )
    )


def top_anchors_per_host(pages: Dataset, k: int = 3) -> Dataset:
    """Anchor-text rollup (the classic search/quality signal: what do
    OTHER pages call this host?) -> (out_host, anchor, n, rank), top-k
    anchors per target host by (n desc, anchor asc).

    Scale shape: anchors leave the extraction batch as two short string
    columns (html dies in-block); counting is ``key_counts`` partials +
    auto-sized merge; the per-host window runs key-aligned
    (``grouped_apply``) so every host's anchors land wholly in one
    block — no single-block funnel at web-scale host counts."""
    from textalyzer_ray.stages.groups import grouped_apply, key_counts

    anchors = pages.map_batches(
        _batch_anchors, batch_format="pyarrow", zero_copy_batch=True
    )
    hist = key_counts(anchors, ["out_host", "anchor"]).map_batches(
        lambda t: pa.table(
            {"out_host": t["out_host"], "anchor": t["anchor"], "n": t["count"]}
        ),
        batch_format="pyarrow",
    )

    def topk(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t)
            .sort(["out_host", "n", "anchor"], descending=[False, True, False])
            .with_columns(
                pl.col("anchor").cum_count().over("out_host").cast(pl.Int64).alias("rank")
            )
            .filter(pl.col("rank") <= k)
        )
        return df.select(["out_host", "anchor", "n", "rank"]).to_arrow().cast(
            pa.schema(
                [
                    pa.field("out_host", pa.string()),
                    pa.field("anchor", pa.string()),
                    pa.field("n", pa.int64()),
                    pa.field("rank", pa.int64()),
                ]
            )
        )

    return grouped_apply(hist, ["out_host"], topk, num_partitions=4).sort(
        ["out_host", "rank"]
    )


def extract_outlinks(pages: Dataset) -> Dataset:
    """Pages (doc_id, url, html, ...) -> (doc_id, out_url, out_host),
    one row per href in document order. The html column is dropped in
    the extraction batch; nothing heavier than url strings continues."""
    return pages.map_batches(
        _batch_outlinks, batch_format="pyarrow", zero_copy_batch=True
    )


def host_outdegree(pages: Dataset) -> Dataset:
    """-> (out_host, n_links): total links pointing at each host."""
    from textalyzer_ray.stages.groups import key_counts

    links = extract_outlinks(pages).select_columns(["out_host"])
    counts = key_counts(links, ["out_host"])
    schema = pa.schema(
        [pa.field("out_host", pa.string()), pa.field("n_links", pa.int64())]
    )
    # cast large_string -> string (key_counts goes through polars);
    # downstream joins reject mixed string widths
    return counts.map_batches(
        lambda t: t.rename_columns(["out_host", "n_links"]).cast(schema),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def host_pagerank(
    edges: Dataset,
    damping: float = 0.85,
    n_iter: int = 10,
    small_threshold: int = 2_000_000,
    seeds: list[str] | None = None,
) -> Dataset:
    """Weighted PageRank over a host-level edge rollup
    (src_host, dst_host, n_links) -> (host, pr: double, pr_rank:
    bigint) — the link-authority prior a web-curation funnel uses for
    domain quality weighting. Fixed ``n_iter`` power iterations with
    uniform dangling-mass redistribution:

        pr' = (1-d)/N + d * (sum_in pr[s]*w/W[s] + dangling/N)

    ``pr_rank`` orders by (pr DESC, host ASC) — a total order, so the
    int column is oracle-safe even where pr floats are not.

    ``seeds`` switches to the SEEDED restart (personalized PageRank /
    TrustRank, Gyongyi-Garcia-Molina-Pedersen VLDB 2004; topic-
    sensitive TextRank when run over the word graph): restart and
    dangling mass go to the seed set only —

        pr' = (1-d)*r + d * (sum_in pr[s]*w/W[s] + dangling*r)

    with r_i = 1/|seeds ∩ nodes| for seed nodes, else 0 (pr0 = r).
    ``seeds`` is a curated trust list — driver-sized by definition —
    shipped to workers inside the stage closures; seed nodes absent
    from the graph are ignored, and an empty intersection raises. The
    uniform path's float-op grouping is untouched, so existing
    host_pagerank/textrank oracles stay bit-identical.

    Mechanism sized to the MEASURED edge count (the
    connected_components pattern):
    - ``n_edges <= small_threshold``: ONE remote numpy task over the
      edge block refs (host graphs are tiny relative to the corpus —
      a power iteration per round through dataset joins pays ~1.5 s of
      shuffle-actor startup for kilobytes of rank mass). Edges never
      touch the driver.
    - larger graphs: the transition weight w/W[s] is prejoined ONCE,
      then each round is one hash-partitioned join (edges ⋈ pr on src)
      + one key-aligned grouped sum per dst + a per-block dangling-mass
      probe (one float per block to the driver). Shuffles are sized to
      the measured edge count.
    """
    import numpy as np
    import ray
    import ray.data as rd
    from ray.data import DataContext

    edges = edges.select_columns(
        ["src_host", "dst_host", "n_links"]
    ).materialize()
    edges.context.shuffle_strategy = DataContext.get_current().shuffle_strategy
    n_edges = edges.count()
    out_schema = pa.schema(
        [
            pa.field("host", pa.string()),
            pa.field("pr", pa.float64()),
            pa.field("pr_rank", pa.int64()),
        ]
    )
    if n_edges == 0:
        return rd.from_arrow(out_schema.empty_table())

    if n_edges <= small_threshold:

        @ray.remote
        def pagerank_task(*blocks: pa.Table) -> pa.Table:
            df = pl.concat([pl.from_arrow(b) for b in blocks])
            srcs = df["src_host"].to_list()
            dsts = df["dst_host"].to_list()
            hosts = sorted(set(srcs) | set(dsts))
            idx = {h: i for i, h in enumerate(hosts)}
            src = np.fromiter((idx[h] for h in srcs), np.int64, len(srcs))
            dst = np.fromiter((idx[h] for h in dsts), np.int64, len(dsts))
            w = df["n_links"].to_numpy().astype(np.float64)
            n = len(hosts)
            outw = np.zeros(n)
            np.add.at(outw, src, w)
            dangling = outw == 0.0
            frac = w / outw[src]
            if seeds is None:
                r = None
                pr = np.full(n, 1.0 / n)
            else:
                sset = set(seeds)
                mask = np.fromiter(
                    (1.0 if h in sset else 0.0 for h in hosts), float, n
                )
                ns = int(mask.sum())
                if ns == 0:
                    raise ValueError(
                        "seeds do not intersect the graph's node set"
                    )
                r = mask / ns
                pr = r.copy()
            for _ in range(n_iter):
                contrib = np.zeros(n)
                np.add.at(contrib, dst, pr[src] * frac)
                dang = pr[dangling].sum()
                if seeds is None:
                    pr = (1.0 - damping) / n + damping * (
                        contrib + dang / n
                    )
                else:
                    pr = (1.0 - damping) * r + damping * (
                        contrib + dang * r
                    )
            order = np.lexsort((np.array(hosts), -pr))
            rank = np.empty(n, np.int64)
            rank[order] = np.arange(1, n + 1)
            return pa.table(
                {
                    "host": pa.array(hosts, pa.string()),
                    "pr": pa.array(pr, pa.float64()),
                    "pr_rank": pa.array(rank, pa.int64()),
                }
            )

        refs = edges.to_arrow_refs()
        return rd.from_arrow_refs([pagerank_task.remote(*refs)])

    # ---- distributed power iteration (edge-count-sized shuffles) ----
    # Every keyed step is a union-tag co-partition through grouped_apply
    # (rows from both sides tagged into one schema, hash-partitioned by
    # the key, then one vectorized polars pass per key-aligned block) —
    # NOT Dataset.join: a side whose distinct-key count is below the
    # partition count leaves empty hash partitions, and Ray emits those
    # as schema-less empty blocks that acero's join rejects ("No match
    # ... for key field reference"). The union-tag shape is immune (the
    # grouped map just skips empty blocks) and costs the same single
    # shuffle per step.
    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    n_parts = partitions_for(n_edges)

    # node set: every host that appears on either side
    def hosts_of(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": pa.concat_arrays(
                    [
                        t["src_host"].combine_chunks().cast(pa.string()),
                        t["dst_host"].combine_chunks().cast(pa.string()),
                    ]
                )
            }
        )

    def distinct_block(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .unique("host")
            .to_arrow()
            .cast(pa.schema([pa.field("host", pa.string())]))
        )

    nodes = grouped_apply(
        edges.map_batches(hosts_of, batch_format="pyarrow"),
        ["host"],
        distinct_block,
        num_partitions=n_parts,
    ).materialize()
    n_nodes = nodes.count()

    n_seeds = 0
    if seeds is not None:
        # |seeds ∩ nodes| via per-block membership sums (O(blocks) on
        # the driver; the seed list itself is driver-sized by contract)
        seed_list = list(seeds)
        parts = nodes.map_batches(
            lambda t: pa.table(
                {
                    "s": [
                        pl.from_arrow(t)
                        .filter(pl.col("host").is_in(seed_list))
                        .height
                    ]
                }
            ),
            batch_format="pyarrow",
        ).take_all()
        n_seeds = int(sum(r["s"] for r in parts))
        if n_seeds == 0:
            raise ValueError("seeds do not intersect the graph's node set")

    # transition fractions w/W[src], computed inside each key-aligned
    # block (all of a src's edges land together, so the per-src sum is
    # globally correct; int sums are exact in float64, so frac is
    # bit-equal to the small path's w/outw)
    frac_schema = pa.schema(
        [
            pa.field("src_host", pa.string()),
            pa.field("dst_host", pa.string()),
            pa.field("frac", pa.float64()),
        ]
    )

    def frac_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return (
            df.with_columns(
                (
                    pl.col("n_links").cast(pl.Float64)
                    / pl.col("n_links").sum().over("src_host").cast(pl.Float64)
                ).alias("frac")
            )
            .select("src_host", "dst_host", "frac")
            .to_arrow()
            .cast(frac_schema)
        )

    edges_frac = grouped_apply(
        edges, ["src_host"], frac_block, num_partitions=n_parts
    ).materialize()

    # init pr with a dangling flag (host has no out-edges), join-free:
    # node rows and src-marker rows co-partition by host
    pr_schema = pa.schema(
        [
            pa.field("host", pa.string()),
            pa.field("pr", pa.float64()),
            pa.field("dangling", pa.bool_()),
        ]
    )
    mark_schema = pa.schema(
        [pa.field("host", pa.string()), pa.field("is_src", pa.bool_())]
    )

    def node_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t["host"].combine_chunks().cast(pa.string()),
                "is_src": pa.array([False] * t.num_rows, pa.bool_()),
            }
        ).cast(mark_schema)

    def src_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t["src_host"].combine_chunks().cast(pa.string()),
                "is_src": pa.array([True] * t.num_rows, pa.bool_()),
            }
        ).cast(mark_schema)

    if seeds is None:
        init_pr_expr = pl.lit(1.0 / n_nodes)
    else:
        seed_list = list(seeds)
        init_pr_expr = (
            pl.when(pl.col("host").is_in(seed_list))
            .then(1.0 / n_seeds)
            .otherwise(0.0)
        )

    def init_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return (
            df.group_by("host")
            .agg((~pl.col("is_src").any()).alias("dangling"))
            .with_columns(init_pr_expr.alias("pr"))
            .select("host", "pr", "dangling")
            .to_arrow()
            .cast(pr_schema)
        )

    pr = grouped_apply(
        nodes.map_batches(node_rows, batch_format="pyarrow").union(
            edges.map_batches(src_rows, batch_format="pyarrow")
        ),
        ["host"],
        init_block,
        num_partitions=n_parts,
    ).materialize()

    def block_dangling_sum(ds: Dataset) -> float:
        # per-block partial sums, one float per block to the driver
        # (Dataset.sum plans a full HashAggregate — CC convergence-probe
        # lesson)
        parts = ds.map_batches(
            lambda t: pa.table(
                {
                    "s": [
                        pc.sum(
                            pc.if_else(t["dangling"], t["pr"], 0.0)
                        ).as_py()
                        or 0.0
                    ]
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ).take_all()
        return float(sum(r["s"] for r in parts))

    # per-round union-tag schemas: edge rows carry (frac, dst_host),
    # pr rows carry pr; structure rows carry dangling, contrib rows c
    flow_schema = pa.schema(
        [
            pa.field("key", pa.string()),
            pa.field("dst_host", pa.string()),
            pa.field("frac", pa.float64()),
            pa.field("pr", pa.float64()),
        ]
    )
    upd_schema = pa.schema(
        [
            pa.field("host", pa.string()),
            pa.field("dangling", pa.bool_()),
            pa.field("c", pa.float64()),
        ]
    )
    contrib_schema = pa.schema(
        [pa.field("host", pa.string()), pa.field("c", pa.float64())]
    )

    def edge_flow_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["src_host"],
                "dst_host": t["dst_host"],
                "frac": t["frac"],
                "pr": pa.nulls(t.num_rows, pa.float64()),
            }
        ).cast(flow_schema)

    def pr_flow_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["host"],
                "dst_host": pa.nulls(t.num_rows, pa.string()),
                "frac": pa.nulls(t.num_rows, pa.float64()),
                "pr": t["pr"],
            }
        ).cast(flow_schema)

    def contrib_block(t: pa.Table) -> pa.Table:
        # key-aligned: every edge of a src sits with that src's pr row;
        # per-dst sums here are PARTIAL (dst spans blocks) — finalized
        # by the grouped sum below
        df = pl.from_arrow(t)
        edf = df.filter(pl.col("frac").is_not_null()).select(
            "key", "dst_host", "frac"
        )
        if edf.height == 0:
            return contrib_schema.empty_table()
        prdf = df.filter(pl.col("pr").is_not_null()).select("key", "pr")
        return (
            edf.join(prdf, on="key", how="inner")
            .group_by("dst_host")
            .agg((pl.col("pr") * pl.col("frac")).sum().alias("c"))
            .rename({"dst_host": "host"})
            .to_arrow()
            .cast(contrib_schema)
        )

    def pr_struct_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t["host"],
                "dangling": t["dangling"],
                "c": pa.nulls(t.num_rows, pa.float64()),
            }
        ).cast(upd_schema)

    def contrib_tag_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t["host"],
                "dangling": pa.nulls(t.num_rows, pa.bool_()),
                "c": t["c"],
            }
        ).cast(upd_schema)

    for _ in range(n_iter):
        dang = block_dangling_sum(pr)
        base = (1.0 - damping) / n_nodes
        dang_term = dang / n_nodes
        contrib = grouped_apply(
            edges_frac.map_batches(edge_flow_rows, batch_format="pyarrow").union(
                pr.map_batches(pr_flow_rows, batch_format="pyarrow")
            ),
            ["key"],
            contrib_block,
            num_partitions=n_parts,
        )

        if seeds is None:
            # uniform restart — float-op grouping unchanged (oracles
            # mirror base + d*(c + dang/N) exactly)
            new_pr_expr = base + damping * (pl.col("c") + dang_term)
        else:
            # seeded restart: r per row; same expression shape as the
            # small path's (1-d)*r + d*(c + dang*r)
            r_expr = (
                pl.when(pl.col("host").is_in(list(seeds)))
                .then(1.0 / n_seeds)
                .otherwise(0.0)
            )
            new_pr_expr = (1.0 - damping) * r_expr + damping * (
                pl.col("c") + dang * r_expr
            )

        def update_block(
            t: pa.Table, new_pr_expr=new_pr_expr
        ) -> pa.Table:
            df = pl.from_arrow(t)
            struct = df.filter(pl.col("dangling").is_not_null()).select(
                "host", "dangling"
            )
            if struct.height == 0:
                return pr_schema.empty_table()
            csum = (
                df.filter(pl.col("c").is_not_null())
                .group_by("host")
                .agg(pl.col("c").sum().alias("c"))
            )
            return (
                struct.join(csum, on="host", how="left")
                .with_columns(pl.col("c").fill_null(0.0))
                .with_columns(new_pr_expr.alias("pr"))
                .select("host", "pr", "dangling")
                .to_arrow()
                .cast(pr_schema)
            )

        pr = grouped_apply(
            pr.map_batches(pr_struct_rows, batch_format="pyarrow").union(
                contrib.map_batches(contrib_tag_rows, batch_format="pyarrow")
            ),
            ["host"],
            update_block,
            num_partitions=n_parts,
        ).materialize()

    # global rank: sorted blocks + a block-size prefix scan (the
    # token_shard_assignment pattern) — rank = global position + 1,
    # no single-block repartition
    mat = (
        pr.select_columns(["host", "pr"])
        .sort(["pr", "host"], descending=[True, False])
        .materialize()
    )
    refs = mat.to_arrow_refs()

    @ray.remote
    def stamp_ranks(offset: int, block: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": block["host"].cast(pa.string()),
                "pr": block["pr"].cast(pa.float64()),
                "pr_rank": pa.array(
                    range(offset + 1, offset + 1 + block.num_rows), pa.int64()
                ),
            }
        )

    sizes = ray.get([_num_rows.remote(r) for r in refs])
    offsets = [0]
    for s in sizes[:-1]:
        offsets.append(offsets[-1] + s)
    return rd.from_arrow_refs(
        [stamp_ranks.remote(o, r) for o, r in zip(offsets, refs)]
    )


def site_linkgraph(pages: Dataset) -> Dataset:
    """-> (src_host, dst_host, n_links): the host-level edge rollup.
    src_host comes from the page's own url, dst_host from each resolved
    outlink."""
    from textalyzer_ray.stages.groups import key_counts

    def with_src(batch: pa.Table) -> pa.Table:
        links = _batch_outlinks(batch)
        df = pl.from_arrow(batch.select(["doc_id", "url"])).with_columns(
            pl.col("url")
            .str.extract(_HOST_RE, 1)
            .str.replace(r"^https?://", "")
            .alias("src_host")
        )
        ldf = pl.from_arrow(links).join(
            df.select("doc_id", "src_host"), on="doc_id", maintain_order="left"
        )
        out = ldf.select("src_host", pl.col("out_host").alias("dst_host")).to_arrow()
        return out.cast(
            pa.schema([pa.field("src_host", pa.string()), pa.field("dst_host", pa.string())])
        )

    edges = pages.map_batches(with_src, batch_format="pyarrow", zero_copy_batch=True)
    counts = key_counts(edges, ["src_host", "dst_host"])
    schema = pa.schema(
        [
            pa.field("src_host", pa.string()),
            pa.field("dst_host", pa.string()),
            pa.field("n_links", pa.int64()),
        ]
    )
    # cast large_string -> string (key_counts goes through polars);
    # downstream joins reject mixed string widths
    return counts.map_batches(
        lambda t: t.rename_columns(["src_host", "dst_host", "n_links"]).cast(
            schema
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def doc_linkgraph(pages: Dataset) -> Dataset:
    """-> (src_host, dst_host, n_links) at DOC granularity: the src
    node is the page itself (``doc:<doc_id>``), the dst its outlink's
    host — the bipartite page->host graph HITS runs on (pages act as
    pure hubs, hosts as pure authorities). Same rollup mechanism as
    site_linkgraph: html dies in the extraction batch, counts go
    through key_counts partials."""
    from textalyzer_ray.stages.groups import key_counts

    def doc_edges(batch: pa.Table) -> pa.Table:
        links = _batch_outlinks(batch)
        df = pl.from_arrow(links).select(
            ("doc:" + pl.col("doc_id").cast(pl.String)).alias("src_host"),
            pl.col("out_host").alias("dst_host"),
        )
        return df.to_arrow().cast(
            pa.schema(
                [
                    pa.field("src_host", pa.string()),
                    pa.field("dst_host", pa.string()),
                ]
            )
        )

    edges = pages.map_batches(
        doc_edges, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = key_counts(edges, ["src_host", "dst_host"])
    schema = pa.schema(
        [
            pa.field("src_host", pa.string()),
            pa.field("dst_host", pa.string()),
            pa.field("n_links", pa.int64()),
        ]
    )
    return counts.map_batches(
        lambda t: t.rename_columns(["src_host", "dst_host", "n_links"]).cast(
            schema
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def host_hits(
    edges: Dataset,
    n_iter: int = 8,
    small_threshold: int = 2_000_000,
) -> Dataset:
    """Kleinberg HITS hubs/authorities over a weighted edge rollup
    (src_host, dst_host, n_links) -> (host, hub: double, auth: double,
    hub_rank: bigint, auth_rank: bigint). ``n_iter`` full iterations of

        auth'[t] = sum_{(s,t,w)} hub[s]*w,   auth = auth'/||auth'||_2
        hub'[s]  = sum_{(s,t,w)} auth[t]*w,  hub  = hub'/||hub'||_2

    from hub == 1 everywhere (Kleinberg 1999; the reference CLI has no
    graph stage — link-authority extension like host_pagerank).

    Ranks order by (floor(x*1e9 + 0.5) DESC, host ASC): structurally
    symmetric nodes (pages with identical outlink profiles) produce
    float ties whose full-precision order is summation-order-dependent
    PER ENGINE, so ranks over raw doubles are not reproducible —
    quantized ties break by host everywhere (CLAUDE.md tie rule; the
    floor(x+0.5) form is the Python/SQL-parity rounding). The raw
    doubles stay in the output; their 9-decimal boundary margins are
    pinned in tests/test_pipelines_links.py.

    Two-path mechanism sized to the MEASURED edge count, exactly the
    host_pagerank shape: one numpy task below ``small_threshold``
    (rank mass is kilobytes; per-round shuffle actors would dominate);
    above it, each half-step is one union-tag co-partition keyed by
    the propagating endpoint (edge rows + score rows in one schema —
    Dataset.join rejects the schema-less empty blocks a low-cardinality
    side leaves behind) plus one key-aligned finalize per host, with
    the L2 norm probed as one partial float per block (the CC
    convergence-probe pattern — Dataset.sum plans a 200-partition
    HashAggregate per call)."""
    import numpy as np
    import ray.data as rd
    from ray.data import DataContext

    edges = edges.select_columns(
        ["src_host", "dst_host", "n_links"]
    ).materialize()
    edges.context.shuffle_strategy = DataContext.get_current().shuffle_strategy
    n_edges = edges.count()
    out_schema = pa.schema(
        [
            pa.field("host", pa.string()),
            pa.field("hub", pa.float64()),
            pa.field("auth", pa.float64()),
            pa.field("hub_rank", pa.int64()),
            pa.field("auth_rank", pa.int64()),
        ]
    )
    if n_edges == 0:
        return rd.from_arrow(out_schema.empty_table())

    if n_edges <= small_threshold:

        @ray.remote
        def hits_task(*blocks: pa.Table) -> pa.Table:
            df = pl.concat([pl.from_arrow(b) for b in blocks])
            srcs = df["src_host"].to_list()
            dsts = df["dst_host"].to_list()
            hosts = sorted(set(srcs) | set(dsts))
            idx = {h: i for i, h in enumerate(hosts)}
            src = np.fromiter((idx[h] for h in srcs), np.int64, len(srcs))
            dst = np.fromiter((idx[h] for h in dsts), np.int64, len(dsts))
            w = df["n_links"].to_numpy().astype(np.float64)
            n = len(hosts)
            hub = np.ones(n)
            auth = np.zeros(n)
            for _ in range(n_iter):
                auth = np.zeros(n)
                np.add.at(auth, dst, hub[src] * w)
                auth = auth / np.sqrt(np.sum(auth * auth))
                hub = np.zeros(n)
                np.add.at(hub, src, auth[dst] * w)
                hub = hub / np.sqrt(np.sum(hub * hub))
            harr = np.array(hosts)
            ranks = []
            for x in (hub, auth):
                q = np.floor(x * 1e9 + 0.5)
                order = np.lexsort((harr, -q))
                r = np.empty(n, np.int64)
                r[order] = np.arange(1, n + 1)
                ranks.append(r)
            return pa.table(
                {
                    "host": pa.array(hosts, pa.string()),
                    "hub": pa.array(hub, pa.float64()),
                    "auth": pa.array(auth, pa.float64()),
                    "hub_rank": pa.array(ranks[0], pa.int64()),
                    "auth_rank": pa.array(ranks[1], pa.int64()),
                }
            )

        refs = edges.to_arrow_refs()
        return rd.from_arrow_refs([hits_task.remote(*refs)])

    # ---- distributed power iteration (edge-count-sized exchanges) ----
    import math

    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    n_parts = partitions_for(n_edges)

    def hosts_of(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": pa.concat_arrays(
                    [
                        t["src_host"].combine_chunks().cast(pa.string()),
                        t["dst_host"].combine_chunks().cast(pa.string()),
                    ]
                )
            }
        )

    def distinct_block(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .unique("host")
            .to_arrow()
            .cast(pa.schema([pa.field("host", pa.string())]))
        )

    nodes = grouped_apply(
        edges.map_batches(hosts_of, batch_format="pyarrow"),
        ["host"],
        distinct_block,
        num_partitions=n_parts,
    )

    score_schema = pa.schema(
        [
            pa.field("host", pa.string()),
            pa.field("hub", pa.float64()),
            pa.field("auth", pa.float64()),
        ]
    )

    def init_block(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t["host"].combine_chunks().cast(pa.string()),
                "hub": pa.array([1.0] * t.num_rows, pa.float64()),
                "auth": pa.array([0.0] * t.num_rows, pa.float64()),
            }
        ).cast(score_schema)

    scores = nodes.map_batches(init_block, batch_format="pyarrow").materialize()

    flow_schema = pa.schema(
        [
            pa.field("key", pa.string()),
            pa.field("other", pa.string()),
            pa.field("w", pa.float64()),
            pa.field("s", pa.float64()),
        ]
    )
    contrib_schema = pa.schema(
        [pa.field("host", pa.string()), pa.field("c", pa.float64())]
    )
    upd_schema = pa.schema(
        [
            pa.field("host", pa.string()),
            pa.field("hub", pa.float64()),
            pa.field("auth", pa.float64()),
            pa.field("c", pa.float64()),
        ]
    )

    def edge_rows(key_col: str, other_col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": t[key_col],
                    "other": t[other_col],
                    "w": pc.cast(t["n_links"], pa.float64()),
                    "s": pa.nulls(t.num_rows, pa.float64()),
                }
            ).cast(flow_schema)

        return f

    def score_rows(push_col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": t["host"],
                    "other": pa.nulls(t.num_rows, pa.string()),
                    "w": pa.nulls(t.num_rows, pa.float64()),
                    "s": t[push_col],
                }
            ).cast(flow_schema)

        return f

    def contrib_block(t: pa.Table) -> pa.Table:
        # key-aligned: every edge whose propagating endpoint is k sits
        # with k's score row; per-other sums are PARTIAL (the other
        # endpoint spans blocks) — finalized by the host-keyed pass
        df = pl.from_arrow(t)
        edf = df.filter(pl.col("w").is_not_null()).select("key", "other", "w")
        if edf.height == 0:
            return contrib_schema.empty_table()
        sdf = df.filter(pl.col("s").is_not_null()).select("key", "s")
        return (
            edf.join(sdf, on="key", how="inner")
            .group_by("other")
            .agg((pl.col("s") * pl.col("w")).sum().alias("c"))
            .rename({"other": "host"})
            .to_arrow()
            .cast(contrib_schema)
        )

    def sc_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t["host"],
                "hub": t["hub"],
                "auth": t["auth"],
                "c": pa.nulls(t.num_rows, pa.float64()),
            }
        ).cast(upd_schema)

    def c_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t["host"],
                "hub": pa.nulls(t.num_rows, pa.float64()),
                "auth": pa.nulls(t.num_rows, pa.float64()),
                "c": t["c"],
            }
        ).cast(upd_schema)

    def half_step(
        scores: Dataset, key_col: str, other_col: str, push: str, out: str
    ) -> Dataset:
        contrib = grouped_apply(
            edges.map_batches(
                edge_rows(key_col, other_col), batch_format="pyarrow"
            ).union(scores.map_batches(score_rows(push), batch_format="pyarrow")),
            ["key"],
            contrib_block,
            num_partitions=n_parts,
        )

        def upd_block(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            sc = df.filter(pl.col("hub").is_not_null()).select(
                "host", "hub", "auth"
            )
            if sc.height == 0:
                return score_schema.empty_table()
            csum = (
                df.filter(pl.col("c").is_not_null())
                .group_by("host")
                .agg(pl.col("c").sum().alias("c"))
            )
            return (
                sc.join(csum, on="host", how="left")
                .with_columns(pl.col("c").fill_null(0.0))
                .drop(out)
                .rename({"c": out})
                .select("host", "hub", "auth")
                .to_arrow()
                .cast(score_schema)
            )

        raw = grouped_apply(
            scores.map_batches(sc_rows, batch_format="pyarrow").union(
                contrib.map_batches(c_rows, batch_format="pyarrow")
            ),
            ["host"],
            upd_block,
            num_partitions=n_parts,
        ).materialize()
        # L2 norm: one partial float per block to the driver
        parts = raw.map_batches(
            lambda t: pa.table(
                {
                    "ss": [
                        pc.sum(pc.multiply(t[out], t[out])).as_py() or 0.0
                    ]
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ).take_all()
        norm = math.sqrt(sum(r["ss"] for r in parts))

        def divide(t: pa.Table, norm=norm) -> pa.Table:
            return t.set_column(
                t.schema.get_field_index(out),
                out,
                pc.divide(t[out], pa.scalar(norm, pa.float64())),
            )

        return raw.map_batches(divide, batch_format="pyarrow").materialize()

    for _ in range(n_iter):
        scores = half_step(scores, "src_host", "dst_host", "hub", "auth")
        scores = half_step(scores, "dst_host", "src_host", "auth", "hub")

    # ranks: two quantized sorts with block-offset stamping (the
    # host_pagerank prefix-scan pattern); the second sort carries
    # hub_rank along so no final join is needed
    def add_q(t: pa.Table) -> pa.Table:
        qh = pc.floor(pc.add(pc.multiply(t["hub"], 1e9), 0.5))
        qa = pc.floor(pc.add(pc.multiply(t["auth"], 1e9), 0.5))
        return t.append_column("qh", qh).append_column("qa", qa)

    def stamped(ds: Dataset, sort_col: str, rank_col: str) -> Dataset:
        mat = ds.sort([sort_col, "host"], descending=[True, False]).materialize()
        refs = mat.to_arrow_refs()
        sizes = ray.get([_num_rows.remote(r) for r in refs])
        offsets = [0]
        for s in sizes[:-1]:
            offsets.append(offsets[-1] + s)

        @ray.remote
        def stamp(offset: int, block: pa.Table) -> pa.Table:
            return block.append_column(
                rank_col,
                pa.array(
                    range(offset + 1, offset + 1 + block.num_rows), pa.int64()
                ),
            )

        return rd.from_arrow_refs(
            [stamp.remote(o, r) for o, r in zip(offsets, refs)]
        )

    withq = scores.map_batches(add_q, batch_format="pyarrow")
    ranked = stamped(stamped(withq, "qh", "hub_rank"), "qa", "auth_rank")
    return ranked.map_batches(
        lambda t: t.select(["host", "hub", "auth", "hub_rank", "auth_rank"]),
        batch_format="pyarrow",
    )


def host_cocitation(
    pages: Dataset,
    min_count: int = 2,
    max_fanout: int = 64,
) -> Dataset:
    """Bipartite co-citation projection of the doc->host outlink graph
    -> (host_a, host_b, n_common, deg_a, deg_b, jaccard): hosts ranked
    similar when the same pages link both (Small 1973 co-citation; the
    host-similarity / mirror-detection signal of a web curation
    funnel). n_common = #docs linking both, deg = #docs linking each,
    jaccard = n_common / (deg_a + deg_b - n_common).

    Semantics (deterministic, SQL-replayable): distinct (doc, host)
    incidences only; docs with MORE than ``max_fanout`` distinct
    outlink hosts are excluded entirely (pair fan-out is C(fanout, 2)
    per doc — the cap is an eligibility rule, not a truncation, so the
    oracle states it as HAVING count(*) <= cap); pairs ordered
    host_a < host_b; only pairs with n_common >= ``min_count`` emit.

    Scale shape: a doc's hrefs all sit in one extraction batch, so the
    distinct/eligibility/pair expansion is a single vectorized polars
    pass per block — no doc ever shuffles. Pair rows (2 short strings)
    and degree rows (1 string, sentinel-tagged into the same schema so
    ONE extraction pass feeds both rollups) go through key_counts
    partials: hot host pairs pre-aggregate inside each block before
    any exchange. jaccard is one exact int/int double division
    (IEEE-identical in Python and DuckDB — CLAUDE.md r2 rule)."""
    from textalyzer_ray.pipelines.joins import union_tag_lookup
    from textalyzer_ray.stages.groups import key_counts

    pair_schema = pa.schema(
        [pa.field("host_a", pa.string()), pa.field("host_b", pa.string())]
    )

    def doc_pairs(batch: pa.Table) -> pa.Table:
        links = _batch_outlinks(batch)
        df = (
            pl.from_arrow(links)
            .select("doc_id", "out_host")
            .unique()
            .with_columns(pl.len().over("doc_id").alias("_fan"))
            .filter(pl.col("_fan") <= max_fanout)
        )
        a = df.select("doc_id", pl.col("out_host").alias("host_a"))
        b = df.select("doc_id", pl.col("out_host").alias("host_b"))
        pairs = (
            a.join(b, on="doc_id")
            .filter(pl.col("host_a") < pl.col("host_b"))
            .select("host_a", "host_b")
        )
        # degree rows ride the same schema with an empty-string
        # sentinel (a host string is never empty)
        degs = df.select(
            pl.col("out_host").alias("host_a"),
            pl.lit("").alias("host_b"),
        )
        return pl.concat([pairs, degs]).to_arrow().cast(pair_schema)

    combined = pages.map_batches(
        doc_pairs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def only_pairs(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["host_b"], ""))

    def only_degs(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["host_b"], "")).select(["host_a"])

    def at_least(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["count"], min_count))

    pc_counts = key_counts(
        combined.map_batches(
            only_pairs, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["host_a", "host_b"],
    ).map_batches(at_least, batch_format="pyarrow", zero_copy_batch=True)
    deg = key_counts(
        combined.map_batches(
            only_degs, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["host_a"],
    )

    count_schema = pa.schema(
        [
            pa.field("host_a", pa.string()),
            pa.field("host_b", pa.string()),
            pa.field("n_common", pa.int64()),
        ]
    )
    pairs = pc_counts.map_batches(
        lambda t: t.rename_columns(["host_a", "host_b", "n_common"]).cast(
            count_schema
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    deg_schema = pa.schema(
        [pa.field("host", pa.string()), pa.field("deg", pa.int64())]
    )
    deg = deg.map_batches(
        lambda t: t.rename_columns(["host", "deg"]).cast(deg_schema),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def keyed(name: str):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns([name, "deg"])

        return f

    with_a = union_tag_lookup(
        pairs,
        deg.map_batches(keyed("host_a"), batch_format="pyarrow"),
        "host_a",
        "deg",
        "deg_a",
    )
    with_b = union_tag_lookup(
        with_a,
        deg.map_batches(keyed("host_b"), batch_format="pyarrow"),
        "host_b",
        "deg",
        "deg_b",
    )

    out_schema = pa.schema(
        [
            pa.field("host_a", pa.string()),
            pa.field("host_b", pa.string()),
            pa.field("n_common", pa.int64()),
            pa.field("deg_a", pa.int64()),
            pa.field("deg_b", pa.int64()),
            pa.field("jaccard", pa.float64()),
        ]
    )

    def add_jaccard(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_common"], pa.float64())
        denom = pc.cast(
            pc.subtract(pc.add(t["deg_a"], t["deg_b"]), t["n_common"]),
            pa.float64(),
        )
        return t.append_column("jaccard", pc.divide(n, denom)).cast(out_schema)

    return with_b.map_batches(
        add_jaccard, batch_format="pyarrow", zero_copy_batch=True
    )


def url_templates(ds_urls: Dataset, url_col: str = "url") -> Dataset:
    """Frequent URL path-template mining: collapse ASCII digit runs in
    the path to ``{n}`` and count links + distinct URLs per (host,
    template) — the crawl-side structure census that finds calendar
    traps, pagination families and parameter explosions before they
    eat the frontier. ``[0-9]+`` (NOT ``\\d``: polars' Rust regex
    would match Unicode digits, DuckDB's RE2 would not).

    One vectorized per-block pass (host/path extract + replace) that
    PRE-AGGREGATES to distinct (host, template, url) triples with a
    partial link count before the ONE key-aligned exchange on (host,
    template) — on crawl corpora where duplicate links dominate the
    shuffle payload shrinks to near the distinct-URL cardinality (r4
    judge item #6: raw URL rows previously rode the exchange solely to
    feed n_unique). The per-group merge sums the partials and counts
    distinct urls, exact because grouped_apply holds each group wholly
    in one block. Output (host, template, n_links, n_urls), sorted."""
    from textalyzer_ray.stages.groups import grouped_apply

    out_schema = pa.schema(
        [
            pa.field("host", pa.string()),
            pa.field("template", pa.string()),
            pa.field("n_links", pa.int64()),
            pa.field("n_urls", pa.int64()),
        ]
    )
    mid_schema = pa.schema(
        [
            pa.field("host", pa.string()),
            pa.field("template", pa.string()),
            pa.field(url_col, pa.string()),
            pa.field("cnt", pa.int64()),
        ]
    )

    def to_template(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mid_schema.empty_table()
        df = (
            pl.from_arrow(t.select([url_col]))
            .select(
                pl.col(url_col)
                .str.extract(r"^https?://([^/]+)", 1)
                .fill_null("")
                .alias("host"),
                pl.col(url_col)
                .str.extract(r"^https?://[^/]+(/.*)$", 1)
                .fill_null("")
                .str.replace_all(r"[0-9]+", "{n}")
                .alias("template"),
                pl.col(url_col),
            )
            .group_by(["host", "template", url_col])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
            .select(["host", "template", url_col, "cnt"])
        )
        return df.to_arrow().cast(mid_schema)

    def count_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .group_by(["host", "template"])
            .agg(
                pl.col("cnt").sum().cast(pl.Int64).alias("n_links"),
                pl.col(url_col).n_unique().cast(pl.Int64).alias("n_urls"),
            )
            .select(["host", "template", "n_links", "n_urls"])
        )
        return df.to_arrow().cast(out_schema)

    mid = ds_urls.map_batches(to_template, batch_format="pyarrow")
    return grouped_apply(mid, ["host", "template"], count_block).sort(
        ["host", "template"]
    )


def resolve_redirects(
    edges: Dataset,
    n_rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    small_threshold: int = 2_000_000,
) -> Dataset:
    """Redirect-chain resolution by POINTER JUMPING: given a functional
    redirect map (each ``src`` redirects to exactly one ``dst``),
    resolve every node in the edge set to (node, root, hops) — root =
    the chain's fixpoint, hops = chain length. ``n_rounds`` doubling
    rounds resolve any chain of length <= 2**n_rounds (the classic
    parallel list-ranking recurrence: ptr' = ptr[ptr], hops' = hops +
    hops[ptr] — Wyllie 1979), so a SQL oracle unrolls the SAME
    recurrence as MATERIALIZED CTEs and every output is
    integer/string-exact.

    Scale shape: state is node-sized (node, ptr, hops). Below
    ``small_threshold`` edges the whole resolution runs in ONE remote
    numpy task (searchsorted jump tables); larger maps run per round
    ONE union-tag hash exchange keyed by the probe pointer (each
    block joins its probe rows against its state rows — the
    host_pagerank union-tag pattern, no acero, string keys fine).
    Roots (dst-only nodes) enter as (node, node, 0) fixpoints, so the
    jump recurrence is uniform — no per-row branching.

    Precondition (asserted): ``src`` values unique — a src with two
    redirect targets is not a functional map."""
    import numpy as np
    import ray
    import ray.data as rd

    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    node_t = pa.string() if edges.schema() is None else (
        edges.schema().base_schema.field(src_col).type
    )
    out_schema = pa.schema(
        [
            pa.field("node", node_t),
            pa.field("root", node_t),
            pa.field("hops", pa.int64()),
        ]
    )
    edge_schema = pa.schema(
        [pa.field("src", node_t), pa.field("dst", node_t)]
    )

    es = edges.map_batches(
        lambda t: pa.table(
            {"src": t[src_col], "dst": t[dst_col]}, schema=edge_schema
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    m = es.count()
    if m == 0:
        return rd.from_arrow(out_schema.empty_table())

    if m <= small_threshold:

        @ray.remote
        def resolve_task(*blocks: pa.Table) -> pa.Table:
            t = pa.concat_tables(blocks)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            su = np.unique(src)
            if len(su) != len(src):
                raise ValueError("redirect map is not functional (dup src)")
            nodes = np.unique(np.concatenate([src, dst]))
            # init: ptr[node] = dst for srcs, node for roots
            ptr = nodes.copy()
            hops = np.zeros(len(nodes), dtype=np.int64)
            si = np.searchsorted(nodes, src)  # unique (src unique)
            ptr[si] = dst
            hops[si] = 1
            for _ in range(n_rounds):
                j = np.searchsorted(nodes, ptr)
                hops = hops + hops[j]
                ptr = ptr[j]
            return pa.table(
                {
                    "node": pa.array(nodes).cast(node_t),
                    "root": pa.array(ptr).cast(node_t),
                    "hops": pa.array(hops, pa.int64()),
                },
                schema=out_schema,
            )

        return rd.from_arrow_refs([resolve_task.remote(*es.to_arrow_refs())])

    # ---- distributed pointer jumping ----
    n_parts = partitions_for(m)
    state_schema = pa.schema(
        [
            pa.field("node", node_t),
            pa.field("ptr", node_t),
            pa.field("hops", pa.int64()),
        ]
    )
    # init state: src rows -> (src, dst, 1); dst-only nodes -> (d, d, 0)
    tag_schema = pa.schema(
        [pa.field("node", node_t), pa.field("ptr", node_t),
         pa.field("hops", pa.int64()), pa.field("__side", pa.int8())]
    )

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        srcs = pa.table(
            {
                "node": t["src"],
                "ptr": t["dst"],
                "hops": pa.array([1] * n, pa.int64()),
                "__side": pa.array([1] * n, pa.int8()),
            },
            schema=tag_schema,
        )
        dsts = pa.table(
            {
                "node": t["dst"],
                "ptr": t["dst"],
                "hops": pa.array([0] * n, pa.int64()),
                "__side": pa.array([0] * n, pa.int8()),
            },
            schema=tag_schema,
        )
        return pa.concat_tables([srcs, dsts])

    def init_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return state_schema.empty_table()
        df = pl.from_arrow(t)
        srcs = df.filter(pl.col("__side") == 1)
        if srcs.select(pl.col("node").n_unique()).item() != srcs.height:
            raise ValueError("redirect map is not functional (dup src)")
        src_nodes = srcs.select("node")
        roots = (
            df.filter(pl.col("__side") == 0)
            .unique(subset=["node"], maintain_order=False)
            .join(src_nodes, on="node", how="anti")
        )
        return (
            pl.concat([srcs, roots])
            .select(["node", "ptr", "hops"])
            .to_arrow()
            .cast(state_schema)
        )

    state = grouped_apply(
        es.map_batches(tag_edges, batch_format="pyarrow"),
        ["node"],
        init_block,
        num_partitions=n_parts,
    ).materialize()

    probe_schema = pa.schema(
        [pa.field("key", node_t), pa.field("node", node_t),
         pa.field("ptr", node_t), pa.field("hops", pa.int64()),
         pa.field("__side", pa.int8())]
    )

    def tag_state(t: pa.Table) -> pa.Table:
        n = t.num_rows
        probe = pa.table(
            {
                "key": t["ptr"],
                "node": t["node"],
                "ptr": t["ptr"],
                "hops": t["hops"],
                "__side": pa.array([1] * n, pa.int8()),
            },
            schema=probe_schema,
        )
        table = pa.table(
            {
                "key": t["node"],
                "node": t["node"],
                "ptr": t["ptr"],
                "hops": t["hops"],
                "__side": pa.array([0] * n, pa.int8()),
            },
            schema=probe_schema,
        )
        return pa.concat_tables([probe, table])

    def jump_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return state_schema.empty_table()
        df = pl.from_arrow(t)
        probes = df.filter(pl.col("__side") == 1).select(
            "key", "node", "hops"
        )
        tables = df.filter(pl.col("__side") == 0).select(
            "key",
            pl.col("ptr").alias("_tptr"),
            pl.col("hops").alias("_thops"),
        )
        out = (
            probes.join(tables, on="key", how="inner")
            .select(
                "node",
                pl.col("_tptr").alias("ptr"),
                (pl.col("hops") + pl.col("_thops")).alias("hops"),
            )
        )
        return out.to_arrow().cast(state_schema)

    for _ in range(n_rounds):
        state = grouped_apply(
            state.map_batches(tag_state, batch_format="pyarrow"),
            ["key"],
            jump_block,
            num_partitions=n_parts,
        ).materialize()

    return state.map_batches(
        lambda t: pa.table(
            {"node": t["node"], "root": t["ptr"], "hops": t["hops"]},
            schema=out_schema,
        ),
        batch_format="pyarrow",
    ).sort("node")
