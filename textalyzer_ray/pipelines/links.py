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
from ray.data import Dataset

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
    return counts.map_batches(
        lambda t: t.rename_columns(["out_host", "n_links"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
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
    return counts.map_batches(
        lambda t: t.rename_columns(["src_host", "dst_host", "n_links"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
