"""The flagship pipeline: web pages -> extracted text -> per-doc metrics
-> corpus aggregates (north_star shape: read_parquet -> extract (actor
pool) -> tokenize/score -> histogram groupby -> write/collect).

Input schema per BASELINE.json input_hint:
(url, warc_ts, html:binary, text, lang).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

from textalyzer_ray.stages.analyze import DocScorer
from textalyzer_ray.stages.extract import HtmlExtractor, keep_valid
from textalyzer_ray.stages.pools import default_pool


def extract_pages(
    ds: Dataset,
    html_col: str = "html",
    out_col: str = "text",
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    keep_only_valid: bool = True,
) -> Dataset:
    """html:binary -> extracted text (+ drop bookkeeping).

    Actor pool: HTML parsing is per-doc Python, amortized across the
    pool; modest batch_size keeps per-batch latency and memory bounded
    when pages are large.
    """
    if concurrency is None:
        concurrency = default_pool()
    out = ds.map_batches(
        HtmlExtractor,
        fn_constructor_kwargs={"html_col": html_col, "out_col": out_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if keep_only_valid:
        out = out.map_batches(keep_valid, batch_format="pyarrow")
    return out


def extract_page_meta(
    ds: Dataset,
    html_col: str = "html",
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
) -> Dataset:
    """html:binary -> head-metadata columns (title, canonical,
    description, robots, og_site_name, og_title; absent tags null) —
    the crawl-side page profile (canonical clusters, robots noindex
    gates, og rollups) that runs BEFORE main-content extraction in a
    curation funnel. Same actor-pool shape as extract_pages; only the
    head slice of each page is parsed (core.extract.extract_head_meta),
    so cost is O(head) per doc."""
    from textalyzer_ray.stages.extract import MetaExtractor

    if concurrency is None:
        concurrency = default_pool()
    return ds.map_batches(
        MetaExtractor,
        fn_constructor_kwargs={"html_col": html_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def drop_stats(ds_extracted: Dataset) -> dict[str, int]:
    """Counter metrics for the validity filter (reference drops silently,
    file_utils.rs:176-177; we count): {"", "binary", "invalid_utf8",
    "empty"} -> row count. Small aggregate — safe to collect."""
    from ray.data.aggregate import Count

    rows = (
        ds_extracted.groupby("drop_reason").aggregate(Count(alias_name="n")).take_all()
    )
    return {r["drop_reason"]: r["n"] for r in rows}


class _ExtractAndScore:
    """Fused extractor + scorer: the whole per-doc half of the flagship
    in ONE stage (two chained pools oversubscribe the node and pay
    double spin-up — measured: 32 cpus slower than 8)."""

    def __init__(self, html_col: str):
        self.extract = HtmlExtractor(html_col=html_col, out_col="text")
        self.score = DocScorer(text_col="text")
        self.html_col = html_col

    def __call__(self, batch):
        import pyarrow.compute as pc

        extracted = self.extract(batch)
        valid = extracted.filter(pc.field("ok")).drop_columns(
            ["ok", "drop_reason", self.html_col]
        )
        return self.score(valid)


def page_metrics(
    ds: Dataset,
    html_col: str = "html",
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
) -> Dataset:
    """Extract + full per-doc metric suite (tokens, readability,
    quality): the per-document half of the flagship pipeline. Invalid
    pages (binary / bad UTF-8 / empty) are dropped here; use
    extract_pages(keep_only_valid=False) + drop_stats for the counters.

    Runs as a STATELESS TASK pool by default: the fused stage holds no
    heavy per-actor state (stdlib parser, pure-python scorers), and task
    scheduling measurably out-throughputs a fixed actor pool here
    (8.8s vs 14.1s on 240k docs at 32 cpus). Pass ``concurrency`` to
    force an actor pool when a real model/parser must be loaded once
    per worker.
    """
    if concurrency is not None:
        return ds.map_batches(
            _ExtractAndScore,
            fn_constructor_args=(html_col,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    def fused(batch):
        return _ExtractAndScore(html_col)(batch)

    return ds.map_batches(fused, batch_format="pyarrow", batch_size=batch_size)


def flagship(ds_pages: Dataset, concurrency: int | tuple[int, int] | None = None) -> Dataset:
    """pages -> per-doc metrics dataset (consume with write_parquet or
    feed word_histogram for the corpus aggregate)."""
    return page_metrics(ds_pages, concurrency=concurrency)
