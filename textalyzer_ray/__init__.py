"""textalyzer_ray — a Ray-Data-native text metrics & extraction engine.

A from-scratch reimplementation of the query/data-processing capabilities
of ad-si/Textalyzer (reference at /root/reference, a single-machine Rust
CLI) re-expressed as streaming Ray Data pipelines over Arrow batches,
generalized to web-scale corpora (Common-Crawl-style Parquet pages) with
main-content extraction, readability scoring, corpus-level dedup and
similarity search.

Layout:
- ``core``      pure-Python single-document semantics ("oracles", no Ray).
- ``stages``    vectorized ``map_batches`` callables / actor classes.
- ``sources``   readers + deterministic synthetic web-page generator.
- ``pipelines`` composed ``ray.data.Dataset`` pipelines (the public API).
- ``state``     partition-addressed resumable output + lineage manifests.
"""

__version__ = "0.1.0"
