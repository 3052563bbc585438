"""Vectorized ``map_batches`` callables and actor-pool classes.

Plain functions = stateless Ray tasks; callable classes = actor pools
(setup in ``__init__`` once per actor, work in ``__call__`` per batch).
All hot-path stages are Arrow-native (``batch_format="pyarrow"``) and
vectorized via pyarrow.compute / polars / numpy — no per-row Python in
the token/line paths. Per-document Python appears only where the work is
inherently per-document (HTML parsing, syllable counting) and then only
inside actor pools sized by ``concurrency``.
"""
