"""Engine-wide DataContext defaults.

NOTE on shuffle strategy: Ray 2.49's ``ShuffleStrategy.HASH_SHUFFLE``
enables key-based ``repartition(keys=...)`` (key-aligned blocks; a
grouped count via repartition+polars measured 13x faster than Ray's
sort-based groupby at 49k groups) — but setting it GLOBALLY deadlocks
pipelines on small CPU budgets (its aggregator actors starve alongside
our actor pools; the full test suite hangs at num_cpus=4). Until it can
be scoped per-stage we stay on the default sort shuffle and use the
polars partial+tree-merge pattern (stages.groups) for high-cardinality
aggregation.
"""

from __future__ import annotations


def tune_data_context():
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    return ctx
