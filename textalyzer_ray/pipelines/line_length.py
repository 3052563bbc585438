"""Line-length histogram pipeline (SURVEY.md G3/O5; reference:
textalyzer/src/line_length.rs:13-37, JSON order :107-108).

The width domain is tiny (0..~few hundred), so each batch emits a
partial histogram (combiner) and the final ``groupby("length").sum`` is
negligible — line rows never shuffle.
"""

from __future__ import annotations

from ray.data import Dataset
from ray.data.aggregate import Sum

from textalyzer_ray.stages.lines import partial_width_histogram


def line_length_histogram(ds: Dataset, text_col: str = "text") -> Dataset:
    """Dataset[.., text] -> Dataset[length:int32, count:int64] asc."""
    return (
        ds.map_batches(
            lambda t: partial_width_histogram(t, text_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("length")
        .aggregate(Sum("count", alias_name="count"))
        .sort("length")
    )
