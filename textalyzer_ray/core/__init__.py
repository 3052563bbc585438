"""Pure-Python single-document semantics (no Ray).

These functions define the exact per-document behavior of every operator;
the distributed stages in ``textalyzer_ray.stages`` must agree with them
bit-for-bit, and the test suite asserts it. Reference semantics are cited
per function (file:line into /root/reference).
"""

from textalyzer_ray.core.textmetrics import (  # noqa: F401
    display_width,
    frequency_map,
    split_lines,
    tokenize,
    trimmed_byte_len,
)
