"""Actor-pool sizing helper.

A pool that reserves every CPU starves the read/write stages and the
pipeline serializes (ray_guide "Stateful stages"); default to an
autoscaling pool capped below the cluster CPU count so readers, the
shuffle, and other stages keep breathing room.
"""

from __future__ import annotations

import ray


def default_pool(cap: int | None = None) -> tuple[int, int]:
    """(1, n) autoscaling pool; n = cluster CPUs - 2, bounded to [1, cap]."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    n = max(cpus - 2, 1)
    if cap is not None:
        n = min(n, cap)
    return (1, n)
