"""Per-partition lineage manifests + checkpoint resume."""

from textalyzer_ray.state.manifest import (  # noqa: F401
    PartitionManifest,
    PartitionedRunner,
)
