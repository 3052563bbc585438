"""Shared mutable state: per-partition lineage manifests + checkpoint
resume, and the sharded stateful services (the raw-Ray-actor tier the
Dataset API cannot express — each checkpointable, each with its batch
twin pinned equal in tests):

- ``lsh_index``     incremental MinHash-LSH near-dup index
- ``vector_index``  incremental IVF ANN index
- ``stream_window`` event-time windows with watermark + late drop
- ``stream_join``   band join with watermark-bounded state
- ``cardinality``   HyperLogLog distinct-count accumulator
"""

from textalyzer_ray.state.manifest import (  # noqa: F401
    PartitionManifest,
    PartitionedRunner,
)
