"""Multi-chip scale-out (SURVEY.md §2.3, §5 "Distributed communication").

The reference is single-process single-GPU; scale-out here is TPU-native by
construction: a ``jax.sharding.Mesh`` with a ``data`` axis (frame-pair
batches over ICI — the primary strategy, BASELINE.json config 5) and an
optional ``spatial`` axis (H-dimension sharding for very large frames; XLA
inserts the conv halo exchanges automatically). All collectives are
XLA-emitted from NamedSharding-annotated jit — there is no hand-written
communication layer to maintain.
"""

from rrin_tpu.parallel.sharding import (
    batch_sharding,
    make_mesh,
    replicate,
    replicate_params,
    shard_pairs,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "replicate_params",
    "shard_pairs",
]
