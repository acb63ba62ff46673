"""SPMD parallelism: device meshes and parameter/activation shardings.

Replaces the reference's torchrun DDP/FSDP + NCCL stack
(docs/2-Training.md:42, train/train.py:529-549, grounding_evaluation/
util/dist.py) with jax.sharding over ICI: pjit-compatible NamedSharding
specs; XLA inserts the collectives.
"""

from video_llava_tpu.parallel.mesh import make_mesh
from video_llava_tpu.parallel.sharding import (
    batch_spec,
    cache_spec,
    constrain_kv_cache,
    shard_params,
    videollava_param_specs,
)
