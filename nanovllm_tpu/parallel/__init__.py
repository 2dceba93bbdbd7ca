"""Parallelism: device mesh construction and sharding specs.

The reference's TP layer family (Column/Row/QKV/Merged parallel linears,
vocab-parallel embedding, src/layers/linear.rs + embed_head.rs) with its
stubbed collectives (linear.rs:236-238) maps here to mesh PartitionSpecs:
XLA inserts the psum/all-gather over ICI under jit.
"""

from nanovllm_tpu.parallel.mesh import build_mesh
from nanovllm_tpu.parallel.sharding import (
    kv_cache_pspec,
    metadata_pspecs,
    param_pspecs,
    shard_params,
)

__all__ = [
    "build_mesh",
    "param_pspecs",
    "kv_cache_pspec",
    "metadata_pspecs",
    "shard_params",
]
