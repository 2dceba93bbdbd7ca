"""PartitionSpecs for the Qwen3 params pytree, KV caches, and batch metadata.

Tensor-parallel layout (reference capability map, SURVEY §2.12):
- qkv / gate_up: output dim sharded over "model"  (ColumnParallelLinear,
  linear.rs:88-173 / QKVParallelLinear 275-371 / Merged 378-454)
- o / down: input dim sharded over "model" — XLA inserts the psum the
  reference left as a TODO (RowParallelLinear, linear.rs:236-238)
- embedding / lm_head: vocab dim sharded over "model"
  (VocabParallelEmbedding / ParallelLMHead, embed_head.rs:16-366)
- KV caches: kv_heads dim sharded over "model" (per-rank KV heads,
  model_runner.rs:372)
- Batch arrays: flat-token and sequence dims sharded over "data".

`jax.jit` with these shardings compiles one SPMD program; collectives ride
ICI. No per-rank weight slicing code is needed — `jax.device_put` with a
NamedSharding splits the host array across the mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from nanovllm_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL


def param_pspecs(tie_word_embeddings: bool = False) -> dict:
    """PartitionSpec pytree mirroring models/qwen3.init_params layout."""
    specs = {
        # Vocab-sharded embedding: gathers become all-gathers over "model".
        "embedding": P(AXIS_MODEL, None),
        "layers": {
            "input_ln": P(None, None),
            "qkv": P(None, None, AXIS_MODEL),       # column-parallel (packed)
            "qkv_bias": P(None, AXIS_MODEL),        # follows qkv's out dim
            "q_norm": P(None, None),
            "k_norm": P(None, None),
            "o": P(None, AXIS_MODEL, None),          # row-parallel (+psum)
            "post_ln": P(None, None),
            "gate_up": P(None, None, AXIS_MODEL),    # column-parallel (packed)
            "down": P(None, AXIS_MODEL, None),       # row-parallel (+psum)
        },
        "final_ln": P(None),
    }
    if not tie_word_embeddings:
        specs["lm_head"] = P(AXIS_MODEL, None)
    return specs


def _quantize_spec(spec: P, qt) -> object:
    """Mirror a weight PartitionSpec onto a QuantizedTensor node: the data
    carries the weight's spec (the packed in-dim shards like the in-dim);
    scales [..., in/G, out] shard likewise EXCEPT size-1 dims (per-channel
    scales collapse the in dim), which must stay replicated."""
    from nanovllm_tpu.ops.quant import QuantizedTensor

    axes = list(spec) + [None] * (len(qt.scale.shape) - len(spec))
    scale_spec = P(*[
        None if qt.scale.shape[i] == 1 else axes[i]
        for i in range(len(qt.scale.shape))
    ])
    # The asymmetric int4 bias shares the scale's [..., in/G, out] shape and
    # shards identically.
    return QuantizedTensor(data=spec, scale=scale_spec, bits=qt.bits,
                           group_size=qt.group_size, pack=qt.pack,
                           bias=None if qt.bias is None else scale_spec)


def param_pspecs_for(params: dict, tie_word_embeddings: bool = False) -> dict:
    """param_pspecs adapted to the actual params tree: QuantizedTensor /
    QuantizedEmbedding leaves get matching spec nodes."""
    from nanovllm_tpu.ops.quant import QuantizedEmbedding, QuantizedTensor

    specs = param_pspecs(tie_word_embeddings)
    out_layers = {}
    # Keyed off the params tree: model families include/omit optional
    # leaves (q/k norms, qkv biases).
    for k, leaf in params["layers"].items():
        spec = specs["layers"][k]
        out_layers[k] = (
            _quantize_spec(spec, leaf) if isinstance(leaf, QuantizedTensor) else spec
        )
    specs = dict(specs)
    specs["layers"] = out_layers
    for k in ("embedding", "lm_head"):
        if isinstance(params.get(k), QuantizedEmbedding):
            # data [V, D] and scale [V] both vocab-sharded like the spec.
            specs[k] = QuantizedEmbedding(
                data=specs[k], scale=P(AXIS_MODEL), dtype=params[k].dtype
            )
    return specs


def kv_cache_pspec() -> P:
    """[layers, num_blocks, kv_heads, block_size, head_dim] — KV heads over
    the model axis; the block pool is replicated within a slice."""
    return P(None, None, AXIS_MODEL, None, None)


def metadata_pspecs() -> dict:
    """Shardings for (token_ids, AttentionMetadata) batch arrays: token and
    sequence dims over "data"."""
    return {
        "token_ids": P(AXIS_DATA),
        "meta": {
            "slot_mapping": P(AXIS_DATA),
            "positions": P(AXIS_DATA),
            "token_seq": P(AXIS_DATA),
            "token_qcol": P(AXIS_DATA),
            "block_tables": P(AXIS_DATA, None),
            "context_lens": P(AXIS_DATA),
            "logits_idx": P(AXIS_DATA),
            "q_gather": P(AXIS_DATA, None),
            "q_positions": P(AXIS_DATA, None),
        },
    }


def shard_params(mesh: Mesh, params: dict, tie_word_embeddings: bool = False) -> dict:
    specs = param_pspecs_for(params, tie_word_embeddings)

    def check_and_place(a, s):
        # Fail with the tensor's shape and axis instead of jax's generic
        # uneven-sharding error. The classic trip wire: a ROW-PARALLEL
        # quantized weight whose scale plane has in_dim/group_size rows
        # not divisible by tp (e.g. in=1600 -> G=64 -> 25 rows at tp=8);
        # pick a group size with in/G % tp == 0 (quantize group_size
        # knob) or a tp that divides it.
        for i, ax in enumerate(s):
            if ax is None:
                continue
            n = mesh.shape[ax]
            if a.shape[i] % n != 0:
                raise ValueError(
                    f"cannot shard tensor of shape {a.shape} over mesh axis "
                    f"{ax!r} ({n} shards): dim {i} ({a.shape[i]}) is not "
                    f"divisible. For quantized weights this is usually the "
                    f"scale plane (rows = in_dim/group_size) — choose a "
                    f"group size with in/G divisible by tensor_parallel_size."
                )
        return jax.device_put(a, NamedSharding(mesh, s))

    return jax.tree.map(check_and_place, params, specs)


def shard_kv_caches(mesh: Mesh, k_cache, v_cache) -> tuple:
    sh = NamedSharding(mesh, kv_cache_pspec())
    # Scale planes of INT8 tuple caches drop the head_dim axis.
    sh_scale = NamedSharding(mesh, P(None, None, AXIS_MODEL, None))

    def place(c):
        if isinstance(c, tuple):
            return (jax.device_put(c[0], sh), jax.device_put(c[1], sh_scale))
        return jax.device_put(c, sh)

    return place(k_cache), place(v_cache)
