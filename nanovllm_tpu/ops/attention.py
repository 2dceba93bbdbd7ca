"""Paged attention over the block-structured KV cache — jnp reference path.

Capability parity with the reference attention layer
(src/layers/attention.rs:65-339): KV scatter-writes into the paged cache,
prefill (with or without a cached prefix) and paged decode — but as ONE
unified batched op instead of three per-sequence Rust loops. The reference's
per-sequence naive loops (attention.rs:162-171, 193-206, 278-287) are the
"must become a kernel" hot spots; this module is the numerics oracle, the
Pallas kernels in `ragged_paged_attention.py` are the fast path.

Layout: KV cache per layer is `[num_blocks, kv_heads, block_size, head_dim]`
(the reference keeps `[num_blocks, block_size, kv_heads, head_dim]`,
model_runner.rs:364-396; we put kv_heads BEFORE block_size so a DMA of one
block arrives in VMEM as `[kv_heads, block_size, head_dim]` — exactly the
batched-matmul layout the Pallas kernels consume, no in-VMEM transpose).
Queries arrive flat `[T, heads, dim]` (mixed prefill/decode tokens);
attention gathers each sequence's KV through its block table and applies the
causal mask in absolute positions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nanovllm_tpu.utils.metadata import AttentionMetadata

_NEG_INF = -1e30


def kv_cache_write(
    cache, values: jax.Array, slot_mapping: jax.Array, layer_idx
):
    """Scatter per-token K or V vectors into one layer of the stacked cache.

    cache: [num_layers, num_blocks, kv_heads, block_size, head_dim] — the
      FULL stacked cache (it lives in the layer-scan carry so XLA keeps the
      scatter in place on the donated buffer instead of round-tripping the
      whole cache through scan xs/ys copies). A quantized cache (int8 or
      float8_e4m3fn) is the tuple (data, scale f32 [L, NB, Hkv, BS]):
      values are quantized per-(token, head) with amax/qmax scales.
    values: [T, kv_heads, head_dim]; slot_mapping: [T] = block*block_size +
      offset (-1 entries dropped); layer_idx: scalar int32.
    Reference capability: attention.rs:150-174 (store_kv_cache).
    """
    if isinstance(cache, tuple):
        data, scale_cache = cache
        vf = values.astype(jnp.float32)
        amax = jnp.max(jnp.abs(vf), axis=-1)  # [T, Hkv]
        if data.dtype == jnp.int8:
            scales = jnp.maximum(amax / 127.0, 1e-10)
            q = jnp.clip(jnp.round(vf / scales[..., None]), -127, 127).astype(jnp.int8)
        else:  # float8_e4m3fn: scale rows into the full e4m3 range (±448)
            scales = jnp.maximum(amax / 448.0, 1e-10)
            q = (vf / scales[..., None]).astype(data.dtype)
        data = kv_cache_write(data, q, slot_mapping, layer_idx)
        scale_cache = _kv_scale_write(scale_cache, scales, slot_mapping, layer_idx)
        return data, scale_cache
    num_layers, num_blocks, kv_heads, block_size, head_dim = cache.shape
    T = values.shape[0]
    flat = cache.reshape(num_layers * num_blocks * kv_heads * block_size, head_dim)
    # Flat row of (layer, block, head, offset):
    #   ((layer*NB + block)*Hkv + head)*BS + offset
    block = slot_mapping // block_size
    offset = slot_mapping % block_size
    base = (layer_idx * num_blocks + block) * (kv_heads * block_size) + offset
    rows = base[:, None] + jnp.arange(kv_heads, dtype=jnp.int32)[None, :] * block_size
    # Padding sentinel must be OUT OF BOUNDS POSITIVE: negative indices WRAP
    # under numpy semantics (-1 = last row) even with mode="drop", which
    # would corrupt the last block with padded-token garbage.
    oob = jnp.int32(flat.shape[0])
    rows = jnp.where(slot_mapping[:, None] >= 0, rows, oob)  # [T, kv_heads]
    flat = flat.at[rows.reshape(-1)].set(
        values.astype(cache.dtype).reshape(T * kv_heads, head_dim), mode="drop"
    )
    return flat.reshape(cache.shape)


def _kv_scale_write(
    scale_cache: jax.Array, scales: jax.Array, slot_mapping: jax.Array, layer_idx
) -> jax.Array:
    """Scatter per-(token, head) quantization scales into the
    [L, NB, Hkv, BS] scale cache (mirrors kv_cache_write's slot math)."""
    num_layers, num_blocks, kv_heads, block_size = scale_cache.shape
    T = scales.shape[0]
    flat = scale_cache.reshape(num_layers * num_blocks * kv_heads * block_size)
    block = slot_mapping // block_size
    offset = slot_mapping % block_size
    base = (layer_idx * num_blocks + block) * (kv_heads * block_size) + offset
    rows = base[:, None] + jnp.arange(kv_heads, dtype=jnp.int32)[None, :] * block_size
    oob = jnp.int32(flat.shape[0])
    rows = jnp.where(slot_mapping[:, None] >= 0, rows, oob)
    flat = flat.at[rows.reshape(-1)].set(scales.reshape(T * kv_heads), mode="drop")
    return flat.reshape(scale_cache.shape)


def paged_attention_ref(
    q: jax.Array,
    k_cache,
    v_cache,
    layer_idx,
    meta: AttentionMetadata,
    scale: float,
    sliding_window: int = None,
    logit_softcap: float = None,
) -> jax.Array:
    """Unified paged attention (prefill + decode) via block-table gather.

    q: [T, num_heads, head_dim] (RoPE already applied)
    k_cache/v_cache: [num_layers, num_blocks, kv_heads, block_size, head_dim]
      stacked caches — must already contain this step's K/V (scatter first,
      then attend); layer_idx selects the layer inside the gather so no full
      layer slice is materialized.
    sliding_window: Mistral/Qwen2-style local attention — key visible iff
      q_pos - k_pos < sliding_window (HF transformers semantics; None =
      full causal attention).
    Returns [T, num_heads, head_dim].
    """
    T, num_heads, head_dim = q.shape
    k_scales = v_scales = None
    if isinstance(k_cache, tuple):
        k_cache, k_scales = k_cache
        v_cache, v_scales = v_cache
    _, num_blocks, kv_heads, block_size, _ = k_cache.shape
    S, max_blocks = meta.block_tables.shape
    Q = meta.q_gather.shape[1]
    L = max_blocks * block_size
    groups = num_heads // kv_heads

    # Gather per-sequence K/V: [S, B, kv_heads, block_size, head_dim]. Padded
    # block-table entries (-1) clip to block 0; their positions are masked
    # below. Flatten (B, block_size) -> L with kv_heads kept inside.
    tables = jnp.clip(meta.block_tables, 0, num_blocks - 1)
    k = k_cache[layer_idx, tables]  # [S, B, Hkv, BS, Dh]
    v = v_cache[layer_idx, tables]
    if k_scales is not None:
        # INT8 KV: dequantize with the gathered per-row scales.
        k = k.astype(jnp.float32) * k_scales[layer_idx, tables][..., None]
        v = v.astype(jnp.float32) * v_scales[layer_idx, tables][..., None]
    k = jnp.einsum("sbhcd->shbcd", k).reshape(S, kv_heads, L, head_dim)
    v = jnp.einsum("sbhcd->shbcd", v).reshape(S, kv_heads, L, head_dim)

    # Gather queries into the padded [S, Q] grid.
    qg = q[jnp.clip(meta.q_gather, 0, T - 1)]  # [S, Q, num_heads, head_dim]
    qg = qg.reshape(S, Q, kv_heads, groups, head_dim)

    # Scores in fp32: [S, kv_heads, groups, Q, L]
    scores = jnp.einsum(
        "sqhgd,shld->shgql", qg.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale

    if logit_softcap is not None:
        # Gemma-2 score softcap, applied to scaled scores pre-mask.
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)

    # Causal + validity mask in absolute positions: key j (its slot index in
    # the gathered layout IS its absolute position) visible iff j <= q_pos.
    # Padded query slots have q_pos = -1 → nothing visible; padded/garbage
    # key slots have j >= context_len > q_pos → masked.
    kv_pos = jnp.arange(L, dtype=jnp.int32)
    mask = meta.q_positions[:, None, None, :, None] >= kv_pos[None, None, None, None, :]
    mask = mask & (kv_pos[None, None, None, None, :] < meta.context_lens[:, None, None, None, None])
    if sliding_window is not None:
        # Key visible iff q_pos - k_pos < sliding_window (HF semantics).
        mask = mask & (
            meta.q_positions[:, None, None, :, None]
            - kv_pos[None, None, None, None, :]
            < sliding_window
        )
    scores = jnp.where(mask, scores, _NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("shgql,shld->sqhgd", probs, v.astype(jnp.float32))
    out = out.reshape(S, Q, num_heads, head_dim)

    # Back to the flat token layout.
    flat = out[meta.token_seq, meta.token_qcol]  # [T, num_heads, head_dim]
    return flat.astype(q.dtype)
