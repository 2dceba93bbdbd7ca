"""Pallas flash varlen PREFILL kernel over the paged KV cache.

Capability: the reference's prefill attention branches (varlen flash and
prefill-with-cached-prefix, src/layers/attention.rs:177-261) as one kernel.
Each sequence's queries attend to its full KV history — cached prefix plus
this batch's tokens — read from the paged cache through its block table.

Shape design (grid = (S, Q_TILES, KV_STEPS), kv innermost):
- Queries arrive pre-arranged as a padded grid [S, Hkv, QT, G, Dh] (the
  gather/transpose is done once by XLA outside the kernel), so each tile
  loads as [Hkv, QT, G, Dh] -> [Hkv, QT*G, Dh]: GQA is a single batched dot
  per kv chunk with kv_heads as the batch dim, no in-VMEM transposes.
- KV streams in CHUNK-sized slices of cache blocks via the BlockSpec
  index_map reading the scalar-prefetched block table (the Pallas pipeline
  double-buffers and skips repeat fetches on clamped/causally-skipped
  steps).
- Flash state (m, l, acc) lives in VMEM scratch carried across the kv grid
  dim; causal masking compares absolute query positions (q_pos input, -1 on
  padding) against absolute kv positions.
- Causal skip: kv steps entirely above a tile's last query position are
  compute-skipped (and their fetch collapses to a repeated index).

The cache must already contain this batch's K/V (scatter first — prefill
writes are bulk, once per request; the decode path fuses its per-token
write instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# Queries per tile and kv positions per chunk; scores per step are
# [Hkv, QT*G, CHUNK] fp32.
Q_TILE = 128
KV_CHUNK = 128


def _prefill_kernel(
    # scalar prefetch
    layer_ref,        # [1]
    tables_ref,       # [S, MAXBLK]
    ctx_ref,          # [S] total kv length per seq
    qstart_ref,       # [S] absolute position of each seq's first query
    qlen_ref,         # [S] number of valid queries per seq
    # inputs
    q_ref,            # [1, Hkv, QT, G, Dh]
    k_ref,            # [1, 1, Hkv, CHUNK, Dh] — cache chunk
    v_ref,
    # output
    out_ref,          # [1, Hkv, QT, G, Dh]
    # scratch
    m_scr,            # [Hkv, QT*G, 1] f32
    l_scr,
    acc_scr,          # [Hkv, QT*G, Dh] f32
    *,
    scale: float,
    kv_heads: int,
    groups: int,
    head_dim: int,
    chunk: int,
    sliding_window: int = None,
    logit_softcap: float = None,
):
    s = pl.program_id(0)
    qt = pl.program_id(1)
    step = pl.program_id(2)
    last_step = pl.num_programs(2) - 1

    ctx = ctx_ref[s]
    qlen = qlen_ref[s]
    QT = q_ref.shape[2]
    # Highest absolute position covered by this q tile (clamped to valid).
    tile_hi = qstart_ref[s] + jnp.minimum((qt + 1) * QT, jnp.maximum(qlen, 1)) - 1
    tile_valid = qt * QT < qlen
    kv_lo = step * chunk
    step_needed = tile_valid & (kv_lo < ctx) & (kv_lo <= tile_hi)
    if sliding_window is not None:
        # Lowest visible key of this q tile: its FIRST query's window edge.
        tile_lo_pos = qstart_ref[s] + qt * QT
        step_needed = step_needed & (
            kv_lo + chunk > tile_lo_pos - (sliding_window - 1)
        )

    @pl.when(step == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(step_needed)
    def _():
        q = q_ref[0].reshape(kv_heads, QT * groups, head_dim).astype(jnp.float32) * scale
        k = k_ref[0, 0].astype(jnp.float32)  # [Hkv, CHUNK, Dh]
        v = v_ref[0, 0].astype(jnp.float32)

        # [Hkv, QT*G, CHUNK]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # Prefill query positions are consecutive: row j of tile qt sits at
        # absolute position qstart + qt*QT + j (valid while < qlen).
        if logit_softcap is not None:
            scores = logit_softcap * jnp.tanh(scores / logit_softcap)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, QT, groups, 1), 1)
        qidx = qt * QT + row  # in-sequence query index
        qpos_g = jnp.where(
            qidx < qlen, qstart_ref[s] + qidx, -1
        ).reshape(1, QT * groups, 1)
        kvpos = kv_lo + jax.lax.broadcasted_iota(
            jnp.int32, (1, QT * groups, chunk), 2
        )
        mask = (kvpos <= qpos_g) & (kvpos < ctx)
        if sliding_window is not None:
            mask = mask & (qpos_g - kvpos < sliding_window)
        scores = jnp.where(mask, scores, _NEG_INF)

        m = m_scr[...]
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha + pv
        m_scr[...] = m_new

    @pl.when(step == last_step)
    def _():
        l = l_scr[...]
        out = jnp.where(l > 0, acc_scr[...] / jnp.maximum(l, 1e-30), 0.0)
        out_ref[0] = out.reshape(kv_heads, QT, groups, head_dim).astype(out_ref.dtype)


def _prefill_kernel_quant(
    # scalar prefetch
    layer_ref, tables_ref, ctx_ref, qstart_ref, qlen_ref,
    # inputs
    q_ref,            # [1, Hkv, QT, G, Dh]
    k_ref,            # [1, 1, Hkv, CHUNK, Dh] quantized cache chunk
    v_ref,
    ks_ref,           # [1, 1, Hkv, CHUNK] f32 per-row scales
    vs_ref,
    out_ref,
    m_scr, l_scr, acc_scr,
    *,
    scale: float,
    kv_heads: int,
    groups: int,
    head_dim: int,
    chunk: int,
    sliding_window: int = None,
    logit_softcap: float = None,
):
    """Quantized-cache prefill flash: per-row scales fold into scores /
    probabilities (O(CHUNK) work instead of O(CHUNK*Dh) dequantization)."""
    s = pl.program_id(0)
    qt = pl.program_id(1)
    step = pl.program_id(2)
    last_step = pl.num_programs(2) - 1

    ctx = ctx_ref[s]
    qlen = qlen_ref[s]
    QT = q_ref.shape[2]
    tile_hi = qstart_ref[s] + jnp.minimum((qt + 1) * QT, jnp.maximum(qlen, 1)) - 1
    tile_valid = qt * QT < qlen
    kv_lo = step * chunk
    step_needed = tile_valid & (kv_lo < ctx) & (kv_lo <= tile_hi)
    if sliding_window is not None:
        # Lowest visible key of this q tile: its FIRST query's window edge.
        tile_lo_pos = qstart_ref[s] + qt * QT
        step_needed = step_needed & (
            kv_lo + chunk > tile_lo_pos - (sliding_window - 1)
        )

    @pl.when(step == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(step_needed)
    def _():
        cd = jnp.bfloat16 if out_ref.dtype == jnp.bfloat16 else jnp.float32
        q = (q_ref[0].reshape(kv_heads, QT * groups, head_dim)
             .astype(jnp.float32) * scale).astype(cd)
        k = k_ref[0, 0].astype(cd)  # [Hkv, CHUNK, Dh]
        v = v_ref[0, 0].astype(cd)

        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * ks_ref[0, 0][:, None, :]
        if logit_softcap is not None:
            scores = logit_softcap * jnp.tanh(scores / logit_softcap)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, QT, groups, 1), 1)
        qidx = qt * QT + row
        qpos_g = jnp.where(
            qidx < qlen, qstart_ref[s] + qidx, -1
        ).reshape(1, QT * groups, 1)
        kvpos = kv_lo + jax.lax.broadcasted_iota(
            jnp.int32, (1, QT * groups, chunk), 2
        )
        mask = (kvpos <= qpos_g) & (kvpos < ctx)
        if sliding_window is not None:
            mask = mask & (qpos_g - kvpos < sliding_window)
        scores = jnp.where(mask, scores, _NEG_INF)

        m = m_scr[...]
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new) * vs_ref[0, 0][:, None, :]
        l_scr[...] = l_scr[...] * alpha + jnp.sum(
            jnp.exp(scores - m_new), axis=-1, keepdims=True
        )
        pv = jax.lax.dot_general(
            p.astype(cd), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha + pv
        m_scr[...] = m_new

    @pl.when(step == last_step)
    def _():
        l = l_scr[...]
        out = jnp.where(l > 0, acc_scr[...] / jnp.maximum(l, 1e-30), 0.0)
        out_ref[0] = out.reshape(kv_heads, QT, groups, head_dim).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "interpret", "sliding_window", "logit_softcap"),
)
def paged_attention_prefill(
    q: jax.Array,              # [T, Hq, Dh] flat (RoPE'd)
    k_cache: jax.Array,        # [L, NB, Hkv, BS, Dh] — ALREADY contains this
    v_cache: jax.Array,        #   batch's K/V
    layer_idx: jax.Array,
    block_tables: jax.Array,   # [S, MAXBLK] (-1 padded)
    context_lens: jax.Array,   # [S] total kv length
    q_gather: jax.Array,       # [S, Q] flat index of each query slot
    q_positions: jax.Array,    # [S, Q] absolute position (-1 pad)
    token_seq: jax.Array,      # [T] seq of each flat token
    token_qcol: jax.Array,     # [T] query column of each flat token
    *,
    scale: float,
    sliding_window: int = None,
    logit_softcap: float = None,
    interpret: bool = False,
) -> jax.Array:
    """Flash varlen prefill attention (plain or quantized tuple caches).
    Returns [T, Hq, Dh] in q.dtype."""
    k_scales = v_scales = None
    if isinstance(k_cache, tuple):
        k_cache, k_scales = k_cache
        v_cache, v_scales = v_cache
    T, Hq, Dh = q.shape
    L, NB, Hkv, BS, _ = k_cache.shape
    G = Hq // Hkv
    S, Q = q_gather.shape

    # Pad the query grid to a whole number of tiles and pre-arrange as
    # [S, Hkv, Qpad, G, Dh]; XLA fuses gather + transpose.
    Qpad = -(-Q // Q_TILE) * Q_TILE
    qg = q[jnp.clip(q_gather, 0, T - 1)]  # [S, Q, Hq, Dh]
    qg = qg.reshape(S, Q, Hkv, G, Dh).transpose(0, 2, 1, 3, 4)  # [S, Hkv, Q, G, Dh]
    if Qpad != Q:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Qpad - Q), (0, 0), (0, 0)))

    # KV is streamed in CHUNK slices of blocks; the chunk size must divide
    # the block size (block >= chunk) or vice versa.
    chunk = min(KV_CHUNK, BS)
    per_block = BS // chunk
    MAXBLK = block_tables.shape[1]
    kv_steps = MAXBLK * per_block

    tables = jnp.clip(block_tables, 0, NB - 1)
    qlen = jnp.sum(q_positions >= 0, axis=1).astype(jnp.int32)  # [S]
    qstart = jnp.where(qlen > 0, q_positions[:, 0], 0).astype(jnp.int32)

    def kv_index(s, qt, step, layer_ref, tables_ref, ctx_ref, qstart_ref, qlen_ref):
        # Clamp causally-/contextually-unneeded steps to the last needed one
        # so consecutive repeats skip the fetch.
        QTn = Q_TILE
        tile_hi = qstart_ref[s] + jnp.minimum(
            (qt + 1) * QTn, jnp.maximum(qlen_ref[s], 1)
        ) - 1
        hi = jnp.minimum(ctx_ref[s] - 1, tile_hi)
        max_step = jnp.maximum(hi, 0) // chunk
        st = jnp.minimum(step, max_step)
        blk = tables_ref[s, st // per_block]
        return (layer_ref[0], blk, 0, st % per_block, 0)

    quantized = k_scales is not None

    def scale_chunk_index(s, qt, step, layer_ref, tables_ref, ctx_ref,
                          qstart_ref, qlen_ref):
        QTn = Q_TILE
        tile_hi = qstart_ref[s] + jnp.minimum(
            (qt + 1) * QTn, jnp.maximum(qlen_ref[s], 1)
        ) - 1
        hi = jnp.minimum(ctx_ref[s] - 1, tile_hi)
        max_step = jnp.maximum(hi, 0) // chunk
        st = jnp.minimum(step, max_step)
        blk = tables_ref[s, st // per_block]
        return (layer_ref[0], blk, 0, st % per_block)

    kernel = functools.partial(
        _prefill_kernel_quant if quantized else _prefill_kernel,
        scale=scale, kv_heads=Hkv, groups=G, head_dim=Dh, chunk=chunk,
        sliding_window=sliding_window, logit_softcap=logit_softcap,
    )
    in_specs = [
        pl.BlockSpec(
            (1, Hkv, Q_TILE, G, Dh), lambda s, qt, st, *p: (s, 0, qt, 0, 0)
        ),
        pl.BlockSpec((1, 1, Hkv, chunk, Dh), kv_index),
        pl.BlockSpec((1, 1, Hkv, chunk, Dh), kv_index),
    ]
    operands = [
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        tables,
        context_lens,
        qstart,
        qlen,
        qg,
        k_cache,
        v_cache,
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, Hkv, chunk), scale_chunk_index),
            pl.BlockSpec((1, 1, Hkv, chunk), scale_chunk_index),
        ]
        operands += [k_scales, v_scales]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(S, Qpad // Q_TILE, kv_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, Hkv, Q_TILE, G, Dh), lambda s, qt, st, *p: (s, 0, qt, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((Hkv, Q_TILE * G, 1), jnp.float32),
            pltpu.VMEM((Hkv, Q_TILE * G, 1), jnp.float32),
            pltpu.VMEM((Hkv, Q_TILE * G, Dh), jnp.float32),
        ],
    )
    out_grid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, Hkv, Qpad, G, Dh), q.dtype),
        # Q tiles + double-buffered KV block fetches exceed the default
        # 16 MB scoped-vmem budget at large-model shapes (e.g. Qwen3-4B/8B
        # batches with Qpad 512); v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    # Back to the flat token layout: [S, Hkv, Qpad, G, Dh] -> [T, Hq, Dh].
    out = out_grid.transpose(0, 2, 1, 3, 4).reshape(S, Qpad, Hq, Dh)
    return out[token_seq, token_qcol]
