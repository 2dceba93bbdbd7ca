"""Pallas paged-attention DECODE kernels.

The single hottest op in serving (SURVEY §7 "hard parts" #1): one query
token per sequence attends to its whole paged KV history. Design:

1. **Pipeline-gathered attention** (`paged_attention_decode`). Grid is
   (S, MAXBLK); the KV block fetched at step (s, it) is chosen by the
   BlockSpec index_map reading the scalar-prefetched block table —
   the Pallas pipeline runtime double-buffers these gathers across grid
   steps automatically, so DMA is always overlapped with compute (a manual
   per-program DMA loop leaves a latency bubble at every program boundary).
   Padded windows clamp to the last valid block; the runtime skips re-fetch
   when consecutive steps map to the same block. Flash-softmax state
   (m, l, acc) lives in VMEM scratch carried across the inner grid dim.

2. **In-VMEM patch of the current token.** Attention must see this step's
   K/V at position ctx-1, but committing it to HBM first would serialize
   write → read. Instead the kernel patches the fetched block in VMEM with
   k_new/v_new (vector select on the position lane), so attention never
   depends on the HBM write at all.

3. **Batched cache commit** (`kv_cache_commit`). The HBM cache is tiled
   (8, 128) on (block_size, head_dim), so a single position cannot be
   DMA'd; the commit kernel read-modify-writes the aligned 8-position tile
   per sequence with all reads (then all writes) in flight concurrently.
   The XLA-scatter alternative measured ~4 ms per step on v5e; this is µs.
   Caches are input/output aliased (donated) — the next decode substep's
   attention depends on the committed caches, which orders the pipeline.

GQA is native: kv_heads is the batch dim of each dot; the cache layout
[L, NB, Hkv, BS, Dh] delivers every fetched block already in
[Hkv, BS, Dh] form (reference keeps [blocks, block_size, kv_heads, dim],
model_runner.rs:364-396, and loops per-sequence naive attention,
attention.rs:264-318).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# Sublane tile granularity of the HBM cache layout on the block_size dim.
_TILE = 8


# ---------------------------------------------------------------------------
# Attention (read-only caches, pipeline-gathered blocks)
# ---------------------------------------------------------------------------

def _attn_kernel(
    # scalar prefetch
    layer_ref,          # [1] int32 (consumed by the index_maps)
    block_tables_ref,   # [S, MAXBLK] int32 (clipped)
    context_lens_ref,   # [S] int32
    # inputs (pipeline-fetched blocks)
    q_ref,              # [1, Hq, Dh] VMEM
    k_new_ref,          # [1, Hkv, Dh] VMEM
    v_new_ref,          # [1, Hkv, Dh] VMEM
    k_blk_ref,          # [1, 1, Hkv, BS, Dh] VMEM — block table[s, it]
    v_blk_ref,          # [1, 1, Hkv, BS, Dh] VMEM
    # output
    out_ref,            # [1, Hq, Dh] VMEM
    # scratch (persists across grid steps)
    m_scr,              # [Hkv, G, 1] f32
    l_scr,              # [Hkv, G, 1] f32
    acc_scr,            # [Hkv, G, Dh] f32
    *,
    scale: float,
    block_size: int,
    kv_heads: int,
    groups: int,
    head_dim: int,
):
    s = pl.program_id(0)
    it = pl.program_id(1)
    last_it = pl.num_programs(1) - 1
    ctx = context_lens_ref[s]
    nb = pl.cdiv(ctx, block_size)

    @pl.when(it == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(it < nb)
    def _():
        q = q_ref[0].reshape(kv_heads, groups, head_dim).astype(jnp.float32) * scale
        k = k_blk_ref[0, 0].astype(jnp.float32)  # [Hkv, BS, Dh]
        v = v_blk_ref[0, 0].astype(jnp.float32)

        # Patch this step's token (position ctx-1) into the fetched block:
        # attention must see it, but it is committed to HBM by a separate
        # kernel, concurrently.
        pos = it * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (kv_heads, block_size, head_dim), 1
        )
        is_new = pos == ctx - 1
        k = jnp.where(is_new, k_new_ref[0][:, None, :].astype(jnp.float32), k)
        v = jnp.where(is_new, v_new_ref[0][:, None, :].astype(jnp.float32), v)

        # [Hkv, G, BS] — batch over kv heads, contract head_dim.
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        kpos = it * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (kv_heads, groups, block_size), 2
        )
        scores = jnp.where(kpos < ctx, scores, _NEG_INF)

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

    @pl.when(it == last_it)
    def _():
        l = l_scr[...]
        out = jnp.where(l > 0, acc_scr[...] / jnp.maximum(l, 1e-30), 0.0)
        out_ref[0] = out.reshape(kv_heads * groups, head_dim).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_attention_decode(
    q: jax.Array,              # [S, Hq, Dh]
    k_new: jax.Array,          # [S, Hkv, Dh] — this step's K (RoPE'd)
    v_new: jax.Array,          # [S, Hkv, Dh]
    k_cache: jax.Array,        # [L, NB, Hkv, BS, Dh] (read-only)
    v_cache: jax.Array,
    layer_idx: jax.Array,      # scalar int32
    block_tables: jax.Array,   # [S, MAXBLK] int32 (-1 padded)
    context_lens: jax.Array,   # [S] int32, INCLUDING this step's token
    *,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Flash paged decode attention; the current token's K/V is taken from
    k_new/v_new (VMEM patch), NOT from the cache — commit the cache with
    `kv_cache_commit`. Returns [S, Hq, Dh]; padded rows (ctx == 0) are 0."""
    S, Hq, Dh = q.shape
    L, NB, Hkv, BS, _ = k_cache.shape
    groups = Hq // Hkv
    MAXBLK = block_tables.shape[1]

    tables = jnp.clip(block_tables, 0, NB - 1)

    def kv_index(s, it, layer_ref, tables_ref, ctx_ref):
        # Clamp padded windows to the last valid block: the pipeline skips
        # the re-fetch when the index repeats.
        nb = jnp.maximum(pl.cdiv(ctx_ref[s], BS), 1)
        blk = tables_ref[s, jnp.minimum(it, nb - 1)]
        return (layer_ref[0], blk, 0, 0, 0)

    kernel = functools.partial(
        _attn_kernel,
        scale=scale, block_size=BS, kv_heads=Hkv, groups=groups, head_dim=Dh,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, MAXBLK),
        in_specs=[
            pl.BlockSpec((1, Hq, Dh), lambda s, it, *p: (s, 0, 0)),
            pl.BlockSpec((1, Hkv, Dh), lambda s, it, *p: (s, 0, 0)),
            pl.BlockSpec((1, Hkv, Dh), lambda s, it, *p: (s, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, BS, Dh), kv_index),
            pl.BlockSpec((1, 1, Hkv, BS, Dh), kv_index),
        ],
        out_specs=pl.BlockSpec((1, Hq, Dh), lambda s, it, *p: (s, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, groups, 1), jnp.float32),
            pltpu.VMEM((Hkv, groups, 1), jnp.float32),
            pltpu.VMEM((Hkv, groups, Dh), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, Hq, Dh), q.dtype),
        interpret=interpret,
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        tables,
        context_lens,
        q,
        k_new.astype(k_cache.dtype),
        v_new.astype(v_cache.dtype),
        k_cache,
        v_cache,
    )


# ---------------------------------------------------------------------------
# Cache commit (batched RMW writes)
# ---------------------------------------------------------------------------

def _commit_kernel(
    # scalar prefetch
    layer_ref,          # [1]
    block_tables_ref,   # [S, MAXBLK]
    context_lens_ref,   # [S]
    # inputs
    k_new_ref,          # [C, Hkv, Dh] VMEM (this chunk's rows)
    v_new_ref,
    k_in,               # aliased cache inputs (unused; access via k_out/v_out)
    v_in,
    # outputs (aliased caches)
    k_out,              # [L, NB, Hkv, BS, Dh] HBM
    v_out,
    # scratch
    tiles,              # [C, 2, Hkv, TILE, Dh] VMEM
    sems,               # [C, 2] DMA semaphores
    *,
    chunk: int,
    block_size: int,
    kv_heads: int,
    head_dim: int,
):
    c = pl.program_id(0)
    layer = layer_ref[0]

    def rmw_dma(i, which):
        s = c * chunk + i
        ctx = context_lens_ref[s]
        pos = jnp.maximum(ctx - 1, 0)
        blk = block_tables_ref[s, pos // block_size]
        base = (pos % block_size) // _TILE * _TILE
        cache = k_out if which == 0 else v_out
        return pltpu.make_async_copy(
            cache.at[layer, blk, :, pl.ds(base, _TILE), :],
            tiles.at[i, which],
            sems.at[i, which],
        )

    def wr_dma(i, which):
        s = c * chunk + i
        ctx = context_lens_ref[s]
        pos = jnp.maximum(ctx - 1, 0)
        blk = block_tables_ref[s, pos // block_size]
        base = (pos % block_size) // _TILE * _TILE
        cache = k_out if which == 0 else v_out
        return pltpu.make_async_copy(
            tiles.at[i, which],
            cache.at[layer, blk, :, pl.ds(base, _TILE), :],
            sems.at[i, which],
        )

    def valid(i):
        return context_lens_ref[c * chunk + i] > 0

    # Phase 1: start all tile reads (concurrent).
    for i in range(chunk):
        @pl.when(valid(i))
        def _(i=i):
            rmw_dma(i, 0).start()
            rmw_dma(i, 1).start()

    # Phase 2: wait each, patch the row, start the write-back.
    for i in range(chunk):
        @pl.when(valid(i))
        def _(i=i):
            ctx = context_lens_ref[c * chunk + i]
            j = (ctx - 1) % block_size % _TILE
            rmw_dma(i, 0).wait()
            rmw_dma(i, 1).wait()
            sel = jax.lax.broadcasted_iota(
                jnp.int32, (kv_heads, _TILE, head_dim), 1
            ) == j
            tiles[i, 0] = jnp.where(
                sel, k_new_ref[i][:, None, :].astype(tiles.dtype), tiles[i, 0]
            )
            tiles[i, 1] = jnp.where(
                sel, v_new_ref[i][:, None, :].astype(tiles.dtype), tiles[i, 1]
            )
            wr_dma(i, 0).start()
            wr_dma(i, 1).start()

    # Phase 3: drain the writes.
    for i in range(chunk):
        @pl.when(valid(i))
        def _(i=i):
            wr_dma(i, 0).wait()
            wr_dma(i, 1).wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(2, 3))
def kv_cache_commit(
    k_new: jax.Array,          # [S, Hkv, Dh]
    v_new: jax.Array,
    k_cache: jax.Array,        # [L, NB, Hkv, BS, Dh] (donated)
    v_cache: jax.Array,
    layer_idx: jax.Array,
    block_tables: jax.Array,   # [S, MAXBLK] (-1 padded)
    context_lens: jax.Array,   # [S], INCLUDING this step's token
    *,
    interpret: bool = False,
) -> tuple:
    """Write each sequence's new K/V row at position ctx-1 into the paged
    caches (RMW at the HBM tile granularity). Returns the updated caches."""
    S, Hkv, Dh = k_new.shape
    L, NB, _, BS, _ = k_cache.shape
    chunk = min(S, 64)
    # Pad the batch to a whole number of chunks; padded rows get ctx == 0
    # and are skipped by the kernel.
    Spad = -(-S // chunk) * chunk
    tables = jnp.clip(block_tables, 0, NB - 1)
    if Spad != S:
        pad = [(0, Spad - S)]
        k_new = jnp.pad(k_new, pad + [(0, 0)] * 2)
        v_new = jnp.pad(v_new, pad + [(0, 0)] * 2)
        tables = jnp.pad(tables, pad + [(0, 0)])
        context_lens = jnp.pad(context_lens, pad)

    kernel = functools.partial(
        _commit_kernel,
        chunk=chunk, block_size=BS, kv_heads=Hkv, head_dim=Dh,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Spad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, Hkv, Dh), lambda c, *p: (c, 0, 0)),
            pl.BlockSpec((chunk, Hkv, Dh), lambda c, *p: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk, 2, Hkv, _TILE, Dh), k_cache.dtype),
            pltpu.SemaphoreType.DMA((chunk, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        # Operand indices include the 3 scalar-prefetch args: k_new=3,
        # v_new=4, k_cache=5, v_cache=6.
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        tables,
        context_lens,
        k_new.astype(k_cache.dtype),
        v_new.astype(v_cache.dtype),
        k_cache,
        v_cache,
    )
