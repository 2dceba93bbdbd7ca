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


def _sublane_tile(dtype) -> int:
    """HBM tile granularity on the second-minor dim: (8,128) for 2/4-byte
    dtypes, (32,128) for 1-byte (int8/fp8) — sub-tile DMA slices don't
    lower, so RMW commits must work at this granularity."""
    return 32 if jnp.dtype(dtype).itemsize == 1 else 8


def _flash_accumulate(
    q_ref, k, v, k_new_ref, v_new_ref, it, ctx, m_scr, l_scr, acc_scr,
    *, scale, block_size, kv_heads, groups, head_dim, sliding_window=None,
    logit_softcap=None,
):
    """One flash-softmax block update (shared by the plain and quantized
    kernels). k/v: [Hkv, BS, Dh] f32, already dequantized. k_new_ref=None
    skips the current-token patch (partial/history attention).
    sliding_window (static): the query sits at position ctx-1; keys below
    ctx - sliding_window are masked (HF semantics: q - k < window)."""
    q = q_ref[0].reshape(kv_heads, groups, head_dim).astype(jnp.float32) * scale

    if k_new_ref is not None:
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
    if logit_softcap is not None:
        # Gemma-2 score softcap: applied to the SCALED scores, pre-mask.
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)
    kpos = it * block_size + jax.lax.broadcasted_iota(
        jnp.int32, (kv_heads, groups, block_size), 2
    )
    valid = kpos < ctx
    if sliding_window is not None:
        valid = valid & (kpos >= ctx - sliding_window)
    scores = jnp.where(valid, scores, _NEG_INF)

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
    sliding_window: int = None,
    logit_softcap: float = None,
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

    needed = it < nb
    if sliding_window is not None:
        # Skip blocks entirely below the window of the query at ctx-1.
        needed = needed & ((it + 1) * block_size > ctx - sliding_window)

    @pl.when(needed)
    def _():
        k = k_blk_ref[0, 0].astype(jnp.float32)  # [Hkv, BS, Dh]
        v = v_blk_ref[0, 0].astype(jnp.float32)
        _flash_accumulate(
            q_ref, k, v, k_new_ref, v_new_ref, it, ctx, m_scr, l_scr, acc_scr,
            scale=scale, block_size=block_size, kv_heads=kv_heads,
            groups=groups, head_dim=head_dim, sliding_window=sliding_window,
            logit_softcap=logit_softcap,
        )

    @pl.when(it == last_it)
    def _():
        l = l_scr[...]
        out = jnp.where(l > 0, acc_scr[...] / jnp.maximum(l, 1e-30), 0.0)
        out_ref[0] = out.reshape(kv_heads * groups, head_dim).astype(out_ref.dtype)


def _attn_kernel_quant(
    # scalar prefetch
    layer_ref,
    block_tables_ref,
    context_lens_ref,
    # inputs (pipeline-fetched blocks)
    q_ref,              # [1, Hq, Dh] VMEM
    k_new_ref,          # [1, Hkv, Dh] VMEM (full precision — patched raw)
    v_new_ref,          # [1, Hkv, Dh] VMEM
    k_blk_ref,          # [1, 1, Hkv, BS, Dh] VMEM quantized data
    v_blk_ref,
    ks_ref,             # [1, 1, Hkv, BS] f32 per-row scales
    vs_ref,
    # output
    out_ref,
    # scratch
    m_scr, l_scr, acc_scr,
    *,
    scale: float,
    block_size: int,
    kv_heads: int,
    groups: int,
    head_dim: int,
    sliding_window: int = None,
    logit_softcap: float = None,
):
    """Quantized-KV flash decode: dequantize the fetched block in VMEM with
    its per-(token,head) scales, then the shared flash update."""
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

    needed = it < nb
    if sliding_window is not None:
        needed = needed & ((it + 1) * block_size > ctx - sliding_window)

    @pl.when(needed)
    def _():
        k = k_blk_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0][..., None]
        v = v_blk_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0][..., None]
        _flash_accumulate(
            q_ref, k, v, k_new_ref, v_new_ref, it, ctx, m_scr, l_scr, acc_scr,
            scale=scale, block_size=block_size, kv_heads=kv_heads,
            groups=groups, head_dim=head_dim, sliding_window=sliding_window,
            logit_softcap=logit_softcap,
        )

    @pl.when(it == last_it)
    def _():
        l = l_scr[...]
        out = jnp.where(l > 0, acc_scr[...] / jnp.maximum(l, 1e-30), 0.0)
        out_ref[0] = out.reshape(kv_heads * groups, head_dim).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "interpret", "sliding_window", "logit_softcap"),
)
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
    sliding_window: int = None,
    logit_softcap: float = None,
    interpret: bool = False,
) -> jax.Array:
    """Flash paged decode attention; the current token's K/V is taken from
    k_new/v_new (VMEM patch), NOT from the cache — commit the cache with
    `kv_cache_commit`. Returns [S, Hq, Dh]; padded rows (ctx == 0) are 0.

    Quantized tuple caches (data int8/fp8, per-row scale f32) fetch the
    scale block through the same pipelined gather and dequantize in VMEM —
    KV HBM traffic halves/quarters vs bf16 (BASELINE config 3/5)."""
    k_scales = v_scales = None
    if isinstance(k_cache, tuple):
        k_cache, k_scales = k_cache
        v_cache, v_scales = v_cache
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

    def scale_index(s, it, layer_ref, tables_ref, ctx_ref):
        nb = jnp.maximum(pl.cdiv(ctx_ref[s], BS), 1)
        blk = tables_ref[s, jnp.minimum(it, nb - 1)]
        return (layer_ref[0], blk, 0, 0)

    quantized = k_scales is not None
    kernel = functools.partial(
        _attn_kernel_quant if quantized else _attn_kernel,
        scale=scale, block_size=BS, kv_heads=Hkv, groups=groups, head_dim=Dh,
        sliding_window=sliding_window, logit_softcap=logit_softcap,
    )
    in_specs = [
        pl.BlockSpec((1, Hq, Dh), lambda s, it, *p: (s, 0, 0)),
        pl.BlockSpec((1, Hkv, Dh), lambda s, it, *p: (s, 0, 0)),
        pl.BlockSpec((1, Hkv, Dh), lambda s, it, *p: (s, 0, 0)),
        pl.BlockSpec((1, 1, Hkv, BS, Dh), kv_index),
        pl.BlockSpec((1, 1, Hkv, BS, Dh), kv_index),
    ]
    operands = [
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        tables,
        context_lens,
        q,
        # Quantized caches keep the patch rows at full precision (q.dtype);
        # they only exist in VMEM.
        k_new.astype(q.dtype if quantized else k_cache.dtype),
        v_new.astype(q.dtype if quantized else v_cache.dtype),
        k_cache,
        v_cache,
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, Hkv, BS), scale_index),
            pl.BlockSpec((1, 1, Hkv, BS), scale_index),
        ]
        operands += [k_scales, v_scales]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, MAXBLK),
        in_specs=in_specs,
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
        # SPS x 2-parity x {K,V} double-buffered block fetches exceed the
        # default 16 MB scoped-vmem budget; v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


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
    tile: int,
):
    c = pl.program_id(0)
    layer = layer_ref[0]

    def rmw_dma(i, which):
        s = c * chunk + i
        ctx = context_lens_ref[s]
        pos = jnp.maximum(ctx - 1, 0)
        blk = block_tables_ref[s, pos // block_size]
        base = (pos % block_size) // tile * tile
        cache = k_out if which == 0 else v_out
        return pltpu.make_async_copy(
            cache.at[layer, blk, :, pl.ds(base, tile), :],
            tiles.at[i, which],
            sems.at[i, which],
        )

    def wr_dma(i, which):
        s = c * chunk + i
        ctx = context_lens_ref[s]
        pos = jnp.maximum(ctx - 1, 0)
        blk = block_tables_ref[s, pos // block_size]
        base = (pos % block_size) // tile * tile
        cache = k_out if which == 0 else v_out
        return pltpu.make_async_copy(
            tiles.at[i, which],
            cache.at[layer, blk, :, pl.ds(base, tile), :],
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
            j = (ctx - 1) % block_size % tile
            rmw_dma(i, 0).wait()
            rmw_dma(i, 1).wait()
            sel = jax.lax.broadcasted_iota(
                jnp.int32, (kv_heads, tile, head_dim), 1
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


def _commit_kernel_quant(
    # scalar prefetch
    layer_ref,
    block_tables_ref,
    context_lens_ref,
    # inputs
    kq_ref,             # [C, Hkv, Dh] VMEM — pre-quantized data rows
    vq_ref,
    ks_row_ref,         # [C, Hkv] f32 — per-(token,head) scales
    vs_row_ref,
    k_in, v_in, ks_in, vs_in,  # aliased inputs (access via the outputs)
    # outputs (aliased caches)
    k_out,              # [L, NB, Hkv, BS, Dh] quantized data
    v_out,
    ks_out,             # [L, NB, Hkv, BS] f32 scale planes
    vs_out,
    # scratch
    tiles,              # [C, 2, Hkv, TILE, Dh] VMEM (data dtype)
    stiles,             # [C, 2, Hkv, LW] f32 VMEM (scale-plane lane tile)
    sems,               # [C, 4] DMA semaphores
    *,
    chunk: int,
    block_size: int,
    kv_heads: int,
    head_dim: int,
    tile: int,
    lane_tile: int,
):
    """Quantized-cache commit: RMW the data tile AND the scale-plane lane
    tile for each sequence's row (all reads in flight, then all writes)."""
    c = pl.program_id(0)
    layer = layer_ref[0]

    def seq_addr(i):
        s = c * chunk + i
        ctx = context_lens_ref[s]
        pos = jnp.maximum(ctx - 1, 0)
        blk = block_tables_ref[s, pos // block_size]
        return pos, blk

    def data_dma(i, which, to_hbm):
        pos, blk = seq_addr(i)
        base = (pos % block_size) // tile * tile
        cache = k_out if which == 0 else v_out
        hbm = cache.at[layer, blk, :, pl.ds(base, tile), :]
        vmem = tiles.at[i, which]
        src, dst = (vmem, hbm) if to_hbm else (hbm, vmem)
        return pltpu.make_async_copy(src, dst, sems.at[i, which])

    def scale_dma(i, which, to_hbm):
        pos, blk = seq_addr(i)
        base = (pos % block_size) // lane_tile * lane_tile
        plane = ks_out if which == 0 else vs_out
        hbm = plane.at[layer, blk, :, pl.ds(base, lane_tile)]
        vmem = stiles.at[i, which]
        src, dst = (vmem, hbm) if to_hbm else (hbm, vmem)
        return pltpu.make_async_copy(src, dst, sems.at[i, 2 + which])

    def valid(i):
        return context_lens_ref[c * chunk + i] > 0

    for i in range(chunk):
        @pl.when(valid(i))
        def _(i=i):
            data_dma(i, 0, False).start()
            data_dma(i, 1, False).start()
            scale_dma(i, 0, False).start()
            scale_dma(i, 1, False).start()

    for i in range(chunk):
        @pl.when(valid(i))
        def _(i=i):
            ctx = context_lens_ref[c * chunk + i]
            pos = ctx - 1
            j = pos % block_size % tile
            data_dma(i, 0, False).wait()
            data_dma(i, 1, False).wait()
            sel = jax.lax.broadcasted_iota(
                jnp.int32, (kv_heads, tile, head_dim), 1
            ) == j
            tiles[i, 0] = jnp.where(sel, kq_ref[i][:, None, :], tiles[i, 0])
            tiles[i, 1] = jnp.where(sel, vq_ref[i][:, None, :], tiles[i, 1])
            data_dma(i, 0, True).start()
            data_dma(i, 1, True).start()

            js = pos % block_size % lane_tile
            scale_dma(i, 0, False).wait()
            scale_dma(i, 1, False).wait()
            ssel = jax.lax.broadcasted_iota(
                jnp.int32, (kv_heads, lane_tile), 1
            ) == js
            stiles[i, 0] = jnp.where(ssel, ks_row_ref[i][:, None], stiles[i, 0])
            stiles[i, 1] = jnp.where(ssel, vs_row_ref[i][:, None], stiles[i, 1])
            scale_dma(i, 0, True).start()
            scale_dma(i, 1, True).start()

    for i in range(chunk):
        @pl.when(valid(i))
        def _(i=i):
            data_dma(i, 0, True).wait()
            data_dma(i, 1, True).wait()
            scale_dma(i, 0, True).wait()
            scale_dma(i, 1, True).wait()


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
    caches (RMW at the HBM tile granularity — (8,128) for 2/4-byte dtypes,
    (32,128) for quantized 1-byte data). Quantized tuple caches also RMW
    the f32 scale plane's lane tile; rows are quantized here (per-(token,
    head) amax) before entering the kernel. Returns the updated caches."""
    k_scales = v_scales = None
    if isinstance(k_cache, tuple):
        k_cache, k_scales = k_cache
        v_cache, v_scales = v_cache
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

    tile = _sublane_tile(k_cache.dtype)
    if BS % tile:
        tile = BS  # tiny blocks: RMW the whole block
    quantized = k_scales is not None

    if not quantized:
        kernel = functools.partial(
            _commit_kernel,
            chunk=chunk, block_size=BS, kv_heads=Hkv, head_dim=Dh, tile=tile,
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
                pltpu.VMEM((chunk, 2, Hkv, tile, Dh), k_cache.dtype),
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

    # Quantize the new rows (cheap XLA prologue, fuses into the step).
    def qrows(x):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1)  # [S, Hkv]
        if k_cache.dtype == jnp.int8:
            scales = jnp.maximum(amax / 127.0, 1e-10)
            q = jnp.clip(jnp.round(xf / scales[..., None]), -127, 127)
        else:
            scales = jnp.maximum(amax / 448.0, 1e-10)
            q = xf / scales[..., None]
        return q.astype(k_cache.dtype), scales

    kq, ks_row = qrows(k_new)
    vq, vs_row = qrows(v_new)
    lane_tile = 128 if BS % 128 == 0 else BS
    kernel = functools.partial(
        _commit_kernel_quant,
        chunk=chunk, block_size=BS, kv_heads=Hkv, head_dim=Dh,
        tile=tile, lane_tile=lane_tile,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Spad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, Hkv, Dh), lambda c, *p: (c, 0, 0)),
            pl.BlockSpec((chunk, Hkv, Dh), lambda c, *p: (c, 0, 0)),
            pl.BlockSpec((chunk, Hkv), lambda c, *p: (c, 0)),
            pl.BlockSpec((chunk, Hkv), lambda c, *p: (c, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk, 2, Hkv, tile, Dh), k_cache.dtype),
            pltpu.VMEM((chunk, 2, Hkv, lane_tile), jnp.float32),
            pltpu.SemaphoreType.DMA((chunk, 4)),
        ],
    )
    k_data, v_data, k_s, v_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(k_scales.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scales.shape, jnp.float32),
        ),
        # Operands after the 3 scalar-prefetch args: kq=3, vq=4, ks_row=5,
        # vs_row=6, k_cache=7, v_cache=8, k_scales=9, v_scales=10.
        input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        tables,
        context_lens,
        kq,
        vq,
        ks_row,
        vs_row,
        k_cache,
        v_cache,
        k_scales,
        v_scales,
    )
    return (k_data, k_s), (v_data, v_s)


# ---------------------------------------------------------------------------
# Window-mode decode: partial (history-only) attention + span commit.
#
# A K-step decode window commits each substep's KV row before the next
# substep can attend it; per-row RMW commits cost ~128 DMA issues per layer
# per substep (measured ~25-29 us/layer — DMA-issue-bound, 0.7 ms of every
# substep at 28 layers). Window mode removes them: attention splits into
#   history = flash attention over the COMMITTED cache (positions <
#             win_start, constant across the window; no in-VMEM patching),
#   window  = plain XLA attention over the window's own rows (carried in a
#             [L, S, Hkv, K, Dh] staging buffer),
# flash-merged by (m, l); the cache is committed ONCE per layer per window
# as a contiguous span (two RMW pieces max). DMA issues drop K-fold.
# ---------------------------------------------------------------------------

def _attn_partial_kernel(
    layer_ref, block_tables_ref, kv_lens_ref,
    q_ref,              # [1, Hq, Dh]
    k_blk_ref,          # [1, 1, Hkv, BS, Dh]
    v_blk_ref,
    acc_ref,            # [1, Hq, Dh] f32 out (unnormalized)
    m_ref,              # [1, Hq] f32 out
    l_ref,              # [1, Hq] f32 out
    m_scr, l_scr, acc_scr,
    *,
    scale, block_size, kv_heads, groups, head_dim,
):
    s = pl.program_id(0)
    it = pl.program_id(1)
    last_it = pl.num_programs(1) - 1
    ctx = kv_lens_ref[s]  # committed history length (EXCLUDES window rows)
    nb = pl.cdiv(ctx, block_size)

    @pl.when(it == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(it < nb)
    def _():
        k = k_blk_ref[0, 0].astype(jnp.float32)
        v = v_blk_ref[0, 0].astype(jnp.float32)
        _flash_accumulate(
            q_ref, k, v, None, None, it, ctx, m_scr, l_scr, acc_scr,
            scale=scale, block_size=block_size, kv_heads=kv_heads,
            groups=groups, head_dim=head_dim,
        )

    @pl.when(it == last_it)
    def _():
        acc_ref[0] = acc_scr[...].reshape(kv_heads * groups, head_dim)
        m_ref[0, 0] = m_scr[...].reshape(kv_heads * groups)
        l_ref[0, 0] = l_scr[...].reshape(kv_heads * groups)


def _attn_partial_kernel_quant(
    layer_ref, block_tables_ref, kv_lens_ref,
    q_ref, k_blk_ref, v_blk_ref, ks_ref, vs_ref,
    acc_ref, m_ref, l_ref,
    m_scr, l_scr, acc_scr,
    *,
    scale, block_size, kv_heads, groups, head_dim,
):
    s = pl.program_id(0)
    it = pl.program_id(1)
    last_it = pl.num_programs(1) - 1
    ctx = kv_lens_ref[s]
    nb = pl.cdiv(ctx, block_size)

    @pl.when(it == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(it < nb)
    def _():
        k = k_blk_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0][..., None]
        v = v_blk_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0][..., None]
        _flash_accumulate(
            q_ref, k, v, None, None, it, ctx, m_scr, l_scr, acc_scr,
            scale=scale, block_size=block_size, kv_heads=kv_heads,
            groups=groups, head_dim=head_dim,
        )

    @pl.when(it == last_it)
    def _():
        acc_ref[0] = acc_scr[...].reshape(kv_heads * groups, head_dim)
        m_ref[0, 0] = m_scr[...].reshape(kv_heads * groups)
        l_ref[0, 0] = l_scr[...].reshape(kv_heads * groups)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_attention_decode_partial(
    q: jax.Array,              # [S, Hq, Dh]
    k_cache,                   # array or (data, scale) tuple
    v_cache,
    layer_idx: jax.Array,
    block_tables: jax.Array,   # [S, MAXBLK]
    kv_lens: jax.Array,        # [S] committed history length (window excluded)
    *,
    scale: float,
    interpret: bool = False,
) -> tuple:
    """Flash attention over the committed cache only. Returns the raw flash
    state (acc [S,Hq,Dh] f32 unnormalized, m [S,Hq], l [S,Hq]) for merging
    with the in-window attention. Rows with kv_lens == 0 return
    (0, -inf, 0) — the merge gives them zero weight."""
    k_scales = v_scales = None
    if isinstance(k_cache, tuple):
        k_cache, k_scales = k_cache
        v_cache, v_scales = v_cache
    S, Hq, Dh = q.shape
    L, NB, Hkv, BS, _ = k_cache.shape
    groups = Hq // Hkv
    MAXBLK = block_tables.shape[1]
    tables = jnp.clip(block_tables, 0, NB - 1)

    def kv_index(s, it, layer_ref, tables_ref, len_ref):
        nb = jnp.maximum(pl.cdiv(len_ref[s], BS), 1)
        blk = tables_ref[s, jnp.minimum(it, nb - 1)]
        return (layer_ref[0], blk, 0, 0, 0)

    def scale_index(s, it, layer_ref, tables_ref, len_ref):
        nb = jnp.maximum(pl.cdiv(len_ref[s], BS), 1)
        blk = tables_ref[s, jnp.minimum(it, nb - 1)]
        return (layer_ref[0], blk, 0, 0)

    quantized = k_scales is not None
    kernel = functools.partial(
        _attn_partial_kernel_quant if quantized else _attn_partial_kernel,
        scale=scale, block_size=BS, kv_heads=Hkv, groups=groups, head_dim=Dh,
    )
    in_specs = [
        pl.BlockSpec((1, Hq, Dh), lambda s, it, *p: (s, 0, 0)),
        pl.BlockSpec((1, 1, Hkv, BS, Dh), kv_index),
        pl.BlockSpec((1, 1, Hkv, BS, Dh), kv_index),
    ]
    operands = [
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        tables,
        kv_lens,
        q,
        k_cache,
        v_cache,
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, Hkv, BS), scale_index),
            pl.BlockSpec((1, 1, Hkv, BS), scale_index),
        ]
        operands += [k_scales, v_scales]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, MAXBLK),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, Hq, Dh), lambda s, it, *p: (s, 0, 0)),
            pl.BlockSpec((1, 1, Hq), lambda s, it, *p: (s, 0, 0)),
            pl.BlockSpec((1, 1, Hq), lambda s, it, *p: (s, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((Hkv, groups, 1), jnp.float32),
            pltpu.VMEM((Hkv, groups, 1), jnp.float32),
            pltpu.VMEM((Hkv, groups, Dh), jnp.float32),
        ],
    )
    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((S, Hq, Dh), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, Hq), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, Hq), jnp.float32),
        ),
        interpret=interpret,
    )(*operands)
    return acc, m[:, 0], l[:, 0]


def _make_shared_prefix_kernel(*, quantized, kv_heads, rows, head_dim,
                               compute_dtype, logit_softcap=None):
    """Flash-attend EVERY sequence's queries to one common block list.

    Shared-prefix (cascade) decode attention: when sequences share a
    committed block-table prefix (prefix-cache hits — chained-hash dedup,
    reference block_manager.rs:157-219), the per-seq window kernel streams
    each shared KV block through the MXU once PER SEQUENCE with only
    G(=Hq/Hkv, 2 for Qwen3) query rows — the measured decode wall is
    exactly this M=2 weight-load rate (docs/performance.md). Here the
    shared span is attended ONCE with all sequences' queries batched into
    a single M = S*G dot per block: S-fold fewer MXU weight loads and
    S-fold fewer KV block fetches over the shared span. Emits raw flash
    state (acc, m, l) that seeds the per-seq window kernel via its
    skip/init operands."""
    def kernel(*refs):
        if quantized:
            (layer_ref, tables_ref, nsh_ref, q_ref, k_ref, v_ref,
             ks_ref, vs_ref, acc_ref, m_ref, l_ref,
             m_scr, l_scr, acc_scr) = refs
        else:
            (layer_ref, tables_ref, nsh_ref, q_ref, k_ref, v_ref,
             acc_ref, m_ref, l_ref, m_scr, l_scr, acc_scr) = refs
        it = pl.program_id(0)
        last_it = pl.num_programs(0) - 1
        nsh = nsh_ref[0]

        @pl.when(it == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        @pl.when(it < nsh)
        def _():
            k = k_ref[0, 0]
            v = v_ref[0, 0]
            if quantized:
                k = k.astype(compute_dtype)
                v = v.astype(compute_dtype)
                ksc, vsc = ks_ref[0, 0], vs_ref[0, 0]
            else:
                ksc = vsc = None
            # Every row of every shared block is committed KV strictly
            # before each member's window start, so no position masking:
            # klimit = +inf, no patch row.
            _window_flash_block(
                q_ref[...], k, v, ksc, vsc, 0, jnp.int32(2 ** 30), None,
                None, -1, m_scr, l_scr, acc_scr,
                compute_dtype=compute_dtype, kv_heads=kv_heads, groups=rows,
                head_dim=head_dim, logit_softcap=logit_softcap,
            )

        @pl.when(it == last_it)
        def _():
            acc_ref[...] = acc_scr[...]
            m_ref[...] = m_scr[..., 0]
            l_ref[...] = l_scr[..., 0]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "logit_softcap")
)
def shared_prefix_partial(
    q: jax.Array,              # [S, Hq, Dh]
    k_cache,                   # array or (data, scale) tuple
    v_cache,
    layer_idx: jax.Array,
    shared_tables: jax.Array,  # [MSHB] int32 — the common block-id prefix
    shared_nblocks: jax.Array, # scalar int32 — valid entries in shared_tables
    *,
    scale: float,
    logit_softcap: float = None,
    interpret: bool = False,
) -> tuple:
    """Partial flash attention of ALL sequences over one shared block list.

    Returns raw flash state in the window kernel's init layout:
    (acc [S, Hkv, G, Dh] f32 unnormalized, m [S, Hkv, G], l [S, Hkv, G]).
    The caller feeds these to `paged_attention_window(skip_blocks=...,
    init=...)`; non-member rows are ignored there (skip == 0 resets to the
    identity state), so this kernel wastes no masking on them."""
    k_scales = v_scales = None
    if isinstance(k_cache, tuple):
        k_cache, k_scales = k_cache
        v_cache, v_scales = v_cache
    S, Hq, Dh = q.shape
    L, NB, Hkv, BS, _ = k_cache.shape
    G = Hq // Hkv
    rows = S * G
    MSHB = shared_tables.shape[0]
    tables = jnp.clip(shared_tables, 0, NB - 1)
    compute_dtype = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
    # One M = S*G dot per (kv head, block): q heads are [Hkv, G] row-major,
    # so [S, Hkv, G, Dh] -> [Hkv, S*G, Dh] keeps (seq, group) contiguous.
    qf = (
        q.reshape(S, Hkv, G, Dh).transpose(1, 0, 2, 3).reshape(Hkv, rows, Dh)
        .astype(jnp.float32) * scale
    ).astype(compute_dtype)

    def kv_index(it, layer_ref, tables_ref, nsh_ref):
        nb = jnp.maximum(nsh_ref[0], 1)
        blk = tables_ref[jnp.minimum(it, nb - 1)]
        return (layer_ref[0], blk, 0, 0, 0)

    def scale_index(it, layer_ref, tables_ref, nsh_ref):
        nb = jnp.maximum(nsh_ref[0], 1)
        blk = tables_ref[jnp.minimum(it, nb - 1)]
        return (layer_ref[0], blk, 0, 0)

    quantized = k_scales is not None
    kernel = _make_shared_prefix_kernel(
        quantized=quantized, kv_heads=Hkv, rows=rows, head_dim=Dh,
        compute_dtype=compute_dtype, logit_softcap=logit_softcap,
    )
    in_specs = [
        pl.BlockSpec((Hkv, rows, Dh), lambda it, *p: (0, 0, 0)),
        pl.BlockSpec((1, 1, Hkv, BS, Dh), kv_index),
        pl.BlockSpec((1, 1, Hkv, BS, Dh), kv_index),
    ]
    operands = [
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        tables,
        jnp.asarray(shared_nblocks, jnp.int32).reshape(1),
        qf,
        k_cache,
        v_cache,
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, Hkv, BS), scale_index),
            pl.BlockSpec((1, 1, Hkv, BS), scale_index),
        ]
        operands += [k_scales, v_scales]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(MSHB,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((Hkv, rows, Dh), lambda it, *p: (0, 0, 0)),
            pl.BlockSpec((Hkv, rows), lambda it, *p: (0, 0)),
            pl.BlockSpec((Hkv, rows), lambda it, *p: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((Hkv, rows, 1), jnp.float32),
            pltpu.VMEM((Hkv, rows, 1), jnp.float32),
            pltpu.VMEM((Hkv, rows, Dh), jnp.float32),
        ],
    )
    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Hkv, rows, Dh), jnp.float32),
            jax.ShapeDtypeStruct((Hkv, rows), jnp.float32),
            jax.ShapeDtypeStruct((Hkv, rows), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    acc = acc.reshape(Hkv, S, G, Dh).transpose(1, 0, 2, 3)  # [S, Hkv, G, Dh]
    m = m.reshape(Hkv, S, G).transpose(1, 0, 2)             # [S, Hkv, G]
    l = l.reshape(Hkv, S, G).transpose(1, 0, 2)
    return acc, m, l


def _window_commit_kernel(
    layer_ref, block_tables_ref, start_ref, valid_ref,
    kw_ref,             # [C, Hkv, K, Dh] window rows (cache dtype)
    vw_ref,
    k_in, v_in,
    k_out, v_out,
    tiles,              # [C, 2, 2, Hkv, SP, Dh] (piece, array)
    sems,               # [C, 2, 2]
    *,
    chunk, block_size, kv_heads, head_dim, win, sp,
):
    c = pl.program_id(0)
    layer = layer_ref[0]

    def piece_addr(i, piece):
        s = c * chunk + i
        start = start_ref[s]
        # Piece 0 begins at `start`; piece 1 begins at the next block
        # boundary (only live when the span crosses it).
        p0 = jnp.where(piece == 0, start, (start // block_size + 1) * block_size)
        end = start + win - 1
        blk = block_tables_ref[s, jnp.minimum(p0 // block_size, block_tables_ref.shape[1] - 1)]
        # Divide LAST so Mosaic can prove the slice base is tile-aligned
        # (clip/min after the multiply defeats its divisibility analysis).
        base = jnp.minimum(p0 % block_size, block_size - sp) // _TILE_MIN * _TILE_MIN
        live = (p0 <= end) & (valid_ref[s] > 0)
        return blk, base, live

    def dma(i, piece, which, to_hbm):
        blk, base, _ = piece_addr(i, piece)
        cache = k_out if which == 0 else v_out
        hbm = cache.at[layer, blk, :, pl.ds(base, sp), :]
        vmem = tiles.at[i, piece, which]
        src, dst = (vmem, hbm) if to_hbm else (hbm, vmem)
        return pltpu.make_async_copy(src, dst, sems.at[i, piece * 2 + which])

    for i in range(chunk):
        for piece in range(2):
            _, _, live = piece_addr(i, piece)
            @pl.when(live)
            def _(i=i, piece=piece):
                dma(i, piece, 0, False).start()
                dma(i, piece, 1, False).start()

    for i in range(chunk):
        s = c * chunk + i
        for piece in range(2):
            blk, base, live = piece_addr(i, piece)
            @pl.when(live)
            def _(i=i, piece=piece, blk=blk, base=base):
                start = start_ref[s]
                p0 = jnp.where(piece == 0, start,
                               (start // block_size + 1) * block_size)
                blk_lo = p0 // block_size * block_size
                dma(i, piece, 0, False).wait()
                dma(i, piece, 1, False).wait()
                # Shifted-copy patch via one-hot batched matmul: span row r
                # (absolute pos blk_lo + base + r) takes window row w where
                # start + w == that position.
                r_iota = jax.lax.broadcasted_iota(jnp.int32, (kv_heads, sp, win), 1)
                w_iota = jax.lax.broadcasted_iota(jnp.int32, (kv_heads, sp, win), 2)
                abs_pos = blk_lo + base + r_iota
                onehot = (abs_pos == start + w_iota) & (w_iota < win)
                in_span = jnp.sum(onehot, axis=2, keepdims=True) > 0  # [Hkv, SP, 1]
                for which, (wref, out_tiles) in enumerate(((kw_ref, 0), (vw_ref, 1))):
                    rows = jax.lax.dot_general(
                        onehot.astype(jnp.float32),
                        wref[i].astype(jnp.float32),
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )  # [Hkv, SP, Dh]
                    tiles[i, piece, which] = jnp.where(
                        in_span, rows.astype(tiles.dtype), tiles[i, piece, which]
                    )
                dma(i, piece, 0, True).start()
                dma(i, piece, 1, True).start()

    for i in range(chunk):
        for piece in range(2):
            _, _, live = piece_addr(i, piece)
            @pl.when(live)
            def _(i=i, piece=piece):
                dma(i, piece, 0, True).wait()
                dma(i, piece, 1, True).wait()


_TILE_MIN = 8


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(2, 3))
def kv_window_commit(
    k_win: jax.Array,          # [S, Hkv, K, Dh] full-precision window rows
    v_win: jax.Array,
    k_cache,                   # array or (data, scale) tuple (donated)
    v_cache,
    layer_idx: jax.Array,
    block_tables: jax.Array,   # [S, MAXBLK]
    start_lens: jax.Array,     # [S] first window position (ctx0 - 1)
    valid: jax.Array,          # [S] int32/bool — 0 rows are skipped
    *,
    interpret: bool = False,
):
    """Commit a decode window's K rows per sequence as ONE contiguous span
    (at most two RMW pieces when it crosses a block boundary) instead of K
    per-substep row commits — K-fold fewer DMA issues. Quantized tuple
    caches quantize the rows here (per-(position, head) amax) and commit
    the scale-plane spans the same way."""
    k_scales = v_scales = None
    if isinstance(k_cache, tuple):
        k_cache, k_scales = k_cache
        v_cache, v_scales = v_cache
    S, Hkv, W, Dh = k_win.shape
    L, NB, _, BS, _ = k_cache.shape
    assert W <= BS, "window must fit within one block span"
    tables = jnp.clip(block_tables, 0, NB - 1)
    valid = valid.astype(jnp.int32)

    quantized = k_scales is not None
    if quantized:
        def qrows(x):
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1)  # [S, Hkv, W]
            if k_cache.dtype == jnp.int8:
                scales = jnp.maximum(amax / 127.0, 1e-10)
                qv = jnp.clip(jnp.round(xf / scales[..., None]), -127, 127)
            else:
                scales = jnp.maximum(amax / 448.0, 1e-10)
                qv = xf / scales[..., None]
            return qv.astype(k_cache.dtype), scales

        kq, ks_rows = qrows(k_win)
        vq, vs_rows = qrows(v_win)
    else:
        kq, vq = k_win.astype(k_cache.dtype), v_win.astype(v_cache.dtype)

    chunk = min(S, 32)
    Spad = -(-S // chunk) * chunk
    if Spad != S:
        pads = [(0, Spad - S)]
        kq = jnp.pad(kq, pads + [(0, 0)] * 3)
        vq = jnp.pad(vq, pads + [(0, 0)] * 3)
        tables = jnp.pad(tables, pads + [(0, 0)])
        start_lens = jnp.pad(start_lens, pads)
        valid = jnp.pad(valid, pads)
        if quantized:
            ks_rows = jnp.pad(ks_rows, pads + [(0, 0)] * 2)
            vs_rows = jnp.pad(vs_rows, pads + [(0, 0)] * 2)

    tile = _sublane_tile(k_cache.dtype)
    # Static span size: covers W rows at any tile offset, capped at BS.
    sp = min(BS, ((W - 1) // tile + 2) * tile)

    kernel = functools.partial(
        _window_commit_kernel if not quantized else _window_commit_kernel_quant,
        chunk=chunk, block_size=BS, kv_heads=Hkv, head_dim=Dh, win=W, sp=sp,
    )
    if not quantized:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(Spad // chunk,),
            in_specs=[
                pl.BlockSpec((chunk, Hkv, W, Dh), lambda c, *p: (c, 0, 0, 0)),
                pl.BlockSpec((chunk, Hkv, W, Dh), lambda c, *p: (c, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((chunk, 2, 2, Hkv, sp, Dh), k_cache.dtype),
                pltpu.SemaphoreType.DMA((chunk, 4)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            ),
            # Scalar prefetch: 4; then kq=4, vq=5, k_cache=6, v_cache=7.
            input_output_aliases={6: 0, 7: 1},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(
            jnp.asarray(layer_idx, jnp.int32).reshape(1),
            tables, start_lens, valid,
            kq, vq, k_cache, v_cache,
        )

    lane_tile = 128 if BS % 128 == 0 else BS
    sp_l = min(BS, ((W - 1) // lane_tile + 2) * lane_tile)

    # Precompute the scale-plane span contents in XLA (one fused vector op
    # over [S, 2, Hkv, SP_L]); building them inside the kernel cost
    # ~0.4 ms/layer as 64 serially-unrolled iota+dot instances.
    piece_id = jnp.arange(2, dtype=jnp.int32)[None, :]              # [1, 2]
    p0 = jnp.where(piece_id == 0, start_lens[:, None],
                   (start_lens[:, None] // BS + 1) * BS)            # [S, 2]
    blk_lo = p0 // BS * BS
    sbase = jnp.minimum(p0 % BS, BS - sp_l) // lane_tile * lane_tile
    abs_lane = (blk_lo + sbase)[:, :, None] + jnp.arange(sp_l)[None, None, :]
    match = (
        abs_lane[:, :, :, None]
        == start_lens[:, None, None, None] + jnp.arange(W)[None, None, None, :]
    )  # [S, 2, SP_L, W]
    smask = jnp.any(match, axis=-1).astype(jnp.float32)             # [S, 2, SP_L]
    ksv = jnp.einsum("szlw,shw->szhl",
                     match.astype(jnp.float32), ks_rows)            # [S, 2, Hkv, SP_L]
    vsv = jnp.einsum("szlw,shw->szhl", match.astype(jnp.float32), vs_rows)
    smask = jnp.broadcast_to(smask[:, :, None, :], ksv.shape)
    if Spad != S:
        pads = [(0, Spad - S)]
        ksv = jnp.pad(ksv, pads + [(0, 0)] * 3)
        vsv = jnp.pad(vsv, pads + [(0, 0)] * 3)
        smask = jnp.pad(smask, pads + [(0, 0)] * 3)

    kernel = functools.partial(
        _window_commit_kernel_quant,
        chunk=chunk, block_size=BS, kv_heads=Hkv, head_dim=Dh, win=W, sp=sp,
        lane_tile=lane_tile, sp_l=sp_l,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Spad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, Hkv, W, Dh), lambda c, *p: (c, 0, 0, 0)),
            pl.BlockSpec((chunk, Hkv, W, Dh), lambda c, *p: (c, 0, 0, 0)),
            pl.BlockSpec((chunk, 2, Hkv, sp_l), lambda c, *p: (c, 0, 0, 0)),
            pl.BlockSpec((chunk, 2, Hkv, sp_l), lambda c, *p: (c, 0, 0, 0)),
            pl.BlockSpec((chunk, 2, Hkv, sp_l), lambda c, *p: (c, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk, 2, 2, Hkv, sp, Dh), k_cache.dtype),
            pltpu.VMEM((chunk, 2, 2, Hkv, sp_l), jnp.float32),
            pltpu.SemaphoreType.DMA((chunk, 8)),
        ],
    )
    k_data, v_data, k_s, v_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(k_scales.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scales.shape, jnp.float32),
        ),
        # Scalar prefetch: 4; kq=4, vq=5, ksv=6, vsv=7, smask=8, caches 9-12.
        input_output_aliases={9: 0, 10: 1, 11: 2, 12: 3},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        tables, start_lens, valid,
        kq, vq, ksv, vsv, smask,
        k_cache, v_cache, k_scales, v_scales,
    )
    return (k_data, k_s), (v_data, v_s)


def _window_commit_kernel_quant(
    layer_ref, block_tables_ref, start_ref, valid_ref,
    kw_ref, vw_ref,          # [C, Hkv, K, Dh] quantized data rows
    ksv_ref, vsv_ref,        # [C, 2, Hkv, SP_L] f32 precomputed scale spans
    smask_ref,               # [C, 2, Hkv, SP_L] f32 1.0 on span rows
    k_in, v_in, ks_in, vs_in,
    k_out, v_out, ks_out, vs_out,
    tiles,                   # [C, 2, 2, Hkv, SP, Dh]
    stiles,                  # [C, 2, 2, Hkv, SP_L]
    sems,                    # [C, 8]
    *,
    chunk, block_size, kv_heads, head_dim, win, sp, lane_tile, sp_l,
):
    c = pl.program_id(0)
    layer = layer_ref[0]

    def piece_addr(i, piece, tile_sz, span):
        s = c * chunk + i
        start = start_ref[s]
        p0 = jnp.where(piece == 0, start, (start // block_size + 1) * block_size)
        end = start + win - 1
        blk = block_tables_ref[s, jnp.minimum(p0 // block_size, block_tables_ref.shape[1] - 1)]
        # Divide LAST so Mosaic can prove the slice base is tile-aligned.
        base = jnp.minimum(p0 % block_size, block_size - span) // tile_sz * tile_sz
        live = (p0 <= end) & (valid_ref[s] > 0)
        return blk, base, live

    def data_dma(i, piece, which, to_hbm):
        blk, base, _ = piece_addr(i, piece, _TILE_MIN * 4, sp)
        cache = k_out if which == 0 else v_out
        hbm = cache.at[layer, blk, :, pl.ds(base, sp), :]
        vmem = tiles.at[i, piece, which]
        src, dst = (vmem, hbm) if to_hbm else (hbm, vmem)
        return pltpu.make_async_copy(src, dst, sems.at[i, piece * 2 + which])

    def scale_dma(i, piece, which, to_hbm):
        blk, base, _ = piece_addr(i, piece, lane_tile, sp_l)
        plane = ks_out if which == 0 else vs_out
        hbm = plane.at[layer, blk, :, pl.ds(base, sp_l)]
        vmem = stiles.at[i, piece, which]
        src, dst = (vmem, hbm) if to_hbm else (hbm, vmem)
        return pltpu.make_async_copy(src, dst, sems.at[i, 4 + piece * 2 + which])

    for i in range(chunk):
        for piece in range(2):
            _, _, live = piece_addr(i, piece, _TILE_MIN * 4, sp)
            @pl.when(live)
            def _(i=i, piece=piece):
                data_dma(i, piece, 0, False).start()
                data_dma(i, piece, 1, False).start()
                scale_dma(i, piece, 0, False).start()
                scale_dma(i, piece, 1, False).start()

    for i in range(chunk):
        s = c * chunk + i
        for piece in range(2):
            _, _, live = piece_addr(i, piece, _TILE_MIN * 4, sp)
            @pl.when(live)
            def _(i=i, piece=piece):
                start = start_ref[s]
                p0 = jnp.where(piece == 0, start,
                               (start // block_size + 1) * block_size)
                blk_lo = p0 // block_size * block_size
                _, dbase, _ = piece_addr(i, piece, _TILE_MIN * 4, sp)
                data_dma(i, piece, 0, False).wait()
                data_dma(i, piece, 1, False).wait()
                r_iota = jax.lax.broadcasted_iota(jnp.int32, (kv_heads, sp, win), 1)
                w_iota = jax.lax.broadcasted_iota(jnp.int32, (kv_heads, sp, win), 2)
                onehot = (blk_lo + dbase + r_iota == start + w_iota) & (w_iota < win)
                in_span = jnp.sum(onehot, axis=2, keepdims=True) > 0
                for which, wref in ((0, kw_ref), (1, vw_ref)):
                    rows = jax.lax.dot_general(
                        onehot.astype(jnp.float32),
                        wref[i].astype(jnp.float32),
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    tiles[i, piece, which] = jnp.where(
                        in_span, rows.astype(tiles.dtype), tiles[i, piece, which]
                    )
                data_dma(i, piece, 0, True).start()
                data_dma(i, piece, 1, True).start()

                scale_dma(i, piece, 0, False).wait()
                scale_dma(i, piece, 1, False).wait()
                # Span values/mask precomputed in XLA (in-kernel iota+dot
                # construction measured ~0.4 ms/layer across the 64
                # serially-unrolled instances).
                smask = smask_ref[i, piece] > 0.0
                stiles[i, piece, 0] = jnp.where(
                    smask, ksv_ref[i, piece], stiles[i, piece, 0]
                )
                stiles[i, piece, 1] = jnp.where(
                    smask, vsv_ref[i, piece], stiles[i, piece, 1]
                )
                scale_dma(i, piece, 0, True).start()
                scale_dma(i, piece, 1, True).start()

    for i in range(chunk):
        for piece in range(2):
            _, _, live = piece_addr(i, piece, _TILE_MIN * 4, sp)
            @pl.when(live)
            def _(i=i, piece=piece):
                data_dma(i, piece, 0, True).wait()
                data_dma(i, piece, 1, True).wait()
                scale_dma(i, piece, 0, True).wait()
                scale_dma(i, piece, 1, True).wait()


# ---------------------------------------------------------------------------
# Unified window decode attention: history blocks + staged window rows in
# ONE kernel.
#
# v5e measurements that shaped this design (experiments/window_probe.py):
# - merging history (kernel) with window rows (XLA) via (m, l) outputs cost
#   more than it saved: f32 acc round trips + per-layer dynamic
#   index/update of the [L,S,Hkv,K,Dh] staging buffer ~1 ms/substep.
#   Here the staged rows are fetched through the pallas pipeline as one
#   more block (BlockSpec indexed by (layer, seq)) and flash-merged
#   in-kernel; the staging buffer is updated ONCE per substep outside.
# - dequantizing a fetched int8 block to f32 in VMEM (262K converts +
#   multiplies per block) made int8-KV attention SLOWER than bf16. Instead
#   the per-row scales fold into the [Hkv, G, BS] scores (for K) and into
#   the probabilities (for V) — O(BS) scale work instead of O(BS*Dh) — and
#   the dots run on bf16 operands (f32 accumulation), not f32.
# ---------------------------------------------------------------------------

def _window_flash_block(q, k, v, kscale, vscale, pos_base, klimit, patch_k,
                        patch_v, patch_pos, m_scr, l_scr, acc_scr, *,
                        compute_dtype, kv_heads, groups, head_dim,
                        lo_limit=None, logit_softcap=None):
    """One flash block update. q: [Hkv, G, Dh] (pre-scaled, compute dtype);
    k/v: [Hkv, B, Dh]; kscale/vscale: [Hkv, B] f32 or None (folded into
    scores / probabilities — O(B) work instead of O(B*Dh) block
    dequantization); pos_base: absolute position of the block's row 0;
    rows with position >= klimit are masked, and (sliding window) rows
    below lo_limit when given; patch_k/v: [Hkv, Dh] row
    substituted at absolute position patch_pos (None disables).

    A transposed formulation (scores_T = k @ q^T with M=block rows) was
    tried and measured SLOWER on v5e (150 vs 79 us/layer int8) — Mosaic's
    scheduling does not reward it; keep the natural orientation."""
    B = k.shape[1]
    if patch_k is not None:
        pos3 = pos_base + jax.lax.broadcasted_iota(
            jnp.int32, (kv_heads, B, head_dim), 1
        )
        sel = pos3 == patch_pos
        k = jnp.where(sel, patch_k[:, None, :], k)
        v = jnp.where(sel, patch_v[:, None, :], v)
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Hkv, G, B]
    pos2 = pos_base + jax.lax.broadcasted_iota(jnp.int32, (kv_heads, B), 1)
    if kscale is not None:
        ksc = jnp.where(pos2 == patch_pos, 1.0, kscale)
        scores = scores * ksc[:, None, :]
    if logit_softcap is not None:
        # Gemma-2 score softcap on the true (scaled, dequantized) scores.
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)
    pos_g = pos_base + jax.lax.broadcasted_iota(
        jnp.int32, (kv_heads, groups, B), 2
    )
    valid = pos_g < klimit
    if lo_limit is not None:
        valid = valid & (pos_g >= lo_limit)
    scores = jnp.where(valid, scores, _NEG_INF)

    m = m_scr[...]
    m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(scores - m_new)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    if vscale is not None:
        vsc = jnp.where(pos2 == patch_pos, 1.0, vscale)
        p = p * vsc[:, None, :]
    pv = jax.lax.dot_general(
        p.astype(compute_dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[...] = m_new


def _make_window_attn_kernel(*, quantized, scale, block_size, kv_heads,
                             groups, head_dim, win, compute_dtype, sps,
                             npar, has_init, sliding_window=None,
                             logit_softcap=None):
    # Per-grid-step fixed cost (~1-2 us on v5e) dominates this kernel at
    # decode shapes, so the grid is minimized three ways: SPS sequence
    # lanes per step (independent flash updates — the hardware overlaps
    # their compute), npar history blocks per lane per step (paired
    # even/odd BlockSpec fetches — but ONLY when MAXBLK is large: with one
    # or two live blocks per sequence the second fetch operand clamps to
    # the SAME block and re-fetches it, doubling KV DMA; measured 59 -> 77
    # us/layer fetch floor at the batch-32 bench shape,
    # experiments/attn3_probe.py), and the staged-window update + finalize
    # folded into the LAST step instead of its own step.
    #
    # has_init: shared-prefix mode — sequences with skip_blocks > 0 seed
    # their flash state from the shared-prefix partial (init_acc/m/l) and
    # start history iteration at block skip_blocks; skip == 0 rows use the
    # identity state (their init rows are garbage and never read).
    def kernel(*refs):
        (layer_ref, tables_ref, start_ref, sub_ref, skip_ref,
         q_ref, k_new_ref, v_new_ref, kw_ref, vw_ref) = refs[:10]
        ncache = 2 * npar * sps * (2 if quantized else 1)
        cache_refs = refs[10:10 + ncache]
        rest = refs[10 + ncache:]
        if has_init:
            init_acc_ref, init_m_ref, init_l_ref = rest[:3]
            rest = rest[3:]
        out_ref, m_scr, l_scr, acc_scr = rest

        ss = pl.program_id(0)
        it = pl.program_id(1)
        last_it = pl.num_programs(1) - 1
        j = sub_ref[0]                    # substep: staged rows w < j valid

        @pl.when(it == 0)
        def _():
            if has_init:
                for a in range(sps):
                    use = skip_ref[ss * sps + a] > 0
                    m_scr[a] = jnp.where(
                        use, init_m_ref[a][..., None], _NEG_INF
                    )
                    l_scr[a] = jnp.where(use, init_l_ref[a][..., None], 0.0)
                    acc_scr[a] = jnp.where(use, init_acc_ref[a], 0.0)
            else:
                m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
                l_scr[...] = jnp.zeros_like(l_scr)
                acc_scr[...] = jnp.zeros_like(acc_scr)

        for a in range(sps):
            seq = ss * sps + a
            start = start_ref[seq]        # committed history length
            nb = pl.cdiv(start, block_size)
            skip = skip_ref[seq]          # blocks covered by the init state
            q = (q_ref[a].reshape(kv_heads, groups, head_dim)
                 .astype(jnp.float32) * scale).astype(compute_dtype)
            msl = (m_scr.at[a], l_scr.at[a], acc_scr.at[a])
            # Sliding window: this substep's query sits at position
            # start + j; keys below lo are masked (HF: q - k < window).
            lo = (start + j - (sliding_window - 1)
                  if sliding_window is not None else None)

            for par in range(npar):
                k_ref = cache_refs[2 * npar * a + 2 * par]
                v_ref = cache_refs[2 * npar * a + 2 * par + 1]
                if quantized:
                    ks_ref = cache_refs[2 * npar * (sps + a) + 2 * par]
                    vs_ref = cache_refs[2 * npar * (sps + a) + 2 * par + 1]
                else:
                    ks_ref = vs_ref = None

                blk_idx = skip + npar * it + par
                needed = blk_idx < nb
                if sliding_window is not None:
                    # Skip blocks entirely below the lowest substep-0
                    # window edge (lo only rises with j).
                    needed = needed & (
                        (blk_idx + 1) * block_size > start - sliding_window
                    )

                @pl.when(needed)
                def _(a=a, par=par, k_ref=k_ref, v_ref=v_ref,
                      ks_ref=ks_ref, vs_ref=vs_ref, q=q, start=start,
                      skip=skip, msl=msl, lo=lo, blk_idx=blk_idx):
                    k = k_ref[0, 0]
                    v = v_ref[0, 0]
                    if quantized:
                        k = k.astype(compute_dtype)
                        v = v.astype(compute_dtype)
                        ksc, vsc = ks_ref[0, 0], vs_ref[0, 0]
                    else:
                        ksc = vsc = None
                    _window_flash_block(
                        q, k, v, ksc, vsc,
                        blk_idx * block_size,
                        start, None, None, -1, *msl,
                        compute_dtype=compute_dtype, kv_heads=kv_heads,
                        groups=groups, head_dim=head_dim, lo_limit=lo,
                        logit_softcap=logit_softcap,
                    )

            @pl.when(it == last_it)
            def _(a=a, q=q, start=start, msl=msl, lo=lo):
                # Staged window rows (w < j) + this substep's own row
                # patched at w == j, at full precision.
                kw = kw_ref[0, a].astype(compute_dtype)  # [Hkv, K, Dh]
                vw = vw_ref[0, a].astype(compute_dtype)
                _window_flash_block(
                    q, kw, vw, None, None, start, start + j + 1,
                    k_new_ref[a].astype(compute_dtype),
                    v_new_ref[a].astype(compute_dtype),
                    start + j, *msl,
                    compute_dtype=compute_dtype, kv_heads=kv_heads,
                    groups=groups, head_dim=head_dim, lo_limit=lo,
                    logit_softcap=logit_softcap,
                )
                m_, l_, acc_ = msl
                l = l_[...]
                out = jnp.where(l > 0, acc_[...] / jnp.maximum(l, 1e-30), 0.0)
                out_ref[a] = out.reshape(kv_heads * groups, head_dim).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "interpret", "max_rem", "sliding_window", "logit_softcap",
    ),
)
def paged_attention_window(
    q: jax.Array,              # [S, Hq, Dh]
    k_new: jax.Array,          # [S, Hkv, Dh] this substep's row (full prec)
    v_new: jax.Array,
    k_staged: jax.Array,       # [L, S, Hkv, K, Dh] window staging buffer
    v_staged: jax.Array,
    k_cache,                   # array or (data, scale) tuple
    v_cache,
    layer_idx: jax.Array,
    block_tables: jax.Array,   # [S, MAXBLK]
    start_lens: jax.Array,     # [S] committed history length (= first window pos)
    substep: jax.Array,        # scalar j: staged rows w < j are valid
    skip_blocks: jax.Array = None,  # [S] blocks covered by `init` (0 = none)
    init: tuple = None,        # (acc [S,Hkv,G,Dh], m [S,Hkv,G], l [S,Hkv,G])
    *,
    scale: float,
    max_rem: int = None,       # static: max history blocks any row iterates
    sliding_window: int = None,
    logit_softcap: float = None,
    interpret: bool = False,
) -> jax.Array:
    """Window-mode flash decode attention in one kernel: committed history
    blocks (pipeline-gathered; per-row scales folded into scores/probs for
    quantized caches — O(BS) scale work instead of O(BS*Dh) block
    dequantization) + the staged window rows + this substep's own row.
    Returns [S, Hq, Dh].

    Shared-prefix mode: `init` carries raw flash state from
    `shared_prefix_partial`; rows with skip_blocks > 0 seed from it and
    start history iteration at their skip offset (the shared span is never
    re-fetched or re-attended per sequence). `max_rem` bounds the history
    grid to the post-skip maximum so shared spans cost no grid steps."""
    k_scales = v_scales = None
    if isinstance(k_cache, tuple):
        k_cache, k_scales = k_cache
        v_cache, v_scales = v_cache
    S, Hq, Dh = q.shape
    L, NB, Hkv, BS, _ = k_cache.shape
    W = k_staged.shape[3]
    groups = Hq // Hkv
    MAXBLK = block_tables.shape[1]
    tables = jnp.clip(block_tables, 0, NB - 1)
    compute_dtype = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
    SPS = 4 if S % 4 == 0 else (2 if S % 2 == 0 else 1)
    if max_rem is None:
        max_rem = MAXBLK
    has_init = init is not None
    if skip_blocks is None:
        skip_blocks = jnp.zeros((S,), jnp.int32)
    # Paired even/odd fetches halve the grid only when sequences actually
    # span many blocks; at MAXBLK <= 2 the pair operand clamps to the same
    # block and RE-FETCHES it (the pipeline dedups only per-operand), which
    # doubled the KV fetch floor (59 -> 77 us/layer measured at the batch-32
    # bench shape, experiments/attn3_probe.py).
    NPAR = 2 if max_rem >= 4 else 1

    def kv_index(a, par):
        def index(ss, it, layer_ref, tables_ref, start_ref, sub_ref,
                  skip_ref):
            seq = ss * SPS + a
            nb = jnp.maximum(pl.cdiv(start_ref[seq], BS), 1)
            blk = tables_ref[
                seq, jnp.minimum(skip_ref[seq] + NPAR * it + par, nb - 1)
            ]
            return (layer_ref[0], blk, 0, 0, 0)
        return index

    def scale_index(a, par):
        def index(ss, it, layer_ref, tables_ref, start_ref, sub_ref,
                  skip_ref):
            seq = ss * SPS + a
            nb = jnp.maximum(pl.cdiv(start_ref[seq], BS), 1)
            blk = tables_ref[
                seq, jnp.minimum(skip_ref[seq] + NPAR * it + par, nb - 1)
            ]
            return (layer_ref[0], blk, 0, 0)
        return index

    def staged_index(ss, it, layer_ref, *_):
        return (layer_ref[0], ss, 0, 0, 0)

    quantized = k_scales is not None
    kernel = _make_window_attn_kernel(
        quantized=quantized, scale=scale, block_size=BS, kv_heads=Hkv,
        groups=groups, head_dim=Dh, win=W, compute_dtype=compute_dtype,
        sps=SPS, npar=NPAR, has_init=has_init, sliding_window=sliding_window,
        logit_softcap=logit_softcap,
    )
    in_specs = [
        pl.BlockSpec((SPS, Hq, Dh), lambda ss, it, *p: (ss, 0, 0)),
        pl.BlockSpec((SPS, Hkv, Dh), lambda ss, it, *p: (ss, 0, 0)),
        pl.BlockSpec((SPS, Hkv, Dh), lambda ss, it, *p: (ss, 0, 0)),
        pl.BlockSpec((1, SPS, Hkv, W, Dh), staged_index),
        pl.BlockSpec((1, SPS, Hkv, W, Dh), staged_index),
    ]
    operands = [
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        tables,
        start_lens,
        jnp.asarray(substep, jnp.int32).reshape(1),
        jnp.asarray(skip_blocks, jnp.int32),
        q,
        k_new.astype(compute_dtype),
        v_new.astype(compute_dtype),
        k_staged,
        v_staged,
    ]
    for a in range(SPS):
        for par in range(NPAR):
            in_specs += [
                pl.BlockSpec((1, 1, Hkv, BS, Dh), kv_index(a, par)),
                pl.BlockSpec((1, 1, Hkv, BS, Dh), kv_index(a, par)),
            ]
            operands += [k_cache, v_cache]
    if quantized:
        for a in range(SPS):
            for par in range(NPAR):
                in_specs += [
                    pl.BlockSpec((1, 1, Hkv, BS), scale_index(a, par)),
                    pl.BlockSpec((1, 1, Hkv, BS), scale_index(a, par)),
                ]
                operands += [k_scales, v_scales]
    if has_init:
        init_acc, init_m, init_l = init
        in_specs += [
            pl.BlockSpec((SPS, Hkv, groups, Dh), lambda ss, it, *p: (ss, 0, 0, 0)),
            pl.BlockSpec((SPS, Hkv, groups), lambda ss, it, *p: (ss, 0, 0)),
            pl.BlockSpec((SPS, Hkv, groups), lambda ss, it, *p: (ss, 0, 0)),
        ]
        operands += [
            init_acc.astype(jnp.float32),
            init_m.astype(jnp.float32),
            init_l.astype(jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(S // SPS, max(1, -(-max_rem // NPAR))),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((SPS, Hq, Dh), lambda ss, it, *p: (ss, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((SPS, Hkv, groups, 1), jnp.float32),
            pltpu.VMEM((SPS, Hkv, groups, 1), jnp.float32),
            pltpu.VMEM((SPS, Hkv, groups, Dh), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, Hq, Dh), q.dtype),
        # SPS x 2-parity x {K,V} double-buffered block fetches exceed the
        # default 16 MB scoped-vmem budget; v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
