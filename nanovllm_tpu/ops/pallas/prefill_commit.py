"""Bulk prefill KV-cache commit: whole-block HBM->HBM DMAs.

The prefill path must place this batch's K/V into the paged cache before
attention (queries attend other new tokens of the same batch). The XLA
row-scatter costs ~67 ms for a 4096-token batch on v5e; this kernel instead
copies whole blocks with the DMA engine:

- K/V arrive pre-arranged as the padded query grid [S, Hkv, Qpad, Dh]
  (same XLA gather/transpose as the flash-prefill queries), where grid row
  r of sequence s is position num_cached + r.
- num_cached_tokens is always block-aligned (block managers cap to block
  boundaries), so every written block starts at offset 0 and the copy is a
  full [Hkv, BS, Dh] block: rows past the sequence's last token carry
  padding garbage into positions >= context_len, which every reader masks
  (and later decode writes overwrite row-by-row).
- Shared prefix blocks are never written: they are fully cached and the
  per-block gate skips block indices below num_cached/BS.

Reference capability: store_kv_cache (src/layers/attention.rs:150-174),
batched at block granularity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _commit_kernel(
    # scalar prefetch
    layer_ref,        # [1]
    tables_ref,       # [S, MAXBLK]
    ctx_ref,          # [S] total kv length
    cblk_ref,         # [S] first non-cached block index (num_cached / BS)
    # inputs (ANY: stay in HBM)
    k_grid,           # [S, Hkv, Qpad, Dh]
    v_grid,
    k_in,             # aliased cache inputs (unused)
    v_in,
    # outputs (aliased caches)
    k_out,            # [L, NB, Hkv, BS, Dh]
    v_out,
    # scratch
    sems,             # [2, 2] DMA semaphores (pipeline slot, k/v)
    *,
    block_size: int,
):
    s = pl.program_id(0)
    b = pl.program_id(1)
    layer = layer_ref[0]
    ctx = ctx_ref[s]
    needed = (b >= cblk_ref[s]) & (b * block_size < ctx)
    slot = jax.lax.rem(s * pl.num_programs(1) + b, 2)

    @pl.when(needed)
    def _():
        blk = tables_ref[s, b]
        row_lo = (b - cblk_ref[s]) * block_size
        for which, (grid, cache) in enumerate(((k_grid, k_out), (v_grid, v_out))):
            dma = pltpu.make_async_copy(
                grid.at[s, :, pl.ds(row_lo, block_size), :],
                cache.at[layer, blk],
                sems.at[slot, which],
            )
            dma.start()
            dma.wait()


def _commit_kernel_quant(
    layer_ref, tables_ref, ctx_ref, cblk_ref,
    # inputs (ANY): pre-quantized grids + per-row scale grids
    k_grid,           # [S, Hkv, Qpad, Dh] cache dtype
    v_grid,
    ks_grid,          # [S, Hkv, Qpad] f32 (lane-dim BS slices: requires
    vs_grid,          #   BS % 128 == 0, gated in ModelRunner)
    k_in, v_in, ks_in, vs_in,
    # outputs (aliased)
    k_out, v_out,     # [L, NB, Hkv, BS, Dh]
    ks_out, vs_out,   # [L, NB, Hkv, BS] f32 scale planes
    sems,             # [2, 4]
    *,
    block_size: int,
):
    """Whole-block commit for quantized tuple caches: data blocks AND
    scale-plane blocks ship as full-block DMAs (rows were quantized in XLA
    before the call)."""
    s = pl.program_id(0)
    b = pl.program_id(1)
    layer = layer_ref[0]
    ctx = ctx_ref[s]
    needed = (b >= cblk_ref[s]) & (b * block_size < ctx)
    slot = jax.lax.rem(s * pl.num_programs(1) + b, 2)

    @pl.when(needed)
    def _():
        blk = tables_ref[s, b]
        row_lo = (b - cblk_ref[s]) * block_size
        copies = (
            (k_grid.at[s, :, pl.ds(row_lo, block_size), :], k_out.at[layer, blk], 0),
            (v_grid.at[s, :, pl.ds(row_lo, block_size), :], v_out.at[layer, blk], 1),
            (ks_grid.at[s, :, pl.ds(row_lo, block_size)], ks_out.at[layer, blk], 2),
            (vs_grid.at[s, :, pl.ds(row_lo, block_size)], vs_out.at[layer, blk], 3),
        )
        for src, dst, which in copies:
            dma = pltpu.make_async_copy(src, dst, sems.at[slot, which])
            dma.start()
            dma.wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(2, 3))
def prefill_kv_commit(
    k_grid: jax.Array,        # [S, Hkv, Qpad, Dh] query-grid-arranged K
    v_grid: jax.Array,
    k_cache: jax.Array,       # [L, NB, Hkv, BS, Dh] (donated)
    v_cache: jax.Array,
    layer_idx: jax.Array,
    block_tables: jax.Array,  # [S, MAXBLK] (-1 padded)
    context_lens: jax.Array,  # [S]
    cached_blocks: jax.Array, # [S] num_cached_tokens // BS per sequence
    *,
    interpret: bool = False,
) -> tuple:
    """Write the batch's K/V grids into the paged caches block-by-block
    (plain or quantized tuple caches). Returns the updated caches."""
    k_scales = v_scales = None
    if isinstance(k_cache, tuple):
        k_cache, k_scales = k_cache
        v_cache, v_scales = v_cache
    S, Hkv, Qpad, Dh = k_grid.shape
    L, NB, _, BS, _ = k_cache.shape
    MAXBLK = block_tables.shape[1]
    assert Qpad % BS == 0, (Qpad, BS)

    tables = jnp.clip(block_tables, 0, NB - 1)
    if k_scales is None:
        kernel = functools.partial(_commit_kernel, block_size=BS)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(S, MAXBLK),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((2, 2))],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            ),
            # Operands incl. 4 scalar-prefetch args: k_grid=4, v_grid=5,
            # k_cache=6, v_cache=7.
            input_output_aliases={6: 0, 7: 1},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(
            jnp.asarray(layer_idx, jnp.int32).reshape(1),
            tables,
            context_lens,
            cached_blocks,
            k_grid.astype(k_cache.dtype),
            v_grid.astype(v_cache.dtype),
            k_cache,
            v_cache,
        )

    # Quantize the grids per (seq, head, row) in XLA (fused, cheap), then
    # whole-block DMA data + scale-plane blocks.
    def qgrid(x):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1)  # [S, Hkv, Qpad]
        if k_cache.dtype == jnp.int8:
            scales = jnp.maximum(amax / 127.0, 1e-10)
            qv = jnp.clip(jnp.round(xf / scales[..., None]), -127, 127)
        else:
            scales = jnp.maximum(amax / 448.0, 1e-10)
            qv = xf / scales[..., None]
        return qv.astype(k_cache.dtype), scales

    kq, ks = qgrid(k_grid)
    vq, vs = qgrid(v_grid)
    # Scale-plane DMAs slice the LANE dim by BS, which Mosaic only allows
    # 128-aligned — hence the ModelRunner gate: quantized KV on real TPUs
    # requires BS % 128 == 0 (a block-major reshape was tried and just
    # moves the misalignment to the sublane dim).
    kernel = functools.partial(_commit_kernel_quant, block_size=BS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S, MAXBLK),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2, 4))],
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
        # Operands incl. prefetch: kq=4, vq=5, ks=6, vs=7, caches 8-11.
        input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        tables,
        context_lens,
        cached_blocks,
        kq, vq, ks, vs,
        k_cache, v_cache, k_scales, v_scales,
    )
    return (k_data, k_s), (v_data, v_s)
