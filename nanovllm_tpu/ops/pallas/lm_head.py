"""Fused lm_head + greedy argmax Pallas kernel.

Greedy decode never needs the logits — only the argmax over the vocab. The
unfused path (reference: embed_head.rs logits → sampler.rs argmax) pays for
materializing a [S, V] fp32 logits buffer in HBM and reading it back for the
argmax: at Qwen3-0.6B decode batch 256 that is 2 x 155 MB of HBM traffic per
substep on top of the 155 MB int8 weight read, measured at 1.56 ms of a
~19 ms substep (experiments/engine_probe256.py). This kernel streams the
[V, D] head weight once, tile by tile, computes each vocab tile's logits in
VMEM, and keeps only a running (best value, best index) pair per row — the
logits never exist in HBM, cutting the step to its weight-read + MXU floor.

Tile-size note (v5e, S=256, V=151936, D=1024, int8 weights): grid-step fixed
cost ~1-2 us favors few big tiles; the weight tile is the VMEM budget
(double-buffered TV x D). TV=8192 -> 19 grid steps, 2 x 8 MB weight blocks.

Semantics match jnp.argmax (first index wins ties): within a tile the
minimum qualifying column is taken, across tiles a strictly-greater max is
required to displace the running best, and the vocab's ragged tail
(151936 = 19 x 8192 - 3712) is masked to -inf before the reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # python float: a jnp scalar here would be a captured tracer


def _greedy_head_kernel(x_ref, w_ref, s_ref, val_ref, idx_ref, *,
                        tile_v: int, vocab: int):
    t = pl.program_id(0)
    w = w_ref[...]
    if w.dtype != x_ref.dtype:
        w = w.astype(x_ref.dtype)  # int8 tile -> bf16 in VMEM (never in HBM)
    acc = jax.lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (1,)), ((), ())),  # contract D on both
        preferred_element_type=jnp.float32,
    )  # [S, TV]
    acc = acc * s_ref[...]  # per-vocab-row scale, [1, TV]
    gcol = t * tile_v + jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    acc = jnp.where(gcol < vocab, acc, _NEG)  # ragged tail mask

    mx = jnp.max(acc, axis=-1, keepdims=True)  # [S, 1]
    loc = jnp.min(
        jnp.where(acc >= mx, gcol, jnp.int32(2 ** 30)), axis=-1, keepdims=True
    )  # [S, 1] first column attaining the tile max

    @pl.when(t == 0)
    def _():
        val_ref[...] = jnp.broadcast_to(mx, val_ref.shape)
        idx_ref[...] = jnp.broadcast_to(loc, idx_ref.shape)

    @pl.when(t != 0)
    def _():
        prev = val_ref[...]
        better = jnp.broadcast_to(mx, prev.shape) > prev  # strict: first tile wins ties
        val_ref[...] = jnp.where(better, jnp.broadcast_to(mx, prev.shape), prev)
        idx_ref[...] = jnp.where(
            better, jnp.broadcast_to(loc, idx_ref.shape), idx_ref[...]
        )


def _pick_tile_v(S: int, D: int, wbytes: int) -> int:
    budget = 48 * 1024 * 1024
    for tv in (8192, 4096, 2048, 1024, 512):
        need = 2 * tv * D * wbytes + S * D * 2 + 2 * tv * 4 + 2 * S * 128 * 8
        if need <= budget:
            return tv
    return 256


@functools.partial(jax.jit, static_argnames=("tile_v", "interpret"))
def fused_greedy_head(
    x: jax.Array,           # [S, D] activations at each sequence's last token
    data: jax.Array,        # [V, D] head weight (int8 or x.dtype), embedding orientation
    scale: jax.Array = None,  # [V] f32 per-vocab-row scales (int8), or None
    *,
    tile_v: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """argmax over the vocab of (x @ data.T) * scale, without materializing
    the [S, V] logits. Returns [S] int32 token ids (first index wins ties,
    matching jnp.argmax)."""
    S, D = x.shape
    V = data.shape[0]
    if scale is None:
        scale = jnp.ones((V,), jnp.float32)
    if not tile_v:
        tile_v = _pick_tile_v(S, D, data.dtype.itemsize)
    Sp = max(8, S)
    if Sp != S:
        x = jnp.pad(x, ((0, Sp - S), (0, 0)))
    grid = (-(-V // tile_v),)

    val, idx = pl.pallas_call(
        functools.partial(_greedy_head_kernel, tile_v=tile_v, vocab=V),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Sp, D), lambda t: (0, 0)),
            pl.BlockSpec((tile_v, D), lambda t: (t, 0)),
            pl.BlockSpec((1, tile_v), lambda t: (0, t)),
        ],
        out_specs=[
            pl.BlockSpec((Sp, 128), lambda t: (0, 0)),
            pl.BlockSpec((Sp, 128), lambda t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, 128), jnp.float32),
            jax.ShapeDtypeStruct((Sp, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, data, scale.reshape(1, V))
    del val
    return idx[:S, 0]
