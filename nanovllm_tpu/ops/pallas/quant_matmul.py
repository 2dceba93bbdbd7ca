"""Fused weight-only dequant + matmul Pallas kernel.

The M4 north star (SURVEY §7 hard part #3): decode is HBM-bandwidth-bound,
so INT8/INT4 weights should cut matmul time 2-4x — but XLA's
dequantize-then-dot materializes the bf16 weights (measured on v5e: int8
SLOWER than bf16, int4 2.8x slower). This kernel streams the quantized
tiles HBM->VMEM, dequantizes in registers, and feeds the MXU directly; the
bf16 weights never exist in HBM.

Grid (out_tiles, in_tiles), in innermost; x rides in VMEM whole-rows per
in-tile; the f32 accumulator lives in scratch across the in dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanovllm_tpu.ops.quant import QuantizedTensor


_MAX_BATCH = 256  # fused path is for decode-sized batches (prefill uses XLA)


def _pick_tile(dim: int, candidates=(512, 256, 128)) -> int:
    for t in candidates:
        if dim % t == 0:
            return t
    return 0


def _pick_tiles(S: int, IN: int, OUT: int, itemsize_w: int) -> tuple:
    """Largest (TI, TO) under a ~10 MB VMEM budget: grid-step overhead (~1 us
    per step) dominates at decode batch sizes, so fewer/bigger tiles win."""
    budget = 10 * 1024 * 1024
    best = (0, 0)
    for ti in (1024, 512, 256, 128):
        if IN % ti:
            continue
        for to in (2048, 1024, 512, 256, 128):
            if OUT % to:
                continue
            need = 2 * ti * to * itemsize_w + S * ti * 2 + S * to * 4
            if need <= budget and ti * to > best[0] * best[1]:
                best = (ti, to)
        if best[0]:
            break
    return best


def _kernel(x_ref, w_ref, s_ref, o_ref, acc, *, bits: int, group: int,
            ti: int, to: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    # Scales factor OUT of each group's partial dot: apply them to the
    # [S, TO] partial result instead of the [TI, TO] weights — VPU work per
    # tile drops from O(TI*TO) dequant to O(S*TO) per group.
    x = x_ref[...].astype(jnp.bfloat16)
    scales = s_ref[0]  # [TI//G (or 1), TO]

    def mm(xs, ws):
        return jax.lax.dot_general(
            xs, ws,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if bits == 8:
        q = w_ref[...].astype(jnp.bfloat16)  # [TI, TO] — single convert pass
        gpt = max(1, ti // group)  # groups per tile
        span = ti // gpt
        for g in range(gpt):
            acc[...] += mm(x[:, g * span:(g + 1) * span],
                           q[g * span:(g + 1) * span, :]) * scales[g][None, :]
    else:
        # block256 int4: packed rows b*128..(b+1)*128 hold in-rows
        # [b*256, b*256+128) in the low nibbles and [b*256+128, (b+1)*256)
        # in the high nibbles — each half is CONTIGUOUS, so no interleave
        # relayout: one dot per half. Unpack in int32 (8-bit shifts don't
        # legalize in Mosaic).
        p32 = w_ref[...].astype(jnp.int32)  # [TI//2, TO]
        lo = p32 & 0x0F
        hi = jax.lax.shift_right_logical(p32, 4) & 0x0F
        lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.bfloat16)
        hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.bfloat16)
        per_channel = group >= ti
        for b in range(ti // 256):
            lo_b = lo[b * 128:(b + 1) * 128, :]
            hi_b = hi[b * 128:(b + 1) * 128, :]
            x_lo = x[:, b * 256: b * 256 + 128]
            x_hi = x[:, b * 256 + 128: (b + 1) * 256]
            s_lo = scales[0] if per_channel else scales[(b * 256) // group]
            s_hi = scales[0] if per_channel else scales[(b * 256 + 128) // group]
            acc[...] += mm(x_lo, lo_b) * s_lo[None, :]
            acc[...] += mm(x_hi, hi_b) * s_hi[None, :]

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_quant_matmul(x: jax.Array, qt: QuantizedTensor, *,
                       interpret: bool = False) -> jax.Array:
    """x [S, IN] @ dequant(qt) [IN, OUT] -> [S, OUT] in x.dtype.

    qt must be un-stacked (2-D weight); tiles must divide IN/OUT — callers
    check `fusable(qt)` and fall back to the jnp path otherwise.
    """
    S, IN = x.shape
    OUT = qt.out_dim
    G = qt.group_size
    TI, TO = _pick_tiles(S, IN, OUT, 1 if qt.bits == 8 else 1)
    assert TI and TO and (TI % G == 0 or G % TI == 0), (IN, OUT, G)
    packed_rows = TI if qt.bits == 8 else TI // 2

    kernel = functools.partial(
        _kernel, bits=qt.bits, group=G, ti=TI, to=TO
    )
    grid = (OUT // TO, IN // TI)
    # Scales reshaped to a per-tile 3-D layout: tile i reads row block
    # (i*TI)//G_span. When G >= TI (e.g. per-out-channel int8) every tile
    # inside a group reads the same single row.
    if G >= TI:
        rows_per_tile = 1
        scale3 = qt.scale.reshape(IN // G, 1, OUT)
        scale_index = lambda j, i: ((i * TI) // G, 0, j)
    else:
        rows_per_tile = TI // G
        scale3 = qt.scale.reshape(IN // TI, TI // G, OUT)
        scale_index = lambda j, i: (i, 0, j)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, TI), lambda j, i: (0, i)),
            pl.BlockSpec((packed_rows, TO), lambda j, i: (i, j)),
            pl.BlockSpec((1, rows_per_tile, TO), scale_index),
        ],
        out_specs=pl.BlockSpec((S, TO), lambda j, i: (0, j)),
        out_shape=jax.ShapeDtypeStruct((S, OUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((S, TO), jnp.float32)],
        interpret=interpret,
    )(x, qt.data, scale3)
    return out


def fusable(x: jax.Array, qt: QuantizedTensor) -> bool:
    """Whether the fused kernel supports these shapes."""
    if x.ndim != 2 or qt.data.ndim != 2:
        return False
    if x.shape[0] > _MAX_BATCH:
        # Prefill-scale batches blow the VMEM budget; XLA's dequant path is
        # acceptable there (compute-bound, dequant amortizes over tokens).
        return False
    if qt.bits == 4:
        # The kernel's contiguous-halves unpack requires block256 packing
        # with one scale group per 128-row half (or per-channel scales).
        if qt.pack != "block256":
            return False
        if not (qt.group_size == 128 or qt.group_size >= qt.in_dim):
            return False
    IN, OUT = qt.in_dim, qt.out_dim
    TI, TO = _pick_tiles(x.shape[0], IN, OUT, 1)
    G = qt.group_size
    return bool(TI and TO and (TI % G == 0 or G % TI == 0))
