"""Fused weight-only dequant + matmul Pallas kernel.

The M4 north star (SURVEY §7 hard part #3): decode is HBM-bandwidth-bound,
so INT8/INT4 weights should cut matmul time 2-4x — but XLA's
dequantize-then-dot materializes the bf16 weights (measured on v5e: int4
2.8x slower than bf16 at prefill scale). This kernel streams the quantized
tiles HBM->VMEM, dequantizes in registers, and feeds the MXU directly; the
bf16 weights never exist in HBM.

Round-3 unpack rework (experiments/int4_probe2.py, decode 4-matmul chain
x28 layers): the round-2 int32-widening nibble unpack (shifts only
legalize on int32 in Mosaic; ~10 VPU passes + 8->32-bit relayouts) lost
to **pltpu.bitcast(packed int8 -> jnp.int4) + native astype(bf16)** —
Mosaic's own int4 unpack path. The bitcast consumes "pair" packing
(row 2i in the low nibble of byte row i) with even rows in low nibbles.

Round-4 re-measurement (experiments/int4_sol_probe.py, SLOPE METHOD —
earlier rounds' timings amortized the tunneled attachment's ~25 ms fixed
dispatch cost into every number and were ~0.9-1.2 ms too high): the
chain actually runs 533-544 us/step at S=1..32 (group-128 scales;
per-channel would be 450-473) against a 233 us int4 byte floor, a 312-326
us measured DMA floor through these tiles, and a 457-462 us clamped-DMA
unpack+MXU floor — i.e. the kernel sits within ~2% of its measured
compute floor and DMA hides completely behind it. bf16 via plain XLA
measures 845-1063 us at the same shapes, so int4 decode is a true
1.6-2.0x. The residual floor is the MXU weight-feed + unpack rate at
decode-M, not bytes: mxu16 (bf16, zero-DMA) measures 1010 us at these
tiles, and the int4 unpack adds nothing over its own dot (bc4 full ==
unp4 clamped within noise). See docs/performance.md "INT4 speed of
light" for the two-sided bound.

The kernel also tiles the batch dim (grid (M, OUT, IN), IN innermost), so
it serves PREFILL-scale token counts too — int4 prefill previously fell
back to XLA at 2.8x slower than bf16 (VERDICT r2 weak #3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanovllm_tpu.ops.quant import QuantizedTensor


def _pick_tiles(S: int, IN: int, OUT: int) -> tuple:
    """Largest (TI, TO) whose working set (double-buffered x and weight
    blocks, f32 accumulator, double-buffered output) fits VMEM: grid-step
    overhead (~1 us per step) dominates at decode batch sizes, so
    fewer/bigger tiles win."""
    budget = 56 * 1024 * 1024
    best = (0, 0)
    for ti in (1024, 512, 256, 128):
        if IN % ti:
            continue
        for to in (2048, 1024, 512, 256, 128):
            if OUT % to:
                continue
            need = (2 * ti * to          # weight blocks (<=1 B/value packed)
                    + 2 * S * ti * 2     # x blocks, bf16
                    + S * to * 4         # accumulator
                    + 2 * S * to * 2)    # output blocks
            if need <= budget and ti * to > best[0] * best[1]:
                best = (ti, to)
        if best[0]:
            break
    return best


def _kernel(x_ref, w_ref, s_ref, *rest, bits: int, group: int,
            ti: int, to: int, has_bias: bool, stacked: bool = False):
    if stacked:
        # Stacked variant: the first positional is the scalar-prefetch
        # layer index (consumed by the BlockSpec index maps, unused here),
        # and every weight-side block carries a leading singleton layer
        # dim.
        x_ref, w_ref, s_ref = w_ref, s_ref, rest[0]
        rest = rest[1:]
        unw = lambda r: r[0]
    else:
        unw = lambda r: r[...]
    if has_bias:
        b_ref, o_ref, acc = rest
    else:
        o_ref, acc = rest
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...].astype(jnp.bfloat16)
    scales = unw(s_ref)[0]  # [TI//G (or 1), TO]

    def mm(xs, ws):
        return jax.lax.dot_general(
            xs, ws,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if bits == 8:
        q = unw(w_ref).astype(jnp.bfloat16)  # [TI, TO] — single convert pass
    else:
        # "pair" packing + Mosaic-native unpack: bitcast the packed int8
        # rows to int4 (doubling the sublane dim back to TI rows, low
        # nibble first) and let the hardware's int4->bf16 convert unpack.
        q = pltpu.bitcast(unw(w_ref), jnp.int4).astype(jnp.bfloat16)
    gpt = max(1, ti // group)  # groups per tile
    span = ti // gpt
    if gpt <= 8:
        # Coarse groups (per-channel int8, int4 G >= 128): scales factor
        # OUT of each group's partial dot — apply them to the [S, TO]
        # partial result instead of the [TI, TO] weights. VPU work per tile
        # drops from O(TI*TO) dequant to O(S*TO) per group, at the cost of
        # one MXU pipeline fill per group (~80 us/chain per halving of G at
        # decode shapes — docs/performance.md "INT4 speed of light"). The
        # asymmetric bias rides the same factoring: Σ_i∈g x_i·b_gj =
        # (Σ_i∈g x_i)·b_gj, one row-sum + rank-1 update per group, in f32.
        for g in range(gpt):
            xg = x[:, g * span:(g + 1) * span]
            acc[...] += mm(xg, q[g * span:(g + 1) * span, :]) * scales[g][None, :]
            if has_bias:
                xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
                acc[...] += xsum * unw(b_ref)[0][g][None, :]
    else:
        # Fine groups (the asymmetric-int4 G=64/32 accuracy defaults):
        # 16-32 per-group dots would stall the MXU on pipeline fills, so
        # dequantize in-register instead — w = q·s (+ b) in f32, rounded
        # ONCE to bf16 (numerically identical to dequantize(qt, bf16),
        # i.e. to keeping the model's weights in bf16 — the precision the
        # bf16 baseline itself runs at), then ONE full-tile dot. The
        # repeated [TI, TO] scale/bias planes are built by concatenating
        # per-group broadcasts (Mosaic has no 2D->3D vector reshape).
        def rep(rows):  # [gpt, TO] f32 -> [TI, TO] f32, row g repeated span times
            return jnp.concatenate(
                [jnp.broadcast_to(rows[g][None, :], (span, to))
                 for g in range(gpt)], axis=0)

        wdq = q.astype(jnp.float32) * rep(scales)
        if has_bias:
            wdq = wdq + rep(unw(b_ref)[0])
        acc[...] += mm(x, wdq.astype(jnp.bfloat16))

    @pl.when(i == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_quant_matmul(x: jax.Array, qt: QuantizedTensor, *,
                       interpret: bool = False) -> jax.Array:
    """x [S, IN] @ dequant(qt) [IN, OUT] -> [S, OUT] in x.dtype.

    qt must be un-stacked (2-D weight); tiles must divide IN/OUT — callers
    check `fusable(qt)` and fall back to the jnp path otherwise. The batch
    dim is tiled (prefill-scale S supported); S pads to a sublane multiple.
    """
    S, IN = x.shape
    OUT = qt.out_dim
    G = qt.group_size
    # Decode-scale batches only (callers route S > 256 through
    # `pallas_dequantize` + XLA matmul: measured at 4096-token prefill,
    # in-kernel unpack does NOT hide behind the MXU — 256-row M tiles ran
    # 1.52x bf16 (re-unpack per tile) and one 2048-row block 1.7x (the
    # unpack serializes against the block's dot) — while unpack-to-HBM
    # costs one ~45 MB/layer streaming pass against a compute-bound
    # matmul).
    TS = S if S <= 256 else 256
    TS = -(-TS // 8) * 8
    Spad = -(-S // TS) * TS
    if Spad != S:
        x = jnp.pad(x, ((0, Spad - S), (0, 0)))
    TI, TO = _pick_tiles(TS, IN, OUT)
    assert TI and TO and (TI % G == 0 or G % TI == 0), (IN, OUT, G)
    packed_rows = TI if qt.bits == 8 else TI // 2

    has_bias = qt.bias is not None
    kernel = functools.partial(
        _kernel, bits=qt.bits, group=G, ti=TI, to=TO, has_bias=has_bias
    )
    grid = (Spad // TS, OUT // TO, IN // TI)
    # Scales reshaped to a per-tile 3-D layout: tile i reads row block
    # (i*TI)//G_span. When G >= TI (e.g. per-out-channel int8) every tile
    # inside a group reads the same single row. The asymmetric bias shares
    # the scale's [in/G, out] shape and rides the identical spec.
    if G >= TI:
        rows_per_tile = 1
        scale3 = qt.scale.reshape(IN // G, 1, OUT)
        scale_index = lambda m, j, i: ((i * TI) // G, 0, j)
    else:
        rows_per_tile = TI // G
        scale3 = qt.scale.reshape(IN // TI, TI // G, OUT)
        scale_index = lambda m, j, i: (i, 0, j)
    group_spec = pl.BlockSpec((1, rows_per_tile, TO), scale_index)
    in_specs = [
        pl.BlockSpec((TS, TI), lambda m, j, i: (m, i)),
        pl.BlockSpec((packed_rows, TO), lambda m, j, i: (i, j)),
        group_spec,
    ]
    operands = [x, qt.data, scale3]
    if has_bias:
        in_specs.append(group_spec)
        operands.append(qt.bias.reshape(scale3.shape))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TS, TO), lambda m, j, i: (m, j)),
        out_shape=jax.ShapeDtypeStruct((Spad, OUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((TS, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out[:S] if Spad != S else out


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_quant_matmul_stacked(x: jax.Array, qt: QuantizedTensor,
                               layer_idx, *,
                               interpret: bool = False) -> jax.Array:
    """x [S, IN] @ dequant(qt[layer_idx]) -> [S, OUT]: the layer-STACKED
    variant for the model's scan loop.

    qt carries the full [L, ...] stacked weight; the layer index arrives
    as a scalar-prefetch operand and the BlockSpec index maps address the
    layer directly in HBM — the same pattern the attention kernels use for
    the stacked KV cache. This is the whole point: slicing a stacked
    weight in XLA-land to feed a pallas_call materializes the slice (a
    full per-layer weight copy each scan step — measured +275 us per
    28-layer 0.6B decode chain, experiments/scan_slice_probe.py; at large
    S the copy hides behind MXU-bound kernels, at decode batches the chain
    is bandwidth-bound and pays it in full). XLA's own dots fuse the slice
    for free, which is why int8 (XLA dot) never paid this and engine int4
    decode measured slower than int8 at batch 1 (VERDICT r4 #4)."""
    S, IN = x.shape
    L = qt.data.shape[0]
    OUT = qt.out_dim
    G = qt.group_size
    TS = S if S <= 256 else 256
    TS = -(-TS // 8) * 8
    Spad = -(-S // TS) * TS
    if Spad != S:
        x = jnp.pad(x, ((0, Spad - S), (0, 0)))
    TI, TO = _pick_tiles(TS, IN, OUT)
    assert TI and TO and (TI % G == 0 or G % TI == 0), (IN, OUT, G)
    packed_rows = TI if qt.bits == 8 else TI // 2

    has_bias = qt.bias is not None
    kernel = functools.partial(
        _kernel, bits=qt.bits, group=G, ti=TI, to=TO, has_bias=has_bias,
        stacked=True,
    )
    grid = (Spad // TS, OUT // TO, IN // TI)
    if G >= TI:
        rows_per_tile = 1
        scale4 = qt.scale.reshape(L, IN // G, 1, OUT)
        scale_index = lambda m, j, i, lr: (lr[0], (i * TI) // G, 0, j)
    else:
        rows_per_tile = TI // G
        scale4 = qt.scale.reshape(L, IN // TI, TI // G, OUT)
        scale_index = lambda m, j, i, lr: (lr[0], i, 0, j)
    group_spec = pl.BlockSpec((1, 1, rows_per_tile, TO), scale_index)
    in_specs = [
        pl.BlockSpec((TS, TI), lambda m, j, i, lr: (m, i)),
        pl.BlockSpec((1, packed_rows, TO), lambda m, j, i, lr: (lr[0], i, j)),
        group_spec,
    ]
    operands = [jnp.asarray(layer_idx, jnp.int32).reshape(1), x, qt.data,
                scale4]
    if has_bias:
        in_specs.append(group_spec)
        operands.append(qt.bias.reshape(scale4.shape))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TS, TO), lambda m, j, i, lr: (m, j)),
        scratch_shapes=[pltpu.VMEM((TS, TO), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Spad, OUT), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out[:S] if Spad != S else out


def fusable_stacked(x: jax.Array, qt: QuantizedTensor) -> bool:
    """Whether the stacked fused kernel supports these shapes."""
    if x.ndim != 2 or qt.data.ndim != 3:
        return False
    if x.shape[0] > 256:
        return False
    if qt.bits == 4 and qt.pack != "pair":
        return False
    IN, OUT = qt.in_dim, qt.out_dim
    TS = min(-(-x.shape[0] // 8) * 8, 256)
    TI, TO = _pick_tiles(TS, IN, OUT)
    G = qt.group_size
    return bool(TI and TO and (TI % G == 0 or G % TI == 0))


def fusable(x: jax.Array, qt: QuantizedTensor) -> bool:
    """Whether the fused kernel supports these shapes (decode-scale S)."""
    if x.ndim != 2 or qt.data.ndim != 2:
        return False
    if x.shape[0] > 256:
        # Prefill-scale batches take pallas_dequantize + XLA matmul.
        return False
    if qt.bits == 4 and qt.pack != "pair":
        # The bitcast unpack consumes pair packing (even row -> low nibble).
        return False
    IN, OUT = qt.in_dim, qt.out_dim
    TS = min(-(-x.shape[0] // 8) * 8, 256)
    TI, TO = _pick_tiles(TS, IN, OUT)
    G = qt.group_size
    return bool(TI and TO and (TI % G == 0 or G % TI == 0))


# ---------------------------------------------------------------------------
# Prefill-scale path: unpack + dequantize the weight ONCE to bf16 in HBM,
# then let XLA run the (compute-bound) matmul at full MXU rate. XLA's own
# int4 dequant-dot measured 2.8x slower than bf16 (its nibble unpack does
# not vectorize); this kernel streams the packed bytes once (~45 MB/layer
# on Qwen3-0.6B shapes ≈ 57 us at HBM bandwidth vs a ~585 us/layer
# matmul).
# ---------------------------------------------------------------------------

def _dequant_kernel(w_ref, s_ref, *rest, group, ti, to, has_bias):
    if has_bias:
        b_ref, o_ref = rest
    else:
        o_ref, = rest
    q = pltpu.bitcast(w_ref[...], jnp.int4).astype(jnp.float32)  # [TI, TO]
    scales = s_ref[0]
    gpt = max(1, ti // group)
    span = ti // gpt
    for g in range(gpt):
        w = q[g * span:(g + 1) * span, :] * scales[g][None, :]
        if has_bias:
            w += b_ref[0][g][None, :]
        o_ref[g * span:(g + 1) * span, :] = w.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def pallas_dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16, *,
                      interpret: bool = False) -> jax.Array:
    """dequant(qt) -> [IN, OUT] in `dtype` via the bitcast unpack (int4,
    pair packing, 2-D weights only)."""
    assert qt.bits == 4 and qt.pack == "pair" and qt.data.ndim == 2
    IN, OUT = qt.in_dim, qt.out_dim
    G = qt.group_size
    TI, TO = _pick_tiles(8, IN, OUT)
    assert TI and TO and (TI % G == 0 or G % TI == 0), (IN, OUT, G)
    if G >= TI:
        rows_per_tile = 1
        scale3 = qt.scale.reshape(IN // G, 1, OUT)
        scale_index = lambda i, j: ((i * TI) // G, 0, j)
    else:
        rows_per_tile = TI // G
        scale3 = qt.scale.reshape(IN // TI, TI // G, OUT)
        scale_index = lambda i, j: (i, 0, j)
    has_bias = qt.bias is not None
    group_spec = pl.BlockSpec((1, rows_per_tile, TO), scale_index)
    in_specs = [
        pl.BlockSpec((TI // 2, TO), lambda i, j: (i, j)),
        group_spec,
    ]
    operands = [qt.data, scale3]
    if has_bias:
        in_specs.append(group_spec)
        operands.append(qt.bias.reshape(scale3.shape))
    return pl.pallas_call(
        functools.partial(_dequant_kernel, group=G, ti=TI, to=TO,
                          has_bias=has_bias),
        grid=(IN // TI, OUT // TO),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TI, TO), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((IN, OUT), dtype),
        # Fine-group scale+bias blocks are f32 at TI/G rows each: at G=32
        # they add TI*TO/2 bytes of double-buffered operand on top of the
        # packed weight + bf16 output tiles, which blew the default ~16 MB
        # scoped-vmem budget at 8B shapes (bench config-4 compile OOM,
        # round 5). v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def dequantizable(qt: QuantizedTensor) -> bool:
    if qt.bits != 4 or qt.pack != "pair" or qt.data.ndim != 2:
        return False
    TI, TO = _pick_tiles(8, qt.in_dim, qt.out_dim)
    G = qt.group_size
    return bool(TI and TO and (TI % G == 0 or G % TI == 0))
