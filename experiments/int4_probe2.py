"""Round-3 INT4 matmul rework: kill the int32-widening nibble unpack.

The shipping fused int4 kernel (ops/pallas/quant_matmul.py) unpacks nibbles
via int8->int32 widening + shifts + sign-selects (~10 VPU passes over the
packed tile, plus 8->32-bit relayouts) and lands at ~4.5x its roofline
(VERDICT r2). Variants measured on the full decode 4-matmul chain
(Qwen3-0.6B shapes, S=32, x28 layers; int8 XLA dequant-dot baseline
= 946 us/step):

  cur4    — shipping fused int4 kernel
  xla8    — shipping int8 path (XLA dequantize-then-dot), the bar to beat
  ob4     — OFFSET-BINARY repack + f32-arithmetic unpack: nibbles store
            w+8 in [1,15]; unpack = convert/mul/floor/fma (6 passes, no
            shifts, no sign-selects); the -8 bias folds into a rank-1
            correction  dot(x, nib-8) = dot(x, nib) - 8*rowsum(x)
  i8and   — lo nibble via int8 AND (byte-density, no widening) + hi via
            f32 floor; tests whether bitwise AND legalizes on int8 vectors
            (shifts famously don't)
  nat4    — jnp.int4 storage, in-kernel native astype(bf16); tests
            Mosaic's own int4 unpack path
  i8mxu   — int8 weights with s8 x s8 -> s32 MXU dots (x dynamically
            row-quantized to int8): does the MXU double its tile rate on
            int8 operands? Decides the int8 dispatch too.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.quant import QuantizedTensor, dequantize, quantize

S = 32
L = 28
# Qwen3-0.6B decode matmul shapes: qkv, o, gate_up, down.
SHAPES = [(1024, 2048), (2048, 1024), (1024, 6144), (3072, 1024)]
rng = np.random.default_rng(0)


def _barrier(x):
    np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[:8])


def timeit(fn, x0, *args, iters=30, warmup=3):
    x = x0
    for _ in range(warmup):
        x = fn(x, *args)
    _barrier(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args)
    _barrier(x)
    return (time.perf_counter() - t0) / iters


def mkw(shape):
    return rng.standard_normal(shape, np.float32) * 0.02


def _tiles(IN, OUT, packed_itemsize=1):
    budget = 10 * 1024 * 1024
    for ti in (1024, 512, 256):
        if IN % ti:
            continue
        for to in (2048, 1024, 512):
            if OUT % to:
                continue
            if 2 * ti * to * packed_itemsize + S * ti * 2 + S * to * 4 <= budget:
                return ti, to
    raise ValueError((IN, OUT))


# ---------------------------------------------------------------------------
# Variant kernels: grid (OUT//TO, IN//TI), f32 accumulator in scratch.
# All use per-out-channel scales (scale [1, OUT] per matmul).
# ---------------------------------------------------------------------------

def _mk_kernel(variant, ti, to):
    def kernel(x_ref, w_ref, s_ref, o_ref, acc, *extra):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        scales = s_ref[0]  # [1, TO] -> row 0
        x = x_ref[...]

        if variant == "ob4":
            # packed int8 [TI//2, TO] (uint8 bytes viewed signed):
            # halves-contiguous block256 layout, nibbles hold value+8.
            c = w_ref[...].astype(jnp.float32)
            c = jnp.where(c < 0, c + 256.0, c)
            h = jnp.floor(c * 0.0625)
            l = c - h * 16.0
            lb = l.astype(jnp.bfloat16)
            hb = h.astype(jnp.bfloat16)
            for b in range(ti // 256):
                x_lo = x[:, b * 256: b * 256 + 128]
                x_hi = x[:, b * 256 + 128: (b + 1) * 256]
                for xs_, wb in ((x_lo, lb[b * 128:(b + 1) * 128, :]),
                                (x_hi, hb[b * 128:(b + 1) * 128, :])):
                    part = jax.lax.dot_general(
                        xs_.astype(jnp.bfloat16), wb,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    corr = 8.0 * jnp.sum(
                        xs_.astype(jnp.float32), axis=1, keepdims=True)
                    acc[...] += (part - corr) * scales[0][None, :]
        elif variant == "i8and":
            p = w_ref[...]                       # int8 view, offset-binary
            lo_u = (p & jnp.int8(0x0F)).astype(jnp.bfloat16)
            c = p.astype(jnp.float32)
            c = jnp.where(c < 0, c + 256.0, c)
            hi_u = jnp.floor(c * 0.0625).astype(jnp.bfloat16)
            for b in range(ti // 256):
                x_lo = x[:, b * 256: b * 256 + 128]
                x_hi = x[:, b * 256 + 128: (b + 1) * 256]
                for xs_, wb in ((x_lo, lo_u[b * 128:(b + 1) * 128, :]),
                                (x_hi, hi_u[b * 128:(b + 1) * 128, :])):
                    part = jax.lax.dot_general(
                        xs_.astype(jnp.bfloat16), wb,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    corr = 8.0 * jnp.sum(
                        xs_.astype(jnp.float32), axis=1, keepdims=True)
                    acc[...] += (part - corr) * scales[0][None, :]
        elif variant == "bc4":
            from jax.experimental.pallas import tpu as _pt
            w4 = _pt.bitcast(w_ref[...], jnp.int4)  # [TI, TO] int4
            w = w4.astype(jnp.bfloat16)             # Mosaic-native unpack
            acc[...] += jax.lax.dot_general(
                x.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scales[0][None, :]
        elif variant == "i8mxu":
            xs_ref = extra[0] if extra else None
            w = w_ref[...]                        # int8 [TI, TO]
            s32 = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # x int8
            acc[...] += (s32.astype(jnp.float32)
                         * scales[0][None, :])
        else:
            raise ValueError(variant)

        @pl.when(i == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc[...].astype(o_ref.dtype)

    return kernel


def build_variant_mm(variant, IN, OUT, w):
    """Returns (call(x) -> [S, OUT] bf16, prepared operands)."""
    qt = quantize(jnp.asarray(w), 4, group_size=-1)     # per-channel scales
    scale = qt.scale.astype(jnp.float32)                 # [1, OUT]

    if variant in ("ob4", "i8and"):
        # Repack offset-binary from the signed block256 packing; store the
        # bytes as int8 (uint8 casts do not legalize in Mosaic).
        q = np.asarray(
            np.clip(np.rint(w / np.asarray(scale)[0][None, :]), -7, 7), np.int8)
        qb = (q + 8).astype(np.uint8).reshape(IN // 256, 256, OUT)
        lo = qb[:, :128, :]
        hi = qb[:, 128:, :]
        data = jnp.asarray((lo | (hi << 4)).reshape(IN // 2, OUT).view(np.int8))
        packed_rows_div = 2
    elif variant == "bc4":
        # Two's-complement nibbles packed so pltpu.bitcast(int8 -> int4)
        # yields rows in order: try (even row -> low nibble).
        q = np.clip(np.rint(w / np.asarray(scale)[0][None, :]), -7, 7)
        qi = np.asarray(q, np.int8)
        lo = qi[0::2, :].astype(np.uint8) & 0x0F
        hi = qi[1::2, :].astype(np.uint8) & 0x0F
        data = jnp.asarray((lo | (hi << 4)).view(np.int8))
        packed_rows_div = 2
    elif variant == "i8mxu":
        q8 = quantize(jnp.asarray(w), 8, group_size=-1)
        data, scale = q8.data, q8.scale.astype(jnp.float32)
        packed_rows_div = 1
    else:
        raise ValueError(variant)

    TI, TO = _tiles(IN, OUT)
    pr = TI // packed_rows_div
    kernel = _mk_kernel(variant, TI, TO)
    scale3 = scale.reshape(1, 1, OUT)

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(OUT // TO, IN // TI),
            in_specs=[
                pl.BlockSpec((S, TI), lambda j, i: (0, i)),
                pl.BlockSpec((pr, TO), lambda j, i: (i, j)),
                pl.BlockSpec((1, 1, TO), lambda j, i: (0, 0, j)),
            ],
            out_specs=pl.BlockSpec((S, TO), lambda j, i: (0, j)),
            out_shape=jax.ShapeDtypeStruct((S, OUT), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((S, TO), jnp.float32)],
        )(x, data, scale3)

    return call


def main():
    print("devices:", jax.devices(), flush=True)
    ws = [mkw(s) for s in SHAPES]
    h0 = jnp.asarray(rng.standard_normal((S, 1024), np.float32) * 0.5, jnp.bfloat16)

    # Reference output for numeric check (f32 jnp on the int4 values).
    qts_ref = [quantize(jnp.asarray(w), 4, group_size=-1) for w in ws]

    def ref_chain_one(h, qts=qts_ref):
        y1 = h.astype(jnp.float32) @ dequantize(qts[0], jnp.float32)
        h2 = (y1[:, :2048] @ dequantize(qts[1], jnp.float32))
        y2 = h2 @ dequantize(qts[2], jnp.float32)
        h3 = y2[:, :3072] @ dequantize(qts[3], jnp.float32)
        return h3

    want = np.asarray(jax.jit(ref_chain_one)(h0))

    # Shipping paths.
    from nanovllm_tpu.ops.quant import quant_matmul

    qt4 = [quantize(jnp.asarray(w), 4) for w in ws]       # default grouping
    qt8 = [quantize(jnp.asarray(w), 8, group_size=-1) for w in ws]

    def chain_ship(qts):
        def fn(h):
            def body(_, hh):
                y1 = quant_matmul(hh, qts[0])
                h2 = quant_matmul(y1[:, :2048], qts[1])
                y2 = quant_matmul(h2, qts[2])
                h3 = quant_matmul(y2[:, :3072], qts[3])
                return (hh.astype(jnp.float32) * 0.9
                        + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
            return jax.lax.fori_loop(0, L, body, h)
        return jax.jit(fn)

    for name, qts in (("cur4", qt4), ("xla8", qt8)):
        t = timeit(chain_ship(qts), h0)
        print(f"{name:6s}: {t*1e6:8.1f} us/step ({t/L*1e6:6.2f} us/layer)",
              flush=True)

    for variant in ("ob4", "i8and", "bc4"):
        try:
            calls = [build_variant_mm(variant, IN, OUT, w)
                     for (IN, OUT), w in zip(SHAPES, ws)]

            if variant == "i8mxu":
                def one(h, calls=calls):
                    def qx(x):
                        xf = x.astype(jnp.float32)
                        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=1,
                                                keepdims=True) / 127.0, 1e-30)
                        return (jnp.clip(jnp.round(xf / s), -127, 127)
                                .astype(jnp.int8), s)
                    x1, s1 = qx(h)
                    y1 = calls[0](x1) * s1.astype(jnp.bfloat16)
                    x2, s2 = qx(y1[:, :2048])
                    h2 = calls[1](x2) * s2.astype(jnp.bfloat16)
                    x3, s3 = qx(h2)
                    y2 = calls[2](x3) * s3.astype(jnp.bfloat16)
                    x4, s4 = qx(y2[:, :3072])
                    return calls[3](x4) * s4.astype(jnp.bfloat16)
            else:
                def one(h, calls=calls):
                    y1 = calls[0](h)
                    h2 = calls[1](y1[:, :2048])
                    y2 = calls[2](h2)
                    return calls[3](y2[:, :3072])

            got = np.asarray(jax.jit(one)(h0), np.float32)
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)

            def chain(h, one=one):
                def body(_, hh):
                    h3 = one(hh)
                    return (hh.astype(jnp.float32) * 0.9
                            + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
                return jax.lax.fori_loop(0, L, body, h)

            t = timeit(jax.jit(chain), h0)
            print(f"{variant:6s}: {t*1e6:8.1f} us/step ({t/L*1e6:6.2f} us/layer)"
                  f"  maxrelerr {err:.4g}", flush=True)
        except Exception as e:
            print(f"{variant:6s}: FAILED {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
