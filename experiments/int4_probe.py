"""int4 fused matmul: locate the cost. Isolated per-call timings of the
current kernel vs an i16-unpack variant vs int8 fused, at decode shapes.

FINDINGS (v5e, 2026-08-17): the current int4 kernel runs ~24 us/call at
the qkv decode shape vs a 2.6 us roofline — the in-kernel nibble unpack
(int32 widening + shifts + sign-extend selects over the whole weight
tile) dominates, not launch overhead. The i16-unpack variant below does
NOT compile: Mosaic refuses shift_right_logical on int16 vectors, the
same legalization hole round 1 hit on int8 vectors — int32 is the only
vector width with working shifts. Round-3 ideas: arithmetic hi-nibble
extraction (div/multiply instead of shift), an MLP-fused 3-launch layer,
or XLA-native jnp int4 storage."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.quant import quantize
from nanovllm_tpu.ops.pallas.quant_matmul import fused_quant_matmul, _pick_tiles

rng = np.random.default_rng(0)
S = 32


def mkw(i, o):
    return jnp.asarray(rng.standard_normal((i, o), np.float32) * 0.02, jnp.bfloat16)


def timeit(fn, x0, *args, iters=30, warmup=3, inner=64):
    @jax.jit
    def loop(x, *a):
        def body(i, x):
            y = fn(x, *a)
            return x * 0.999 + y[:, :x.shape[1]] * 1e-6
        return jax.lax.fori_loop(0, inner, body, x)

    x = x0
    for _ in range(warmup):
        x = loop(x, *args)
    np.asarray(jnp.ravel(x)[:8])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = loop(x, *args)
    np.asarray(jnp.ravel(x)[:8])
    return (time.perf_counter() - t0) / iters / inner


# --- i16-unpack variant of the int4 kernel --------------------------------
def _kernel_i16(x_ref, w_ref, s_ref, o_ref, acc, *, group, ti, to):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...].astype(jnp.bfloat16)
    scales = s_ref[0]
    p16 = w_ref[...].astype(jnp.int16)   # i16 widening instead of i32
    lo = (p16 & jnp.int16(0x0F))
    hi = jax.lax.shift_right_logical(p16, jnp.int16(4)) & jnp.int16(0x0F)
    lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.bfloat16)
    hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.bfloat16)
    per_channel = group >= ti

    def mm(xs, ws):
        return jax.lax.dot_general(
            xs, ws, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

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


@functools.partial(jax.jit, static_argnames=())
def fused_i16(x, qt):
    S_, IN = x.shape
    OUT = qt.out_dim
    G = qt.group_size
    TI, TO = _pick_tiles(S_, IN, OUT, 1)
    kernel = functools.partial(_kernel_i16, group=G, ti=TI, to=TO)
    grid = (OUT // TO, IN // TI)
    if G >= TI:
        scale3 = qt.scale.reshape(IN // G, 1, OUT)
        scale_index = lambda j, i: ((i * TI) // G, 0, j)
        rows = 1
    else:
        scale3 = qt.scale.reshape(IN // TI, TI // G, OUT)
        scale_index = lambda j, i: (i, 0, j)
        rows = TI // G
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((S_, TI), lambda j, i: (0, i)),
            pl.BlockSpec((TI // 2, TO), lambda j, i: (i, j)),
            pl.BlockSpec((1, rows, TO), scale_index),
        ],
        out_specs=pl.BlockSpec((S_, TO), lambda j, i: (0, j)),
        out_shape=jax.ShapeDtypeStruct((S_, OUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((S_, TO), jnp.float32)],
    )(x, qt.data, scale3)


def main():
    print("devices:", jax.devices(), flush=True)
    for name, (i, o) in (("qkv", (1024, 4096)), ("gate_up", (1024, 6144)),
                         ("down", (3072, 1024))):
        w = mkw(i, o)
        x0 = mkw(S, i)
        roof4 = (i * o // 2) / 819e9
        q4 = quantize(w, 4, 128)
        t = timeit(lambda x: fused_quant_matmul(x, q4), x0)
        print(f"int4 {name:8s} current: {t*1e6:7.2f} us (roofline {roof4*1e6:5.2f})", flush=True)
        t = timeit(lambda x: fused_i16(x, q4), x0)
        print(f"int4 {name:8s} i16var : {t*1e6:7.2f} us", flush=True)
        q8 = quantize(w, 8, -1)
        t = timeit(lambda x: fused_quant_matmul(x, q8), x0)
        print(f"int8 {name:8s} fused  : {t*1e6:7.2f} us (roofline {i*o/819e9*1e6:5.2f})", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
