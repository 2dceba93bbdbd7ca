"""Round-4: bound the INT4 decode matmul chain to its speed of light.

VERDICT r3 #1: int4 moves 1/4 the HBM bytes of bf16 yet the decode chain
runs only 1.2x faster (1452 us vs ~1783). Byte roofline says ~250 us.
This probe produces a TWO-SIDED measured bound in the style of the
batch-32 attention wall (docs/performance.md):

  lower bounds (independent):
    dma4   — pure packed-byte streaming through the kernel's own
             grid/BlockSpecs, trivial compute: the HBM floor.
    mxu16  — bf16 weights with ALL weight fetches clamped to one cached
             VMEM tile (zero new DMA): the MXU weight-feed floor at these
             tile shapes and M=S rows. On v5e the MXU consumes weight
             values at a fixed dtype-independent rate; if this floor is
             >> dma4, the binding constraint is the MXU, not HBM, and no
             packing scheme can beat it.
    unp4   — int4 kernel with clamped weight fetches: MXU floor + the
             Mosaic bitcast unpack cost (unpack serializes with the dot
             if > 0 over mxu16).
  upper bound:
    ship4  — the shipping fused kernel, full chain (reproduction).
    sum4   — per-matmul kernels timed in isolation, summed: the gap
             ship4 - sum4 is inter-kernel serialization / launch cost.

All at S=32, Qwen3-0.6B decode shapes, x28 layers (same harness as
experiments/int4_probe2.py).
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

from nanovllm_tpu.ops.quant import QuantizedTensor, quantize, quant_matmul

S = 32
L = 28
SHAPES = [(1024, 2048), (2048, 1024), (1024, 6144), (3072, 1024)]
rng = np.random.default_rng(0)


def _barrier(x):
    np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[:8])


def timeit(fn, x0, iters=30, warmup=3):
    x = x0
    for _ in range(warmup):
        x = fn(x)
    _barrier(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _barrier(x)
    return (time.perf_counter() - t0) / iters


def timeit_dev(body, x0, r1=50, r2=250, runs=3):
    """Slope method: the tunneled TPU attachment adds a ~25 ms FIXED cost
    per dispatch, so naive per-dispatch timing measures the tunnel, not
    the kernel. Run the body r1 and r2 times in device-side fori_loops;
    per-rep = (T(r2) - T(r1)) / (r2 - r1) cancels the fixed cost."""
    def mk(reps):
        return jax.jit(
            lambda h: jax.lax.fori_loop(0, reps, lambda _, hh: body(hh), h))
    f1, f2 = mk(r1), mk(r2)
    _barrier(f1(x0)); _barrier(f2(x0))
    t1 = t2 = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter(); _barrier(f1(x0))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); _barrier(f2(x0))
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (r2 - r1)


def mkw(shape):
    return rng.standard_normal(shape, np.float32) * 0.02


def _tiles(IN, OUT, itemsize=1):
    budget = 10 * 1024 * 1024
    for ti in (1024, 512, 256):
        if IN % ti:
            continue
        for to in (2048, 1024, 512):
            if OUT % to:
                continue
            if 2 * ti * to * itemsize + S * ti * 2 + S * to * 4 <= budget:
                return ti, to
    raise ValueError((IN, OUT))


def pack4(w, scale):
    q = np.clip(np.rint(w / np.asarray(scale)[0][None, :]), -7, 7)
    qi = np.asarray(q, np.int8)
    lo = qi[0::2, :].astype(np.uint8) & 0x0F
    hi = qi[1::2, :].astype(np.uint8) & 0x0F
    return jnp.asarray((lo | (hi << 4)).view(np.int8))


def _mk_kernel(variant, ti, to):
    def kernel(x_ref, w_ref, s_ref, o_ref, acc):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        scales = s_ref[0]
        x = x_ref[...]

        if variant == "bsc4":
            # Group-128 scales applied to the UNPACKED WEIGHT TILE on the
            # VPU (one fused multiply over [TI, TO]), then ONE full-span
            # dot — versus the shipping kernel's gpt=TI/128 small dots
            # (each dot pays MXU pipeline fill; 8 span-128 dots measured
            # +90 us/step over one span-1024 dot).
            w = pltpu.bitcast(w_ref[...], jnp.int4).astype(jnp.bfloat16)
            sc = s_ref[0]  # [TI//128, TO] f32
            scb = jnp.repeat(sc.astype(jnp.bfloat16), 128, axis=0)
            acc[...] += jax.lax.dot_general(
                x.astype(jnp.bfloat16), w * scb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif variant == "fused8":
            w = w_ref[...].astype(jnp.bfloat16)  # int8 -> bf16, 1 pass
            acc[...] += jax.lax.dot_general(
                x.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scales[0][None, :]
        elif variant == "dma4":
            # Touch one row of the packed bytes so the fetch isn't dead;
            # O(TO) VPU work, no MXU.
            acc[...] += (
                w_ref[0, :].astype(jnp.float32)[None, :] * scales[0][None, :]
            )
        elif variant in ("bc4", "unp4"):
            w = pltpu.bitcast(w_ref[...], jnp.int4).astype(jnp.bfloat16)
            acc[...] += jax.lax.dot_general(
                x.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scales[0][None, :]
        elif variant in ("mm16", "mxu16"):
            w = w_ref[...]
            acc[...] += jax.lax.dot_general(
                x.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scales[0][None, :]
        else:
            raise ValueError(variant)

        @pl.when(i == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc[...].astype(o_ref.dtype)

    return kernel


def build_mm(variant, IN, OUT, w):
    """One matmul at the probe tile shapes. Variants ending in a clamped
    weight index ('unp4', 'mxu16') re-read weight block (0, j) every i
    step — the pipeline dedups consecutive identical fetches, so weight
    DMA ~vanishes and only unpack+MXU+grid remain."""
    qt = quantize(jnp.asarray(w), 4, group_size=-1)
    scale = qt.scale.astype(jnp.float32)

    if variant == "bsc4":
        # Group-128 scales: quantize per 128-row input group.
        wq = np.asarray(w, np.float32).reshape(IN // 128, 128, OUT)
        gs = np.maximum(np.abs(wq).max(axis=1) / 7.0, 1e-10)  # [IN/128, OUT]
        q = np.clip(np.rint(wq / gs[:, None, :]), -7, 7).reshape(IN, OUT)
        qi = np.asarray(q, np.int8)
        lo = qi[0::2, :].astype(np.uint8) & 0x0F
        hi = qi[1::2, :].astype(np.uint8) & 0x0F
        data = jnp.asarray((lo | (hi << 4)).view(np.int8))
        scale = jnp.asarray(gs, jnp.float32)  # [IN//128, OUT]
        itemsize, rows_div = 1, 2
    elif variant == "fused8":
        q8 = quantize(jnp.asarray(w), 8, group_size=-1)
        data, scale = q8.data, q8.scale.astype(jnp.float32)
        itemsize, rows_div = 1, 1
    elif variant in ("dma4", "bc4", "unp4"):
        data = pack4(w, scale)
        itemsize, rows_div = 1, 2
    else:
        data = jnp.asarray(w, jnp.bfloat16)
        itemsize, rows_div = 2, 1

    TI, TO = _tiles(IN, OUT, itemsize)
    pr = TI // rows_div
    clamped = variant in ("unp4", "mxu16")
    widx = (lambda j, i: (0, j)) if clamped else (lambda j, i: (i, j))
    kernel = _mk_kernel(variant, TI, TO)
    if variant == "bsc4":
        scale3 = scale.reshape(IN // TI, TI // 128, OUT)
        sspec = pl.BlockSpec((1, TI // 128, TO), lambda j, i: (i, 0, j))
    else:
        scale3 = scale.reshape(1, 1, OUT)
        sspec = pl.BlockSpec((1, 1, TO), lambda j, i: (0, 0, j))

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(OUT // TO, IN // TI),
            in_specs=[
                pl.BlockSpec((S, TI), lambda j, i: (0, i)),
                pl.BlockSpec((pr, TO), widx),
                sspec,
            ],
            out_specs=pl.BlockSpec((S, TO), lambda j, i: (0, j)),
            out_shape=jax.ShapeDtypeStruct((S, OUT), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((S, TO), jnp.float32)],
        )(x, data, scale3)

    return call, (IN // TI) * (OUT // TO), TI, TO


def chain(calls):
    def fn(h):
        def body(_, hh):
            y1 = calls[0](hh)
            h2 = calls[1](y1[:, :2048])
            y2 = calls[2](h2)
            h3 = calls[3](y2[:, :3072])
            return (hh.astype(jnp.float32) * 0.9
                    + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
        return jax.lax.fori_loop(0, L, body, h)
    return jax.jit(fn)


def run_at(S_val, ws, full=True):
    global S
    S = S_val
    h0 = jnp.asarray(rng.standard_normal((S, 1024), np.float32) * 0.5,
                     jnp.bfloat16)

    total_vals = sum(IN * OUT for IN, OUT in SHAPES) * L
    packed_mb = total_vals / 2 / 1e6
    bf16_mb = total_vals * 2 / 1e6
    print(f"weights: {total_vals/1e6:.1f}M values; packed int4 "
          f"{packed_mb:.0f} MB, bf16 {bf16_mb:.0f} MB", flush=True)

    # Shipping chain (uses the real dispatch incl. its own tile picker).
    qt4 = [quantize(jnp.asarray(w), 4) for w in ws]

    def ship(h):
        def body(_, hh):
            y1 = quant_matmul(hh, qt4[0])
            h2 = quant_matmul(y1[:, :2048], qt4[1])
            y2 = quant_matmul(h2, qt4[2])
            h3 = quant_matmul(y2[:, :3072], qt4[3])
            return (hh.astype(jnp.float32) * 0.9
                    + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
        return jax.lax.fori_loop(0, L, body, h)

    def ship_body(h):
        def body(_, hh):
            y1 = quant_matmul(hh, qt4[0])
            h2 = quant_matmul(y1[:, :2048], qt4[1])
            y2 = quant_matmul(h2, qt4[2])
            h3 = quant_matmul(y2[:, :3072], qt4[3])
            return (hh.astype(jnp.float32) * 0.9
                    + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
        return jax.lax.fori_loop(0, L, body, h)

    t = timeit_dev(ship_body, h0)
    print(f"ship4 : {t*1e6:8.1f} us/step  (shipping fused int4 chain)",
          flush=True)

    # Plain XLA chains (no pallas): the bf16/int8 baselines.
    ws16 = [jnp.asarray(w, jnp.bfloat16) for w in ws]

    def chain16(h):
        def body(_, hh):
            y1 = hh @ ws16[0]
            h2 = y1[:, :2048] @ ws16[1]
            y2 = h2 @ ws16[2]
            h3 = y2[:, :3072] @ ws16[3]
            return (hh.astype(jnp.float32) * 0.9
                    + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
        return jax.lax.fori_loop(0, L, body, h)

    t = timeit_dev(chain16, h0)
    print(f"xla16 : {t*1e6:8.1f} us/step  (plain XLA bf16)", flush=True)

    # Shipping int8 path: raw int8 dot + per-channel scale epilogue.
    qt8 = [quantize(jnp.asarray(w), 8, group_size=-1) for w in ws]

    def chain8(h):
        def mm8(xx, qt):
            acc = jnp.dot(xx, qt.data.astype(xx.dtype),
                          preferred_element_type=jnp.float32)
            return (acc * qt.scale[0]).astype(xx.dtype)
        def body(_, hh):
            y1 = mm8(hh, qt8[0])
            h2 = mm8(y1[:, :2048], qt8[1])
            y2 = mm8(h2, qt8[2])
            h3 = mm8(y2[:, :3072], qt8[3])
            return (hh.astype(jnp.float32) * 0.9
                    + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
        return jax.lax.fori_loop(0, L, body, h)

    t = timeit_dev(chain8, h0)
    print(f"xla8d : {t*1e6:8.1f} us/step  (shipping int8 XLA dot)",
          flush=True)

    results = {}
    variants = (("bc4", "bsc4", "fused8", "dma4", "unp4", "mm16", "mxu16")
                if full else ("bc4", "fused8", "dma4"))
    for variant in variants:
        calls = []
        steps = 0
        for (IN, OUT), w in zip(SHAPES, ws):
            c, n, TI, TO = build_mm(variant, IN, OUT, w)
            calls.append(c)
            steps += n
        def chain_body(h, calls=calls):
            def body(_, hh):
                y1 = calls[0](hh)
                h2 = calls[1](y1[:, :2048])
                y2 = calls[2](h2)
                h3 = calls[3](y2[:, :3072])
                return (hh.astype(jnp.float32) * 0.9
                        + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
            return jax.lax.fori_loop(0, L, body, h)
        t = timeit_dev(chain_body, h0)
        results[variant] = t
        print(f"{variant:6s}: {t*1e6:8.1f} us/step  "
              f"({steps} grid steps/layer)", flush=True)

    if not full:
        return
    # Per-matmul isolation: launch/serialization accounting. L dependent
    # back-to-back calls of ONE kernel (input perturbed so nothing folds).
    tot = 0.0
    for (IN, OUT), w in zip(SHAPES, ws):
        c, n, TI, TO = build_mm("bc4", IN, OUT, w)
        x = jnp.asarray(rng.standard_normal((S, IN), np.float32),
                        jnp.bfloat16)

        def repL_body(h, c=c, IN=IN, OUT=OUT):
            def body(_, hh):
                y = c(hh)  # [S, OUT]
                if OUT >= IN:
                    return (y[:, :IN] * 1e-3 + hh * 0.9).astype(hh.dtype)
                return (jnp.pad(y, ((0, 0), (0, IN - OUT))) * 1e-3
                        + hh * 0.9).astype(hh.dtype)
            return jax.lax.fori_loop(0, L, body, h)
        t1 = timeit_dev(repL_body, x)
        tot += t1
        print(f"  iso {IN}x{OUT}: {t1*1e6:7.1f} us for {L} calls",
              flush=True)
    print(f"sum4  : {tot*1e6:8.1f} us/step  (sum of isolated kernels; "
          "chain - sum = serialization/launch)", flush=True)

def main():
    print("devices:", jax.devices(), flush=True)
    ws = [mkw(s) for s in SHAPES]
    total_vals = sum(IN * OUT for IN, OUT in SHAPES) * L
    print(f"weights: {total_vals/1e6:.1f}M values; byte floors @819GB/s: "
          f"int4 {total_vals/2/819e9*1e6:.0f} us, "
          f"int8 {total_vals/819e9*1e6:.0f} us, "
          f"bf16 {total_vals*2/819e9*1e6:.0f} us", flush=True)
    import sys as _s
    svals = [int(a) for a in _s.argv[1:]] or [32]
    for S_val in svals:
        print(f"--- S={S_val} ---", flush=True)
        run_at(S_val, ws, full=(S_val == 32))


if __name__ == "__main__":
    main()
