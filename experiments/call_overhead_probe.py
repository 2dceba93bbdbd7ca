"""Measure per-pallas_call fixed overhead on this chip.

int4_sol_probe found dma-only == full-kernel == clamped-DMA chain times:
the work inside the kernel is irrelevant at decode shapes, so a fixed
per-call cost must dominate. Quantify it:

  empty   — minimal 1-grid-step kernel (copy 8x128 tile), x N calls in a
            device-side fori_loop; slope over N = per-call cost.
  xla16   — the same 4-matmul chain as int4_sol_probe in PLAIN XLA bf16
            (no pallas): what the compiler gets without custom-call
            boundaries. Distance from the 932 us byte floor bounds XLA's
            own overhead.
  xla8/4  — XLA dequantize-then-dot chains (int8 / int4 weights).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from nanovllm_tpu.ops.quant import dequantize, quantize

S = 32
L = 28
SHAPES = [(1024, 2048), (2048, 1024), (1024, 6144), (3072, 1024)]
rng = np.random.default_rng(0)


def _barrier(x):
    np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[:8])


def timeit_dev(body, x0, r1=50, r2=250, runs=3):
    """Slope method: the tunneled attachment adds a LARGE fixed cost per
    dispatch (~tens of ms), so per-rep time = (T(r2) - T(r1)) / (r2 - r1)
    with the reps loop on device. Returns (per_rep_s, fixed_s)."""
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
    per = (t2 - t1) / (r2 - r1)
    return per, t1 - per * r1


def empty_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def empty_call(x):
    return pl.pallas_call(
        empty_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)


def main():
    print("devices:", jax.devices(), flush=True)
    x0 = jnp.zeros((8, 128), jnp.float32)

    for n in (8, 28, 56):
        def body(h, n=n):
            for _ in range(n):
                h = empty_call(h)
            return h
        t, fix = timeit_dev(body, x0, r1=10, r2=60)
        print(f"empty x{n:4d}: {t*1e6:9.1f} us/rep  "
              f"({t/n*1e6:6.2f} us/call; dispatch fixed {fix*1e3:.1f} ms)",
              flush=True)

    ws = [jnp.asarray(rng.standard_normal(s, np.float32) * 0.02, jnp.bfloat16)
          for s in SHAPES]
    h0 = jnp.asarray(rng.standard_normal((S, 1024), np.float32) * 0.5,
                     jnp.bfloat16)

    def chain16(h):
        def body(_, hh):
            y1 = hh @ ws[0]
            h2 = y1[:, :2048] @ ws[1]
            y2 = h2 @ ws[2]
            h3 = y2[:, :3072] @ ws[3]
            return (hh.astype(jnp.float32) * 0.9
                    + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
        return jax.lax.fori_loop(0, L, body, h)

    t, fix = timeit_dev(chain16, h0)
    print(f"xla16 : {t*1e6:9.1f} us/step (plain XLA bf16 chain; "
          f"byte floor 932; fixed {fix*1e3:.1f} ms)", flush=True)

    for bits, name in ((8, "xla8"), (4, "xla4")):
        qts = [quantize(jnp.asarray(w, jnp.float32), bits, group_size=-1)
               for w in ws]

        def chainq(h, qts=qts):
            def body(_, hh):
                y1 = hh @ dequantize(qts[0], jnp.bfloat16)
                h2 = y1[:, :2048] @ dequantize(qts[1], jnp.bfloat16)
                y2 = h2 @ dequantize(qts[2], jnp.bfloat16)
                h3 = y2[:, :3072] @ dequantize(qts[3], jnp.bfloat16)
                return (hh.astype(jnp.float32) * 0.9
                        + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
            return jax.lax.fori_loop(0, L, body, h)

        t, fix = timeit_dev(chainq, h0)
        print(f"{name:6s}: {t*1e6:9.1f} us/step (XLA dequantize-then-dot; "
              f"fixed {fix*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
