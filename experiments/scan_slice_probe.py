"""Does lax.scan xs-slicing of stacked quantized weights cost the fused
Pallas int4 path a per-layer materialization that XLA's int8 dot does not
pay? (Hypothesis for the engine int4-vs-int8 batch-1 gap: engine substep
slopes say int4 1746 us vs int8 1248 us while the standalone fori_loop
closure chains measure them equal.)

Times the identical 4-matmul x 28-layer chain at the decode bucket (S=8)
two ways per format:
  closure: weights are 28 separate python-level QuantizedTensors, loop
           unrolled via fori over an index-free closure (no slicing).
  scan:    weights stacked [L, ...] and passed as scan xs, sliced per
           layer exactly like models/qwen3.py's layer loop.

Run: python experiments/scan_slice_probe.py   (needs the TPU chip)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops.quant import quant_matmul, quantize

L = 28
SHAPES = [(1024, 4096), (2048, 1024), (1024, 6144), (3072, 1024)]
S = 8
ITERS = 20


def timeit(fn, *args):
    # Synchronize by FETCHING (np.asarray), not block_until_ready — on the
    # axon tunneled attachment block_until_ready returns before device
    # execution completes (measured: 26 us/"chain" vs a 270 us byte
    # floor), silently timing dispatch only.
    x = fn(*args)
    np.asarray(x[:1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x = fn(*args)
    np.asarray(x[:1])
    return (time.perf_counter() - t0) / ITERS


def body_of(ws):
    def body(hh):
        y1 = quant_matmul(hh, ws[0])
        h2 = quant_matmul(y1[:, :2048], ws[1])
        y2 = quant_matmul(h2, ws[2])
        h3 = quant_matmul(y2[:, :3072], ws[3])
        return (hh.astype(jnp.float32) * 0.9
                + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
    return body


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def mkw(s):
        return jnp.asarray(rng.standard_normal(s, np.float32) * 0.02)

    h0 = jnp.asarray(rng.standard_normal((S, 1024), np.float32) * 0.02,
                     jnp.bfloat16)

    for name, q in (("int8", dict(bits=8, group_size=-1)),
                    ("int4 sym g128", dict(bits=8)),
                    ("int4 asym g64", dict(bits=4))):
        if name == "int8":
            quant = lambda w: quantize(w, 8, group_size=-1)
        elif name == "int4 sym g128":
            quant = lambda w: quantize(w, 4, group_size=128)
        else:
            quant = lambda w: quantize(w, 4, group_size=64, mode="asym")

        # unrolled: per-layer weights as jit ARGUMENTS (not closure
        # constants — 112 baked weight literals blow the remote compiler's
        # request limit), no slicing anywhere.
        per_layer = [[quant(mkw(s)) for s in SHAPES] for _ in range(L)]

        def closure_chain(h, per_layer):
            for lws in per_layer:
                h = body_of(lws)(h)
            return h

        t_cl = timeit(jax.jit(closure_chain), h0, per_layer)

        # scan: stacked leading-L QuantizedTensors as scan xs
        stacked = [
            quant(jnp.stack([mkw(s) for _ in range(L)]))
            for s in SHAPES
        ]

        def scan_chain(h, *stk):
            def step(hh, lws):
                return body_of(lws)(hh), None
            out, _ = jax.lax.scan(step, h, tuple(stk))
            return out

        t_sc = timeit(jax.jit(scan_chain), h0, *stacked)

        # stacked-kernel: weights closed over FULLY STACKED, addressed by
        # the carry's layer index through the scalar-prefetch kernel — the
        # round-5 production path for quantized models.
        def scan_stacked_chain(h, *stk):
            def step(carry, _):
                hh, li = carry

                def qmm(x_, qt):
                    return quant_matmul(x_, qt, layer_idx=li)

                y1 = qmm(hh, stk[0])
                h2 = qmm(y1[:, :2048], stk[1])
                y2 = qmm(h2, stk[2])
                h3 = qmm(y2[:, :3072], stk[3])
                out = (hh.astype(jnp.float32) * 0.9
                       + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
                return (out, li + 1), None
            (out, _), _ = jax.lax.scan(step, (h, jnp.int32(0)), None,
                                       length=L)
            return out

        t_st = timeit(jax.jit(scan_stacked_chain), h0, *stacked)
        print(f"{name:14s} closure {t_cl*1e6:7.1f} us   scan {t_sc*1e6:7.1f} us"
              f"   stacked-kernel {t_st*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
