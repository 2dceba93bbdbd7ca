"""Profile decode-shape matmul strategies on the real TPU chip.

Isolates where the fused quant matmul loses time vs roofline at the bench
shapes (Qwen3-0.6B, batch 32 decode):
  qkv  [32,1024]x[1024,4096]
  o    [32,2048]x[2048,1024]
  gate_up [32,1024]x[1024,6144]
  down [32,3072]x[3072,1024]
Strategies: bf16 XLA dot | fused pallas int8/int4 | XLA dequant-dot |
W8A8 (dynamic per-row activation int8, native XLA int8 MXU dot).
Each strategy runs the 4-matmul chain inside lax.scan over 28 stacked layers
(the real structure), timed over many scan executions in ONE jit call.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.quant import QuantizedTensor, quantize, dequantize
from nanovllm_tpu.ops.pallas.quant_matmul import fused_quant_matmul

L = 28
S = 32
SHAPES = dict(qkv=(1024, 4096), o=(2048, 1024), gate_up=(1024, 6144), down=(3072, 1024))
HBM_GBS = 819.0

rng = np.random.default_rng(0)


def mkw(in_d, out_d, stacked=True):
    shape = (L, in_d, out_d) if stacked else (in_d, out_d)
    return jnp.asarray(rng.standard_normal(shape, np.float32) * 0.02, jnp.bfloat16)


RTT_EST = None  # measured once: host<->device fetch round trip


def _fetch_barrier(x):
    """A REAL completion barrier: fetch the value. block_until_ready through
    the tunneled attachment returns before compute finishes."""
    return np.asarray(x)


def timeit(fn, x0, *args, iters=100, warmup=3):
    """Chain each call's output into the next call's input (the tunneled
    runtime deduplicates byte-identical repeated dispatches) and barrier
    with a value fetch; the measured fetch RTT is subtracted."""
    global RTT_EST
    x = x0
    for _ in range(warmup):
        x = fn(x, *args)
    _fetch_barrier(x)
    if RTT_EST is None:
        t = time.perf_counter()
        for _ in range(5):
            _fetch_barrier(x)
        RTT_EST = (time.perf_counter() - t) / 5
        print(f"fetch RTT ~ {RTT_EST*1e3:.1f} ms", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args)
    _fetch_barrier(x)
    return (time.perf_counter() - t0 - RTT_EST) / iters


def chain_scan(mm_of, n_scan=8):
    """One jit: scan over L layers doing the 4-matmul chain, repeated n_scan
    times (carry-chained) to amortize the single dispatch RTT. Weights are
    jit ARGUMENTS (closure capture would bake them into the HLO as
    constants — megabytes of compile payload)."""

    def layer(x, wl):
        # x: [S, 1024]
        y = mm_of(x, wl["qkv"])                      # [S, 4096]
        a = y[:, :2048] + y[:, 2048:] * 0.5          # stand-in for attention
        h = mm_of(a, wl["o"]) + x                    # [S, 1024]
        g = mm_of(h, wl["gate_up"])                  # [S, 6144]
        m = jax.nn.silu(g[:, :3072]) * g[:, 3072:]
        return mm_of(m, wl["down"]) + h, None

    def many(x, weights):
        def body(i, x):
            x, _ = jax.lax.scan(layer, x, weights)
            return x * 0.999
        return jax.lax.fori_loop(0, n_scan, body, x)

    return jax.jit(many)


def report(name, dt, n_scan, bytes_per_pass):
    per_pass = dt / n_scan
    gbs = bytes_per_pass / per_pass / 1e9
    roof = bytes_per_pass / (HBM_GBS * 1e9)
    print(f"{name:32s} {per_pass*1e6:9.1f} us/pass  {gbs:7.1f} GB/s "
          f"roofline {roof*1e6:7.1f} us  eff {roof/per_pass*100:5.1f}%",
          flush=True)


def weight_bytes(bits):
    per_layer = sum(i * o for i, o in SHAPES.values())
    if bits == 16:
        return L * per_layer * 2
    if bits == 8:
        return L * (per_layer + sum(o for _, o in SHAPES.values()) * 4)  # +scales
    return L * (per_layer // 2 + sum((i // 128) * o * 4 for i, o in SHAPES.values()))


def main():
    print("devices:", jax.devices(), flush=True)
    x0 = jnp.asarray(rng.standard_normal((S, 1024), np.float32), jnp.bfloat16)

    # ---- bf16 baseline --------------------------------------------------
    wb = {k: mkw(i, o) for k, (i, o) in SHAPES.items()}
    f = chain_scan(lambda x, w: jnp.dot(x, w))
    dt = timeit(f, x0, wb)
    report("bf16 XLA dot", dt, 8, weight_bytes(16))

    # ---- int8 / int4 variants -------------------------------------------
    for bits, gs in ((8, -1), (4, 128)):
        qw = {k: quantize(wb[k], bits, gs) for k in SHAPES}

        # fused pallas (current kernel), applied per layer inside scan
        def mm_fused(x, qt):
            return fused_quant_matmul(x, qt)
        f = chain_scan(mm_fused)
        dt = timeit(f, x0, qw)
        report(f"int{bits} fused pallas", dt, 8, weight_bytes(bits))

        # XLA dequantize-then-dot (known slow; for reference)
        def mm_deq(x, qt):
            return jnp.dot(x, dequantize(qt, jnp.bfloat16))
        f = chain_scan(mm_deq)
        dt = timeit(f, x0, qw)
        report(f"int{bits} XLA dequant-dot", dt, 8, weight_bytes(bits))

    # ---- W8A8: native XLA int8 MXU dot, dynamic per-row activation quant
    q8 = {k: quantize(wb[k], 8, -1) for k in SHAPES}

    def mm_w8a8(x, qt):
        # per-row absmax quant of activations
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32)
        xs = jnp.maximum(amax / 127.0, 1e-8)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, qt.data, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * xs * qt.scale[0][None, :]).astype(x.dtype)

    f = chain_scan(mm_w8a8)
    dt = timeit(f, x0, q8)
    report("W8A8 native XLA int8 dot", dt, 8, weight_bytes(8))

    # ---- isolated single fused call (launch overhead probe) -------------
    q_qkv = quantize(mkw(1024, 4096, stacked=False), 8, -1)

    @jax.jit
    def lone(x):
        def body(i, x):
            y = fused_quant_matmul(x, q_qkv)
            return x * 0.999 + y[:, :1024] * 1e-6
        return jax.lax.fori_loop(0, 224, body, x)  # 224 = 28 layers * 8 passes

    dt = timeit(lone, x0)
    per_call = dt / 224
    roof = 1024 * 4096 / (HBM_GBS * 1e9)
    print(f"{'int8 fused qkv alone':32s} {per_call*1e6:9.1f} us/call "
          f"roofline {roof*1e6:7.1f} us  overhead {(per_call-roof)*1e6:6.1f} us",
          flush=True)

    @jax.jit
    def lone_bf16(x, w):
        def body(i, x):
            y = jnp.dot(x, w)
            return x * 0.999 + y[:, :1024] * 1e-6
        return jax.lax.fori_loop(0, 224, body, x)

    w_qkv = mkw(1024, 4096, stacked=False)
    dt = timeit(lone_bf16, x0, w_qkv)
    per_call = dt / 224
    roof = 1024 * 4096 * 2 / (HBM_GBS * 1e9)
    print(f"{'bf16 qkv alone':32s} {per_call*1e6:9.1f} us/call "
          f"roofline {roof*1e6:7.1f} us  overhead {(per_call-roof)*1e6:6.1f} us",
          flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
