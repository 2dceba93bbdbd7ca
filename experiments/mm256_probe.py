"""Decode-batch-256 matmul dispatch check: does the fused Pallas kernel
beat XLA's dequantize-dot for INT8 at S=256 (it loses at S=32), and at
Qwen3-4B shapes where weight DMA dominates?"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.pallas.quant_matmul import (
    fusable, fused_quant_matmul, pallas_dequantize,
)
from nanovllm_tpu.ops.quant import dequantize, quantize

rng = np.random.default_rng(0)
L = 28


def _barrier(x):
    np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[:8])


def timeit(fn, x0, iters=20, warmup=3):
    x = x0
    for _ in range(warmup):
        x = fn(x)
    _barrier(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _barrier(x)
    return (time.perf_counter() - t0) / iters


def bench_shapes(tag, shapes, S, layers):
    ws = [rng.standard_normal(s, np.float32) * 0.02 for s in shapes]
    D = shapes[0][0]
    h0 = jnp.asarray(rng.standard_normal((S, D), np.float32) * 0.5, jnp.bfloat16)
    mid = shapes[1][0]
    gmid = shapes[3][0]

    for name, qs, mm in (
        ("bf16", [jnp.asarray(w, jnp.bfloat16) for w in ws],
         lambda x, w: jnp.dot(x, w, preferred_element_type=x.dtype)),
        ("xla8", [quantize(jnp.asarray(w), 8, group_size=-1) for w in ws],
         lambda x, qt: jnp.dot(x, dequantize(qt, x.dtype),
                               preferred_element_type=x.dtype)),
        ("out8", [quantize(jnp.asarray(w), 8, group_size=-1) for w in ws],
         lambda x, qt: (jnp.dot(x, qt.data.astype(x.dtype),
                                preferred_element_type=jnp.float32)
                        * qt.scale[0]).astype(x.dtype)),
        ("fus8", [quantize(jnp.asarray(w), 8, group_size=-1) for w in ws],
         lambda x, qt: fused_quant_matmul(x, qt)),
        ("fus4", [quantize(jnp.asarray(w), 4) for w in ws],
         lambda x, qt: fused_quant_matmul(x, qt)),
        ("deq4", [quantize(jnp.asarray(w), 4) for w in ws],
         lambda x, qt: jnp.dot(x, pallas_dequantize(qt, x.dtype),
                               preferred_element_type=x.dtype)),
    ):
        if name not in ("bf16", "xla8", "out8"):
            assert all(
                fusable(jnp.zeros((S, q.in_dim), jnp.bfloat16), q) for q in qs
            ), name

        def one(h, qs=qs, mm=mm):
            y1 = mm(h, qs[0])
            h2 = mm(y1[:, :mid], qs[1])
            y2 = mm(h2, qs[2])
            h3 = mm(y2[:, :gmid], qs[3])
            return h3

        def chain(h, one=one):
            def body(_, hh):
                h3 = one(hh)
                return (hh.astype(jnp.float32) * 0.9
                        + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
            return jax.lax.fori_loop(0, layers, body, h)

        try:
            t = timeit(jax.jit(chain), h0)
            print(f"{tag} S={S} {name}: {t*1e3:8.3f} ms/step "
                  f"({t/layers*1e6:7.1f} us/layer)", flush=True)
        except Exception as e:
            print(f"{tag} S={S} {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    # Qwen3-0.6B decode shapes.
    bench_shapes("0.6B", [(1024, 4096), (2048, 1024), (1024, 6144), (3072, 1024)],
                 S=256, layers=28)
    # Qwen3-4B decode shapes (qkv 2560->6144, o 4096->2560,
    # gate_up 2560->19456, down 9728->2560).
    bench_shapes("4B  ", [(2560, 6144), (4096, 2560), (2560, 19456), (9728, 2560)],
                 S=256, layers=36)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
