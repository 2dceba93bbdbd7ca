"""Shipping-path check of the round-3 int4 rework: quant_matmul dispatch
(fused bitcast kernel) on the decode 4-matmul chain AND at prefill scale,
vs the int8 and bf16 paths. Done criteria (VERDICT r2 next #2/#3):
int4 decode chain < int8's, int4 prefill <= 1.1x bf16 at 4096 tokens."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.quant import quant_matmul, quantize

L = 28
SHAPES = [(1024, 4096), (2048, 1024), (1024, 6144), (3072, 1024)]
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


def main():
    print("devices:", jax.devices(), flush=True)
    ws = [rng.standard_normal(s, np.float32) * 0.02 for s in SHAPES]
    wq = {
        "bf16": [jnp.asarray(w, jnp.bfloat16) for w in ws],
        "int8": [quantize(jnp.asarray(w), 8, group_size=-1) for w in ws],
        "int4": [quantize(jnp.asarray(w), 4) for w in ws],
    }

    for S, iters, tag in ((32, 30, "decode"), (4096, 8, "prefill")):
        h0 = jnp.asarray(rng.standard_normal((S, 1024), np.float32) * 0.5,
                         jnp.bfloat16)
        for name, qs in wq.items():
            def one(h, qs=qs):
                y1 = quant_matmul(h, qs[0]) if name != "bf16" else h @ qs[0]
                h2 = (quant_matmul(y1[:, :2048], qs[1]) if name != "bf16"
                      else y1[:, :2048] @ qs[1])
                y2 = quant_matmul(h2, qs[2]) if name != "bf16" else h2 @ qs[2]
                h3 = (quant_matmul(y2[:, :3072], qs[3]) if name != "bf16"
                      else y2[:, :3072] @ qs[3])
                return h3

            def chain(h, one=one):
                def body(_, hh):
                    h3 = one(hh)
                    return (hh.astype(jnp.float32) * 0.9
                            + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
                return jax.lax.fori_loop(0, L, body, h)

            t = timeit(jax.jit(chain), h0, iters=iters)
            print(f"{tag:7s} S={S:5d} {name}: {t*1e6:9.1f} us/step "
                  f"({t/L*1e6:7.2f} us/layer)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
