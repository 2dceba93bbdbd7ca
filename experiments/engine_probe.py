"""Second TPU probe: prefill-shape matmuls, lm_head variants, attention
kernel bandwidth, and a real decode-window substep budget."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.quant import quantize, dequantize

HBM = 819.0
rng = np.random.default_rng(0)


def mkbf(shape):
    return jnp.asarray(rng.standard_normal(shape, np.float32) * 0.02, jnp.bfloat16)


RTT = None


def timeit(fn, x0, *args, iters=50, warmup=3):
    global RTT
    x = x0
    for _ in range(warmup):
        x = fn(x, *args)
    np.asarray(jax.tree.leaves(x)[0])
    if RTT is None:
        t = time.perf_counter()
        for _ in range(5):
            np.asarray(jax.tree.leaves(x)[0])
        RTT = (time.perf_counter() - t) / 5
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args)
    np.asarray(jax.tree.leaves(x)[0])
    return (time.perf_counter() - t0 - RTT) / iters


def line(name, dt, nbytes=None, per=1):
    t = dt / per
    extra = ""
    if nbytes:
        extra = f"  {nbytes/t/1e9:7.1f} GB/s  roofline {nbytes/(HBM*1e9)*1e6:7.1f} us  eff {nbytes/(HBM*1e9)/t*100:5.1f}%"
    print(f"{name:36s} {t*1e6:9.1f} us{extra}", flush=True)


def prefill_matmuls():
    """Prefill: T=4096 tokens through the 4-matmul chain x28 (compute-bound
    regime). bf16 vs int8/int4 XLA dequant-dot."""
    L = 28
    T = 4096
    SHAPES = dict(qkv=(1024, 4096), o=(2048, 1024), gate_up=(1024, 6144), down=(3072, 1024))
    wb = {k: mkbf((L, i, o)) for k, (i, o) in SHAPES.items()}
    x0 = mkbf((T, 1024))

    def chain(mm):
        def layer(x, wl):
            y = mm(x, wl["qkv"])
            a = y[:, :2048] + y[:, 2048:] * 0.5
            h = mm(a, wl["o"]) + x
            g = mm(h, wl["gate_up"])
            m = jax.nn.silu(g[:, :3072]) * g[:, 3072:]
            return mm(m, wl["down"]) + h, None

        def f(x, w):
            x, _ = jax.lax.scan(layer, x, w)
            return x * 0.999
        return jax.jit(f)

    # FLOP roofline: 2*T*sum(in*out)*L / 197 TFLOP/s (v5e bf16)
    flops = 2 * T * sum(i * o for i, o in SHAPES.values()) * L
    print(f"prefill T={T}: flop roofline {flops/197e12*1e6:.0f} us", flush=True)
    dt = timeit(chain(lambda x, w: jnp.dot(x, w)), x0, wb, iters=10)
    line("prefill bf16", dt)
    q8 = {k: quantize(wb[k], 8, -1) for k in SHAPES}
    dt = timeit(chain(lambda x, qt: jnp.dot(x, dequantize(qt, jnp.bfloat16))), x0, q8, iters=10)
    line("prefill int8 XLA dequant-dot", dt)
    q4 = {k: quantize(wb[k], 4, 128) for k in SHAPES}
    dt = timeit(chain(lambda x, qt: jnp.dot(x, dequantize(qt, jnp.bfloat16))), x0, q4, iters=10)
    line("prefill int4 XLA dequant-dot", dt)


def lm_head():
    V, D, S = 151936, 1024, 32
    w = mkbf((D, V))
    x0 = mkbf((S, D))

    def rep(mm):
        def f(x, w):
            def body(i, x):
                logits = mm(x, w)
                return x * 0.999 + logits[:, :D] * 1e-9
            return jax.lax.fori_loop(0, 28, body, x)
        return jax.jit(f)

    nb = D * V * 2 * 28
    dt = timeit(rep(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)), x0, w, iters=20)
    line("lm_head bf16", dt, nb, per=28)
    q8 = quantize(w, 8, -1)
    nb8 = (D * V + V * 4) * 28
    dt = timeit(rep(lambda x, qt: jnp.dot(x, dequantize(qt, jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)), x0, q8, iters=20)
    line("lm_head int8 dequant-dot", dt, nb8, per=28)

    def w8a8(x, qt):
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32)
        xs = jnp.maximum(amax / 127.0, 1e-8)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, qt.data, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs * qt.scale[0][None, :]).astype(jnp.bfloat16)

    dt = timeit(rep(w8a8), x0, q8, iters=20)
    line("lm_head W8A8", dt, nb8, per=28)


def attention_kernels():
    """Decode attention + KV commit at the bench shape: S=32, ctx=256,
    block=256, Hkv=8, Dh=128, 28 layers."""
    from nanovllm_tpu.ops.pallas.paged_attention import (
        kv_cache_commit, paged_attention_decode,
    )

    L, NB, Hkv, BS, Dh, Hq, S = 28, 40, 8, 256, 128, 16, 32
    kc = mkbf((L, NB, Hkv, BS, Dh))
    vc = mkbf((L, NB, Hkv, BS, Dh))
    q0 = mkbf((S, Hq, Dh))
    k = mkbf((S, Hkv, Dh))
    v = mkbf((S, Hkv, Dh))
    bt = jnp.asarray(np.arange(S, dtype=np.int32).reshape(S, 1) + 1)  # 1 block each
    cl = jnp.full((S,), 256, jnp.int32)

    def attn_chain(q, kc, vc):
        def body(l, q):
            o = paged_attention_decode(q, k, v, kc, vc, l % L, bt, cl, scale=0.088)
            return q * 0.999 + o * 1e-3
        return jax.lax.fori_loop(0, L, body, q)

    f = jax.jit(attn_chain)
    # bytes: K+V reads = S*ctx*Hkv... per layer: S blocks x [Hkv,BS,Dh] x2 x2B
    nb = S * Hkv * BS * Dh * 2 * 2 * L
    dt = timeit(f, q0, kc, vc, iters=50)
    line("pallas decode attention", dt, nb, per=L)

    def commit_chain(carry):
        def body(l, carry):
            k, kc, vc = carry
            kc2, vc2 = kv_cache_commit(k, v, kc, vc, l % L, bt, cl)
            return (k * 0.999, kc2, vc2)
        return jax.lax.fori_loop(0, L, body, carry)

    f = jax.jit(commit_chain, donate_argnums=(0,))
    dt = timeit(f, (k, kc, vc), iters=50)
    line("pallas kv commit (RMW 8x128)", dt, per=L)


def decode_window_budget():
    """The REAL decode window step at the bench config, bf16 vs int8
    weights (XLA dequant-dot happens via ops.quant.matmul dispatch if we
    patch fusable off; here we just run the engine's build_decode_window)."""
    from nanovllm_tpu.engine.step_fn import build_decode_window
    from nanovllm_tpu.models.qwen3 import Qwen3Config, create_kv_caches, forward, init_params
    from nanovllm_tpu.ops.quant import quantize_params
    from nanovllm_tpu.ops import sampling as so

    cfg = Qwen3Config(
        vocab_size=151936, hidden_size=1024, intermediate_size=3072,
        num_hidden_layers=28, num_attention_heads=16, num_key_value_heads=8,
        head_dim=128, max_position_embeddings=40960, rope_theta=1e6,
        tie_word_embeddings=True,
    )
    S, K, BS, NB = 32, 32, 256, 40
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    flags = {}
    bt = np.zeros((S, 2), np.int32)
    bt[:, 0] = np.arange(S) + 1
    bt[:, 1] = np.arange(S) + S + 1
    cl = np.full((S,), 200, np.int32)
    state = so.SamplingState(
        temps=np.zeros((S,), np.float32), top_k=np.zeros((S,), np.int32),
        top_p=np.ones((S,), np.float32), rep_pen=np.ones((S,), np.float32),
        freq_pen=np.zeros((S,), np.float32), pres_pen=np.zeros((S,), np.float32),
        buf=np.full((S, 1), -1, np.int32), gen_mask=np.zeros((S, 1), bool),
        cursor=np.zeros((S,), np.int32), seeds=np.zeros((S,), np.uint32),
        has_seed=np.zeros((S,), bool), gen_counts=np.zeros((S,), np.int32),
    )
    toks0 = np.full((S,), 17, np.int32)

    for name, p in (("bf16", params), ("int8-deq", None)):
        if p is None:
            import nanovllm_tpu.ops.pallas.quant_matmul as qm
            qm_fusable = qm.fusable
            qm.fusable = lambda *a, **k: False  # force XLA dequant-dot
            p = quantize_params(dict(params), "int8")
        kc, vc = create_kv_caches(cfg, NB, BS, jnp.bfloat16)
        step = build_decode_window(cfg, forward, BS, K, flags,
                                   attn_impl="pallas_decode")
        key = jax.random.PRNGKey(0)

        def run(toks, kc, vc):
            out, _lp, kc, vc = step(p, kc, vc, toks, jnp.asarray(bt), jnp.asarray(cl), state, key)
            return out[-1], kc, vc

        toks = jnp.asarray(toks0)
        t, kc, vc = run(toks, kc, vc)   # compile
        np.asarray(t)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            t, kc, vc = run(t, kc, vc)
        np.asarray(t)
        dt = (time.perf_counter() - t0 - (RTT or 0)) / iters / K
        print(f"decode window substep [{name:9s}]  {dt*1e6:9.1f} us  "
              f"-> {S/dt:,.0f} tok/s", flush=True)
        if name != "bf16":
            qm.fusable = qm_fusable


if __name__ == "__main__":
    import os
    print("devices:", jax.devices(), flush=True)
    sections = os.environ.get("PROBE_SECTIONS", "lm_head,attention,window,prefill").split(",")
    if "lm_head" in sections:
        lm_head()
    if "attention" in sections:
        attention_kernels()
    if "window" in sections:
        decode_window_budget()
    if "prefill" in sections:
        prefill_matmuls()
    print("DONE", flush=True)
