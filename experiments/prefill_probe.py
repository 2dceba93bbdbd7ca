"""Prefill decomposition at the saturating bench point (VERDICT r4 #10:
"prefill_4k_cold_batch8 publishes mfu 0.073 — land >=0.4 or a floor
analysis").

The bench row: 8 x 4096-token cold prompts, int8 weights, budget 16384
tokens/step -> 2 prefill steps of 16,384 tokens. Its prefill_mfu counts
MATMUL flops only (2*T*params). This probe measures each kernel of a
prefill step at the real shapes to apportion the step wall between

  - the 4-matmul chain at T=16384 (the MFU numerator's subject),
  - flash varlen attention at 4k causal context (whose QK^T + PV flops
    at T=4096 are ~53% of the matmul flops and which no MFU row counts),
  - bulk KV commit,
  - lm_head on the 8 last-token rows,

then states the modeled step wall vs the engine's measured step wall.
Slope method where iteration is possible (fori_loop over layers);
matmul/attention kernels dominate at these sizes so tunnel fixed cost
(~25 ms/dispatch) is <2% per timed dispatch.

Run: python experiments/prefill_probe.py   (needs the TPU chip)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

D, I, L = 1024, 3072, 28
Hq, Hkv, Dh = 16, 8, 128
V = 151936
BS = 256
SEQS = 4           # per 16,384-token step: 4 seqs x 4096 tokens
T_SEQ = 4096
T = SEQS * T_SEQ   # 16384


def _sync(out):
    # Fetch one element to synchronize: on the axon tunneled attachment
    # block_until_ready returns before device execution completes
    # (scan_slice_probe measured 26 us for a 270-us-byte-floor chain).
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=8):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    rng = jax.random.PRNGKey(0)
    mk = jax.jit(lambda k, s: (jax.random.normal(k, s, jnp.float32)
                               * 0.02).astype(jnp.bfloat16),
                 static_argnums=1)

    # --- matmul chain at T=16384, int8 per-channel (the bench config) ---
    from nanovllm_tpu.ops.quant import quant_matmul, quantize

    shapes = [(D, (Hq + 2 * Hkv) * Dh), (Hq * Dh, D), (D, 2 * I), (I, D)]
    qts = [quantize(jax.random.normal(jax.random.fold_in(rng, 10 + i), s,
                                      jnp.float32) * 0.02, 8, group_size=-1)
           for i, s in enumerate(shapes)]
    h0 = mk(jax.random.fold_in(rng, 1), (T, D))

    def mm_chain(h, *qts):
        def body(_, hh):
            y1 = quant_matmul(hh, qts[0])
            h2 = quant_matmul(y1[:, :Hq * Dh], qts[1])
            y2 = quant_matmul(h2, qts[2])
            h3 = quant_matmul(y2[:, :I], qts[3])
            return (hh.astype(jnp.float32) * 0.9
                    + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
        return jax.lax.fori_loop(0, L, body, h)

    t_mm = timeit(jax.jit(mm_chain), h0, *qts)
    mm_flops = 2.0 * T * sum(a * b for a, b in shapes) * L
    print(f"matmul chain x{L}L T={T}: {t_mm*1e3:8.2f} ms  "
          f"({mm_flops/t_mm/1e12:.1f} TFLOP/s = "
          f"{mm_flops/t_mm/197e12:.2f} MXU)", flush=True)

    # --- flash varlen prefill attention at 4k causal, int8 KV ---
    from nanovllm_tpu.ops.pallas.flash_prefill import paged_attention_prefill
    from nanovllm_tpu.utils.metadata import build_metadata

    nb = T_SEQ // BS
    NB = SEQS * nb + 2
    seqs_meta = []
    for s in range(SEQS):
        seqs_meta.append({
            "token_ids": list(range(T_SEQ)),
            "num_cached": 0,
            "block_table": [1 + s * nb + b for b in range(nb)],
        })
    tokens, meta = build_metadata(seqs_meta, BS, T=T, S=SEQS, max_blocks=nb,
                                  Q=T_SEQ)
    q = mk(jax.random.fold_in(rng, 2), (T, Hq, Dh))
    kd = jax.jit(lambda k: jax.random.randint(k, (L, NB, Hkv, BS, Dh),
                                              -127, 128, jnp.int8))
    ks = jax.jit(lambda k: jax.random.uniform(k, (L, NB, Hkv, BS),
                                              jnp.float32, 0.001, 0.02))
    kc = (kd(jax.random.fold_in(rng, 3)), ks(jax.random.fold_in(rng, 4)))
    vc = (kd(jax.random.fold_in(rng, 5)), ks(jax.random.fold_in(rng, 6)))

    def attn_layers(q, kc, vc, meta):
        def body(_, acc):
            o = paged_attention_prefill(
                q, kc, vc, jnp.int32(0), meta.block_tables,
                meta.context_lens, meta.q_gather, meta.q_positions,
                meta.token_seq, meta.token_qcol, scale=Dh ** -0.5)
            return acc + o.astype(jnp.float32) * 1e-3
        return jax.lax.fori_loop(0, L, body, jnp.zeros_like(q, jnp.float32))

    t_at = timeit(jax.jit(attn_layers), q, kc, vc, meta)
    # causal: ~T_seq^2/2 keys per seq; QK^T + PV, each 2 flops/MAC.
    at_flops = 2.0 * 2.0 * (T_SEQ ** 2 / 2) * Hq * Dh * SEQS * L
    print(f"flash prefill x{L}L 4k causal: {t_at*1e3:8.2f} ms  "
          f"({at_flops/t_at/1e12:.1f} TFLOP/s = "
          f"{at_flops/t_at/197e12:.2f} MXU)", flush=True)

    # --- bulk prefill KV commit ---
    from nanovllm_tpu.ops.pallas.prefill_commit import prefill_kv_commit

    kg = mk(jax.random.fold_in(rng, 7), (SEQS, Hkv, nb * BS, Dh))
    cached = jnp.zeros((SEQS,), jnp.int32)

    def commit(kg, kc, vc, meta):
        return prefill_kv_commit(kg, kg, kc, vc, jnp.int32(0),
                                 meta.block_tables, meta.context_lens,
                                 cached)

    t_cm = timeit(jax.jit(commit), kg, kc, vc, meta) * L
    print(f"kv commit x{L}L: {t_cm*1e3:8.2f} ms", flush=True)

    # --- lm_head on SEQS last rows (int8 embedding + fused argmax) ---
    from nanovllm_tpu.ops.quant import greedy_head, quantize_embedding

    emb = quantize_embedding(
        jax.random.normal(jax.random.fold_in(rng, 8), (V, D), jnp.float32)
        * 0.02)
    hrows = mk(jax.random.fold_in(rng, 9), (SEQS, D))
    t_lm = timeit(jax.jit(lambda h, d, s: greedy_head(
        h, type(emb)(data=d, scale=s, dtype=emb.dtype))), hrows, emb.data,
        emb.scale)
    print(f"lm_head+argmax S={SEQS}: {t_lm*1e3:8.2f} ms", flush=True)

    total = t_mm + t_at + t_cm + t_lm
    print("\nper-16384-token prefill step budget (ms):", flush=True)
    for name, t in (("matmuls", t_mm), ("attention", t_at),
                    ("commit", t_cm), ("lm_head", t_lm)):
        print(f"  {name:10s} {t*1e3:8.2f}  ({t/total*100:4.1f}%)", flush=True)
    eff_flops = mm_flops + at_flops
    print(f"  SUM        {total*1e3:8.2f}  -> modeled prefill "
          f"{T/total:,.0f} tok/s; matmul-only MFU {mm_flops/total/197e12:.3f}; "
          f"all-flops MXU {eff_flops/total/197e12:.3f}", flush=True)


if __name__ == "__main__":
    main()
