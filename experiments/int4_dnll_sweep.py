"""INT4 accuracy frontier: group-size x quantizer-mode sweep on the dNLL
harness (VERDICT r4 #3 / BASELINE.md:28).

North star: quantized Δppl < 0.1 vs bf16 ⇔ ΔNLL < 0.01 nats/token (at a
trained model's ppl≈10). Round 4 measured int4-W (symmetric round-to-
nearest, group 128) at |0.091| nats — 9x over the bar — with no mitigation
attempted. This sweep measures every kernel-compatible lever:

  sym   — production round-4 quantizer: scale = absmax/7, clip ±7.
  mse   — per-group scale SEARCH minimizing the group's quantization MSE
          over the full [-8, 7] int4 range (absmax clipping is known-
          suboptimal for bell-shaped weights; the searched scale clips
          outliers when that trades a large outlier error for smaller
          steps everywhere else). Kernel-free: the fused kernel consumes
          whatever scales the quantizer chose.
  asym  — affine (zero-point) quantization: q in [0,15], w ≈ s*(q - z).
          Needs one extra kernel input (the per-group s*z row) and a
          per-group x-sum — measured here via the exact-equivalent
          fake-quant weights first; wired into production only if it
          earns its keep.

Each at G ∈ {32, 64, 128}. Fake-quant (dequantized f32 weights through
the real forward) is numerically IDENTICAL to the production jnp path for
sym/mse (dequantize computes q*scale in f32 either way) and exact for
asym by construction. Embedding/lm_head stays int8-per-row fake-quant in
every variant (production quantize_params behavior) so the Δ isolates the
matmul bit-width, matching what the int4-W gate measures.

Run: JAX_PLATFORMS=cpu python experiments/int4_dnll_sweep.py
Writes /tmp/int4_dnll_sweep.json; the chosen default lands in
ops/quant.py and README's dNLL table.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

# Force CPU regardless of preset platform plugins (the axon TPU tunnel
# registers itself even when JAX_PLATFORMS=cpu is in the environment —
# conftest.py has the same note); this sweep must not contend for the chip.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from nanovllm_tpu.models.qwen3 import Qwen3Config, init_params
from nanovllm_tpu.utils.perplexity import sequence_nll

QUANT_KEYS = ("qkv", "o", "gate_up", "down")


def fake_quant_embedding_int8(w):
    """Production per-vocab-row int8 (ops/quant.py quantize_embedding)."""
    wf = np.asarray(w, np.float32)
    absmax = np.abs(wf).max(axis=1)
    scale = np.maximum(absmax / 127.0, 1e-12)
    q = np.clip(np.rint(wf / scale[:, None]), -127, 127)
    return jnp.asarray(q * scale[:, None], jnp.float32)


def qdq_sym(wg, qmax=7.0):
    """wg [..., G, out] -> dequantized, production round-4 quantizer."""
    absmax = np.abs(wg).max(axis=-2, keepdims=True)
    scale = np.maximum(absmax / qmax, 1e-12)
    q = np.clip(np.rint(wg / scale), -qmax, qmax)
    return q * scale


def qdq_mse(wg, n_cand=24):
    """Per-group scale search over the full [-8,7] range: candidates
    shrink absmax/7 down to 0.5x; pick the per-group scale minimizing
    reconstruction MSE."""
    absmax = np.abs(wg).max(axis=-2, keepdims=True)  # [..., 1, out]
    base = np.maximum(absmax / 7.0, 1e-12)
    best_err = None
    best = None
    for c in np.linspace(1.0, 0.5, n_cand):
        scale = base * c
        q = np.clip(np.rint(wg / scale), -8, 7)
        deq = q * scale
        err = ((deq - wg) ** 2).sum(axis=-2, keepdims=True)
        if best_err is None:
            best_err, best = err, deq
        else:
            m = err < best_err
            best_err = np.where(m, err, best_err)
            best = np.where(m, deq, best)
    return best


def qdq_asym(wg):
    """Affine: q in [0,15], w ≈ s*(q-z), s=(max-min)/15, z=round(-min/s)."""
    wmin = wg.min(axis=-2, keepdims=True)
    wmax = wg.max(axis=-2, keepdims=True)
    scale = np.maximum((wmax - wmin) / 15.0, 1e-12)
    zp = np.clip(np.rint(-wmin / scale), 0, 15)
    q = np.clip(np.rint(wg / scale + zp), 0, 15)
    return (q - zp) * scale


def qdq_asym_mse(wg, n_cand=16):
    """Affine + range search: shrink the (min,max) window symmetrically
    toward the mean before fitting s/z — clipping tails often wins."""
    wmin = wg.min(axis=-2, keepdims=True)
    wmax = wg.max(axis=-2, keepdims=True)
    best_err = None
    best = None
    for c in np.linspace(1.0, 0.55, n_cand):
        lo, hi = wmin * c, wmax * c
        scale = np.maximum((hi - lo) / 15.0, 1e-12)
        zp = np.clip(np.rint(-lo / scale), 0, 15)
        q = np.clip(np.rint(wg / scale + zp), 0, 15)
        deq = (q - zp) * scale
        err = ((deq - wg) ** 2).sum(axis=-2, keepdims=True)
        if best_err is None:
            best_err, best = err, deq
        else:
            m = err < best_err
            best_err = np.where(m, err, best_err)
            best = np.where(m, deq, best)
    return best


MODES = {"sym": qdq_sym, "mse": qdq_mse, "asym": qdq_asym,
         "asym_mse": qdq_asym_mse}


def fake_quant_params(params, mode, G):
    qdq = MODES[mode]
    out = dict(params)
    out["layers"] = dict(params["layers"])
    wmse = 0.0
    wnorm = 0.0
    for k in QUANT_KEYS:
        w = np.asarray(params["layers"][k], np.float32)
        *lead, in_dim, od = w.shape
        wg = w.reshape(*lead, in_dim // G, G, od)
        deq = qdq(wg).reshape(w.shape)
        wmse += float(((deq - w) ** 2).sum())
        wnorm += float((w ** 2).sum())
        out["layers"][k] = jnp.asarray(deq, jnp.float32)
    out["embedding"] = fake_quant_embedding_int8(params["embedding"])
    if "lm_head" in params:
        out["lm_head"] = fake_quant_embedding_int8(params["lm_head"])
    return out, wmse / wnorm


def main():
    cfg = Qwen3Config(
        vocab_size=4096, hidden_size=2048, intermediate_size=6144,
        num_hidden_layers=8, num_attention_heads=16,
        num_key_value_heads=8, head_dim=128, tie_word_embeddings=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(0)
    texts = [rng.randint(0, 4096, size=n).tolist() for n in (48, 48)]

    nll, n = sequence_nll(cfg, params, texts, block_size=16)
    base = nll / n
    print(f"bf16 baseline: nll/tok = {base:.5f}", flush=True)

    # int8-embedding-only control: the int4 variants all carry the same
    # int8 embedding; its own dnll contribution is this row.
    emb_only = dict(params)
    emb_only["embedding"] = fake_quant_embedding_int8(params["embedding"])
    nll, n = sequence_nll(cfg, emb_only, texts, block_size=16)
    print(f"int8-emb-only  dnll = {nll / n - base:+.5f}", flush=True)

    results = {"bf16_nll_tok": base, "int8_emb_only_dnll": nll / n - base}
    for mode in ("sym", "mse", "asym", "asym_mse"):
        for G in (128, 64, 32):
            qp, rel_mse = fake_quant_params(params, mode, G)
            nll, n = sequence_nll(cfg, qp, texts, block_size=16)
            dnll = nll / n - base
            key = f"{mode}_g{G}"
            results[key] = {"dnll": dnll, "rel_weight_mse": rel_mse}
            print(f"{key:14s} dnll = {dnll:+.5f}  relWMSE = {rel_mse:.2e}",
                  flush=True)

    import os
    os.makedirs("/root/repo/experiments/results", exist_ok=True)
    out = "/root/repo/experiments/results/int4_dnll_sweep.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
