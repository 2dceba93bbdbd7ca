"""Perplexity evaluation harness — the quantization quality gate.

North-star acceptance (BASELINE.md): quantized perplexity delta < 0.1 vs
bf16 at each bit width. Teacher-forced NLL over given token sequences,
computed through the same functional forward + paged cache as serving (so
it also covers the KV-write path of whatever kv_cache_dtype is configured).
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.utils.metadata import build_metadata


def sequence_nll(cfg, params, token_lists: List[List[int]],
                 block_size: int = 16, kv_dtype=jnp.float32) -> tuple:
    """Total negative log-likelihood (nats) and token count of predicting
    token_lists[i][1:] from their prefixes."""
    from nanovllm_tpu.models.qwen3 import create_kv_caches, forward

    total_nll = 0.0
    total_tokens = 0
    for ids in token_lists:
        T = len(ids)
        nb = -(-T // block_size)
        kc, vc = create_kv_caches(cfg, nb + 1, block_size, kv_dtype)
        tokens, meta = build_metadata(
            [{"token_ids": list(ids), "num_cached": 0,
              "block_table": list(range(1, nb + 1))}],
            block_size, T=T, S=1, max_blocks=nb, Q=T,
        )
        logits, _, _ = forward(
            cfg, params, kc, vc, jnp.asarray(tokens), meta, all_logits=True
        )  # [T, V]
        logprobs = jax.nn.log_softmax(logits[:-1], axis=-1)
        nll = -jnp.take_along_axis(
            logprobs, jnp.asarray(ids[1:], jnp.int32)[:, None], axis=1
        ).sum()
        total_nll += float(nll)
        total_tokens += T - 1
    return total_nll, total_tokens


def perplexity(cfg, params, token_lists: List[List[int]], **kw) -> float:
    nll, n = sequence_nll(cfg, params, token_lists, **kw)
    return math.exp(nll / max(n, 1))


def quantization_ppl_report(cfg, params, token_lists: List[List[int]],
                            methods=("int8", "int4"), **kw) -> dict:
    """Perplexity of the bf16 params and each quantized variant.

    Returns {"bf16": ppl, "int8": ppl, "int4": ppl, ...}; the serving
    acceptance bar is ppl[method] - ppl["bf16"] < 0.1.
    """
    import jax

    from nanovllm_tpu.ops.quant import quantize_params

    report = {"bf16": perplexity(cfg, params, token_lists, **kw)}
    for m in methods:
        # quantize_params consumes its input tree structure (it bounds peak
        # memory at load time) — hand it a fresh container copy; the jax
        # array leaves themselves are immutable and shared.
        qp = quantize_params(jax.tree.map(lambda x: x, params), m)
        report[m] = perplexity(cfg, qp, token_lists, **kw)
    return report


def quantization_dnll_report(cfg, params, token_lists: List[List[int]],
                             weight_methods=("int8", "int4"),
                             kv_dtypes=("int8", "float8_e4m3fn"),
                             **kw) -> dict:
    """The accuracy gate in NORTH-STAR units (BASELINE.md:28 "quantized
    perplexity Δ < 0.1 vs bf16").

    On fabricated (random-init) weights, absolute Δppl is not directly
    comparable to a trained model's — random-init ppl sits near vocab
    size, where a 0.1 absolute delta is numerically meaningless. The
    scale-invariant equivalent is **ΔNLL per token in nats**:
        ppl = exp(nll), so Δppl ≈ ppl · ΔNLL for small deltas.
    At a trained model's ppl ≈ 10, the north star's Δppl < 0.1 is
    ΔNLL < 0.01 nats/token — THAT is the gate applied here, per
    bit-width, at the largest fabricatable geometry.

    Returns {variant: {"ppl": float, "nll": nats/token,
                       "dnll": nats/token vs bf16,
                       "dppl_at_ppl10": projected Δppl at ppl 10}}.
    """
    import jax

    from nanovllm_tpu.ops.quant import quantize_params

    def entry(nll, n, base_nll_tok=None):
        nll_tok = nll / max(n, 1)
        e = {"ppl": math.exp(nll_tok), "nll": nll_tok}
        if base_nll_tok is not None:
            dnll = nll_tok - base_nll_tok
            e["dnll"] = dnll
            e["dppl_at_ppl10"] = 10.0 * dnll
        return e

    nll, n = sequence_nll(cfg, params, token_lists, **kw)
    report = {"bf16": entry(nll, n)}
    base = report["bf16"]["nll"]
    for m in weight_methods:
        # A method is "int8"/"int4" (production defaults) or a dict
        # {"label", "method", "group_size", "mode"} for candidate variants
        # (the 4B gate run also reports the next-finer int4 granularity).
        if isinstance(m, dict):
            label = m.get("label") or m["method"]
            qp = quantize_params(
                jax.tree.map(lambda x: x, params), m["method"],
                group_size=m.get("group_size"), mode=m.get("mode"),
            )
        else:
            label = m
            qp = quantize_params(jax.tree.map(lambda x: x, params), m)
        nll, n = sequence_nll(cfg, qp, token_lists, **kw)
        report[f"{label}-W"] = entry(nll, n, base)
    for kd in kv_dtypes:
        kw2 = dict(kw)
        kw2["kv_dtype"] = getattr(jnp, kd)
        nll, n = sequence_nll(cfg, params, token_lists, **kw2)
        report[f"{kd}-KV"] = entry(nll, n, base)
    return report
