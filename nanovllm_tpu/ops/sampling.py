"""Fully-vectorized batched sampling on device.

Capability parity with the reference Sampler (src/layers/sampler.rs:26-254):
greedy argmax, temperature scaling, top-k, top-p (nucleus), and multinomial
sampling via the Gumbel-max trick — but computed for the whole batch inside
one jitted function instead of a per-sequence host loop. Additionally
implements repetition penalty for real (the reference declares the field but
never applies it, sampler.rs:269-271).

Static `use_*` flags keep the expensive full-vocab sort out of the compiled
graph for batches that don't need it; the runner picks the variant per batch.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

_NEG_INF = -1e30
# Static cap for per-sequence top-k (k is dynamic per request, bounded here).
TOP_K_MAX = 256


def sample_logits(
    logits: jax.Array,
    key: jax.Array,
    temperatures: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    rep_penalty: jax.Array,
    penalty_tokens: jax.Array,
    *,
    use_top_k: bool = False,
    use_top_p: bool = False,
    use_penalty: bool = False,
) -> jax.Array:
    """Sample one token per row (traceable core — call inside a jitted step).

    logits: [S, V]; temperatures/top_k/top_p/rep_penalty: [S]
    penalty_tokens: [S, P] token ids already emitted (-1 padded)
    top_k[i] == 0 disables top-k for that row; top_p[i] == 1.0 disables top-p;
    rep_penalty[i] == 1.0 disables the penalty. temperatures[i] == 0 → greedy.
    """
    S, V = logits.shape
    logits = logits.astype(jnp.float32)

    if use_penalty:
        # Gather the logits of previously-seen tokens, penalize, scatter back.
        toks = jnp.clip(penalty_tokens, 0, V - 1)
        vals = jnp.take_along_axis(logits, toks, axis=1)
        pen = rep_penalty[:, None]
        new_vals = jnp.where(vals > 0, vals / pen, vals * pen)
        valid = penalty_tokens >= 0
        new_vals = jnp.where(valid, new_vals, vals)
        logits = logits.at[jnp.arange(S)[:, None], toks].set(new_vals)

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # Temperature scaling (0 handled by the greedy select at the end).
    safe_t = jnp.maximum(temperatures, 1e-6)[:, None]
    scaled = logits / safe_t

    if use_top_k:
        kvals, _ = jax.lax.top_k(scaled, TOP_K_MAX)  # [S, K] descending
        k_idx = jnp.clip(top_k, 1, TOP_K_MAX) - 1
        kth = jnp.take_along_axis(kvals, k_idx[:, None], axis=1)  # [S, 1]
        keep = (scaled >= kth) | (top_k[:, None] == 0)
        scaled = jnp.where(keep, scaled, _NEG_INF)

    if use_top_p:
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]  # descending
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep tokens while the cumulative prob BEFORE them is < p (the first
        # token is always kept); cutoff = smallest kept logit.
        keep_sorted = (cum - probs) < top_p[:, None]
        num_keep = jnp.sum(keep_sorted, axis=-1)  # >= 1
        cutoff = jnp.take_along_axis(sorted_logits, (num_keep - 1)[:, None], axis=1)
        keep = (scaled >= cutoff) | (top_p[:, None] >= 1.0)
        scaled = jnp.where(keep, scaled, _NEG_INF)

    # Gumbel-max multinomial (reference: sampler.rs:191-218).
    gumbel = jax.random.gumbel(key, (S, V), dtype=jnp.float32)
    sampled_tok = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)

    return jnp.where(temperatures == 0.0, greedy_tok, sampled_tok)


sample = jax.jit(
    sample_logits, static_argnames=("use_top_k", "use_top_p", "use_penalty")
)
