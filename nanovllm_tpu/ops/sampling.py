"""Fully-vectorized batched sampling on device.

Capability parity with the reference Sampler (src/layers/sampler.rs:26-254):
greedy argmax, temperature scaling, top-k, top-p (nucleus), and multinomial
sampling via the Gumbel-max trick — but computed for the whole batch inside
one jitted function instead of a per-sequence host loop. Beyond the
reference's declared-but-dead fields it actually implements:
- repetition penalty (declared, never applied: sampler.rs:269-271),
- frequency/presence penalties (intended surface per
  reference tests/unit/sampling_test.rs:60-84),
- per-request seeds for reproducible sampling independent of batch
  composition and pipeline depth.

Static `use_*` flags keep the expensive full-vocab work out of the compiled
graph for batches that don't need it; the runner picks the variant per batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30
# Static cap for per-sequence top-k (k is dynamic per request, bounded here;
# SamplingParams.validate rejects larger values — never silently clamped).
TOP_K_MAX = 256


class SamplingState(NamedTuple):
    """Per-batch sampling inputs, packed as a pytree.

    The token ring buffer (`buf`/`gen_mask`/`cursor`) carries the recent
    token history each penalty needs; the decode window appends sampled
    tokens to it ON DEVICE, and the runner merges still-in-flight window
    outputs into it at dispatch — so penalties never force a pipeline flush.
    """

    temps: jax.Array       # [S] f32; 0 → greedy
    top_k: jax.Array       # [S] i32; 0 disables per row
    top_p: jax.Array       # [S] f32; 1.0 disables per row
    rep_pen: jax.Array     # [S] f32; 1.0 disables per row
    freq_pen: jax.Array    # [S] f32; 0.0 disables per row
    pres_pen: jax.Array    # [S] f32; 0.0 disables per row
    buf: jax.Array         # [S, P] i32 recent-token ring, -1 padded
    gen_mask: jax.Array    # [S, P] bool — slot holds a GENERATED token
    cursor: jax.Array      # [S] i32 ring write position (tokens written so far)
    seeds: jax.Array       # [S] u32 per-request seed (0 when unset)
    has_seed: jax.Array    # [S] bool
    gen_counts: jax.Array  # [S] i32 completion tokens generated before this step
    # OpenAI logit_bias: per-row (token id, additive bias) entries, present
    # only when use_logit_bias is set (None otherwise — an empty pytree).
    bias_ids: jax.Array = None   # [S, B] i32, -1 padded
    bias_vals: jax.Array = None  # [S, B] f32


def append_to_ring(state: SamplingState, tokens: jax.Array, valid) -> SamplingState:
    """Append one generated token per (valid) row to the history ring and
    bump the per-row generation counter. Traceable."""
    S, P = state.buf.shape
    rows = jnp.arange(S, dtype=jnp.int32)
    slot = state.cursor % P
    buf = state.buf.at[rows, slot].set(jnp.where(valid, tokens, state.buf[rows, slot]))
    gen_mask = state.gen_mask.at[rows, slot].set(
        jnp.where(valid, True, state.gen_mask[rows, slot])
    )
    cursor = jnp.where(valid, state.cursor + 1, state.cursor)
    gen_counts = jnp.where(valid, state.gen_counts + 1, state.gen_counts)
    return state._replace(buf=buf, gen_mask=gen_mask, cursor=cursor, gen_counts=gen_counts)


def sample_logits(
    logits: jax.Array,
    key: jax.Array,
    state: SamplingState,
    *,
    use_top_k: bool = False,
    use_top_p: bool = False,
    use_penalty: bool = False,
    use_freq_pres: bool = False,
    use_seeds: bool = False,
    use_random: bool = True,
    use_logit_bias: bool = False,
) -> jax.Array:
    """Sample one token per row (traceable core — call inside a jitted step).

    logits: [S, V]. Seeded rows draw their Gumbel noise from
    fold_in(PRNGKey(seed), gen_counts) — a function of the request alone, so
    the sampled sequence is reproducible across batch compositions, decode
    windows, and pipeline depths.
    """
    S, V = logits.shape
    logits = logits.astype(jnp.float32)
    rows = jnp.arange(S, dtype=jnp.int32)

    if use_penalty:
        # HF-style repetition penalty over recent tokens (prompt+generated):
        # gather the logits of seen tokens, penalize, scatter back.
        toks = jnp.clip(state.buf, 0, V - 1)
        vals = jnp.take_along_axis(logits, toks, axis=1)
        pen = state.rep_pen[:, None]
        new_vals = jnp.where(vals > 0, vals / pen, vals * pen)
        valid = state.buf >= 0
        new_vals = jnp.where(valid, new_vals, vals)
        logits = logits.at[rows[:, None], toks].set(new_vals)

    if use_freq_pres:
        # OpenAI-style: logits[t] -= freq*count(t) + presence*[count(t)>0],
        # over GENERATED tokens only (gen_mask).
        valid_gen = (state.buf >= 0) & state.gen_mask
        toks = jnp.clip(state.buf, 0, V - 1)
        counts = jnp.zeros((S, V), jnp.float32).at[rows[:, None], toks].add(
            valid_gen.astype(jnp.float32)
        )
        logits = (
            logits
            - state.freq_pen[:, None] * counts
            - state.pres_pen[:, None] * (counts > 0.0)
        )

    if use_logit_bias:
        # OpenAI logit_bias: add per-request biases to the raw logits
        # before ANY selection (greedy included); -100 is an effective ban,
        # +100 effectively exclusive.
        toks = jnp.clip(state.bias_ids, 0, V - 1)
        valid = state.bias_ids >= 0
        logits = logits.at[rows[:, None], toks].add(
            jnp.where(valid, state.bias_vals, 0.0)
        )

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if not use_random:
        # Every row is greedy: skip the Gumbel draw entirely. Generating
        # [S, V] threefry noise costs ~this much VPU time as the whole
        # logits matmul at decode batch sizes — a pure waste when temps==0.
        return greedy_tok

    # Temperature scaling (0 handled by the greedy select at the end).
    safe_t = jnp.maximum(state.temps, 1e-6)[:, None]
    scaled = logits / safe_t

    if use_top_k:
        kvals, _ = jax.lax.top_k(scaled, TOP_K_MAX)  # [S, K] descending
        k_idx = jnp.clip(state.top_k, 1, TOP_K_MAX) - 1
        kth = jnp.take_along_axis(kvals, k_idx[:, None], axis=1)  # [S, 1]
        keep = (scaled >= kth) | (state.top_k[:, None] == 0)
        scaled = jnp.where(keep, scaled, _NEG_INF)

    if use_top_p:
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]  # descending
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep tokens while the cumulative prob BEFORE them is < p (the first
        # token is always kept); cutoff = smallest kept logit.
        keep_sorted = (cum - probs) < state.top_p[:, None]
        num_keep = jnp.sum(keep_sorted, axis=-1)  # >= 1
        cutoff = jnp.take_along_axis(sorted_logits, (num_keep - 1)[:, None], axis=1)
        keep = (scaled >= cutoff) | (state.top_p[:, None] >= 1.0)
        scaled = jnp.where(keep, scaled, _NEG_INF)

    # Gumbel-max multinomial (reference: sampler.rs:191-218).
    gumbel = jax.random.gumbel(key, (S, V), dtype=jnp.float32)
    if use_seeds:
        def row_gumbel(seed, count):
            k = jax.random.fold_in(jax.random.PRNGKey(seed), count)
            return jax.random.gumbel(k, (V,), dtype=jnp.float32)

        seeded = jax.vmap(row_gumbel)(state.seeds, state.gen_counts)
        gumbel = jnp.where(state.has_seed[:, None], seeded, gumbel)
    sampled_tok = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)

    return jnp.where(state.temps == 0.0, greedy_tok, sampled_tok)


def token_logprobs(logits: jax.Array, tokens: jax.Array, top_n: int):
    """Per-row logprob of `tokens` under the model's RAW distribution
    (log_softmax of the unprocessed logits — OpenAI semantics), plus the
    top-max(1, top_n) (values, ids). logits [S, V], tokens [S] ->
    (chosen [S] f32, top_vals [S, n] f32, top_ids [S, n] i32). Traceable."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    chosen = jnp.take_along_axis(
        lp, tokens.astype(jnp.int32)[:, None], axis=1
    )[:, 0]
    tv, ti = jax.lax.top_k(lp, max(1, top_n))
    return chosen, tv, ti.astype(jnp.int32)


sample = jax.jit(
    sample_logits,
    static_argnames=(
        "use_top_k", "use_top_p", "use_penalty", "use_freq_pres",
        "use_seeds", "use_random", "use_logit_bias",
    ),
)
