"""Jitted serving-step builders: fused forward+sample, and the multi-token
decode window.

Design note (TPU-first, replaces the reference's CUDA-graph ambition,
src/engine/model_runner.rs:303-361): dispatching one jit per generated token
pays a host↔device round trip per token, which dominates decode latency —
especially on remote/tunneled TPU attachment where one synchronized dispatch
costs tens of ms. Instead, `decode_window` runs K decode iterations inside a
single jit via `lax.scan`: the sampled token of substep i feeds substep i+1
ON DEVICE (token feedback never touches the host), slot mappings are derived
from block tables + context lengths on device, and only the final [K, S]
token matrix syncs back. The scheduler pre-reserves KV blocks for the whole
window; the host postprocesses (stop detection, detokenization, hashing) in
bulk and truncates anything generated past a stop condition.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops.sampling import (
    SamplingState,
    append_to_ring,
    sample_logits,
    token_logprobs,
)
from nanovllm_tpu.utils.metadata import AttentionMetadata


def build_prefill_step(
    cfg, forward_fn: Callable, flags: dict, attn_impl: str = "ref", mesh=None,
    logprobs_n: int = -1,
) -> Callable:
    """Fused forward + sample for a prefill batch (one token per sequence).

    Returns fn(params, kc, vc, tokens, meta, samp: SamplingState, key)
            -> (tokens [S], extras, kc, vc)
    extras is None, or (chosen_lp [S], top_vals [S, n], top_ids [S, n])
    when logprobs_n >= 0.
    """
    greedy_fused = _greedy_fused(flags, logprobs_n)

    def fn(params, k_cache, v_cache, tokens, meta, samp: SamplingState, key):
        if greedy_fused:
            toks, k_cache, v_cache = forward_fn(
                cfg, params, k_cache, v_cache, tokens, meta,
                attn_impl=attn_impl, mesh=mesh, head_mode="greedy",
            )
            return toks, None, k_cache, v_cache
        logits, k_cache, v_cache = forward_fn(
            cfg, params, k_cache, v_cache, tokens, meta, attn_impl=attn_impl,
            mesh=mesh,
        )
        toks = sample_logits(logits, key, samp, **flags)
        extras = (
            token_logprobs(logits, toks, logprobs_n) if logprobs_n >= 0 else None
        )
        return toks, extras, k_cache, v_cache

    return jax.jit(fn, donate_argnums=(1, 2))


def _greedy_fused(flags: dict, logprobs_n: int) -> bool:
    """A batch can take the fused lm_head+argmax path (the [S, V] logits
    never materialize) iff every row is greedy and nothing downstream reads
    the logits: no Gumbel draw, no logit-mutating penalties, no logprobs.
    Seed/history tracking is compatible (it consumes tokens, not logits)."""
    return (
        not flags.get("use_random", True)
        and not flags.get("use_penalty", False)
        and not flags.get("use_freq_pres", False)
        and not flags.get("use_logit_bias", False)
        and logprobs_n < 0
    )


def ngram_propose(buf, ctx, last, ngram_n: int, spec_k: int):
    """Prompt-lookup proposer, fully on device: per row, find the most
    recent EARLIER occurrence of the trailing `ngram_n`-gram in buf[:ctx]
    and propose the `spec_k` tokens that followed it. Rows with no match
    (or a match whose continuation runs past ctx) fall back to repeating
    `last` — any proposal is safe, verification guarantees correctness.

    buf: [S, TBUF] token ids (-1 padded past ctx); ctx: [S]; last: [S].
    Returns [S, spec_k] proposals."""
    S, TBUF = buf.shape
    n = ngram_n
    tpos = (ctx - n)[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]
    tail = jnp.take_along_axis(buf, jnp.clip(tpos, 0, TBUF - 1), axis=1)
    NI = TBUF - n + 1  # candidate n-gram start positions
    eq = jnp.ones((S, NI), bool)
    for t in range(n):
        eq = eq & (buf[:, t:t + NI] == tail[:, t:t + 1])
    ipos = jnp.arange(NI, dtype=jnp.int32)[None, :]
    # A usable source starts strictly before the tail itself and the
    # sequence must actually have n committed tokens.
    ok = eq & (ipos < (ctx - n)[:, None]) & (ctx >= n)[:, None]
    best = jnp.max(jnp.where(ok, ipos, -1), axis=1)  # [S], -1 = no match
    src = best[:, None] + n + jnp.arange(spec_k, dtype=jnp.int32)[None, :]
    props = jnp.take_along_axis(buf, jnp.clip(src, 0, TBUF - 1), axis=1)
    usable = (best >= 0)[:, None] & (src < ctx[:, None])
    return jnp.where(usable, props, last[:, None])


def build_spec_window(
    cfg,
    forward_fn: Callable,
    block_size: int,
    num_iters: int,
    spec_k: int,
    ngram_n: int,
    attn_impl: str = "ref",
    mesh=None,
) -> Callable:
    """W speculative-verify iterations in one jit (greedy decode only).

    Each iteration proposes `spec_k` tokens by prompt-lookup (match the
    sequence's trailing `ngram_n`-gram against its own earlier tokens, on
    device) and verifies them with ONE multi-query forward: the chunk
    [last, p_0, .., p_{k-1}] attends the paged history plus itself causally
    (the exact metadata shape chunked prefill uses), and the fused greedy
    head returns the argmax at every chunk position. The longest prefix of
    proposals matching the argmaxes is accepted, plus the "bonus" argmax at
    the first mismatch — so every iteration yields 1..k+1 tokens and the
    emitted stream is bit-identical to non-speculative greedy decode.

    KV protocol: iteration inputs write KV at positions ctx-1..ctx-1+k;
    rejected positions hold wrong-token KV, but the committed-KV invariant
    (positions <= len-2 correct) is preserved because the next iteration's
    inputs rewrite exactly those slots before anything reads them — the
    same scatter-then-attend ordering the single-step path relies on.

    Why this wins: at small batches decode is weight-bandwidth-bound, so a
    k+1-query verify streams the same weight bytes as a 1-query step —
    accepted proposals are free tokens. No reference counterpart.

    Returns fn(params, kc, vc, tok_buf [S, TBUF], context_lens [S],
               block_tables [S, M])
            -> (preds [W, S, k+1], accepts [W, S], kc, vc)
    The host emits preds[w, s, :accepts[w, s]+1] per iteration.
    tok_buf rows hold each sequence's full token ids (prompt + generated),
    -1 padded past context_lens; TBUF must be >= max ctx + W*(k+1).
    """
    k1 = spec_k + 1

    def propose(buf, ctx, last):
        return ngram_propose(buf, ctx, last, ngram_n, spec_k)

    def fn(params, k_cache, v_cache, tok_buf, context_lens, block_tables):
        S, TBUF = tok_buf.shape
        M = block_tables.shape[1]
        rows = jnp.arange(S, dtype=jnp.int32)
        j = jnp.arange(k1, dtype=jnp.int32)

        def iteration(carry, _):
            kc, vc, buf, ctx = carry
            valid = ctx > 0
            last = buf[rows, jnp.clip(ctx - 1, 0, TBUF - 1)]
            props = propose(buf, ctx, last)
            chunk = jnp.maximum(  # clamp -1 padding reads to a legal id
                jnp.concatenate([last[:, None], props], axis=1), 0
            )  # [S, k1]
            pos = (ctx - 1)[:, None] + j[None, :]  # [S, k1]
            blk_idx = jnp.clip(pos // block_size, 0, M - 1)
            blk = jnp.take_along_axis(block_tables, blk_idx, axis=1)
            slot = jnp.where(
                valid[:, None], blk * block_size + pos % block_size, -1
            )
            meta = AttentionMetadata(
                slot_mapping=slot.reshape(-1),
                positions=jnp.maximum(pos, 0).reshape(-1),
                token_seq=jnp.repeat(rows, k1),
                token_qcol=jnp.tile(j, S),
                block_tables=block_tables,
                context_lens=jnp.where(valid, ctx + spec_k, 0),
                logits_idx=rows * k1 + (k1 - 1),  # unused under all_logits
                q_gather=rows[:, None] * k1 + j[None, :],
                q_positions=jnp.where(valid[:, None], pos, -1),
            )
            pred_flat, kc, vc = forward_fn(
                cfg, params, kc, vc, chunk.reshape(S * k1), meta,
                attn_impl=attn_impl, mesh=mesh, all_logits=True,
                head_mode="greedy",
            )
            pred = pred_flat.reshape(S, k1).astype(jnp.int32)
            # Longest accepted prefix: pred[:, i] verifies proposal i.
            match = (pred[:, :spec_k] == props).astype(jnp.int32)
            acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # [S] in 0..k
            # Write all k1 predictions at positions ctx..ctx+k; rows beyond
            # ctx+acc are provisional and the next iteration overwrites
            # them (the proposer only ever reads below ctx).
            wpos = ctx[:, None] + j[None, :]
            widx = jnp.where(
                valid[:, None] & (wpos < TBUF),
                rows[:, None] * TBUF + wpos,
                S * TBUF,  # out-of-bounds positive -> dropped
            )
            buf = (
                buf.reshape(-1)
                .at[widx.reshape(-1)]
                .set(pred.reshape(-1), mode="drop")
                .reshape(S, TBUF)
            )
            ctx = jnp.where(valid, jnp.minimum(ctx + acc + 1, TBUF), ctx)
            return (kc, vc, buf, ctx), (pred, acc)

        (k_cache, v_cache, _, _), (preds, accs) = jax.lax.scan(
            iteration, (k_cache, v_cache, tok_buf, context_lens), None,
            length=num_iters,
        )
        return preds, accs, k_cache, v_cache

    return jax.jit(fn, donate_argnums=(1, 2))


def build_decode_window(
    cfg,
    forward_fn: Callable,
    block_size: int,
    num_steps: int,
    flags: dict,
    attn_impl: str = "ref",
    mesh=None,
    window_commit: bool = True,
    logprobs_n: int = -1,
    use_shared: bool = False,
) -> Callable:
    """K self-feeding decode substeps in one jit.

    Returns fn(params, kc, vc, last_tokens [S], block_tables [S, M],
               context_lens [S], samp: SamplingState, key)
            -> (tokens [K, S], extras, kc, vc)
    extras is None, or (chosen_lp [K, S], top_vals [K, S, n],
    top_ids [K, S, n]) when logprobs_n >= 0 (raw-distribution logprobs of
    each substep's sampled token).

    context_lens[i] = len(seq i) at dispatch (so substep 0 writes KV at
    position len-1 and samples token index len, matching the single-step
    append protocol). Padded rows have context_lens == 0; their slots are -1
    (dropped) and their sampled tokens are garbage the host ignores.

    use_shared: shared-prefix attention — fn takes extra args
    (shared_tables [NG, MSHB], shared_nblocks [NG], group_id [S] with -1
    for non-members, skip_blocks [S]) and a static keyword max_rem; the
    window kernels attend each group's shared span once for all its
    members (window-commit mode only).
    """
    track_history = any(
        flags.get(f) for f in ("use_penalty", "use_freq_pres", "use_seeds")
    )
    greedy_fused = _greedy_fused(flags, logprobs_n)
    # Window-commit mode (pallas decode): KV rows stage in a
    # [L, S, Hkv, K, Dh] buffer across the window; attention merges the
    # history kernel with XLA attention over the staged rows; the cache is
    # span-committed once per layer per window (K-fold fewer DMA issues
    # than per-substep row RMWs).
    window_mode = attn_impl == "pallas_decode" and window_commit

    def fn(params, k_cache, v_cache, last_tokens, block_tables, context_lens,
           samp, key, shared_tables=None, shared_nblocks=None, group_id=None,
           skip_blocks=None, max_rem=None):
        S, M = block_tables.shape
        rows = jnp.arange(S, dtype=jnp.int32)
        start_lens = jnp.maximum(context_lens - 1, 0)
        seq_valid = context_lens > 0
        if window_mode:
            L = cfg.num_hidden_layers
            Hkv, Dh = cfg.num_key_value_heads, cfg.head_dim
            wdtype = params["final_ln"].dtype
            k_win0 = jnp.zeros((L, S, Hkv, num_steps, Dh), wdtype)
            v_win0 = jnp.zeros((L, S, Hkv, num_steps, Dh), wdtype)

        def substep(carry, k_idx):
            if window_mode:
                k_cache, v_cache, toks, ctx, state, k_win, v_win = carry
            else:
                k_cache, v_cache, toks, ctx, state = carry
            valid = ctx > 0
            pos = jnp.maximum(ctx - 1, 0)  # position written this substep
            blk_idx = jnp.clip(pos // block_size, 0, M - 1)
            blk = block_tables[rows, blk_idx]
            slot = jnp.where(valid, blk * block_size + pos % block_size, -1)

            meta = AttentionMetadata(
                slot_mapping=slot,
                positions=pos,
                token_seq=rows,
                token_qcol=jnp.zeros((S,), jnp.int32),
                block_tables=block_tables,
                context_lens=ctx,
                logits_idx=rows,
                q_gather=rows[:, None],
                q_positions=jnp.where(valid, ctx - 1, -1)[:, None],
            )
            head_mode = "greedy" if greedy_fused else "logits"
            if window_mode:
                win = dict(k_win=k_win, v_win=v_win, substep=k_idx,
                           start_lens=start_lens)
                if use_shared:
                    win.update(shared_tables=shared_tables,
                               shared_nblocks=shared_nblocks,
                               group_id=group_id,
                               skip_blocks=skip_blocks, max_rem=max_rem)
                logits, k_cache, v_cache, (k_rows, v_rows) = forward_fn(
                    cfg, params, k_cache, v_cache, toks, meta,
                    attn_impl=attn_impl, mesh=mesh,
                    window=win,
                    head_mode=head_mode,
                )
                # Stage this substep's rows (all layers at once) at slot j.
                k_win = jax.lax.dynamic_update_slice(
                    k_win, k_rows[:, :, :, None, :].astype(k_win.dtype),
                    (0, 0, 0, k_idx, 0),
                )
                v_win = jax.lax.dynamic_update_slice(
                    v_win, v_rows[:, :, :, None, :].astype(v_win.dtype),
                    (0, 0, 0, k_idx, 0),
                )
            else:
                logits, k_cache, v_cache = forward_fn(
                    cfg, params, k_cache, v_cache, toks, meta,
                    attn_impl=attn_impl, mesh=mesh, head_mode=head_mode,
                )
            if greedy_fused:
                newtok = logits  # forward returned [S] token ids directly
            else:
                newtok = sample_logits(
                    logits, jax.random.fold_in(key, k_idx), state, **flags
                )
            if track_history:
                state = append_to_ring(state, newtok, valid)
            ctx = jnp.where(valid, ctx + 1, ctx)
            ys = (
                (newtok,) + token_logprobs(logits, newtok, logprobs_n)
                if logprobs_n >= 0 else newtok
            )
            if window_mode:
                return (k_cache, v_cache, newtok, ctx, state, k_win, v_win), ys
            return (k_cache, v_cache, newtok, ctx, state), ys

        if window_mode:
            init = (k_cache, v_cache, last_tokens, context_lens, samp,
                    k_win0, v_win0)
            (k_cache, v_cache, _, _, _, k_win, v_win), ys_seq = jax.lax.scan(
                substep, init, jnp.arange(num_steps, dtype=jnp.int32)
            )
            # One span commit per layer for the whole window.
            if mesh is not None:
                from nanovllm_tpu.ops.pallas.sharded import sharded_kv_window_commit

                def commit(l, caches):
                    kc, vc = caches
                    return sharded_kv_window_commit(
                        mesh,
                        jax.lax.dynamic_index_in_dim(k_win, l, 0, keepdims=False),
                        jax.lax.dynamic_index_in_dim(v_win, l, 0, keepdims=False),
                        kc, vc, l, block_tables, start_lens, seq_valid,
                        interpret=jax.default_backend() != "tpu",
                    )
            else:
                from nanovllm_tpu.ops.pallas.paged_attention import kv_window_commit

                def commit(l, caches):
                    kc, vc = caches
                    return kv_window_commit(
                        jax.lax.dynamic_index_in_dim(k_win, l, 0, keepdims=False),
                        jax.lax.dynamic_index_in_dim(v_win, l, 0, keepdims=False),
                        kc, vc, l, block_tables, start_lens, seq_valid,
                        interpret=jax.default_backend() != "tpu",
                    )

            k_cache, v_cache = jax.lax.fori_loop(
                0, cfg.num_hidden_layers, commit, (k_cache, v_cache)
            )
        else:
            init = (k_cache, v_cache, last_tokens, context_lens, samp)
            (k_cache, v_cache, *_), ys_seq = jax.lax.scan(
                substep, init, jnp.arange(num_steps, dtype=jnp.int32)
            )
        if logprobs_n >= 0:
            toks_seq, lp, tv, ti = ys_seq
            return toks_seq, (lp, tv, ti), k_cache, v_cache
        return ys_seq, None, k_cache, v_cache

    return jax.jit(fn, donate_argnums=(1, 2), static_argnames=("max_rem",))
