"""Kernel-vs-jnp equivalence tests (SURVEY §4: Pallas vs jnp oracles).

Kernels run in interpret mode on CPU; the same call sites compile natively
on TPU. Shapes mirror real decode batches: GQA, ragged context lengths,
padded rows and padded block-table entries. The decode kernel fuses the
KV-cache write, so the oracle is (jnp kv_cache_write; then gather ref
attention) and both the attention output AND the updated caches must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu.ops.attention import kv_cache_write, paged_attention_ref
from nanovllm_tpu.ops.pallas.paged_attention import (
    kv_cache_commit,
    paged_attention_decode,
)
from nanovllm_tpu.utils.metadata import AttentionMetadata


def _make_decode_case(seed=0, S=4, Hq=8, Hkv=4, Dh=128, BS=16, NB=32, MAXBLK=4,
                      ctx_lens=(1, 17, 33, 0), dtype=jnp.float32):
    """Random caches + per-seq block tables with ragged context lengths.
    ctx_lens[i] includes this step's token; 0 marks a padded row."""
    rng = jax.random.PRNGKey(seed)
    kq, kk, kv, kkn, kvn = jax.random.split(rng, 5)
    L = 2
    layer = 1
    q = jax.random.normal(kq, (S, Hq, Dh), dtype)
    k_cache = jax.random.normal(kk, (L, NB, Hkv, BS, Dh), dtype)
    v_cache = jax.random.normal(kv, (L, NB, Hkv, BS, Dh), dtype)
    k_new = jax.random.normal(kkn, (S, Hkv, Dh), dtype)
    v_new = jax.random.normal(kvn, (S, Hkv, Dh), dtype)

    block_tables = np.full((S, MAXBLK), -1, np.int32)
    next_blk = 1
    for i, c in enumerate(ctx_lens):
        nb = -(-c // BS)
        block_tables[i, :nb] = range(next_blk, next_blk + nb)
        next_blk += nb
    context_lens = np.asarray(ctx_lens, np.int32)
    return (q, k_new, v_new, k_cache, v_cache, layer,
            jnp.asarray(block_tables), jnp.asarray(context_lens))


def _ref_decode(q, k_new, v_new, k_cache, v_cache, layer, block_tables,
                context_lens, scale, block_size):
    """jnp oracle: scatter this step's K/V, then gather-attend."""
    S = q.shape[0]
    rows = jnp.arange(S, dtype=jnp.int32)
    valid = context_lens > 0
    pos = jnp.maximum(context_lens - 1, 0)
    blk = jnp.take_along_axis(
        block_tables, (pos // block_size)[:, None], axis=1
    )[:, 0]
    slots = jnp.where(valid, blk * block_size + pos % block_size, -1)
    k_cache = kv_cache_write(k_cache, k_new, slots, layer)
    v_cache = kv_cache_write(v_cache, v_new, slots, layer)
    meta = AttentionMetadata(
        slot_mapping=slots,
        positions=pos,
        token_seq=rows,
        token_qcol=jnp.zeros((S,), jnp.int32),
        block_tables=block_tables,
        context_lens=context_lens,
        logits_idx=rows,
        q_gather=rows[:, None],
        q_positions=jnp.where(valid, context_lens - 1, -1)[:, None],
    )
    out = paged_attention_ref(q, k_cache, v_cache, layer, meta, scale)
    return out, k_cache, v_cache


def _check(case, scale=None, BS=16, out_tol=2e-5, cache_exact=True):
    q, k_new, v_new, kc, vc, layer, bt, cl = case
    scale = scale or q.shape[-1] ** -0.5
    ref_out, ref_kc, ref_vc = _ref_decode(
        q, k_new, v_new, kc, vc, layer, bt, cl, scale, BS
    )
    got_out = paged_attention_decode(
        q, k_new, v_new, kc, vc, layer, bt, cl, scale=scale, interpret=True
    )
    got_kc, got_vc = kv_cache_commit(
        k_new, v_new, kc, vc, layer, bt, cl, interpret=True
    )
    if cache_exact:
        np.testing.assert_array_equal(np.asarray(got_kc), np.asarray(ref_kc))
        np.testing.assert_array_equal(np.asarray(got_vc), np.asarray(ref_vc))
    ctx = np.asarray(cl)
    for i in range(q.shape[0]):
        if ctx[i] == 0:
            assert np.abs(np.asarray(got_out)[i]).max() == 0.0
        else:
            np.testing.assert_allclose(
                np.asarray(got_out, np.float32)[i],
                np.asarray(ref_out, np.float32)[i],
                rtol=out_tol, atol=out_tol,
            )


class TestPagedAttentionDecode:
    @pytest.mark.parametrize("ctx_lens", [(1, 17, 33, 0), (16, 16, 16, 16), (5, 0, 0, 0)])
    def test_matches_ref(self, ctx_lens):
        _check(_make_decode_case(ctx_lens=ctx_lens))

    def test_gqa_grouping(self):
        """Each query head must attend its own kv head (Hq=8 over Hkv=2)."""
        _check(_make_decode_case(seed=3, Hq=8, Hkv=2, ctx_lens=(20, 40, 7, 64)), scale=0.125)

    def test_wide_streaming(self):
        """MAXBLK > width forces multiple wide iterations per sequence."""
        _check(_make_decode_case(
            seed=5, MAXBLK=16, NB=80, ctx_lens=(255, 256, 129, 1)
        ))

    def test_bf16_cache(self):
        _check(
            _make_decode_case(seed=4, dtype=jnp.bfloat16, ctx_lens=(1, 17, 33, 64)),
            scale=0.1, out_tol=2e-2,
        )

    def test_write_targets_only_own_slot(self):
        """The fused write must touch exactly one (layer, block, offset) row
        per valid sequence and nothing else."""
        q, k_new, v_new, kc, vc, layer, bt, cl = _make_decode_case(
            seed=6, ctx_lens=(1, 17, 33, 0)
        )
        kc_before = np.asarray(kc)  # snapshot: the commit donates kc
        got_kc, _ = kv_cache_commit(
            k_new, v_new, kc, vc, layer, bt, cl, interpret=True
        )
        diff = np.asarray(got_kc) != kc_before
        # Changed rows: for each valid seq, (layer, blk, :, off, :).
        changed = set(zip(*np.nonzero(diff.any(axis=(2, 4)))))
        expect = set()
        BS = 16
        for i, c in enumerate((1, 17, 33, 0)):
            if c == 0:
                continue
            pos = c - 1
            expect.add((layer, int(np.asarray(bt)[i, pos // BS]), pos % BS))
        assert changed <= expect  # identical values may produce no diff
