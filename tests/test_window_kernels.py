"""Window-mode decode kernels vs jnp oracles (interpret mode):
- paged_attention_decode_partial: history-only flash state (acc, m, l)
  must normalize to the oracle's attention over the committed prefix.
- kv_window_commit: committing a K-row span must equal K sequential
  per-row jnp writes, for plain and quantized (tuple) caches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from nanovllm_tpu.ops.attention import kv_cache_write, paged_attention_ref
from nanovllm_tpu.ops.pallas.paged_attention import (
    kv_window_commit,
    paged_attention_decode_partial,
)
from nanovllm_tpu.utils.metadata import AttentionMetadata

BS = 16


def _case(seed=0, S=4, Hq=8, Hkv=4, Dh=128, NB=32, MAXBLK=4,
          kv_lens=(5, 16, 33, 0), dtype=jnp.float32):
    rng = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(rng, 3)
    L = 2
    q = jax.random.normal(kq, (S, Hq, Dh), dtype)
    k_cache = jax.random.normal(kk, (L, NB, Hkv, BS, Dh), dtype)
    v_cache = jax.random.normal(kv, (L, NB, Hkv, BS, Dh), dtype)
    block_tables = np.full((S, MAXBLK), -1, np.int32)
    nxt = 1
    for i, c in enumerate(kv_lens):
        # Reserve an extra block beyond the history for window commits.
        nb = max(1, -(-c // BS)) + 2
        block_tables[i, :min(nb, MAXBLK)] = range(nxt, nxt + min(nb, MAXBLK))
        nxt += nb
    return q, k_cache, v_cache, jnp.asarray(block_tables), jnp.asarray(kv_lens, jnp.int32)


class TestPartialAttention:
    @pytest.mark.parametrize("kv_lens", [(5, 16, 33, 0), (1, 64, 17, 32)])
    def test_matches_history_oracle(self, kv_lens):
        q, kc, vc, bt, kl = _case(kv_lens=kv_lens)
        S, Hq, Dh = q.shape
        scale = Dh ** -0.5
        acc, m, l = paged_attention_decode_partial(
            q, kc, vc, 1, bt, kl, scale=scale, interpret=True
        )
        # Oracle: ref attention with q at position kv_len (sees 0..kv_len-1).
        rows = jnp.arange(S, dtype=jnp.int32)
        meta = AttentionMetadata(
            slot_mapping=jnp.full((S,), -1, jnp.int32),
            positions=kl,
            token_seq=rows,
            token_qcol=jnp.zeros((S,), jnp.int32),
            block_tables=bt,
            context_lens=kl,
            logits_idx=rows,
            q_gather=rows[:, None],
            q_positions=kl[:, None],
        )
        ref = paged_attention_ref(q, kc, vc, 1, meta, scale)
        out = np.asarray(acc) / np.maximum(np.asarray(l)[..., None], 1e-30)
        for i, c in enumerate(kv_lens):
            if c == 0:
                assert np.asarray(l)[i].max() == 0.0  # empty history
            else:
                np.testing.assert_allclose(
                    out[i], np.asarray(ref, np.float32)[i], rtol=2e-5, atol=2e-5
                )

    def test_quantized_tuple_cache(self):
        q, kc, vc, bt, kl = _case(seed=3, kv_lens=(5, 16, 33, 1))
        L, NB, Hkv, _, Dh = kc.shape
        # Convert to valid int8 tuple caches via the jnp writer.
        def to_tuple(c):
            out = (jnp.zeros(c.shape, jnp.int8), jnp.zeros(c.shape[:-1], jnp.float32))
            slots = jnp.arange(NB * BS, dtype=jnp.int32)
            for li in range(L):
                flat = jnp.swapaxes(c[li], 1, 2).reshape(NB * BS, Hkv, Dh)
                out = kv_cache_write(out, flat, slots, li)
            return out
        kct, vct = to_tuple(kc), to_tuple(vc)
        scale = Dh ** -0.5
        acc, m, l = paged_attention_decode_partial(
            q, kct, vct, 1, bt, kl, scale=scale, interpret=True
        )
        rows = jnp.arange(q.shape[0], dtype=jnp.int32)
        meta = AttentionMetadata(
            slot_mapping=jnp.full((q.shape[0],), -1, jnp.int32),
            positions=kl, token_seq=rows,
            token_qcol=jnp.zeros_like(rows), block_tables=bt,
            context_lens=kl, logits_idx=rows, q_gather=rows[:, None],
            q_positions=kl[:, None],
        )
        ref = paged_attention_ref(q, kct, vct, 1, meta, scale)
        out = np.asarray(acc) / np.maximum(np.asarray(l)[..., None], 1e-30)
        for i, c in enumerate((5, 16, 33, 1)):
            np.testing.assert_allclose(
                out[i], np.asarray(ref, np.float32)[i], rtol=2e-4, atol=2e-4
            )


class TestWindowCommit:
    @pytest.mark.parametrize("W,starts", [
        (4, (5, 15, 32, 0)),     # in-block, boundary-crossing, aligned, zero
        (8, (1, 9, 23, 40)),
    ])
    def test_matches_sequential_rows(self, W, starts):
        rng = jax.random.PRNGKey(7)
        S, Hkv, Dh, NB, L = 4, 4, 128, 32, 2
        k_win = jax.random.normal(rng, (S, Hkv, W, Dh), jnp.float32)
        v_win = jax.random.normal(jax.random.fold_in(rng, 1), (S, Hkv, W, Dh), jnp.float32)
        kc = jax.random.normal(jax.random.fold_in(rng, 2), (L, NB, Hkv, BS, Dh), jnp.float32)
        vc = jax.random.normal(jax.random.fold_in(rng, 3), (L, NB, Hkv, BS, Dh), jnp.float32)
        bt = np.full((S, 6), -1, np.int32)
        nxt = 1
        for i, st in enumerate(starts):
            nb = (st + W - 1) // BS + 1
            bt[i, :nb] = range(nxt, nxt + nb)
            nxt += nb
        bt = jnp.asarray(bt)
        start = jnp.asarray(starts, jnp.int32)
        valid = jnp.asarray([1, 1, 1, 0], jnp.int32)  # last row skipped

        # Oracle: W sequential per-row jnp writes for valid rows.
        ref_kc, ref_vc = kc, vc
        for w in range(W):
            pos = start + w
            blk = jnp.take_along_axis(bt, (pos // BS)[:, None], axis=1)[:, 0]
            slots = jnp.where(valid > 0, blk * BS + pos % BS, -1)
            ref_kc = kv_cache_write(ref_kc, k_win[:, :, w, :], slots, 1)
            ref_vc = kv_cache_write(ref_vc, v_win[:, :, w, :], slots, 1)

        got_kc, got_vc = kv_window_commit(
            k_win, v_win, kc, vc, 1, bt, start, valid, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got_kc), np.asarray(ref_kc))
        np.testing.assert_array_equal(np.asarray(got_vc), np.asarray(ref_vc))

    @pytest.mark.parametrize("qdtype", [jnp.int8, jnp.float8_e4m3fn])
    def test_quantized_matches_sequential_rows(self, qdtype):
        rng = jax.random.PRNGKey(11)
        S, Hkv, Dh, NB, L, W = 4, 4, 128, 32, 2, 4
        starts = (5, 15, 32, 7)
        k_win = jax.random.normal(rng, (S, Hkv, W, Dh), jnp.float32)
        v_win = jax.random.normal(jax.random.fold_in(rng, 1), (S, Hkv, W, Dh), jnp.float32)
        shape = (L, NB, Hkv, BS, Dh)
        kc = (jnp.zeros(shape, qdtype), jnp.zeros(shape[:-1], jnp.float32))
        vc = (jnp.zeros(shape, qdtype), jnp.zeros(shape[:-1], jnp.float32))
        bt = np.full((S, 6), -1, np.int32)
        nxt = 1
        for i, st in enumerate(starts):
            nb = (st + W - 1) // BS + 1
            bt[i, :nb] = range(nxt, nxt + nb)
            nxt += nb
        bt = jnp.asarray(bt)
        start = jnp.asarray(starts, jnp.int32)
        valid = jnp.ones((S,), jnp.int32)

        ref_kc, ref_vc = kc, vc
        for w in range(W):
            pos = start + w
            blk = jnp.take_along_axis(bt, (pos // BS)[:, None], axis=1)[:, 0]
            slots = blk * BS + pos % BS
            ref_kc = kv_cache_write(ref_kc, k_win[:, :, w, :], slots, 1)
            ref_vc = kv_cache_write(ref_vc, v_win[:, :, w, :], slots, 1)

        got_kc, got_vc = kv_window_commit(
            k_win, v_win, kc, vc, 1, bt, start, valid, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(got_kc[0], np.float32), np.asarray(ref_kc[0], np.float32)
        )
        np.testing.assert_allclose(
            np.asarray(got_kc[1]), np.asarray(ref_kc[1]), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(got_vc[0], np.float32), np.asarray(ref_vc[0], np.float32)
        )
