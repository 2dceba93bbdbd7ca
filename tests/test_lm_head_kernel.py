"""Fused lm_head+argmax kernel vs the jnp oracle (interpret mode), and the
head_mode="greedy" forward contract.

Greedy decode never reads the logits — only their argmax (reference:
src/layers/sampler.rs:109-112 argmaxing what embed_head.rs:292-306
produced). The fused kernel must match jnp.argmax(logits) EXACTLY,
including first-index tie-breaking, for both plain bf16 heads and the
INT8 per-vocab-row quantized head.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu.ops.pallas.lm_head import fused_greedy_head


def _oracle(x, w, scale=None):
    acc = jax.lax.dot_general(
        x, w.astype(x.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale is not None:
        acc = acc * scale[None, :]
    return jnp.argmax(acc, axis=-1).astype(jnp.int32)


class TestFusedGreedyHead:
    @pytest.mark.parametrize("V", [1000, 1024])  # ragged tail and exact fit
    @pytest.mark.parametrize("S", [1, 5, 16])
    def test_int8_scaled_matches_oracle(self, S, V):
        rng = np.random.default_rng(S * 7 + V)
        D = 256
        x = jnp.asarray(rng.standard_normal((S, D)), jnp.bfloat16)
        w = jnp.asarray(rng.integers(-127, 128, (V, D)), jnp.int8)
        sc = jnp.asarray(rng.uniform(0.5, 2.0, (V,)), jnp.float32)
        got = fused_greedy_head(x, w, sc, tile_v=256, interpret=True)
        want = _oracle(x, w, sc)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_bf16_matches_oracle(self):
        rng = np.random.default_rng(3)
        S, D, V = 8, 128, 700
        x = jnp.asarray(rng.standard_normal((S, D)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((V, D)), jnp.bfloat16)
        got = fused_greedy_head(x, w, None, tile_v=256, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(_oracle(x, w)))

    def test_cross_tile_tie_takes_first_index(self):
        """Duplicate the argmax row into a LATER vocab tile: the kernel's
        strictly-greater cross-tile displacement must keep the first."""
        rng = np.random.default_rng(11)
        D, V = 128, 700
        w = jnp.asarray(rng.standard_normal((V, D)), jnp.bfloat16)
        w = w.at[650].set(w[7])  # tiles of 256: rows 7 and 650 tie
        x = w[7][None, :]  # query equal to the duplicated row -> it is argmax
        got = fused_greedy_head(x, w, None, tile_v=256, interpret=True)
        assert int(got[0]) == 7

    def test_within_tile_tie_takes_first_index(self):
        rng = np.random.default_rng(12)
        D, V = 128, 512
        w = jnp.asarray(rng.standard_normal((V, D)), jnp.bfloat16)
        w = w.at[40].set(w[9])  # same tile of 256
        x = w[9][None, :]
        got = fused_greedy_head(x, w, None, tile_v=256, interpret=True)
        assert int(got[0]) == 9


class TestGreedyHeadForward:
    def test_forward_greedy_equals_argmax_of_logits(self):
        """forward(head_mode='greedy') must return exactly
        argmax(forward(head_mode='logits')) — same params, same metadata."""
        from nanovllm_tpu.models.qwen3 import Qwen3Config, forward, init_params
        from nanovllm_tpu.utils.metadata import AttentionMetadata

        cfg = Qwen3Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=64, rms_norm_eps=1e-6,
            rope_theta=10000.0, tie_word_embeddings=True,
        )
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        S, BS, NB = 2, 16, 8
        kc = jnp.zeros((cfg.num_hidden_layers, NB, cfg.num_key_value_heads,
                        BS, cfg.head_dim), jnp.float32)
        vc = jnp.zeros_like(kc)
        toks = jnp.asarray([3, 5, 7, 11, 2, 4], jnp.int32)
        seq = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32)
        pos = jnp.asarray([0, 1, 2, 0, 1, 2], jnp.int32)
        bt = jnp.asarray([[1, -1], [2, -1]], jnp.int32)
        meta = AttentionMetadata(
            slot_mapping=bt[seq, 0] * BS + pos,
            positions=pos,
            token_seq=seq,
            token_qcol=pos,
            block_tables=bt,
            context_lens=jnp.asarray([3, 3], jnp.int32),
            logits_idx=jnp.asarray([2, 5], jnp.int32),
            q_gather=jnp.stack([jnp.arange(3), jnp.arange(3, 6)]),
            q_positions=jnp.stack([pos[:3], pos[3:]]),
        )
        logits, _, _ = forward(cfg, params, kc, vc, toks, meta)
        toks_g, _, _ = forward(cfg, params, kc, vc, toks, meta,
                               head_mode="greedy")
        np.testing.assert_array_equal(
            np.asarray(toks_g), np.asarray(jnp.argmax(logits, axis=-1))
        )
