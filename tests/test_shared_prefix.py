"""Shared-prefix (cascade) decode attention kernels vs oracles (interpret
mode):

- shared_prefix_partial: one M = S*G flash pass over a common block list
  must equal the per-sequence partial kernel run on those same blocks.
- paged_attention_window with skip_blocks/init: splitting attention into
  (shared-prefix partial -> init state) + (per-seq tail from block `skip`)
  must equal the unsplit window kernel over the full history. This is the
  execution-strategy invariant the engine relies on: sharing is purely a
  performance transform (docs/performance.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from nanovllm_tpu.ops.attention import kv_cache_write
from nanovllm_tpu.ops.pallas.paged_attention import (
    paged_attention_decode_partial,
    paged_attention_window,
    shared_prefix_partial,
)

BS = 16
L = 2
Hq, Hkv, Dh = 8, 4, 128
G = Hq // Hkv


def _quant_tuple_cache(c, qdtype=jnp.int8):
    Lc, NB, Hk, BSc, Dhc = c.shape
    out = (jnp.zeros(c.shape, qdtype), jnp.zeros(c.shape[:-1], jnp.float32))
    slots = jnp.arange(NB * BSc, dtype=jnp.int32)
    for li in range(Lc):
        flat = jnp.swapaxes(c[li], 1, 2).reshape(NB * BSc, Hk, Dhc)
        out = kv_cache_write(out, flat, slots, li)
    return out


def _shared_case(seed=0, quantized=False):
    """Seqs 0..2 share block prefix [1, 2]; seq 3 is unshared.

    ctx lens: 40 (tail 1 block), 50 (tail 2 blocks), 33 (tail 1 row past
    the shared span), 20 (non-member). The window kernel reserves extra
    table entries past the history, mirroring the scheduler's window
    reservation."""
    rng = jax.random.PRNGKey(seed)
    NB, MAXBLK, S, W = 32, 6, 4, 4
    q = jax.random.normal(rng, (S, Hq, Dh), jnp.float32)
    k_new = jax.random.normal(jax.random.fold_in(rng, 1), (S, Hkv, Dh))
    v_new = jax.random.normal(jax.random.fold_in(rng, 2), (S, Hkv, Dh))
    kc = jax.random.normal(jax.random.fold_in(rng, 3), (L, NB, Hkv, BS, Dh))
    vc = jax.random.normal(jax.random.fold_in(rng, 4), (L, NB, Hkv, BS, Dh))
    k_st = jax.random.normal(jax.random.fold_in(rng, 5), (L, S, Hkv, W, Dh))
    v_st = jax.random.normal(jax.random.fold_in(rng, 6), (L, S, Hkv, W, Dh))
    bt = np.full((S, MAXBLK), -1, np.int32)
    bt[0] = [1, 2, 10, 11, -1, -1]
    bt[1] = [1, 2, 12, 13, 14, -1]
    bt[2] = [1, 2, 15, 16, -1, -1]
    bt[3] = [20, 21, 22, -1, -1, -1]
    ctx = jnp.asarray([40, 50, 33, 20], jnp.int32)
    if quantized:
        kc, vc = _quant_tuple_cache(kc), _quant_tuple_cache(vc)
    return q, k_new, v_new, k_st, v_st, kc, vc, jnp.asarray(bt), ctx


class TestSharedPrefixPartial:
    @pytest.mark.parametrize("quantized", [False, True])
    def test_matches_per_seq_partial(self, quantized):
        q, _, _, _, _, kc, vc, bt, ctx = _shared_case(seed=5, quantized=quantized)
        S = q.shape[0]
        scale = Dh ** -0.5
        shared_tables = jnp.asarray([1, 2, 0, 0], jnp.int32)  # padded to 4
        nsh = jnp.int32(2)
        acc, m, l = shared_prefix_partial(
            q, kc, vc, 1, shared_tables, nsh, scale=scale, interpret=True
        )
        # Oracle: the per-sequence partial kernel attending the same two
        # blocks for every sequence.
        per_seq_tables = jnp.tile(shared_tables[None, :2], (S, 1))
        kv_lens = jnp.full((S,), 2 * BS, jnp.int32)
        racc, rm, rl = paged_attention_decode_partial(
            q, kc, vc, 1, per_seq_tables, kv_lens, scale=scale, interpret=True
        )
        tol = 2e-4 if quantized else 2e-5
        np.testing.assert_allclose(
            np.asarray(acc).reshape(S, Hq, Dh), np.asarray(racc),
            rtol=tol, atol=tol,
        )
        np.testing.assert_allclose(
            np.asarray(m).reshape(S, Hq), np.asarray(rm), rtol=tol, atol=tol
        )
        np.testing.assert_allclose(
            np.asarray(l).reshape(S, Hq), np.asarray(rl), rtol=tol, atol=tol
        )


class TestWindowWithSharedInit:
    @pytest.mark.parametrize("quantized", [False, True])
    @pytest.mark.parametrize("substep", [0, 2])
    def test_split_equals_unsplit(self, quantized, substep):
        q, k_new, v_new, k_st, v_st, kc, vc, bt, ctx = _shared_case(
            seed=9, quantized=quantized
        )
        S = q.shape[0]
        scale = Dh ** -0.5
        start = jnp.maximum(ctx - 1, 0)
        sub = jnp.int32(substep)

        ref = paged_attention_window(
            q, k_new, v_new, k_st, v_st, kc, vc, jnp.int32(1), bt, start,
            sub, scale=scale, interpret=True,
        )

        shared_tables = jnp.asarray([1, 2], jnp.int32)
        nsh = jnp.int32(2)
        init = shared_prefix_partial(
            q, kc, vc, 1, shared_tables, nsh, scale=scale, interpret=True
        )
        skip = jnp.asarray([2, 2, 2, 0], jnp.int32)  # seq 3 not a member
        # max_rem: members have up to cdiv(49,16)-2 = 2 tail blocks; the
        # non-member iterates its full cdiv(19,16) = 2 blocks.
        got = paged_attention_window(
            q, k_new, v_new, k_st, v_st, kc, vc, jnp.int32(1), bt, start,
            sub, skip, init, scale=scale, max_rem=2, interpret=True,
        )
        tol = 2e-4 if quantized else 2e-5
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=tol, atol=tol
        )

    def test_history_entirely_shared(self):
        """A member whose committed history is exactly the shared span:
        zero tail blocks — the kernel must not re-attend anything."""
        q, k_new, v_new, k_st, v_st, kc, vc, bt, ctx = _shared_case(seed=13)
        # Make seq 2's history exactly two blocks (32 rows committed).
        ctx = jnp.asarray([40, 50, 33, 20], jnp.int32)
        start = jnp.asarray([39, 49, 32, 19], jnp.int32)
        scale = Dh ** -0.5
        sub = jnp.int32(1)
        ref = paged_attention_window(
            q, k_new, v_new, k_st, v_st, kc, vc, jnp.int32(1), bt, start,
            sub, scale=scale, interpret=True,
        )
        shared_tables = jnp.asarray([1, 2], jnp.int32)
        init = shared_prefix_partial(
            q, kc, vc, 1, shared_tables, jnp.int32(2), scale=scale,
            interpret=True,
        )
        skip = jnp.asarray([2, 2, 2, 0], jnp.int32)
        got = paged_attention_window(
            q, k_new, v_new, k_st, v_st, kc, vc, jnp.int32(1), bt, start,
            sub, skip, init, scale=scale, max_rem=2, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_engine_outputs_identical(self, tmp_path):
        """End-to-end: prompts with a long common prefix produce the SAME
        tokens with shared-prefix attention forced on vs off (f32, window
        mode, interpret kernels) — and the shared jit actually engages."""
        import json

        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        d = tmp_path / "m"
        d.mkdir()
        with open(d / "config.json", "w") as f:
            json.dump(dict(model_type="qwen3", vocab_size=512,
                           hidden_size=256, intermediate_size=512,
                           num_hidden_layers=2, num_attention_heads=8,
                           num_key_value_heads=4, head_dim=128,
                           tie_word_embeddings=True), f)
        system = "You are a helpful assistant. " * 3  # ~87 bytes ≈ 5 blocks
        prompts = [system + sfx for sfx in
                   ("What is the capital?", "Summarize the plot.",
                    "Name three colors.")]
        outs = {}
        for shared in (False, True):
            cfg = Config(model_path=str(d), dtype="float32",
                         kv_cache_dtype="int8", kvcache_block_size=16,
                         num_kvcache_blocks=64, max_model_len=256,
                         decode_window=4, use_pallas=True,
                         pallas_interpret=True,
                         shared_prefix_attention=shared)
            eng = LLMEngine(cfg, rng_seed=0)
            o = eng.generate(
                prompts,
                SamplingParams(temperature=0.0, max_tokens=10,
                               ignore_eos=True),
            )
            outs[shared] = [x.completion_token_ids for x in o]
            used_shared = any(k[3] for k in eng.model_runner._decode_fns)
            assert used_shared == shared, eng.model_runner._decode_fns.keys()
        assert outs[True] == outs[False]

    def test_engine_two_groups(self, tmp_path):
        """Two distinct system prompts in one batch: both groups cascade,
        outputs identical to cascade-off."""
        import json

        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        d = tmp_path / "m"
        d.mkdir()
        with open(d / "config.json", "w") as f:
            json.dump(dict(model_type="qwen3", vocab_size=512,
                           hidden_size=256, intermediate_size=512,
                           num_hidden_layers=1, num_attention_heads=8,
                           num_key_value_heads=4, head_dim=128,
                           tie_word_embeddings=True), f)
        sys_a = "Assistant persona alpha, always formal in tone. "
        sys_b = "Persona beta: casual, brief, playful answers ok. "
        prompts = [sys_a + "Hi", sys_a + "Name a fruit",
                   sys_b + "Hello", sys_b + "Count to three"]
        outs = {}
        for shared in (False, True):
            cfg = Config(model_path=str(d), dtype="float32",
                         kv_cache_dtype="int8", kvcache_block_size=16,
                         num_kvcache_blocks=64, max_model_len=128,
                         decode_window=4, use_pallas=True,
                         pallas_interpret=True,
                         shared_prefix_attention=shared)
            eng = LLMEngine(cfg, rng_seed=0)
            o = eng.generate(
                prompts,
                SamplingParams(temperature=0.0, max_tokens=6,
                               ignore_eos=True),
            )
            outs[shared] = [x.completion_token_ids for x in o]
        assert outs[True] == outs[False]

    def test_plan_multi_group(self):
        """Host-side group detection: two groups, per-group thresholds,
        full-committed-block cap, skip/group_id assignment."""
        from types import SimpleNamespace

        from nanovllm_tpu.engine.model_runner import ModelRunner

        def seq(bt, total):
            return SimpleNamespace(block_table=bt, total_len=lambda: total)

        fake = SimpleNamespace(
            config=SimpleNamespace(shared_prefix_attention="auto"),
            model_config=SimpleNamespace(sliding_window=None),
            attn_impl="pallas_decode", window_commit=True, block_size=16,
            MAX_SHARED_GROUPS=4,
        )
        # Group A: 3 members sharing 32 blocks (saved 64 >= threshold);
        # group B: 2 members sharing 40 (saved 40 < 64 -> dropped);
        # loner: no group.
        ga = list(range(100, 132))
        gb = list(range(200, 240))
        seqs = [
            seq(ga + [1], 32 * 16 + 5),
            seq(ga + [2], 32 * 16 + 9),
            seq(ga + [3, 4], 33 * 16 + 2),
            seq(gb + [5], 40 * 16 + 3),
            seq(gb + [6], 40 * 16 + 7),
            seq([7, 8], 20),
        ]
        use, st, nsh, gid, skip, max_rem = ModelRunner._shared_prefix_plan(
            fake, seqs, S=8, MAXBLK=64
        )
        assert use
        assert st.shape[0] == 1 and nsh.tolist() == [32]
        assert gid.tolist() == [0, 0, 0, -1, -1, -1, -1, -1]
        assert skip.tolist() == [32, 32, 32, 0, 0, 0, 0, 0]
        assert (st[0, :32] == np.asarray(ga)).all()
        # Forced mode (threshold 1): both groups selected, biggest first.
        fake.config.shared_prefix_attention = True
        use, st, nsh, gid, skip, max_rem = ModelRunner._shared_prefix_plan(
            fake, seqs, S=8, MAXBLK=64
        )
        assert use and st.shape[0] == 2
        assert nsh.tolist() == [32, 40]
        assert gid.tolist() == [0, 0, 0, 1, 1, -1, -1, -1]
        assert skip.tolist() == [32, 32, 32, 40, 40, 0, 0, 0]
        # max_rem covers the loner's full history (2 blocks).
        assert max_rem >= 2

    def test_plan_caps_at_committed_blocks(self):
        """A member whose committed history ends inside the shared span
        caps the group's lcp at its full-block count."""
        from types import SimpleNamespace

        from nanovllm_tpu.engine.model_runner import ModelRunner

        def seq(bt, total):
            return SimpleNamespace(block_table=bt, total_len=lambda: total)

        fake = SimpleNamespace(
            config=SimpleNamespace(shared_prefix_attention=True),
            model_config=SimpleNamespace(sliding_window=None),
            attn_impl="pallas_decode", window_commit=True, block_size=16,
            MAX_SHARED_GROUPS=4,
        )
        shared = [10, 11, 12, 13]
        seqs = [
            seq(shared + [1], 4 * 16 + 8),
            # committed start = 2*16+3 -> only 2 FULL blocks committed
            seq(shared + [2], 2 * 16 + 4),
        ]
        use, st, nsh, gid, skip, max_rem = ModelRunner._shared_prefix_plan(
            fake, seqs, S=2, MAXBLK=8
        )
        assert use and nsh.tolist() == [2]
        assert skip.tolist() == [2, 2]

    def test_plain_call_unchanged(self):
        """No skip/init arguments -> identical to the historical behavior
        (regression guard for the signature extension)."""
        q, k_new, v_new, k_st, v_st, kc, vc, bt, ctx = _shared_case(seed=17)
        scale = Dh ** -0.5
        start = jnp.maximum(ctx - 1, 0)
        a = paged_attention_window(
            q, k_new, v_new, k_st, v_st, kc, vc, jnp.int32(0), bt, start,
            jnp.int32(0), scale=scale, interpret=True,
        )
        b = paged_attention_window(
            q, k_new, v_new, k_st, v_st, kc, vc, jnp.int32(0), bt, start,
            jnp.int32(0), jnp.zeros((4,), jnp.int32), None,
            scale=scale, max_rem=bt.shape[1], interpret=True,
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
