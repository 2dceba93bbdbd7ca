"""N-gram (prompt-lookup) speculative decoding: exactness and integration.

Greedy speculative decoding must be a pure execution strategy — outputs are
token-for-token identical to non-speculative greedy decode for any prompt,
any acceptance pattern, any stop condition. No reference counterpart (the
reference has no speculative path); this is beyond-parity capability.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu import Config, SamplingParams
from nanovllm_tpu.engine.llm_engine import LLMEngine

TINY = dict(
    model_type="qwen3",
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    max_position_embeddings=512,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    tie_word_embeddings=False,
    eos_token_id=None,
)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from nanovllm_tpu.models.qwen3 import Qwen3Config, init_params
    from nanovllm_tpu.utils.loader import save_qwen3_weights_hf

    d = tmp_path_factory.mktemp("spec_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    cfg = Qwen3Config.from_hf(TINY)
    params = init_params(cfg, jax.random.PRNGKey(42), jnp.float32)
    save_qwen3_weights_hf(params, cfg, str(d))
    return str(d)


def mkengine(model_dir, **kw):
    defaults = dict(
        model_path=model_dir,
        device="cpu",
        dtype="float32",
        kvcache_block_size=16,
        num_kvcache_blocks=96,
        max_num_seqs=8,
        max_num_batched_tokens=512,
        max_model_len=256,
    )
    defaults.update(kw)
    return LLMEngine(Config(**defaults))


GREEDY = SamplingParams(temperature=0.0, max_tokens=24)

PROMPTS = [
    "hello world hello world hello world",  # repetitive: proposals hit
    "the quick brown fox",
    "aaaa bbbb aaaa bbbb aaaa",
    "x",  # shorter than any n-gram
]


def _texts(outs):
    return [(o.token_ids, o.finish_reason) for o in outs]


@pytest.mark.parametrize("spec_k,ngram_n,window", [(3, 2, 2), (2, 3, 4), (4, 1, 1)])
def test_spec_matches_plain_greedy(model_dir, spec_k, ngram_n, window):
    plain = mkengine(model_dir, decode_window=window)
    want = _texts(plain.generate(PROMPTS, GREEDY))
    plain.shutdown()

    spec = mkengine(
        model_dir,
        decode_window=window,
        speculative_num_tokens=spec_k,
        speculative_ngram_n=ngram_n,
    )
    got = _texts(spec.generate(PROMPTS, GREEDY))
    assert got == want
    # The speculative path actually ran (eligible greedy batch).
    assert spec.model_runner.spec_iterations > 0
    spec.shutdown()


def test_spec_respects_max_tokens_and_stop_ids(model_dir):
    spec = mkengine(model_dir, speculative_num_tokens=3, decode_window=4)
    plain = mkengine(model_dir, decode_window=4)
    for params in (
        SamplingParams(temperature=0.0, max_tokens=5),
        SamplingParams(temperature=0.0, max_tokens=40),
    ):
        got = spec.generate(["hello hello hello hello"], params)[0]
        want = plain.generate(["hello hello hello hello"], params)[0]
        assert got.token_ids == want.token_ids
        assert got.finish_reason == want.finish_reason
        assert got.num_completion_tokens <= params.max_tokens
    # stop_token_ids truncate mid-window: pick a token the plain run emits.
    ref = plain.generate(["hello hello hello hello"], GREEDY)[0]
    stop_tok = ref.token_ids[ref.num_prompt_tokens + 3]
    params = SamplingParams(
        temperature=0.0, max_tokens=24, stop_token_ids=[int(stop_tok)]
    )
    got = spec.generate(["hello hello hello hello"], params)[0]
    want = plain.generate(["hello hello hello hello"], params)[0]
    assert got.token_ids == want.token_ids
    assert got.finish_reason == want.finish_reason
    spec.shutdown()
    plain.shutdown()


def test_spec_prefix_cache_stays_valid(model_dir):
    """A speculative window writes provisional KV at rejected positions;
    none of it may ever become a committed prefix-cache identity. A second
    identical prompt must prefix-hit AND still decode identically."""
    eng = mkengine(model_dir, speculative_num_tokens=3, decode_window=4)
    first = eng.generate(["hello world hello world hello world"], GREEDY)[0]
    second = eng.generate(["hello world hello world hello world"], GREEDY)[0]
    assert second.token_ids == first.token_ids
    st = eng.get_stats()
    assert st.block_manager.cache_hits > 0  # the rerun actually hit
    eng.shutdown()


def test_spec_falls_back_for_ineligible_batches(model_dir):
    eng = mkengine(model_dir, speculative_num_tokens=3)
    # Sampled (non-greedy) requests must take the normal window.
    outs = eng.generate(
        ["hello world"], SamplingParams(temperature=0.8, max_tokens=8, seed=7)
    )
    assert outs[0].num_completion_tokens == 8
    assert eng.model_runner.spec_iterations == 0
    # Logprobs requests too (the fused greedy verify has no logits).
    outs = eng.generate(
        ["hello world"],
        SamplingParams(temperature=0.0, max_tokens=8, logprobs=2),
    )
    assert len(outs[0].logprobs) == 8
    assert eng.model_runner.spec_iterations == 0
    # A plain greedy request afterwards speculates again.
    eng.generate(["hello world"], GREEDY)
    assert eng.model_runner.spec_iterations > 0
    eng.shutdown()


def test_spec_mixed_batch_lengths(model_dir):
    """Sequences finishing at different times inside speculative windows:
    per-row acceptance diverges, zombie iterations are discarded."""
    plain = mkengine(model_dir, decode_window=3)
    spec = mkengine(model_dir, speculative_num_tokens=2, decode_window=3)
    prompts = PROMPTS[:3]
    params = [
        SamplingParams(temperature=0.0, max_tokens=m) for m in (3, 17, 9)
    ]
    want = _texts(plain.generate(prompts, params))
    got = _texts(spec.generate(prompts, params))
    assert got == want
    plain.shutdown()
    spec.shutdown()


def test_spec_quantized_kv(model_dir):
    """Speculative verify must honor quantized tuple caches (scatter writes
    per-row scales; the oracle dequantizes on read)."""
    plain = mkengine(model_dir, kv_cache_dtype="int8", decode_window=2)
    spec = mkengine(
        model_dir, kv_cache_dtype="int8", speculative_num_tokens=3,
        decode_window=2,
    )
    want = _texts(plain.generate(PROMPTS[:2], GREEDY))
    got = _texts(spec.generate(PROMPTS[:2], GREEDY))
    assert got == want
    plain.shutdown()
    spec.shutdown()


def test_proposer_copies_ngram_continuation():
    """Unit-test the on-device prompt-lookup proposer directly."""
    from nanovllm_tpu.engine.step_fn import ngram_propose

    def run(ids, n, k, tbuf=64):
        buf = np.full((1, tbuf), -1, np.int32)
        buf[0, : len(ids)] = ids
        ctx = np.array([len(ids)], np.int32)
        last = np.array([ids[-1]], np.int32)
        return np.asarray(ngram_propose(buf, ctx, last, n, k))[0].tolist()

    # Tail (10, 20) occurred at position 0; continuation is 30 40 50.
    assert run([10, 20, 30, 40, 50, 10, 20], 2, 3) == [30, 40, 50]
    # Most RECENT earlier match wins: both pos 0 and pos 4 match (7, 8);
    # pos 4's continuation (6) is proposed; its own continuation runs past
    # ctx after one token, so the rest falls back to last (8).
    assert run([7, 8, 9, 1, 7, 8, 6, 7, 8], 2, 3) == [6, 7, 8]
    # No earlier occurrence: repeat last.
    assert run([1, 2, 3, 4, 5], 2, 2) == [5, 5]
    # Context shorter than the n-gram: repeat last.
    assert run([3], 2, 2) == [3, 3]
    # Unigram lookup (n=1): last token 2 seen earlier at pos 1, continue 9.
    assert run([5, 2, 9, 4, 2], 1, 2) == [9, 4]
    # Batch independence: two rows with different matches.
    buf = np.full((2, 32), -1, np.int32)
    buf[0, :7] = [10, 20, 30, 40, 50, 10, 20]
    buf[1, :5] = [1, 2, 3, 4, 5]
    ctx = np.array([7, 5], np.int32)
    last = np.array([20, 5], np.int32)
    out = np.asarray(ngram_propose(buf, ctx, last, 2, 2))
    assert out[0].tolist() == [30, 40]
    assert out[1].tolist() == [5, 5]
