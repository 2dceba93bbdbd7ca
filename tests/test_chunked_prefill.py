"""Chunked prefill: prompts whose remainder exceeds max_num_batched_tokens
are processed in block-aligned chunks across steps. Purely an execution
strategy — outputs must equal the unchunked engine's — with the per-step
token budget actually enforced (the old path admitted one oversized
dispatch)."""

import json

import numpy as np
import pytest

from nanovllm_tpu import Config, SamplingParams
from nanovllm_tpu.engine.llm_engine import LLMEngine

TINY = dict(
    model_type="qwen3", vocab_size=256, hidden_size=64,
    intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, head_dim=16, max_position_embeddings=1024,
    tie_word_embeddings=False, eos_token_id=None,
)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from nanovllm_tpu.models.qwen3 import Qwen3Config, init_params
    from nanovllm_tpu.utils.loader import save_qwen3_weights_hf

    d = tmp_path_factory.mktemp("chunked_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    cfg = Qwen3Config.from_hf(TINY)
    save_qwen3_weights_hf(init_params(cfg, jax.random.PRNGKey(7), jnp.float32),
                          cfg, str(d))
    return str(d)


def _engine(model_dir, budget, **kw):
    cfg = dict(
        model_path=model_dir, dtype="float32", kvcache_block_size=16,
        num_kvcache_blocks=96, max_num_seqs=8,
        max_num_batched_tokens=budget, max_model_len=512, decode_window=4,
    )
    cfg.update(kw)
    return LLMEngine(Config(**cfg))


def _run(engine, prompts, n_new=8):
    params = SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True)
    seqs = [engine.add_request("", params) for _ in prompts]
    for s, ids in zip(seqs, prompts):
        s.token_ids = list(ids)
        s.num_prompt_tokens = s.num_tokens = len(ids)
    while not engine.is_finished():
        engine.step()
    return [s.completion_token_ids for s in seqs]


def test_long_prompt_chunks_and_matches_unchunked(model_dir):
    rng = np.random.RandomState(0)
    prompt = rng.randint(0, 256, size=200).tolist()  # 200 >> budget 64

    big = _engine(model_dir, budget=4096)
    ref = _run(big, [prompt])

    small = _engine(model_dir, budget=64)
    got = _run(small, [prompt])
    assert got == ref
    # It actually chunked: several prefill batches, none over budget.
    st = small.get_stats().scheduler
    assert st.num_prefill_batches >= 3, st.num_prefill_batches
    mem = small.get_stats().scheduler.block_manager
    assert mem.free_blocks == mem.total_blocks


def test_chunking_disabled_single_dispatch(model_dir):
    rng = np.random.RandomState(1)
    prompt = rng.randint(0, 256, size=150).tolist()
    eng = _engine(model_dir, budget=64, enable_chunked_prefill=False)
    ref = _run(_engine(model_dir, budget=4096), [prompt])
    assert _run(eng, [prompt]) == ref
    assert eng.get_stats().scheduler.num_prefill_batches == 1


def test_staggered_identical_prompts_no_poisoning(model_dir):
    """The second identical request arrives while the first is mid-prefill:
    it must not cache-hit blocks whose KV is not yet committed, and both
    outputs must equal the unchunked reference."""
    rng = np.random.RandomState(2)
    prompt = rng.randint(0, 256, size=180).tolist()
    ref = _run(_engine(model_dir, budget=4096), [prompt])

    eng = _engine(model_dir, budget=64)
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    s1 = eng.add_request("", params)
    s1.token_ids = list(prompt)
    s1.num_prompt_tokens = s1.num_tokens = len(prompt)
    eng.step()  # first chunk of s1 dispatched
    s2 = eng.add_request("", params)
    s2.token_ids = list(prompt)
    s2.num_prompt_tokens = s2.num_tokens = len(prompt)
    while not eng.is_finished():
        eng.step()
    assert s1.completion_token_ids == ref[0]
    assert s2.completion_token_ids == ref[0]


def test_decode_progresses_between_chunks(model_dir):
    """A running decode sequence keeps producing tokens while a long prompt
    prefills in chunks (per-step prefill work is bounded)."""
    rng = np.random.RandomState(3)
    short = rng.randint(0, 256, size=20).tolist()
    long_p = rng.randint(0, 256, size=200).tolist()
    ref = _run(_engine(model_dir, budget=4096), [short, long_p], n_new=12)

    eng = _engine(model_dir, budget=64)
    got = _run(eng, [short, long_p], n_new=12)
    assert got == ref


def test_abort_mid_prefill_frees_blocks(model_dir):
    rng = np.random.RandomState(4)
    prompt = rng.randint(0, 256, size=200).tolist()
    eng = _engine(model_dir, budget=64)
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    seq = eng.add_request("", params)
    seq.token_ids = list(prompt)
    seq.num_prompt_tokens = seq.num_tokens = len(prompt)
    eng.step()  # first chunk in flight
    assert eng.abort_request(seq.seq_id)
    while eng.has_unfinished():
        eng.step()
    eng.shutdown()
    mem = eng.get_stats().scheduler.block_manager
    assert mem.free_blocks == mem.total_blocks
