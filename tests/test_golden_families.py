"""Golden numerics for the non-Qwen3 model families (Llama, Qwen2): logits
and greedy decodes match HF transformers on tiny random-weight models."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

TINY = dict(
    vocab_size=384, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=512, rms_norm_eps=1e-6, rope_theta=10000.0,
    tie_word_embeddings=False,
)


def _save(tmp_path, hf_cls, cfg_cls, model_type, **extra):
    d = tmp_path / model_type
    cfg = cfg_cls(**TINY, **extra)
    torch.manual_seed(0)
    model = hf_cls(cfg).to(torch.float32).eval()
    model.save_pretrained(d, safe_serialization=True)
    with open(d / "config.json") as f:
        saved = json.load(f)
    saved["model_type"] = model_type
    with open(d / "config.json", "w") as f:
        json.dump(saved, f)
    return str(d), model


def _greedy_ours(model_dir, prompt_ids, n_new):
    from nanovllm_tpu import Config, SamplingParams
    from nanovllm_tpu.engine.llm_engine import LLMEngine

    cfg = Config(model_path=model_dir, dtype="float32", kvcache_block_size=16,
                 num_kvcache_blocks=32, max_model_len=256, decode_window=4)
    engine = LLMEngine(cfg)
    seq = engine.add_request(
        "", SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True)
    )
    seq.token_ids = list(prompt_ids)
    seq.num_prompt_tokens = seq.num_tokens = len(prompt_ids)
    while not engine.is_finished():
        engine.step()
    return seq.completion_token_ids


@pytest.mark.parametrize("family", ["llama", "qwen2"])
def test_greedy_matches_hf(tmp_path, family):
    if family == "llama":
        d, model = _save(
            tmp_path, transformers.LlamaForCausalLM, transformers.LlamaConfig,
            "llama", attention_bias=False,
        )
    else:
        d, model = _save(
            tmp_path, transformers.Qwen2ForCausalLM, transformers.Qwen2Config,
            "qwen2",
        )
    rng = np.random.RandomState(3)
    prompt = rng.randint(0, TINY["vocab_size"], size=11).tolist()
    n_new = 12
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )
    ref = hf_out[0, len(prompt):].tolist()
    got = _greedy_ours(d, prompt, n_new)
    assert got == ref
