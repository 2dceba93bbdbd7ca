"""Gemma 3 (text): greedy decodes match HF transformers token-for-token on
a tiny random model — the 5-local:1-global layer pattern, the separate
local-layer RoPE base, per-head q/k RMSNorm with unit offset, sandwich
norms, GeGLU, and sqrt(D) embedding scaling."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

SW = 8
TINY = dict(
    vocab_size=384, hidden_size=64, intermediate_size=128,
    num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, max_position_embeddings=512, rms_norm_eps=1e-6,
    rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
    sliding_window=SW, query_pre_attn_scalar=16,
)


def test_config_parses_gemma3():
    from nanovllm_tpu.models.qwen3 import Qwen3Config, _layer_type_period

    c = Qwen3Config.from_hf_gemma3(dict(TINY, model_type="gemma3_text"))
    assert c.sliding_window == SW
    assert c.layer_types == ("sliding_attention",) * 5 + ("full_attention",)
    assert _layer_type_period(c.layer_types) == 6
    assert c.use_qk_norm and c.rms_unit_offset and c.use_post_norms
    assert c.attn_logit_softcap is None
    assert c.rope_local_base_freq == 10_000.0


def test_greedy_matches_hf_nondividing_layers(tmp_path):
    """Real Gemma-3 checkpoints have layer counts the pattern doesn't
    divide (1B: 26 = 4*6 + 2); the forward scans whole groups and unrolls
    the remainder — 8 layers here (one group of 6 + a 2-layer tail)."""
    d = tmp_path / "gemma3_rem"
    cfg = transformers.Gemma3TextConfig(
        **dict(TINY, num_hidden_layers=8), attn_implementation="eager"
    )
    torch.manual_seed(1)
    model = transformers.Gemma3ForCausalLM(cfg).to(torch.float32).eval()
    model.save_pretrained(d, safe_serialization=True)
    rng = np.random.RandomState(8)
    prompt = rng.randint(0, TINY["vocab_size"], size=2 * SW).tolist()
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )
    ref = hf_out[0, len(prompt):].tolist()

    from nanovllm_tpu import Config, SamplingParams
    from nanovllm_tpu.engine.llm_engine import LLMEngine

    engine = LLMEngine(Config(
        model_path=str(d), dtype="float32", kvcache_block_size=16,
        num_kvcache_blocks=48, max_model_len=256, decode_window=4,
    ))
    seq = engine.add_request(
        "", SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    )
    seq.token_ids = list(prompt)
    seq.num_prompt_tokens = seq.num_tokens = len(prompt)
    while not engine.is_finished():
        engine.step()
    assert seq.completion_token_ids == ref


def test_greedy_matches_hf(tmp_path):
    d = tmp_path / "gemma3"
    cfg = transformers.Gemma3TextConfig(**TINY, attn_implementation="eager")
    torch.manual_seed(0)
    model = transformers.Gemma3ForCausalLM(cfg).to(torch.float32).eval()
    model.save_pretrained(d, safe_serialization=True)
    with open(d / "config.json") as f:
        saved = json.load(f)
    assert saved["model_type"] == "gemma3_text"
    with open(d / "config.json", "w") as f:
        json.dump(saved, f)

    rng = np.random.RandomState(3)
    prompt = rng.randint(0, TINY["vocab_size"], size=3 * SW).tolist()
    n_new = 12
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )
    ref = hf_out[0, len(prompt):].tolist()

    from nanovllm_tpu import Config, SamplingParams
    from nanovllm_tpu.engine.llm_engine import LLMEngine

    engine = LLMEngine(Config(
        model_path=str(d), dtype="float32", kvcache_block_size=16,
        num_kvcache_blocks=48, max_model_len=256, decode_window=4,
    ))
    mc = engine.model_runner.model_config
    assert mc.layer_types is not None and len(mc.layer_types) == 6
    seq = engine.add_request(
        "", SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True)
    )
    seq.token_ids = list(prompt)
    seq.num_prompt_tokens = seq.num_tokens = len(prompt)
    while not engine.is_finished():
        engine.step()
    assert seq.completion_token_ids == ref
