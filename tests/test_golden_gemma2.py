"""Gemma 2 family: greedy decodes match HF transformers token-for-token on
a tiny random model — covering the full architecture delta vs Qwen/Llama:
alternating sliding/full attention layers, (1+w) RMSNorm, sandwich norms,
GeGLU, sqrt(D) embedding scaling, attention-score and final-logit tanh
softcaps, and the decoupled query_pre_attn_scalar attention scale."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

SW = 8
TINY = dict(
    vocab_size=384, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, max_position_embeddings=512, rms_norm_eps=1e-6,
    rope_theta=10000.0, sliding_window=SW, query_pre_attn_scalar=16,
    attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
)


def _save(tmp_path):
    d = tmp_path / "gemma2"
    cfg = transformers.Gemma2Config(**TINY, attn_implementation="eager")
    torch.manual_seed(0)
    model = transformers.Gemma2ForCausalLM(cfg).to(torch.float32).eval()
    model.save_pretrained(d, safe_serialization=True)
    with open(d / "config.json") as f:
        saved = json.load(f)
    saved["model_type"] = "gemma2"
    with open(d / "config.json", "w") as f:
        json.dump(saved, f)
    return str(d), model


def _greedy_ours(model_dir, prompt_ids, n_new, **kw):
    from nanovllm_tpu import Config, SamplingParams
    from nanovllm_tpu.engine.llm_engine import LLMEngine

    cfg = dict(model_path=model_dir, dtype="float32", kvcache_block_size=16,
               num_kvcache_blocks=32, max_model_len=256, decode_window=4)
    cfg.update(kw)
    engine = LLMEngine(Config(**cfg))
    seq = engine.add_request(
        "", SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True)
    )
    seq.token_ids = list(prompt_ids)
    seq.num_prompt_tokens = seq.num_tokens = len(prompt_ids)
    while not engine.is_finished():
        engine.step()
    return seq.completion_token_ids


def test_config_parses_gemma2():
    from nanovllm_tpu.models.qwen3 import Qwen3Config

    c = Qwen3Config.from_hf_gemma2(dict(TINY, model_type="gemma2",
                                        tie_word_embeddings=True))
    assert c.sliding_window == SW
    assert c.layer_types == ("sliding_attention", "full_attention")
    assert c.rms_unit_offset and c.use_post_norms and c.scale_embedding
    assert c.hidden_act == "gelu_tanh"
    assert c.attn_logit_softcap == 50.0
    assert c.final_logit_softcap == 30.0
    assert c.query_pre_attn_scalar == 16


def test_greedy_matches_hf(tmp_path):
    d, model = _save(tmp_path)
    rng = np.random.RandomState(3)
    # Context 3x the sliding window so the alternation matters: the
    # sliding layer masks most history, the full layer sees all of it.
    prompt = rng.randint(0, TINY["vocab_size"], size=3 * SW).tolist()
    n_new = 12
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )
    ref = hf_out[0, len(prompt):].tolist()
    got = _greedy_ours(d, prompt, n_new)
    assert got == ref


def test_pallas_tracks_oracle(tmp_path):
    """The per-layer alternating window survives the Pallas kernel path
    (grouped scan: one static window per pattern position)."""
    d = tmp_path / "g"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(dict(model_type="gemma2", vocab_size=512, hidden_size=256,
                       intermediate_size=512, num_hidden_layers=2,
                       num_attention_heads=8, num_key_value_heads=4,
                       head_dim=128, tie_word_embeddings=True,
                       sliding_window=SW, query_pre_attn_scalar=128,
                       attn_logit_softcapping=50.0,
                       final_logit_softcapping=30.0), f)
    rng = np.random.RandomState(11)
    prompt = rng.randint(0, 512, size=3 * SW).tolist()
    outs = {}
    for pallas in (False, True):
        outs[pallas] = _greedy_ours(str(d), prompt, 10, use_pallas=pallas,
                                    pallas_interpret=pallas)
    assert outs[True] == outs[False]
