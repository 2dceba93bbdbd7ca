"""Golden numerics test vs HuggingFace transformers Qwen3 (SURVEY §4's
"add what the reference lacks": logits-level equivalence with the HF
implementation on a tiny random-weight model).

Builds a tiny Qwen3ForCausalLM with torch (CPU), saves safetensors, loads it
through our loader, and compares:
  1. prefill logits at every position (via a batch where each sequence's
     last query token walks the prompt)  — actually compared at the last
     token of each of several prompt lengths;
  2. greedy decode continuations token-for-token.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

TINY = dict(
    vocab_size=384,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    max_position_embeddings=512,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def hf_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_qwen3_tiny")
    cfg = transformers.Qwen3Config(
        **TINY,
        attention_bias=False,
        use_cache=False,
    )
    torch.manual_seed(0)
    model = transformers.Qwen3ForCausalLM(cfg)
    model = model.to(torch.float32).eval()
    model.save_pretrained(d, safe_serialization=True)
    with open(os.path.join(d, "config.json")) as f:
        saved = json.load(f)
    saved["model_type"] = "qwen3"
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(saved, f)
    return str(d)


@pytest.fixture(scope="module")
def hf_model(hf_model_dir):
    m = transformers.Qwen3ForCausalLM.from_pretrained(
        hf_model_dir, torch_dtype=torch.float32
    )
    return m.eval()


def _our_logits(model_dir, token_lists):
    """Run our functional forward (fp32) over a prefill batch; returns
    last-token logits per sequence."""
    from nanovllm_tpu.models.qwen3 import Qwen3Config, create_kv_caches, forward
    from nanovllm_tpu.utils.loader import load_qwen3_weights, read_hf_config
    from nanovllm_tpu.utils.metadata import build_metadata

    cfg = Qwen3Config.from_hf(read_hf_config(model_dir))
    params = load_qwen3_weights(cfg, model_dir, jnp.float32)
    block_size = 16
    num_blocks = 64
    kc, vc = create_kv_caches(cfg, num_blocks, block_size, jnp.float32)

    T = sum(len(t) for t in token_lists)
    S = len(token_lists)
    Q = max(len(t) for t in token_lists)
    max_blocks = max((len(t) + block_size - 1) // block_size for t in token_lists)
    next_block = 1
    seqs_meta = []
    for ids in token_lists:
        nb = (len(ids) + block_size - 1) // block_size
        seqs_meta.append(
            {"token_ids": list(ids), "num_cached": 0,
             "block_table": list(range(next_block, next_block + nb))}
        )
        next_block += nb
    tokens, meta = build_metadata(seqs_meta, block_size, T=T, S=S, max_blocks=max_blocks, Q=Q)
    logits, _, _ = forward(cfg, params, kc, vc, jnp.asarray(tokens), meta)
    return np.asarray(logits)


class TestGoldenLogits:
    def test_prefill_logits_match_hf(self, hf_model_dir, hf_model):
        rng = np.random.RandomState(0)
        prompts = [
            rng.randint(0, TINY["vocab_size"], size=n).tolist() for n in (7, 16, 33)
        ]
        ours = _our_logits(hf_model_dir, prompts)

        for i, ids in enumerate(prompts):
            with torch.no_grad():
                out = hf_model(torch.tensor([ids]))
            ref = out.logits[0, -1].numpy()
            np.testing.assert_allclose(ours[i], ref, rtol=2e-3, atol=2e-3)

    def test_greedy_decode_matches_hf(self, hf_model_dir, hf_model):
        """Engine greedy continuation == HF greedy continuation, token for
        token, through the full paged prefill+decode path."""
        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        rng = np.random.RandomState(1)
        prompt_ids = rng.randint(0, TINY["vocab_size"], size=12).tolist()
        n_new = 16

        with torch.no_grad():
            hf_out = hf_model.generate(
                torch.tensor([prompt_ids]),
                max_new_tokens=n_new,
                do_sample=False,
                eos_token_id=None,
                pad_token_id=0,
            )
        ref_new = hf_out[0, len(prompt_ids):].tolist()

        cfg = Config(
            model_path=hf_model_dir, dtype="float32", kvcache_block_size=16,
            num_kvcache_blocks=32, max_model_len=256, decode_window=4,
        )
        engine = LLMEngine(cfg)
        seq = engine.add_request("", SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True))
        # Replace the tokenizer-fallback prompt with the exact ids.
        seq.token_ids = list(prompt_ids)
        seq.num_prompt_tokens = len(prompt_ids)
        seq.num_tokens = len(prompt_ids)
        while not engine.scheduler.is_finished():
            engine.step()
        assert seq.completion_token_ids == ref_new


class TestLinearRope:
    """HF "linear" rope_scaling is position interpolation (inv_freq /
    factor), not base scaling — pinned against HF transformers with a
    factor that separates the two curves (code review r3; Gemma 3's
    global layers ship linear factor 8)."""

    def test_linear_logits_match_hf(self, tmp_path):
        import json as _json
        import os as _os

        d = tmp_path / "hf_qwen3_linear"
        cfg = transformers.Qwen3Config(
            **TINY, attention_bias=False, use_cache=False,
            rope_scaling={"rope_type": "linear", "factor": 4.0},
        )
        torch.manual_seed(9)
        model = transformers.Qwen3ForCausalLM(cfg).to(torch.float32).eval()
        model.save_pretrained(d, safe_serialization=True)
        with open(_os.path.join(d, "config.json")) as f:
            saved = _json.load(f)
        saved["model_type"] = "qwen3"
        with open(_os.path.join(d, "config.json"), "w") as f:
            _json.dump(saved, f)

        rng = np.random.RandomState(4)
        prompts = [rng.randint(0, TINY["vocab_size"], size=n).tolist()
                   for n in (13, 70)]
        ours = _our_logits(str(d), prompts)
        for i, ids in enumerate(prompts):
            with torch.no_grad():
                out = model(torch.tensor([ids]))
            ref = out.logits[0, -1].numpy()
            np.testing.assert_allclose(ours[i], ref, rtol=2e-3, atol=2e-3)


class TestYarnRope:
    """YaRN long-context scaling (Qwen3's documented >32k mode, beyond the
    reference's linear base-scaling hook) must match HF transformers'
    _compute_yarn_parameters numerically."""

    @pytest.fixture(scope="class")
    def yarn_model_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("hf_qwen3_yarn")
        cfg = transformers.Qwen3Config(
            **TINY,
            attention_bias=False,
            use_cache=False,
            rope_scaling={
                "rope_type": "yarn",
                "factor": 4.0,
                "original_max_position_embeddings": 128,
            },
        )
        torch.manual_seed(3)
        model = transformers.Qwen3ForCausalLM(cfg).to(torch.float32).eval()
        model.save_pretrained(d, safe_serialization=True)
        with open(os.path.join(d, "config.json")) as f:
            saved = json.load(f)
        saved["model_type"] = "qwen3"
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(saved, f)
        return str(d)

    def test_yarn_logits_match_hf(self, yarn_model_dir):
        from nanovllm_tpu.models.qwen3 import Qwen3Config
        from nanovllm_tpu.utils.loader import read_hf_config

        cfg = Qwen3Config.from_hf(read_hf_config(yarn_model_dir))
        assert cfg.rope_scaling and cfg.rope_scaling.get("rope_type") == "yarn"

        m = transformers.Qwen3ForCausalLM.from_pretrained(
            yarn_model_dir, torch_dtype=torch.float32).eval()
        rng = np.random.RandomState(5)
        # Lengths beyond original_max_position_embeddings=128 exercise the
        # interpolated frequencies; shorter ones the extrapolated band.
        prompts = [rng.randint(0, TINY["vocab_size"], size=n).tolist()
                   for n in (9, 40, 150)]
        ours = _our_logits(yarn_model_dir, prompts)
        for i, ids in enumerate(prompts):
            with torch.no_grad():
                out = m(torch.tensor([ids]))
            ref = out.logits[0, -1].numpy()
            np.testing.assert_allclose(ours[i], ref, rtol=2e-3, atol=2e-3)
