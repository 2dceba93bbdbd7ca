"""Golden numerics: our functional Qwen3 vs HF transformers Qwen3 (fp32,
CPU, tiny random model). This is the test class the reference lacks entirely
(SURVEY §4: add numeric golden tests vs HF)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

TINY = dict(
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
)


@pytest.fixture(scope="module")
def tiny_hf_model_dir(tmp_path_factory):
    """A real HF Qwen3 checkpoint with random weights, saved to disk."""
    import torch
    from transformers import Qwen3Config as HFQwen3Config
    from transformers import Qwen3ForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFQwen3Config(
        **TINY,
        attention_bias=False,
        hidden_act="silu",
        use_cache=False,
    )
    model = Qwen3ForCausalLM(hf_cfg).eval().to(torch.float32)
    d = tmp_path_factory.mktemp("tiny_qwen3")
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def loaded(tiny_hf_model_dir):
    from nanovllm_tpu.models.qwen3 import Qwen3Config, create_kv_caches, forward
    from nanovllm_tpu.utils.loader import load_qwen3_weights, read_hf_config

    cfg = Qwen3Config.from_hf(read_hf_config(tiny_hf_model_dir))
    params = load_qwen3_weights(cfg, tiny_hf_model_dir, jnp.float32)
    return cfg, params


def hf_logits(model_dir, token_ids):
    import torch
    from transformers import Qwen3ForCausalLM

    model = Qwen3ForCausalLM.from_pretrained(model_dir, torch_dtype=torch.float32).eval()
    with torch.no_grad():
        out = model(torch.tensor([token_ids])).logits
    return out[0].numpy()  # [T, V]


def run_prefill(cfg, params, token_ids, block_size=16, num_blocks=32):
    """Drive our forward through the paged path for a single sequence."""
    from nanovllm_tpu.models.qwen3 import create_kv_caches, forward
    from nanovllm_tpu.utils.metadata import build_metadata

    kc, vc = create_kv_caches(cfg, num_blocks, block_size, jnp.float32)
    n_blocks = (len(token_ids) + block_size - 1) // block_size
    seqs_meta = [
        {"token_ids": token_ids, "num_cached": 0, "block_table": list(range(1, n_blocks + 1))}
    ]
    T = len(token_ids)
    tokens, meta = build_metadata(seqs_meta, block_size, T=T, S=1, max_blocks=n_blocks, Q=T)
    logits, kc, vc = forward(cfg, params, kc, vc, jnp.asarray(tokens), meta)
    return np.asarray(logits), kc, vc, seqs_meta[0]


def test_prefill_logits_match_hf(tiny_hf_model_dir, loaded):
    cfg, params = loaded
    token_ids = [3, 17, 91, 200, 45, 7, 123, 8, 55, 99, 2, 61]
    ours = run_prefill(cfg, params, token_ids)[0]  # [1, V] last-token logits
    ref = hf_logits(tiny_hf_model_dir, token_ids)  # [T, V]
    np.testing.assert_allclose(ours[0], ref[-1], rtol=2e-4, atol=2e-4)


def test_decode_step_matches_hf(tiny_hf_model_dir, loaded):
    """Prefill N tokens, then decode one more through the paged cache; the
    logits must equal HF's full-context forward at the last position."""
    from nanovllm_tpu.models.qwen3 import forward
    from nanovllm_tpu.utils.metadata import build_metadata

    cfg, params = loaded
    block_size = 16
    prompt = [3, 17, 91, 200, 45, 7, 123, 8]
    next_tok = 77
    _, kc, vc, sm = run_prefill(cfg, params, prompt, block_size)

    full = prompt + [next_tok]
    seqs_meta = [{"token_ids": full, "num_cached": len(prompt), "block_table": sm["block_table"]}]
    tokens, meta = build_metadata(seqs_meta, block_size, T=1, S=1, max_blocks=1, Q=1)
    logits, _, _ = forward(cfg, params, kc, vc, jnp.asarray(tokens), meta)

    ref = hf_logits(tiny_hf_model_dir, full)
    np.testing.assert_allclose(np.asarray(logits)[0], ref[-1], rtol=2e-4, atol=2e-4)


def test_prefix_cached_prefill_matches_full_prefill(loaded):
    """Computing only the uncached suffix over a warm cache must equal the
    full prefill (the reference's separate cached-prefill branch,
    attention.rs:85-89, unified here)."""
    from nanovllm_tpu.models.qwen3 import forward
    from nanovllm_tpu.utils.metadata import build_metadata

    cfg, params = loaded
    block_size = 16
    prefix = list(range(1, 33))  # 2 full blocks
    suffix = [99, 3, 42, 7]
    full = prefix + suffix

    # Full prefill (oracle).
    full_logits = run_prefill(cfg, params, full, block_size)[0]

    # Warm the cache with the prefix only, then prefill just the suffix.
    _, kc, vc, sm = run_prefill(cfg, params, prefix, block_size)
    table = sm["block_table"] + [9]  # one fresh block for the suffix
    seqs_meta = [{"token_ids": full, "num_cached": len(prefix), "block_table": table}]
    tokens, meta = build_metadata(seqs_meta, block_size, T=4, S=1, max_blocks=3, Q=4)
    logits, _, _ = forward(cfg, params, kc, vc, jnp.asarray(tokens), meta)

    np.testing.assert_allclose(np.asarray(logits)[0], full_logits[0], rtol=1e-5, atol=1e-5)


def test_batched_mixed_lengths_match_singletons(loaded):
    """Two ragged sequences in one prefill batch == each alone."""
    from nanovllm_tpu.models.qwen3 import create_kv_caches, forward
    from nanovllm_tpu.utils.metadata import build_metadata

    cfg, params = loaded
    bs = 16
    a = [5, 9, 13, 88, 2, 41, 100]
    b = [7, 7, 201, 16]

    la = run_prefill(cfg, params, a, bs)[0]
    lb = run_prefill(cfg, params, b, bs)[0]

    kc, vc = create_kv_caches(cfg, 32, bs, jnp.float32)
    seqs_meta = [
        {"token_ids": a, "num_cached": 0, "block_table": [1]},
        {"token_ids": b, "num_cached": 0, "block_table": [2]},
    ]
    tokens, meta = build_metadata(seqs_meta, bs, T=16, S=4, max_blocks=2, Q=8)
    logits, _, _ = forward(cfg, params, kc, vc, jnp.asarray(tokens), meta)
    logits = np.asarray(logits)
    np.testing.assert_allclose(logits[0], la[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(logits[1], lb[0], rtol=1e-5, atol=1e-5)


def test_greedy_generation_matches_hf(tiny_hf_model_dir, loaded):
    """8 greedy tokens via the paged decode path == HF greedy generate."""
    import torch
    from transformers import Qwen3ForCausalLM

    from nanovllm_tpu.models.qwen3 import forward
    from nanovllm_tpu.utils.metadata import build_metadata

    cfg, params = loaded
    bs = 16
    prompt = [3, 17, 91, 200, 45, 7, 123, 8, 55, 99]
    n_new = 8

    model = Qwen3ForCausalLM.from_pretrained(tiny_hf_model_dir, torch_dtype=torch.float32).eval()
    with torch.no_grad():
        ref_ids = model.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False
        )[0].tolist()

    logits, kc, vc, sm = run_prefill(cfg, params, prompt, bs)
    ids = list(prompt)
    table = list(sm["block_table"])
    for _ in range(n_new):
        ids.append(int(np.argmax(logits[0])))
        if len(ids) % bs == 1:
            table.append(max(table) + 1)
        seqs_meta = [{"token_ids": ids, "num_cached": len(ids) - 1, "block_table": table}]
        tokens, meta = build_metadata(seqs_meta, bs, T=1, S=1, max_blocks=len(table), Q=1)
        out, kc, vc = forward(cfg, params, kc, vc, jnp.asarray(tokens), meta)
        logits = np.asarray(out)
    ids.append(int(np.argmax(logits[0])))

    assert ids[: len(ref_ids)] == ref_ids
