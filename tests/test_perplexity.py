"""Perplexity harness: correctness of the NLL computation (vs a direct HF
forward on the golden tiny model) and the quantization quality gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.utils.perplexity import perplexity, quantization_ppl_report


@pytest.fixture(scope="module")
def tiny():
    from nanovllm_tpu.models.qwen3 import Qwen3Config, init_params

    cfg = Qwen3Config(
        vocab_size=384, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(0)
    texts = [rng.randint(0, 384, size=n).tolist() for n in (24, 40)]
    return cfg, params, texts


class TestPerplexity:
    def test_matches_manual_forward(self, tiny):
        """NLL through the paged serving forward == NLL from plain logits."""
        from nanovllm_tpu.models.qwen3 import create_kv_caches, forward
        from nanovllm_tpu.utils.metadata import build_metadata

        cfg, params, texts = tiny
        ids = texts[0]
        T = len(ids)
        kc, vc = create_kv_caches(cfg, 4, 16, jnp.float32)
        tokens, meta = build_metadata(
            [{"token_ids": ids, "num_cached": 0, "block_table": [1, 2]}],
            16, T=T, S=1, max_blocks=2, Q=T,
        )
        logits, _, _ = forward(cfg, params, kc, vc, jnp.asarray(tokens), meta,
                               all_logits=True)
        lp = jax.nn.log_softmax(np.asarray(logits[:-1]), axis=-1)
        manual = float(np.exp(-lp[np.arange(T - 1), ids[1:]].mean()))
        got = perplexity(cfg, params, [ids])
        assert abs(got - manual) / manual < 1e-4

    def test_quantization_quality_gate(self, tiny):
        cfg, params, texts = tiny
        report = quantization_ppl_report(cfg, params, texts)
        assert report["bf16"] > 1.0
        # INT8 must track bf16 tightly even on random weights; INT4
        # (asymmetric G=64 default since round 5) nearly as tightly.
        assert abs(report["int8"] - report["bf16"]) / report["bf16"] < 0.05
        assert abs(report["int4"] - report["bf16"]) / report["bf16"] < 0.10


class TestKVQuantPerplexity:
    def test_int8_kv_ppl_gate(self, tiny):
        """INT8 KV cache perplexity tracks full-precision KV."""
        import jax.numpy as jnp

        cfg, params, texts = tiny
        base = perplexity(cfg, params, texts, kv_dtype=jnp.float32)
        got = perplexity(cfg, params, texts, kv_dtype=jnp.int8)
        assert abs(got - base) / base < 0.05, (got, base)

    def test_fp8_kv_ppl_gate(self, tiny):
        """FP8-e4m3 KV (per-row amax/448 scales) perplexity tracks
        full-precision KV (BASELINE config 5 accuracy gate). e4m3 has 3
        mantissa bits, so the gate is looser than int8's (measured ~0.4%
        on this model vs int8's ~0.008%)."""
        import jax.numpy as jnp

        cfg, params, texts = tiny
        base = perplexity(cfg, params, texts, kv_dtype=jnp.float32)
        got = perplexity(cfg, params, texts, kv_dtype=jnp.float8_e4m3fn)
        assert abs(got - base) / base < 0.02, (got, base)


@pytest.mark.slow
def test_dnll_gate_north_star_units(tmp_path):
    """BASELINE.md:28 gate in north-star units (VERDICT r3 #8): ΔNLL per
    token in nats — the scale-invariant equivalent of "Δppl < 0.1 vs
    bf16" (at a trained model's ppl ≈ 10, Δppl 0.1 == ΔNLL 0.01) — per
    bit-width at a mid-size geometry (hidden 2048, 8 layers; the 4B
    geometry runs on TPU via experiments/dnll_4b.py and is recorded in
    README). Random-init weights: absolute Δppl would be meaningless at
    random-init's near-vocab-size perplexity, ΔNLL is not."""
    from nanovllm_tpu.models.qwen3 import Qwen3Config, init_params
    from nanovllm_tpu.utils.perplexity import quantization_dnll_report

    cfg = Qwen3Config(
        vocab_size=4096, hidden_size=2048, intermediate_size=6144,
        num_hidden_layers=8, num_attention_heads=16,
        num_key_value_heads=8, head_dim=128, tie_word_embeddings=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(0)
    texts = [rng.randint(0, 4096, size=n).tolist() for n in (48, 48)]
    rep = quantization_dnll_report(cfg, params, texts, block_size=16)
    lines = [
        f"{k}: ppl={v['ppl']:.3f} dnll={v.get('dnll', 0):.5f} "
        f"dppl@10={v.get('dppl_at_ppl10', 0):.4f}"
        for k, v in rep.items()
    ]
    print("\n".join(lines))
    # Gates in nats/token (north star: < 0.01 == Δppl 0.1 at ppl 10).
    assert abs(rep["int8-W"]["dnll"]) < 0.01, rep["int8-W"]
    assert abs(rep["int8-KV"]["dnll"]) < 0.002, rep["int8-KV"]
    assert abs(rep["float8_e4m3fn-KV"]["dnll"]) < 0.02, rep["float8_e4m3fn-KV"]
    # INT4 meets the north-star bar since round 5's asymmetric default:
    # symmetric G=128 measured |ΔNLL| 0.092 (9x over); the
    # experiments/int4_dnll_sweep.py sweep found asym G=64 at 0.003 and
    # the production default switched (README "Quantization accuracy").
    assert abs(rep["int4-W"]["dnll"]) < 0.01, rep["int4-W"]
