"""Weight-only quantization: round-trip accuracy, packing, scan transport,
and engine end-to-end (SURVEY §7 M4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu.ops.quant import (
    QuantizedTensor,
    dequantize,
    matmul,
    quant_matmul,
    quantize,
    quantize_params,
)


def _rand(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


class TestQuantize:
    def test_int8_roundtrip_error(self):
        w = _rand((256, 128))
        qt = quantize(w, 8)
        deq = dequantize(qt, jnp.float32)
        # Symmetric int8 with per-group scales: max error <= scale/2.
        err = np.abs(np.asarray(deq) - np.asarray(w))
        scale = np.asarray(qt.scale)  # [in/G, out]
        bound = np.repeat(scale, qt.group_size, axis=0) / 2 + 1e-6
        assert (err <= bound).all()

    def test_int4_roundtrip_error(self):
        w = _rand((256, 128), seed=1)
        qt = quantize(w, 4)
        # int8 storage: the fused kernel bitcasts packed bytes to int4.
        assert qt.data.dtype == jnp.int8
        assert qt.data.shape == (128, 128)  # packed pairs along in
        deq = dequantize(qt, jnp.float32)
        err = np.abs(np.asarray(deq) - np.asarray(w))
        scale = np.asarray(qt.scale)
        bound = np.repeat(scale, qt.group_size, axis=0) / 2 + 1e-6
        assert (err <= bound).all()

    def test_int4_packing_order(self):
        # Hand-built weight: in=4, out=1, values exactly representable.
        w = jnp.asarray([[1.0], [-2.0], [3.0], [-7.0]], jnp.float32)
        qt = quantize(w, 4, group_size=4)
        deq = np.asarray(dequantize(qt, jnp.float32))
        np.testing.assert_allclose(deq, np.asarray(w), rtol=1e-5)

    def test_int4_asym_roundtrip_error(self):
        w = _rand((256, 128), seed=11)
        qt = quantize(w, 4, group_size=64, mode="asym")
        assert qt.bias is not None and qt.bias.shape == qt.scale.shape
        deq = dequantize(qt, jnp.float32)
        err = np.abs(np.asarray(deq) - np.asarray(w))
        scale = np.asarray(qt.scale)
        bound = np.repeat(scale, qt.group_size, axis=0) / 2 + 1e-6
        assert (err <= bound).all()

    def test_asym_beats_sym_on_shifted_weights(self):
        """The asymmetric fit's reason to exist: weights whose per-group
        range is one-sided waste half the symmetric grid. (The dNLL measure
        behind the asym default: experiments/int4_dnll_sweep.py.)"""
        w = _rand((256, 128), seed=12) + 2.0  # all-positive groups
        sym = dequantize(quantize(w, 4, group_size=64, mode="sym"), jnp.float32)
        asym = dequantize(quantize(w, 4, group_size=64, mode="asym"), jnp.float32)
        mse_sym = float(jnp.mean((sym - w) ** 2))
        mse_asym = float(jnp.mean((asym - w) ** 2))
        assert mse_asym < mse_sym / 2, (mse_sym, mse_asym)

    def test_asym_rejects_int8(self):
        with pytest.raises(ValueError):
            quantize(_rand((64, 32)), 8, mode="asym")

    def test_asym_mse_improves_weight_mse(self):
        """The error-aware range search must never lose to the plain
        min/max affine fit (it includes c=1.0 as a candidate)."""
        w = _rand((512, 128), seed=15)
        mse = {}
        for mode in ("asym", "asym_mse"):
            deq = dequantize(quantize(w, 4, group_size=64, mode=mode),
                             jnp.float32)
            mse[mode] = float(jnp.mean((deq - w) ** 2))
        assert mse["asym_mse"] <= mse["asym"] * 1.001, mse

    def test_int4_default_resolves_asym_g64(self):
        from nanovllm_tpu.ops.quant import _resolve_bits

        bits, g, mode = _resolve_bits("int4", None)
        assert (bits, g, mode) == (4, 64, "asym")
        bits, g, mode = _resolve_bits("int8", None)
        assert (bits, g, mode) == (8, -1, "sym")

    def test_engine_auto_group_size_by_model_scale(self, tmp_model_dir):
        """hidden >= 2560 (4B+ class) auto-selects G=32; smaller models
        keep the method default (G=64) — README 'Quantization accuracy'."""
        import json
        import os

        from nanovllm_tpu import Config
        from nanovllm_tpu.engine.model_runner import ModelRunner

        def runner_G(hidden, heads, explicit=None):
            with open(os.path.join(tmp_model_dir, "config.json"), "w") as f:
                json.dump(dict(
                    model_type="qwen3", vocab_size=512, hidden_size=hidden,
                    intermediate_size=2 * hidden, num_hidden_layers=1,
                    num_attention_heads=heads, num_key_value_heads=heads,
                    head_dim=64, tie_word_embeddings=True,
                ), f)
            cfg = Config(model_path=tmp_model_dir, dtype="float32",
                         quantization="int4", kvcache_block_size=16,
                         num_kvcache_blocks=8, max_model_len=64,
                         quantization_group_size=explicit)
            r = ModelRunner(cfg)
            return r.params["layers"]["qkv"].group_size

        assert runner_G(2048, 4) == 64
        assert runner_G(2560, 4) == 32
        assert runner_G(2560, 4, explicit=128) == 128

    def test_group_size_selection(self):
        qt = quantize(_rand((384, 64)), 8)  # 384 % 128 == 0
        assert qt.group_size == 128
        qt = quantize(_rand((48, 64)), 8)  # falls through to 16? no: 48%32!=0,48%16 — per-channel
        assert 48 % qt.group_size == 0

    def test_quant_matmul_close(self):
        x = _rand((16, 256), seed=2).astype(jnp.float32)
        w = _rand((256, 128), seed=3)
        exact = np.asarray(x @ w)
        for bits, tol in ((8, 0.02), (4, 0.25)):
            got = np.asarray(quant_matmul(x, quantize(w, bits)))
            rel = np.abs(got - exact).mean() / (np.abs(exact).mean() + 1e-9)
            assert rel < tol, f"bits={bits} rel err {rel}"

    def test_matmul_dispatch(self):
        x = _rand((4, 64), seed=4)
        w = _rand((64, 32), seed=5)
        assert matmul(x, w).shape == (4, 32)
        assert matmul(x, quantize(w, 8)).shape == (4, 32)


class TestScanTransport:
    def test_quantized_tensor_through_scan(self):
        """lax.scan must slice the leading layer axis of data+scale while
        preserving bits/group_size metadata — the stacked-layer loop relies
        on this."""
        L = 3
        w = _rand((L, 64, 32), seed=6)
        qt = quantize(w, 4)
        x = _rand((8, 64), seed=7)

        def step(carry, layer_qt):
            assert isinstance(layer_qt, QuantizedTensor)
            assert layer_qt.bits == 4
            return carry + quant_matmul(x, layer_qt).sum(), None

        total, _ = jax.lax.scan(step, jnp.float32(0.0), qt)
        expect = sum(float(quant_matmul(x, quantize(w[i], 4)).sum()) for i in range(L))
        np.testing.assert_allclose(float(total), expect, rtol=1e-4)

    def test_asym_bias_through_scan(self):
        """The bias data field must scan-slice alongside data/scale."""
        L = 3
        w = _rand((L, 64, 32), seed=13) + 1.0
        qt = quantize(w, 4, group_size=32, mode="asym")
        x = _rand((8, 64), seed=14)

        def step(carry, layer_qt):
            assert layer_qt.bias is not None
            return carry + quant_matmul(x, layer_qt).sum(), None

        total, _ = jax.lax.scan(step, jnp.float32(0.0), qt)
        expect = sum(
            float(quant_matmul(x, quantize(w[i], 4, group_size=32,
                                           mode="asym")).sum())
            for i in range(L)
        )
        np.testing.assert_allclose(float(total), expect, rtol=1e-4)


class TestQuantizeParams:
    def test_quantizes_matmuls_only(self):
        from nanovllm_tpu.models.qwen3 import Qwen3Config, init_params

        cfg = Qwen3Config(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=32, tie_word_embeddings=True,
        )
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        qp = quantize_params(params, "int8")
        from nanovllm_tpu.ops.quant import QuantizedEmbedding

        for k in ("qkv", "o", "gate_up", "down"):
            assert isinstance(qp["layers"][k], QuantizedTensor)
        # The head is int8 per-vocab-row by default (largest decode read)...
        assert isinstance(qp["embedding"], QuantizedEmbedding)
        assert isinstance(qp["layers"]["input_ln"], jax.Array)
        # ...and stays full precision when opted out. quantize_params
        # CONSUMES its input (memory bound), so build a fresh tree.
        params2 = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        qp2 = quantize_params(params2, "int8", include_embedding=False)
        assert isinstance(qp2["embedding"], jax.Array)

    def test_quantized_embedding_tracks_full_precision(self):
        from nanovllm_tpu.ops.quant import lm_head_logits, quantize_embedding

        w = _rand((512, 128), seed=9) * 0.05  # [V, D]
        qe = quantize_embedding(w, dtype="float32")
        ids = jnp.asarray([0, 3, 511, 17])
        got = qe.lookup(ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(w[ids]),
                                   atol=2e-3, rtol=0)
        x = _rand((4, 128), seed=10)
        ref = lm_head_logits(x, w)
        ql = lm_head_logits(x, qe)
        # argmax (the greedy token) must agree; values close.
        assert (jnp.argmax(ref, -1) == jnp.argmax(ql, -1)).all()
        np.testing.assert_allclose(np.asarray(ql), np.asarray(ref),
                                   atol=0.05, rtol=0.01)

    def test_rejects_unknown_method(self):
        with pytest.raises(ValueError):
            quantize_params({"layers": {}}, "fp3")


class TestEngineQuantized:
    @pytest.mark.parametrize("method", ["int8", "int4"])
    def test_generate_end_to_end(self, tmp_model_dir, method):
        import json
        import os

        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        with open(os.path.join(tmp_model_dir, "config.json"), "w") as f:
            json.dump(
                dict(
                    model_type="qwen3", vocab_size=512, hidden_size=128,
                    intermediate_size=256, num_hidden_layers=2,
                    num_attention_heads=4, num_key_value_heads=2, head_dim=32,
                    tie_word_embeddings=True,
                ),
                f,
            )
        cfg = Config(
            model_path=tmp_model_dir, dtype="float32", quantization=method,
            kvcache_block_size=16, num_kvcache_blocks=32, max_model_len=256,
            decode_window=4,
        )
        engine = LLMEngine(cfg)
        outs = engine.generate(["hello world"], SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
        assert len(outs) == 1
        assert outs[0].num_completion_tokens == 8
