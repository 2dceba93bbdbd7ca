"""Tensor-parallel execution on the 8-virtual-device CPU mesh (SURVEY §4:
multi-device tests without TPU hardware).

TP layout per SURVEY §2.12: qkv/gate_up column-parallel, o/down
row-parallel (+psum), vocab-sharded embedding/lm_head, KV caches sharded on
kv_heads. Correctness bar: TP=2/4 logits match TP=1 within float tolerance,
and the engine produces identical greedy generations end-to-end.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from nanovllm_tpu.models.qwen3 import Qwen3Config, create_kv_caches, forward, init_params
from nanovllm_tpu.parallel.mesh import build_mesh
from nanovllm_tpu.parallel.sharding import shard_kv_caches, shard_params
from nanovllm_tpu.utils.metadata import build_metadata

CFG = Qwen3Config(
    vocab_size=512, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
    head_dim=32, tie_word_embeddings=False,
)


def _batch(block_size=16):
    seqs_meta = [
        {"token_ids": [3, 1, 4, 1, 5, 9, 2, 6], "num_cached": 0, "block_table": [1]},
        {"token_ids": [2, 7, 1, 8], "num_cached": 0, "block_table": [2]},
    ]
    return build_metadata(seqs_meta, block_size, T=16, S=2, max_blocks=1, Q=8)


def _logits(tp):
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    kc, vc = create_kv_caches(CFG, 8, 16, jnp.float32)
    tokens, meta = _batch()
    if tp > 1:
        mesh = build_mesh(tensor_parallel_size=tp)
        params = shard_params(mesh, params, CFG.tie_word_embeddings)
        kc, vc = shard_kv_caches(mesh, kc, vc)
    fn = jax.jit(lambda p, k, v, t, m: forward(CFG, p, k, v, t, m)[0])
    return np.asarray(fn(params, kc, vc, jnp.asarray(tokens), meta))


class TestTensorParallelForward:
    @pytest.mark.parametrize("tp", [2, 4])
    def test_logits_match_tp1(self, tp):
        base = _logits(1)
        got = _logits(tp)
        np.testing.assert_allclose(got, base, rtol=1e-4, atol=1e-4)


class TestTensorParallelEngine:
    @pytest.mark.parametrize("tp,dp", [(2, 1), (2, 2)])
    def test_greedy_generation_matches_tp1(self, tmp_model_dir, tp, dp):
        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        with open(os.path.join(tmp_model_dir, "config.json"), "w") as f:
            json.dump(
                dict(
                    model_type="qwen3", vocab_size=512, hidden_size=128,
                    intermediate_size=256, num_hidden_layers=2,
                    num_attention_heads=8, num_key_value_heads=4, head_dim=32,
                    tie_word_embeddings=True,
                ),
                f,
            )
        results = {}
        for t, d in ((1, 1), (tp, dp)):
            cfg = Config(
                model_path=tmp_model_dir, dtype="float32",
                tensor_parallel_size=t, data_parallel_size=d,
                kvcache_block_size=16, num_kvcache_blocks=32,
                max_model_len=128, decode_window=4,
            )
            eng = LLMEngine(cfg, rng_seed=0)
            outs = eng.generate(
                ["hello world", "the quick brown fox"],
                SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True),
            )
            results[(t, d)] = [o.completion_token_ids for o in outs]
        assert results[(1, 1)] == results[(tp, dp)]

    def test_quantized_tp(self, tmp_model_dir):
        """INT8 weights shard onto the mesh (QuantizedTensor spec nodes)."""
        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        with open(os.path.join(tmp_model_dir, "config.json"), "w") as f:
            json.dump(
                dict(
                    model_type="qwen3", vocab_size=512, hidden_size=128,
                    intermediate_size=256, num_hidden_layers=2,
                    num_attention_heads=8, num_key_value_heads=4, head_dim=32,
                    tie_word_embeddings=True,
                ),
                f,
            )
        cfg = Config(
            model_path=tmp_model_dir, dtype="float32", quantization="int8",
            tensor_parallel_size=2, kvcache_block_size=16,
            num_kvcache_blocks=32, max_model_len=128, decode_window=4,
        )
        eng = LLMEngine(cfg, rng_seed=0)
        outs = eng.generate(
            ["hello"], SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
        )
        assert outs[0].num_completion_tokens == 8

    def test_quantized_kv_tp_pallas_window(self, tmp_model_dir):
        """INT8 KV x tensor parallel on the PALLAS path (VERDICT r2 weak
        #4: this BASELINE-config-4/5 combination used to fall back to the
        jnp path silently). head_dim=128 + pallas_interpret drives the
        sharded window kernels (window_commit auto = ON for quantized KV)
        on the CPU mesh; tp=2 must reproduce tp=1 exactly."""
        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        with open(os.path.join(tmp_model_dir, "config.json"), "w") as f:
            json.dump(
                dict(
                    model_type="qwen3", vocab_size=256, hidden_size=256,
                    intermediate_size=256, num_hidden_layers=2,
                    num_attention_heads=4, num_key_value_heads=2,
                    head_dim=128, tie_word_embeddings=True,
                ),
                f,
            )
        results = {}
        for tp in (1, 2):
            cfg = Config(
                model_path=tmp_model_dir, dtype="float32",
                kv_cache_dtype="int8", pallas_interpret=True,
                tensor_parallel_size=tp, kvcache_block_size=16,
                num_kvcache_blocks=32, max_model_len=128, decode_window=4,
            )
            eng = LLMEngine(cfg, rng_seed=0)
            assert eng.model_runner.attn_impl == "pallas_decode"
            assert eng.model_runner.window_commit  # auto -> ON for int8 KV
            outs = eng.generate(
                ["hello world", "the quick brown fox"],
                SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True),
            )
            results[tp] = [o.completion_token_ids for o in outs]
        assert results[1] == results[2]
