"""Pallas kernels under tensor parallelism (shard_map over the virtual
mesh, interpret mode): results must match the single-device kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from nanovllm_tpu.ops.pallas.paged_attention import (
    kv_cache_commit,
    paged_attention_decode,
)
from nanovllm_tpu.ops.pallas.sharded import (
    sharded_kv_cache_commit,
    sharded_paged_attention_decode,
)
from nanovllm_tpu.parallel.mesh import AXIS_MODEL, build_mesh

from tests.test_pallas_kernels import _make_decode_case


@pytest.mark.parametrize("tp", [2, 4])
def test_sharded_decode_matches_single(tp):
    case = _make_decode_case(seed=21, Hq=8, Hkv=4, ctx_lens=(5, 20, 33, 48))
    q, k_new, v_new, kc, vc, layer, bt, cl = case
    scale = 0.09
    ref = paged_attention_decode(q, k_new, v_new, kc, vc, layer, bt, cl,
                                 scale=scale, interpret=True)
    mesh = build_mesh(tensor_parallel_size=tp)
    sh = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    got = sharded_paged_attention_decode(
        mesh,
        sh(q, P(None, AXIS_MODEL, None)),
        sh(k_new, P(None, AXIS_MODEL, None)),
        sh(v_new, P(None, AXIS_MODEL, None)),
        sh(kc, P(None, None, AXIS_MODEL, None, None)),
        sh(vc, P(None, None, AXIS_MODEL, None, None)),
        jnp.int32(layer), bt, cl, scale=scale, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sharded_commit_matches_single(tp=2):
    case = _make_decode_case(seed=22, Hq=8, Hkv=4, ctx_lens=(5, 17, 32, 48))
    q, k_new, v_new, kc, vc, layer, bt, cl = case
    ref_kc, ref_vc = kv_cache_commit(k_new, v_new, kc + 0, vc + 0,
                                     jnp.int32(layer), bt, cl, interpret=True)
    mesh = build_mesh(tensor_parallel_size=tp)
    sh = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    got_kc, got_vc = sharded_kv_cache_commit(
        mesh,
        sh(k_new, P(None, AXIS_MODEL, None)),
        sh(v_new, P(None, AXIS_MODEL, None)),
        sh(kc, P(None, None, AXIS_MODEL, None, None)),
        sh(vc, P(None, None, AXIS_MODEL, None, None)),
        jnp.int32(layer), bt, cl, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_kc), np.asarray(ref_kc))
    np.testing.assert_array_equal(np.asarray(got_vc), np.asarray(ref_vc))


def test_forward_pallas_under_tp_matches_ref():
    """Full forward with attn_impl=pallas_decode + mesh (kernels interpret
    off-TPU) matches the ref-path forward under the same sharding."""
    from nanovllm_tpu.models.qwen3 import Qwen3Config, create_kv_caches, forward, init_params
    from nanovllm_tpu.parallel.sharding import shard_kv_caches, shard_params
    from nanovllm_tpu.utils.metadata import build_metadata

    cfg = Qwen3Config(
        vocab_size=256, hidden_size=256, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=128, tie_word_embeddings=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    mesh = build_mesh(tensor_parallel_size=2)

    def decode_batch():
        # Two sequences mid-decode: ctx includes the token written this step.
        seqs_meta = [
            {"token_ids": [5] * 9, "num_cached": 8, "block_table": [1]},
            {"token_ids": [7] * 21, "num_cached": 20, "block_table": [2, 3]},
        ]
        return build_metadata(seqs_meta, 16, T=2, S=2, max_blocks=2, Q=1)

    outs = {}
    for impl, use_mesh in (("ref", False), ("pallas_decode", True)):
        kc, vc = create_kv_caches(cfg, 8, 16, jnp.float32)
        p = params
        if use_mesh:
            p = shard_params(mesh, params, cfg.tie_word_embeddings)
            kc, vc = shard_kv_caches(mesh, kc, vc)
        tokens, meta = decode_batch()
        # Pre-fill the cache history deterministically through the ref path
        # so both impls attend identical KV.
        hist_meta = build_metadata(
            [{"token_ids": [5] * 8, "num_cached": 0, "block_table": [1]},
             {"token_ids": [7] * 20, "num_cached": 0, "block_table": [2, 3]}],
            16, T=28, S=2, max_blocks=2, Q=20,
        )
        _, kc, vc = forward(cfg, p, kc, vc, jnp.asarray(hist_meta[0]), hist_meta[1])
        logits, _, _ = forward(
            cfg, p, kc, vc, jnp.asarray(tokens), meta,
            attn_impl=impl, mesh=mesh if use_mesh else None,
        )
        outs[impl] = np.asarray(logits)
    np.testing.assert_allclose(outs["pallas_decode"], outs["ref"], rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Quantized (tuple) caches under the mesh — the BASELINE config-4/5 serving
# combination (VERDICT r2 weak #4: previously gated off and untested).
# ---------------------------------------------------------------------------

def _quant_tuple_cache(c, qdtype=jnp.int8):
    """Quantize a float cache [L,NB,Hkv,BS,Dh] to (data, per-row scales)."""
    from nanovllm_tpu.ops.attention import kv_cache_write

    L, NB, Hkv, BS, Dh = c.shape
    out = (jnp.zeros(c.shape, qdtype), jnp.zeros(c.shape[:-1], jnp.float32))
    slots = jnp.arange(NB * BS, dtype=jnp.int32)
    for li in range(L):
        flat = jnp.swapaxes(c[li], 1, 2).reshape(NB * BS, Hkv, Dh)
        out = kv_cache_write(out, flat, slots, li)
    return out


@pytest.mark.parametrize("tp", [2])
def test_sharded_decode_quantized_tuple_matches_single(tp):
    case = _make_decode_case(seed=31, Hq=8, Hkv=4, ctx_lens=(5, 20, 33, 48))
    q, k_new, v_new, kc, vc, layer, bt, cl = case
    kct, vct = _quant_tuple_cache(kc), _quant_tuple_cache(vc)
    scale = 0.09
    ref = paged_attention_decode(q, k_new, v_new, kct, vct, layer, bt, cl,
                                 scale=scale, interpret=True)
    mesh = build_mesh(tensor_parallel_size=tp)
    sh = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    dspec = P(None, None, AXIS_MODEL, None, None)
    sspec = P(None, None, AXIS_MODEL, None)
    got = sharded_paged_attention_decode(
        mesh,
        sh(q, P(None, AXIS_MODEL, None)),
        sh(k_new, P(None, AXIS_MODEL, None)),
        sh(v_new, P(None, AXIS_MODEL, None)),
        (sh(kct[0], dspec), sh(kct[1], sspec)),
        (sh(vct[0], dspec), sh(vct[1], sspec)),
        jnp.int32(layer), bt, cl, scale=scale, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("tp", [2])
def test_sharded_window_attention_quantized_matches_single(tp):
    """sharded_paged_attention_window with int8 tuple caches == the plain
    kernel (history + staged rows + current row, scales folded in-kernel)."""
    from nanovllm_tpu.ops.pallas.paged_attention import paged_attention_window
    from nanovllm_tpu.ops.pallas.sharded import sharded_paged_attention_window

    case = _make_decode_case(seed=37, Hq=8, Hkv=4, ctx_lens=(5, 20, 33, 48))
    q, k_new, v_new, kc, vc, layer, bt, cl = case
    kct, vct = _quant_tuple_cache(kc), _quant_tuple_cache(vc)
    S, Hq, Dh = q.shape
    L, _, Hkv, BS, _ = kc.shape
    W = 4
    rng = jax.random.PRNGKey(41)
    k_st = jax.random.normal(rng, (L, S, Hkv, W, Dh), jnp.float32)
    v_st = jax.random.normal(jax.random.fold_in(rng, 1), (L, S, Hkv, W, Dh), jnp.float32)
    start = jnp.maximum(cl - 1, 0)
    substep = jnp.int32(2)
    scale = 0.09
    ref = paged_attention_window(
        q, k_new, v_new, k_st, v_st, kct, vct, jnp.int32(layer), bt, start,
        substep, scale=scale, interpret=True,
    )
    mesh = build_mesh(tensor_parallel_size=tp)
    sh = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    dspec = P(None, None, AXIS_MODEL, None, None)
    sspec = P(None, None, AXIS_MODEL, None)
    got = sharded_paged_attention_window(
        mesh,
        sh(q, P(None, AXIS_MODEL, None)),
        sh(k_new, P(None, AXIS_MODEL, None)),
        sh(v_new, P(None, AXIS_MODEL, None)),
        sh(k_st, P(None, None, AXIS_MODEL, None, None)),
        sh(v_st, P(None, None, AXIS_MODEL, None, None)),
        (sh(kct[0], dspec), sh(kct[1], sspec)),
        (sh(vct[0], dspec), sh(vct[1], sspec)),
        jnp.int32(layer), bt, start, substep, scale=scale, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("tp", [2])
def test_sharded_window_commit_quantized_matches_single(tp):
    """sharded_kv_window_commit with int8 tuple caches == the plain kernel
    (data spans AND scale-plane spans)."""
    from nanovllm_tpu.ops.pallas.paged_attention import kv_window_commit
    from nanovllm_tpu.ops.pallas.sharded import sharded_kv_window_commit

    rng = jax.random.PRNGKey(43)
    S, Hkv, Dh, NB, L, W, BS = 4, 4, 128, 16, 2, 4, 16
    starts = (5, 15, 32, 7)
    k_win = jax.random.normal(rng, (S, Hkv, W, Dh), jnp.float32)
    v_win = jax.random.normal(jax.random.fold_in(rng, 1), (S, Hkv, W, Dh), jnp.float32)
    shape = (L, NB, Hkv, BS, Dh)
    kc = (jnp.zeros(shape, jnp.int8), jnp.zeros(shape[:-1], jnp.float32))
    vc = (jnp.zeros(shape, jnp.int8), jnp.zeros(shape[:-1], jnp.float32))
    bt = np.full((S, 6), -1, np.int32)
    nxt = 1
    for i, st in enumerate(starts):
        nb = (st + W - 1) // BS + 1
        bt[i, :nb] = range(nxt, nxt + nb)
        nxt += nb
    bt = jnp.asarray(bt)
    start = jnp.asarray(starts, jnp.int32)
    valid = jnp.ones((S,), jnp.int32)

    # kv_window_commit donates the caches — give the reference call copies.
    ref_kc, ref_vc = kv_window_commit(
        k_win, v_win, (kc[0] + 0, kc[1] + 0), (vc[0] + 0, vc[1] + 0),
        1, bt, start, valid, interpret=True,
    )
    mesh = build_mesh(tensor_parallel_size=tp)
    sh = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    dspec = P(None, None, AXIS_MODEL, None, None)
    sspec = P(None, None, AXIS_MODEL, None)
    got_kc, got_vc = sharded_kv_window_commit(
        mesh,
        sh(k_win, P(None, AXIS_MODEL, None, None)),
        sh(v_win, P(None, AXIS_MODEL, None, None)),
        (sh(kc[0], dspec), sh(kc[1], sspec)),
        (sh(vc[0], dspec), sh(vc[1], sspec)),
        jnp.int32(1), bt, start, valid, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got_kc[0], np.float32), np.asarray(ref_kc[0], np.float32))
    np.testing.assert_allclose(np.asarray(got_kc[1]), np.asarray(ref_kc[1]), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(got_vc[0], np.float32), np.asarray(ref_vc[0], np.float32))
    np.testing.assert_allclose(np.asarray(got_vc[1]), np.asarray(ref_vc[1]), rtol=1e-6)


@pytest.mark.parametrize("tp_mode", ["column", "row"])
def test_sharded_quant_matmul_matches_jnp(tp_mode):
    """int4 fused matmul under TP (column: out-sharded; row: in-sharded +
    psum) == the jnp dequant oracle (BASELINE config-4's int4 x TP path)."""
    from nanovllm_tpu.ops.pallas.sharded import sharded_quant_matmul
    from nanovllm_tpu.ops.quant import dequantize, quantize

    rng = jax.random.PRNGKey(7)
    IN, OUT, S = 512, 256, 16
    x = jax.random.normal(jax.random.fold_in(rng, 0), (S, IN), jnp.float32)
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (IN, OUT), jnp.float32)
    qt = quantize(w, 4)
    ref = np.asarray(x @ dequantize(qt, jnp.float32), np.float32)
    mesh = build_mesh(tensor_parallel_size=2)
    got = np.asarray(
        sharded_quant_matmul(mesh, x, qt, tp_mode, interpret=True), np.float32)
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


@pytest.mark.parametrize("tp_mode", ["column", "row"])
def test_sharded_quant_matmul_asym_matches_jnp(tp_mode):
    """Asymmetric int4 under TP: the bias [in/G, out] shards like the
    scales; under row-parallel each shard's (Σx_g)·b_g partials psum to the
    exact total (the production config-4/5 int4 default path)."""
    from nanovllm_tpu.ops.pallas.sharded import sharded_quant_matmul
    from nanovllm_tpu.ops.quant import dequantize, quantize

    rng = jax.random.PRNGKey(8)
    IN, OUT, S = 512, 256, 16
    x = jax.random.normal(jax.random.fold_in(rng, 0), (S, IN), jnp.float32)
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (IN, OUT),
                          jnp.float32) + 1.0
    qt = quantize(w, 4, group_size=64, mode="asym")
    assert qt.bias is not None
    ref = np.asarray(x @ dequantize(qt, jnp.float32), np.float32)
    mesh = build_mesh(tensor_parallel_size=2)
    got = np.asarray(
        sharded_quant_matmul(mesh, x, qt, tp_mode, interpret=True), np.float32)
    # G=64 takes the kernel's in-register bf16 dequant (== a bf16 weight
    # store; see test_pallas_kernels asym notes) — bound normalized error
    # at the bf16 rounding level rather than element-wise f32 parity.
    scale = np.abs(ref).mean()
    err = np.abs(got - ref)
    assert err.max() / scale < 0.02, (err.max(), scale)
    assert err.mean() / scale < 3e-3, (err.mean(), scale)
