"""shard_map wrappers: Pallas kernels under tensor parallelism.

pallas_call doesn't auto-partition: under a mesh, XLA would gather sharded
operands onto every device. Attention is embarrassingly parallel over
(kv-)heads — queries, new K/V, and the caches are all sharded on their head
dims over "model" — so each shard runs the SAME kernel on its local heads
with no collectives at all. shard_map makes that explicit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.experimental.shard_map as _shard_map_mod
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from nanovllm_tpu.parallel.mesh import AXIS_MODEL

_REP = P()


def sharded_paged_attention_decode(mesh: Mesh, q, k_new, v_new, k_cache,
                                   v_cache, layer_idx, block_tables,
                                   context_lens, *, scale: float,
                                   sliding_window: int = None,
                                   logit_softcap: float = None,
                                   interpret: bool = False):
    """paged_attention_decode with heads sharded over the model axis."""
    from nanovllm_tpu.ops.pallas.paged_attention import paged_attention_decode

    fn = partial(paged_attention_decode, scale=scale,
                 sliding_window=sliding_window, logit_softcap=logit_softcap,
                 interpret=interpret)
    cache_spec = P(None, None, AXIS_MODEL, None, None)
    if isinstance(k_cache, tuple):
        cache_spec = (cache_spec, P(None, None, AXIS_MODEL, None))
    return _shard_map_mod.shard_map(
        lambda *a: fn(*a),
        mesh=mesh,
        in_specs=(
            P(None, AXIS_MODEL, None),                 # q [S, Hq, Dh]
            P(None, AXIS_MODEL, None),                 # k_new [S, Hkv, Dh]
            P(None, AXIS_MODEL, None),                 # v_new
            cache_spec,                                # k_cache
            cache_spec,                                # v_cache
            _REP,                                      # layer_idx
            _REP,                                      # block_tables
            _REP,                                      # context_lens
        ),
        out_specs=P(None, AXIS_MODEL, None),
        check_rep=False,
    )(q, k_new, v_new, k_cache, v_cache, layer_idx, block_tables, context_lens)


def sharded_kv_cache_commit(mesh: Mesh, k_new, v_new, k_cache, v_cache,
                            layer_idx, block_tables, context_lens, *,
                            interpret: bool = False):
    from nanovllm_tpu.ops.pallas.paged_attention import kv_cache_commit

    fn = partial(kv_cache_commit, interpret=interpret)
    cache_spec = P(None, None, AXIS_MODEL, None, None)
    if isinstance(k_cache, tuple):
        cache_spec = (cache_spec, P(None, None, AXIS_MODEL, None))
    return _shard_map_mod.shard_map(
        lambda *a: fn(*a),
        mesh=mesh,
        in_specs=(
            P(None, AXIS_MODEL, None),
            P(None, AXIS_MODEL, None),
            cache_spec,
            cache_spec,
            _REP, _REP, _REP,
        ),
        out_specs=(cache_spec, cache_spec),
        check_rep=False,
    )(k_new, v_new, k_cache, v_cache, layer_idx, block_tables, context_lens)


def sharded_paged_attention_prefill(mesh: Mesh, q, k_cache, v_cache,
                                    layer_idx, block_tables, context_lens,
                                    q_gather, q_positions, token_seq,
                                    token_qcol, *, scale: float,
                                    sliding_window: int = None,
                                    logit_softcap: float = None,
                                    interpret: bool = False):
    from nanovllm_tpu.ops.pallas.flash_prefill import paged_attention_prefill

    fn = partial(paged_attention_prefill, scale=scale,
                 sliding_window=sliding_window, logit_softcap=logit_softcap,
                 interpret=interpret)
    cache_spec = P(None, None, AXIS_MODEL, None, None)
    if isinstance(k_cache, tuple):
        cache_spec = (cache_spec, P(None, None, AXIS_MODEL, None))
    return _shard_map_mod.shard_map(
        lambda *a: fn(*a),
        mesh=mesh,
        in_specs=(
            P(None, AXIS_MODEL, None),                 # q [T, Hq, Dh]
            cache_spec,
            cache_spec,
            _REP, _REP, _REP, _REP, _REP, _REP, _REP,
        ),
        out_specs=P(None, AXIS_MODEL, None),
        check_rep=False,
    )(q, k_cache, v_cache, layer_idx, block_tables, context_lens,
      q_gather, q_positions, token_seq, token_qcol)


def sharded_prefill_kv_commit(mesh: Mesh, k_grid, v_grid, k_cache, v_cache,
                              layer_idx, block_tables, context_lens,
                              cached_blocks, *, interpret: bool = False):
    from nanovllm_tpu.ops.pallas.prefill_commit import prefill_kv_commit

    fn = partial(prefill_kv_commit, interpret=interpret)
    cache_spec = P(None, None, AXIS_MODEL, None, None)
    if isinstance(k_cache, tuple):
        cache_spec = (cache_spec, P(None, None, AXIS_MODEL, None))
    return _shard_map_mod.shard_map(
        lambda *a: fn(*a),
        mesh=mesh,
        in_specs=(
            P(None, AXIS_MODEL, None, None),           # k_grid [S, Hkv, Q, Dh]
            P(None, AXIS_MODEL, None, None),
            cache_spec,
            cache_spec,
            _REP, _REP, _REP, _REP,
        ),
        out_specs=(cache_spec, cache_spec),
        check_rep=False,
    )(k_grid, v_grid, k_cache, v_cache, layer_idx, block_tables,
      context_lens, cached_blocks)


def sharded_paged_attention_decode_partial(mesh: Mesh, q, k_cache, v_cache,
                                           layer_idx, block_tables, kv_lens,
                                           *, scale: float,
                                           interpret: bool = False):
    """History-only flash decode (window mode) with heads sharded over the
    model axis; returns per-shard (acc, m, l) for the local heads."""
    from nanovllm_tpu.ops.pallas.paged_attention import paged_attention_decode_partial

    fn = partial(paged_attention_decode_partial, scale=scale, interpret=interpret)
    cache_spec = P(None, None, AXIS_MODEL, None, None)
    if isinstance(k_cache, tuple):
        cache_spec = (cache_spec, P(None, None, AXIS_MODEL, None))
    return _shard_map_mod.shard_map(
        lambda *a: fn(*a),
        mesh=mesh,
        in_specs=(
            P(None, AXIS_MODEL, None),                 # q [S, Hq, Dh]
            cache_spec,
            cache_spec,
            _REP, _REP, _REP,
        ),
        out_specs=(
            P(None, AXIS_MODEL, None),                 # acc [S, Hq, Dh]
            P(None, AXIS_MODEL),                       # m [S, Hq]
            P(None, AXIS_MODEL),                       # l [S, Hq]
        ),
        check_rep=False,
    )(q, k_cache, v_cache, layer_idx, block_tables, kv_lens)


def sharded_kv_window_commit(mesh: Mesh, k_win, v_win, k_cache, v_cache,
                             layer_idx, block_tables, start_lens, valid, *,
                             interpret: bool = False):
    """kv_window_commit with kv-heads sharded over the model axis."""
    from nanovllm_tpu.ops.pallas.paged_attention import kv_window_commit

    fn = partial(kv_window_commit, interpret=interpret)
    cache_spec = P(None, None, AXIS_MODEL, None, None)
    if isinstance(k_cache, tuple):
        cache_spec = (cache_spec, P(None, None, AXIS_MODEL, None))
    return _shard_map_mod.shard_map(
        lambda *a: fn(*a),
        mesh=mesh,
        in_specs=(
            P(None, AXIS_MODEL, None, None),           # k_win [S, Hkv, K, Dh]
            P(None, AXIS_MODEL, None, None),
            cache_spec,
            cache_spec,
            _REP, _REP, _REP, _REP,
        ),
        out_specs=(cache_spec, cache_spec),
        check_rep=False,
    )(k_win, v_win, k_cache, v_cache, layer_idx, block_tables, start_lens, valid)


def sharded_paged_attention_window(mesh: Mesh, q, k_new, v_new, k_staged,
                                   v_staged, k_cache, v_cache, layer_idx,
                                   block_tables, start_lens, substep,
                                   skip_blocks=None, init=None, *,
                                   scale: float, max_rem: int = None,
                                   sliding_window: int = None,
                                   logit_softcap: float = None,
                                   interpret: bool = False):
    """Unified window-mode decode attention with heads sharded over the
    model axis (history blocks + staging + current row all head-parallel).

    skip_blocks/init/max_rem: shared-prefix mode (see
    paged_attention_window) — the init flash state is head-sharded exactly
    like the attention itself, so the shared pass composes with TP with no
    collectives."""
    from nanovllm_tpu.ops.pallas.paged_attention import paged_attention_window

    fn = partial(paged_attention_window, scale=scale, max_rem=max_rem,
                 sliding_window=sliding_window, logit_softcap=logit_softcap,
                 interpret=interpret)
    cache_spec = P(None, None, AXIS_MODEL, None, None)
    if isinstance(k_cache, tuple):
        cache_spec = (cache_spec, P(None, None, AXIS_MODEL, None))
    in_specs = [
        P(None, AXIS_MODEL, None),                 # q [S, Hq, Dh]
        P(None, AXIS_MODEL, None),                 # k_new [S, Hkv, Dh]
        P(None, AXIS_MODEL, None),
        P(None, None, AXIS_MODEL, None, None),     # k_staged [L,S,Hkv,K,Dh]
        P(None, None, AXIS_MODEL, None, None),
        cache_spec,
        cache_spec,
        _REP, _REP, _REP, _REP,
    ]
    operands = [q, k_new, v_new, k_staged, v_staged, k_cache, v_cache,
                layer_idx, block_tables, start_lens, substep]
    if init is not None:
        in_specs += [
            _REP,                                  # skip_blocks [S]
            (
                P(None, AXIS_MODEL, None, None),   # init acc [S, Hkv, G, Dh]
                P(None, AXIS_MODEL, None),         # init m [S, Hkv, G]
                P(None, AXIS_MODEL, None),         # init l
            ),
        ]
        operands += [skip_blocks, init]
    return _shard_map_mod.shard_map(
        lambda *a: fn(*a),
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, AXIS_MODEL, None),
        check_rep=False,
    )(*operands)


def sharded_shared_prefix_partial(mesh: Mesh, q, k_cache, v_cache, layer_idx,
                                  shared_tables, shared_nblocks, *,
                                  scale: float, logit_softcap: float = None,
                                  interpret: bool = False):
    """shared_prefix_partial with heads sharded over the model axis; the
    returned flash state (acc, m, l) stays head-sharded for
    sharded_paged_attention_window's init operands."""
    from nanovllm_tpu.ops.pallas.paged_attention import shared_prefix_partial

    fn = partial(shared_prefix_partial, scale=scale,
                 logit_softcap=logit_softcap, interpret=interpret)
    cache_spec = P(None, None, AXIS_MODEL, None, None)
    if isinstance(k_cache, tuple):
        cache_spec = (cache_spec, P(None, None, AXIS_MODEL, None))
    return _shard_map_mod.shard_map(
        lambda *a: fn(*a),
        mesh=mesh,
        in_specs=(
            P(None, AXIS_MODEL, None),                 # q [S, Hq, Dh]
            cache_spec,
            cache_spec,
            _REP, _REP, _REP,
        ),
        out_specs=(
            P(None, AXIS_MODEL, None, None),           # acc [S, Hkv, G, Dh]
            P(None, AXIS_MODEL, None),                 # m [S, Hkv, G]
            P(None, AXIS_MODEL, None),                 # l
        ),
        check_rep=False,
    )(q, k_cache, v_cache, layer_idx, shared_tables, shared_nblocks)


def sharded_quant_matmul(mesh: Mesh, x, qt, tp: str, *,
                         interpret: bool = False):
    """Fused int4 dequant+matmul under tensor parallelism.

    tp="column": weight out-dim sharded over the model axis, x replicated
    on features -> output feature-sharded (qkv/gate_up).
    tp="row": weight in-dim sharded, x feature-sharded -> per-shard
    partial products psum'd over the model axis (o/down).
    Batch (dim 0) rides the data axis in both cases. Per-shard compute is
    the same fused kernel / dequant-to-HBM dispatch as single-chip
    (ops/pallas/quant_matmul.py)."""
    from nanovllm_tpu.ops.pallas.quant_matmul import (
        dequantizable,
        fusable,
        fused_quant_matmul,
        pallas_dequantize,
    )
    from nanovllm_tpu.ops.quant import QuantizedTensor, dequantize
    from nanovllm_tpu.parallel.mesh import AXIS_DATA

    import jax.numpy as jnp

    bits, G, pack = qt.bits, qt.group_size, qt.pack
    has_bias = qt.bias is not None

    def local(xl, data, scale, *bias):
        qtl = QuantizedTensor(data=data, scale=scale, bits=bits,
                              group_size=G, pack=pack,
                              bias=bias[0] if has_bias else None)
        if fusable(xl, qtl):
            out = fused_quant_matmul(xl, qtl, interpret=interpret)
        elif dequantizable(qtl):
            out = jnp.dot(xl, pallas_dequantize(qtl, xl.dtype,
                                                interpret=interpret),
                          preferred_element_type=xl.dtype)
        else:
            out = jnp.dot(xl, dequantize(qtl, xl.dtype),
                          preferred_element_type=xl.dtype)
        if tp == "row":
            out = jax.lax.psum(out, AXIS_MODEL)
        return out

    if tp == "column":
        x_spec = P(AXIS_DATA, None)
        data_spec = P(None, AXIS_MODEL)
        scale_spec = P(None, AXIS_MODEL)
        out_spec = P(AXIS_DATA, AXIS_MODEL)
    else:
        x_spec = P(AXIS_DATA, AXIS_MODEL)
        data_spec = P(AXIS_MODEL, None)
        # Group scales [in/G, out] shard along in/G; per-channel scales
        # (size-1 in dim) cannot — callers guard (quant_matmul falls back).
        # The asymmetric bias shares the scale's shape/sharding in both
        # orientations; under tp="row" each shard's groups contribute their
        # own (Σx_g)·b_g partials, which the psum sums — exact.
        scale_spec = P(AXIS_MODEL, None)
        out_spec = P(AXIS_DATA, None)

    in_specs = [x_spec, data_spec, scale_spec]
    operands = [x, qt.data, qt.scale]
    if has_bias:
        in_specs.append(scale_spec)
        operands.append(qt.bias)
    return _shard_map_mod.shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_spec,
        check_rep=False,
    )(*operands)
