"""Kernel-vs-jnp equivalence tests (SURVEY §4: Pallas vs jnp oracles).

Kernels run in interpret mode on CPU; the same call sites compile natively
on TPU. Shapes mirror real decode batches: GQA, ragged context lengths,
padded rows and padded block-table entries. The decode kernel fuses the
KV-cache write, so the oracle is (jnp kv_cache_write; then gather ref
attention) and both the attention output AND the updated caches must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from nanovllm_tpu.ops.attention import kv_cache_write, paged_attention_ref
from nanovllm_tpu.ops.pallas.paged_attention import (
    kv_cache_commit,
    paged_attention_decode,
)
from nanovllm_tpu.utils.metadata import AttentionMetadata


def _make_decode_case(seed=0, S=4, Hq=8, Hkv=4, Dh=128, BS=16, NB=32, MAXBLK=4,
                      ctx_lens=(1, 17, 33, 0), dtype=jnp.float32):
    """Random caches + per-seq block tables with ragged context lengths.
    ctx_lens[i] includes this step's token; 0 marks a padded row."""
    rng = jax.random.PRNGKey(seed)
    kq, kk, kv, kkn, kvn = jax.random.split(rng, 5)
    L = 2
    layer = 1
    q = jax.random.normal(kq, (S, Hq, Dh), dtype)
    k_cache = jax.random.normal(kk, (L, NB, Hkv, BS, Dh), dtype)
    v_cache = jax.random.normal(kv, (L, NB, Hkv, BS, Dh), dtype)
    k_new = jax.random.normal(kkn, (S, Hkv, Dh), dtype)
    v_new = jax.random.normal(kvn, (S, Hkv, Dh), dtype)

    block_tables = np.full((S, MAXBLK), -1, np.int32)
    next_blk = 1
    for i, c in enumerate(ctx_lens):
        nb = -(-c // BS)
        block_tables[i, :nb] = range(next_blk, next_blk + nb)
        next_blk += nb
    context_lens = np.asarray(ctx_lens, np.int32)
    return (q, k_new, v_new, k_cache, v_cache, layer,
            jnp.asarray(block_tables), jnp.asarray(context_lens))


def _ref_decode(q, k_new, v_new, k_cache, v_cache, layer, block_tables,
                context_lens, scale, block_size):
    """jnp oracle: scatter this step's K/V, then gather-attend."""
    S = q.shape[0]
    rows = jnp.arange(S, dtype=jnp.int32)
    valid = context_lens > 0
    pos = jnp.maximum(context_lens - 1, 0)
    blk = jnp.take_along_axis(
        block_tables, (pos // block_size)[:, None], axis=1
    )[:, 0]
    slots = jnp.where(valid, blk * block_size + pos % block_size, -1)
    k_cache = kv_cache_write(k_cache, k_new, slots, layer)
    v_cache = kv_cache_write(v_cache, v_new, slots, layer)
    meta = AttentionMetadata(
        slot_mapping=slots,
        positions=pos,
        token_seq=rows,
        token_qcol=jnp.zeros((S,), jnp.int32),
        block_tables=block_tables,
        context_lens=context_lens,
        logits_idx=rows,
        q_gather=rows[:, None],
        q_positions=jnp.where(valid, context_lens - 1, -1)[:, None],
    )
    out = paged_attention_ref(q, k_cache, v_cache, layer, meta, scale)
    return out, k_cache, v_cache


def _check(case, scale=None, BS=16, out_tol=2e-5, cache_exact=True):
    q, k_new, v_new, kc, vc, layer, bt, cl = case
    scale = scale or q.shape[-1] ** -0.5
    ref_out, ref_kc, ref_vc = _ref_decode(
        q, k_new, v_new, kc, vc, layer, bt, cl, scale, BS
    )
    got_out = paged_attention_decode(
        q, k_new, v_new, kc, vc, layer, bt, cl, scale=scale, interpret=True
    )
    got_kc, got_vc = kv_cache_commit(
        k_new, v_new, kc, vc, layer, bt, cl, interpret=True
    )
    if cache_exact:
        np.testing.assert_array_equal(np.asarray(got_kc), np.asarray(ref_kc))
        np.testing.assert_array_equal(np.asarray(got_vc), np.asarray(ref_vc))
    ctx = np.asarray(cl)
    for i in range(q.shape[0]):
        if ctx[i] == 0:
            assert np.abs(np.asarray(got_out)[i]).max() == 0.0
        else:
            np.testing.assert_allclose(
                np.asarray(got_out, np.float32)[i],
                np.asarray(ref_out, np.float32)[i],
                rtol=out_tol, atol=out_tol,
            )


class TestPagedAttentionDecode:
    @pytest.mark.parametrize("ctx_lens", [(1, 17, 33, 0), (16, 16, 16, 16), (5, 0, 0, 0)])
    def test_matches_ref(self, ctx_lens):
        _check(_make_decode_case(ctx_lens=ctx_lens))

    def test_gqa_grouping(self):
        """Each query head must attend its own kv head (Hq=8 over Hkv=2)."""
        _check(_make_decode_case(seed=3, Hq=8, Hkv=2, ctx_lens=(20, 40, 7, 64)), scale=0.125)

    def test_wide_streaming(self):
        """MAXBLK > width forces multiple wide iterations per sequence."""
        _check(_make_decode_case(
            seed=5, MAXBLK=16, NB=80, ctx_lens=(255, 256, 129, 1)
        ))

    def test_bf16_cache(self):
        _check(
            _make_decode_case(seed=4, dtype=jnp.bfloat16, ctx_lens=(1, 17, 33, 64)),
            scale=0.1, out_tol=2e-2,
        )

    def test_write_targets_only_own_slot(self):
        """The fused write must touch exactly one (layer, block, offset) row
        per valid sequence and nothing else."""
        q, k_new, v_new, kc, vc, layer, bt, cl = _make_decode_case(
            seed=6, ctx_lens=(1, 17, 33, 0)
        )
        kc_before = np.asarray(kc)  # snapshot: the commit donates kc
        got_kc, _ = kv_cache_commit(
            k_new, v_new, kc, vc, layer, bt, cl, interpret=True
        )
        diff = np.asarray(got_kc) != kc_before
        # Changed rows: for each valid seq, (layer, blk, :, off, :).
        changed = set(zip(*np.nonzero(diff.any(axis=(2, 4)))))
        expect = set()
        BS = 16
        for i, c in enumerate((1, 17, 33, 0)):
            if c == 0:
                continue
            pos = c - 1
            expect.add((layer, int(np.asarray(bt)[i, pos // BS]), pos % BS))
        assert changed <= expect  # identical values may produce no diff


class TestQuantizedKVDecode:
    """Quantized tuple caches (int8 / fp8-e4m3 data + per-row f32 scales):
    the kernels must produce bit-identical cache contents to the jnp tuple
    path (same quantization math) and attention outputs within quantization
    tolerance (the kernel patches the current token at full precision; the
    oracle reads it back quantized)."""

    @staticmethod
    def _quantize_case(case, qdtype):
        q, k_new, v_new, kc, vc, layer, bt, cl = case
        L, NB, Hkv, BS, Dh = kc.shape

        def to_tuple(c):
            # Fill via the jnp tuple writer so contents are valid quantized
            # rows with matching scales.
            out = (jnp.zeros(c.shape, qdtype), jnp.zeros(c.shape[:-1], jnp.float32))
            slots = jnp.arange(NB * BS, dtype=jnp.int32)
            for layer_i in range(L):
                flat = jnp.swapaxes(c[layer_i], 1, 2).reshape(NB * BS, Hkv, Dh)
                out = kv_cache_write(out, flat, slots, layer_i)
            return out

        return (q, k_new, v_new, to_tuple(kc), to_tuple(vc), layer, bt, cl)

    @pytest.mark.parametrize("qdtype", [jnp.int8, jnp.float8_e4m3fn])
    @pytest.mark.parametrize("ctx_lens", [(1, 17, 33, 0), (16, 16, 16, 16)])
    def test_matches_tuple_oracle(self, qdtype, ctx_lens):
        case = self._quantize_case(
            _make_decode_case(seed=8, ctx_lens=ctx_lens), qdtype
        )
        q, k_new, v_new, kc, vc, layer, bt, cl = case
        scale = q.shape[-1] ** -0.5
        ref_out, ref_kc, ref_vc = _ref_decode(
            q, k_new, v_new, kc, vc, layer, bt, cl, scale, 16
        )
        got_out = paged_attention_decode(
            q, k_new, v_new, kc, vc, layer, bt, cl, scale=scale, interpret=True
        )
        got_kc, got_vc = kv_cache_commit(
            k_new, v_new, kc, vc, layer, bt, cl, interpret=True
        )
        for got, ref in ((got_kc, ref_kc), (got_vc, ref_vc)):
            np.testing.assert_array_equal(
                np.asarray(got[0], np.float32), np.asarray(ref[0], np.float32)
            )
            np.testing.assert_allclose(
                np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-6
            )
        ctx = np.asarray(cl)
        for i in range(q.shape[0]):
            if ctx[i] == 0:
                assert np.abs(np.asarray(got_out)[i]).max() == 0.0
            else:
                np.testing.assert_allclose(
                    np.asarray(got_out, np.float32)[i],
                    np.asarray(ref_out, np.float32)[i],
                    rtol=0.06, atol=0.06,
                )

    def test_big_blocks_tile_granularity(self):
        """BS=256 exercises the (32,128) int8 data tile and the 128-lane
        scale-plane RMW (the bench shape's path)."""
        case = self._quantize_case(
            _make_decode_case(seed=9, BS=256, NB=8, MAXBLK=2,
                              ctx_lens=(255, 256, 129, 1)),
            jnp.int8,
        )
        q, k_new, v_new, kc, vc, layer, bt, cl = case
        scale = 0.1
        ref_out, ref_kc, ref_vc = _ref_decode(
            q, k_new, v_new, kc, vc, layer, bt, cl, scale, 256
        )
        got_out = paged_attention_decode(
            q, k_new, v_new, kc, vc, layer, bt, cl, scale=scale, interpret=True
        )
        got_kc, got_vc = kv_cache_commit(
            k_new, v_new, kc, vc, layer, bt, cl, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(got_kc[0]), np.asarray(ref_kc[0])
        )
        np.testing.assert_allclose(
            np.asarray(got_kc[1]), np.asarray(ref_kc[1]), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(got_vc[0]), np.asarray(ref_vc[0])
        )
        for i, c in enumerate((255, 256, 129, 1)):
            np.testing.assert_allclose(
                np.asarray(got_out, np.float32)[i],
                np.asarray(ref_out, np.float32)[i],
                rtol=0.06, atol=0.06,
            )


# ---------------------------------------------------------------------------
# Prefill flash kernel
# ---------------------------------------------------------------------------

from nanovllm_tpu.ops.pallas.flash_prefill import paged_attention_prefill
from nanovllm_tpu.utils.metadata import build_metadata


def _make_prefill_case(seed, specs, Hq=8, Hkv=4, Dh=128, BS=16, dtype=jnp.float32):
    """specs: list of (prompt_len, num_cached). Builds caches whose history
    (cached prefixes) is random, scatters the batch K/V, and returns
    everything needed to run both impls."""
    rng = jax.random.PRNGKey(seed)
    L, layer = 2, 1
    T = sum(p - c for p, c in specs)
    S = len(specs)
    Q = max(p - c for p, c in specs)
    max_blocks = max(-(-p // BS) for p, c in specs)
    NB = 1 + S * max_blocks

    seqs_meta = []
    nxt = 1
    for i, (plen, cached) in enumerate(specs):
        ids = [(i * 31 + j) % 97 for j in range(plen)]
        nb = -(-plen // BS)
        seqs_meta.append({"token_ids": ids, "num_cached": cached,
                          "block_table": list(range(nxt, nxt + nb))})
        nxt += nb
    tokens, meta = build_metadata(seqs_meta, BS, T=T, S=S, max_blocks=max_blocks, Q=Q)

    q = jax.random.normal(jax.random.fold_in(rng, 1), (T, Hq, Dh), dtype)
    k_cache = jax.random.normal(jax.random.fold_in(rng, 2), (L, NB, Hkv, BS, Dh), dtype)
    v_cache = jax.random.normal(jax.random.fold_in(rng, 3), (L, NB, Hkv, BS, Dh), dtype)
    # Scatter this batch's K/V (shared contract of both impls).
    k_new = jax.random.normal(jax.random.fold_in(rng, 4), (T, Hkv, Dh), dtype)
    v_new = jax.random.normal(jax.random.fold_in(rng, 5), (T, Hkv, Dh), dtype)
    k_cache = kv_cache_write(k_cache, k_new, jnp.asarray(meta.slot_mapping), layer)
    v_cache = kv_cache_write(v_cache, v_new, jnp.asarray(meta.slot_mapping), layer)
    return q, k_cache, v_cache, layer, meta


class TestFlashPrefill:
    @pytest.mark.parametrize("specs", [
        [(8, 0), (16, 0), (33, 0)],            # pure varlen prefill
        [(48, 32), (20, 16), (5, 0)],          # cached prefixes (prefix hits)
        [(16, 15)],                            # single query after deep cache
        [(130, 0), (200, 64)],                 # multiple q tiles per seq
    ])
    def test_matches_ref(self, specs):
        q, kc, vc, layer, meta = _make_prefill_case(7, specs)
        scale = q.shape[-1] ** -0.5
        ref = paged_attention_ref(q, kc, vc, layer, meta, scale)
        got = paged_attention_prefill(
            q, kc, vc, layer, meta.block_tables, meta.context_lens,
            meta.q_gather, meta.q_positions, meta.token_seq, meta.token_qcol,
            scale=scale, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5
        )

    def test_bf16(self):
        q, kc, vc, layer, meta = _make_prefill_case(
            9, [(40, 16), (64, 0)], dtype=jnp.bfloat16
        )
        scale = 0.1
        ref = paged_attention_ref(q, kc, vc, layer, meta, scale)
        got = paged_attention_prefill(
            q, kc, vc, layer, meta.block_tables, meta.context_lens,
            meta.q_gather, meta.q_positions, meta.token_seq, meta.token_qcol,
            scale=scale, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=3e-2, atol=3e-2,
        )


class TestPrefillCommit:
    @pytest.mark.parametrize("specs", [
        [(8, 0), (16, 0), (33, 0)],
        [(48, 32), (20, 16), (5, 0)],
        [(64, 48)],
    ])
    def test_matches_scatter_on_valid_positions(self, specs):
        from nanovllm_tpu.ops.pallas.prefill_commit import prefill_kv_commit

        BS, Hkv, Dh, L, layer = 16, 4, 128, 2, 1
        T = sum(p - c for p, c in specs)
        S = len(specs)
        Q = max(p - c for p, c in specs)
        max_blocks = max(-(-p // BS) for p, c in specs)
        NB = 1 + S * max_blocks
        seqs_meta, nxt = [], 1
        for i, (plen, cached) in enumerate(specs):
            assert cached % BS == 0
            nb = -(-plen // BS)
            seqs_meta.append({"token_ids": list(range(plen)), "num_cached": cached,
                              "block_table": list(range(nxt, nxt + nb))})
            nxt += nb
        _, meta = build_metadata(seqs_meta, BS, T=T, S=S, max_blocks=max_blocks, Q=Q)

        rng = jax.random.PRNGKey(11)
        k_new = jax.random.normal(jax.random.fold_in(rng, 0), (T, Hkv, Dh), jnp.float32)
        v_new = jax.random.normal(jax.random.fold_in(rng, 1), (T, Hkv, Dh), jnp.float32)
        base_k = jax.random.normal(jax.random.fold_in(rng, 2), (L, NB, Hkv, BS, Dh), jnp.float32)
        base_v = jax.random.normal(jax.random.fold_in(rng, 3), (L, NB, Hkv, BS, Dh), jnp.float32)

        ref_k = kv_cache_write(base_k, k_new, jnp.asarray(meta.slot_mapping), layer)
        ref_v = kv_cache_write(base_v, v_new, jnp.asarray(meta.slot_mapping), layer)

        Qpad = -(-Q // BS) * BS
        def to_grid(x):
            g = x[jnp.clip(jnp.asarray(meta.q_gather), 0, T - 1)].transpose(0, 2, 1, 3)
            return jnp.pad(g, ((0, 0), (0, 0), (0, Qpad - Q), (0, 0)))
        qstart = jnp.asarray([c for _, c in specs], jnp.int32)
        got_k, got_v = prefill_kv_commit(
            to_grid(k_new), to_grid(v_new), base_k + 0, base_v + 0, layer,
            jnp.asarray(meta.block_tables), jnp.asarray(meta.context_lens),
            qstart // BS, interpret=True,
        )
        # Compare only valid positions: cached blocks (untouched), and
        # written positions < plen; tail rows of the last block are
        # explicitly don't-care.
        for i, (plen, cached) in enumerate(specs):
            table = seqs_meta[i]["block_table"]
            for bi, blk in enumerate(table):
                lo, hi = bi * BS, min((bi + 1) * BS, plen)
                np.testing.assert_array_equal(
                    np.asarray(got_k)[layer, blk, :, : hi - lo, :],
                    np.asarray(ref_k)[layer, blk, :, : hi - lo, :],
                )
                np.testing.assert_array_equal(
                    np.asarray(got_v)[layer, blk, :, : hi - lo, :],
                    np.asarray(ref_v)[layer, blk, :, : hi - lo, :],
                )
        # Other layers and unrelated blocks untouched.
        np.testing.assert_array_equal(np.asarray(got_k)[0], np.asarray(base_k)[0])
        used = {b for m in seqs_meta for b in m["block_table"]}
        for blk in range(NB):
            if blk not in used:
                np.testing.assert_array_equal(
                    np.asarray(got_k)[layer, blk], np.asarray(base_k)[layer, blk]
                )


class TestFusedQuantMatmul:
    @pytest.mark.parametrize("bits,S,IN,OUT", [
        (8, 16, 256, 384), (4, 16, 256, 384), (8, 8, 512, 1024), (4, 32, 1024, 512),
    ])
    def test_matches_jnp_dequant(self, bits, S, IN, OUT):
        from nanovllm_tpu.ops.pallas.quant_matmul import fusable, fused_quant_matmul
        from nanovllm_tpu.ops.quant import dequantize, quantize

        rng = jax.random.PRNGKey(bits * 1000 + IN)
        # The kernel feeds the MXU in bf16 (int8/int4 values are exact in
        # bf16; scales apply in f32 after the dot) — use bf16-representable
        # activations so the oracle computes on identical operand values.
        x = jax.random.normal(jax.random.fold_in(rng, 0), (S, IN), jnp.float32)
        x = x.astype(jnp.bfloat16).astype(jnp.float32)
        w = jax.random.normal(jax.random.fold_in(rng, 1), (IN, OUT), jnp.float32)
        qt = quantize(w, bits)
        assert fusable(x, qt)
        ref = x @ dequantize(qt, jnp.float32)
        got = fused_quant_matmul(x, qt, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_not_fusable_shapes(self):
        from nanovllm_tpu.ops.pallas.quant_matmul import fusable
        from nanovllm_tpu.ops.quant import quantize

        x = jnp.zeros((4, 96), jnp.float32)
        qt = quantize(jnp.ones((96, 100), jnp.float32), 8)
        assert not fusable(x, qt)

    @pytest.mark.parametrize("mode,G", [("sym", 128), ("asym", 64)])
    def test_stacked_layer_indexed_matches_sliced(self, mode, G):
        """The layer-STACKED kernel (scalar-prefetch layer index — the
        model scan's no-copy path) must equal the per-layer kernel on the
        sliced weight, for every layer."""
        from nanovllm_tpu.ops.pallas.quant_matmul import (
            fusable_stacked, fused_quant_matmul, fused_quant_matmul_stacked,
        )
        from nanovllm_tpu.ops.quant import quantize

        L = 3
        rng = jax.random.PRNGKey(5 + G)
        x = jax.random.normal(jax.random.fold_in(rng, 0), (8, 256), jnp.float32)
        x = x.astype(jnp.bfloat16).astype(jnp.float32)
        w = jax.random.normal(jax.random.fold_in(rng, 1), (L, 256, 384),
                              jnp.float32) + (0.5 if mode == "asym" else 0.0)
        qts = quantize(w, 4, group_size=G, mode=mode)
        assert fusable_stacked(x, qts)
        for l in range(L):
            qtl = jax.tree.map(lambda a, l=l: a[l], qts)
            ref = np.asarray(fused_quant_matmul(x, qtl, interpret=True))
            got = np.asarray(fused_quant_matmul_stacked(
                x, qts, jnp.int32(l), interpret=True))
            np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    # G=64 exercises the per-tile scale rows; G=-1 (per-channel) exercises
    # the G >= TI single-row path where one bias group spans many in-tiles.
    @pytest.mark.parametrize("G", [64, -1])
    def test_asym_bias_matches_jnp_dequant(self, G):
        """Asymmetric int4: the kernel's factored (Σx_g)·b_g rank-1 update
        must equal the oracle's explicit w = s·q + b dequant."""
        from nanovllm_tpu.ops.pallas.quant_matmul import fusable, fused_quant_matmul
        from nanovllm_tpu.ops.quant import dequantize, quantize

        rng = jax.random.PRNGKey(77 + (G or 0))
        x = jax.random.normal(jax.random.fold_in(rng, 0), (16, 256), jnp.float32)
        x = x.astype(jnp.bfloat16).astype(jnp.float32)
        # Shifted weights so the bias term is material, not noise.
        w = jax.random.normal(jax.random.fold_in(rng, 1), (256, 384),
                              jnp.float32) + 1.5
        qt = quantize(w, 4, group_size=G, mode="asym")
        assert qt.bias is not None
        assert fusable(x, qt)
        ref = np.asarray(x @ dequantize(qt, jnp.float32), np.float32)
        got = np.asarray(fused_quant_matmul(x, qt, interpret=True),
                         np.float32)
        if 0 < G < 128:
            # Fine groups take the in-register bf16 dequant path: the
            # kernel rounds q*s to bf16 (== storing the dequantized weight
            # in bf16, exactly the precision the bf16 baseline model keeps
            # its weights at), while the oracle dequantizes in f32 — bound
            # the NORMALIZED divergence at the bf16 rounding level
            # (2^-8 relative per weight, incoherent across the
            # contraction) instead of element-wise parity.
            scale = np.abs(ref).mean()
            err = np.abs(got - ref)
            assert err.max() / scale < 0.02, (err.max(), scale)
            assert err.mean() / scale < 3e-3, (err.mean(), scale)
        else:
            # Coarse groups (per-channel): f32 scales post-dot, f32 bias
            # dot — f32-oracle parity.
            np.testing.assert_allclose(got, ref, rtol=4e-3, atol=4e-3)


class TestPallasDequantize:
    def test_matches_jnp_dequantize(self):
        """The prefill-scale unpack-to-HBM path (bitcast int4 unpack +
        per-group scales) must equal the jnp oracle."""
        from nanovllm_tpu.ops.pallas.quant_matmul import (
            dequantizable, pallas_dequantize,
        )
        from nanovllm_tpu.ops.quant import dequantize, quantize

        w = jax.random.normal(jax.random.PRNGKey(5), (512, 384), jnp.float32)
        qt = quantize(w, 4)
        assert dequantizable(qt)
        ref = np.asarray(dequantize(qt, jnp.float32), np.float32)
        got = np.asarray(
            pallas_dequantize(qt, jnp.float32, interpret=True), np.float32)
        np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)

    def test_asym_bias_matches_jnp_dequantize(self):
        from nanovllm_tpu.ops.pallas.quant_matmul import (
            dequantizable, pallas_dequantize,
        )
        from nanovllm_tpu.ops.quant import dequantize, quantize

        w = jax.random.normal(jax.random.PRNGKey(6), (512, 384),
                              jnp.float32) - 0.7
        qt = quantize(w, 4, group_size=64, mode="asym")
        assert dequantizable(qt)
        ref = np.asarray(dequantize(qt, jnp.float32), np.float32)
        got = np.asarray(
            pallas_dequantize(qt, jnp.float32, interpret=True), np.float32)
        np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)
