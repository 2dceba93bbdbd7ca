"""Round-3 decode-attention variants: can native int8 MXU dots break the
~2.5 us/(seq*layer) wall?

The round-2 unified window kernel converts int8 KV blocks to bf16 BEFORE
the score/PV dots (paged_attention.py:1354). v5e's MXU runs int8 x int8 ->
int32 at 2x bf16 throughput with half the weight-load bytes, and the
weight load IS the measured bottleneck at GQA decode shapes (M=2 rows).
Variants measured here, all at the bench shape (S=32, Hkv=8, G=2, Dh=128,
BS=256, ctx=250, W=32, L=28 layers):

  base     — the shipping unified window kernel (reference timing)
  i8dot    — history dots in native int8: q quantized per (s,h) row in the
             XLA prologue (scale folded into scores next to the k scales);
             p folded with v scales then re-quantized per (h,g) row to int8
             for the PV dot (SageAttention-style, arXiv:2410.02367)
  xhead    — bf16 cross-head formulation: ONE [16,Dh]x[Dh,Hkv*BS] score dot
             and ONE [16,Hkv*BS]x[Hkv*BS,Dh] PV dot per (seq, block pair)
             instead of 8 batched per-head dots (8x fewer MXU issues; the
             8x extra FLOPs ride otherwise-idle MXU rows)
  xheadi8  — cross-head AND int8
  dmafloor — fetch the same blocks, trivial compute (sum) — the DMA floor

Each variant is numerically checked against a jnp oracle before timing.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.pallas.paged_attention import paged_attention_window

_NEG_INF = -1e30
rng = np.random.default_rng(0)
L, NB, Hkv, BS, Dh, Hq, S, K = 28, 70, 8, 256, 128, 16, 32, 32
G = Hq // Hkv
CTX = 250          # committed history length (window starts here)
SPS = 4
SCALE = 0.088


def _barrier(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[:8])


def timeit(fn, x0, *args, iters=50, warmup=3):
    x = x0
    for _ in range(warmup):
        x = fn(x, *args)
    _barrier(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args)
    _barrier(x)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------------------
# Variant kernels. Grid (S//SPS, cdiv(MAXBLK,2)), one window+finalize fold
# into the last step — same skeleton as the shipping kernel; only the
# history-block math varies.
# ---------------------------------------------------------------------------

def _win_update_bf16(q_hkv, kw, vw, k_new, v_new, start, j, m_scr, l_scr, acc_scr):
    """Final staged-window update (always bf16; 32 rows, cheap)."""
    B = kw.shape[1]
    pos3 = start + jax.lax.broadcasted_iota(jnp.int32, (Hkv, B, Dh), 1)
    sel = pos3 == start + j
    kw = jnp.where(sel, k_new[:, None, :], kw)
    vw = jnp.where(sel, v_new[:, None, :], vw)
    scores = jax.lax.dot_general(
        q_hkv, kw, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    pos_g = start + jax.lax.broadcasted_iota(jnp.int32, (Hkv, G, B), 2)
    scores = jnp.where(pos_g < start + j + 1, scores, _NEG_INF)
    m = m_scr[...]
    m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(scores - m_new)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), vw, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[...] = m_new


def make_kernel(variant, npar=2):
    xhead = variant.startswith("xhead")
    i8 = variant.endswith("i8dot") or variant.endswith("i8")

    def kernel(layer_ref, tables_ref, start_ref, sub_ref,
               q_ref, qs_ref, k_new_ref, v_new_ref, kw_ref, vw_ref,
               *refs):
        ncache = 2 * npar * SPS * 2  # data + scale refs
        cache_refs = refs[:ncache]
        out_ref, m_scr, l_scr, acc_scr = refs[ncache:]

        ss = pl.program_id(0)
        it = pl.program_id(1)
        last_it = pl.num_programs(1) - 1
        j = sub_ref[0]

        @pl.when(it == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        for a in range(SPS):
            seq = ss * SPS + a
            start = start_ref[seq]
            nb = pl.cdiv(start, BS)
            msl = (m_scr.at[a], l_scr.at[a], acc_scr.at[a])

            for par in range(npar):
                k_ref = cache_refs[2 * npar * a + 2 * par]
                v_ref = cache_refs[2 * npar * a + 2 * par + 1]
                ks_ref = cache_refs[2 * npar * SPS + 2 * npar * a + 2 * par]
                vs_ref = cache_refs[2 * npar * SPS + 2 * npar * a + 2 * par + 1]

                @pl.when(npar * it + par < nb)
                def _(a=a, par=par, k_ref=k_ref, v_ref=v_ref,
                      ks_ref=ks_ref, vs_ref=vs_ref, start=start, msl=msl):
                    m_s, l_s, acc_s = msl
                    pos_base = (npar * it + par) * BS
                    ks = ks_ref[0, 0]            # [Hkv, BS] f32
                    vs = vs_ref[0, 0]
                    if not xhead:
                        if i8:
                            qi = q_ref[a].reshape(Hkv, G, Dh)       # int8
                            qsc = qs_ref[a].reshape(Hkv, G)         # f32
                            s32 = jax.lax.dot_general(
                                qi, k_ref[0, 0],
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
                            scores = (s32.astype(jnp.float32)
                                      * qsc[:, :, None] * ks[:, None, :])
                        else:
                            qb = q_ref[a].reshape(Hkv, G, Dh)       # bf16
                            k = k_ref[0, 0].astype(jnp.bfloat16)
                            scores = jax.lax.dot_general(
                                qb, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
                            scores = scores * ks[:, None, :] * SCALE
                        pos_g = pos_base + jax.lax.broadcasted_iota(
                            jnp.int32, (Hkv, G, BS), 2)
                        scores = jnp.where(pos_g < start, scores, _NEG_INF)
                        m = m_s[...]
                        m_new = jnp.maximum(
                            m, jnp.max(scores, axis=-1, keepdims=True))
                        alpha = jnp.exp(m - m_new)
                        p = jnp.exp(scores - m_new)
                        l_s[...] = (l_s[...] * alpha
                                    + jnp.sum(p, axis=-1, keepdims=True))
                        if i8:
                            pv_ = p * vs[:, None, :]
                            pmax = jnp.max(jnp.abs(pv_), axis=-1)
                            psc = jnp.maximum(pmax / 127.0, 1e-30)
                            p_i8 = jnp.clip(
                                jnp.round(pv_ / psc[..., None]), -127, 127
                            ).astype(jnp.int8)
                            pv32 = jax.lax.dot_general(
                                p_i8, v_ref[0, 0],
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
                            pv = pv32.astype(jnp.float32) * psc[..., None]
                        else:
                            pw = (p * vs[:, None, :]).astype(jnp.bfloat16)
                            v = v_ref[0, 0].astype(jnp.bfloat16)
                            pv = jax.lax.dot_general(
                                pw, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
                        acc_s[...] = acc_s[...] * alpha + pv
                        m_s[...] = m_new
                    else:
                        # Cross-head: flatten heads into one dot.
                        N = Hkv * BS
                        kflat = k_ref[0, 0].reshape(N, Dh)
                        vflat = v_ref[0, 0].reshape(N, Dh)
                        ksf = ks.reshape(1, N)
                        vsf = vs.reshape(1, N)
                        row_head = jax.lax.broadcasted_iota(
                            jnp.int32, (Hq, N), 0) // G
                        col_head = jax.lax.broadcasted_iota(
                            jnp.int32, (Hq, N), 1) // BS
                        colpos = pos_base + jax.lax.broadcasted_iota(
                            jnp.int32, (Hq, N), 1) % BS
                        live = (row_head == col_head) & (colpos < start)
                        if i8:
                            qi = q_ref[a]                    # [Hq, Dh] int8
                            qsc = qs_ref[a].reshape(Hq, 1)
                            s32 = jax.lax.dot_general(
                                qi, kflat, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
                            scores = s32.astype(jnp.float32) * qsc * ksf
                        else:
                            qb = q_ref[a]                    # [Hq, Dh] bf16
                            kb = kflat.astype(jnp.bfloat16)
                            scores = jax.lax.dot_general(
                                qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            scores = scores * ksf * SCALE
                        scores = jnp.where(live, scores, _NEG_INF)
                        m = m_s[...].reshape(Hq, 1)
                        m_new = jnp.maximum(
                            m, jnp.max(scores, axis=-1, keepdims=True))
                        alpha = jnp.exp(m - m_new)
                        p = jnp.exp(scores - m_new)
                        l_s[...] = (l_s[...] * alpha.reshape(Hkv, G, 1)
                                    + jnp.sum(p, axis=-1).reshape(Hkv, G, 1))
                        if i8:
                            pv_ = p * vsf
                            pmax = jnp.max(jnp.abs(pv_), axis=-1)
                            psc = jnp.maximum(pmax / 127.0, 1e-30)
                            p_i8 = jnp.clip(
                                jnp.round(pv_ / psc[:, None]), -127, 127
                            ).astype(jnp.int8)
                            pv32 = jax.lax.dot_general(
                                p_i8, vflat, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
                            pv = pv32.astype(jnp.float32) * psc[:, None]
                        else:
                            pw = (p * vsf).astype(jnp.bfloat16)
                            vb = vflat.astype(jnp.bfloat16)
                            pv = jax.lax.dot_general(
                                pw, vb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        acc_s[...] = (acc_s[...]
                                      * alpha.reshape(Hkv, G, 1)
                                      + pv.reshape(Hkv, G, Dh))
                        m_s[...] = m_new.reshape(Hkv, G, 1)

            @pl.when(it == last_it)
            def _(a=a, start=start, msl=msl):
                m_s, l_s, acc_s = msl
                # Window rows always attend in bf16 (32 rows, cheap); the
                # update wants q pre-scaled by SCALE. Under int8 variants
                # q_i8 * qs == q * SCALE already.
                if i8:
                    qb = (q_ref[a].reshape(Hkv, G, Dh).astype(jnp.float32)
                          * qs_ref[a].reshape(Hkv, G)[..., None]
                          ).astype(jnp.bfloat16)
                else:
                    qb = (q_ref[a].reshape(Hkv, G, Dh).astype(jnp.float32)
                          * SCALE).astype(jnp.bfloat16)
                kw = kw_ref[0, a].astype(jnp.bfloat16)
                vw = vw_ref[0, a].astype(jnp.bfloat16)
                _win_update_bf16(qb, kw, vw,
                                 k_new_ref[a].astype(jnp.bfloat16),
                                 v_new_ref[a].astype(jnp.bfloat16),
                                 start, j, m_s, l_s, acc_s)
                l = l_s[...]
                out = jnp.where(l > 0, acc_s[...] / jnp.maximum(l, 1e-30), 0.0)
                out_ref[a] = out.reshape(Hq, Dh).astype(out_ref.dtype)

    return kernel


def _make_dmafloor_kernel(npar):
  def _dmafloor_kernel(layer_ref, tables_ref, start_ref, sub_ref,
                     q_ref, qs_ref, k_new_ref, v_new_ref, kw_ref, vw_ref,
                     *refs):
    cache_refs = refs[:2 * npar * SPS * 2]
    out_ref, m_scr, l_scr, acc_scr = refs[2 * npar * SPS * 2:]
    it = pl.program_id(1)
    last_it = pl.num_programs(1) - 1

    @pl.when(it == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    for a in range(SPS):
        for par in range(npar):
            k_ref = cache_refs[2 * npar * a + 2 * par]
            v_ref = cache_refs[2 * npar * a + 2 * par + 1]
            # Touch one row per fetched block — the pipeline performs the
            # full-block DMA regardless; this measures the fetch floor.
            acc_scr[a] = acc_scr[a] + (
                k_ref[0, 0, :, 0, :].astype(jnp.float32)[:, None, :]
                + v_ref[0, 0, :, 0, :].astype(jnp.float32)[:, None, :])

    @pl.when(it == last_it)
    def _():
        for a in range(SPS):
            out_ref[a] = acc_scr[a].reshape(Hq, Dh).astype(out_ref.dtype)
  return _dmafloor_kernel


def run_variant(variant, q, qcache, tables, start_lens, kn, vn, kst, vst, substep,
                npar=2):
    """Build + call one variant; returns jitted chained fn."""
    (kc, ksc), (vc, vsc) = qcache
    MAXBLK = tables.shape[1]

    if variant in ("i8dot", "xheadi8"):
        qf = q.astype(jnp.float32) * SCALE
        amax = jnp.max(jnp.abs(qf), axis=-1)               # [S, Hq]
        qs = jnp.maximum(amax / 127.0, 1e-30)
        q_in = jnp.clip(jnp.round(qf / qs[..., None]), -127, 127).astype(jnp.int8)
    else:
        q_in = q
        qs = jnp.full(q.shape[:2], SCALE, jnp.float32)
    # Carry scales as [S, Hq, 1]: a (SPS, Hq) block of [S, Hq] violates the
    # (8, 128) min-tile rule; (Hq, 1) matches the trailing array dims.
    qs = qs[..., None]

    def kv_index(a, par):
        def index(ss, it, layer_ref, tables_ref, start_ref, sub_ref):
            seq = ss * SPS + a
            nb = jnp.maximum(pl.cdiv(start_ref[seq], BS), 1)
            blk = tables_ref[seq, jnp.minimum(npar * it + par, nb - 1)]
            return (layer_ref[0], blk, 0, 0, 0)
        return index

    def scale_index(a, par):
        def index(ss, it, layer_ref, tables_ref, start_ref, sub_ref):
            seq = ss * SPS + a
            nb = jnp.maximum(pl.cdiv(start_ref[seq], BS), 1)
            blk = tables_ref[seq, jnp.minimum(npar * it + par, nb - 1)]
            return (layer_ref[0], blk, 0, 0)
        return index

    def staged_index(ss, it, layer_ref, *_):
        return (layer_ref[0], ss, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((SPS, Hq, Dh), lambda ss, it, *p: (ss, 0, 0)),
        pl.BlockSpec((SPS, Hq, 1), lambda ss, it, *p: (ss, 0, 0)),
        pl.BlockSpec((SPS, Hkv, Dh), lambda ss, it, *p: (ss, 0, 0)),
        pl.BlockSpec((SPS, Hkv, Dh), lambda ss, it, *p: (ss, 0, 0)),
        pl.BlockSpec((1, SPS, Hkv, K, Dh), staged_index),
        pl.BlockSpec((1, SPS, Hkv, K, Dh), staged_index),
    ]
    kernel = (_make_dmafloor_kernel(npar) if variant.startswith("dmafloor")
              else make_kernel(variant, npar))

    def call(q_in, layer, kc, vc, ksc, vsc):
        specs = list(in_specs)
        operands = [jnp.asarray(layer, jnp.int32).reshape(1),
                    tables, start_lens,
                    jnp.asarray(substep, jnp.int32).reshape(1),
                    q_in, qs, kn, vn, kst, vst]
        for a in range(SPS):
            for par in range(npar):
                specs += [pl.BlockSpec((1, 1, Hkv, BS, Dh), kv_index(a, par)),
                          pl.BlockSpec((1, 1, Hkv, BS, Dh), kv_index(a, par))]
                operands += [kc, vc]
        for a in range(SPS):
            for par in range(npar):
                specs += [pl.BlockSpec((1, 1, Hkv, BS), scale_index(a, par)),
                          pl.BlockSpec((1, 1, Hkv, BS), scale_index(a, par))]
                operands += [ksc, vsc]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(S // SPS, -(-MAXBLK // npar)),
            in_specs=specs,
            out_specs=pl.BlockSpec((SPS, Hq, Dh), lambda ss, it, *p: (ss, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((SPS, Hkv, G, 1), jnp.float32),
                pltpu.VMEM((SPS, Hkv, G, 1), jnp.float32),
                pltpu.VMEM((SPS, Hkv, G, Dh), jnp.float32),
            ],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, Hq, Dh), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*operands)

    return call, q_in


def oracle(q, qcache, tables, start_lens, kn, vn, kst, vst, substep):
    """f32 jnp flash-equivalent for the ctx<=BS single-block case."""
    (kc, ksc), (vc, vsc) = qcache
    out = []
    for s in range(S):
        blk = int(tables[s, 0])
        start = int(start_lens[s])
        k = (np.asarray(kc[0, blk], np.float32)
             * np.asarray(ksc[0, blk])[..., None])[:, :start]   # [Hkv, start, Dh]
        v = (np.asarray(vc[0, blk], np.float32)
             * np.asarray(vsc[0, blk])[..., None])[:, :start]
        j = int(substep)
        kwin = np.asarray(kst[0, s], np.float32)[:, :j + 1].copy()
        vwin = np.asarray(vst[0, s], np.float32)[:, :j + 1].copy()
        kwin[:, j] = np.asarray(kn[s], np.float32)
        vwin[:, j] = np.asarray(vn[s], np.float32)
        kk = np.concatenate([k, kwin], axis=1)
        vv = np.concatenate([v, vwin], axis=1)
        qs = np.asarray(q[s], np.float32).reshape(Hkv, G, Dh) * SCALE
        scores = np.einsum("hgd,hbd->hgb", qs, kk)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        out.append(np.einsum("hgb,hbd->hgd", p, vv).reshape(Hq, Dh))
    return np.stack(out)


def main():
    print("devices:", jax.devices(), flush=True)
    q = jnp.asarray(rng.standard_normal((S, Hq, Dh), np.float32) * 0.5, jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((S, Hkv, Dh), np.float32) * 0.5, jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((S, Hkv, Dh), np.float32) * 0.5, jnp.bfloat16)
    kst = jnp.asarray(rng.standard_normal((L, S, Hkv, K, Dh), np.float32) * 0.5, jnp.bfloat16)
    vst = jnp.asarray(rng.standard_normal((L, S, Hkv, K, Dh), np.float32) * 0.5, jnp.bfloat16)
    kc = jnp.asarray(rng.integers(-127, 127, (L, NB, Hkv, BS, Dh)), jnp.int8)
    ksc = jnp.asarray(rng.random((L, NB, Hkv, BS), np.float32) * 0.01 + 0.001)
    vc = jnp.asarray(rng.integers(-127, 127, (L, NB, Hkv, BS, Dh)), jnp.int8)
    vsc = jnp.asarray(rng.random((L, NB, Hkv, BS), np.float32) * 0.01 + 0.001)
    qcache = ((kc, ksc), (vc, vsc))
    tables = jnp.asarray(
        np.stack([np.arange(S) + 1, np.arange(S) + S + 1], 1).astype(np.int32))
    start_lens = jnp.full((S,), CTX, jnp.int32)
    substep = 17

    want = oracle(q, qcache, tables, start_lens, kn, vn, kst, vst, substep)

    # Reference: the shipping kernel.
    def ship(q, l, kc, vc, ksc, vsc):
        return paged_attention_window(
            q, kn, vn, kst, vst, (kc, ksc), (vc, vsc),
            l, tables, start_lens, jnp.int32(substep), scale=SCALE)
    got = np.asarray(ship(q, jnp.int32(0), kc, vc, ksc, vsc), np.float32)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"ship   maxrelerr {err:.4g}", flush=True)

    def chain(call):
        def fn(q, kc, vc, ksc, vsc):
            def body(l, qq):
                o = call(qq, l % L, kc, vc, ksc, vsc)
                return (qq.astype(jnp.float32) * 0.999
                        + o.astype(jnp.float32) * 1e-3).astype(qq.dtype)
            return jax.lax.fori_loop(0, L, body, q)
        return jax.jit(fn)

    def ship_chain(q, kc, vc, ksc, vsc):
        def body(l, qq):
            o = ship(qq, l % L, kc, vc, ksc, vsc)
            return (qq.astype(jnp.float32) * 0.999
                    + o.astype(jnp.float32) * 1e-3).astype(qq.dtype)
        return jax.lax.fori_loop(0, L, body, q)

    t = timeit(jax.jit(ship_chain), q, kc, vc, ksc, vsc)
    print(f"base(ship): {t/L*1e6:8.1f} us/layer  {t*1e3:.3f} ms/28L", flush=True)

    for variant, npar in (("dmafloor", 2), ("dmafloor1", 1), ("bf16dot", 1),
                          ("i8dot", 1), ("xheadi8", 1), ("i8dot", 2)):
        try:
            call, q_in = run_variant(
                variant, q, qcache, tables, start_lens, kn, vn, kst, vst, substep,
                npar=npar)
            got = np.asarray(
                call(q_in, jnp.int32(0), kc, vc, ksc, vsc), np.float32)
            if not variant.startswith("dmafloor"):
                err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            else:
                err = float("nan")
            tq = q_in
            t = timeit(chain(call), tq, kc, vc, ksc, vsc)
            print(f"{variant:8s} npar={npar}: {t/L*1e6:8.1f} us/layer  {t*1e3:.3f} ms/28L"
                  f"  maxrelerr {err:.4g}", flush=True)
        except Exception as e:
            print(f"{variant:8s}: FAILED {type(e).__name__}: {str(e)[:500]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
