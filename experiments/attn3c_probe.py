"""Round-3 decode attention, part 3: DMA-ISSUE-count reduction.

attn3_probe measured the fetch floor at 59 us/layer for ~21 MB — ~356 GB/s
effective, far under the 819 GB/s HBM bandwidth — with ~128 DMA issues per
layer (per sequence: K block, V block, K scales, V scales, all separate
operands). The per-issue fixed cost (~0.3-0.5 us) dominates. This probe
tests PACKED layouts that cut issues per (seq, layer) to ONE:

  bitcheck    — semantics of pltpu.bitcast(int8[...,4k,128] -> f32): which
                byte order the sublane packing uses (needed to embed f32
                scale planes inside the int8 block)
  computeonly — all lanes clamp to one block (re-fetch skipped): the pure
                compute cost of the flash kernel, i.e. the post-DMA-fix wall
  floorpack   — [L, NB, 2, Hkv, BS+32, Dh] int8: K data, V data, AND both
                f32 scale planes (bitcast into rows 256..263) in ONE block
                = ONE DMA per (seq, layer); staged window rows also fused
  i8pack      — full flash kernel on the packed layout (bf16 dots, scales
                folded into scores/probs), correctness-checked vs oracle
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

_NEG_INF = -1e30
rng = np.random.default_rng(0)
L, NB, Hkv, BS, Dh, Hq, S, K = 28, 70, 8, 256, 128, 16, 32, 32
G = Hq // Hkv
CTX = 250
SPS = 4
SCALE = 0.088
SR = 32            # extra rows appended to each data block (8 used for scales)
BSP = BS + SR


def _barrier(x):
    np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[:8])


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
# bitcast semantics check
# ---------------------------------------------------------------------------

def bitcheck():
    want = (rng.standard_normal((2, 128), np.float32) * 3).astype("<f4")

    def order_a(w):  # byte k of element (s, l) -> int8 row 4s+k, lane l
        b = w.view(np.uint8).reshape(2, 128, 4)
        return b.transpose(0, 2, 1).reshape(8, 128).astype(np.uint8)

    def order_b(w):  # reversed byte order within the 4-sublane group
        b = w.view(np.uint8).reshape(2, 128, 4)
        return b[:, :, ::-1].transpose(0, 2, 1).reshape(8, 128).astype(np.uint8)

    def kernel(x_ref, o_ref):
        o_ref[...] = pltpu.bitcast(x_ref[...], jnp.float32)

    for name, enc in (("A(lsb=row0)", order_a), ("B(msb=row0)", order_b)):
        x = jnp.asarray(enc(want).view(np.int8))
        try:
            got = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32),
            )(x)
            ok = np.allclose(np.asarray(got), want)
            print(f"bitcast {name}: match={ok}", flush=True)
            if ok:
                return name
        except Exception as e:
            print(f"bitcast {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    return None


# ---------------------------------------------------------------------------
# Packed-cache construction (host side, numpy)
# ---------------------------------------------------------------------------

def pack_cache(kc, ksc, vc, vsc, byte_order):
    """[L,NB,Hkv,BS,Dh] int8 x2 + [L,NB,Hkv,BS] f32 x2
    -> [L,NB,2,Hkv,BSP,Dh] int8 with scales bitcast into rows 256..263."""
    out = np.zeros((L, NB, 2, Hkv, BSP, Dh), np.int8)
    out[:, :, 0, :, :BS, :] = kc
    out[:, :, 1, :, :BS, :] = vc

    def enc(sc):  # [L,NB,Hkv,BS] f32 -> [L,NB,Hkv,8,128] uint8 rows
        w = sc.astype("<f4").reshape(L, NB, Hkv, 2, 128)
        b = w.view(np.uint8).reshape(L, NB, Hkv, 2, 128, 4)
        if byte_order.startswith("B"):
            b = b[..., ::-1]
        return b.transpose(0, 1, 2, 3, 5, 4).reshape(L, NB, Hkv, 8, 128)

    out[:, :, 0, :, BS:BS + 8, :] = enc(ksc).view(np.int8)
    out[:, :, 1, :, BS:BS + 8, :] = enc(vsc).view(np.int8)
    return jnp.asarray(out)


# ---------------------------------------------------------------------------
# Kernels on the packed layout
# ---------------------------------------------------------------------------

def _mk_packed_kernel(variant):
    compute = variant in ("i8pack", "computeonly")

    def kernel(layer_ref, tables_ref, start_ref, sub_ref,
               q_ref, kvn_ref, kvw_ref, *refs):
        blk_refs = refs[:SPS]
        out_ref, m_scr, l_scr, acc_scr = refs[SPS:]

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
            blk = blk_refs[a]

            if not compute:
                # Floor: touch one row per fetched block.
                acc_scr[a] = acc_scr[a] + (
                    blk[0, 0, 0, :, 0, :].astype(jnp.float32)[:, None, :])
                @pl.when(it == last_it)
                def _(a=a):
                    out_ref[a] = acc_scr[a].reshape(Hq, Dh).astype(out_ref.dtype)
                continue

            m_s, l_s, acc_s = m_scr.at[a], l_scr.at[a], acc_scr.at[a]
            qb = (q_ref[a].reshape(Hkv, G, Dh).astype(jnp.float32)
                  * SCALE).astype(jnp.bfloat16)

            @pl.when(it < nb)
            def _(a=a, blk=blk, qb=qb, start=start, m_s=m_s, l_s=l_s,
                  acc_s=acc_s):
                pos_base = it * BS
                kdat = blk[0, 0, 0, :, :BS, :].astype(jnp.bfloat16)
                vdat = blk[0, 0, 1, :, :BS, :].astype(jnp.bfloat16)
                ks4 = pltpu.bitcast(blk[0, 0, 0, :, BS:BS + 8, :], jnp.float32)
                vs4 = pltpu.bitcast(blk[0, 0, 1, :, BS:BS + 8, :], jnp.float32)
                # ks4: [Hkv, 2, 128] f32 — the scale plane split (sub, lane).
                scores = jax.lax.dot_general(
                    qb, kdat, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)      # [Hkv, G, BS]
                s4 = scores.reshape(Hkv, G, 2, 128)
                s4 = s4 * ks4[:, None, :, :]
                pos = pos_base + (
                    jax.lax.broadcasted_iota(jnp.int32, (Hkv, G, 2, 128), 2) * 128
                    + jax.lax.broadcasted_iota(jnp.int32, (Hkv, G, 2, 128), 3))
                s4 = jnp.where(pos < start, s4, _NEG_INF)
                m = m_s[...]                                  # [Hkv, G, 1]
                bmax = jnp.max(jnp.max(s4, axis=-1), axis=-1, keepdims=True)
                m_new = jnp.maximum(m, bmax)
                alpha = jnp.exp(m - m_new)
                p4 = jnp.exp(s4 - m_new[..., None])
                l_s[...] = (l_s[...] * alpha
                            + jnp.sum(jnp.sum(p4, -1), -1, keepdims=True))
                pw = (p4 * vs4[:, None, :, :]).astype(jnp.bfloat16)
                pv = jax.lax.dot_general(
                    pw[:, :, 0, :], vdat[:, :128, :],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)       # [Hkv, G, Dh]
                pv += jax.lax.dot_general(
                    pw[:, :, 1, :], vdat[:, 128:, :],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                acc_s[...] = acc_s[...] * alpha + pv
                m_s[...] = m_new

            @pl.when(it == last_it)
            def _(a=a, qb=qb, start=start, m_s=m_s, l_s=l_s, acc_s=acc_s):
                kw = kvw_ref[0, a, 0].astype(jnp.bfloat16)    # [Hkv, K, Dh]
                vw = kvw_ref[0, a, 1].astype(jnp.bfloat16)
                kn = kvn_ref[a, 0].astype(jnp.bfloat16)       # [Hkv, Dh]
                vn = kvn_ref[a, 1].astype(jnp.bfloat16)
                B = kw.shape[1]
                pos3 = start + jax.lax.broadcasted_iota(jnp.int32, (Hkv, B, Dh), 1)
                sel = pos3 == start + j
                kw = jnp.where(sel, kn[:, None, :], kw)
                vw = jnp.where(sel, vn[:, None, :], vw)
                scores = jax.lax.dot_general(
                    qb, kw, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                pos_g = start + jax.lax.broadcasted_iota(jnp.int32, (Hkv, G, B), 2)
                scores = jnp.where(pos_g < start + j + 1, scores, _NEG_INF)
                m = m_s[...]
                m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(scores - m_new)
                l_s[...] = l_s[...] * alpha + jnp.sum(p, -1, keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), vw, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                acc_s[...] = acc_s[...] * alpha + pv
                l = l_s[...]
                out = jnp.where(l > 0, acc_s[...] / jnp.maximum(l, 1e-30), 0.0)
                out_ref[a] = out.reshape(Hq, Dh).astype(out_ref.dtype)

    return kernel


def run_packed(variant, q, packed, tables, start_lens, kvn, kvw, substep):
    MAXBLK = tables.shape[1]

    def blk_index(a):
        def index(ss, it, layer_ref, tables_ref, start_ref, sub_ref):
            seq = ss * SPS + a
            if variant == "computeonly":
                return (layer_ref[0], 1, 0, 0, 0, 0)  # constant: no re-fetch
            nb = jnp.maximum(pl.cdiv(start_ref[seq], BS), 1)
            blk = tables_ref[seq, jnp.minimum(it, nb - 1)]
            return (layer_ref[0], blk, 0, 0, 0, 0)
        return index

    def staged_index(ss, it, layer_ref, *_):
        return (layer_ref[0], ss, 0, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((SPS, Hq, Dh), lambda ss, it, *p: (ss, 0, 0)),
        pl.BlockSpec((SPS, 2, Hkv, Dh), lambda ss, it, *p: (ss, 0, 0, 0)),
        pl.BlockSpec((1, SPS, 2, Hkv, K, Dh), staged_index),
    ]
    for a in range(SPS):
        in_specs.append(pl.BlockSpec((1, 1, 2, Hkv, BSP, Dh), blk_index(a)))

    kernel = _mk_packed_kernel(variant)

    def call(q, layer, packed):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(S // SPS, MAXBLK),
            in_specs=in_specs,
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
        )(jnp.asarray(layer, jnp.int32).reshape(1), tables, start_lens,
          jnp.asarray(substep, jnp.int32).reshape(1),
          q, kvn, kvw, *([packed] * SPS))

    return call


def oracle(q, kc, ksc, vc, vsc, tables, start_lens, kvn, kvw, substep):
    out = []
    for s in range(S):
        blk = int(tables[s, 0])
        start = int(start_lens[s])
        k = (kc[0, blk].astype(np.float32) * ksc[0, blk][..., None])[:, :start]
        v = (vc[0, blk].astype(np.float32) * vsc[0, blk][..., None])[:, :start]
        j = int(substep)
        kwin = np.asarray(kvw[0, s, 0], np.float32)[:, :j + 1].copy()
        vwin = np.asarray(kvw[0, s, 1], np.float32)[:, :j + 1].copy()
        kwin[:, j] = np.asarray(kvn[s, 0], np.float32)
        vwin[:, j] = np.asarray(kvn[s, 1], np.float32)
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
    order = bitcheck()
    if order is None:
        print("NO WORKING BITCAST ORDER — aborting packed variants", flush=True)
        return

    q = jnp.asarray(rng.standard_normal((S, Hq, Dh), np.float32) * 0.5, jnp.bfloat16)
    kvn = jnp.asarray(rng.standard_normal((S, 2, Hkv, Dh), np.float32) * 0.5, jnp.bfloat16)
    kvw = jnp.asarray(rng.standard_normal((L, S, 2, Hkv, K, Dh), np.float32) * 0.5, jnp.bfloat16)
    kc = rng.integers(-127, 127, (L, NB, Hkv, BS, Dh)).astype(np.int8)
    vc = rng.integers(-127, 127, (L, NB, Hkv, BS, Dh)).astype(np.int8)
    ksc = (rng.random((L, NB, Hkv, BS)) * 0.01 + 0.001).astype(np.float32)
    vsc = (rng.random((L, NB, Hkv, BS)) * 0.01 + 0.001).astype(np.float32)
    packed = pack_cache(kc, ksc, vc, vsc, order)
    nbytes_l = packed.shape[2] * Hkv * BSP * Dh * S + S * 2 * Hkv * K * Dh * 2
    print(f"packed cache: {packed.shape} {packed.nbytes/2**30:.2f} GiB; "
          f"{nbytes_l/2**20:.1f} MiB fetched/layer", flush=True)
    tables = jnp.asarray(
        np.stack([np.arange(S) + 1, np.arange(S) + S + 1], 1).astype(np.int32))
    start_lens = jnp.full((S,), CTX, jnp.int32)
    substep = 17

    want = oracle(q, kc, ksc, vc, vsc, tables, start_lens, kvn, kvw, substep)

    def chain(call):
        def fn(q, packed):
            def body(l, qq):
                o = call(qq, l % L, packed)
                return (qq.astype(jnp.float32) * 0.999
                        + o.astype(jnp.float32) * 1e-3).astype(qq.dtype)
            return jax.lax.fori_loop(0, L, body, q)
        return jax.jit(fn)

    for variant in ("floorpack", "computeonly", "i8pack"):
        try:
            call = run_packed(variant, q, packed, tables, start_lens, kvn, kvw, substep)
            got = np.asarray(call(q, jnp.int32(0), packed), np.float32)
            err = (np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
                   if variant == "i8pack" else float("nan"))
            t = timeit(chain(call), q, packed)
            print(f"{variant:11s}: {t/L*1e6:8.1f} us/layer  {t*1e3:.3f} ms/28L"
                  f"  maxrelerr {err:.4g}", flush=True)
        except Exception as e:
            print(f"{variant:11s}: FAILED {type(e).__name__}: {str(e)[:500]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
