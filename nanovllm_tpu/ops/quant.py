"""Weight-only quantization: symmetric INT8 / packed INT4 with per-group
scales, plus the matmul dispatch the model forward uses.

North-star capability beyond reference parity (SURVEY §7 design stance —
the reference has no quantization at all): weights are quantized once at
load time and stay quantized in HBM; decode is HBM-bandwidth-bound, so
halving/quartering weight bytes directly raises tokens/s. The jnp path here
(dequantize → matmul) is the numerics oracle; the fused Pallas
dequant+matmul kernel (ops/pallas/quant_matmul.py) is the fast path that
never materializes the bf16 weight in HBM.

Layout:
- INT8: data int8 [..., in, out], scale f32 [..., in/G, out]
- INT4: two values per byte packed along the *in* dim — data uint8
  [..., in/2, out] (row 2i in the low nibble, 2i+1 in the high nibble),
  scale f32 [..., in/G, out], optional bias f32 [..., in/G, out]

G (group_size) divides the in dim; G == in gives per-(output-)channel
scales. INT8 is symmetric (no zero points, range ±127). INT4 defaults to
ASYMMETRIC (zero-point): w ≈ s·(q_u − z) with q_u ∈ [0,15] — stored as
signed q_s = q_u − 8 (so the kernel's native int4 unpack still applies)
plus a per-group bias b = s·(8 − z), giving w ≈ s·q_s + b. mode="asym"
fits (s, z) from the group min/max; mode="asym_mse" additionally searches
16 shrunken ranges per group for the MSE-optimal clip (quantize-time-only
cost, same stored layout). Measured ΔNLL in nats/token vs the <0.01
north-star bar (experiments/results/int4_dnll_sweep.json + dnll_4b.json,
round 5): symmetric G=128 = −0.092 (9× over, at 2048-hidden); asym G=64 =
−0.003 at 2048-hidden / +0.018 at the 4B geometry; asym G=32 = +0.002 /
+0.006 (meets both but costs ~17% decode); see the README accuracy table
for the shipped default's numbers. mode="sym" (range ±7) remains
available for A/B and old comparisons.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "scale", "bias"],
    meta_fields=["bits", "group_size", "pack"],
)
@dataclass
class QuantizedTensor:
    """A quantized weight living in HBM. Behaves as a pytree node, so it can
    ride through `lax.scan` xs (the stacked-layer loop) — scan slices the
    array fields' leading axis and keeps bits/group_size/pack as static
    metadata.

    pack (int4 only): "pair" packs adjacent rows (2i -> low nibble,
    2i+1 -> high nibble of packed byte row i), stored as int8 — exactly
    the layout `pltpu.bitcast(packed, jnp.int4)` unpacks natively in the
    fused kernel (round-3 rework; the old "block256" halves layout served
    the retired int32-shift unpack and remains readable by the jnp
    oracle).

    bias (asymmetric int4 only, else None): f32 [..., in/G, out] per-group
    additive term — w ≈ q·scale + bias. It factors out of the contraction
    as (Σ_g x)·bias_g, so the fused kernel pays one per-group row-sum of x
    plus a rank-1 update, never a weight-shaped dequant."""

    data: jax.Array
    scale: jax.Array
    bits: int
    group_size: int
    pack: str = "none"
    bias: Optional[jax.Array] = None

    @property
    def in_dim(self) -> int:
        n = self.data.shape[-2]
        return n * 2 if self.bits == 4 else n

    @property
    def out_dim(self) -> int:
        return self.data.shape[-1]


def _pick_group_size(in_dim: int, requested: Optional[int]) -> int:
    if requested == -1:
        return in_dim  # per-(output-)channel scales
    if requested and in_dim % requested == 0:
        return requested
    for g in (128, 64, 32):
        if in_dim % g == 0:
            return g
    return in_dim


def quantize(w: jax.Array, bits: int, group_size: Optional[int] = None,
             mode: str = "sym") -> QuantizedTensor:
    """Per-group quantization of a weight [..., in, out].

    Groups run along the in (contraction) dim so the matmul accumulates
    `sum_g scale_g * (x_g . q_g) [+ sum(x_g) * bias_g]` — scales (and the
    asymmetric bias) factor out of each group's partial dot product.

    mode="sym": scale = absmax/qmax, range ±qmax, no bias.
    mode="asym" (int4 only): affine min/max fit — q_u = round(w/s + z) in
    [0,15], stored signed (q_u − 8) with bias = s·(8 − z) so
    w ≈ s·q_s + b and the native signed int4 unpack path is unchanged.

    Runs in jnp ON DEVICE: pulling multi-GB weights through numpy costs
    minutes on a tunneled device attachment (and doubles host RAM). Layer-
    stacked tensors quantize through lax.map so the f32 temporaries stay
    one-layer-sized (a whole-tensor f32 copy of an 8B-model stacked weight
    OOMs a 16 GB chip)."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    if mode not in ("sym", "asym", "asym_mse"):
        raise ValueError(f"mode must be 'sym'/'asym'/'asym_mse', got {mode!r}")
    if mode != "sym" and bits != 4:
        raise ValueError("asymmetric quantization is int4-only (int8's "
                         "symmetric error already meets every gate)")
    *lead, in_dim, out_dim = w.shape
    G = _pick_group_size(in_dim, group_size)
    qmax = 127.0 if bits == 8 else 7.0

    def pack4(q):
        # pair: row 2i -> low nibble, row 2i+1 -> high nibble; int8
        # storage (the fused kernel bitcasts the bytes straight to int4).
        lo = q[0::2, :].astype(jnp.uint8) & 0x0F
        hi = q[1::2, :].astype(jnp.uint8) & 0x0F
        return jax.lax.bitcast_convert_type(lo | (hi << 4), jnp.int8)

    def core(w2):
        wf = w2.astype(jnp.float32).reshape(in_dim // G, G, out_dim)
        if mode in ("asym", "asym_mse"):
            wmin = wf.min(axis=-2, keepdims=True)   # [in/G, 1, out]
            wmax = wf.max(axis=-2, keepdims=True)

            def fit(lo, hi):
                scale = jnp.maximum((hi - lo) / 15.0, 1e-12)
                zp = jnp.clip(jnp.rint(-lo / scale), 0.0, 15.0)
                return scale, zp

            scale, zp = fit(wmin, wmax)
            if mode == "asym_mse":
                # Error-aware range fit: shrink the (min, max) window and
                # keep the per-group scale minimizing reconstruction MSE —
                # clipping tail values often beats covering them (finer
                # steps for the bulk). Quantize-time-only cost; the stored
                # (q, s, b) layout and the kernels are unchanged.
                best_err = None
                for c in np.linspace(1.0, 0.55, 16):
                    s_c, z_c = fit(wmin * c, wmax * c)
                    q_c = jnp.clip(jnp.rint(wf / s_c + z_c), 0.0, 15.0)
                    err = (((q_c - z_c) * s_c - wf) ** 2).sum(
                        axis=-2, keepdims=True)
                    if best_err is None:
                        best_err, scale, zp = err, s_c, z_c
                    else:
                        m = err < best_err
                        best_err = jnp.where(m, err, best_err)
                        scale = jnp.where(m, s_c, scale)
                        zp = jnp.where(m, z_c, zp)
            q_u = jnp.clip(jnp.rint(wf / scale + zp), 0.0, 15.0)
            q = (q_u - 8.0).astype(jnp.int8).reshape(in_dim, out_dim)
            bias = (scale * (8.0 - zp)).squeeze(-2).astype(jnp.float32)
            scale = scale.squeeze(-2).astype(jnp.float32)
            return pack4(q), scale, bias
        absmax = jnp.abs(wf).max(axis=-2, keepdims=True)  # [in/G, 1, out]
        scale = jnp.maximum(absmax / qmax, 1e-12)
        q = jnp.clip(jnp.rint(wf / scale), -qmax, qmax).astype(jnp.int8)
        q = q.reshape(in_dim, out_dim)
        scale = scale.squeeze(-2).astype(jnp.float32)  # [in/G, out]
        data = pack4(q) if bits == 4 else q
        return data, scale, None

    wj = jnp.asarray(w)
    if len(lead) == 0:
        data, scale, bias = core(wj)
    elif len(lead) == 1:
        data, scale, bias = jax.lax.map(core, wj)
    else:
        flat = wj.reshape(-1, in_dim, out_dim)
        data, scale, bias = jax.lax.map(core, flat)
        data = data.reshape(*lead, *data.shape[1:])
        scale = scale.reshape(*lead, *scale.shape[1:])
        if bias is not None:
            bias = bias.reshape(*lead, *bias.shape[1:])
    return QuantizedTensor(
        data=data, scale=scale, bits=bits, group_size=G,
        pack="pair" if bits == 4 else "none", bias=bias,
    )


def _unpack_int4(packed: jax.Array, pack: str) -> jax.Array:
    """uint8 [..., in/2, out] → int8 values [..., in, out] (sign-extended)."""
    lo = (packed & 0x0F).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    # Sign-extend 4-bit two's complement: v >= 8 → v - 16.
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    *lead, half, out = packed.shape
    if pack == "block256":
        lo = lo.reshape(*lead, half // 128, 128, out)
        hi = hi.reshape(*lead, half // 128, 128, out)
        return jnp.concatenate([lo, hi], axis=-2).reshape(*lead, half * 2, out)
    stacked = jnp.stack([lo, hi], axis=-2)  # [..., in/2, 2, out]
    return stacked.reshape(*lead, half * 2, out)


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Reference (jnp) dequantization — [..., in, out] in `dtype`."""
    q = _unpack_int4(qt.data, qt.pack) if qt.bits == 4 else qt.data
    *lead, in_dim, out = q.shape
    G = qt.group_size
    qf = q.astype(jnp.float32).reshape(*lead, in_dim // G, G, out)
    w = qf * qt.scale[..., :, None, :]
    if qt.bias is not None:
        w = w + qt.bias[..., :, None, :]
    return w.reshape(*lead, in_dim, out).astype(dtype)


def quant_matmul(x: jax.Array, qt: QuantizedTensor, mesh=None,
                 tp: Optional[str] = None, layer_idx=None) -> jax.Array:
    """x [T, in] @ dequant(qt) [in, out] → [T, out] (x.dtype preserved).

    Dispatch (v5e, experiments/int4_sol_probe.py SLOPE-METHOD timings —
    the tunneled attachment adds ~25 ms fixed per dispatch, which earlier
    rounds' naive timings amortized into every number; decode-shape
    4-matmul chain x 28 layers, byte floors int4/int8/bf16 = 233/466/932
    us; plain-XLA bf16 runs 845-1080 us = ~90% of roofline at S<=128):
    - INT8, S <= 4 → fused Pallas kernel (688 us at S=1; XLA's raw-int8
      dot collapses to 2061 us at single-row batches).
    - INT8, S >= 8 → XLA raw-int8 dot + per-channel scale epilogue
      (569-726 us through S=128; the fused kernel measures 671-871
      there). TP-native: XLA partitions the dot over the mesh.
    - INT4 → fused Pallas kernel for decode batches (533-724 us at
      S=1..128 vs bf16's 845-1063 — 1.6-2.0x; per-channel scales would
      give 450-491, the group-128 default trades ~80 us for accuracy) and
      pallas_dequantize (one unpack-to-HBM streaming pass) + XLA matmul
      at prefill scale (XLA's own int4 dequant-dot does not vectorize the
      nibble unpack). At S=256 fused (1289) ~ties bf16+dequant-pass; the
      fused path also keeps HBM for the bf16 weights free. Under a mesh
      the same dispatch runs per shard via shard_map when the caller
      supplies the TP orientation (`tp="column"`: out-dim sharded;
      `tp="row"`: in-dim sharded + psum) — BASELINE config 4's int4 x
      tensor-parallel combination stays on the fused path. Falls back to
      dequantize-then-dot for non-tileable shapes or missing hints.
    """
    on_tpu = jax.default_backend() == "tpu"
    if layer_idx is not None and qt.data.ndim == 3:
        # Layer-STACKED weight inside the model's scan: take the stacked
        # fused kernel when it applies — slicing the stack in XLA-land to
        # feed a pallas_call materializes a full per-layer weight copy
        # every scan step (measured +275 us/28-layer decode chain,
        # experiments/scan_slice_probe.py), while the stacked kernel
        # addresses the layer directly in HBM via scalar-prefetch index
        # maps. Every other path (XLA dots, jnp oracle) fuses or tolerates
        # the slice — fall through with the sliced view.
        if on_tpu and qt.bits == 4 and mesh is None and x.ndim == 2:
            from nanovllm_tpu.ops.pallas.quant_matmul import (
                fusable_stacked,
                fused_quant_matmul_stacked,
            )

            if fusable_stacked(x, qt):
                return fused_quant_matmul_stacked(x, qt, layer_idx)
        qt = jax.tree.map(lambda a: a[layer_idx], qt)
    if on_tpu and qt.bits == 4 and mesh is None:
        from nanovllm_tpu.ops.pallas.quant_matmul import (
            dequantizable,
            fusable,
            fused_quant_matmul,
            pallas_dequantize,
        )

        if fusable(x, qt):
            return fused_quant_matmul(x, qt)
        if dequantizable(qt):
            # Prefill-scale: unpack+dequant once to bf16 HBM (one streaming
            # pass), then XLA's compute-bound matmul at full MXU rate.
            w = pallas_dequantize(qt, x.dtype)
            return jnp.dot(x, w, preferred_element_type=x.dtype)
    if (
        on_tpu
        and qt.bits == 4
        and mesh is not None
        and tp in ("column", "row")
        # Row-parallel shards group scales along in/G — per-channel scales
        # (collapsed in dim) cannot shard; fall back.
        and not (tp == "row" and qt.scale.shape[0] == 1)
    ):
        from nanovllm_tpu.ops.pallas.sharded import sharded_quant_matmul

        return sharded_quant_matmul(mesh, x, qt, tp)
    if qt.bits == 8 and qt.scale.shape[-2] == 1:
        import os as _os

        if (
            on_tpu and mesh is None and x.ndim == 2 and x.shape[0] <= 4
            and not _os.environ.get("NANOVLLM_INT8_TINY_FUSED_OFF")
        ):
            # XLA's raw-int8 dot falls off a cliff at single-row batches
            # (measured 2061 us/step for the decode chain at S=1 vs 569
            # at S=8 — experiments/int4_sol_probe.py, slope-method); the
            # fused kernel runs 688 us there (3.0x). Batches >= 8 stay on
            # the XLA dot (569-726 us through S=128, beating the fused
            # kernel's 671-871).
            from nanovllm_tpu.ops.pallas.quant_matmul import (
                fusable,
                fused_quant_matmul,
            )

            if fusable(x, qt):
                return fused_quant_matmul(x, qt)
        # Per-channel scales factor OUT of the contraction entirely:
        # sum_i x_i * (q_ij * s_j) == s_j * sum_i x_i * q_ij. Dot the raw
        # int8 values (XLA converts in the MXU feed) and scale the [T, out]
        # OUTPUT — O(T*out) epilogue VPU work instead of an O(in*out)
        # dequant multiply on the weight-feed path. f32 accumulate + post-
        # sum scaling is also the more accurate rounding order. Exact under
        # TP either way: column shards the out dim (scale shards with it),
        # row psums partial sums (the per-out scale commutes with psum).
        acc = jnp.dot(x, qt.data.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        return (acc * qt.scale[..., 0, :]).astype(x.dtype)
    w = dequantize(qt, x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype)


def matmul(x: jax.Array, w: Union[jax.Array, QuantizedTensor], mesh=None,
           tp: Optional[str] = None, layer_idx=None) -> jax.Array:
    """The model-forward matmul dispatch: plain arrays take the MXU matmul,
    QuantizedTensor takes the dequant path. `tp` declares the weight's
    tensor-parallel orientation ("column"/"row") so quantized matmuls can
    run per-shard under a mesh. `layer_idx` + a layer-stacked
    QuantizedTensor select one layer WITHOUT materializing the slice (the
    stacked fused kernel; see quant_matmul)."""
    if isinstance(w, QuantizedTensor):
        return quant_matmul(x, w, mesh=mesh, tp=tp, layer_idx=layer_idx)
    if layer_idx is not None and w.ndim == 3:
        w = w[layer_idx]
    return x @ w


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "scale"],
    meta_fields=["dtype"],
)
@dataclass
class QuantizedEmbedding:
    """INT8 embedding / lm_head: data int8 [V, D], per-vocab-row scale f32
    [V]. One layout serves both uses: token lookup gathers rows (dequant on
    the gathered rows only), and lm_head logits contract over D directly
    (lax.dot_general over the SECOND dim of data — no transpose, no bf16
    weight materialization; the per-row scales factor onto the [S, V]
    output). At decode batch sizes the logits matmul is HBM-bound, so int8
    halves the single largest weight read of the step (~311 MB bf16 for
    Qwen3-0.6B's tied embedding)."""

    data: jax.Array
    scale: jax.Array
    dtype: str = "bfloat16"

    def lookup(self, token_ids: jax.Array) -> jax.Array:
        rows = self.data[token_ids].astype(jnp.float32)
        return (rows * self.scale[token_ids][:, None]).astype(self.dtype)

    def logits(self, x: jax.Array) -> jax.Array:
        acc = jax.lax.dot_general(
            x, self.data.astype(x.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc * self.scale[None, :]


def quantize_embedding(w: jax.Array, dtype: str = "bfloat16") -> QuantizedEmbedding:
    """Symmetric per-vocab-row INT8 quantization of an embedding/lm_head
    weight [V, D] (jnp on device, vocab-chunked so the f32 temporary stays
    small — see `quantize`)."""
    V, D = w.shape

    def core(w2):
        wf = w2.astype(jnp.float32)
        absmax = jnp.abs(wf).max(axis=1)
        scale = jnp.maximum(absmax / 127.0, 1e-12)
        q = jnp.clip(jnp.rint(wf / scale[:, None]), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    wj = jnp.asarray(w)
    C = next((c for c in (16, 8, 4, 2) if V % c == 0), 1)
    if C > 1:
        q, s = jax.lax.map(core, wj.reshape(C, V // C, D))
        q, s = q.reshape(V, D), s.reshape(V)
    else:
        q, s = core(wj)
    return QuantizedEmbedding(data=q, scale=s, dtype=dtype)


def embedding_lookup(emb, token_ids: jax.Array) -> jax.Array:
    if isinstance(emb, QuantizedEmbedding):
        return emb.lookup(token_ids)
    return emb[token_ids]


def lm_head_logits(x: jax.Array, lm_w) -> jax.Array:
    """Logits at fp32 accumulation; lm_w is [V, D] (embedding orientation),
    plain or QuantizedEmbedding."""
    if isinstance(lm_w, QuantizedEmbedding):
        return lm_w.logits(x)
    return jnp.dot(x, lm_w.T, preferred_element_type=jnp.float32)


def greedy_head(x: jax.Array, lm_w, mesh=None) -> jax.Array:
    """argmax token per row of the lm_head — greedy decode never needs the
    logits themselves (reference: sampler.rs:109-112 argmaxes the logits
    embed_head.rs produced). Single-chip TPU takes the fused Pallas kernel
    that streams the [V, D] weight tile-by-tile and keeps only a running
    (best, index) pair per row, so the [S, V] logits never exist in HBM —
    the largest single HBM write+read of a greedy decode substep vanishes.
    Under a mesh the vocab-sharded matmul + argmax stays with XLA (the
    logits are shard-local and the collective is one small argmax)."""
    import os

    if (
        jax.default_backend() == "tpu"
        and mesh is None
        # f32 activations: the fused kernel is correct standalone but
        # crashes the TPU worker when composed into the engine's prefill
        # jit (isolated on-chip, 2026-08; bf16/int8 — every serving
        # config — are unaffected). f32 is a debugging dtype; take the
        # unfused argmax there.
        and x.dtype != jnp.float32
        and not os.environ.get("NANOVLLM_DISABLE_FUSED_LMHEAD")
    ):
        from nanovllm_tpu.ops.pallas.lm_head import fused_greedy_head

        if isinstance(lm_w, QuantizedEmbedding):
            if lm_w.data.shape[1] % 128 == 0:
                return fused_greedy_head(x, lm_w.data, lm_w.scale)
        elif lm_w.shape[1] % 128 == 0:
            return fused_greedy_head(x, lm_w)
    return jnp.argmax(lm_head_logits(x, lm_w), axis=-1).astype(jnp.int32)


# Which leaves of the layer-stacked params get quantized: the four big
# matmuls. Norms stay bf16 (tiny). The embedding/lm_head is quantized to
# INT8 per vocab row regardless of the layer method (the head is the
# accuracy-sensitive tensor; 8-bit per-row is the standard compromise).
_QUANT_KEYS = ("qkv", "o", "gate_up", "down")


def _resolve_bits(method: str, group_size: Optional[int],
                  mode: Optional[str] = None) -> tuple:
    bits = {"int8": 8, "int4": 4}.get(method)
    if bits is None:
        raise ValueError(f"unknown quantization method {method!r}")
    if group_size is None and bits == 8:
        # Per-out-channel scales: int8 steps are fine enough, and a single
        # scale row per tile keeps the fused kernel's VPU work minimal.
        group_size = -1
    if group_size is None and bits == 4:
        # G=64: the finest granularity that measured under the ΔNLL<0.01
        # north-star bar with asymmetric quantization (int4_dnll_sweep) at
        # acceptable kernel scale-loop cost (docs/performance.md frontier).
        group_size = 64
    if mode is None or mode == "auto":
        # int4 needs the asymmetric fit to meet the accuracy gate; int8's
        # symmetric error is already ~10x under every gate.
        mode = "asym" if bits == 4 else "sym"
    return bits, group_size, mode


def quantize_params(params: dict, method: str, group_size: Optional[int] = None,
                    include_embedding: bool = True, dtype: str = "bfloat16",
                    mode: Optional[str] = None) -> dict:
    """Quantize the big matmul weights of a loaded params pytree (applied
    once at load time, reference capability: none — north star). CONSUMES
    the input tree: each original weight is dropped as soon as its
    quantized replacement exists, bounding peak device memory to the full
    source tree + one quantized tensor (not source + full quantized)."""
    bits, group_size, mode = _resolve_bits(method, group_size, mode)
    layers = params["layers"]
    for k in _QUANT_KEYS:
        orig = layers.pop(k)
        layers[k] = quantize(orig, bits, group_size, mode=mode)
        del orig
    if include_embedding:
        orig = params.pop("embedding")
        params["embedding"] = quantize_embedding(orig, dtype)
        del orig
        if "lm_head" in params:
            orig = params.pop("lm_head")
            params["lm_head"] = quantize_embedding(orig, dtype)
            del orig
    return params


def make_init_quantizer(method: str, group_size: Optional[int] = None,
                        include_embedding: bool = True,
                        dtype: str = "bfloat16", mode: Optional[str] = None):
    """A per-leaf transform for init_params(..., transform=...): quantizes
    each big weight THE MOMENT it is generated, so random-init + quantize
    of models whose bf16 weights alone would overflow HBM (Qwen3-8B on one
    16 GB chip) never materializes the full float tree."""
    bits, group_size, mode = _resolve_bits(method, group_size, mode)

    def transform(name: str, arr):
        if name in _QUANT_KEYS:
            return quantize(arr, bits, group_size, mode=mode)
        if include_embedding and name in ("embedding", "lm_head"):
            return quantize_embedding(arr, dtype)
        return arr

    return transform
