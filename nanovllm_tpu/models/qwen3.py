"""Qwen3 as a pure functional JAX model over a params pytree.

Capability parity with the reference Qwen3 implementation
(src/models/qwen3.rs:26-591): vocab embedding → N pre-norm residual blocks
(RMSNorm → GQA attention with per-head q/k RMSNorm + RoPE → RMSNorm → SiLU-
gated MLP) → final RMSNorm → LM head (optionally weight-tied). Numerics match
HF `transformers` Qwen3 (fp32 norms and softmax, split-half RoPE rotation,
per-head-dim q/k norm applied before RoPE).

TPU-first design:
- No module objects: `forward(cfg, params, ...)` is a pure function, jitted
  by the model runner with donated KV caches.
- Layer weights are STACKED on a leading [num_layers, ...] axis and the
  block loop is a `lax.scan`, so compile time is one layer, not N.
- QKV and gate/up are packed into single matmuls (the reference's
  QKVParallelLinear / MergedColumnParallelLinear capability,
  src/layers/linear.rs:275-454) to keep the MXU fed.
- Attention metadata is an explicit pytree (see utils/metadata.py); prefill
  and decode are the same code path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from nanovllm_tpu.models.registry import ModelFamily, register_model_family
from nanovllm_tpu.ops.attention import kv_cache_write, paged_attention_ref
from nanovllm_tpu.ops.quant import matmul
from nanovllm_tpu.utils.metadata import AttentionMetadata


@dataclass(frozen=True)
class Qwen3Config:
    """Parsed from HF config.json (the reference hardcodes defaults instead,
    src/models/qwen3.rs:26-98 — real capability is parsing the model dir)."""

    vocab_size: int = 151936
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: int = 128
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    # Long-context hooks. rope_scaling_factor is parsed from HF
    # config.json's rope_scaling when type is linear and applied with HF
    # semantics (position interpolation: inv_freq / factor); the
    # reference's own hook is RoPE base x factor
    # (rotary_embedding.rs:122-133), a different curve that cannot
    # reproduce HF checkpoints. rope_scaling carries the full HF dict for
    # richer schemes:
    # type "yarn" (the scheme Qwen3 ships for >32k contexts) is
    # implemented per HF transformers' _compute_yarn_parameters —
    # per-dimension interpolation/extrapolation ramp + attention mscale.
    rope_scaling_factor: float = 1.0
    rope_scaling: Optional[dict] = None
    # Family switches: Qwen3 applies per-head-dim RMSNorm to q/k before
    # RoPE; Llama/Mistral don't; Qwen2 adds qkv biases instead.
    use_qk_norm: bool = True
    attention_bias: bool = False
    # Sliding-window attention (Mistral/Qwen2-style): each query attends
    # only the last `sliding_window` keys (HF semantics: key visible iff
    # q_pos - k_pos < sliding_window, plus causal). None = full attention.
    sliding_window: Optional[int] = None
    # Per-layer attention kinds ("sliding_attention" / "full_attention"),
    # for architectures that ALTERNATE local and global layers (Gemma 2:
    # period 2). None = uniform (sliding_window applies to every layer).
    layer_types: Optional[tuple] = None
    # --- Gemma-family switches ---
    # RMSNorm multiplies by (1 + weight) instead of weight.
    rms_unit_offset: bool = False
    # MLP activation: "silu" (SwiGLU) or "gelu_tanh" (Gemma's GeGLU).
    hidden_act: str = "silu"
    # tanh caps on attention scores / final logits (Gemma 2).
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    # Attention scale = query_pre_attn_scalar**-0.5 when set (Gemma 2 uses
    # a constant decoupled from head_dim); None = head_dim**-0.5.
    query_pre_attn_scalar: Optional[float] = None
    # Scale embeddings by sqrt(hidden_size) (Gemma).
    scale_embedding: bool = False
    # RoPE base for SLIDING layers when it differs from rope_theta
    # (Gemma 3: local layers 10k, global layers 1M). None = rope_theta
    # everywhere.
    rope_local_base_freq: Optional[float] = None
    # Sandwich norms: extra RMSNorms applied to each block's OUTPUT before
    # the residual add (Gemma 2's post_attention / post_feedforward norms).
    use_post_norms: bool = False

    @classmethod
    def from_hf(cls, d: dict, assume_sliding: bool = False,
                **overrides) -> "Qwen3Config":
        heads = d["num_attention_heads"]
        scaling = d.get("rope_scaling") or {}
        stype = scaling.get("rope_type", scaling.get("type"))
        factor = 1.0
        if stype == "linear":
            factor = float(scaling.get("factor", 1.0))
        # Mistral/Gemma configs carry sliding_window directly (null = off;
        # assume_sliding=True); Qwen2/Qwen3 gate it behind
        # use_sliding_window whose HF DEFAULT IS FALSE — a config that
        # omits the key (saved defaults are dropped) must not enable local
        # attention HF would ignore (code review r3).
        sw = d.get("sliding_window")
        if not d.get("use_sliding_window", assume_sliding):
            sw = None
        # Newer HF configs carry explicit per-layer kinds; collapse the
        # uniform cases (all-full -> no window, all-sliding -> uniform).
        lt = d.get("layer_types")
        if lt and sw:
            if all(t == "full_attention" for t in lt):
                sw, lt = None, None
            elif all(t == "sliding_attention" for t in lt):
                lt = None
            else:
                lt = tuple(lt)
        else:
            lt = None
        overrides.setdefault("layer_types", lt)
        return cls(
            rope_scaling=dict(scaling) if stype == "yarn" else None,
            **overrides,
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=d.get("num_key_value_heads", heads),
            head_dim=d.get("head_dim") or d["hidden_size"] // heads,
            max_position_embeddings=d.get("max_position_embeddings", 32768),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 10000.0),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            rope_scaling_factor=factor,
            sliding_window=int(sw) if sw else None,
        )

    @classmethod
    def from_hf_llama(cls, d: dict) -> "Qwen3Config":
        """Llama / Mistral: no q/k norm, no attention bias. Mistral has no
        use_sliding_window gate — a non-null sliding_window is active."""
        return cls.from_hf(d, assume_sliding=True, use_qk_norm=False,
                           attention_bias=bool(d.get("attention_bias", False)))

    @classmethod
    def from_hf_qwen2(cls, d: dict) -> "Qwen3Config":
        """Qwen2: no q/k norm, qkv biases."""
        return cls.from_hf(d, use_qk_norm=False, attention_bias=True)

    @classmethod
    def from_hf_gemma2(cls, d: dict) -> "Qwen3Config":
        """Gemma 2 (HF transformers Gemma2ForCausalLM): alternating
        sliding/full attention layers, (1+w) RMSNorm, GeGLU, sqrt(D)
        embedding scale, sandwich norms, tanh softcaps on attention scores
        and final logits, decoupled attention scale."""
        act = d.get("hidden_activation", d.get("hidden_act",
                                               "gelu_pytorch_tanh"))
        d = dict(d)
        # HF omits defaults from saved configs; Gemma 2's default is TIED
        # embeddings (the generic parser's fallback is False).
        d.setdefault("tie_word_embeddings", True)
        if "layer_types" not in d and d.get("sliding_window"):
            # Older configs omit layer_types; Gemma 2's rule is even layers
            # sliding (HF: is_sliding = not bool(layer_idx % 2)).
            d["layer_types"] = [
                "sliding_attention" if i % 2 == 0 else "full_attention"
                for i in range(d["num_hidden_layers"])
            ]
        return cls.from_hf(
            d,
            assume_sliding=True,
            use_qk_norm=False,
            attention_bias=bool(d.get("attention_bias", False)),
            rms_unit_offset=True,
            hidden_act="gelu_tanh" if "gelu" in act else "silu",
            attn_logit_softcap=d.get("attn_logit_softcapping"),
            final_logit_softcap=d.get("final_logit_softcapping"),
            query_pre_attn_scalar=d.get("query_pre_attn_scalar"),
            scale_embedding=True,
            use_post_norms=True,
        )

    @classmethod
    def from_hf_gemma3(cls, d: dict) -> "Qwen3Config":
        """Gemma 3 (text): Gemma 2's block structure minus the softcaps,
        plus per-head q/k RMSNorm, a 5-local:1-global layer pattern, and a
        separate RoPE base for the local layers."""
        act = d.get("hidden_activation", d.get("hidden_act",
                                               "gelu_pytorch_tanh"))
        d = dict(d)
        d.setdefault("tie_word_embeddings", True)
        if "layer_types" not in d and d.get("sliding_window"):
            P = int(d.get("sliding_window_pattern", 6))
            # HF Gemma 3: every P-th layer is global.
            d["layer_types"] = [
                "full_attention" if (i + 1) % P == 0 else "sliding_attention"
                for i in range(d["num_hidden_layers"])
            ]
        return cls.from_hf(
            d,
            assume_sliding=True,
            use_qk_norm=True,
            attention_bias=bool(d.get("attention_bias", False)),
            rms_unit_offset=True,
            hidden_act="gelu_tanh" if "gelu" in act else "silu",
            attn_logit_softcap=d.get("attn_logit_softcapping"),
            final_logit_softcap=d.get("final_logit_softcapping"),
            query_pre_attn_scalar=d.get("query_pre_attn_scalar"),
            scale_embedding=True,
            use_post_norms=True,
            rope_local_base_freq=d.get("rope_local_base_freq"),
        )

    def validate(self, tensor_parallel_size: int = 1) -> None:
        """Divisibility vs TP (reference: qwen3.rs:106-124)."""
        if self.num_attention_heads % tensor_parallel_size != 0:
            raise ValueError(
                f"num_attention_heads {self.num_attention_heads} not divisible "
                f"by tensor_parallel_size {tensor_parallel_size}"
            )
        if self.num_key_value_heads % tensor_parallel_size != 0:
            raise ValueError(
                f"num_key_value_heads {self.num_key_value_heads} not divisible "
                f"by tensor_parallel_size {tensor_parallel_size}"
            )
        if self.num_attention_heads % self.num_key_value_heads != 0:
            raise ValueError("num_attention_heads must be a multiple of num_key_value_heads")


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_params(cfg: Qwen3Config, rng: jax.Array, dtype=jnp.bfloat16,
                transform=None) -> dict:
    """Random-init params pytree (for tests and synthetic benchmarks).

    Layout (weights are [in, out] so forward is x @ W):
      embedding: [V, D]
      layers (stacked on leading L axis):
        input_ln [L, D], qkv [L, D, (Hq+2*Hkv)*Dh], q_norm [L, Dh],
        k_norm [L, Dh], o [L, Hq*Dh, D], post_ln [L, D],
        gate_up [L, D, 2*I], down [L, I, D]
      final_ln: [D]; lm_head: [V, D] (absent if tied)

    transform(name, array) is applied to each big weight AS IT IS CREATED
    (e.g. ops.quant.make_init_quantizer): the float source is dropped
    before the next tensor generates, so a quantized 8B model initializes
    within one 16 GB chip even though its bf16 tree would not fit.
    """
    D, I = cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    L, V = cfg.num_hidden_layers, cfg.vocab_size
    ks = jax.random.split(rng, 6)
    t = transform or (lambda name, a: a)

    def w(name, key, shape, fan_in):
        # Generate in the target dtype directly: an f32 intermediate of an
        # 8B stacked tensor is ~14 GB on its own.
        return t(name, jax.random.normal(key, shape, dtype)
                 / jnp.sqrt(fan_in).astype(dtype))

    ln_init = jnp.zeros if cfg.rms_unit_offset else jnp.ones
    layers = {
        "input_ln": ln_init((L, D), dtype),
        "qkv": w("qkv", ks[1], (L, D, (Hq + 2 * Hkv) * Dh), D),
        "o": w("o", ks[2], (L, Hq * Dh, D), Hq * Dh),
        "post_ln": ln_init((L, D), dtype),
        "gate_up": w("gate_up", ks[3], (L, D, 2 * I), D),
        "down": w("down", ks[4], (L, I, D), I),
    }
    if cfg.use_qk_norm:
        layers["q_norm"] = jnp.ones((L, Dh), dtype)
        layers["k_norm"] = jnp.ones((L, Dh), dtype)
    if cfg.attention_bias:
        layers["qkv_bias"] = jnp.zeros((L, (Hq + 2 * Hkv) * Dh), dtype)
    if cfg.use_post_norms:
        # Gemma-2 sandwich norms: applied to each block's OUTPUT before
        # the residual add. With rms_unit_offset the identity init is 0
        # (weight enters as 1 + w).
        zero = jnp.zeros if cfg.rms_unit_offset else jnp.ones
        layers["post_attn_ln"] = zero((L, D), dtype)
        layers["post_ff_ln"] = zero((L, D), dtype)
    params = {
        "embedding": w("embedding", ks[0], (V, D), D),
        "layers": layers,
        "final_ln": ln_init((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w("lm_head", ks[5], (V, D), D)
    return params


def create_kv_caches(
    cfg: Qwen3Config, num_blocks: int, block_size: int, dtype=jnp.bfloat16,
    kv_heads: Optional[int] = None,
) -> tuple:
    """Per-layer paged caches, stacked: [L, num_blocks, Hkv, block_size, Dh].

    kv_heads sits BEFORE block_size so one block DMA lands in VMEM as
    [Hkv, block_size, Dh] — the batched-matmul layout the Pallas kernels
    consume (reference keeps [blocks, block_size, kv_heads, head_dim],
    model_runner.rs:364-396).

    Quantized dtypes (int8, float8_e4m3fn) → each cache is the tuple
    (data, per-row scale f32 [L, NB, Hkv, BS]); writers quantize per
    (token, head) with amax/qmax scales (qmax 127 for int8, 448 for e4m3)."""
    Hkv = kv_heads or cfg.num_key_value_heads
    shape = (cfg.num_hidden_layers, num_blocks, Hkv, block_size, cfg.head_dim)
    if dtype in (jnp.int8, jnp.float8_e4m3fn):
        # Distinct scale buffers: K and V are donated separately.
        return (
            (jnp.zeros(shape, dtype), jnp.zeros(shape[:-1], jnp.float32)),
            (jnp.zeros(shape, dtype), jnp.zeros(shape[:-1], jnp.float32)),
        )
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


# ---------------------------------------------------------------------------
# Building blocks (fp32 numerics matching HF)
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float,
             unit_offset: bool = False) -> jax.Array:
    """fp32 compute, cast back (reference: src/layers/layernorm.rs:58-75).
    unit_offset: Gemma convention — multiply by (1 + weight)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    wf = weight.astype(jnp.float32)
    if unit_offset:
        wf = 1.0 + wf
    return (wf * normed).astype(x.dtype)


def rope_params(cfg: "Qwen3Config", theta: float = None,
                scaled: bool = True):
    """Per-dimension inverse frequencies + attention mscale for this
    config's RoPE scheme.

    - default / "linear": theta x rope_scaling_factor (the reference's
      base-scaling hook, rotary_embedding.rs:122-133), mscale 1.
    - "yarn" (Qwen3's documented long-context mode): per HF transformers'
      `_compute_yarn_parameters` — interpolated frequencies below the
      beta_slow wavelength, extrapolated above beta_fast, linear ramp
      between, cos/sin scaled by attention_factor (0.1*ln(s)+1 default).
    """
    import math

    Dh = cfg.head_dim
    half = Dh // 2
    if theta is None:
        theta = cfg.rope_theta
    sc = (cfg.rope_scaling or {}) if scaled else {}
    if sc.get("rope_type", sc.get("type")) == "yarn":
        base = theta
        factor = float(sc.get("factor", 1.0))
        orig = float(
            sc.get("original_max_position_embeddings")
            or cfg.max_position_embeddings
        )
        beta_fast = float(sc.get("beta_fast", 32))
        beta_slow = float(sc.get("beta_slow", 1))
        pos_freqs = base ** (jnp.arange(0, Dh, 2, dtype=jnp.float32) / Dh)
        extra = 1.0 / pos_freqs
        inter = 1.0 / (factor * pos_freqs)

        def corr_dim(n_rot):
            return (Dh * math.log(orig / (n_rot * 2 * math.pi))) / (
                2 * math.log(base))

        low = max(math.floor(corr_dim(beta_fast)), 0)
        high = min(math.ceil(corr_dim(beta_slow)), Dh - 1)
        ramp = jnp.clip(
            (jnp.arange(half, dtype=jnp.float32) - low) / max(high - low, 1e-3),
            0.0, 1.0,
        )
        ext_f = 1.0 - ramp
        inv_freq = inter * (1.0 - ext_f) + extra * ext_f
        af = sc.get("attention_factor")
        mscale = float(af) if af is not None else 0.1 * math.log(factor) + 1.0
        return inv_freq, mscale
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / Dh))
    if scaled:
        # HF "linear" rope scaling is POSITION INTERPOLATION: every
        # frequency divides by the factor (positions effectively shrink by
        # 1/factor) — NOT base scaling (theta * factor), which only agrees
        # at the last dim. The reference's own hook multiplies the base
        # (rotary_embedding.rs:122-133), but HF checkpoints carrying
        # rope_scaling={"rope_type": "linear"} (e.g. Gemma 3's global
        # layers, factor 8) require HF semantics to reproduce HF logits
        # (code review r3; tests/test_golden_hf.py::TestLinearRope).
        inv_freq = inv_freq / cfg.rope_scaling_factor
    return inv_freq, 1.0


def apply_rope(x: jax.Array, positions: jax.Array, inv_freq: jax.Array,
               mscale: float = 1.0) -> jax.Array:
    """Split-half rotation (reference: src/layers/rotary_embedding.rs:23-48,
    matching HF rotate_half). x: [T, H, Dh], positions: [T]; inv_freq
    [Dh//2] from `rope_params`; cos/sin scaled by mscale (YaRN)."""
    half = x.shape[-1] // 2
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [T, half]
    cos = jnp.cos(angles)[:, None, :] * mscale  # [T, 1, half]
    sin = jnp.sin(angles)[:, None, :] * mscale
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _select_group_init(part_fn, window):
    """Run the shared-prefix pass for each group and gather every
    sequence's init flash state from ITS group (group_id < 0 rows get
    group 0's values, but their skip_blocks == 0 makes the window kernel
    ignore the init entirely)."""
    tables = window["shared_tables"]      # [NG, MSHB]
    nblocks = window["shared_nblocks"]    # [NG]
    gid = window["group_id"]              # [S]
    NG = tables.shape[0]
    parts = [part_fn(tables[g], nblocks[g]) for g in range(NG)]
    if NG == 1:
        return parts[0]
    acc = jnp.stack([p[0] for p in parts])   # [NG, S, Hkv, G, Dh]
    m = jnp.stack([p[1] for p in parts])     # [NG, S, Hkv, G]
    l = jnp.stack([p[2] for p in parts])
    sel = jnp.clip(gid, 0, NG - 1)
    rows = jnp.arange(gid.shape[0])
    return acc[sel, rows], m[sel, rows], l[sel, rows]


def forward(
    cfg: Qwen3Config,
    params: dict,
    k_cache: jax.Array,
    v_cache: jax.Array,
    token_ids: jax.Array,
    meta: AttentionMetadata,
    attn_impl: str = "ref",
    all_logits: bool = False,
    mesh=None,
    window=None,
    head_mode: str = "logits",
) -> tuple:
    """One model step over a flat token batch (prefill and decode unified).

    token_ids: [T] int32; returns (logits [S, V] fp32 at each sequence's last
    query token, k_cache, v_cache). Call stack mirrors reference
    qwen3.rs:487-505 / SURVEY §3.4, with collectives inserted by the mesh
    shardings when TP > 1.

    attn_impl (static): "ref" = gather-based jnp oracle; "pallas_decode" =
    Pallas flash decode kernel (requires one query token per sequence in row
    order, i.e. a decode batch).

    window (decode-window mode, pallas_decode only): dict with
      k_win/v_win [L, S, Hkv, K, Dh] staging buffers, substep (scalar j),
      start_lens [S] (first window position = committed history length).
    Attention splits into a history kernel over the committed cache plus
    XLA attention over the window's own rows, flash-merged; no per-substep
    cache commit happens (the caller span-commits once per window via
    kv_window_commit). Returns (logits, kc, vc, (k_win, v_win)).

    head_mode (static): "logits" returns fp32 logits; "greedy" returns the
    argmax token ids [S] instead — the fused lm_head+argmax path for
    all-greedy batches (the logits never materialize in HBM)."""
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    scale = (cfg.query_pre_attn_scalar or Dh) ** -0.5
    softcap = cfg.attn_logit_softcap
    uo = cfg.rms_unit_offset

    from nanovllm_tpu.ops.quant import (
        embedding_lookup, greedy_head, lm_head_logits,
    )

    h = embedding_lookup(params["embedding"], token_ids)  # [T, D]
    if cfg.scale_embedding:
        # Gemma: embeddings scaled by sqrt(D), normalizer cast to the
        # embedding dtype first (HF semantics).
        h = h * jnp.asarray(cfg.hidden_size ** 0.5, h.dtype)

    # The stacked KV caches ride in the scan CARRY (not xs/ys): XLA keeps the
    # per-layer scatter in place on the donated buffers, where xs/ys would
    # round-trip the full multi-GB cache through fresh copies every step.
    #
    # QUANTIZED weights stay OUT of the scan xs entirely: scan-slicing a
    # stacked weight to feed a pallas_call materializes the slice (a full
    # per-layer weight copy each step — measured +275 us per 0.6B decode
    # chain, experiments/scan_slice_probe.py; XLA's own dots fuse the slice
    # free, so bf16/int8-XLA paths are unaffected). They ride in the
    # CLOSURE fully stacked, addressed by the carry's layer_idx through the
    # stacked fused kernel's scalar-prefetch index maps — the same pattern
    # as the KV caches themselves.
    from nanovllm_tpu.ops.quant import QuantizedTensor

    stacked_qt = {
        k: v for k, v in params["layers"].items()
        if isinstance(v, QuantizedTensor)
    }
    layers_xs = {
        k: v for k, v in params["layers"].items() if k not in stacked_qt
    }

    def layer_step(carry, lp, sw):
        h, kc, vc, layer_idx = carry

        def wmat(x_, name, tp_):
            if name in stacked_qt:
                return matmul(x_, stacked_qt[name], mesh=mesh, tp=tp_,
                              layer_idx=layer_idx)
            return matmul(x_, lp[name], mesh=mesh, tp=tp_)

        # Attention block (reference: qwen3.rs:208-240)
        x = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps, uo)
        qkv = wmat(x, "qkv", "column")  # [T, (Hq+2Hkv)*Dh]
        if cfg.attention_bias:
            qkv = qkv + lp["qkv_bias"]
        q, k, v = jnp.split(qkv, [Hq * Dh, (Hq + Hkv) * Dh], axis=-1)
        T = q.shape[0]
        q = q.reshape(T, Hq, Dh)
        k = k.reshape(T, Hkv, Dh)
        v = v.reshape(T, Hkv, Dh)
        if cfg.use_qk_norm:
            # Per-head-dim q/k norm BEFORE RoPE (HF Qwen3Attention).
            q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps, uo)
            k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps, uo)
        # RoPE with the config's long-context scheme: linear base scaling
        # (reference parity, rotary_embedding.rs:122-133) or YaRN
        # (per-dim interpolation ramp + mscale — Qwen3's >32k mode).
        # Gemma 3: sliding layers use a separate (local) RoPE base, and
        # rope_scaling applies only to the GLOBAL layers (HF semantics).
        use_local = sw is not None and cfg.rope_local_base_freq
        inv_freq, rope_mscale = rope_params(
            cfg,
            cfg.rope_local_base_freq if use_local else None,
            scaled=not use_local,
        )
        q = apply_rope(q, meta.positions, inv_freq, rope_mscale)
        k = apply_rope(k, meta.positions, inv_freq, rope_mscale)

        if attn_impl == "pallas_decode" and window is not None:
            # Decode-WINDOW attention, one kernel: committed history blocks
            # + the staged window rows (fetched through the pallas pipeline,
            # BlockSpec indexed by (layer, seq)) + this substep's own row
            # patched at full precision. No per-substep cache commit — the
            # caller span-commits the staging buffers once per layer per
            # window (a per-row RMW commit measured ~25-29 us/layer/substep
            # on v5e, DMA-issue-bound). This layer's rows leave through the
            # scan ys; the staging buffer updates once per substep.
            interp = jax.default_backend() != "tpu"
            shared = window.get("shared_tables") is not None
            assert not (shared and cfg.sliding_window), (
                "cascade is disabled under sliding-window attention "
                "(model_runner._shared_prefix_plan gates it)"
            )
            if mesh is not None:
                from nanovllm_tpu.ops.pallas.sharded import (
                    sharded_paged_attention_window,
                    sharded_shared_prefix_partial,
                )

                init = skip = None
                if shared:
                    # Shared-prefix pass per group: attend each common
                    # block span once with every sequence's queries
                    # (M = S*G per dot), then seed each member's per-seq
                    # kernel from ITS group's state (gathered by group_id;
                    # skip == 0 rows ignore the init entirely).
                    part = partial(
                        sharded_shared_prefix_partial, mesh, q, kc, vc,
                        layer_idx, scale=scale, interpret=interp,
                    )
                    init = _select_group_init(part, window)
                    skip = window["skip_blocks"]
                attn = sharded_paged_attention_window(
                    mesh, q, k, v, window["k_win"], window["v_win"], kc, vc,
                    layer_idx, meta.block_tables, window["start_lens"],
                    window["substep"], skip, init, scale=scale,
                    max_rem=window.get("max_rem"),
                    sliding_window=sw, logit_softcap=softcap,
                    interpret=interp,
                )
            else:
                from nanovllm_tpu.ops.pallas.paged_attention import (
                    paged_attention_window,
                    shared_prefix_partial,
                )

                init = skip = None
                if shared:
                    part = partial(
                        shared_prefix_partial, q, kc, vc, layer_idx,
                        scale=scale, interpret=interp,
                    )
                    init = _select_group_init(part, window)
                    skip = window["skip_blocks"]
                attn = paged_attention_window(
                    q, k, v, window["k_win"], window["v_win"], kc, vc,
                    layer_idx, meta.block_tables, window["start_lens"],
                    window["substep"], skip, init, scale=scale,
                    max_rem=window.get("max_rem"),
                    sliding_window=sw, logit_softcap=softcap,
                    interpret=interp,
                )
        elif attn_impl == "pallas_decode":
            # Attention reads the caches + an in-VMEM patch of this step's
            # K/V; the commit kernel writes the row to HBM concurrently —
            # no XLA scatter in the step. Under TP the kernels run per head
            # shard via shard_map (attention is head-parallel; no
            # collectives inside). Off-TPU backends run the kernels in
            # interpret mode (tests).
            interp = jax.default_backend() != "tpu"
            if mesh is not None:
                from nanovllm_tpu.ops.pallas.sharded import (
                    sharded_kv_cache_commit,
                    sharded_paged_attention_decode,
                )

                attn = sharded_paged_attention_decode(
                    mesh, q, k, v, kc, vc, layer_idx, meta.block_tables,
                    meta.context_lens, scale=scale,
                    sliding_window=sw, logit_softcap=softcap,
                    interpret=interp,
                )
                kc, vc = sharded_kv_cache_commit(
                    mesh, k, v, kc, vc, layer_idx, meta.block_tables,
                    meta.context_lens, interpret=interp,
                )
            else:
                from nanovllm_tpu.ops.pallas.paged_attention import (
                    kv_cache_commit,
                    paged_attention_decode,
                )

                attn = paged_attention_decode(
                    q, k, v, kc, vc, layer_idx, meta.block_tables,
                    meta.context_lens, scale=scale,
                    sliding_window=sw, logit_softcap=softcap,
                    interpret=interp,
                )
                kc, vc = kv_cache_commit(
                    k, v, kc, vc, layer_idx, meta.block_tables,
                    meta.context_lens, interpret=interp,
                )
        elif attn_impl == "pallas_prefill":
            # Whole-block DMA commit of this batch's K/V (the XLA row
            # scatter costs tens of ms at prefill scale), then the flash
            # varlen kernel reads history + new tokens from the cache.
            from nanovllm_tpu.ops.pallas.flash_prefill import paged_attention_prefill
            from nanovllm_tpu.ops.pallas.prefill_commit import prefill_kv_commit

            interp = jax.default_backend() != "tpu"

            S, Qn = meta.q_gather.shape
            BSz = (kc[0] if isinstance(kc, tuple) else kc).shape[3]
            Qpad = -(-Qn // BSz) * BSz

            def to_grid(x):
                g = x[jnp.clip(meta.q_gather, 0, T - 1)]  # [S, Q, Hkv, Dh]
                g = g.transpose(0, 2, 1, 3)               # [S, Hkv, Q, Dh]
                if Qpad != Qn:
                    g = jnp.pad(g, ((0, 0), (0, 0), (0, Qpad - Qn), (0, 0)))
                return g

            qlen = jnp.sum(meta.q_positions >= 0, axis=1)
            qstart = jnp.where(qlen > 0, meta.q_positions[:, 0], 0)
            cblk = (qstart // BSz).astype(jnp.int32)
            if mesh is not None:
                from nanovllm_tpu.ops.pallas.sharded import (
                    sharded_paged_attention_prefill,
                    sharded_prefill_kv_commit,
                )

                kc, vc = sharded_prefill_kv_commit(
                    mesh, to_grid(k), to_grid(v), kc, vc, layer_idx,
                    meta.block_tables, meta.context_lens, cblk,
                    interpret=interp,
                )
                attn = sharded_paged_attention_prefill(
                    mesh, q, kc, vc, layer_idx, meta.block_tables,
                    meta.context_lens, meta.q_gather, meta.q_positions,
                    meta.token_seq, meta.token_qcol, scale=scale,
                    sliding_window=sw, logit_softcap=softcap,
                    interpret=interp,
                )
            else:
                kc, vc = prefill_kv_commit(
                    to_grid(k), to_grid(v), kc, vc, layer_idx,
                    meta.block_tables, meta.context_lens, cblk,
                    interpret=interp,
                )
                attn = paged_attention_prefill(
                    q, kc, vc, layer_idx, meta.block_tables, meta.context_lens,
                    meta.q_gather, meta.q_positions, meta.token_seq,
                    meta.token_qcol, scale=scale,
                    sliding_window=sw, logit_softcap=softcap,
                    interpret=interp,
                )
        elif attn_impl == "pallas_chunk":
            # Speculative-verify chunks (step_fn.build_spec_window): k+1
            # query rows per sequence starting MID-BLOCK at position ctx-1,
            # so KV enters via the row scatter — the whole-block prefill
            # commit would clobber committed rows of the partial first
            # block — and attention reads through the production flash
            # varlen prefill kernel (paged; no O(ctx) full-KV gather).
            from nanovllm_tpu.ops.pallas.flash_prefill import paged_attention_prefill

            interp = jax.default_backend() != "tpu"
            kc = kv_cache_write(kc, k, meta.slot_mapping, layer_idx)
            vc = kv_cache_write(vc, v, meta.slot_mapping, layer_idx)
            if mesh is not None:
                from nanovllm_tpu.ops.pallas.sharded import (
                    sharded_paged_attention_prefill,
                )

                attn = sharded_paged_attention_prefill(
                    mesh, q, kc, vc, layer_idx, meta.block_tables,
                    meta.context_lens, meta.q_gather, meta.q_positions,
                    meta.token_seq, meta.token_qcol, scale=scale,
                    sliding_window=sw, logit_softcap=softcap,
                    interpret=interp,
                )
            else:
                attn = paged_attention_prefill(
                    q, kc, vc, layer_idx, meta.block_tables, meta.context_lens,
                    meta.q_gather, meta.q_positions, meta.token_seq,
                    meta.token_qcol, scale=scale,
                    sliding_window=sw, logit_softcap=softcap,
                    interpret=interp,
                )
        else:
            kc = kv_cache_write(kc, k, meta.slot_mapping, layer_idx)
            vc = kv_cache_write(vc, v, meta.slot_mapping, layer_idx)
            attn = paged_attention_ref(
                q, kc, vc, layer_idx, meta, scale,
                sliding_window=sw, logit_softcap=softcap,
            )
        a_out = wmat(attn.reshape(T, Hq * Dh), "o", "row")
        if cfg.use_post_norms:
            # Gemma-2 sandwich norm: normalize the block OUTPUT before the
            # residual add.
            a_out = rms_norm(a_out, lp["post_attn_ln"], cfg.rms_norm_eps, uo)
        h = h + a_out

        # MLP block (reference: qwen3.rs:305-314). post_ln is the pre-MLP
        # norm (HF: post_attention_layernorm for Qwen/Llama,
        # pre_feedforward_layernorm for Gemma 2).
        x = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps, uo)
        gate_up = wmat(x, "gate_up", "column")
        gate, up = jnp.split(gate_up, 2, axis=-1)
        act = (jax.nn.gelu(gate, approximate=True)
               if cfg.hidden_act == "gelu_tanh" else jax.nn.silu(gate))
        m_out = wmat(act * up, "down", "row")
        if cfg.use_post_norms:
            m_out = rms_norm(m_out, lp["post_ff_ln"], cfg.rms_norm_eps, uo)
        h = h + m_out
        if window is not None:
            # This layer's K/V rows stack into [L, S, Hkv, Dh] via ys; the
            # caller writes them into the staging buffer once per substep.
            return (h, kc, vc, layer_idx + 1), (k, v)
        return (h, kc, vc, layer_idx + 1), None

    L = cfg.num_hidden_layers
    if cfg.layer_types is not None:
        # Alternating local/global attention (Gemma 2: period 2; Gemma 3:
        # period 6). The sliding window is a STATIC kernel parameter, so
        # the scan runs over GROUPS of `period` layers — the body unrolls
        # one layer per pattern position, each with its own static window;
        # params reshape [L, ...] -> [L/P, P, ...] (metadata-only). Layer
        # counts that don't divide the period (Gemma3-1B: 26 = 4*6 + 2)
        # scan the whole groups and unroll the remainder.
        P = _layer_type_period(cfg.layer_types)
        Lm = (L // P) * P

        def group_step(carry, lpg):
            ys_g = []
            for p_ in range(P):
                lp = jax.tree.map(lambda x, p_=p_: x[p_], lpg)
                sw_p = (
                    cfg.sliding_window
                    if cfg.layer_types[p_] == "sliding_attention" else None
                )
                carry, y = layer_step(carry, lp, sw_p)
                ys_g.append(y)
            if window is not None:
                return carry, jax.tree.map(
                    lambda *a: jnp.stack(a), *ys_g
                )
            return carry, None

        carry = (h, k_cache, v_cache, jnp.int32(0))
        ys = None
        if Lm:
            grouped = jax.tree.map(
                lambda x: x[:Lm].reshape(Lm // P, P, *x.shape[1:]),
                layers_xs,
            )
            carry, ys = jax.lax.scan(group_step, carry, grouped)
            if window is not None:
                # [Lm/P, P, S, Hkv, Dh] -> [Lm, S, Hkv, Dh]
                ys = jax.tree.map(lambda x: x.reshape(Lm, *x.shape[2:]), ys)
        ys_tail = []
        for i in range(Lm, L):
            lp = jax.tree.map(lambda x, i=i: x[i], layers_xs)
            sw_i = (
                cfg.sliding_window
                if cfg.layer_types[i] == "sliding_attention" else None
            )
            carry, y = layer_step(carry, lp, sw_i)
            ys_tail.append(y)
        if window is not None and ys_tail:
            tail = jax.tree.map(lambda *a: jnp.stack(a), *ys_tail)
            ys = (
                tail if ys is None
                else jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b]), ys, tail
                )
            )
        h, k_cache, v_cache, _ = carry
    else:
        (h, k_cache, v_cache, _), ys = jax.lax.scan(
            lambda c, lp: layer_step(c, lp, cfg.sliding_window),
            (h, k_cache, v_cache, jnp.int32(0)),
            layers_xs,
        )

    h = rms_norm(h, params["final_ln"], cfg.rms_norm_eps, uo)

    # Logits only at each sequence's last query token
    # (reference: embed_head.rs:272-306) — or, for evaluation (perplexity
    # harness), at every token. bf16 matmul with fp32 accumulation.
    x = h if all_logits else h[meta.logits_idx]  # [T or S, D]
    lm_w = params["embedding"] if cfg.tie_word_embeddings else params["lm_head"]
    if head_mode == "greedy":
        # tanh is monotone, so the final logit softcap never changes the
        # argmax — the fused greedy head skips it.
        out = greedy_head(x, lm_w, mesh=mesh)  # [S] token ids, no HBM logits
    else:
        out = lm_head_logits(x, lm_w)
        if cfg.final_logit_softcap:
            cap = cfg.final_logit_softcap
            out = cap * jnp.tanh(out / cap)
    if window is not None:
        return out, k_cache, v_cache, ys  # ([L,S,Hkv,Dh], [L,S,Hkv,Dh])
    return out, k_cache, v_cache


def _layer_type_period(layer_types: tuple) -> int:
    """Smallest period of the per-layer attention-kind pattern (Gemma 2 ->
    2, Gemma 3 -> 6); the layer count need not divide it (the forward
    unrolls the remainder). Falls back to the full length."""
    L = len(layer_types)
    for P in range(1, L + 1):
        if all(layer_types[i] == layer_types[i % P] for i in range(L)):
            return P
    return L


def load_weights(cfg: Qwen3Config, model_dir: str, dtype=jnp.bfloat16) -> dict:
    from nanovllm_tpu.utils.loader import load_qwen3_weights

    return load_qwen3_weights(cfg, model_dir, dtype)


register_model_family(
    "qwen3",
    ModelFamily(
        name="qwen3",
        config_from_hf=Qwen3Config.from_hf,
        init_params=init_params,
        forward=forward,
        load_weights=load_weights,
    ),
)

# Llama / Mistral / Qwen2 share the block structure (pre-norm residual, GQA
# + RoPE, SiLU-gated MLP); they differ only in the q/k-norm and qkv-bias
# switches, so they reuse the same functional forward and loader.
for _mt, _from_hf in (
    ("llama", Qwen3Config.from_hf_llama),
    ("mistral", Qwen3Config.from_hf_llama),
    ("qwen2", Qwen3Config.from_hf_qwen2),
    # Gemma 2: alternating sliding/full layers, sandwich norms, (1+w)
    # RMSNorm, GeGLU, sqrt(D) embedding scale, score/logit softcaps.
    ("gemma2", Qwen3Config.from_hf_gemma2),
    # Gemma 3 (text): Gemma 2 minus softcaps, plus per-head q/k RMSNorm,
    # a 5-local:1-global pattern, and a local-layer RoPE base.
    ("gemma3_text", Qwen3Config.from_hf_gemma3),
    ("gemma3", Qwen3Config.from_hf_gemma3),
):
    register_model_family(
        _mt,
        ModelFamily(
            name=_mt,
            config_from_hf=_from_hf,
            init_params=init_params,
            forward=forward,
            load_weights=load_weights,
        ),
    )
