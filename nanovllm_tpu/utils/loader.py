"""Weight loading: HF safetensors → stacked JAX params pytree.

Capability parity with the reference loader (src/utils/loader.rs:13-198):
walks all `*.safetensors` in the model dir and applies the vLLM-style
packed-module remapping (q/k/v_proj → packed qkv, gate/up_proj → packed
gate_up, loader.rs:187-198) — but produces the stacked [num_layers, ...]
layout the scanned forward consumes, and actually loads every weight (the
reference's per-layer loads are stubs, qwen3.rs:543-570, and its LM head is
random, embed_head.rs:309-318).

Quantization (config.quantization = int8/int4) is applied at load time by
ops/quant.py on the packed matmul weights.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict

import numpy as np

import jax.numpy as jnp


def read_hf_config(model_dir: str) -> dict:
    path = os.path.join(model_dir, "config.json")
    if not os.path.isfile(path):
        raise FileNotFoundError(f"no config.json in {model_dir}")
    with open(path) as f:
        return json.load(f)


def _load_all_tensors(model_dir: str) -> Dict[str, np.ndarray]:
    from safetensors import numpy as st_numpy

    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors files in {model_dir}")
    tensors: Dict[str, np.ndarray] = {}
    for f in files:
        tensors.update(st_numpy.load_file(f))
    return tensors


def load_qwen3_weights(cfg, model_dir: str, dtype=jnp.bfloat16) -> dict:
    """Build the stacked params pytree defined in models/qwen3.py."""
    t = _load_all_tensors(model_dir)
    L = cfg.num_hidden_layers
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def get(name: str) -> np.ndarray:
        if name not in t:
            raise KeyError(f"missing weight {name!r} in {model_dir}")
        return t[name].astype(np.float32)

    def stack(fmt: str) -> np.ndarray:
        return np.stack([get(fmt.format(i=i)) for i in range(L)])

    # Packed QKV: HF stores [out, in]; we want x @ W so transpose to [in, out]
    # and concatenate q|k|v on the output dim (packed-module remap,
    # reference loader.rs:187-198).
    qkv = np.stack(
        [
            np.concatenate(
                [
                    get(f"model.layers.{i}.self_attn.q_proj.weight").T,
                    get(f"model.layers.{i}.self_attn.k_proj.weight").T,
                    get(f"model.layers.{i}.self_attn.v_proj.weight").T,
                ],
                axis=1,
            )
            for i in range(L)
        ]
    )
    gate_up = np.stack(
        [
            np.concatenate(
                [
                    get(f"model.layers.{i}.mlp.gate_proj.weight").T,
                    get(f"model.layers.{i}.mlp.up_proj.weight").T,
                ],
                axis=1,
            )
            for i in range(L)
        ]
    )

    # Gemma-2 sandwich norms rename the pre-MLP norm: HF
    # post_attention_layernorm is applied to the ATTENTION OUTPUT (our
    # post_attn_ln) and pre_feedforward_layernorm is the pre-MLP norm (our
    # post_ln slot, which holds that position for every family).
    post_norms = getattr(cfg, "use_post_norms", False)
    pre_mlp_name = (
        "model.layers.{i}.pre_feedforward_layernorm.weight" if post_norms
        else "model.layers.{i}.post_attention_layernorm.weight"
    )
    layers = {
        "input_ln": jnp.asarray(stack("model.layers.{i}.input_layernorm.weight"), dtype),
        "qkv": jnp.asarray(qkv, dtype),
        "o": jnp.asarray(
            np.stack([get(f"model.layers.{i}.self_attn.o_proj.weight").T for i in range(L)]),
            dtype,
        ),
        "post_ln": jnp.asarray(stack(pre_mlp_name), dtype),
        "gate_up": jnp.asarray(gate_up, dtype),
        "down": jnp.asarray(
            np.stack([get(f"model.layers.{i}.mlp.down_proj.weight").T for i in range(L)]),
            dtype,
        ),
    }
    if post_norms:
        layers["post_attn_ln"] = jnp.asarray(
            stack("model.layers.{i}.post_attention_layernorm.weight"), dtype
        )
        layers["post_ff_ln"] = jnp.asarray(
            stack("model.layers.{i}.post_feedforward_layernorm.weight"), dtype
        )
    if getattr(cfg, "use_qk_norm", True):
        layers["q_norm"] = jnp.asarray(stack("model.layers.{i}.self_attn.q_norm.weight"), dtype)
        layers["k_norm"] = jnp.asarray(stack("model.layers.{i}.self_attn.k_norm.weight"), dtype)
    if getattr(cfg, "attention_bias", False):
        # Packed qkv bias, concatenated like the weights (Qwen2-style).
        qkv_bias = np.stack(
            [
                np.concatenate(
                    [
                        get(f"model.layers.{i}.self_attn.q_proj.bias"),
                        get(f"model.layers.{i}.self_attn.k_proj.bias"),
                        get(f"model.layers.{i}.self_attn.v_proj.bias"),
                    ]
                )
                for i in range(L)
            ]
        )
        layers["qkv_bias"] = jnp.asarray(qkv_bias, dtype)
    params = {
        "embedding": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "layers": layers,
        "final_ln": jnp.asarray(get("model.norm.weight"), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight"), dtype)

    expected_qkv_out = (Hq + 2 * Hkv) * Dh
    if params["layers"]["qkv"].shape != (L, cfg.hidden_size, expected_qkv_out):
        raise ValueError(
            f"qkv shape mismatch: {params['layers']['qkv'].shape} vs "
            f"({L}, {cfg.hidden_size}, {expected_qkv_out})"
        )
    return params


def save_qwen3_weights_hf(params: dict, cfg, model_dir: str) -> None:
    """Write params back out in HF safetensors naming — used by tests to
    fabricate model dirs and by users to snapshot quantize-free weights."""
    from safetensors import numpy as st_numpy

    os.makedirs(model_dir, exist_ok=True)
    L = cfg.num_hidden_layers
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    lay = params["layers"]
    out: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embedding"], np.float32),
        "model.norm.weight": np.asarray(params["final_ln"], np.float32),
    }
    if not cfg.tie_word_embeddings:
        out["lm_head.weight"] = np.asarray(params["lm_head"], np.float32)
    for i in range(L):
        qkv = np.asarray(lay["qkv"][i], np.float32)
        q, k, v = np.split(qkv, [Hq * Dh, (Hq + Hkv) * Dh], axis=1)
        gu = np.asarray(lay["gate_up"][i], np.float32)
        gate, up = np.split(gu, 2, axis=1)
        p = f"model.layers.{i}"
        out[f"{p}.self_attn.q_proj.weight"] = q.T.copy()
        out[f"{p}.self_attn.k_proj.weight"] = k.T.copy()
        out[f"{p}.self_attn.v_proj.weight"] = v.T.copy()
        out[f"{p}.self_attn.o_proj.weight"] = np.asarray(lay["o"][i], np.float32).T.copy()
        if "q_norm" in lay:
            out[f"{p}.self_attn.q_norm.weight"] = np.asarray(lay["q_norm"][i], np.float32)
            out[f"{p}.self_attn.k_norm.weight"] = np.asarray(lay["k_norm"][i], np.float32)
        if "qkv_bias" in lay:
            b = np.asarray(lay["qkv_bias"][i], np.float32)
            nq, nk = Hq * Dh, Hkv * Dh
            out[f"{p}.self_attn.q_proj.bias"] = b[:nq]
            out[f"{p}.self_attn.k_proj.bias"] = b[nq:nq + nk]
            out[f"{p}.self_attn.v_proj.bias"] = b[nq + nk:]
        out[f"{p}.input_layernorm.weight"] = np.asarray(lay["input_ln"][i], np.float32)
        out[f"{p}.post_attention_layernorm.weight"] = np.asarray(lay["post_ln"][i], np.float32)
        out[f"{p}.mlp.gate_proj.weight"] = gate.T.copy()
        out[f"{p}.mlp.up_proj.weight"] = up.T.copy()
        out[f"{p}.mlp.down_proj.weight"] = np.asarray(lay["down"][i], np.float32).T.copy()
    st_numpy.save_file(out, os.path.join(model_dir, "model.safetensors"))
