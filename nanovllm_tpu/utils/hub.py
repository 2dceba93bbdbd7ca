"""Model resolution: local directory or Hugging Face Hub reference.

Reference capability: the hf-hub dependency (/root/reference/Cargo.toml:23)
— the reference declares Hub download support but never wires it. Here any
`model_path` that is not an existing directory is treated as a Hub repo id
(e.g. "Qwen/Qwen3-0.6B") and resolved via huggingface_hub's
snapshot_download (cached under HF_HOME; offline-friendly once cached).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

# Weight + tokenizer + config files; skips .bin duplicates when safetensors
# exist (loader consumes safetensors).
_PATTERNS = ["*.json", "*.safetensors", "tokenizer*", "*.model", "*.txt"]


def resolve_model(model_ref: str) -> str:
    """Return a local model directory for `model_ref`.

    An existing directory passes through; anything else is resolved as a
    Hugging Face Hub repo id (downloading into the HF cache, or reusing a
    previous download when offline)."""
    if os.path.isdir(model_ref):
        return model_ref
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover - bundled with transformers
        raise ValueError(
            f"model_path {model_ref!r} is not a directory and huggingface_hub "
            f"is unavailable to resolve it as a Hub repo id"
        ) from e
    try:
        local = snapshot_download(repo_id=model_ref, allow_patterns=_PATTERNS)
    except Exception:
        # Offline/no-network: fall back to whatever is already cached.
        try:
            local = snapshot_download(
                repo_id=model_ref, allow_patterns=_PATTERNS,
                local_files_only=True,
            )
        except Exception as e:
            raise ValueError(
                f"model_path {model_ref!r} is neither a local directory nor a "
                f"resolvable Hugging Face Hub repo id (download failed and no "
                f"cached copy exists): {e}"
            ) from e
    logger.info("resolved %s -> %s", model_ref, local)
    return local
