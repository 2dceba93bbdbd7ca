"""CLI smoke tests (the reference declares clap but ships no binary)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.fixture
def model_dir(tmp_path):
    with open(tmp_path / "config.json", "w") as f:
        json.dump(dict(model_type="qwen3", vocab_size=512, hidden_size=128,
                       intermediate_size=256, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       head_dim=32, tie_word_embeddings=True), f)
    return str(tmp_path)


def _run(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return subprocess.run(
        [sys.executable, "-m", "nanovllm_tpu", *args],
        capture_output=True, text=True, timeout=240, env=env,
    )


def test_generate_json(model_dir):
    r = _run(["generate", "--model", model_dir, "--max-tokens", "4",
              "--ignore-eos", "--json", "hi"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["num_completion_tokens"] == 4


def test_info(model_dir):
    r = _run(["info", "--model", model_dir])
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout)
    assert info["healthy"] is True
    assert info["model_config"]["num_hidden_layers"] == 2
