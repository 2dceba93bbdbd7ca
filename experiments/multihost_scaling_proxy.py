"""Config-5 scaling-efficiency proxy (BASELINE.md:27 ">85% tokens/s
scaling efficiency at 2 hosts").

Real DCN hardware is unavailable, so the published stand-in holds the
machine resources CONSTANT and varies only the coordination: the SAME
decode-heavy workload through the real engine (CPU backend), 2 real
processes under the replicated-deterministic serving loop, at
  (a) multihost_sync_interval=8 (the recommended production setting), and
  (b) multihost_sync_interval=10**9 (the no-coordination control — the
      intake broadcast never runs mid-serving),
reporting the per-process tokens/s ratio (a)/(b) = the coordination
efficiency factor. The intake broadcast is the ONLY steady-state
cross-host traffic in this design, so this ratio IS the sync cost; in the
replicated-scheduler design, N-host tokens/s = N x per-host rate x this
factor (each host owns its data-parallel shard of the batch).

Why not 1-proc vs 2-proc directly: this CI machine has ONE CPU core, so
two co-located processes each run at ~half speed from scheduler
contention alone — a round-4 version of this proxy published that
contention (0.48) as if it were coordination cost, and an earlier one
compared two DIFFERENT engine configs (2.44). Real 2-host deployments
don't share cores; contention is held constant here by keeping both runs
at 2 processes. The 1-proc number is still measured and published for
transparency, labeled with the core-count caveat.

Caveats stated with the number: CPU-mesh processes, loopback gloo (real
DCN adds latency but the broadcast is off the step critical path at
interval 8), and the model is the test fixture (sync cost is
model-size-independent — it ships token ids, not tensors).

Writes the result into BASELINE.json["config5_scaling_proxy"].
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def make_model_dir(tmp="/tmp/mh_proxy_model"):
    os.makedirs(tmp, exist_ok=True)
    cfg = dict(
        model_type="qwen3", vocab_size=256, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=512, rms_norm_eps=1e-6,
        rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=None,
    )
    with open(os.path.join(tmp, "config.json"), "w") as f:
        json.dump(cfg, f)
    if not any(f.endswith(".safetensors") for f in os.listdir(tmp)):
        import jax, jax.numpy as jnp
        from nanovllm_tpu.models.qwen3 import Qwen3Config, init_params
        from nanovllm_tpu.utils.loader import save_qwen3_weights_hf

        c = Qwen3Config.from_hf(cfg)
        save_qwen3_weights_hf(init_params(c, jax.random.PRNGKey(0), jnp.float32), c, tmp)
    return tmp


def run_pair(model_dir, interval=8, out_dir=None):
    out_dir = out_dir or f"/tmp/mh_proxy_{interval}"
    os.makedirs(out_dir, exist_ok=True)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    outs = [os.path.join(out_dir, f"r{r}.json") for r in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", WORKER, str(r), "2", str(port), model_dir,
             outs[r], "--bench", str(interval)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for r in range(2)
    ]
    for r, p in enumerate(procs):
        log, _ = p.communicate(timeout=300)
        assert p.returncode == 0, f"rank {r}:\n{log[-3000:]}"
    d = json.load(open(outs[0]))
    return d["tokens"] / d["wall_s"]


def run_single(model_dir):
    """Same workload and the IDENTICAL engine config the multihost worker
    uses (tests/multihost_worker.py:43-50 minus the distributed init), one
    process — a round-4 version compared a decode_window=4 async worker to
    a window-32 sync engine and published a meaningless 2.4 'efficiency'."""
    code = f"""
import json, time, sys
sys.path.insert(0, {REPO!r})
from nanovllm_tpu import Config, SamplingParams
from nanovllm_tpu.engine.llm_engine import LLMEngine

engine = LLMEngine(Config(
    model_path={make_model_dir()!r}, device="cpu", dtype="float32",
    kvcache_block_size=16, num_kvcache_blocks=32, max_num_seqs=8,
    max_num_batched_tokens=256, max_model_len=128, decode_window=4,
    async_scheduling=True, pipeline_depth=2,
    block_manager_backend="python",
), rng_seed=0)
p = SamplingParams(temperature=0.0, max_tokens=48, ignore_eos=True)
prompts = [f"bench prompt {{i}} lorem ipsum" for i in range(4)]

def one_pass():
    waves = [engine.add_request(pr, p) for pr in prompts]
    while not engine.is_finished():
        engine.step()
    return sum(s.num_completion_tokens for s in waves)

one_pass()
t0 = time.time()
tokens = one_pass()
print(json.dumps({{"tokens": tokens, "wall_s": time.time() - t0}}))
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    d = json.loads(out.stdout.strip().splitlines()[-1])
    return d["tokens"] / d["wall_s"]


def main():
    model_dir = make_model_dir()
    # Best-of-3 interleaved (one shared CPU: transient load hits all arms).
    r_sync = r_nosync = r1 = 0.0
    for _ in range(3):
        r_sync = max(r_sync, run_pair(model_dir, interval=8))
        r_nosync = max(r_nosync, run_pair(model_dir, interval=10**9))
        r1 = max(r1, run_single(model_dir))
    eff = r_sync / r_nosync
    result = {
        "per_process_tok_s_2proc_interval8": round(r_sync, 2),
        "per_process_tok_s_2proc_nosync_control": round(r_nosync, 2),
        "efficiency_proxy": round(eff, 3),
        "target": ">= 0.85 (BASELINE.md:27)",
        "tok_s_1proc_same_machine": round(r1, 2),
        "tok_s_1proc_caveat": (
            "this CI machine has 1 CPU core; 2 co-located processes each "
            "run at ~half speed from core contention alone, which real "
            "2-host deployments don't have — so the efficiency proxy "
            "holds process count constant and varies only the sync."
        ),
        "method": (
            "same decode-heavy workload, IDENTICAL engine config, via the "
            "real engine on CPU: 2 real processes under "
            "replicated-deterministic serving, gloo intake broadcast every "
            "8 steps vs a never-syncs control (interval=10^9); per-process "
            "tokens/s ratio isolates the coordination cost, the only "
            "cross-host traffic in steady state. N-host tokens/s = N x "
            "per-host rate x this factor in the replicated-scheduler "
            "design. Caveats: loopback gloo (DCN adds latency off the "
            "critical path), fixture-sized model (sync ships token ids, "
            "not tensors — cost is model-size-independent). Continuously "
            "asserted <5% overhead in "
            "tests/test_multihost.py::test_sync_interval_cost."
        ),
    }
    print(json.dumps(result, indent=2))
    path = os.path.join(REPO, "BASELINE.json")
    with open(path) as f:
        baseline = json.load(f)
    baseline["config5_scaling_proxy"] = result
    with open(path, "w") as f:
        json.dump(baseline, f, indent=2)
    print("written to BASELINE.json[config5_scaling_proxy]")


if __name__ == "__main__":
    main()
