"""Why is a spec-window iteration ~4x a decode-window substep? (round 4)

Config-1 spec decode measured 298 tok/s vs 793 non-spec at batch 1 int8,
acceptance 1/6 — per-iteration cost ~5 ms where a decode substep is
~1.26 ms. At 5 ms/iteration speculation cannot win even at 100%
acceptance (4 tok / 5 ms = 800 tok/s = the non-spec rate), so the gap is
an implementation cost, not a workload property. This probe separates:

  t_dec   per-substep, normal decode window (window-commit pallas path)
  t_spec  per-iteration, spec window as shipped (pallas_chunk verify:
          flash varlen prefill kernel + per-iteration KV row scatter)
  t_ref   per-iteration, spec window with the jnp ref verify
  t_k0    per-iteration, spec window with spec_k=0 (1-token chunks
          through the same pallas_chunk machinery — isolates the verify
          path's fixed costs from chunk width)

Slope method over window length W (run the same dispatch at W_LO and
W_HI; per-iter = (T_HI - T_LO) / (W_HI - W_LO)) so the ~ms-scale tunnel
dispatch cost and host input building cancel.

Run: python experiments/spec_cost_probe.py   (needs the TPU chip)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench as B

W_LO, W_HI = 16, 48
REPS = 6


def block(h):
    np.asarray(h.tokens_dev)
    if h.acc_dev is not None:
        np.asarray(h.acc_dev)


def time_dispatch(runner, seqs, spec, reps=REPS):
    for _ in range(2):  # compile + warm
        block(runner.dispatch(seqs, False, spec=spec))
    t0 = time.perf_counter()
    for _ in range(reps):
        block(runner.dispatch(seqs, False, spec=spec))
    return (time.perf_counter() - t0) / reps


def slope(runner, engine, seqs, spec):
    ts = {}
    for w in (W_LO, W_HI):
        engine.config.decode_window = w
        ts[w] = time_dispatch(runner, seqs, spec)
    return (ts[W_HI] - ts[W_LO]) / (W_HI - W_LO), ts


def main():
    from nanovllm_tpu import SamplingParams

    model_dir = B.make_model_dir()
    engine = B.build_engine(
        model_dir, 1, quantization="int8",
        speculative_num_tokens=3, speculative_max_batch=8,
        # Room for ctx + W*(k+1) on-device window growth.
        num_kvcache_blocks=16, max_model_len=2048,
    )
    # Keep the sequence LIVE mid-decode (ADVICE r4: finishing deallocates
    # its blocks — resurrecting a finished seq times dispatches against an
    # all--1 block table, i.e. dropped/clamped KV scatters instead of the
    # production paged layout). Step only until decode has started, then
    # stop stepping: status stays RUNNING, block_table stays valid.
    params = SamplingParams(temperature=0.0, max_tokens=512, ignore_eos=True)
    seq = engine.add_request(B.make_prompts(1)[0], params)
    while seq.num_completion_tokens < 1:
        engine.step()
    assert seq.status.name == "RUNNING" and seq.block_table, (
        seq.status, seq.block_table)
    runner = engine.model_runner
    seqs = [seq]
    # Reserve blocks through the longest timed window (W_HI iterations x
    # (k+1) tokens at k=3) so every scatter in the timed region lands in a
    # real reserved block, exactly like a scheduled production window.
    engine.scheduler.block_manager.may_append(seq, window=W_HI * 4 + 2)

    t_dec, raw_dec = slope(runner, engine, seqs, spec=False)
    print(f"decode substep: {t_dec*1e3:.3f} ms/iter  raw={ {k: round(v*1e3,1) for k,v in raw_dec.items()} }", flush=True)

    t_spec, raw_spec = slope(runner, engine, seqs, spec=True)
    print(f"spec iter (pallas_chunk, k=3): {t_spec*1e3:.3f} ms/iter  raw={ {k: round(v*1e3,1) for k,v in raw_spec.items()} }", flush=True)

    # Ablation: ref verify.
    saved_impl = runner.attn_impl
    runner.attn_impl = "ref"
    for key in [k for k in runner._decode_fns if k and k[0] == "spec"]:
        del runner._decode_fns[key]
    t_ref, raw_ref = slope(runner, engine, seqs, spec=True)
    print(f"spec iter (ref verify, k=3): {t_ref*1e3:.3f} ms/iter  raw={ {k: round(v*1e3,1) for k,v in raw_ref.items()} }", flush=True)
    runner.attn_impl = saved_impl

    # Ablation: chunk width (spec_k sets config.speculative_num_tokens —
    # read at fn build time — and invalidates the spec fn cache itself).
    def spec_k(k):
        engine.config.speculative_num_tokens = k
        for key in [kk for kk in runner._decode_fns if kk and kk[0] == "spec"]:
            del runner._decode_fns[key]
        t, raw = slope(runner, engine, seqs, spec=True)
        return t, raw

    t_k0, raw_k0 = spec_k(0)
    print(f"spec iter (pallas_chunk, k=0): {t_k0*1e3:.3f} ms/iter  raw={ {k: round(v*1e3,1) for k,v in raw_k0.items()} }", flush=True)
    t_k1, raw_k1 = spec_k(1)
    print(f"spec iter (pallas_chunk, k=1): {t_k1*1e3:.3f} ms/iter  raw={ {k: round(v*1e3,1) for k,v in raw_k1.items()} }", flush=True)

    engine.shutdown()


if __name__ == "__main__":
    main()
