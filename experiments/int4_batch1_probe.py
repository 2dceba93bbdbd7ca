"""Why is config1_int4_batch1 SLOWER than int8 (694 vs 784 tok/s, round-5
capture) when the int4 matmul chain measures ~36 us/step FASTER in
isolation (int4_sol_probe: fused int4 533-544 us vs int8-XLA 569-726)?

Method: slope over decode-window length W (t(W_HI)-t(W_LO))/(W_HI-W_LO)
through the REAL engine dispatch — tunnel fixed costs cancel — for bf16 /
int8 / int4 at batch 1, then the standalone 4-matmul chain at the
engine's actual decode bucket (S=8 rows: batch 1 pads to the smallest
decode bucket) for the same three weight formats. If engine deltas
mirror chain deltas, the regression is in the matmul dispatch at S=8; if
not, it's window mechanics (e.g. scan-sliced scale layouts, commit).

Run: python experiments/int4_batch1_probe.py   (needs the TPU chip)
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


def time_dispatch(runner, seqs, reps=REPS):
    for _ in range(2):
        block(runner.dispatch(seqs, False))
    t0 = time.perf_counter()
    for _ in range(reps):
        block(runner.dispatch(seqs, False))
    return (time.perf_counter() - t0) / reps


def engine_slope(quant):
    from nanovllm_tpu import SamplingParams

    model_dir = B.make_model_dir()
    kw = {"quantization": quant} if quant else {}
    engine = B.build_engine(model_dir, 1, num_kvcache_blocks=16,
                            max_model_len=2048, **kw)
    params = SamplingParams(temperature=0.0, max_tokens=512, ignore_eos=True)
    seq = engine.add_request(B.make_prompts(1)[0], params)
    while seq.num_completion_tokens < 1:
        engine.step()
    assert seq.status.name == "RUNNING" and seq.block_table
    engine.scheduler.block_manager.may_append(seq, window=W_HI + 2)
    runner = engine.model_runner
    ts = {}
    for w in (W_LO, W_HI):
        engine.config.decode_window = w
        ts[w] = time_dispatch(runner, [seq])
    per = (ts[W_HI] - ts[W_LO]) / (W_HI - W_LO)
    print(f"engine substep [{quant or 'bf16':5s}]: {per*1e6:7.1f} us "
          f"raw={ {k: round(v*1e3, 1) for k, v in ts.items()} }", flush=True)
    engine.shutdown()
    return per


def chain_at_s8():
    import jax
    import jax.numpy as jnp

    from nanovllm_tpu.ops.quant import quant_matmul, quantize

    rng = np.random.default_rng(0)
    L = 28
    shapes = [(1024, 4096), (2048, 1024), (1024, 6144), (3072, 1024)]

    def mkw(s):
        return jnp.asarray(rng.standard_normal(s, np.float32) * 0.02)

    def timeit(fn, x0, *args, iters=20):
        x = x0
        for _ in range(3):
            x = fn(x, *args)
        np.asarray(x[:1])
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x, *args)
        np.asarray(x[:1])
        return (time.perf_counter() - t0) / iters

    h0 = jnp.asarray(rng.standard_normal((8, 1024), np.float32) * 0.02,
                     jnp.bfloat16)

    for name, ws in (
        ("bf16", [mkw(s).astype(jnp.bfloat16) for s in shapes]),
        ("int8", [quantize(mkw(s), 8, group_size=-1) for s in shapes]),
        ("int4 sym g128", [quantize(mkw(s), 4, group_size=128) for s in shapes]),
        ("int4 sym perch", [quantize(mkw(s), 4, group_size=-1) for s in shapes]),
        # The round-5 production default (meets the dNLL north star):
        # prices the G=64 group loop + the per-group bias rank-1 update.
        ("int4 asym g64", [quantize(mkw(s), 4, group_size=64, mode="asym")
                           for s in shapes]),
        ("int4 asym g128", [quantize(mkw(s), 4, group_size=128, mode="asym")
                            for s in shapes]),
        # Meets the dNLL bar at BOTH measured geometries (2048-hidden
        # +0.0025, 4B +0.0059) where g64 misses at 4B (+0.018).
        ("int4 asym g32", [quantize(mkw(s), 4, group_size=32, mode="asym")
                           for s in shapes]),
    ):
        def chain(h, *ws):
            def body(_, hh):
                y1 = quant_matmul(hh, ws[0]) if name != "bf16" else hh @ ws[0]
                h2 = (quant_matmul(y1[:, :2048], ws[1]) if name != "bf16"
                      else y1[:, :2048] @ ws[1])
                y2 = quant_matmul(h2, ws[2]) if name != "bf16" else h2 @ ws[2]
                h3 = (quant_matmul(y2[:, :3072], ws[3]) if name != "bf16"
                      else y2[:, :3072] @ ws[3])
                return (hh.astype(jnp.float32) * 0.9
                        + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
            return jax.lax.fori_loop(0, L, body, h)

        t = timeit(jax.jit(chain), h0, *ws)
        print(f"mm chain x28L S=8 [{name}]: {t*1e6:7.1f} us/step", flush=True)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    print("— standalone matmul chains at the decode bucket (S=8) —",
          flush=True)
    chain_at_s8()
    print("— engine decode-window slopes at batch 1 —", flush=True)
    for q in (None, "int8", "int4"):
        engine_slope(q)


if __name__ == "__main__":
    main()
