"""Command-line interface.

The reference declares clap/config deps but ships no binary
(Cargo.toml:42-43, SURVEY §2.13); this is the real CLI the docs promise:

  python -m nanovllm_tpu generate --model DIR "prompt" [...]
  python -m nanovllm_tpu chat --model DIR            (interactive REPL)
  python -m nanovllm_tpu bench --model DIR           (decode throughput)
  python -m nanovllm_tpu info --model DIR            (config + stats dump)
  python -m nanovllm_tpu api --model DIR --port 8000 (OpenAI-compatible HTTP)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def _add_engine_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", required=True, help="model directory (HF layout)")
    p.add_argument("--config", help="engine config JSON (Config.save format)")
    p.add_argument("--dtype", default=None, choices=["bfloat16", "float32", "float16"])
    p.add_argument("--quantization", default=None, choices=["int8", "int4"])
    p.add_argument("--kv-cache-dtype", default=None)
    p.add_argument("--tensor-parallel-size", type=int, default=None)
    p.add_argument("--data-parallel-size", type=int, default=None)
    p.add_argument("--max-num-seqs", type=int, default=None)
    p.add_argument("--max-model-len", type=int, default=None)
    p.add_argument("--kvcache-block-size", type=int, default=None)
    p.add_argument("--num-kvcache-blocks", type=int, default=None)
    p.add_argument("--decode-window", type=int, default=None)
    p.add_argument("--enforce-eager", action="store_true")
    p.add_argument("--no-prefix-caching", action="store_true")
    p.add_argument("--sync", action="store_true", help="disable async pipelined scheduling")
    p.add_argument("--no-shared-prefix", action="store_true",
                   help="disable shared-prefix (cascade) decode attention")


def _add_sampling_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--max-tokens", type=int, default=128)
    p.add_argument("--min-tokens", type=int, default=0,
                   help="suppress EOS/stop-string finishes until this many "
                        "completion tokens exist")
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--repetition-penalty", type=float, default=None)
    p.add_argument("--frequency-penalty", type=float, default=0.0)
    p.add_argument("--presence-penalty", type=float, default=0.0)
    p.add_argument("--ignore-eos", action="store_true")
    p.add_argument("--stop", action="append", default=None, metavar="STR",
                   help="stop string (repeatable); output truncates before "
                        "the earliest match")
    p.add_argument("--seed", type=int, default=0, help="engine RNG seed")
    p.add_argument("--request-seed", type=int, default=None,
                   help="per-request sampling seed (batch-invariant)")


def _build_engine(args):
    from nanovllm_tpu import Config
    from nanovllm_tpu.engine.llm_engine import LLMEngine

    if args.config:
        cfg = Config.load(args.config)
        cfg.model_path = args.model
    else:
        cfg = Config(model_path=args.model)
    overrides = {
        "dtype": args.dtype,
        "quantization": args.quantization,
        "kv_cache_dtype": args.kv_cache_dtype,
        "tensor_parallel_size": args.tensor_parallel_size,
        "data_parallel_size": args.data_parallel_size,
        "max_num_seqs": args.max_num_seqs,
        "max_model_len": args.max_model_len,
        "kvcache_block_size": args.kvcache_block_size,
        "num_kvcache_blocks": args.num_kvcache_blocks,
        "decode_window": args.decode_window,
    }
    for k, v in overrides.items():
        if v is not None:
            setattr(cfg, k, v)
    if args.enforce_eager:
        cfg.enforce_eager = True
    if args.no_prefix_caching:
        cfg.enable_prefix_caching = False
    if args.sync:
        cfg.async_scheduling = False
    if getattr(args, "no_shared_prefix", False):
        cfg.shared_prefix_attention = False
    return LLMEngine(cfg, rng_seed=getattr(args, "seed", 0))


def _sampling(args):
    from nanovllm_tpu import SamplingParams

    return SamplingParams(
        temperature=args.temperature,
        max_tokens=args.max_tokens,
        min_tokens=getattr(args, "min_tokens", 0),
        top_p=args.top_p,
        top_k=args.top_k,
        repetition_penalty=args.repetition_penalty,
        frequency_penalty=args.frequency_penalty,
        presence_penalty=args.presence_penalty,
        seed=args.request_seed,
        ignore_eos=args.ignore_eos,
        stop=tuple(args.stop) if getattr(args, "stop", None) else None,
    )


def cmd_generate(args) -> int:
    engine = _build_engine(args)
    outs = engine.generate(list(args.prompts), _sampling(args))
    for out in outs:
        if args.json:
            print(json.dumps({
                "seq_id": out.seq_id, "text": out.text,
                "finish_reason": out.finish_reason,
                "num_completion_tokens": out.num_completion_tokens,
            }))
        else:
            print(out.text)
    return 0


def cmd_chat(args) -> int:
    import asyncio

    engine = _build_engine(args)
    params = _sampling(args)
    print("nanovllm-tpu chat — empty line or Ctrl-D to exit", file=sys.stderr)

    async def turn(prompt: str) -> None:
        async for out in engine.generate_stream(prompt, params):
            sys.stdout.write(out.text)
            sys.stdout.flush()
        sys.stdout.write("\n")

    while True:
        try:
            prompt = input("> ")
        except EOFError:
            break
        if not prompt.strip():
            break
        asyncio.run(turn(prompt))
    return 0


def cmd_bench(args) -> int:
    engine = _build_engine(args)
    params = _sampling(args)
    params.ignore_eos = True
    prompts = ["benchmark prompt " * 8] * args.batch

    def run():
        for p in prompts:
            engine.add_request(p, params)
        t0 = time.perf_counter()
        while not engine.is_finished():
            engine.step()
        return time.perf_counter() - t0

    run()  # warmup/compile
    dt = run()
    total = args.batch * params.max_tokens
    print(json.dumps({
        "metric": "decode_tok_s", "value": round(total / dt, 1),
        "unit": "tok/s", "batch": args.batch, "max_tokens": params.max_tokens,
    }))
    return 0


def cmd_serve(args) -> int:
    """Multi-host serving (docs/multihost.md): every host process runs this
    same command; rank 0 is the frontend (feeds prompts / generates), the
    others replay the replicated engine until shutdown."""
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if args.multihost:
        from nanovllm_tpu.parallel.distributed import initialize

        initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    engine = _build_engine(args)
    if not args.multihost or jax.process_index() == 0:
        outs = engine.generate(list(args.prompts), _sampling(args))
        for out in outs:
            print(json.dumps({
                "seq_id": out.seq_id, "text": out.text,
                "finish_reason": out.finish_reason,
                "num_completion_tokens": out.num_completion_tokens,
            }))
        if args.multihost:
            engine.multihost_shutdown()
    else:
        engine.serve_follower()
    return 0


def cmd_info(args) -> int:
    engine = _build_engine(args)
    stats = engine.get_stats()
    health = engine.health_check()
    print(json.dumps({
        "config": dataclasses.asdict(engine.config),
        "model_config": dataclasses.asdict(engine.model_runner.model_config),
        "attn_impl": engine.model_runner.attn_impl,
        "memory": dataclasses.asdict(stats.memory),
        "healthy": health.healthy,
    }, indent=2, default=str))
    return 0


def cmd_api(args) -> int:
    """OpenAI-compatible HTTP API (POST /v1/completions,
    /v1/chat/completions with SSE streaming, GET /v1/models, /health,
    /stats). Beyond-parity surface: the reference is library-only."""
    from nanovllm_tpu.server import serve

    engine = _build_engine(args)
    serve(engine, host=args.host, port=args.port,
          model_id=args.served_model_name)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="nanovllm_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="batch generation")
    _add_engine_args(g)
    _add_sampling_args(g)
    g.add_argument("prompts", nargs="+")
    g.add_argument("--json", action="store_true")
    g.set_defaults(fn=cmd_generate)

    c = sub.add_parser("chat", help="interactive streaming REPL")
    _add_engine_args(c)
    _add_sampling_args(c)
    c.set_defaults(fn=cmd_chat)

    b = sub.add_parser("bench", help="decode throughput benchmark")
    _add_engine_args(b)
    _add_sampling_args(b)
    b.add_argument("--batch", type=int, default=32)
    b.set_defaults(fn=cmd_bench)

    s = sub.add_parser("serve", help="multi-host serving (one process per host)")
    _add_engine_args(s)
    _add_sampling_args(s)
    s.add_argument("prompts", nargs="*", default=["Hello"])
    s.add_argument("--multihost", action="store_true")
    s.add_argument("--coordinator", default=None, help="host:port of rank 0")
    s.add_argument("--num-processes", type=int, default=None)
    s.add_argument("--process-id", type=int, default=None)
    s.add_argument("--platform", default=None,
                   help="override jax platform (e.g. cpu for local testing)")
    s.set_defaults(fn=cmd_serve)

    a = sub.add_parser("api", help="OpenAI-compatible HTTP server")
    _add_engine_args(a)
    a.add_argument("--host", default="0.0.0.0")
    a.add_argument("--port", type=int, default=8000)
    a.add_argument("--served-model-name", default=None)
    a.set_defaults(fn=cmd_api)

    i = sub.add_parser("info", help="dump engine/model config and stats")
    _add_engine_args(i)
    i.set_defaults(fn=cmd_info)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
