"""OpenAI-compatible HTTP serving front end (stdlib only).

The reference is an in-process library with no server or RPC layer
(SURVEY §1: "no server/CLI binary, no RPC layer"); this module is
beyond-parity surface so the engine can be consumed the way serving
engines actually are: POST /v1/completions and /v1/chat/completions
(with SSE streaming), GET /v1/models, /health, /stats.

Threading model: `http.server.ThreadingHTTPServer` handlers run on
worker threads, but the engine is single-threaded by design (one async
serving loop, SURVEY §5 race-detection note). All engine access is
therefore funneled through ONE `EngineWorker` thread: handlers submit
(prompt, params, reply-queue) commands and read token deltas off their
reply queue; the worker drains submissions, calls `engine.step()`, and
fans out per-request deltas — the same incremental-detokenization
holdback logic as `LLMEngine.generate_stream` (llm_engine.py:421).
"""

from __future__ import annotations

import json
import logging
import queue
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

from nanovllm_tpu.engine.sampling_params import SamplingParams
from nanovllm_tpu.engine.sequence import SequenceStatus

logger = logging.getLogger(__name__)

_DONE = object()


class _Tracked:
    __slots__ = ("seq", "reply", "pump")

    def __init__(self, seq, reply, pump):
        self.seq = seq
        self.reply = reply
        # The engine's unified streaming core (StreamPump): holdback and
        # logprob-delta logic lives THERE, shared with generate_stream —
        # the server only forwards what drain() returns.
        self.pump = pump


# Wire payloads are the engine's own StreamDelta objects.
from nanovllm_tpu.engine.llm_engine import StreamDelta as Delta  # noqa: E402


class EngineWorker(threading.Thread):
    """The single thread allowed to touch the engine."""

    def __init__(self, engine):
        super().__init__(daemon=True, name="nanovllm-engine")
        self.engine = engine
        self.commands: "queue.Queue" = queue.Queue()
        self.tracked: List[_Tracked] = []
        self._stop = threading.Event()

    def submit(self, prompt: str, params: SamplingParams) -> "queue.Queue":
        """Called from handler threads. Returns the reply queue; the first
        item is either the live Sequence or an Exception (validation)."""
        reply: "queue.Queue" = queue.Queue()
        self.commands.put(("submit", prompt, params, reply))
        return reply

    def abort(self, seq_id: int) -> None:
        self.commands.put(("abort", seq_id, None, None))

    def query(self, kind: str, timeout: float = 10.0):
        """Run an engine introspection call (`health`/`stats`) ON the worker
        thread and return its result. Handler threads must never touch the
        engine directly: the native block manager's ctypes calls release
        the GIL, so a concurrent get_stats() during allocate() would race
        inside C++ containers."""
        reply: "queue.Queue" = queue.Queue()
        self.commands.put((kind, None, None, reply))
        out = reply.get(timeout=timeout)
        if isinstance(out, Exception):
            raise out
        return out

    def shutdown(self) -> None:
        self._stop.set()
        self.commands.put(("noop", None, None, None))

    # -- worker thread ----------------------------------------------------
    def run(self) -> None:
        # The loop must NEVER die with requests outstanding: a dead worker
        # leaves every handler blocked on its reply queue while /health
        # keeps answering (code review r3). Any unexpected exception fails
        # the in-flight requests and keeps serving.
        while not self._stop.is_set():
            try:
                self._drain_commands(block=not self.tracked)
                if self._stop.is_set():
                    break
                if self.tracked and self.engine.has_unfinished():
                    self.engine.step()
                self._emit_deltas()
            except Exception:
                logger.exception("engine worker iteration failed")
                for t in self.tracked:
                    t.reply.put(RuntimeError("engine worker failed"))
                    t.reply.put(_DONE)
                self.tracked.clear()

    def _drain_commands(self, block: bool) -> None:
        try:
            cmd = self.commands.get(timeout=0.2 if block else 0)
        except queue.Empty:
            return
        while True:
            kind, a, b, reply = cmd
            if kind == "submit":
                try:
                    seq = self.engine.add_request(a, b)
                    self.tracked.append(
                        _Tracked(seq, reply, self.engine.delta_pump(seq))
                    )
                    reply.put(seq)
                except Exception as e:
                    reply.put(e)
            elif kind == "abort":
                try:
                    self.engine.abort_request(a)
                except Exception:
                    logger.exception("abort failed")
            elif kind in ("health", "stats"):
                try:
                    reply.put(
                        self.engine.health_check() if kind == "health"
                        else self.engine.get_stats()
                    )
                except Exception as e:
                    reply.put(e)
            try:
                cmd = self.commands.get_nowait()
            except queue.Empty:
                return

    def _emit_deltas(self) -> None:
        still = []
        for t in self.tracked:
            try:
                for d in t.pump.drain():
                    t.reply.put(d)
                if t.pump.finished:
                    t.reply.put(_DONE)
                else:
                    still.append(t)
            except Exception as e:  # fail this request, keep the worker
                logger.exception(
                    "delta emission failed for seq %s", t.seq.seq_id)
                t.reply.put(e)
                t.reply.put(_DONE)
        self.tracked = still


def _build_params(body: dict) -> SamplingParams:
    stop = body.get("stop")
    if isinstance(stop, str):
        stop = [stop]
    params = SamplingParams(
        temperature=float(body.get("temperature", 1.0)),
        max_tokens=int(body.get("max_tokens", 16)),
        min_tokens=int(body.get("min_tokens", 0)),
        top_p=body.get("top_p"),
        top_k=body.get("top_k"),
        seed=body.get("seed"),
        frequency_penalty=float(body.get("frequency_penalty", 0.0)),
        presence_penalty=float(body.get("presence_penalty", 0.0)),
        repetition_penalty=body.get("repetition_penalty"),
        stop=stop,
        stop_token_ids=(tuple(body["stop_token_ids"])
                        if body.get("stop_token_ids") else None),
        logit_bias=body.get("logit_bias") or None,
        # OpenAI semantics: completions `logprobs` is an INT (top-N);
        # chat uses `logprobs: bool` + `top_logprobs: int`.
        logprobs=_parse_logprobs(body),
        ignore_eos=bool(body.get("ignore_eos", False)),
    )
    params.validate()
    return params


def _parse_logprobs(body: dict) -> Optional[int]:
    lp = body.get("logprobs")
    if lp is None or lp is False:
        return None
    if lp is True:  # chat style: pair with top_logprobs (int, may be 0)
        return int(body.get("top_logprobs") or 0)
    return int(lp)   # completions style: int = top-N


def _chat_lp_entry(token_text: str, lp: float, top) -> dict:
    """`top` entries arrive as (token_text, logprob) — decoded by the
    engine worker (OpenAI clients expect token text, not id strings)."""
    entry = {"token": token_text, "logprob": lp}
    if top:
        entry["top_logprobs"] = [
            {"token": t, "logprob": float(v)} for t, v in top
        ]
    return entry


def _completions_lp(lps) -> dict:
    return {
        "tokens": [tok for tok, _, _ in lps],
        "token_logprobs": [lp for _, lp, _ in lps],
        "top_logprobs": [
            ({t: float(v) for t, v in top} if top else None)
            for _, _, top in lps
        ],
    }


def _chat_to_prompt(tokenizer, messages: List[dict]) -> str:
    tpl = getattr(tokenizer, "apply_chat_template", None)
    if tpl is not None:
        try:
            return tpl(messages, tokenize=False, add_generation_prompt=True)
        except Exception:
            logger.warning(
                "chat template failed; falling back to role:content "
                "formatting (completions may be degraded)", exc_info=True,
            )
    # Fallback template for tokenizers without a chat template.
    lines = [f"{m.get('role', 'user')}: {m.get('content', '')}"
             for m in messages]
    lines.append("assistant:")
    return "\n".join(lines)


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "nanovllm-tpu"

    # Injected by make_server: worker, model_id
    worker: EngineWorker = None
    model_id: str = "nanovllm"

    def log_message(self, fmt, *args):  # route through logging, not stderr
        logger.debug("%s - %s", self.address_string(), fmt % args)

    # -- helpers ----------------------------------------------------------
    def _json(self, code: int, obj: dict) -> None:
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _error(self, code: int, message: str, etype: str = "invalid_request_error") -> None:
        self._json(code, {"error": {"message": message, "type": etype}})

    def _read_body(self) -> Optional[dict]:
        try:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")
        except Exception:
            self._error(400, "invalid JSON body")
            return None

    # -- routes -----------------------------------------------------------
    def do_GET(self):
        if self.path == "/v1/models":
            self._json(200, {"object": "list", "data": [
                {"id": self.model_id, "object": "model",
                 "owned_by": "nanovllm-tpu"}]})
        elif self.path == "/health":
            h = self.worker.query("health")
            self._json(200 if h.healthy else 503, {
                "healthy": h.healthy, "memory_utilization": h.memory_utilization,
            })
        elif self.path == "/stats":
            st = self.worker.query("stats")
            self._json(200, {
                "running": st.scheduler.num_running,
                "waiting": st.scheduler.num_waiting,
                "finished": st.scheduler.num_finished,
                "preemptions": st.scheduler.num_preemptions,
                "block_utilization": st.scheduler.block_manager.utilization,
                "prefix_cache_hit_rate":
                    st.scheduler.block_manager.cache_efficiency,
            })
        else:
            self._error(404, f"no route {self.path}")

    def do_POST(self):
        if self.path == "/v1/completions":
            body = self._read_body()
            if body is None:
                return
            prompt = body.get("prompt", "")
            if isinstance(prompt, list):
                if len(prompt) != 1:
                    return self._error(400, "batched prompts unsupported; send one")
                prompt = prompt[0]
            self._serve_generation(body, prompt, chat=False)
        elif self.path == "/v1/chat/completions":
            body = self._read_body()
            if body is None:
                return
            messages = body.get("messages")
            if not isinstance(messages, list) or not messages:
                return self._error(400, "messages must be a non-empty list")
            prompt = _chat_to_prompt(self.worker.engine.tokenizer, messages)
            self._serve_generation(body, prompt, chat=True)
        else:
            self._error(404, f"no route {self.path}")

    # -- generation -------------------------------------------------------
    MAX_N = 16

    def _serve_generation(self, body: dict, prompt: str, chat: bool) -> None:
        try:
            params = _build_params(body)
            n = int(body.get("n", 1))
            if not (1 <= n <= self.MAX_N):
                raise ValueError(f"n must be in [1, {self.MAX_N}], got {n}")
            best_of = body.get("best_of")
            if best_of is not None and int(best_of) != n:
                raise ValueError("best_of != n unsupported")
        except (ValueError, TypeError) as e:
            return self._error(400, str(e))
        # n>1 = n independent samples of the same prompt, batched by the
        # engine (the prefix cache dedups the shared prompt KV). Unseeded
        # rows draw independent Gumbel noise; an explicit seed gets
        # per-choice derived seeds so choices still differ (OpenAI `n`
        # would be useless returning n identical completions).
        plist = [params]
        for i in range(1, n):
            plist.append(params.with_seed(params.seed + i)
                         if params.seed is not None else params)
        pairs = []  # (reply, seq) per choice
        for p in plist:
            reply = self.worker.submit(prompt, p)
            first = reply.get()
            if isinstance(first, Exception):
                for r, s in pairs:
                    self.worker.abort(s.seq_id)
                return self._error(400, str(first))
            pairs.append((reply, first))
        rid = ("chatcmpl-" if chat else "cmpl-") + uuid.uuid4().hex[:24]
        created = int(time.time())
        want_lp = params.logprobs is not None
        if body.get("stream"):
            self._stream_sse(pairs, rid, created, chat)
        else:
            self._respond_once(pairs, rid, created, chat, want_lp)

    def _respond_once(self, pairs, rid, created, chat, want_lp) -> None:
        choices = []
        usage = {"prompt_tokens": 0, "completion_tokens": 0, "total_tokens": 0}
        for idx, (reply, seq) in enumerate(pairs):
            text, finish, lps = [], "stop", []
            while True:
                item = reply.get()
                if item is _DONE:
                    break
                if isinstance(item, Exception):
                    for _, s in pairs:
                        self.worker.abort(s.seq_id)
                    return self._error(500, str(item), "server_error")
                text.append(item.text)
                if item.logprob is not None:
                    lps.append((item.text, item.logprob, item.top))
                if item.finish_reason is not None:
                    finish = item.finish_reason
            full = "".join(text)
            usage["prompt_tokens"] += seq.num_prompt_tokens
            usage["completion_tokens"] += seq.num_completion_tokens
            usage["total_tokens"] += (
                seq.num_prompt_tokens + seq.num_completion_tokens
            )
            if chat:
                choice = {"index": idx, "finish_reason": finish,
                          "message": {"role": "assistant", "content": full}}
                if want_lp:
                    choice["logprobs"] = {"content": [
                        _chat_lp_entry(tok, lp, top) for tok, lp, top in lps
                    ]}
            else:
                choice = {"index": idx, "finish_reason": finish, "text": full}
                if want_lp:
                    choice["logprobs"] = _completions_lp(lps)
            choices.append(choice)
        obj = "chat.completion" if chat else "text_completion"
        self._json(200, {"id": rid, "object": obj, "created": created,
                         "model": self.model_id, "choices": choices,
                         "usage": usage})

    def _stream_sse(self, pairs, rid, created, chat) -> None:
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()

        def send_chunk(payload: str) -> None:
            data = payload.encode()
            self.wfile.write(f"{len(data):x}\r\n".encode())
            self.wfile.write(data + b"\r\n")

        obj = "chat.completion.chunk" if chat else "text_completion"
        try:
            if chat:
                for idx in range(len(pairs)):
                    send_chunk("data: " + json.dumps({
                        "id": rid, "object": obj, "created": created,
                        "model": self.model_id,
                        "choices": [{"index": idx, "finish_reason": None,
                                     "delta": {"role": "assistant",
                                               "content": ""}}],
                    }) + "\n\n")
            # Mux the n choice queues: poll round-robin, emit chunks as they
            # arrive (choices generate concurrently in one engine batch).
            live = {i: reply for i, (reply, _) in enumerate(pairs)}
            while live:
                progressed = False
                for idx in list(live):
                    try:
                        item = live[idx].get_nowait()
                    except queue.Empty:
                        continue
                    progressed = True
                    if item is _DONE or isinstance(item, Exception):
                        del live[idx]
                        continue
                    if item.text == "" and item.finish_reason is None:
                        continue
                    reason = item.finish_reason
                    if chat:
                        choice = {"index": idx, "finish_reason": reason,
                                  "delta": ({"content": item.text}
                                            if reason is None else {})}
                        if item.logprob is not None and reason is None:
                            choice["logprobs"] = {"content": [
                                _chat_lp_entry(item.text, item.logprob,
                                               item.top)
                            ]}
                    else:
                        choice = {"index": idx, "finish_reason": reason,
                                  "text": item.text}
                        if item.logprob is not None and reason is None:
                            choice["logprobs"] = _completions_lp(
                                [(item.text, item.logprob, item.top)]
                            )
                    send_chunk("data: " + json.dumps({
                        "id": rid, "object": obj, "created": created,
                        "model": self.model_id, "choices": [choice],
                    }) + "\n\n")
                if not progressed:
                    time.sleep(0.005)
            send_chunk("data: [DONE]\n\n")
            self.wfile.write(b"0\r\n\r\n")
        except (BrokenPipeError, ConnectionResetError):
            # Client hung up mid-stream: cancel the requests, free blocks.
            for _, seq in pairs:
                self.worker.abort(seq.seq_id)


def make_server(engine, host: str = "0.0.0.0", port: int = 8000,
                model_id: Optional[str] = None):
    """Returns (ThreadingHTTPServer, EngineWorker) — caller starts/stops.

    The worker thread is started here; `server.serve_forever()` blocks (run
    it on the main thread or another thread). Shut down with
    `server.shutdown(); worker.shutdown()`."""
    worker = EngineWorker(engine)
    worker.start()
    handler = type("Handler", (_Handler,), {
        "worker": worker,
        "model_id": model_id or engine.config.model_path.rstrip("/").split("/")[-1],
    })
    server = ThreadingHTTPServer((host, port), handler)
    return server, worker


def serve(engine, host: str = "0.0.0.0", port: int = 8000,
          model_id: Optional[str] = None) -> None:
    server, worker = make_server(engine, host, port, model_id)
    logger.info("serving OpenAI-compatible API on %s:%d", host, port)
    try:
        server.serve_forever()
    finally:
        worker.shutdown()
        server.server_close()
