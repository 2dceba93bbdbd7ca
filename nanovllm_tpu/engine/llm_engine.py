"""LLMEngine: the public serving API.

Capability parity with the reference LLMEngine
(src/engine/llm_engine.rs:23-489): construction from config/model path,
batch `generate`, streaming `generate_stream`, single `step`, stats/health
introspection, graceful shutdown, and a builder — with the reference's stubs
implemented for real: true HF tokenization (vs char codes, llm_engine.rs:
219-230), finished outputs actually returned (vs the no-op at 190-196), and
per-token incremental streaming with detokenized text deltas.

Async model: the reference uses tokio + Arc<Mutex>; here the engine is a
single-owner object driven either synchronously (`generate`) or via an
asyncio generator (`generate_stream`) — the control plane is pure Python, so
no locking is needed (SURVEY §5 race-detection note).
"""

from __future__ import annotations

import asyncio
import logging
import os
import time
from dataclasses import dataclass
from typing import AsyncGenerator, Dict, List, Optional

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.model_runner import DispatchHandle, ModelRunner
from nanovllm_tpu.engine.sampling_params import SamplingParams
from nanovllm_tpu.engine.scheduler import Scheduler, SchedulerStats
from nanovllm_tpu.engine.sequence import Sequence, SequenceOutput, SequenceStatus
from nanovllm_tpu.utils.tokenizer import load_tokenizer

logger = logging.getLogger(__name__)


@dataclass
class MemoryStats:
    """Reference: llm_engine.rs:375-400."""

    total_blocks: int
    used_blocks: int
    free_blocks: int
    utilization: float
    cache_efficiency: float


@dataclass
class PerfStats:
    """Per-step timing (SURVEY §5: per-step timing in engine stats; the
    reference exposes none)."""

    num_steps: int = 0
    total_step_time_s: float = 0.0
    last_step_time_s: float = 0.0
    total_generated_tokens: int = 0

    @property
    def avg_step_time_s(self) -> float:
        return self.total_step_time_s / self.num_steps if self.num_steps else 0.0

    @property
    def tokens_per_second(self) -> float:
        if self.total_step_time_s <= 0:
            return 0.0
        return self.total_generated_tokens / self.total_step_time_s


@dataclass
class EngineStats:
    scheduler: SchedulerStats
    memory: MemoryStats
    is_running: bool
    num_compilations: int
    perf: Optional[PerfStats] = None


@dataclass
class StreamDelta:
    """One streamed increment: the text delta for a newly accepted token
    (or the terminal marker, text == "" with finish_reason set)."""

    text: str
    emitted: int
    logprob: Optional[float] = None
    top: Optional[list] = None  # [(token_text, logprob), ...]
    finish_reason: Optional[str] = None


class StreamPump:
    """Per-request incremental streaming state — the single delta source
    for generate_stream AND the HTTP server (server.py consumes drain()
    directly). Holds the emitted-token cursor and the stable-text prefix
    that stop-string/UTF-8 holdback has already released."""

    def __init__(self, engine: "LLMEngine", seq):
        self.engine = engine
        self.seq = seq
        self.emitted = 0
        self.prev_text = ""
        self.finished = False

    def drain(self) -> List[StreamDelta]:
        """All deltas newly available since the last call; appends the
        terminal marker (finish_reason set) once the sequence is done and
        fully emitted, after which `finished` is True."""
        seq = self.seq
        out: List[StreamDelta] = []
        if self.finished:
            return out
        done_status = seq.status in (
            SequenceStatus.FINISHED, SequenceStatus.ERROR
        )
        while self.emitted < seq.num_completion_tokens:
            self.emitted += 1
            last = self.emitted == seq.num_completion_tokens and done_status
            stable, delta = self.engine.stream_delta(
                seq, self.emitted, self.prev_text, last
            )
            self.prev_text = stable
            lp = top = None
            if seq.completion_logprobs is not None:
                i = self.emitted - 1
                if i < len(seq.completion_logprobs):
                    lp = float(seq.completion_logprobs[i])
                if (seq.completion_top_logprobs is not None
                        and i < len(seq.completion_top_logprobs)):
                    # Wire format carries token TEXT; the library-level
                    # lists carry (token_id, logprob).
                    dec = self.engine.tokenizer.decode
                    top = [(dec([tid]), float(v))
                           for tid, v in seq.completion_top_logprobs[i]]
            out.append(StreamDelta(delta, self.emitted, logprob=lp, top=top))
        if done_status:
            out.append(StreamDelta(
                "", self.emitted,
                finish_reason=seq.finish_reason
                or ("error" if seq.status == SequenceStatus.ERROR else "stop"),
            ))
            self.finished = True
        return out


@dataclass
class HealthStatus:
    """Reference: llm_engine.rs:403-416."""

    healthy: bool
    memory_utilization: float
    num_running: int
    num_waiting: int
    reason: str = ""


class LLMEngine:
    def __init__(self, config: Config, rng_seed: int = 0):
        if config.model_path and not os.path.isdir(config.model_path):
            # Hub repo id convenience (reference declares hf-hub support,
            # Cargo.toml:23, but never wires it): resolve + cache locally.
            from nanovllm_tpu.utils.hub import resolve_model

            config.model_path = resolve_model(config.model_path)
        config.validate()
        self.config = config
        self.tokenizer = load_tokenizer(config.model_path)
        if config.eos_token_id is None:
            config.eos_token_id = getattr(self.tokenizer, "eos_token_id", None)
        self.model_runner = ModelRunner(config, rng_seed=rng_seed)
        self.scheduler = Scheduler(config)
        mc = self.model_runner.model_config
        if (
            config.sliding_window_kv_eviction
            # Rolling-buffer eviction needs EVERY layer local: one global
            # layer (Gemma-2 alternation) keeps all KV live.
            and mc.layer_types is None
        ):
            self.scheduler.sliding_window = mc.sliding_window
        self.is_running = False
        # Async pipelined scheduling: up to `pipeline_depth` dispatches in
        # flight whose results have not been fetched (sampled tokens feed
        # the next dispatch ON DEVICE, so host round trips overlap device
        # work). FIFO order.
        self._pending: List[DispatchHandle] = []
        # Outputs produced while draining outside step() (save_state,
        # shutdown): surfaced from the NEXT step() call so concurrent
        # generate()/stream drivers never lose a finished request.
        self._drained_outputs: List[SequenceOutput] = []
        self.perf = PerfStats()
        # Incremental detokenization state per live seq_id.
        self._stream_text: Dict[int, str] = {}
        # Multi-host replicated-deterministic serving (docs/multihost.md):
        # every host runs this same engine; request intake is the ONLY
        # synchronized event. Rank 0 buffers new requests and broadcasts
        # them at deterministic sync points; every host (rank 0 included)
        # enqueues them there, so scheduling state stays bit-identical with
        # no per-step coordination.
        from nanovllm_tpu.parallel.distributed import is_multihost

        self._multihost = is_multihost()
        self._intake_requests: List[tuple] = []   # (token_ids, params), rank 0
        self._intake_seqs: List[Sequence] = []    # rank-0 pre-created handles
        self._intake_aborts: List[int] = []       # rank-0 buffered abort seq_ids
        self._stop_requested = False              # rank-0 flag, broadcast next sync
        self.stopped = False                      # set on ALL ranks by the sentinel
        self._steps_since_sync = 0
        logger.info(
            "engine ready: model=%s blocks=%d block_size=%d",
            config.model_path,
            config.num_kvcache_blocks,
            config.kvcache_block_size,
        )

    @classmethod
    def from_model_path(cls, model_path: str, **kw) -> "LLMEngine":
        return cls(Config(model_path=model_path, **kw))

    # ------------------------------------------------------------------
    # Request intake (reference: llm_engine.rs:200-230)
    # ------------------------------------------------------------------
    def _create_sequences(
        self, prompts: List[str], params: Optional[SamplingParams]
    ) -> List[Sequence]:
        params = params or SamplingParams()
        seqs = []
        for prompt in prompts:
            token_ids = self.tokenizer.encode(prompt)
            if not token_ids:
                token_ids = [self.config.eos_token_id or 0]
            seqs.append(
                Sequence(token_ids, params, block_size=self.config.kvcache_block_size)
            )
        return seqs

    def add_request(
        self, prompt: str, params: Optional[SamplingParams] = None
    ) -> Sequence:
        """Continuous-batching entry point: enqueue without blocking.

        Multi-host: only the rank-0 frontend accepts requests; the returned
        Sequence is a live handle but is enqueued at the next intake sync
        (so every host admits it at the same step)."""
        import jax

        if self._multihost and jax.process_index() != 0:
            raise RuntimeError(
                "multi-host engine: requests must enter via the rank-0 frontend"
            )
        # Validate BEFORE constructing the Sequence: construction bumps the
        # global seq-id counter, and a post-construction validation failure
        # on rank 0 would leave its counter permanently ahead of followers'
        # (later aborts are matched by seq_id — the replicated schedulers
        # would silently diverge).
        (params or SamplingParams()).validate()
        seq = self._create_sequences([prompt], params)[0]
        if self._multihost:
            self._intake_requests.append((seq.token_ids[:], seq.sampling_params))
            self._intake_seqs.append(seq)
        else:
            self.scheduler.add_sequence(seq)
        return seq

    # ------------------------------------------------------------------
    # Multi-host intake sync (docs/multihost.md; SURVEY §7 M6)
    # ------------------------------------------------------------------
    def _intake_sync_due(self) -> bool:
        """Deterministic on every host: sync when the engine is idle (a
        blocked follower waits here for work) or every
        multihost_sync_interval steps (mid-flight admission)."""
        if self.is_finished():
            return True
        return self._steps_since_sync >= self.config.multihost_sync_interval

    def _sync_intake(self) -> None:
        """Collective: every host must call this at the same engine state.
        Broadcasts rank 0's buffered requests (and the stop flag) and
        enqueues them identically everywhere. Sequence ids stay aligned
        because every host creates the same sequences in the same order."""
        import jax

        from nanovllm_tpu.parallel.distributed import broadcast_object

        root = jax.process_index() == 0
        payload = (
            (self._intake_requests, self._intake_aborts, self._stop_requested)
            if root
            else None
        )
        requests, aborts, stop = broadcast_object(payload)
        if root:
            seqs = self._intake_seqs
            self._intake_requests, self._intake_seqs = [], []
            self._intake_aborts = []
        else:
            seqs = [
                Sequence(list(tok), params, block_size=self.config.kvcache_block_size)
                for tok, params in requests
            ]
        for seq in seqs:
            self.scheduler.add_sequence(seq)
        for seq_id in aborts:
            self._abort_by_id(seq_id)
        if stop:
            self.stopped = True
        self._steps_since_sync = 0

    def serve_follower(self, heartbeat_interval_s: float = 60.0) -> None:
        """Follower (non-rank-0) serving loop: replays the replicated
        engine until the rank-0 frontend broadcasts shutdown. Blocks inside
        the intake broadcast while idle.

        Liveness: logs a heartbeat every `heartbeat_interval_s` of wall
        time so operators can distinguish a healthy idle follower from a
        wedged one; a coordinator/rank-0 loss surfaces as the collective's
        error, logged with context before re-raising (jax.distributed's
        heartbeat watchdog kills the process group underneath us — the
        re-raise lets a supervisor restart + re-prefill via the preemption
        state machine)."""
        last = time.monotonic()
        steps = 0
        while not self.stopped:
            try:
                self.step()
            except Exception:
                logger.exception(
                    "follower serving loop failed after %d steps (rank-0 "
                    "or coordinator lost?) — resume by restarting the "
                    "process group; in-flight requests recover via "
                    "re-prefill", steps,
                )
                raise
            steps += 1
            now = time.monotonic()
            if now - last >= heartbeat_interval_s:
                st = self.scheduler.get_stats()
                logger.info(
                    "follower alive: %d steps, running=%d waiting=%d",
                    steps, st.num_running, st.num_waiting,
                )
                last = now

    def multihost_shutdown(self) -> None:
        """Rank 0: broadcast the stop sentinel so followers exit
        serve_follower. Collective with the followers' next sync."""
        self._stop_requested = True
        if self._multihost:
            self._sync_intake()
        self.stopped = True

    # ------------------------------------------------------------------
    # One engine iteration (reference: llm_engine.rs:155-197)
    # ------------------------------------------------------------------
    def step(self) -> List[SequenceOutput]:
        """One pipelined engine iteration: dispatch the NEXT batch, then
        fetch + postprocess the PREVIOUS one (whose device work overlapped
        this host work). Returns outputs for sequences that finished (or
        failed) this step.

        Reference parity: llm_engine.rs:155-197, but asynchronous — the
        reference executes and waits inside each step."""
        t0 = time.monotonic()
        if self._multihost and self._intake_sync_due():
            self._sync_intake()
            if self.stopped:
                return []  # shutdown sentinel: a stopped engine schedules nothing
        self._steps_since_sync += 1
        outputs: List[SequenceOutput] = []
        if self._drained_outputs:
            outputs.extend(self._drained_outputs)
            self._drained_outputs = []
        if self._pending and not self.config.async_scheduling:
            while self._pending:
                self._drain_oldest(outputs)

        spec = False
        window = self.config.decode_window
        if self.config.speculative_num_tokens:
            # Eligibility reads only sampling params / batch size / model
            # config — never host token state — so check it BEFORE draining:
            # ineligible traffic (sampled requests, logprobs, big batches)
            # keeps the async pipeline; only a batch that will actually
            # dispatch a speculative window pays the synchronous drain
            # (the verify reads host token lists, so host state must be
            # authoritative).
            spec = self.model_runner.spec_eligible(self.scheduler.running)
            if spec:
                while self._pending:
                    self._drain_oldest(outputs)
                # Worst case every iteration accepts all k proposals plus
                # the bonus token: reserve KV for W*(k+1) appends.
                window *= self.config.speculative_num_tokens + 1
        seqs, is_prefill = self.scheduler.schedule(window, spec=spec)
        # Requests rejected during scheduling (prompt too long / can never
        # fit) surface as error outputs, not exceptions.
        while self.scheduler.failed:
            failed = self.scheduler.failed.popleft()
            outputs.append(failed.create_output(self._detokenize(failed)))

        if seqs:
            spec = spec and not is_prefill
            handle = self.model_runner.dispatch(
                seqs, is_prefill, prev=list(self._pending), spec=spec
            )
            for s in seqs:
                s.num_pending += handle.k
            self._pending.append(handle)
            depth = (
                0 if spec
                else self.config.pipeline_depth
                if self.config.async_scheduling else 0
            )
            while len(self._pending) > depth:
                self._drain_oldest(outputs)
        elif self._pending:
            # Nothing schedulable: make progress by fetching the oldest.
            self._drain_oldest(outputs)
        dt = time.monotonic() - t0
        self.perf.num_steps += 1
        self.perf.total_step_time_s += dt
        self.perf.last_step_time_s = dt
        return outputs

    def _drain_oldest(self, outputs: List[SequenceOutput]) -> None:
        handle = self._pending.pop(0)
        token_windows = self.model_runner.fetch(handle)
        # Logprobs ride the same dispatch; record pre-postprocess completion
        # counts so the per-token lists stay aligned with ACCEPTED tokens
        # (zombie windows and post-stop tokens are discarded below).
        lp_windows = self.model_runner.fetch_logprobs(handle)
        before = (
            [s.num_completion_tokens for s in handle.seqs]
            if lp_windows is not None else None
        )
        finished = self.scheduler.postprocess_window(
            handle.seqs, token_windows, handle.k, spec=handle.spec
        )
        if lp_windows is not None:
            chosen, top = lp_windows
            for i, seq in enumerate(handle.seqs):
                if seq.sampling_params.logprobs is None:
                    continue
                accepted = seq.num_completion_tokens - before[i]
                if accepted <= 0:
                    continue
                if seq.completion_logprobs is None:
                    seq.completion_logprobs = []
                    seq.completion_top_logprobs = []
                seq.completion_logprobs.extend(chosen[i][:accepted])
                n = seq.sampling_params.logprobs
                seq.completion_top_logprobs.extend(
                    row[:n] for row in top[i][:accepted]
                )
        # Truthful tokens/s numerator: only tokens actually appended to live
        # sequences (zombie windows / post-stop tokens excluded).
        self.perf.total_generated_tokens = self.scheduler.total_accepted_tokens
        # Stop STRINGS are a text-level condition the token-level stop
        # machinery cannot see: check the decoded completion of every
        # still-live sequence that declares them. Runs identically on every
        # host (deterministic tokenizer), so multi-host scheduling stays
        # coherent.
        for seq in handle.seqs:
            if (
                seq.status == SequenceStatus.RUNNING
                and seq.sampling_params.stop
                and seq.num_completion_tokens > 0
                # min_tokens delays stop-string checking (the first scan
                # after it is reached covers the whole backlog — the tail
                # below starts at stop_checked_tokens).
                and seq.num_completion_tokens >= seq.sampling_params.min_tokens
            ):
                stops = seq.sampling_params.stop
                # O(window) per window, not O(completion): decode only the
                # new tokens plus an overlap covering the longest stop
                # string (a match must include a new token; each token
                # decodes to >= 1 char, +8 guards split-point UTF-8
                # artifacts). Full decode only on a hit, to place the cut
                # exactly in the full text — at most once per sequence.
                margin = max(len(s) for s in stops) + 8
                start_tok = max(0, min(seq.stop_checked_tokens, seq.num_completion_tokens) - margin)
                tail = self.tokenizer.decode(seq.completion_token_ids[start_tok:])
                seq.stop_checked_tokens = seq.num_completion_tokens
                if any(s in tail for s in stops):
                    text = self._detokenize(seq)
                    cut = min(
                        (p for p in (text.find(s) for s in stops) if p >= 0),
                        default=-1,
                    )
                    if cut >= 0:
                        seq.stop_text_end = cut
                        self.scheduler.finish_stopped(seq)
                        finished.append(seq)
        for seq in finished:
            outputs.append(seq.create_output(self._detokenize(seq)))

    def is_finished(self) -> bool:
        """True when no request is queued, running, or in flight."""
        return self.scheduler.is_finished() and not self._pending

    def has_unfinished(self) -> bool:
        return not self.is_finished()

    def _detokenize(self, seq: Sequence) -> str:
        text = self.tokenizer.decode(seq.completion_token_ids)
        if seq.stop_text_end is not None:
            text = text[: seq.stop_text_end]
        return text

    # ------------------------------------------------------------------
    # Batch API (reference: llm_engine.rs:71-98, 131-152)
    # ------------------------------------------------------------------
    def generate(
        self, prompts: List[str], params=None
    ) -> List[SequenceOutput]:
        """`params` is a single SamplingParams applied to every prompt, or a
        list with one entry per prompt (vLLM-style per-request params)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        if isinstance(params, (list, tuple)):
            if len(params) != len(prompts):
                raise ValueError(
                    f"got {len(params)} sampling params for {len(prompts)} prompts"
                )
            per_prompt = list(params)
        else:
            per_prompt = [params] * len(prompts)
        # Via add_request so multi-host intake buffering applies uniformly.
        seqs = [self.add_request(p, sp) for p, sp in zip(prompts, per_prompt)]
        self.is_running = True
        try:
            collected: Dict[int, SequenceOutput] = {}
            # Multi-host: the requests sit in the rank-0 intake buffer until
            # the first step's sync, so check it alongside engine state.
            while self._intake_requests or not self.is_finished():
                for out in self.step():
                    collected[out.seq_id] = out
            # Preserve request order.
            return [collected[s.seq_id] for s in seqs]
        finally:
            self.is_running = False

    # ------------------------------------------------------------------
    # Streaming API (reference: llm_engine.rs:101-128, 233-301)
    # ------------------------------------------------------------------
    def stream_delta(self, seq, emitted: int, prev_text: str, done: bool):
        """Incremental-detokenization step shared by generate_stream and
        the HTTP server: decode the first `emitted` completion tokens,
        truncate at a stop-string match, hold back a trailing replacement
        char (usually an incomplete UTF-8/merge sequence the next token
        rewrites) unless done, and diff against the previously emitted
        text. Returns (stable_text, delta)."""
        full = self.tokenizer.decode(seq.completion_token_ids[:emitted])
        if seq.stop_text_end is not None:
            # Stop-string finish: never stream past the match.
            full = full[: seq.stop_text_end]
        stable = full
        while not done and stable.endswith("\ufffd"):
            stable = stable[:-1]
        if not done and seq.stop_text_end is None and seq.sampling_params.stop:
            # Hold back any trailing text that could be the start of a stop
            # string: a match completing in a later decode window truncates
            # the completion, and text already emitted cannot be un-emitted.
            hold = 0
            for s in seq.sampling_params.stop:
                for k in range(min(len(s), len(stable)), 0, -1):
                    if stable.endswith(s[:k]):
                        hold = max(hold, k)
                        break
            if hold:
                stable = stable[:-hold]
        if stable.startswith(prev_text):
            return stable, stable[len(prev_text):]
        if prev_text.startswith(stable):
            # Regression (a stop match truncated below already-emitted text,
            # possible for pre-holdback streams): emit nothing rather than
            # duplicating the whole completion.
            return prev_text, ""
        return stable, stable


    def delta_pump(self, seq) -> "StreamPump":
        """The ONE streaming core (VERDICT r3 #10): per-request incremental
        delta state consumed by BOTH generate_stream and the HTTP server,
        so stop-string holdback, UTF-8 holdback, and logprob deltas cannot
        drift between the two paths."""
        return StreamPump(self, seq)

    async def generate_stream(
        self, prompt: str, params: Optional[SamplingParams] = None
    ) -> AsyncGenerator[SequenceOutput, None]:
        """Yields an incremental SequenceOutput after every new token of this
        request; `text` carries the delta since the last yield. Cancellation
        (generator close) aborts the request and frees its blocks."""
        seq = self.add_request(prompt, params)
        pump = self.delta_pump(seq)
        self.is_running = True
        try:
            # Loop until finished AND fully emitted: another concurrent
            # driver (a second stream, a generate() batch) may finish this
            # sequence between our yields — the remaining tokens must still
            # be flushed.
            while not pump.finished:
                if seq.status not in (SequenceStatus.FINISHED, SequenceStatus.ERROR):
                    self.step()
                # A decode window appends several tokens at once; emit one
                # incremental output per new token.
                for d in pump.drain():
                    if d.finish_reason is not None and d.text == "":
                        continue  # terminal marker; outputs carry status
                    out = seq.create_output(d.text)
                    out.token_ids = out.token_ids[: seq.num_prompt_tokens + d.emitted]
                    out.completion_token_ids = out.completion_token_ids[: d.emitted]
                    out.num_completion_tokens = d.emitted
                    yield out
                await asyncio.sleep(0)
        except GeneratorExit:
            self.abort_request(seq.seq_id)
            raise
        finally:
            self.is_running = self.has_unfinished()

    def abort_request(self, seq_id: int) -> bool:
        """Cancel an in-flight request by id: removes it from the queues,
        frees its KV blocks, and marks it ERROR/cancelled. In-flight device
        windows containing it become zombies and are discarded at fetch.
        Returns True if a live request was found.

        Multi-host: the abort is buffered on rank 0 and applied on every
        host at the next intake sync (so the replicated schedulers stay
        bit-identical)."""
        if self._multihost:
            import jax

            if jax.process_index() != 0:
                raise RuntimeError(
                    "multi-host engine: aborts must enter via the rank-0 frontend"
                )
            self._intake_aborts.append(seq_id)
            return True
        return self._abort_by_id(seq_id)

    def _abort_by_id(self, seq_id: int) -> bool:
        for q in (self.scheduler.running, self.scheduler.waiting):
            for seq in list(q):
                if seq.seq_id == seq_id:
                    self._abort(seq)
                    return True
        return False

    def _abort(self, seq: Sequence) -> None:
        if seq.status in (SequenceStatus.FINISHED, SequenceStatus.ERROR):
            return
        try:
            self.scheduler.running.remove(seq)
        except ValueError:
            pass
        try:
            self.scheduler.waiting.remove(seq)
        except ValueError:
            pass
        self.scheduler.block_manager.deallocate(seq)
        seq.status = SequenceStatus.ERROR
        seq.finish_reason = "cancelled"

    # ------------------------------------------------------------------
    # Introspection (reference: llm_engine.rs:312-416)
    # ------------------------------------------------------------------
    def get_stats(self) -> EngineStats:
        sch = self.scheduler.get_stats()
        bm = sch.block_manager
        return EngineStats(
            scheduler=sch,
            memory=MemoryStats(
                total_blocks=bm.total_blocks,
                used_blocks=bm.used_blocks,
                free_blocks=bm.free_blocks,
                utilization=bm.utilization,
                cache_efficiency=bm.cache_efficiency,
            ),
            is_running=self.is_running,
            num_compilations=self.model_runner.num_compilations,
            perf=self.perf,
        )

    def profile(self, log_dir: str):
        """Context manager: capture a jax.profiler device trace of the
        enclosed steps (SURVEY §5 tracing/profiling; view with
        tensorboard-plugin-profile or parse trace.json.gz)."""
        import jax

        return jax.profiler.trace(log_dir)

    def health_check(self) -> HealthStatus:
        sch = self.scheduler.get_stats()
        util = sch.memory_pressure
        healthy = util < 0.95
        return HealthStatus(
            healthy=healthy,
            memory_utilization=util,
            num_running=sch.num_running,
            num_waiting=sch.num_waiting,
            reason="" if healthy else f"KV memory utilization {util:.2f} >= 0.95",
        )

    # ------------------------------------------------------------------
    # Engine state snapshot / resume (reference aspirational surface:
    # tests/integration/model_io_test.rs:29 — engine state save)
    # ------------------------------------------------------------------
    def save_state(self, path: str) -> int:
        """Snapshot every live request (prompt + tokens generated so far +
        sampling params) plus the engine config to a JSON file. Device
        state (KV caches) is NOT saved: `load_state` recovers it via
        re-prefill through the prefix cache — the same state machine used
        for preemption. Returns the number of requests saved.

        Reproducibility across restart: seeded requests resume exactly —
        their sampling key is fold_in(PRNGKey(seed), num_completion_tokens)
        and the completion length is snapshotted. UNSEEDED requests draw
        from the new engine's global key stream after restart, so their
        continuation differs from what the old engine would have produced
        (same contract as preemption-free serving restarts in vLLM); pass
        `seed` in SamplingParams when bit-exact resume matters."""
        import dataclasses
        import json

        while self._pending:  # confirm all in-flight tokens first
            self._drain_oldest(self._drained_outputs)
        requests = []
        for q in (self.scheduler.waiting, self.scheduler.running):
            for s in q:
                requests.append({
                    "token_ids": list(s.token_ids),
                    "num_prompt_tokens": s.num_prompt_tokens,
                    "sampling_params": dataclasses.asdict(s.sampling_params),
                })
        cfg = dataclasses.asdict(self.config)
        cfg.pop("eos_token_id", None)  # re-derived from the tokenizer
        with open(path, "w") as f:
            json.dump({"config": cfg, "requests": requests}, f)
        return len(requests)

    @classmethod
    def load_state(cls, path: str, **config_overrides) -> "LLMEngine":
        """Rebuild an engine from a `save_state` snapshot and re-enqueue
        its requests; generation continues where it stopped (KV recovered
        by re-prefill, shared prefixes via the prefix cache)."""
        import json

        with open(path) as f:
            state = json.load(f)
        cfg_dict = dict(state["config"], **config_overrides)
        engine = cls(Config(**cfg_dict))
        for r in state["requests"]:
            seq = Sequence(
                r["token_ids"],
                SamplingParams(**r["sampling_params"]),
                block_size=engine.config.kvcache_block_size,
            )
            seq.num_prompt_tokens = r["num_prompt_tokens"]
            engine.scheduler.add_sequence(seq)
        return engine

    def shutdown(self) -> None:
        """Drain the pipeline, then preempt everything; in-flight requests
        can be resumed by a new engine via re-prefill
        (reference: llm_engine.rs:345-357)."""
        while self._pending:
            self._drain_oldest(self._drained_outputs)
        self.scheduler.preempt_all()
        self.is_running = False


class LLMEngineBuilder:
    """Reference: llm_engine.rs:419-489."""

    def __init__(self):
        self._config = Config()

    def model_path(self, p: str) -> "LLMEngineBuilder":
        self._config = self._config.with_model_path(p)
        return self

    def max_num_seqs(self, n: int) -> "LLMEngineBuilder":
        self._config = self._config.with_max_num_seqs(n)
        return self

    def max_model_len(self, n: int) -> "LLMEngineBuilder":
        self._config = self._config.with_max_model_len(n)
        return self

    def device(self, d: str) -> "LLMEngineBuilder":
        self._config = self._config.with_device(d)
        return self

    def dtype(self, d: str) -> "LLMEngineBuilder":
        self._config = self._config.with_dtype(d)
        return self

    def kvcache_block_size(self, n: int) -> "LLMEngineBuilder":
        self._config = self._config.with_kvcache_block_size(n)
        return self

    def num_kvcache_blocks(self, n: int) -> "LLMEngineBuilder":
        self._config = self._config.with_num_kvcache_blocks(n)
        return self

    def tensor_parallel_size(self, n: int) -> "LLMEngineBuilder":
        self._config = self._config.with_tensor_parallel_size(n)
        return self

    def quantization(self, q: Optional[str]) -> "LLMEngineBuilder":
        self._config = self._config.with_quantization(q)
        return self

    def build(self) -> LLMEngine:
        return LLMEngine(self._config)


def create_engine(model_path: str) -> LLMEngine:
    """Reference: src/lib.rs:105-108."""
    return LLMEngine(Config(model_path=model_path))


def create_engine_with_config(config: Config) -> LLMEngine:
    """Reference: src/lib.rs:110-112."""
    return LLMEngine(config)
