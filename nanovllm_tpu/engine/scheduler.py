"""Continuous-batching scheduler: prefill-first admission, decode batching,
and preemption under KV-memory pressure.

Capability parity with the reference Scheduler
(src/engine/scheduler.rs:14-364): FIFO waiting/running queues over an owned
BlockManager, homogeneous batches (all-prefill or all-decode), prefix-cached
tokens exempt from the prefill token budget, back-of-queue preemption with
re-prefill recovery, postprocess with stop detection, and rolling stats.

Fixes over the reference (SURVEY.md §2.14.8): `schedule()` can legitimately
return an empty batch ("nothing to do right now") instead of erroring when
waiting sequences exist but cannot fit; and a single oversized prompt is
still admitted alone (capped by max_model_len) rather than livelocking on
the token budget.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass
from typing import Deque, List, Optional, Tuple

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.block_manager import BlockManager, BlockManagerStats
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus


@dataclass
class SchedulerStats:
    """Reference: scheduler.rs:37-66, 276-364."""

    num_waiting: int = 0
    num_running: int = 0
    num_finished: int = 0
    num_preemptions: int = 0
    num_prefill_batches: int = 0
    num_decode_batches: int = 0
    total_prefill_tokens: int = 0
    total_decode_tokens: int = 0
    avg_prefill_batch_size: float = 0.0
    avg_decode_batch_size: float = 0.0
    block_manager: Optional[BlockManagerStats] = None

    @property
    def preemption_rate(self) -> float:
        total = self.num_prefill_batches + self.num_decode_batches
        return self.num_preemptions / total if total else 0.0

    @property
    def completion_rate(self) -> float:
        total = self.num_finished + self.num_waiting + self.num_running
        return self.num_finished / total if total else 0.0

    @property
    def memory_pressure(self) -> float:
        return self.block_manager.utilization if self.block_manager else 0.0

    def is_under_pressure(self) -> bool:
        """Reference: scheduler.rs memory_pressure > 0.9."""
        return self.memory_pressure > 0.9


class Scheduler:
    def __init__(self, config: Config):
        self.config = config
        self.waiting: Deque[Sequence] = deque()
        self.running: Deque[Sequence] = deque()
        # Sequences rejected as impossible (e.g. prompt > max_model_len);
        # the engine drains these into error outputs.
        self.failed: Deque[Sequence] = deque()
        from nanovllm_tpu.native import create_block_manager

        self.block_manager = create_block_manager(
            num_blocks=config.num_kvcache_blocks or 1000,
            block_size=config.kvcache_block_size,
            enable_prefix_caching=config.enable_prefix_caching,
            backend=config.block_manager_backend,
        )
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.eos_token_id = config.eos_token_id
        self.max_model_len = config.max_model_len
        # Sliding-window rolling-buffer KV eviction: set by the engine from
        # the MODEL config (the scheduler only sees the engine Config).
        # None = full attention, keep everything.
        self.sliding_window = None
        self.num_window_evicted = 0
        # Stats accumulators.
        self.num_finished = 0
        self.num_preemptions = 0
        self.num_prefill_batches = 0
        self.num_decode_batches = 0
        self.total_prefill_tokens = 0
        self.total_decode_tokens = 0
        # Tokens actually appended to live sequences in postprocess (zombie
        # windows and tokens discarded past stop conditions excluded) — the
        # truthful numerator for tokens/s.
        self.total_accepted_tokens = 0

    # ------------------------------------------------------------------
    # Admission (reference: scheduler.rs:93-100)
    # ------------------------------------------------------------------
    def add_sequence(self, seq: Sequence) -> None:
        seq.sampling_params.validate()
        seq.status = SequenceStatus.WAITING
        self.waiting.append(seq)

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    def has_unfinished(self) -> bool:
        return not self.is_finished()

    # ------------------------------------------------------------------
    # Main entry: prefill-first (reference: scheduler.rs:103-116)
    # ------------------------------------------------------------------
    def schedule(
        self, decode_window: int = 1, spec: bool = False
    ) -> Tuple[List[Sequence], bool]:
        """Returns (batch, is_prefill). Empty batch means nothing can run.

        `decode_window`: number of decode iterations the runner will execute
        per dispatch; KV blocks for the whole window are reserved up front
        (see BlockManager window protocol).

        `spec`: `decode_window` is a speculative window's WORST-CASE
        W*(k+1) reservation; decode-token stats are deferred to
        postprocess_window(spec=True), which counts emitted tokens."""
        prefill = self._schedule_prefill()
        if prefill:
            self.num_prefill_batches += 1
            self.total_prefill_tokens += sum(
                (s.prefill_chunk_end or len(s))
                - max(s.num_cached_tokens, s.num_processed_tokens)
                for s in prefill
            )
            return prefill, True
        decode = self._schedule_decode(decode_window)
        if decode:
            self.num_decode_batches += 1
            if not spec:
                self.total_decode_tokens += len(decode) * decode_window
            return decode, False
        if self.waiting:
            # Decode preempted everything (or nothing was running): the freed
            # blocks may let a waiting/preempted seq re-prefill right now, and
            # impossible requests get failed here instead of spinning.
            prefill = self._schedule_prefill()
            if prefill:
                self.num_prefill_batches += 1
                self.total_prefill_tokens += sum(
                    (s.prefill_chunk_end or len(s))
                    - max(s.num_cached_tokens, s.num_processed_tokens)
                    for s in prefill
                )
                return prefill, True
        return [], False

    # ------------------------------------------------------------------
    # Prefill admission (reference: scheduler.rs:119-168)
    # ------------------------------------------------------------------
    def _schedule_prefill(self) -> List[Sequence]:
        scheduled: List[Sequence] = []
        batched_tokens = 0
        while self.waiting:
            # scheduled seqs are already appended to self.running below.
            if len(self.running) >= self.max_num_seqs:
                break
            seq = self.waiting[0]
            if seq.num_pending > 0:
                # A preempted seq whose async window is still in flight:
                # re-prefilling now would fork position history. Wait for
                # the pending tokens to drain (next fetch).
                break
            if len(seq) > self.max_model_len or seq.num_blocks() > self.block_manager.num_blocks:
                # Impossible request (prompt too long, or its KV can never fit
                # in the entire block pool): fail it rather than livelock the
                # queue on preempt/re-prefill ping-pong.
                self.waiting.popleft()
                seq.status = SequenceStatus.ERROR
                seq.finish_reason = (
                    "prompt_too_long" if len(seq) > self.max_model_len else "insufficient_kv_blocks"
                )
                self.failed.append(seq)
                self.num_finished += 1
                continue
            fresh_alloc = False
            if not seq.block_table:
                if not self.block_manager.can_allocate(seq):
                    break
                self.block_manager.allocate(seq)
                fresh_alloc = True
            processed = max(seq.num_cached_tokens, seq.num_processed_tokens)
            new_tokens = len(seq) - processed
            budget_left = self.max_num_batched_tokens - batched_tokens
            if new_tokens > budget_left:
                bs = self.block_manager.block_size
                chunk = (budget_left // bs) * bs
                if (
                    self.config.enable_chunked_prefill
                    and chunk >= bs
                ):
                    # Chunked prefill: process [processed, processed+chunk)
                    # this step; the sequence stays at the FRONT of waiting
                    # (num_pending blocks re-scheduling until the chunk
                    # lands). Block-aligned chunks keep the whole-block
                    # prefill commit and prefix-cache hashing exact.
                    chunk_end = processed + chunk
                    seq.prefill_chunk_end = chunk_end
                    if fresh_alloc:
                        # Allocate registered identities for ALL fresh full
                        # blocks optimistically (safe when prefill commits
                        # in the same dispatch). Blocks beyond this chunk
                        # stay uncommitted for steps — another request
                        # could cache-hit garbage KV. Drop them now;
                        # postprocess re-registers as chunks commit.
                        self.block_manager.defer_identities_beyond(
                            seq, chunk_end
                        )
                    if seq.admission_time is None:
                        import time as _time

                        seq.admission_time = _time.monotonic()
                    batched_tokens += chunk
                    scheduled.append(seq)
                elif not scheduled:
                    # Lone over-budget request that can't chunk (chunking
                    # off, or the whole budget is below one block): admit
                    # whole — one oversized dispatch beats a livelock.
                    self._admit(seq, scheduled)
                    batched_tokens += new_tokens
                elif fresh_alloc:
                    # Doesn't fit this batch; undo and stop (it stays first
                    # in line). undo_allocate (not deallocate): the fresh
                    # blocks' KV was never computed, so their hash identity
                    # must die with them or the next allocate would
                    # cache-hit poison.
                    self.block_manager.undo_allocate(seq)
                break  # budget exhausted either way
            self._admit(seq, scheduled)
            batched_tokens += new_tokens
        return scheduled

    def _admit(self, seq: Sequence, scheduled: List[Sequence]) -> None:
        """Move the queue-front sequence into running (whole prompt or the
        FINAL chunk of a chunked prefill is being dispatched)."""
        self.waiting.popleft()
        seq.prefill_chunk_end = None
        seq.status = SequenceStatus.RUNNING
        if seq.admission_time is None:
            import time as _time

            seq.admission_time = _time.monotonic()
        self.running.append(seq)
        scheduled.append(seq)

    # ------------------------------------------------------------------
    # Decode + preemption (reference: scheduler.rs:171-231)
    # ------------------------------------------------------------------
    def _schedule_decode(self, window: int = 1) -> List[Sequence]:
        scheduled: List[Sequence] = []
        done: List[Sequence] = []
        pending = self.running
        self.running = deque()
        while pending:
            seq = pending.popleft()
            if self._guaranteed_finished(seq):
                # Already certain to stop within its in-flight tokens
                # (length caps are host-predictable): scheduling more would
                # burn whole zombie windows. The pending fetch finishes it.
                done.append(seq)
                continue
            preempted_self = False
            while not self.block_manager.can_append(seq, window):
                if pending:
                    victim = pending.pop()  # youngest first (back of queue)
                elif scheduled:
                    victim = scheduled.pop()
                else:
                    victim = seq
                self._preempt(victim)
                if victim is seq:
                    preempted_self = True
                    break
            if preempted_self:
                continue
            self.block_manager.may_append(seq, window)
            scheduled.append(seq)
        self.running = deque(scheduled + done)
        return scheduled

    def _guaranteed_finished(self, seq: Sequence) -> bool:
        """True when the tokens already in flight are certain to trigger a
        length stop (max_tokens or max_model_len) at fetch time."""
        if seq.num_pending <= 0:
            return False
        if seq.num_completion_tokens + seq.num_pending >= seq.sampling_params.max_tokens:
            return True
        return seq.total_len() >= self.max_model_len

    def _preempt(self, seq: Sequence) -> None:
        """Victim's blocks freed; it re-runs from the front of waiting,
        recovering KV via re-prefill + prefix cache
        (reference: scheduler.rs:226-231)."""
        self.block_manager.deallocate(seq)
        seq.preempt()
        self.waiting.appendleft(seq)
        self.num_preemptions += 1

    # ------------------------------------------------------------------
    # Postprocess (reference: scheduler.rs:234-274)
    # ------------------------------------------------------------------
    def postprocess(self, seqs: List[Sequence], token_ids: List[int]) -> List[Sequence]:
        """Append one sampled token per sequence, finish stopped ones
        (freeing their blocks). Returns the sequences that finished."""
        return self.postprocess_window(seqs, [[t] for t in token_ids])

    def postprocess_window(
        self,
        seqs: List[Sequence],
        token_windows: List[List[int]],
        dispatched: Optional[int] = None,
        spec: bool = False,
    ) -> List[Sequence]:
        """Append up to K sampled tokens per sequence (one decode window).
        Tokens generated on-device past a stop condition are discarded; full
        blocks grown during the window become prefix-cache reusable.

        Async-pipeline semantics: `dispatched` is the speculative token
        count reserved at dispatch (defaults to each window's length).
        Sequences that finished/errored while this window was in flight are
        zombies — their tokens are discarded. Sequences PREEMPTED while in
        flight keep their tokens (they are valid continuations computed
        before the blocks were freed) and re-prefill with them included.

        `spec`: speculative windows accrue decode-token stats here, from
        the tokens the window actually emitted (schedule() skipped its
        worst-case W*(k+1) reservation for them — avg_decode_batch_size
        stays honest under speculation).
        """
        finished: List[Sequence] = []
        if spec:
            self.total_decode_tokens += sum(len(w) for w in token_windows)
        for seq, window_tokens in zip(seqs, token_windows):
            seq.num_pending = max(
                0, seq.num_pending - (dispatched if dispatched is not None else len(window_tokens))
            )
            if seq.status in (SequenceStatus.FINISHED, SequenceStatus.ERROR):
                continue  # zombie window of an already-completed request
            if seq.prefill_chunk_end is not None:
                # Chunked prefill landed: KV for [processed, chunk_end) is
                # committed; the dispatch's sampled token predicts a token
                # that ALREADY EXISTS in the prompt — discard it. Register
                # the newly committed full blocks' prefix-cache identities
                # (deferred at allocate).
                seq.num_processed_tokens = seq.prefill_chunk_end
                seq.prefill_chunk_end = None
                self.block_manager.register_decode_progress(
                    seq, n_tokens=seq.num_processed_tokens + 1
                )
                continue
            stopped = False
            for token_id in window_tokens:
                seq.append_token(int(token_id))
                self.total_accepted_tokens += 1
                if seq.should_stop(self.eos_token_id, self.max_model_len):
                    stopped = True
                    break
            if stopped:
                seq.finish()
                self._release_finished(seq)
                finished.append(seq)
            elif seq.status == SequenceStatus.RUNNING:
                self.block_manager.register_decode_progress(seq)
                if self.sliding_window is not None:
                    # Rolling buffer: whole blocks below every future
                    # query's window edge (queries sit at >= len(seq)-1,
                    # in-flight ones higher) can never be attended again.
                    keep = len(seq) - self.sliding_window
                    if keep >= self.block_manager.block_size:
                        self.num_window_evicted += (
                            self.block_manager.release_below_window(seq, keep)
                        )
        return finished

    def finish_stopped(self, seq: Sequence, reason: str = "stop") -> None:
        """Finish a live sequence on an engine-level condition the
        token-level stop machinery cannot see (stop STRINGS matched against
        decoded text). Same bookkeeping as the in-window stop path:
        deallocate, dequeue, count. In-flight windows containing the
        sequence become zombies and are discarded at fetch."""
        if seq.status in (SequenceStatus.FINISHED, SequenceStatus.ERROR):
            return
        seq.finish()
        seq.finish_reason = reason
        self._release_finished(seq)

    def _release_finished(self, seq: Sequence) -> None:
        """Shared finish bookkeeping: free blocks, dequeue, count."""
        self.block_manager.deallocate(seq)
        for q in (self.running, self.waiting):
            try:
                q.remove(seq)
            except ValueError:
                pass
        self.num_finished += 1

    # ------------------------------------------------------------------
    # Shutdown support (reference: scheduler.rs preempt_all via llm_engine.rs:345-357)
    # ------------------------------------------------------------------
    def preempt_all(self) -> None:
        while self.running:
            self._preempt(self.running.pop())
        # Mid-prefill sequences sit in WAITING with allocated blocks
        # (chunked prefill); release those too so shutdown/drain leaves
        # the pool empty. They re-prefill from scratch when resumed.
        for seq in self.waiting:
            if seq.block_table:
                self.block_manager.deallocate(seq)
                seq.num_processed_tokens = 0
                seq.prefill_chunk_end = None

    # ------------------------------------------------------------------
    # Stats (reference: scheduler.rs:276-364)
    # ------------------------------------------------------------------
    def get_stats(self) -> SchedulerStats:
        return SchedulerStats(
            num_waiting=len(self.waiting),
            num_running=len(self.running),
            num_finished=self.num_finished,
            num_preemptions=self.num_preemptions,
            num_prefill_batches=self.num_prefill_batches,
            num_decode_batches=self.num_decode_batches,
            total_prefill_tokens=self.total_prefill_tokens,
            total_decode_tokens=self.total_decode_tokens,
            avg_prefill_batch_size=(
                self.total_prefill_tokens / self.num_prefill_batches
                if self.num_prefill_batches
                else 0.0
            ),
            avg_decode_batch_size=(
                self.total_decode_tokens / self.num_decode_batches
                if self.num_decode_batches
                else 0.0
            ),
            block_manager=self.block_manager.get_stats(),
        )
