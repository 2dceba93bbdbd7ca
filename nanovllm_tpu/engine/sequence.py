"""Request representation: `Sequence` and its lifecycle state machine.

Capability parity with the reference (src/engine/sequence.rs:16-236):
status enum, global id counter, token bookkeeping, block math, stop logic,
preemption reset, and output assembly. Differences: `block_size` is always
threaded from the engine config (the reference hardcodes 256,
sequence.rs:99), and `should_stop` also enforces `max_model_len` so a
sequence can never outgrow the model's position range.
"""

from __future__ import annotations

import enum
import itertools
import time
from dataclasses import dataclass
from typing import List, Optional

from nanovllm_tpu.engine.sampling_params import SamplingParams


class SequenceStatus(enum.Enum):
    """Reference: src/engine/sequence.rs:16-27."""

    WAITING = "waiting"
    RUNNING = "running"
    FINISHED = "finished"
    PREEMPTED = "preempted"
    ERROR = "error"


@dataclass
class SequenceOutput:
    """Final (or streamed incremental) result of one request
    (reference: src/engine/sequence.rs:31-46)."""

    seq_id: int
    text: str
    token_ids: List[int]
    completion_token_ids: List[int]
    num_prompt_tokens: int
    num_completion_tokens: int
    status: SequenceStatus
    finish_reason: Optional[str] = None
    # When SamplingParams.logprobs was requested: log p(token) under the
    # model's raw distribution, one per completion token; top_logprobs is
    # a parallel list of [(token_id, logprob), ...] rows (top-N).
    logprobs: Optional[List[float]] = None
    top_logprobs: Optional[list] = None


_seq_counter = itertools.count()


def _next_seq_id() -> int:
    return next(_seq_counter)


class Sequence:
    """One in-flight request (reference: src/engine/sequence.rs:50-236)."""

    def __init__(
        self,
        token_ids: List[int],
        sampling_params: Optional[SamplingParams] = None,
        block_size: int = 64,
    ):
        if not token_ids:
            raise ValueError("prompt token_ids must be non-empty")
        self.seq_id: int = _next_seq_id()
        self.status: SequenceStatus = SequenceStatus.WAITING
        self.token_ids: List[int] = list(token_ids)
        self.num_prompt_tokens: int = len(token_ids)
        # Tokens whose KV is already present via prefix-cache hits; set by
        # BlockManager.allocate, cleared on preemption.
        self.num_cached_tokens: int = 0
        self.block_table: List[int] = []
        # Block ids that were prefix-cache HITS in the last allocate() —
        # their KV is real, so an allocation rollback must NOT wipe their
        # cache identity (only fresh blocks hold uncomputed KV).
        self.prefix_hit_block_ids: set = set()
        self.sampling_params: SamplingParams = sampling_params or SamplingParams()
        self.block_size: int = block_size
        # Tokens dispatched to the device but not yet fetched/confirmed
        # (async pipelined scheduling): block math must reserve through
        # them, and the sequence is ineligible for (re-)prefill until they
        # drain. No reference counterpart — the reference engine is fully
        # synchronous (llm_engine.rs:155-197).
        self.num_pending: int = 0
        # Chunked prefill: prompt tokens whose KV is committed so far, and
        # the end position of the chunk currently dispatched (None when not
        # mid-prefill). A sequence is mid-prefill while it sits in the
        # waiting queue with an allocated block table.
        self.num_processed_tokens: int = 0
        self.prefill_chunk_end = None
        self.num_preemptions: int = 0
        self.arrival_time: float = time.monotonic()
        # First time the scheduler admitted this request (WAITING->RUNNING):
        # TTFT measured from here excludes queueing delay (post-admission
        # TTFT); from arrival_time it includes it. Both are reported.
        self.admission_time: Optional[float] = None
        self.first_token_time: Optional[float] = None
        self.finish_reason: Optional[str] = None
        # When finished by a stop STRING: char offset into the completion
        # text where the output truncates (the match start — the stop
        # string itself is excluded, OpenAI-style).
        self.stop_text_end: Optional[int] = None
        # Completion tokens already scanned for stop strings (the engine's
        # per-window check decodes only the tail past here + an overlap).
        self.stop_checked_tokens: int = 0
        # Per-completion-token logprobs (attached by the engine when
        # SamplingParams.logprobs is set; truncated like the tokens).
        self.completion_logprobs: Optional[list] = None
        self.completion_top_logprobs: Optional[list] = None

    # ------------------------------------------------------------------
    # Token bookkeeping
    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.token_ids)

    @property
    def last_token(self) -> int:
        return self.token_ids[-1]

    @property
    def num_completion_tokens(self) -> int:
        return len(self.token_ids) - self.num_prompt_tokens

    @property
    def completion_token_ids(self) -> List[int]:
        return self.token_ids[self.num_prompt_tokens:]

    def append_token(self, token_id: int) -> None:
        """Reference: sequence.rs:150-154."""
        self.token_ids.append(token_id)
        if self.first_token_time is None:
            self.first_token_time = time.monotonic()

    def total_len(self) -> int:
        """Confirmed + speculative (dispatched-not-yet-fetched) length —
        the horizon KV block reservations must cover."""
        return len(self.token_ids) + self.num_pending

    # ------------------------------------------------------------------
    # Block math (reference: sequence.rs:157-186)
    # ------------------------------------------------------------------
    def num_blocks(self) -> int:
        return (len(self.token_ids) + self.block_size - 1) // self.block_size

    def num_cached_blocks(self) -> int:
        return self.num_cached_tokens // self.block_size

    def last_block_num_tokens(self) -> int:
        return len(self.token_ids) - (self.num_blocks() - 1) * self.block_size

    def get_block_tokens(self, idx: int) -> List[int]:
        if not (0 <= idx < self.num_blocks()):
            raise IndexError(f"block index {idx} out of range (0..{self.num_blocks()})")
        return self.token_ids[idx * self.block_size : (idx + 1) * self.block_size]

    # ------------------------------------------------------------------
    # Stop logic (reference: sequence.rs:189-205)
    # ------------------------------------------------------------------
    def should_stop(self, eos_token_id: Optional[int], max_model_len: Optional[int] = None) -> bool:
        if self.num_completion_tokens >= self.sampling_params.max_tokens:
            self.finish_reason = "length"
            return True
        if (
            eos_token_id is not None
            and self.num_completion_tokens > 0
            and self.last_token == eos_token_id
            and not self.sampling_params.ignore_eos
            # min_tokens suppresses EOS (not length caps) until reached.
            and self.num_completion_tokens >= self.sampling_params.min_tokens
        ):
            self.finish_reason = "stop"
            return True
        if (
            self.sampling_params.stop_token_ids
            and self.num_completion_tokens > 0
            and self.last_token in self.sampling_params.stop_token_ids
            and self.num_completion_tokens >= self.sampling_params.min_tokens
        ):
            # Request-level extra EOS set (NOT gated by ignore_eos — the
            # caller asked for these ids explicitly).
            self.finish_reason = "stop"
            return True
        if max_model_len is not None and len(self.token_ids) >= max_model_len:
            self.finish_reason = "length"
            return True
        return False

    # ------------------------------------------------------------------
    # Lifecycle (reference: sequence.rs:208-236)
    # ------------------------------------------------------------------
    def finish(self) -> None:
        self.status = SequenceStatus.FINISHED

    def preempt(self) -> None:
        """Drop device-side state; KV is rebuilt via re-prefill + prefix
        cache on the next schedule (reference: sequence.rs:213-218)."""
        self.status = SequenceStatus.PREEMPTED
        self.block_table = []
        self.num_cached_tokens = 0
        self.num_processed_tokens = 0
        self.prefill_chunk_end = None
        self.num_preemptions += 1

    def create_output(self, text: str = "") -> SequenceOutput:
        return SequenceOutput(
            seq_id=self.seq_id,
            text=text,
            token_ids=list(self.token_ids),
            completion_token_ids=self.completion_token_ids,
            num_prompt_tokens=self.num_prompt_tokens,
            num_completion_tokens=self.num_completion_tokens,
            status=self.status,
            finish_reason=self.finish_reason,
            logprobs=(
                list(self.completion_logprobs[: self.num_completion_tokens])
                if self.completion_logprobs is not None else None
            ),
            top_logprobs=(
                list(self.completion_top_logprobs[: self.num_completion_tokens])
                if self.completion_top_logprobs is not None else None
            ),
        )

    def __repr__(self) -> str:
        return (
            f"Sequence(id={self.seq_id}, status={self.status.value}, "
            f"len={len(self.token_ids)}, prompt={self.num_prompt_tokens}, "
            f"cached={self.num_cached_tokens}, blocks={len(self.block_table)})"
        )
