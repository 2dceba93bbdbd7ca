"""Per-request sampling parameters.

Capability parity with the reference engine-level `SamplingParams`
(reference: src/engine/sampling_params.rs:10-119). Unlike the reference,
there is a single struct — the reference's second, layer-level struct
(src/layers/sampler.rs:258-318) is replaced by packed device arrays built in
`ops/sampling.py`. `repetition_penalty` is actually implemented here (the
reference declares but never applies it, src/layers/sampler.rs:269-271).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

# Mirrors ops.sampling.TOP_K_MAX (kept literal so this module stays
# importable without jax; tests assert the two agree).
_TOP_K_MAX = 256


@dataclass(frozen=True)
class SamplingParams:
    temperature: float = 1.0
    max_tokens: int = 64
    # Minimum completion tokens before ANY stop condition (EOS token or
    # stop strings) may finish the request (vLLM-style min_tokens). Length
    # caps (max_tokens/max_model_len) still apply.
    min_tokens: int = 0
    ignore_eos: bool = False
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    repetition_penalty: Optional[float] = None
    # OpenAI-style penalties over GENERATED tokens (intended reference
    # surface per tests/unit/sampling_test.rs:60-84): logits[t] -=
    # frequency_penalty * count(t) + presence_penalty * [count(t) > 0].
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    # Per-request seed: the sampled sequence is reproducible across batch
    # compositions, decode windows, and pipeline depths (the Gumbel noise
    # derives from fold_in(PRNGKey(seed), tokens_generated_so_far)).
    seed: Optional[int] = None
    # OpenAI-style stop strings: generation finishes when the decoded
    # COMPLETION text contains any of them; the returned text is truncated
    # before the earliest match (the stop string itself is excluded).
    # Token ids may overshoot by up to one decode window — text is the
    # contract. Accepts a str or a sequence of str; stored as a tuple.
    stop: Optional[tuple] = None
    # vLLM-style stop token ids: generation finishes when any of these is
    # sampled — an extra EOS set with the same semantics (min_tokens
    # suppresses them too; the stopping token stays in token_ids).
    stop_token_ids: Optional[tuple] = None
    # OpenAI logit_bias: {token_id: bias} added to the raw logits before
    # any selection (greedy included); -100..100, -100 effectively bans a
    # token. Accepts a dict (string or int keys, OpenAI sends strings);
    # stored as a sorted tuple of (id, bias) pairs.
    logit_bias: Optional[tuple] = None
    # Logprobs: None = off; 0 = return the sampled token's logprob per
    # completion token; 1..8 = additionally the top-N (token_id, logprob)
    # rows. Computed from the model's raw distribution (log_softmax of the
    # unprocessed logits, OpenAI semantics), on device inside the decode
    # window.
    logprobs: Optional[int] = None

    def __post_init__(self):
        if self.stop is not None and not isinstance(self.stop, tuple):
            s = (self.stop,) if isinstance(self.stop, str) else tuple(self.stop)
            object.__setattr__(self, "stop", s)
        if self.stop_token_ids is not None and not isinstance(self.stop_token_ids, tuple):
            t = ((self.stop_token_ids,) if isinstance(self.stop_token_ids, int)
                 else tuple(self.stop_token_ids))
            object.__setattr__(self, "stop_token_ids", t)
        if self.logit_bias is not None and not (
            isinstance(self.logit_bias, tuple)
            and all(isinstance(e, tuple) for e in self.logit_bias)
        ):
            items = (self.logit_bias.items()
                     if isinstance(self.logit_bias, dict) else self.logit_bias)
            norm = tuple(sorted((int(k), float(v)) for k, v in items))
            object.__setattr__(self, "logit_bias", norm)

    # --- builders (reference: sampling_params.rs:43-84) ---
    def with_temperature(self, t: float) -> "SamplingParams":
        return replace(self, temperature=t)

    def with_max_tokens(self, n: int) -> "SamplingParams":
        return replace(self, max_tokens=n)

    def with_min_tokens(self, n: int) -> "SamplingParams":
        return replace(self, min_tokens=n)

    def with_ignore_eos(self, b: bool = True) -> "SamplingParams":
        return replace(self, ignore_eos=b)

    def with_top_p(self, p: float) -> "SamplingParams":
        return replace(self, top_p=p)

    def with_top_k(self, k: int) -> "SamplingParams":
        return replace(self, top_k=k)

    def with_repetition_penalty(self, p: float) -> "SamplingParams":
        return replace(self, repetition_penalty=p)

    def with_frequency_penalty(self, p: float) -> "SamplingParams":
        return replace(self, frequency_penalty=p)

    def with_presence_penalty(self, p: float) -> "SamplingParams":
        return replace(self, presence_penalty=p)

    def with_seed(self, s: int) -> "SamplingParams":
        return replace(self, seed=s)

    def with_stop(self, stop) -> "SamplingParams":
        return replace(self, stop=stop)

    def with_stop_token_ids(self, ids) -> "SamplingParams":
        return replace(self, stop_token_ids=ids)

    def with_logprobs(self, n: int) -> "SamplingParams":
        return replace(self, logprobs=n)

    def with_logit_bias(self, bias) -> "SamplingParams":
        return replace(self, logit_bias=bias)

    def is_greedy(self) -> bool:
        """Greedy iff temperature == 0 (reference: sampling_params.rs:86-88)."""
        return self.temperature == 0.0

    def validate(self) -> None:
        """Reference: sampling_params.rs:91-119."""
        if self.temperature < 0.0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if self.max_tokens <= 0:
            raise ValueError(f"max_tokens must be positive, got {self.max_tokens}")
        if not (0 <= self.min_tokens <= self.max_tokens):
            raise ValueError(
                f"min_tokens must be in [0, max_tokens], got {self.min_tokens}"
            )
        if self.top_p is not None and not (0.0 < self.top_p <= 1.0):
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k is not None and self.top_k <= 0:
            raise ValueError(f"top_k must be positive, got {self.top_k}")
        if self.top_k is not None and self.top_k > _TOP_K_MAX:
            # The device sampler bounds per-row k statically; reject rather
            # than silently clamp (the request would get different sampling
            # than asked for).
            raise ValueError(f"top_k must be <= {_TOP_K_MAX}, got {self.top_k}")
        if self.repetition_penalty is not None and self.repetition_penalty <= 0.0:
            raise ValueError(
                f"repetition_penalty must be positive, got {self.repetition_penalty}"
            )
        if not -2.0 <= self.frequency_penalty <= 2.0:
            raise ValueError(
                f"frequency_penalty must be in [-2, 2], got {self.frequency_penalty}"
            )
        if not -2.0 <= self.presence_penalty <= 2.0:
            raise ValueError(
                f"presence_penalty must be in [-2, 2], got {self.presence_penalty}"
            )
        if self.stop is not None:
            if len(self.stop) > 16:
                raise ValueError(f"at most 16 stop strings, got {len(self.stop)}")
            for s in self.stop:
                if not isinstance(s, str) or not s:
                    raise ValueError(f"stop strings must be non-empty str, got {s!r}")
        if self.stop_token_ids is not None:
            if len(self.stop_token_ids) > 16:
                raise ValueError(
                    f"at most 16 stop token ids, got {len(self.stop_token_ids)}"
                )
            for t in self.stop_token_ids:
                if not isinstance(t, int) or t < 0:
                    raise ValueError(
                        f"stop_token_ids must be non-negative ints, got {t!r}"
                    )
        if self.logprobs is not None and not (0 <= self.logprobs <= 8):
            raise ValueError(f"logprobs must be in [0, 8], got {self.logprobs}")
        if self.logit_bias is not None:
            if len(self.logit_bias) > 64:
                raise ValueError(
                    f"at most 64 logit_bias entries, got {len(self.logit_bias)}"
                )
            for tid, bias in self.logit_bias:
                if tid < 0:
                    raise ValueError(f"logit_bias token ids must be >= 0, got {tid}")
                if not -100.0 <= bias <= 100.0:
                    raise ValueError(
                        f"logit_bias values must be in [-100, 100], got {bias}"
                    )
