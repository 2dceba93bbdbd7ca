"""End-to-end LLMEngine tests on a fabricated tiny Qwen3 checkpoint
(reference scenarios: llm_engine.rs:491-583, plus the aspirational external
tests/ tree: engine init, generation, streaming, batch, health)."""

import asyncio
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from nanovllm_tpu import Config, SamplingParams
from nanovllm_tpu.engine.llm_engine import LLMEngine, LLMEngineBuilder

TINY = dict(
    model_type="qwen3",
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    max_position_embeddings=512,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    tie_word_embeddings=False,
    eos_token_id=None,  # byte tokenizer supplies eos=256... vocab 256 → no eos
)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from nanovllm_tpu.models.qwen3 import Qwen3Config, init_params
    from nanovllm_tpu.utils.loader import save_qwen3_weights_hf

    d = tmp_path_factory.mktemp("engine_model")
    cfg_dict = dict(TINY)
    with open(d / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    cfg = Qwen3Config.from_hf(cfg_dict)
    params = init_params(cfg, jax.random.PRNGKey(42), jnp.float32)
    save_qwen3_weights_hf(params, cfg, str(d))
    return str(d)


def mkengine(model_dir, **kw):
    defaults = dict(
        model_path=model_dir,
        device="cpu",
        dtype="float32",
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_seqs=8,
        max_num_batched_tokens=512,
        max_model_len=256,
    )
    defaults.update(kw)
    return LLMEngine(Config(**defaults))


GREEDY = SamplingParams(temperature=0.0, max_tokens=8)


def test_generate_batch(model_dir):
    eng = mkengine(model_dir)
    outs = eng.generate(["hello world", "foo", "a longer prompt for the engine"], GREEDY)
    assert len(outs) == 3
    for o in outs:
        assert o.num_completion_tokens == 8  # no eos in random model
        assert o.finish_reason == "length"
        assert len(o.token_ids) == o.num_prompt_tokens + 8
        assert isinstance(o.text, str)
    # Order preserved.
    assert outs[1].num_prompt_tokens == len("foo".encode())


def test_greedy_is_deterministic(model_dir):
    a = mkengine(model_dir).generate(["determinism test"], GREEDY)[0]
    b = mkengine(model_dir).generate(["determinism test"], GREEDY)[0]
    assert a.completion_token_ids == b.completion_token_ids


def test_batched_equals_single(model_dir):
    """Continuous batching must not change greedy results."""
    eng = mkengine(model_dir)
    single = [
        eng.generate([p], GREEDY)[0].completion_token_ids
        for p in ["alpha", "beta gamma", "deltadelta"]
    ]
    eng2 = mkengine(model_dir)
    batched = eng2.generate(["alpha", "beta gamma", "deltadelta"], GREEDY)
    assert [o.completion_token_ids for o in batched] == single


def test_preemption_does_not_change_results(model_dir):
    """Tight block pool forces preemption + re-prefill through the prefix
    cache; greedy outputs must be bit-identical to the pressure-free run."""
    roomy = mkengine(model_dir, num_kvcache_blocks=64)
    prompts = ["shared prefix one", "shared prefix two", "shared prefix three"]
    params = SamplingParams(temperature=0.0, max_tokens=24)
    expected = [o.completion_token_ids for o in roomy.generate(prompts, params)]

    tight = mkengine(model_dir, num_kvcache_blocks=8)
    got = tight.generate(prompts, params)
    assert [o.completion_token_ids for o in got] == expected
    assert tight.scheduler.num_preemptions > 0, "test should actually exercise preemption"


def test_prefix_cache_hits_across_requests(model_dir):
    eng = mkengine(model_dir)
    sys_prompt = "x" * 40  # > 2 full blocks of 16 byte-tokens
    eng.generate([sys_prompt + " question one"], GREEDY)
    eng.generate([sys_prompt + " question two"], GREEDY)
    st = eng.get_stats()
    assert st.scheduler.block_manager.cache_hits >= 2


def test_sampling_paths_run(model_dir):
    eng = mkengine(model_dir)
    outs = eng.generate(
        ["sampling test"],
        SamplingParams(temperature=0.8, top_k=40, top_p=0.9, repetition_penalty=1.2, max_tokens=6),
    )
    assert outs[0].num_completion_tokens == 6
    assert all(0 <= t < 256 for t in outs[0].completion_token_ids)


def test_streaming_deltas_join_to_final(model_dir):
    eng = mkengine(model_dir)

    async def collect():
        chunks = []
        async for out in eng.generate_stream("stream me", GREEDY):
            chunks.append(out.text)
        return chunks, out

    chunks, final = asyncio.run(collect())
    assert len(chunks) == 8  # one yield per token
    assert final.num_completion_tokens == 8
    joined = "".join(chunks)
    ref = mkengine(model_dir).generate(["stream me"], GREEDY)[0]
    assert joined == ref.text


def test_streaming_cancellation_frees_blocks(model_dir):
    eng = mkengine(model_dir)

    async def cancel_early():
        gen = eng.generate_stream("cancel me please", SamplingParams(temperature=0.0, max_tokens=50))
        async for _ in gen:
            break  # drop the generator after the first token
        await gen.aclose()

    asyncio.run(cancel_early())
    st = eng.get_stats()
    assert st.memory.used_blocks == 0, "cancelled request must free its blocks"


def test_concurrent_streams_interleave_correctly(model_dir):
    """Two simultaneous generate_stream generators both drive engine.step();
    each must receive exactly its own tokens, matching a solo run
    (VERDICT r1 weak #10: interleaved drivers untested)."""
    eng = mkengine(model_dir)
    prompts = ["stream alpha", "stream beta bb"]
    solo = [
        mkengine(model_dir).generate([p], GREEDY)[0] for p in prompts
    ]

    async def drive(prompt):
        chunks = []
        final = None
        async for out in eng.generate_stream(prompt, GREEDY):
            chunks.append(out.text)
            final = out
        return "".join(chunks), final

    async def both():
        return await asyncio.gather(*(drive(p) for p in prompts))

    results = asyncio.run(both())
    for (joined, final), ref in zip(results, solo):
        assert final.num_completion_tokens == 8
        assert joined == ref.text
        assert final.completion_token_ids == ref.completion_token_ids
    st = eng.get_stats()
    assert st.memory.used_blocks == 0
    assert not eng.is_running


def test_stream_joined_by_batch_generate(model_dir):
    """A concurrent stream must survive generate() batches arriving on the
    same engine (both drive step())."""
    eng = mkengine(model_dir)

    async def scenario():
        stream_task = asyncio.ensure_future(collect())
        await asyncio.sleep(0)
        batch = eng.generate(["batch rider"], GREEDY)
        return await stream_task, batch

    async def collect():
        chunks = []
        async for out in eng.generate_stream("long stream", SamplingParams(
                temperature=0.0, max_tokens=16, ignore_eos=True)):
            chunks.append(out.text)
            await asyncio.sleep(0)
        return chunks, out

    (chunks, final), batch = asyncio.run(scenario())
    assert final.num_completion_tokens == 16
    assert batch[0].num_completion_tokens == 8
    ref = mkengine(model_dir).generate(["long stream"], SamplingParams(
        temperature=0.0, max_tokens=16, ignore_eos=True))[0]
    assert "".join(chunks) == ref.text


def test_engine_state_snapshot_resume(model_dir, tmp_path):
    """save_state mid-generation + load_state in a fresh engine must finish
    with exactly the tokens an uninterrupted run produces (KV recovered by
    re-prefill; reference aspirational surface model_io_test.rs:29)."""
    params = SamplingParams(temperature=0.0, max_tokens=72, ignore_eos=True)
    prompts = ["checkpoint my state", "second request"]
    expected = [
        o.completion_token_ids
        for o in mkengine(model_dir).generate(prompts, params)
    ]

    eng = mkengine(model_dir)
    for p in prompts:
        eng.add_request(p, params)
    for _ in range(3):  # progress partway into decode
        eng.step()
    path = str(tmp_path / "engine_state.json")
    n = eng.save_state(path)
    assert n == 2

    resumed = LLMEngine.load_state(path)
    outs = []
    while resumed.has_unfinished():
        outs.extend(resumed.step())
    got = {o.seq_id: o.completion_token_ids for o in outs}
    assert sorted(len(v) for v in got.values()) == [72, 72]
    # Union of pre-snapshot progress and post-resume completion matches.
    finals = [v for _, v in sorted(got.items())]
    assert finals == expected


def test_stats_and_health(model_dir):
    eng = mkengine(model_dir)
    eng.generate(["health check"], GREEDY)
    st = eng.get_stats()
    assert st.scheduler.num_finished == 1
    assert st.memory.total_blocks == 64
    assert st.memory.used_blocks == 0
    assert st.num_compilations > 0
    h = eng.health_check()
    assert h.healthy
    assert h.num_running == 0


def test_shutdown_preempts(model_dir):
    eng = mkengine(model_dir)
    eng.add_request("will be interrupted", SamplingParams(max_tokens=100))
    eng.step()  # prefill
    assert eng.scheduler.get_stats().num_running == 1
    eng.shutdown()
    assert eng.scheduler.get_stats().num_running == 0
    assert eng.get_stats().memory.used_blocks == 0


def test_builder_and_helpers(model_dir):
    eng = (
        LLMEngineBuilder()
        .model_path(model_dir)
        .device("cpu")
        .dtype("float32")
        .kvcache_block_size(16)
        .num_kvcache_blocks(32)
        .max_model_len(128)
        .build()
    )
    out = eng.generate(["builder"], SamplingParams(temperature=0.0, max_tokens=2))[0]
    assert out.num_completion_tokens == 2


def test_bucketing_pads_and_reuses_compilations(model_dir):
    """Same-bucket batches must not recompile (the CUDA-graph analogue)."""
    eng = mkengine(model_dir)
    eng.generate(["aaaa"], GREEDY)
    n = eng.model_runner.num_compilations
    eng.generate(["bbbb"], GREEDY)  # same shapes → same buckets
    assert eng.model_runner.num_compilations == n


def test_invalid_model_path_raises():
    with pytest.raises(ValueError):
        LLMEngine(Config(model_path="/nope/nope", device="cpu"))


def test_impossible_prompt_returns_error_output(model_dir):
    """Oversized prompt surfaces as an ERROR output, not an exception
    (found by verification probe)."""
    from nanovllm_tpu.engine.sequence import SequenceStatus

    eng = mkengine(model_dir, max_model_len=64)
    outs = eng.generate(["x" * 200, "fine prompt"], GREEDY)
    assert outs[0].status == SequenceStatus.ERROR
    assert outs[0].finish_reason == "prompt_too_long"
    assert outs[0].num_completion_tokens == 0
    assert outs[1].status == SequenceStatus.FINISHED
    assert outs[1].num_completion_tokens == 8


class TestKVCacheDtypes:
    # fp8-e4m3 (3 mantissa bits) can shift one greedy token and then follow
    # a displaced-but-valid trajectory on this random tiny model, so its
    # positional-match gate is loose here; its real accuracy gate is the
    # teacher-forced perplexity test (test_perplexity.py::test_fp8_kv_ppl_gate).
    @pytest.mark.parametrize("kvd,min_match", [("int8", 8), ("fp8", 1)])
    def test_quantized_kv_cache_close_to_fp32(self, tmp_model_dir, kvd, min_match):
        """Quantized KV (per-row scales: int8 amax/127, fp8-e4m3 amax/448)
        runs end-to-end and greedy decode stays close to the fp32-KV decode
        on the same weights (BASELINE configs 3 and 5)."""
        import json
        import os

        import jax.numpy as jnp

        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        with open(os.path.join(tmp_model_dir, "config.json"), "w") as f:
            json.dump(dict(model_type="qwen3", vocab_size=512, hidden_size=128,
                           intermediate_size=256, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           head_dim=32, tie_word_embeddings=True), f)
        outs = {}
        for mode in ("auto", kvd):
            cfg = Config(model_path=tmp_model_dir, dtype="float32",
                         kv_cache_dtype=mode, kvcache_block_size=16,
                         num_kvcache_blocks=32, max_model_len=256,
                         decode_window=4)
            eng = LLMEngine(cfg, rng_seed=0)
            if mode == kvd:  # tuple cache: (data, per-row scale)
                data, scale = eng.model_runner.k_cache
                expect = jnp.int8 if kvd == "int8" else jnp.float8_e4m3fn
                assert data.dtype == expect and scale.dtype == jnp.float32
            o = eng.generate(["hello world"],
                             SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True))
            outs[mode] = o[0].completion_token_ids
        match = sum(a == b for a, b in zip(outs["auto"], outs[kvd]))
        assert match >= min_match, (match, outs)  # quantized KV tracks fp32

    @pytest.mark.parametrize("kvd", ["auto", "int8", "fp8"])
    def test_kv_pallas_tracks_oracle(self, tmp_model_dir, kvd):
        """The window-mode decode kernels (interpret mode) vs the jnp
        oracle engine. bf16 KV ("auto"): greedy tokens must match exactly.
        Quantized KV: the two paths are both valid but numerically
        different BY DESIGN — window mode attends the window's own rows at
        full precision, while the oracle re-reads them quantized — so the
        gate is strong overlap, not equality (the kernels' cache contents
        are bit-exact vs the oracle writer: tests/test_window_kernels.py)."""
        import json
        import os

        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        with open(os.path.join(tmp_model_dir, "config.json"), "w") as f:
            json.dump(dict(model_type="qwen3", vocab_size=512, hidden_size=256,
                           intermediate_size=512, num_hidden_layers=2,
                           num_attention_heads=8, num_key_value_heads=4,
                           head_dim=128, tie_word_embeddings=True), f)
        outs = {}
        for pallas in (False, True):
            cfg = Config(model_path=tmp_model_dir, dtype="float32",
                         kv_cache_dtype=kvd, kvcache_block_size=16,
                         num_kvcache_blocks=32, max_model_len=256,
                         decode_window=4, use_pallas=pallas,
                         pallas_interpret=pallas)
            eng = LLMEngine(cfg, rng_seed=0)
            if pallas:
                assert eng.model_runner.attn_impl == "pallas_decode"
                assert eng.model_runner.prefill_attn_impl == "pallas_prefill"
            o = eng.generate(["kernel oracle check", "second prompt"],
                             SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True))
            outs[pallas] = [x.completion_token_ids for x in o]
        if kvd == "auto":
            assert outs[True] == outs[False]
        else:
            total = match = 0
            for a, b in zip(outs[True], outs[False]):
                match += sum(x == y for x, y in zip(a, b))
                total += len(a)
            assert match >= total * 0.5, outs


class TestAbort:
    def test_abort_request_mid_flight(self, tmp_model_dir):
        import json
        import os

        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        with open(os.path.join(tmp_model_dir, "config.json"), "w") as f:
            json.dump(dict(model_type="qwen3", vocab_size=512, hidden_size=128,
                           intermediate_size=256, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           head_dim=32, tie_word_embeddings=True), f)
        cfg = Config(model_path=tmp_model_dir, dtype="float32",
                     kvcache_block_size=16, num_kvcache_blocks=32,
                     max_model_len=256, decode_window=4)
        eng = LLMEngine(cfg, rng_seed=0)
        keep = eng.add_request("keep going", SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True))
        kill = eng.add_request("cancel me", SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True))
        eng.step()
        eng.step()  # both in flight
        assert eng.abort_request(kill.seq_id)
        while not eng.is_finished():
            eng.step()
        assert keep.num_completion_tokens == 12
        from nanovllm_tpu.engine.sequence import SequenceStatus
        assert kill.status == SequenceStatus.ERROR
        assert kill.finish_reason == "cancelled"
        st = eng.get_stats()
        assert st.memory.free_blocks == st.memory.total_blocks
        assert not eng.abort_request(kill.seq_id)  # already gone


class TestAsyncPreemptionStress:
    def test_preemption_storm_with_pipeline(self, tmp_model_dir):
        """Many sequences over a tiny block pool with the async pipeline:
        preemptions must recover via re-prefill (keeping their in-flight
        tokens), everything finishes, and no blocks leak."""
        import json
        import os

        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine
        from nanovllm_tpu.engine.sequence import SequenceStatus

        with open(os.path.join(tmp_model_dir, "config.json"), "w") as f:
            json.dump(dict(model_type="qwen3", vocab_size=512, hidden_size=128,
                           intermediate_size=256, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           head_dim=32, tie_word_embeddings=True), f)
        cfg = Config(model_path=tmp_model_dir, dtype="float32",
                     kvcache_block_size=16, num_kvcache_blocks=10,
                     max_num_seqs=8, max_model_len=160, decode_window=4,
                     pipeline_depth=2)
        eng = LLMEngine(cfg, rng_seed=0)
        params = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
        seqs = [eng.add_request(f"prompt number {i} " * 4, params) for i in range(6)]
        steps = 0
        while not eng.is_finished():
            eng.step()
            steps += 1
            assert steps < 500, "livelock"
        assert all(s.status == SequenceStatus.FINISHED for s in seqs)
        assert all(s.num_completion_tokens == 40 for s in seqs)
        assert all(s.num_pending == 0 for s in seqs)
        st = eng.get_stats()
        assert st.scheduler.num_preemptions > 0, "storm did not trigger preemption"
        assert st.memory.free_blocks == st.memory.total_blocks

    def test_deterministic_vs_sync_mode(self, tmp_model_dir):
        """Async pipelined scheduling must not change greedy outputs vs the
        reference-style synchronous stepping."""
        import json
        import os

        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        with open(os.path.join(tmp_model_dir, "config.json"), "w") as f:
            json.dump(dict(model_type="qwen3", vocab_size=512, hidden_size=128,
                           intermediate_size=256, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           head_dim=32, tie_word_embeddings=True), f)
        outs = {}
        for async_mode in (False, True):
            cfg = Config(model_path=tmp_model_dir, dtype="float32",
                         async_scheduling=async_mode, kvcache_block_size=16,
                         num_kvcache_blocks=64, max_model_len=256,
                         decode_window=4)
            eng = LLMEngine(cfg, rng_seed=0)
            o = eng.generate(
                ["one two three", "four five"],
                SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True),
            )
            outs[async_mode] = [x.completion_token_ids for x in o]
        assert outs[False] == outs[True]


class TestStopStrings:
    def test_stop_string_truncates_and_finishes_early(self, model_dir):
        """OpenAI-style stop strings: generation finishes when the decoded
        completion contains the string; output text truncates BEFORE the
        match; fewer tokens are accepted than max_tokens."""
        eng = mkengine(model_dir, decode_window=4)
        base = eng.generate(
            ["stop me"], SamplingParams(temperature=0.0, max_tokens=24,
                                        ignore_eos=True))[0]
        assert base.num_completion_tokens == 24
        # Pick a marker from the middle of the deterministic greedy text.
        mid = len(base.text) // 2
        marker = base.text[mid: mid + 4]
        assert marker and marker in base.text

        eng2 = mkengine(model_dir, decode_window=4)
        out = eng2.generate(
            ["stop me"], SamplingParams(temperature=0.0, max_tokens=24,
                                        ignore_eos=True, stop=[marker]))[0]
        assert out.finish_reason == "stop"
        assert marker not in out.text
        assert base.text.startswith(out.text)
        assert out.num_completion_tokens < 24
        # Blocks freed (no leak) despite the early text-level finish.
        st = eng2.get_stats()
        assert st.memory.free_blocks == st.memory.total_blocks

    def test_stop_accepts_bare_string_and_validates(self, model_dir):
        p = SamplingParams(stop="END")
        assert p.stop == ("END",)
        with pytest.raises(ValueError):
            SamplingParams(stop=[""]).validate()

    def test_min_tokens_delays_stop_strings(self, model_dir):
        """min_tokens suppresses stop-string finishes until enough tokens
        exist; the first scan afterwards covers the backlog, so the text
        still truncates at the earliest match."""
        eng = mkengine(model_dir, decode_window=4)
        base = eng.generate(
            ["stop me"], SamplingParams(temperature=0.0, max_tokens=24,
                                        ignore_eos=True))[0]
        marker = base.text[2:6]
        assert marker
        nomin = eng.generate(
            ["stop me"], SamplingParams(temperature=0.0, max_tokens=24,
                                        ignore_eos=True, stop=[marker]))[0]
        withmin = eng.generate(
            ["stop me"], SamplingParams(temperature=0.0, max_tokens=24,
                                        ignore_eos=True, stop=[marker],
                                        min_tokens=16))[0]
        assert nomin.finish_reason == "stop"
        assert withmin.finish_reason == "stop"
        assert withmin.num_completion_tokens >= 16
        assert nomin.num_completion_tokens < withmin.num_completion_tokens
        assert withmin.text == nomin.text  # same earliest-match truncation

    def test_stream_stop_string_never_duplicates(self, model_dir):
        """A stop string completing in a LATER decode window than the text
        it truncates used to make stream_delta re-emit the whole completion
        (the truncated stable text no longer extended prev_text). Streamed
        deltas must concatenate to exactly the non-streamed output for
        markers at every window phase."""
        import asyncio

        eng = mkengine(model_dir, decode_window=4)
        base = eng.generate(
            ["stop me"], SamplingParams(temperature=0.0, max_tokens=24,
                                        ignore_eos=True))[0]
        assert base.num_completion_tokens == 24
        tried = 0
        for off in range(2, len(base.text) - 6):
            marker = base.text[off: off + 5]
            if not marker:
                continue
            tried += 1
            if tried > 6:
                break
            params = SamplingParams(temperature=0.0, max_tokens=24,
                                    ignore_eos=True, stop=[marker])
            ref = eng.generate(["stop me"], params)[0]
            assert marker not in ref.text

            async def run():
                parts = []
                async for out in eng.generate_stream("stop me", params):
                    parts.append(out.text)
                return "".join(parts)

            streamed = asyncio.run(run())
            assert streamed == ref.text, (
                f"marker {marker!r}: streamed {streamed!r} != {ref.text!r}"
            )
        assert tried >= 3
