"""Sliding-window attention (Mistral/Qwen2-style local attention).

Semantics pinned against HF transformers (key visible iff
q_pos - k_pos < sliding_window, plus causal): greedy decodes must match
MistralForCausalLM token-for-token on a tiny random model whose context
exceeds its window. The Pallas kernels (per-substep decode, window-mode
decode, flash prefill) must track the jnp oracle engine under the same
config.
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

TINY = dict(
    vocab_size=384, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=512, rms_norm_eps=1e-6, rope_theta=10000.0,
    tie_word_embeddings=False,
)
SW = 8


def _our_engine(model_dir, **kw):
    from nanovllm_tpu import Config
    from nanovllm_tpu.engine.llm_engine import LLMEngine

    cfg = dict(model_path=model_dir, dtype="float32", kvcache_block_size=16,
               num_kvcache_blocks=32, max_model_len=256, decode_window=4)
    cfg.update(kw)
    return LLMEngine(Config(**cfg))


def _greedy(engine, prompt_ids, n_new):
    from nanovllm_tpu import SamplingParams

    seq = engine.add_request(
        "", SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True)
    )
    seq.token_ids = list(prompt_ids)
    seq.num_prompt_tokens = seq.num_tokens = len(prompt_ids)
    while not engine.is_finished():
        engine.step()
    return seq.completion_token_ids


def test_config_parses_sliding_window(tmp_path):
    from nanovllm_tpu.models.qwen3 import Qwen3Config

    base = dict(TINY, model_type="mistral")
    assert Qwen3Config.from_hf_llama(
        dict(base, sliding_window=SW)).sliding_window == SW
    assert Qwen3Config.from_hf_llama(
        dict(base, sliding_window=None)).sliding_window is None
    # Qwen2/Qwen3 gate behind use_sliding_window, whose HF default is
    # FALSE — a config omitting the key (HF drops saved defaults) must not
    # enable local attention HF would ignore.
    assert Qwen3Config.from_hf_qwen2(
        dict(base, sliding_window=SW, use_sliding_window=False)
    ).sliding_window is None
    assert Qwen3Config.from_hf_qwen2(
        dict(base, sliding_window=SW, use_sliding_window=True)
    ).sliding_window == SW
    assert Qwen3Config.from_hf_qwen2(
        dict(base, sliding_window=32768)
    ).sliding_window is None
    assert Qwen3Config.from_hf(
        dict(base, sliding_window=32768)
    ).sliding_window is None


def test_greedy_matches_hf_mistral(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    d = tmp_path / "mistral_sw"
    cfg = transformers.MistralConfig(
        **TINY, sliding_window=SW, attn_implementation="eager"
    )
    torch.manual_seed(0)
    model = transformers.MistralForCausalLM(cfg).to(torch.float32).eval()
    model.save_pretrained(d, safe_serialization=True)
    with open(d / "config.json") as f:
        saved = json.load(f)
    saved["model_type"] = "mistral"
    assert saved.get("sliding_window") == SW
    with open(d / "config.json", "w") as f:
        json.dump(saved, f)

    rng = np.random.RandomState(7)
    # Prompt 3x the window so the mask matters from the first decode step.
    prompt = rng.randint(0, TINY["vocab_size"], size=3 * SW).tolist()
    n_new = 12
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )
    ref = hf_out[0, len(prompt):].tolist()

    eng = _our_engine(str(d))
    assert eng.model_runner.model_config.sliding_window == SW
    got = _greedy(eng, prompt, n_new)
    assert got == ref

    # Control: WITHOUT the sliding-window mask the decode diverges (the
    # context is long enough that masked keys change the logits).
    with open(d / "config.json") as f:
        nosw = json.load(f)
    nosw["sliding_window"] = None
    d2 = tmp_path / "mistral_nosw"
    d2.mkdir()
    import shutil

    for f_ in d.iterdir():
        shutil.copy(f_, d2 / f_.name)
    with open(d2 / "config.json", "w") as f:
        json.dump(nosw, f)
    got_nosw = _greedy(_our_engine(str(d2)), prompt, n_new)
    assert got_nosw != ref, "window too small to matter — weak test"


@pytest.mark.parametrize("backend", ["python", "native"])
def test_release_below_window(backend):
    """Rolling-buffer eviction: blocks fully below the window free (shared
    ones only when their refcount drops), the table keeps -1 holes, and
    deallocate / register_decode_progress tolerate the holes."""
    from nanovllm_tpu.native import create_block_manager, native_available

    if backend == "native" and not native_available():
        pytest.skip("native block manager unavailable")
    bm = create_block_manager(
        num_blocks=16, block_size=4, enable_prefix_caching=True,
        backend=backend,
    )

    class FakeSeq:
        seq_id = 1
        token_ids = list(range(100, 118))  # 18 tokens -> 5 blocks
        block_table: list = []
        num_cached_tokens = 0
        prefix_hit_block_ids: set = set()

        def __len__(self):
            return len(self.token_ids)

        def num_blocks(self):
            return 5

        def total_len(self):
            return 18

        def get_block_tokens(self, idx):
            return self.token_ids[idx * 4:(idx + 1) * 4]

    seq = FakeSeq()
    bm.allocate(seq)
    free0 = bm.num_free_blocks()
    # Window keeps positions >= 9: blocks 0 and 1 (positions 0..7) free.
    freed = bm.release_below_window(seq, keep_from_pos=9)
    assert freed == 2
    assert seq.block_table[0] == -1 and seq.block_table[1] == -1
    assert all(b >= 0 for b in seq.block_table[2:])
    assert bm.num_free_blocks() == free0 + 2
    # Idempotent and monotone.
    assert bm.release_below_window(seq, keep_from_pos=9) == 0
    # Progress registration and deallocation tolerate the holes.
    bm.register_decode_progress(seq)
    bm.deallocate(seq)
    assert bm.num_free_blocks() == 16


@pytest.mark.parametrize("backend", ["python", "native"])
def test_eviction_never_registers_position0_alias(backend):
    """Regression (code review r3): after eviction breaks the hash chain,
    a later full block must NOT register with prefix 0 — that would alias
    a mid-sequence block to a position-0 chain start, and a later prompt
    starting with those tokens would cache-hit KV computed at the wrong
    RoPE positions."""
    from nanovllm_tpu.engine.block_manager import compute_hash
    from nanovllm_tpu.native import create_block_manager, native_available

    if backend == "native" and not native_available():
        pytest.skip("native block manager unavailable")
    bm = create_block_manager(num_blocks=16, block_size=4,
                              enable_prefix_caching=True, backend=backend)

    class FakeSeq:
        seq_id = 1
        token_ids = list(range(100, 120))  # 20 tokens, 5 blocks
        block_table: list = []
        num_cached_tokens = 0
        prefix_hit_block_ids: set = set()

        def __len__(self):
            return len(self.token_ids)

        def num_blocks(self):
            return (len(self.token_ids) + 3) // 4

        def total_len(self):
            return len(self.token_ids)

        def get_block_tokens(self, idx):
            return self.token_ids[idx * 4:(idx + 1) * 4]

    seq = FakeSeq()
    bm.allocate(seq)
    # Evict blocks 0-1 BEFORE they were registered (their chain is gone),
    # then register progress: block 2 (tokens 108..111 at positions 8..11)
    # must not take the identity of a POSITION-0 block of those tokens.
    bm.release_below_window(seq, keep_from_pos=8)
    bm.register_decode_progress(seq)

    class Probe(FakeSeq):
        seq_id = 2
        token_ids = list(range(108, 112)) + [1, 2]  # starts with 108..111
        block_table = []
        prefix_hit_block_ids = set()

    probe = Probe()
    bm.allocate(probe)
    assert probe.num_cached_tokens == 0, (
        "position-0 alias cache hit on KV computed at positions 8..11"
    )
    bm.deallocate(probe)
    bm.deallocate(seq)


def test_eviction_bounds_kv_and_preserves_outputs(tmp_path):
    """With sliding window + eviction, a generation far past the window
    completes inside a block pool too small for its full KV — and produces
    exactly the same tokens as the no-eviction engine (given enough pool)."""
    d = tmp_path / "m"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(dict(model_type="mistral", **TINY, sliding_window=SW), f)
    rng = np.random.RandomState(5)
    prompt = rng.randint(0, TINY["vocab_size"], size=20).tolist()
    n_new = 44  # total 64 positions = 4 blocks of 16

    big = _our_engine(str(d), num_kvcache_blocks=32)
    ref = _greedy(big, prompt, n_new)
    assert big.scheduler.num_window_evicted > 0

    # Pool of 3 blocks (48 positions) < the 4+ the sequence spans: only
    # the rolling buffer makes this complete without thrashing.
    small = _our_engine(str(d), num_kvcache_blocks=3, max_model_len=80)
    got = _greedy(small, prompt, n_new)
    assert got == ref
    assert small.scheduler.num_window_evicted > 0
    st = small.get_stats()
    assert st.memory.free_blocks == st.memory.total_blocks

    # Eviction off: same outputs when the pool is big enough (the mask
    # already hides the kept blocks).
    off = _our_engine(str(d), num_kvcache_blocks=32,
                      sliding_window_kv_eviction=False)
    got_off = _greedy(off, prompt, n_new)
    assert got_off == ref
    assert off.scheduler.num_window_evicted == 0


@pytest.mark.parametrize("kvd", ["auto", "int8"])
def test_sliding_pallas_tracks_oracle(tmp_path, kvd):
    """Pallas kernels (interpret mode) vs the jnp oracle engine with a
    sliding window: "auto" KV runs flash prefill + per-substep decode
    (exact match); int8 KV runs the window-mode kernels (strong overlap —
    window mode attends in-window rows at full precision BY DESIGN)."""
    d = tmp_path / "m"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(dict(model_type="mistral", vocab_size=512,
                       hidden_size=256, intermediate_size=512,
                       num_hidden_layers=2, num_attention_heads=8,
                       num_key_value_heads=4, head_dim=128,
                       tie_word_embeddings=True, sliding_window=SW), f)
    rng = np.random.RandomState(11)
    prompt = rng.randint(0, 512, size=3 * SW).tolist()
    outs = {}
    for pallas in (False, True):
        eng = _our_engine(str(d), kv_cache_dtype=kvd, use_pallas=pallas,
                          pallas_interpret=pallas)
        if pallas:
            assert eng.model_runner.attn_impl == "pallas_decode"
        outs[pallas] = _greedy(eng, prompt, 12)
    if kvd == "auto":
        assert outs[True] == outs[False]
    else:
        match = sum(a == b for a, b in zip(outs[True], outs[False]))
        assert match >= 6, outs
