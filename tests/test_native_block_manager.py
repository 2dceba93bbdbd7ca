"""Native (C++) block manager: behavioral parity with the pure-Python
implementation across allocation, prefix caching, decode windows,
preemption/reuse, and exhaustion — the Python implementation is the oracle
(tests/test_block_manager.py covers its internals)."""

import pytest

from nanovllm_tpu import Sequence
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.native import NativeBlockManager, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not buildable here"
)

BS = 4


def mkseq(tokens):
    return Sequence(list(tokens), block_size=BS)


def both(num_blocks=16, block_size=BS, prefix=True):
    return (
        BlockManager(num_blocks, block_size, prefix),
        NativeBlockManager(num_blocks, block_size, prefix),
    )


def stats_tuple(bm):
    s = bm.get_stats()
    return (s.total_blocks, s.free_blocks, s.used_blocks, s.cached_blocks,
            s.cache_hits, s.cache_queries)


class TestParity:
    def test_allocate_and_prefix_reuse(self):
        py, cc = both()
        for bm in (py, cc):
            a = mkseq(range(8))
            bm.allocate(a)
            b = mkseq(range(8))
            bm.allocate(b)
            assert b.block_table == a.block_table
            assert b.num_cached_tokens == 4
            c = mkseq([1, 2, 3, 4, 9, 9, 9, 9, 9])
            bm.allocate(c)
        assert stats_tuple(py) == stats_tuple(cc)

    def test_free_but_cached_reactivation(self):
        py, cc = both()
        for bm in (py, cc):
            a = mkseq(range(8))
            bm.allocate(a)
            table = list(a.block_table)
            bm.deallocate(a)
            assert bm.num_free_blocks() == 16
            b = mkseq(range(8))
            bm.allocate(b)
            # Reactivated the same (still-cached) blocks.
            assert b.block_table == table
            assert b.num_cached_tokens == 4
        assert stats_tuple(py) == stats_tuple(cc)

    def test_decode_window_protocol(self):
        py, cc = both()
        results = []
        for bm in (py, cc):
            s = mkseq(range(6))  # 2 blocks (4 + 2)
            bm.allocate(s)
            trace = []
            for _ in range(10):
                assert bm.can_append(s, 2)
                bm.may_append(s, 2)
                s.append_token(7)
                s.append_token(8)
                bm.register_decode_progress(s)
                trace.append((len(s.block_table), bm.num_free_blocks()))
            results.append((trace, stats_tuple(bm)[:4]))
        assert results[0] == results[1]

    def test_grown_blocks_become_reusable(self):
        """Blocks filled during decode register their chained hash and are
        prefix-hits for an identical later prompt."""
        py, cc = both()
        for bm in (py, cc):
            s = mkseq(range(4))
            bm.allocate(s)
            # One extra decode past the block boundary so [100..103]'s last
            # KV row is committed (by the window that consumed token 103)
            # before the block becomes hashable.
            for t in [100, 101, 102, 103, 104]:
                bm.may_append(s, 1)
                s.append_token(t)
                bm.register_decode_progress(s)
            # s covers 2 full blocks + 1 partial: [0..3], [100..103], [104]
            table = list(s.block_table)
            bm.deallocate(s)
            d = mkseq([0, 1, 2, 3, 100, 101, 102, 103])
            bm.allocate(d)
            assert d.block_table == table[:2]
            assert d.num_cached_tokens == 4
        assert stats_tuple(py) == stats_tuple(cc)

    def test_undo_allocate_parity(self):
        """Token-budget undo wipes fresh hashes (no phantom prefix hits) but
        keeps identities of blocks shared with live sequences."""
        py, cc = both()
        for bm in (py, cc):
            loser = mkseq(range(8))
            bm.allocate(loser)
            bm.undo_allocate(loser)
            again = mkseq(range(8))
            bm.allocate(again)
            assert again.num_cached_tokens == 0  # poisoned hit would be 4

            sharer = mkseq(list(range(8)) + [99])
            bm.allocate(sharer)
            assert sharer.num_cached_tokens == 8
            bm.undo_allocate(sharer)
            third = mkseq(range(8))
            bm.allocate(third)
            assert third.num_cached_tokens == 4  # live blocks kept identity
        assert stats_tuple(py) == stats_tuple(cc)

    def test_exhaustion_rolls_back(self):
        py, cc = both(num_blocks=2)
        for bm in (py, cc):
            s = mkseq(range(12))  # needs 3 blocks
            with pytest.raises(RuntimeError):
                bm.allocate(s)
            assert bm.num_free_blocks() == 2
            assert s.block_table == []
        assert stats_tuple(py) == stats_tuple(cc)

    def test_prefix_caching_disabled(self):
        py, cc = both(prefix=False)
        for bm in (py, cc):
            a = mkseq(range(8))
            bm.allocate(a)
            b = mkseq(range(8))
            bm.allocate(b)
            assert b.num_cached_tokens == 0
            assert set(b.block_table).isdisjoint(a.block_table)
        assert stats_tuple(py) == stats_tuple(cc)


class TestEngineNativeBackend:
    def test_generate_with_native_backend(self, tmp_model_dir):
        import json
        import os

        from nanovllm_tpu import Config, SamplingParams
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        with open(os.path.join(tmp_model_dir, "config.json"), "w") as f:
            json.dump(
                dict(model_type="qwen3", vocab_size=512, hidden_size=128,
                     intermediate_size=256, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2,
                     head_dim=32, tie_word_embeddings=True), f)
        outs = {}
        for backend in ("python", "native"):
            cfg = Config(model_path=tmp_model_dir, dtype="float32",
                         block_manager_backend=backend, kvcache_block_size=16,
                         num_kvcache_blocks=32, max_model_len=256, decode_window=4)
            eng = LLMEngine(cfg, rng_seed=0)
            prompts = ["shared system prompt " * 4 + "a", "shared system prompt " * 4 + "b"]
            o = eng.generate(prompts, SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
            outs[backend] = [x.completion_token_ids for x in o]
            st = eng.get_stats()
            assert st.memory.free_blocks == st.memory.total_blocks
        assert outs["python"] == outs["native"]
