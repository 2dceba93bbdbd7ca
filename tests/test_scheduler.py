"""Scheduler: prefill/decode batching, budgets, preemption, completion
(mirrors reference scheduler.rs:367-578 scenarios with tiny block pools)."""

import pytest

from nanovllm_tpu import Config, SamplingParams, Scheduler, Sequence, SequenceStatus


def mkcfg(tmp_model_dir, **kw):
    defaults = dict(
        model_path=tmp_model_dir,
        device="cpu",
        kvcache_block_size=16,
        num_kvcache_blocks=16,
        max_num_seqs=8,
        max_num_batched_tokens=256,
        max_model_len=128,
        eos_token_id=0,
    )
    defaults.update(kw)
    return Config(**defaults)


def mkseq(n_tokens, block_size=16, **params):
    return Sequence(
        list(range(1, n_tokens + 1)),
        SamplingParams(**params) if params else SamplingParams(),
        block_size=block_size,
    )


def test_prefill_first_then_decode(tmp_model_dir):
    sch = Scheduler(mkcfg(tmp_model_dir))
    s1, s2 = mkseq(20), mkseq(10)
    sch.add_sequence(s1)
    sch.add_sequence(s2)

    batch, is_prefill = sch.schedule()
    assert is_prefill
    assert batch == [s1, s2]
    assert all(s.status == SequenceStatus.RUNNING for s in batch)

    batch2, is_prefill2 = sch.schedule()
    assert not is_prefill2
    assert set(batch2) == {s1, s2}


def test_empty_schedule_is_ok(tmp_model_dir):
    sch = Scheduler(mkcfg(tmp_model_dir))
    batch, is_prefill = sch.schedule()
    assert batch == [] and not is_prefill
    assert sch.is_finished()


def test_max_num_seqs_limit(tmp_model_dir):
    sch = Scheduler(mkcfg(tmp_model_dir, max_num_seqs=2))
    for _ in range(3):
        sch.add_sequence(mkseq(4))
    batch, _ = sch.schedule()
    assert len(batch) == 2
    assert len(sch.waiting) == 1


def test_token_budget_limit(tmp_model_dir):
    sch = Scheduler(mkcfg(tmp_model_dir, max_num_batched_tokens=32))
    sch.add_sequence(mkseq(30))
    sch.add_sequence(mkseq(30))
    batch, is_prefill = sch.schedule()
    assert is_prefill and len(batch) == 1
    # Second prefill comes in its own batch.
    batch2, is_prefill2 = sch.schedule()
    assert is_prefill2 and len(batch2) == 1


def test_oversized_single_prompt_still_admitted(tmp_model_dir):
    """Budget smaller than one prompt must not livelock (SURVEY §2.14.8)."""
    sch = Scheduler(mkcfg(tmp_model_dir, max_num_batched_tokens=16, max_model_len=64))
    sch.add_sequence(mkseq(40))
    batch, is_prefill = sch.schedule()
    assert is_prefill and len(batch) == 1


def test_prompt_longer_than_model_len_fails(tmp_model_dir):
    sch = Scheduler(mkcfg(tmp_model_dir, max_model_len=8))
    seq = mkseq(20)
    sch.add_sequence(seq)
    batch, _ = sch.schedule()
    assert batch == []
    assert seq.status == SequenceStatus.ERROR
    assert len(sch.failed) == 1


def test_eos_completion(tmp_model_dir):
    sch = Scheduler(mkcfg(tmp_model_dir))
    seq = mkseq(4, max_tokens=10)
    sch.add_sequence(seq)
    sch.schedule()
    finished = sch.postprocess([seq], [0])  # eos_token_id = 0
    assert finished == [seq]
    assert seq.status == SequenceStatus.FINISHED
    assert seq.finish_reason == "stop"
    assert sch.is_finished()
    assert sch.block_manager.num_free_blocks() == 16


def test_max_tokens_completion(tmp_model_dir):
    sch = Scheduler(mkcfg(tmp_model_dir))
    seq = mkseq(4, max_tokens=2)
    sch.add_sequence(seq)
    sch.schedule()
    assert sch.postprocess([seq], [5]) == []
    sch.schedule()
    finished = sch.postprocess([seq], [6])
    assert finished == [seq]
    assert seq.finish_reason == "length"
    assert seq.token_ids[-2:] == [5, 6]


def test_preemption_under_memory_pressure(tmp_model_dir):
    # 2 blocks of 16: two 16-token prompts fill the pool exactly.
    sch = Scheduler(mkcfg(tmp_model_dir, num_kvcache_blocks=2, max_num_batched_tokens=64))
    s1, s2 = mkseq(16, max_tokens=32), mkseq(16, max_tokens=32)
    s1.token_ids[0] = 999  # make prompts distinct (no prefix sharing)
    sch.add_sequence(s1)
    sch.add_sequence(s2)
    batch, is_prefill = sch.schedule()
    assert is_prefill and len(batch) == 2

    # Decode: each seq appends a token; at len 17 (rem 1) each needs a new
    # block but none are free → the younger seq gets preempted.
    sch.postprocess(batch, [7, 7])
    batch2, is_prefill2 = sch.schedule()
    assert not is_prefill2
    assert batch2 == [s1]
    assert s2.status == SequenceStatus.PREEMPTED
    assert s2.block_table == []
    assert s2.token_ids[-1] == 7  # generated token survived preemption
    assert sch.waiting[0] is s2  # re-queued at the FRONT
    assert sch.num_preemptions == 1


def test_preempted_seq_recovers_and_finishes(tmp_model_dir):
    sch = Scheduler(mkcfg(tmp_model_dir, num_kvcache_blocks=2, max_num_batched_tokens=64))
    s1, s2 = mkseq(16, max_tokens=4), mkseq(16, max_tokens=4)
    s1.token_ids[0] = 999
    sch.add_sequence(s1)
    sch.add_sequence(s2)
    # Run to completion, alternating schedule/postprocess.
    for _ in range(64):
        batch, is_prefill = sch.schedule()
        if not batch:
            assert sch.is_finished()
            break
        sch.postprocess(batch, [3] * len(batch))
    assert s1.status == SequenceStatus.FINISHED
    assert s2.status == SequenceStatus.FINISHED
    assert s1.num_completion_tokens == 4
    assert s2.num_completion_tokens == 4
    assert sch.block_manager.num_free_blocks() == 2


def test_preempt_all_shutdown(tmp_model_dir):
    sch = Scheduler(mkcfg(tmp_model_dir))
    for _ in range(3):
        sch.add_sequence(mkseq(4))
    sch.schedule()
    assert len(sch.running) == 3
    sch.preempt_all()
    assert len(sch.running) == 0
    assert len(sch.waiting) == 3
    assert sch.block_manager.num_free_blocks() == 16


def test_prefix_cached_tokens_exempt_from_budget(tmp_model_dir):
    sch = Scheduler(mkcfg(tmp_model_dir, max_num_batched_tokens=20, num_kvcache_blocks=16))
    s1 = mkseq(16, max_tokens=1)
    sch.add_sequence(s1)
    batch, _ = sch.schedule()
    sch.postprocess(batch, [0])  # finishes via eos; blocks freed but cached
    assert s1.status == SequenceStatus.FINISHED

    # Same 16-token prefix + 4 new tokens: 16 are cached, so only ~5 count
    # against the 20-token budget alongside another 15-token prompt.
    s2 = Sequence(list(range(1, 17)) + [50, 51, 52, 53], block_size=16)
    s3 = mkseq(15)
    sch.add_sequence(s2)
    sch.add_sequence(s3)
    batch, is_prefill = sch.schedule()
    assert is_prefill
    assert batch == [s2, s3]
    assert s2.num_cached_tokens == 16


def test_stats(tmp_model_dir):
    sch = Scheduler(mkcfg(tmp_model_dir))
    seq = mkseq(8, max_tokens=2)
    sch.add_sequence(seq)
    b, _ = sch.schedule()
    sch.postprocess(b, [5])
    b, _ = sch.schedule()
    sch.postprocess(b, [5])
    st = sch.get_stats()
    assert st.num_prefill_batches == 1
    assert st.num_decode_batches == 1
    assert st.total_prefill_tokens == 8
    assert st.total_decode_tokens == 1
    assert st.num_finished == 1
    assert st.completion_rate == 1.0
    assert not st.is_under_pressure()


def test_request_that_can_never_fit_fails_not_livelocks(tmp_model_dir):
    """A seq whose KV exceeds the whole pool must error out (found by probe)."""
    sch = Scheduler(mkcfg(tmp_model_dir, num_kvcache_blocks=1, max_num_batched_tokens=128))
    seq = mkseq(16, max_tokens=20, ignore_eos=True)
    sch.add_sequence(seq)
    steps = 0
    while not sch.is_finished() and steps < 50:
        batch, _ = sch.schedule()
        if not batch:
            break
        sch.postprocess(batch, [7] * len(batch))
        steps += 1
    assert sch.is_finished()
    assert seq.status == SequenceStatus.ERROR
    assert seq.finish_reason == "insufficient_kv_blocks"
    assert sch.block_manager.num_free_blocks() == 1
