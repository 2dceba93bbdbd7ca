"""Sequence state machine and block math
(mirrors reference src/engine/sequence.rs:253-363 test scenarios)."""

import pytest

from nanovllm_tpu import SamplingParams, Sequence, SequenceStatus


def test_new_sequence_state():
    seq = Sequence([1, 2, 3], block_size=4)
    assert seq.status == SequenceStatus.WAITING
    assert len(seq) == 3
    assert seq.num_prompt_tokens == 3
    assert seq.num_completion_tokens == 0
    assert seq.num_cached_tokens == 0
    assert seq.last_token == 3


def test_ids_are_unique_and_increasing():
    a, b = Sequence([1]), Sequence([1])
    assert b.seq_id > a.seq_id


def test_empty_prompt_rejected():
    with pytest.raises(ValueError):
        Sequence([])


def test_block_math():
    seq = Sequence(list(range(10)), block_size=4)
    assert seq.num_blocks() == 3
    assert seq.last_block_num_tokens() == 2
    assert seq.get_block_tokens(0) == [0, 1, 2, 3]
    assert seq.get_block_tokens(2) == [8, 9]
    with pytest.raises(IndexError):
        seq.get_block_tokens(3)
    seq.append_token(10)
    seq.append_token(11)
    assert seq.num_blocks() == 3
    seq.append_token(12)
    assert seq.num_blocks() == 4
    assert seq.last_block_num_tokens() == 1


def test_should_stop_max_tokens():
    seq = Sequence([1, 2], SamplingParams(max_tokens=2))
    assert not seq.should_stop(eos_token_id=0)
    seq.append_token(5)
    assert not seq.should_stop(eos_token_id=0)
    seq.append_token(6)
    assert seq.should_stop(eos_token_id=0)
    assert seq.finish_reason == "length"


def test_should_stop_eos_and_ignore_eos():
    seq = Sequence([1, 2], SamplingParams(max_tokens=10))
    seq.append_token(99)
    assert seq.should_stop(eos_token_id=99)
    assert seq.finish_reason == "stop"

    seq2 = Sequence([1, 2], SamplingParams(max_tokens=10, ignore_eos=True))
    seq2.append_token(99)
    assert not seq2.should_stop(eos_token_id=99)


def test_min_tokens_suppresses_eos_until_reached():
    seq = Sequence([1, 2], SamplingParams(max_tokens=10, min_tokens=3))
    seq.append_token(99)
    assert not seq.should_stop(eos_token_id=99)  # 1 < min_tokens
    seq.append_token(99)
    assert not seq.should_stop(eos_token_id=99)  # 2 < min_tokens
    seq.append_token(99)
    assert seq.should_stop(eos_token_id=99)      # 3 >= min_tokens
    assert seq.finish_reason == "stop"
    # Length caps are NOT suppressed by min_tokens.
    seq2 = Sequence([1], SamplingParams(max_tokens=2, min_tokens=2))
    seq2.append_token(5)
    seq2.append_token(6)
    assert seq2.should_stop(eos_token_id=None)
    assert seq2.finish_reason == "length"


def test_stop_token_ids():
    seq = Sequence([1, 2], SamplingParams(max_tokens=10, stop_token_ids=[7, 9]))
    seq.append_token(5)
    assert not seq.should_stop(eos_token_id=None)
    seq.append_token(9)
    assert seq.should_stop(eos_token_id=None)
    assert seq.finish_reason == "stop"
    # ignore_eos does NOT disable explicit stop ids; min_tokens does.
    seq2 = Sequence([1], SamplingParams(max_tokens=10, ignore_eos=True,
                                        stop_token_ids=[7], min_tokens=2))
    seq2.append_token(7)
    assert not seq2.should_stop(eos_token_id=None)  # 1 < min_tokens
    seq2.append_token(7)
    assert seq2.should_stop(eos_token_id=None)
    # int accepted and normalized to a tuple; validation bounds.
    assert SamplingParams(stop_token_ids=5).stop_token_ids == (5,)
    with pytest.raises(ValueError):
        SamplingParams(stop_token_ids=[-1]).validate()
    with pytest.raises(ValueError):
        SamplingParams(stop_token_ids=list(range(17))).validate()


def test_min_tokens_validation():
    with pytest.raises(ValueError):
        SamplingParams(min_tokens=-1).validate()
    with pytest.raises(ValueError):
        SamplingParams(max_tokens=4, min_tokens=5).validate()
    SamplingParams(max_tokens=4, min_tokens=4).validate()


def test_eos_in_prompt_does_not_stop():
    seq = Sequence([99], SamplingParams(max_tokens=4))
    assert not seq.should_stop(eos_token_id=99)


def test_should_stop_max_model_len():
    seq = Sequence([1, 2, 3], SamplingParams(max_tokens=100))
    seq.append_token(4)
    assert seq.should_stop(eos_token_id=None, max_model_len=4)


def test_preempt_resets_device_state_keeps_tokens():
    seq = Sequence([1, 2, 3], block_size=4)
    seq.block_table = [5, 6]
    seq.num_cached_tokens = 4
    seq.append_token(7)
    seq.preempt()
    assert seq.status == SequenceStatus.PREEMPTED
    assert seq.block_table == []
    assert seq.num_cached_tokens == 0
    assert seq.token_ids == [1, 2, 3, 7]  # generated tokens survive preemption
    assert seq.num_preemptions == 1


def test_create_output():
    seq = Sequence([1, 2], SamplingParams(max_tokens=2))
    seq.append_token(3)
    seq.append_token(4)
    seq.finish()
    out = seq.create_output("hello")
    assert out.seq_id == seq.seq_id
    assert out.text == "hello"
    assert out.token_ids == [1, 2, 3, 4]
    assert out.completion_token_ids == [3, 4]
    assert out.num_prompt_tokens == 2
    assert out.num_completion_tokens == 2
    assert out.status == SequenceStatus.FINISHED


def test_sampling_params_validation():
    SamplingParams().validate()
    SamplingParams(temperature=0.0).validate()
    with pytest.raises(ValueError):
        SamplingParams(temperature=-1.0).validate()
    with pytest.raises(ValueError):
        SamplingParams(max_tokens=0).validate()
    with pytest.raises(ValueError):
        SamplingParams(top_p=0.0).validate()
    with pytest.raises(ValueError):
        SamplingParams(top_p=1.5).validate()
    with pytest.raises(ValueError):
        SamplingParams(top_k=0).validate()
    with pytest.raises(ValueError):
        SamplingParams(repetition_penalty=0.0).validate()
    assert SamplingParams(temperature=0.0).is_greedy()
    assert not SamplingParams(temperature=0.7).is_greedy()
