"""BlockManager: refcounting, chained hashes, prefix-cache reuse, append
protocol, exhaustion (mirrors reference block_manager.rs:363-539 scenarios,
esp. test_prefix_caching with the ref_count==2 assertion)."""

import pytest

from nanovllm_tpu import BlockManager, Sequence
from nanovllm_tpu.engine.block_manager import compute_hash

BS = 4


def mkseq(tokens):
    return Sequence(list(tokens), block_size=BS)


def test_chained_hash_depends_on_prefix():
    h1 = compute_hash([1, 2, 3, 4], 0)
    h2 = compute_hash([1, 2, 3, 4], h1)
    assert h1 != h2
    assert compute_hash([1, 2, 3, 4], 0) == h1  # deterministic


def test_basic_allocate_deallocate():
    bm = BlockManager(num_blocks=8, block_size=BS)
    seq = mkseq(range(10))  # 3 blocks (2 full + 1 partial)
    assert bm.can_allocate(seq)
    bm.allocate(seq)
    assert len(seq.block_table) == 3
    assert bm.num_free_blocks() == 5
    assert len(bm.used_block_ids) == 3
    bm.deallocate(seq)
    assert bm.num_free_blocks() == 8
    assert seq.block_table == []


def test_prefix_cache_hit_refcount_2():
    bm = BlockManager(num_blocks=8, block_size=BS)
    a = mkseq(range(8))  # 2 full blocks
    bm.allocate(a)
    assert a.num_cached_tokens == 0

    b = mkseq(range(8))  # identical prompt
    bm.allocate(b)
    # Both full blocks shared; forced recompute caps cached at len-1.
    assert b.block_table == a.block_table
    assert b.num_cached_tokens == 4  # 8 cached, capped to a block boundary (>= 1 query)
    for bid in a.block_table:
        assert bm.blocks[bid].ref_count == 2
    bm.deallocate(b)
    for bid in a.block_table:
        assert bm.blocks[bid].ref_count == 1


def test_prefix_cache_partial_hit_then_divergence():
    bm = BlockManager(num_blocks=16, block_size=BS)
    a = mkseq([1, 2, 3, 4, 5, 6, 7, 8, 9])  # blocks [1234][5678][9]
    bm.allocate(a)
    b = mkseq([1, 2, 3, 4, 9, 9, 9, 9, 9])  # shares only first block
    bm.allocate(b)
    assert b.num_cached_tokens == BS
    assert b.block_table[0] == a.block_table[0]
    assert b.block_table[1] != a.block_table[1]
    assert bm.blocks[a.block_table[0]].ref_count == 2


def test_no_hits_after_first_miss():
    bm = BlockManager(num_blocks=16, block_size=BS)
    a = mkseq([1, 2, 3, 4, 5, 6, 7, 8])
    bm.allocate(a)
    # Same second-block CONTENT but different first block: the chained hash
    # of block 2 differs (prefix differs), so no reuse.
    b = mkseq([9, 9, 9, 9, 5, 6, 7, 8])
    bm.allocate(b)
    assert b.num_cached_tokens == 0
    assert set(b.block_table).isdisjoint(set(a.block_table))


def test_free_cached_block_reactivation():
    bm = BlockManager(num_blocks=8, block_size=BS)
    a = mkseq(range(8))
    bm.allocate(a)
    table = list(a.block_table)
    bm.deallocate(a)
    assert bm.num_free_blocks() == 8
    # Freed blocks retain their hash → a new identical prompt re-activates them.
    b = mkseq(range(8))
    bm.allocate(b)
    assert b.block_table == table
    assert b.num_cached_tokens == 4


def test_recycled_block_loses_cached_identity():
    bm = BlockManager(num_blocks=2, block_size=BS)
    a = mkseq(range(8))
    bm.allocate(a)
    bm.deallocate(a)
    # Fill the pool with different content → the old hashes must be evicted.
    c = mkseq([7, 7, 7, 7, 8, 8, 8, 8])
    bm.allocate(c)
    bm.deallocate(c)
    d = mkseq(range(8))
    bm.allocate(d)
    assert d.num_cached_tokens == 0


def test_can_allocate_exhaustion():
    bm = BlockManager(num_blocks=2, block_size=BS)
    a = mkseq(range(8))
    bm.allocate(a)
    b = mkseq(range(100, 108))
    assert not bm.can_allocate(b)


def test_partial_block_never_shared():
    bm = BlockManager(num_blocks=8, block_size=BS)
    a = mkseq([1, 2, 3])  # single partial block
    bm.allocate(a)
    b = mkseq([1, 2, 3])
    bm.allocate(b)
    assert a.block_table != b.block_table
    assert b.num_cached_tokens == 0


def test_append_protocol_boundary():
    bm = BlockManager(num_blocks=8, block_size=BS)
    seq = mkseq([1, 2, 3])  # len 3, 1 block
    bm.allocate(seq)
    assert len(seq.block_table) == 1

    # len 3 -> decode writes pos 2, no new block needed (3 % 4 != 1).
    assert bm.can_append(seq)
    bm.may_append(seq)
    seq.append_token(4)  # len 4

    # len 4: block became full, but its last token's KV row is only written
    # by the NEXT decode window — not hashable yet.
    bm.may_append(seq)
    bid = seq.block_table[0]
    assert bm.blocks[bid].hash is None
    seq.append_token(5)  # len 5

    # len 5: rem == 1 → new block for position 4; block 0 now fully covered
    # by committed KV (first len-1 tokens) → hash registered.
    assert bm.can_append(seq)
    bm.may_append(seq)
    assert len(seq.block_table) == 2
    assert bm.blocks[bid].hash is not None
    assert bm.blocks[bid].token_ids == [1, 2, 3, 4]
    assert bm.blocks[seq.block_table[1]].token_ids == [5]


def test_can_append_fails_when_exhausted():
    bm = BlockManager(num_blocks=1, block_size=BS)
    seq = mkseq([1, 2, 3, 4])  # exactly one full block
    bm.allocate(seq)
    bm.may_append(seq)  # registers the full block's hash
    seq.append_token(5)  # len 5, rem 1 → needs a block but none free
    assert not bm.can_append(seq)


def test_decode_grown_block_is_prefix_reusable():
    bm = BlockManager(num_blocks=8, block_size=BS)
    seq = mkseq([1, 2, 3])
    bm.allocate(seq)
    bm.may_append(seq)
    seq.append_token(4)
    bm.may_append(seq)  # block [1,2,3,4] full, last KV row still pending
    seq.append_token(5)
    bm.may_append(seq)  # pos 3's KV committed by the window above → hashed
    bm.deallocate(seq)

    fresh = mkseq([1, 2, 3, 4, 9])
    bm.allocate(fresh)
    assert fresh.num_cached_tokens == BS  # hit on the decode-grown block


def test_decode_block_not_hashed_until_kv_committed():
    """A block whose final token's KV row hasn't been written (it's the
    next window's input, which may never dispatch) must not become a
    prefix-cache target — the hitter would attend a missing row."""
    bm = BlockManager(num_blocks=8, block_size=BS)
    seq = mkseq([1, 2, 3])
    bm.allocate(seq)
    bm.may_append(seq)
    seq.append_token(4)
    bm.may_append(seq)
    bm.deallocate(seq)  # aborted before the next window ran

    fresh = mkseq([1, 2, 3, 4, 9])
    bm.allocate(fresh)
    assert fresh.num_cached_tokens == 0  # no phantom hit


def test_budget_undo_does_not_poison_prefix_cache():
    """undo_allocate (scheduler token-budget overflow) must wipe the hash
    identity of freshly-created blocks — their KV was never computed, so a
    later same-prefix allocate must miss, not hit garbage."""
    bm = BlockManager(num_blocks=8, block_size=BS)
    seq = mkseq(range(8))  # 2 full blocks, hashes registered at allocate
    bm.allocate(seq)
    bm.undo_allocate(seq)  # prefill never ran

    again = mkseq(range(8))
    bm.allocate(again)
    assert again.num_cached_tokens == 0  # would have been 4 if poisoned
    assert bm.num_free_blocks() == 6


def test_undo_allocate_keeps_shared_block_identity():
    """Blocks a rolled-back sequence merely HIT (still referenced by a live
    sequence) keep their hash — their KV is real."""
    bm = BlockManager(num_blocks=8, block_size=BS)
    live = mkseq(range(8))
    bm.allocate(live)  # owns both blocks; prefill assumed to run

    loser = mkseq(list(range(8)) + [99])  # hits both + 1 fresh partial
    bm.allocate(loser)
    assert loser.num_cached_tokens == 8
    bm.undo_allocate(loser)

    for bid in live.block_table:
        assert bm.blocks[bid].hash is not None
    third = mkseq(range(8))
    bm.allocate(third)
    assert third.num_cached_tokens == 4  # capped to block boundary


def test_allocate_exhaustion_rollback_wipes_fresh_hashes():
    bm = BlockManager(num_blocks=2, block_size=BS)
    big = mkseq(range(12))  # needs 3 blocks > 2 available
    with pytest.raises(RuntimeError):
        bm.allocate(big)
    assert bm.num_free_blocks() == 2
    # The two blocks it DID create were hashed at creation; the rollback
    # must have wiped them.
    small = mkseq(range(8))
    bm.allocate(small)
    assert small.num_cached_tokens == 0


def test_stats_and_cache_efficiency():
    bm = BlockManager(num_blocks=8, block_size=BS)
    a = mkseq(range(8))
    bm.allocate(a)
    b = mkseq(range(8))
    bm.allocate(b)
    st = bm.get_stats()
    assert st.total_blocks == 8
    assert st.used_blocks == 2
    assert st.free_blocks == 6
    assert st.cache_hits == 2
    assert 0.0 < st.cache_efficiency <= 1.0
    assert st.utilization == 2 / 8


def test_prefix_caching_disabled():
    bm = BlockManager(num_blocks=8, block_size=BS, enable_prefix_caching=False)
    a = mkseq(range(8))
    bm.allocate(a)
    b = mkseq(range(8))
    bm.allocate(b)
    assert b.num_cached_tokens == 0
    assert set(b.block_table).isdisjoint(set(a.block_table))
