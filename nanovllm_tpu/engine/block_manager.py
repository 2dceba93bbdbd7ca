"""Paged KV-cache block manager with hash-chained prefix caching.

Capability parity with the reference BlockManager
(src/engine/block_manager.rs:12-361): refcounted blocks, xxh64 chained
content hashing (a block's hash encodes its entire prefix), prefix-cache
reuse with a content-verification collision guard, the decode append
protocol, and utilization/efficiency stats.

This is pure host-side control plane: it never touches device memory. The
block ids it hands out index into the per-layer HBM KV-cache arrays
`[num_blocks, block_size, kv_heads, head_dim]` consumed by the paged
attention kernels (see ops/).

Improvements over the reference:
- Free blocks keep their hash registration, so a freed-but-unrecycled block
  can be re-activated on a later prefix hit (the reference hints at this,
  block_manager.rs:189-197); the mapping is only dropped when the block is
  recycled for new content. Free-list order is FIFO, so recycling is
  oldest-freed-first (an LRU over cached-but-free blocks).
- If a prompt is entirely prefix-cached, the final token is forced to
  recompute so prefill always has >= 1 query token to produce logits from.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass
from typing import Dict, List, Optional

import xxhash

from nanovllm_tpu.engine.sequence import Sequence


def compute_hash(token_ids: List[int], prefix_hash: int = 0) -> int:
    """Chained content hash: xxh64 over prefix_hash (8 LE bytes) ++ tokens
    (8 LE bytes each), so identity encodes the whole prefix
    (reference: block_manager.rs:109-123)."""
    h = xxhash.xxh64()
    h.update(prefix_hash.to_bytes(8, "little", signed=False))
    for t in token_ids:
        h.update(int(t).to_bytes(8, "little", signed=True))
    return h.intdigest()


class Block:
    """One KV-cache block (reference: block_manager.rs:12-65)."""

    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.hash: Optional[int] = None
        self.token_ids: List[int] = []

    def reset(self) -> None:
        self.ref_count = 0
        self.hash = None
        self.token_ids = []


@dataclass
class BlockManagerStats:
    """Reference: block_manager.rs:307-361."""

    total_blocks: int
    free_blocks: int
    used_blocks: int
    cached_blocks: int
    cache_hits: int
    cache_queries: int

    @property
    def utilization(self) -> float:
        return self.used_blocks / self.total_blocks if self.total_blocks else 0.0

    @property
    def cache_efficiency(self) -> float:
        return self.cache_hits / self.cache_queries if self.cache_queries else 0.0


class BlockManager:
    def __init__(self, num_blocks: int, block_size: int, enable_prefix_caching: bool = True):
        if num_blocks <= 0:
            raise ValueError("num_blocks must be positive")
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.enable_prefix_caching = enable_prefix_caching
        self.blocks: List[Block] = [Block(i) for i in range(num_blocks)]
        # hash -> block_id for full, hashed blocks (incl. free-but-cached).
        self.hash_to_block_id: Dict[int, int] = {}
        # Free list as an OrderedDict for O(1) removal + FIFO recycling.
        self.free_block_ids: "OrderedDict[int, None]" = OrderedDict(
            (i, None) for i in range(num_blocks)
        )
        self.used_block_ids: set = set()
        self.cache_hits = 0
        self.cache_queries = 0

    # ------------------------------------------------------------------
    # Internals
    # ------------------------------------------------------------------
    def num_free_blocks(self) -> int:
        return len(self.free_block_ids)

    def _recycle_block(self) -> Block:
        """Pop the oldest free block and wipe its cached identity."""
        block_id, _ = self.free_block_ids.popitem(last=False)
        block = self.blocks[block_id]
        if block.hash is not None and self.hash_to_block_id.get(block.hash) == block_id:
            del self.hash_to_block_id[block.hash]
        block.reset()
        block.ref_count = 1
        self.used_block_ids.add(block_id)
        return block

    def _reactivate_block(self, block_id: int) -> Block:
        """Bring a free-but-cached block back into use on a prefix hit
        (reference: block_manager.rs:189-197)."""
        del self.free_block_ids[block_id]
        block = self.blocks[block_id]
        block.ref_count = 1
        self.used_block_ids.add(block_id)
        return block

    def _free_block(self, block_id: int) -> None:
        block = self.blocks[block_id]
        assert block.ref_count == 0
        self.used_block_ids.discard(block_id)
        # Keep hash/token_ids: block stays prefix-cache reusable until recycled.
        self.free_block_ids[block_id] = None

    def _wipe_identity(self, block_id: int) -> None:
        """Drop a block's prefix-cache identity (hash registration + token
        contents). Used when freeing blocks whose KV was never computed —
        keeping the hash would let a later same-prefix allocate cache-hit
        uninitialized KV (silently wrong output)."""
        block = self.blocks[block_id]
        if block.hash is not None and self.hash_to_block_id.get(block.hash) == block_id:
            del self.hash_to_block_id[block.hash]
        block.hash = None
        block.token_ids = []

    # ------------------------------------------------------------------
    # Prefill allocation (reference: block_manager.rs:152-219)
    # ------------------------------------------------------------------
    def can_allocate(self, seq: Sequence) -> bool:
        """Conservative: assumes no prefix hits."""
        return self.num_free_blocks() >= seq.num_blocks()

    def allocate(self, seq: Sequence) -> None:
        """Walk the sequence's blocks; reuse on chained-hash hit (with content
        verification), fresh-allocate after the first miss. Sets
        seq.num_cached_tokens and fills seq.block_table."""
        if seq.block_table:
            raise RuntimeError(f"sequence {seq.seq_id} already has allocated blocks")
        prefix_hash = 0
        cache_miss = False
        seq.prefix_hit_block_ids = set()
        num_blocks = seq.num_blocks()
        for idx in range(num_blocks):
            tokens = seq.get_block_tokens(idx)
            is_full = len(tokens) == self.block_size
            block_hash: Optional[int] = None
            if is_full:
                prefix_hash = compute_hash(tokens, prefix_hash)
                block_hash = prefix_hash

            hit_block: Optional[Block] = None
            if (
                self.enable_prefix_caching
                and is_full
                and not cache_miss
            ):
                self.cache_queries += 1
                cand_id = self.hash_to_block_id.get(block_hash)
                if cand_id is not None and self.blocks[cand_id].token_ids == tokens:
                    # Collision guard passed (reference: block_manager.rs:185).
                    self.cache_hits += 1
                    if cand_id in self.free_block_ids:
                        hit_block = self._reactivate_block(cand_id)
                    else:
                        blk = self.blocks[cand_id]
                        blk.ref_count += 1
                        hit_block = blk
                    seq.num_cached_tokens += self.block_size
                else:
                    cache_miss = True
            elif is_full:
                cache_miss = True

            if hit_block is not None:
                seq.block_table.append(hit_block.block_id)
                seq.prefix_hit_block_ids.add(hit_block.block_id)
                continue

            if not self.free_block_ids:
                # Roll back everything allocated so far. Freshly-created
                # blocks never had their KV computed (prefill didn't run),
                # so their hash identity must be wiped or a later
                # same-prefix allocate would cache-hit poisoned blocks.
                allocated = list(seq.block_table)
                seq.block_table = []
                seq.num_cached_tokens = 0
                for bid in reversed(allocated):
                    blk = self.blocks[bid]
                    blk.ref_count -= 1
                    if blk.ref_count == 0:
                        # Prefix-cache HITS hold real KV (they were
                        # free-but-cached when reused) — keep their identity
                        # so the cache entry survives the rollback.
                        if bid not in seq.prefix_hit_block_ids:
                            self._wipe_identity(bid)
                        self._free_block(bid)
                seq.prefix_hit_block_ids = set()
                raise RuntimeError("out of KV-cache blocks during allocate")

            block = self._recycle_block()
            block.token_ids = list(tokens)
            if is_full and self.enable_prefix_caching:
                block.hash = block_hash
                self.hash_to_block_id[block_hash] = block.block_id
            seq.block_table.append(block.block_id)

        # Never allow a fully-cached prompt: force >= 1 query token. The cap
        # lands on a block boundary (recompute the whole final block) so
        # num_cached_tokens is ALWAYS block-aligned — the bulk prefill
        # KV-commit kernel relies on whole-block writes.
        if seq.num_cached_tokens >= len(seq):
            seq.num_cached_tokens = (len(seq) - 1) // self.block_size * self.block_size

    # ------------------------------------------------------------------
    # Deallocation (reference: block_manager.rs:240-252)
    # ------------------------------------------------------------------
    def deallocate(self, seq: Sequence) -> None:
        for bid in reversed(seq.block_table):
            if bid < 0:
                continue  # sliding-window eviction hole
            block = self.blocks[bid]
            block.ref_count -= 1
            if block.ref_count == 0:
                self._free_block(bid)
        seq.block_table = []
        seq.num_cached_tokens = 0

    def defer_identities_beyond(self, seq: Sequence, pos: int) -> None:
        """Chunked prefill: blocks covering positions >= pos have no
        committed KV until a later chunk lands; drop their optimistic
        allocate-time identities so no other request cache-hits garbage.
        Re-registered chunk by chunk via register_decode_progress(seq,
        n_tokens=processed+1). Prefix-cache HIT blocks keep theirs (their
        KV is real)."""
        for idx in range(pos // self.block_size, len(seq.block_table)):
            bid = seq.block_table[idx]
            if bid >= 0 and bid not in seq.prefix_hit_block_ids:
                self._wipe_identity(bid)

    def release_below_window(self, seq: Sequence, keep_from_pos: int) -> int:
        """Sliding-window rolling buffer: free whole blocks covering only
        positions < keep_from_pos — with local attention those keys can
        never be attended again (window edges only move up), so per-
        sequence KV stays bounded at ~window size regardless of generation
        length (the capability Mistral's rolling-buffer cache provides).
        Freed entries become -1 holes so the block table stays positionally
        aligned (the decode kernels skip below-window blocks and never read
        the holes); freed blocks keep their hash identity — their KV is
        real — and stay prefix-cache reusable until recycled. Returns the
        number of blocks freed."""
        last = min(len(seq.block_table), keep_from_pos // self.block_size)
        nfree = 0
        for idx in range(last):
            bid = seq.block_table[idx]
            if bid < 0:
                continue
            block = self.blocks[bid]
            block.ref_count -= 1
            if block.ref_count == 0:
                self._free_block(bid)
            seq.block_table[idx] = -1
            seq.prefix_hit_block_ids.discard(bid)
            nfree += 1
        return nfree

    def undo_allocate(self, seq: Sequence) -> None:
        """Deallocate a sequence whose prefill never ran (e.g. the scheduler
        admitted it past the block check but it overflowed the token budget).
        Unlike `deallocate`, blocks dropping to ref 0 lose their hash
        identity: their KV was never computed, so a later same-prefix
        allocate must NOT cache-hit them (ADVICE r1 high: silently wrong
        output). Prefix-cache HIT blocks keep their identity even at ref 0:
        their KV is real (they were free-but-cached when reused), and wiping
        them would evict valid cache entries on every token-budget undo
        (ADVICE r2 low)."""
        for bid in reversed(seq.block_table):
            if bid < 0:
                continue
            block = self.blocks[bid]
            block.ref_count -= 1
            if block.ref_count == 0:
                if bid not in seq.prefix_hit_block_ids:
                    self._wipe_identity(bid)
                self._free_block(bid)
        seq.block_table = []
        seq.num_cached_tokens = 0
        seq.prefix_hit_block_ids = set()

    # ------------------------------------------------------------------
    # Decode append protocol (reference: block_manager.rs:255-304),
    # generalized to a K-token decode WINDOW: the next `window` decode
    # substeps write KV at positions len-1 .. len+window-2, so every block
    # covering those positions must be reserved before dispatch (the device
    # loop cannot allocate mid-window). window=1 reproduces the reference's
    # single-step protocol exactly.
    # ------------------------------------------------------------------
    def blocks_needed(self, seq: Sequence, window: int = 1) -> int:
        """New blocks required to cover positions through
        total_len+window-2 (total_len counts speculative in-flight tokens
        of pending async windows, which already occupy reserved slots)."""
        highest_pos = seq.total_len() + window - 2
        total = highest_pos // self.block_size + 1
        return max(0, total - len(seq.block_table))

    def can_append(self, seq: Sequence, window: int = 1) -> bool:
        return self.num_free_blocks() >= self.blocks_needed(seq, window)

    def may_append(self, seq: Sequence, window: int = 1) -> None:
        """Reserve blocks for the window and sync hash state with the
        sequence's current tokens."""
        for _ in range(self.blocks_needed(seq, window)):
            block = self._recycle_block()
            block.token_ids = []
            seq.block_table.append(block.block_id)
        self.register_decode_progress(seq)

    def register_decode_progress(self, seq: Sequence,
                                 n_tokens: Optional[int] = None) -> None:
        """Bring block contents/hashes in sync with seq.token_ids: full
        blocks get their chained hash registered (becoming prefix-cache
        reusable, reference: block_manager.rs:283-304), the trailing partial
        block tracks its tokens for collision verification. Shared blocks
        (ref_count > 1) were hashed when first filled and are skipped."""
        # The final appended token of a window is only the NEXT window's
        # input — its KV isn't written and its block may not be reserved yet,
        # so sync no further than the current table. n_tokens overrides the
        # committed-token horizon (chunked prefill passes processed+1 so
        # blocks fully below the chunk end become hashable).
        if n_tokens is None:
            n_tokens = len(seq)
        nb = min(-(-n_tokens // self.block_size), len(seq.block_table))
        if nb == 0:
            return
        # Only the tail can have changed since the last sync; scan back to
        # the last block that already has a hash (or is shared).
        start = nb - 1
        while start > 0:
            prev_id = seq.block_table[start - 1]
            if prev_id < 0:
                break  # eviction hole: chain boundary
            blk = self.blocks[prev_id]
            if blk.hash is not None or blk.ref_count > 1:
                break
            start -= 1
        for idx in range(start, nb):
            bid = seq.block_table[idx]
            if bid < 0:
                continue  # sliding-window eviction hole
            block = self.blocks[bid]
            if block.ref_count != 1 or block.hash is not None:
                continue
            tokens = seq.get_block_tokens(idx)
            block.token_ids = list(tokens)
            # Only hash blocks whose KV is fully committed on device. The
            # final token of a decode window is the NEXT window's input —
            # its KV row is written by that window's first substep, which
            # may never dispatch (preempt/abort/stop). Hashing it would let
            # a prefix hit attend a missing row (ADVICE r1 medium), so a
            # block is hashable only when covered by the first len(seq)-1
            # tokens.
            if (
                len(tokens) == self.block_size
                and self.enable_prefix_caching
                and (idx + 1) * self.block_size < n_tokens
            ):
                # A block's identity must chain from a HASHED predecessor:
                # registering with prefix 0 would alias a mid-sequence
                # block to a position-0 chain start (a later same-token
                # prompt would cache-hit KV computed at the wrong RoPE
                # positions). prev can legitimately lack a hash after a
                # sliding-window eviction hole (or when the hole removed
                # the block whose hash the chain needed) — skip
                # registration for the whole broken tail.
                if idx > 0:
                    prev_id = seq.block_table[idx - 1]
                    if prev_id < 0:
                        continue
                    prev = self.blocks[prev_id]
                    if prev.hash is None:
                        continue
                    prefix_hash = prev.hash
                else:
                    prefix_hash = 0
                block.hash = compute_hash(tokens, prefix_hash)
                self.hash_to_block_id[block.hash] = block.block_id

    # ------------------------------------------------------------------
    # Stats (reference: block_manager.rs:307-361)
    # ------------------------------------------------------------------
    def get_stats(self) -> BlockManagerStats:
        cached = sum(1 for b in self.blocks if b.hash is not None)
        return BlockManagerStats(
            total_blocks=self.num_blocks,
            free_blocks=self.num_free_blocks(),
            used_blocks=len(self.used_block_ids),
            cached_blocks=cached,
            cache_hits=self.cache_hits,
            cache_queries=self.cache_queries,
        )
