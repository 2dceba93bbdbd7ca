"""Attention batch metadata — an explicit pytree argument to the jitted step.

Replaces the reference's global `RwLock<Context>` side-channel
(reference: src/utils/context.rs:11-223) with idiomatic JAX: all batch
metadata is data, threaded through the step function, so the step stays a
pure function of (params, caches, batch).

Shape discipline: every field has a bucketed static shape (T = flat token
bucket, S = sequence bucket, MAXBLK = block-table width bucket, Q = max
query-per-seq bucket); padding conventions are chosen so padded lanes are
dropped by scatter `mode="drop"` or masked by position comparisons, never
branched on.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AttentionMetadata:
    """All arrays are int32.

    T-dim (flat tokens):
      slot_mapping: KV-cache write slot per token, ``block_id*block_size +
        offset`` (reference fixes model_runner.rs:240-243's simplified slot
        math); -1 on padding → dropped by the scatter.
      token_seq / token_qcol: coordinates of each flat token inside the
        padded [S, Q] query grid (0 on padding).
      positions: absolute position of each token in its sequence (0 on pad).

    S-dim (sequences):
      block_tables: [S, MAXBLK] KV block ids, -1 padded.
      context_lens: total KV length per sequence *including* tokens written
        this step; 0 for padded rows.
      logits_idx: flat token index of each sequence's last query token (the
        position whose logits are sampled); 0 for padded rows.

    [S, Q] query grid (used by the gather-based reference attention):
      q_gather: flat token index of each query slot (0 on pad).
      q_positions: absolute position of each query slot (-1 on pad, which
        makes every key fail the causal test on padded slots).
    """

    slot_mapping: jax.Array
    positions: jax.Array
    token_seq: jax.Array
    token_qcol: jax.Array
    block_tables: jax.Array
    context_lens: jax.Array
    logits_idx: jax.Array
    q_gather: jax.Array
    q_positions: jax.Array


def build_metadata(
    seqs_meta,
    block_size: int,
    T: int,
    S: int,
    max_blocks: int,
    Q: int,
) -> tuple:
    """Build (token_ids [T], AttentionMetadata) as numpy from host-side
    sequence state.

    `seqs_meta` is a list of dicts with keys:
      token_ids: full token list of the sequence
      num_cached: tokens whose KV already exists (prefix cache / decode ctx)
      block_table: list of block ids

    The query tokens of each sequence are token_ids[num_cached:]; in decode
    that is exactly the last token. Returns the flat input token array and
    the metadata. Raises if the batch exceeds any bucket.
    """
    tokens = np.zeros((T,), np.int32)
    slot_mapping = np.full((T,), -1, np.int32)
    positions = np.zeros((T,), np.int32)
    token_seq = np.zeros((T,), np.int32)
    token_qcol = np.zeros((T,), np.int32)
    block_tables = np.full((S, max_blocks), -1, np.int32)
    context_lens = np.zeros((S,), np.int32)
    logits_idx = np.zeros((S,), np.int32)
    q_gather = np.zeros((S, Q), np.int32)
    q_positions = np.full((S, Q), -1, np.int32)

    if len(seqs_meta) > S:
        raise ValueError(f"batch of {len(seqs_meta)} seqs exceeds S bucket {S}")

    t = 0
    for s, sm in enumerate(seqs_meta):
        ids = sm["token_ids"]
        num_cached = sm["num_cached"]
        table = sm["block_table"]
        q_len = len(ids) - num_cached
        if q_len <= 0:
            raise ValueError("sequence has no query tokens")
        if q_len > Q:
            raise ValueError(f"q_len {q_len} exceeds Q bucket {Q}")
        if t + q_len > T:
            raise ValueError(f"token count exceeds T bucket {T}")
        if len(table) > max_blocks:
            raise ValueError(f"block table {len(table)} exceeds bucket {max_blocks}")

        block_tables[s, : len(table)] = table
        context_lens[s] = len(ids)
        for qi in range(q_len):
            pos = num_cached + qi
            tokens[t] = ids[pos]
            positions[t] = pos
            slot_mapping[t] = table[pos // block_size] * block_size + pos % block_size
            token_seq[t] = s
            token_qcol[t] = qi
            q_gather[s, qi] = t
            q_positions[s, qi] = pos
            t += 1
        logits_idx[s] = t - 1

    meta = AttentionMetadata(
        slot_mapping=slot_mapping,
        positions=positions,
        token_seq=token_seq,
        token_qcol=token_qcol,
        block_tables=block_tables,
        context_lens=context_lens,
        logits_idx=logits_idx,
        q_gather=q_gather,
        q_positions=q_positions,
    )
    return tokens, meta
