"""Paged KV-cache block manager with hash-chained prefix caching.

Parity: reference ``nanovllm/engine/block_manager.py``:
- ref-counted blocks with a free deque / used set / hash->block map,
- xxh64 hash chain over (previous block hash, block token ids)
  (block_manager.py:35-41),
- prefix-cache hits counted over *full* blocks only, with a token-id
  comparison guarding against hash collisions (block_manager.py:58-73),
- resurrection of free-but-unreset cached blocks (block_manager.py:83-88),
- a new block is needed for decode only when the sequence length crosses a
  block boundary (block_manager.py:103-108).

This is pure host-side bookkeeping; the device sees only per-step int32 block
tables built from ``Sequence.block_table``.
"""

from collections import deque

import numpy as np
import xxhash

from nanovllm_tpu.engine.sequence import Sequence


class Block:
    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.hash = -1
        self.token_ids: list[int] = []

    def update(self, h: int, token_ids: list[int]):
        self.hash = h
        self.token_ids = token_ids

    def reset(self):
        self.ref_count = 1
        self.hash = -1
        self.token_ids = []


def compute_hash(token_ids: list[int], prefix_hash: int = -1) -> int:
    """Chained block hash: xxh64 over (prev hash as 8-byte LE, token bytes)."""
    h = xxhash.xxh64()
    if prefix_hash != -1:
        h.update(prefix_hash.to_bytes(8, "little", signed=False))
    h.update(np.asarray(token_ids, dtype=np.int64).tobytes())
    return h.intdigest()


class BlockManager:

    def __init__(self, num_blocks: int, block_size: int):
        assert num_blocks > 0
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.blocks = [Block(i) for i in range(num_blocks)]
        self.free_block_ids: deque[int] = deque(range(num_blocks))
        self.used_block_ids: set[int] = set()
        self.hash_to_block_id: dict[int, int] = {}
        # Prefix-cache observability: prompt tokens served from cached
        # blocks vs freshly prefilled (reported via EngineMetrics//metrics).
        self.cached_prompt_tokens = 0
        self.new_prompt_tokens = 0

    # ------------------------------------------------------------------ util

    def _allocate_block(self, block_id: int) -> Block:
        block = self.blocks[block_id]
        assert block.ref_count == 0
        # Evict a stale prefix-cache mapping that pointed at this block.
        if block.hash != -1 and self.hash_to_block_id.get(block.hash) == block_id:
            del self.hash_to_block_id[block.hash]
        block.reset()
        self.free_block_ids.remove(block_id)
        self.used_block_ids.add(block_id)
        return block

    def _deallocate_block(self, block_id: int):
        block = self.blocks[block_id]
        assert block.ref_count == 0
        self.used_block_ids.remove(block_id)
        # Keep hash/token_ids: the block stays resurrectable from the free
        # pool until its memory is actually reused.
        self.free_block_ids.append(block_id)

    @property
    def num_free_blocks(self) -> int:
        return len(self.free_block_ids)

    # ------------------------------------------------------------- prefill

    def _match_cached_blocks(self, seq: Sequence) -> tuple[int, list[int]]:
        """Walk the sequence's *full* blocks (all but the last block) down the
        hash chain; return (#cached blocks, their block ids)."""
        if getattr(seq, "uses_penalties", False):
            # Penalized sequences bypass prefix-cache REUSE: their prompt
            # tokens must all be embedded so the prefill step can scatter them
            # into the on-device penalty counters (cached blocks are never
            # re-embedded). Their own full blocks still register for others.
            return 0, []
        cached_ids = []
        prefix_hash = -1
        for i in range(seq.num_blocks - 1):
            tokens = seq.block(i)
            prefix_hash = compute_hash(tokens, prefix_hash)
            block_id = self.hash_to_block_id.get(prefix_hash, -1)
            if block_id == -1 or self.blocks[block_id].token_ids != tokens:
                break  # miss, or hash collision caught by token comparison
            cached_ids.append(block_id)
        return len(cached_ids), cached_ids

    def can_allocate(self, seq: Sequence) -> int:
        """Return the number of prefix-cached blocks for this sequence, or -1
        if the free pool cannot cover the allocation."""
        num_cached, cached_ids = self._match_cached_blocks(seq)
        # Every needed block comes from the free pool except cached blocks
        # that are currently referenced (in use by another sequence).
        from_free = seq.num_blocks - num_cached
        from_free += sum(1 for bid in cached_ids if self.blocks[bid].ref_count == 0)
        if from_free > len(self.free_block_ids):
            return -1
        return num_cached

    def allocate(self, seq: Sequence):
        """Allocate blocks for the whole sequence up-front; reuse prefix-cache
        hits (bumping ref counts, resurrecting free blocks) and set
        ``seq.num_cached_tokens`` to the cached-token count."""
        assert not seq.block_table
        num_cached, cached_ids = self._match_cached_blocks(seq)
        for block_id in cached_ids:
            block = self.blocks[block_id]
            if block.ref_count == 0:
                # Resurrect: the block sat in the free pool with its KV intact.
                self.free_block_ids.remove(block_id)
                self.used_block_ids.add(block_id)
            block.ref_count += 1
            seq.block_table.append(block_id)
        for _ in range(seq.num_blocks - num_cached):
            block_id = self.free_block_ids[0]
            self._allocate_block(block_id)
            seq.block_table.append(block_id)
        seq.num_cached_tokens = num_cached * self.block_size
        seq.num_hashed_blocks = num_cached
        self.cached_prompt_tokens += seq.num_cached_tokens
        self.new_prompt_tokens += seq.num_prompt_tokens - min(
            seq.num_cached_tokens, seq.num_prompt_tokens
        )

    def deallocate(self, seq: Sequence):
        # Entries below the eviction watermark were already released by
        # evict_prefix (sliding-window rolling eviction) — skip them.
        for block_id in reversed(seq.block_table[seq.num_evicted_blocks:]):
            block = self.blocks[block_id]
            assert block.ref_count > 0
            block.ref_count -= 1
            if block.ref_count == 0:
                self._deallocate_block(block_id)
        seq.block_table.clear()
        seq.num_cached_tokens = 0
        seq.num_hashed_blocks = 0
        seq.num_evicted_blocks = 0

    def match_prefix(self, seq: Sequence) -> int:
        """Prefix-cache hit count (full blocks) without any capacity check —
        the sliding-window lazy-allocation path budgets per chunk instead of
        per whole prompt (see extend_for_window)."""
        return self._match_cached_blocks(seq)[0]

    def extend_for_window(self, seq: Sequence, upto: int) -> bool:
        """Window-lazy allocation: reserve only the pages the CURRENT chunk
        needs instead of the whole prompt. First call claims every
        prefix-cache hit (pinning their KV — an unclaimed hit could be
        recycled between chunks) and grows the fresh tail to ``upto`` pages;
        later calls just extend the tail. Returns False (state unchanged) if
        the free pool cannot cover the extension.

        Rolling eviction releases leading blocks between chunks, so a prompt
        of ANY length admits with ~(chunk + window) blocks — without this, a
        preempted sequence whose total length exceeds the pool could never
        re-admit (its full table no longer fits) and would wedge the queue.
        """
        if not seq.block_table:
            num_cached, cached_ids = self._match_cached_blocks(seq)
            fresh = max(0, upto - num_cached)
            from_free = fresh + sum(
                1 for bid in cached_ids if self.blocks[bid].ref_count == 0
            )
            if from_free > len(self.free_block_ids):
                return False
            for block_id in cached_ids:
                block = self.blocks[block_id]
                if block.ref_count == 0:
                    self.free_block_ids.remove(block_id)
                    self.used_block_ids.add(block_id)
                block.ref_count += 1
                seq.block_table.append(block_id)
            for _ in range(fresh):
                block_id = self.free_block_ids[0]
                self._allocate_block(block_id)
                seq.block_table.append(block_id)
            seq.num_cached_tokens = num_cached * self.block_size
            seq.num_hashed_blocks = num_cached
            self.cached_prompt_tokens += seq.num_cached_tokens
            self.new_prompt_tokens += seq.num_prompt_tokens - min(
                seq.num_cached_tokens, seq.num_prompt_tokens
            )
            return True
        fresh = upto - len(seq.block_table)
        if fresh <= 0:
            return True
        if fresh > len(self.free_block_ids):
            return False
        for _ in range(fresh):
            block_id = self.free_block_ids[0]
            self._allocate_block(block_id)
            seq.block_table.append(block_id)
        return True

    # ----------------------------------------------- sliding-window eviction

    def evict_prefix(self, seq: Sequence, upto: int):
        """Release the sequence's leading blocks [num_evicted_blocks, upto):
        a sliding-window model can never attend into them again (the decode
        worklist and the kernels' per-lane need-predicate skip pages below
        (kv_len-1-window)//block — see ops/pallas/ragged_attention.lane_rows).
        The table entries stay in place as stale ids (page indexing is
        positional); shared prefix blocks just drop one reference and remain
        resurrectable for other sequences."""
        for i in range(seq.num_evicted_blocks, upto):
            block = self.blocks[seq.block_table[i]]
            assert block.ref_count > 0
            block.ref_count -= 1
            if block.ref_count == 0:
                self._deallocate_block(block.block_id)
        seq.num_evicted_blocks = max(seq.num_evicted_blocks, upto)

    # -------------------------------------------------------------- decode

    def can_append(self, seq: Sequence) -> bool:
        # A fresh block is needed only when appending the next position opens
        # a new block (length crossed a block boundary).
        need_new = len(seq) % self.block_size == 1
        return len(self.free_block_ids) >= int(need_new)

    def may_append(self, seq: Sequence):
        if len(seq) % self.block_size == 1:
            block_id = self.free_block_ids[0]
            self._allocate_block(block_id)
            seq.block_table.append(block_id)

    def can_extend_to(self, seq: Sequence, num_blocks: int) -> bool:
        """Speculative decoding reserves blocks for up to K+1 appends per
        step (positions are device-resident; the host covers the pessimistic
        frontier)."""
        return len(self.free_block_ids) >= num_blocks - len(seq.block_table)

    def extend_to(self, seq: Sequence, num_blocks: int):
        for _ in range(num_blocks - len(seq.block_table)):
            block_id = self.free_block_ids[0]
            self._allocate_block(block_id)
            seq.block_table.append(block_id)

    # -------------------------------------------------- prefix registration

    def hash_new_full_blocks(self, seq: Sequence):
        """Register hashes for blocks that became fully cached this step,
        chaining from the previous block's hash. Only fully *valued* blocks
        are hashable — completion tokens may still be placeholders while
        their sampled values sit on-device (async pipeline)."""
        if seq.num_evicted_blocks:
            # Rolling eviction in progress: the chain's earlier blocks may be
            # freed/reused (their hash fields reset), so chained hashes can no
            # longer be extended reliably. Registrations stop; existing ones
            # stay valid (lookups re-derive chains from token ids and the
            # token-comparison guard rejects stale matches).
            return
        num_full_cached = min(
            seq.num_cached_tokens, seq.num_valued_tokens
        ) // self.block_size
        if seq.num_hashed_blocks >= num_full_cached:
            return
        prev = seq.num_hashed_blocks
        prefix_hash = self.blocks[seq.block_table[prev - 1]].hash if prev > 0 else -1
        for i in range(prev, num_full_cached):
            tokens = seq.block(i)
            prefix_hash = compute_hash(tokens, prefix_hash)
            block = self.blocks[seq.block_table[i]]
            block.update(prefix_hash, tokens)
            self.hash_to_block_id[prefix_hash] = block.block_id
        seq.num_hashed_blocks = num_full_cached
