"""Unit tests for the paged KV block manager and prefix cache (pure CPU)."""

from nanovllm_tpu.engine.block_manager import BlockManager, compute_hash
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams

BS = 4


def make_seq(tokens):
    Sequence.block_size = BS
    return Sequence(tokens, SamplingParams(max_tokens=8))


def test_hash_chain_deterministic():
    h1 = compute_hash([1, 2, 3, 4])
    h2 = compute_hash([1, 2, 3, 4])
    assert h1 == h2
    assert compute_hash([1, 2, 3, 4], h1) != h1
    assert compute_hash([1, 2, 3, 5]) != h1


def test_allocate_and_deallocate():
    bm = BlockManager(8, BS)
    seq = make_seq(list(range(10)))  # 3 blocks
    assert bm.can_allocate(seq) == 0
    bm.allocate(seq)
    assert len(seq.block_table) == 3
    assert bm.num_free_blocks == 5
    assert seq.num_cached_tokens == 0
    bm.deallocate(seq)
    assert bm.num_free_blocks == 8
    assert seq.block_table == []


def test_prefix_cache_hit_and_resurrection():
    bm = BlockManager(8, BS)
    seq1 = make_seq(list(range(10)))
    bm.allocate(seq1)
    # Simulate the engine caching the full prompt, then hashing full blocks.
    seq1.num_cached_tokens = seq1.num_tokens
    bm.hash_new_full_blocks(seq1)
    assert seq1.num_hashed_blocks == 2  # 2 full blocks of 4; last (2 tokens) partial

    # A second sequence sharing the first 8 tokens hits 2 cached blocks.
    seq2 = make_seq(list(range(8)) + [99, 98])
    assert bm.can_allocate(seq2) == 2
    bm.allocate(seq2)
    assert seq2.num_cached_tokens == 8
    assert seq2.block_table[:2] == seq1.block_table[:2]
    assert bm.blocks[seq1.block_table[0]].ref_count == 2

    # Free both; blocks return to the pool but keep their hash (resurrectable).
    bm.deallocate(seq1)
    bm.deallocate(seq2)
    assert bm.num_free_blocks == 8
    seq3 = make_seq(list(range(10)))
    assert bm.can_allocate(seq3) == 2
    bm.allocate(seq3)
    assert seq3.num_cached_tokens == 8


def test_hash_collision_guard():
    bm = BlockManager(8, BS)
    seq1 = make_seq(list(range(8)))
    bm.allocate(seq1)
    seq1.num_cached_tokens = 8
    bm.hash_new_full_blocks(seq1)
    # Forge a colliding hash entry with different tokens: must not match.
    block = bm.blocks[seq1.block_table[0]]
    block.token_ids = [7, 7, 7, 7]
    seq2 = make_seq(list(range(8)))
    assert bm.can_allocate(seq2) == 0


def test_can_allocate_pool_exhaustion():
    bm = BlockManager(2, BS)
    seq = make_seq(list(range(12)))  # needs 3 blocks
    assert bm.can_allocate(seq) == -1


def test_decode_append_needs_block_only_on_boundary():
    bm = BlockManager(4, BS)
    seq = make_seq(list(range(4)))  # exactly 1 full block
    bm.allocate(seq)
    assert len(seq.block_table) == 1
    seq.append_token(5)  # len 5 -> 5 % 4 == 1: new block needed
    assert bm.can_append(seq)
    bm.may_append(seq)
    assert len(seq.block_table) == 2
    seq.append_token(6)  # len 6: no new block
    free_before = bm.num_free_blocks
    bm.may_append(seq)
    assert bm.num_free_blocks == free_before


def test_stale_hash_eviction_on_reuse():
    bm = BlockManager(2, BS)
    seq1 = make_seq(list(range(4)))
    bm.allocate(seq1)
    seq1.num_cached_tokens = 4
    bm.hash_new_full_blocks(seq1)
    h = bm.blocks[seq1.block_table[0]].hash
    assert h in bm.hash_to_block_id
    bm.deallocate(seq1)
    # Allocate two fresh sequences exhausting the pool; the cached block's
    # memory is reused and its hash mapping evicted.
    seq2 = make_seq([50, 51, 52, 53, 54, 55, 56])
    bm.allocate(seq2)
    assert h not in bm.hash_to_block_id
