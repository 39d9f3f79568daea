"""Unit tests for the continuous-batching scheduler (pure CPU)."""

from types import SimpleNamespace

from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus
from nanovllm_tpu.sampling_params import SamplingParams

BS = 4
EOS = 999


def make_scheduler(num_blocks=64, max_seqs=8, max_tokens=64):
    cfg = SimpleNamespace(
        max_num_seqs=max_seqs,
        max_num_batched_tokens=max_tokens,
        eos=EOS,
        num_kvcache_blocks=num_blocks,
        kvcache_block_size=BS,
        max_model_len=num_blocks * BS,
    )
    return Scheduler(cfg)


def make_seq(tokens, **kw):
    Sequence.block_size = BS
    return Sequence(tokens, SamplingParams(**kw))


def run_step(sched, sampled_token=7):
    seqs, is_prefill = sched.schedule()
    sched.postprocess(seqs, [sampled_token] * len(seqs))
    return seqs, is_prefill


def test_prefill_then_decode():
    sched = make_scheduler()
    seq = make_seq([1, 2, 3, 4, 5], max_tokens=3)
    sched.add(seq)
    seqs, is_prefill = run_step(sched)
    assert is_prefill and seqs == [seq]
    assert seq.status == SequenceStatus.RUNNING
    assert seq.num_tokens == 6 and seq.last_token == 7
    assert seq.num_cached_tokens == 5
    seqs, is_prefill = run_step(sched)
    assert not is_prefill and seqs == [seq]
    assert seq.num_cached_tokens == 6
    run_step(sched)
    assert seq.is_finished and sched.is_finished()  # 3 completion tokens
    assert seq.completion_token_ids == [7, 7, 7]


def test_eos_stops_unless_ignored():
    sched = make_scheduler()
    s1 = make_seq([1, 2], max_tokens=10)
    s2 = make_seq([1, 2], max_tokens=10, ignore_eos=True)
    sched.add(s1)
    sched.add(s2)
    run_step(sched, sampled_token=EOS)
    assert s1.is_finished and not s2.is_finished


def test_prefill_priority_and_fcfs_packing():
    sched = make_scheduler(max_tokens=16)
    a = make_seq(list(range(10)))
    b = make_seq(list(range(20, 26)))
    c = make_seq(list(range(40, 48)))
    for s in (a, b, c):
        sched.add(s)
    seqs, is_prefill = sched.schedule()
    # 10 + 6 = 16 fills the budget; c must wait.
    assert is_prefill and seqs == [a, b]
    sched.postprocess(seqs, [7, 7])
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [c]  # prefill still outranks decode
    sched.postprocess(seqs, [7])
    seqs, is_prefill = sched.schedule()
    assert not is_prefill and set(seqs) == {a, b, c}


def test_chunked_prefill_first_seq_only():
    sched = make_scheduler(max_tokens=8)
    long = make_seq(list(range(20)))
    short = make_seq([1, 2, 3])
    sched.add(long)
    sched.add(short)
    # Chunk 1: 8 of 20 tokens; long stays waiting, short not admitted.
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [long] and long.num_scheduled_tokens == 8
    assert long.status == SequenceStatus.WAITING
    sched.postprocess(seqs, [7])
    assert long.num_cached_tokens == 8 and long.num_tokens == 20  # no token appended
    # Chunk 2: next 8.
    seqs, _ = sched.schedule()
    assert seqs == [long] and long.num_scheduled_tokens == 8
    sched.postprocess(seqs, [7])
    # Chunk 3: final 4 tokens complete the prefill; short follows in-batch.
    seqs, _ = sched.schedule()
    assert seqs == [long, short]
    assert long.num_scheduled_tokens == 4
    sched.postprocess(seqs, [7, 7])
    assert long.status == SequenceStatus.RUNNING and long.num_tokens == 21


def test_preemption_by_recompute():
    # Pool of 3 blocks, two seqs of 1 block each; growth forces eviction.
    sched = make_scheduler(num_blocks=3, max_tokens=8)
    a = make_seq([1, 2, 3, 4], max_tokens=4, ignore_eos=True)
    b = make_seq([5, 6, 7, 8], max_tokens=4, ignore_eos=True)
    sched.add(a)
    sched.add(b)
    run_step(sched)  # prefill a (1 block)
    run_step(sched)  # prefill b (1 block)
    # Decode: both need a new block (len 5 % 4 == 1) but only 1 block is free:
    # b (last in running) is preempted back to waiting.
    seqs, is_prefill = sched.schedule()
    assert not is_prefill and seqs == [a]
    assert b.status == SequenceStatus.WAITING and b.block_table == []
    sched.postprocess(seqs, [9])
    # b stays starved (needs 2 blocks, 1 free) while a runs to completion.
    while not a.is_finished:
        seqs, is_prefill = run_step(sched)
        assert seqs == [a] and not is_prefill
    # a's blocks freed: b is re-prefilled. Its first block survived in the
    # free pool with hash intact, so the prefix cache resurrects it and only
    # the 1 uncached token is recomputed.
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [b]
    assert b.num_cached_tokens == 4
    assert b.num_scheduled_tokens == 1


def test_prefix_cached_admission_counts_fewer_tokens():
    sched = make_scheduler(max_tokens=8)
    a = make_seq(list(range(12)))
    sched.add(a)
    while sched.waiting:
        run_step(sched)
    # a cached blocks 0-1 (8 tokens). A new seq sharing that prefix needs only
    # 12 - 8 = 4 new tokens, fitting an 8-token budget alongside 4 more.
    b = make_seq(list(range(12)))
    c = make_seq([90, 91, 92, 93])
    sched.add(b)
    sched.add(c)
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [b, c]
    assert b.num_scheduled_tokens == 4 and b.num_cached_tokens == 8


def test_admission_bounded_by_device_slots():
    # ADVICE r1 (high): a KV pool large enough to host more than
    # 2*max_num_seqs one-block prompts must not exhaust the slot buffer —
    # admission stops instead of crashing on free_slots.popleft().
    sched = make_scheduler(num_blocks=64, max_seqs=4, max_tokens=64)
    n_slots = len(sched.free_slots)  # 2 * max_num_seqs = 8
    seqs = [make_seq([1, 2, 3], max_tokens=64, ignore_eos=True)
            for _ in range(n_slots + 3)]
    for s in seqs:
        sched.add(s)
    admitted = set()
    # Prefill in waves of max_num_seqs until slots run dry; never crashes.
    for _ in range(4):
        out, is_prefill = sched.schedule()
        assert is_prefill
        sched.postprocess(out, [7] * len(out))
        admitted |= set(out)
        if not sched.free_slots:
            break
    assert len(admitted) <= n_slots
    # Once slots are exhausted the scheduler falls back to decode.
    out, is_prefill = sched.schedule()
    assert not is_prefill
    assert all(s.device_slot >= 0 for s in out)


def test_priority_admission():
    """Higher SamplingParams.priority is admitted first (FCFS within a
    level); default-0 traffic keeps pure reference FCFS; a chunk-in-progress
    head is never displaced."""
    sched = make_scheduler(max_tokens=8)
    a = make_seq([1, 2, 3], max_tokens=4)
    b = make_seq([4, 5, 6], max_tokens=4)
    lo = make_seq([7, 8], max_tokens=4, priority=-1)
    hi = make_seq([9, 10], max_tokens=4, priority=5)
    for q in (a, b, lo, hi):
        sched.add(q)
    assert [q.seq_id for q in sched.waiting] == [
        hi.seq_id, a.seq_id, b.seq_id, lo.seq_id
    ]
    hi2 = make_seq([11], max_tokens=4, priority=5)
    sched.add(hi2)
    assert [q.seq_id for q in sched.waiting][:2] == [hi.seq_id, hi2.seq_id]

    # A chunk-in-progress head (non-empty block_table, still WAITING) stays
    # at the front even when a higher-priority request arrives.
    sched2 = make_scheduler(max_tokens=8)
    big = make_seq(list(range(1, 14)), max_tokens=4)  # 13 > 8-token budget
    sched2.add(big)
    seqs, is_prefill = sched2.schedule()
    assert is_prefill and seqs == [big] and sched2.waiting[0] is big
    sched2.postprocess_lengths(seqs)
    urgent = make_seq([2, 3], max_tokens=4, priority=9)
    sched2.add(urgent)
    assert sched2.waiting[0] is big and sched2.waiting[1] is urgent


def test_priority_respects_preempted_prefix():
    """Preempted sequences hold the queue front regardless of priority, and
    an arrival must not be inserted ahead of a HIGHER-priority waiter sitting
    behind them (r2 review: the insertion scan assumed a sorted queue, but
    preemption appendlefts arbitrary priorities)."""
    sched = make_scheduler(max_tokens=8)
    hi = make_seq([1, 2], max_tokens=4, priority=5)
    x = make_seq([3, 4], max_tokens=4, priority=3)
    sched.add(hi)
    sched.add(x)
    p1 = make_seq([5, 6], max_tokens=4)
    p2 = make_seq([7, 8], max_tokens=4)
    p1.was_preempted = p2.was_preempted = True  # as Scheduler.preempt sets
    sched.waiting.appendleft(p1)
    sched.waiting.appendleft(p2)
    y = make_seq([9, 10], max_tokens=4, priority=4)
    sched.add(y)
    assert [q.seq_id for q in sched.waiting] == [
        p2.seq_id, p1.seq_id, hi.seq_id, y.seq_id, x.seq_id
    ]


def make_window_scheduler(window, num_blocks=64, max_seqs=8, max_tokens=64):
    sched = make_scheduler(num_blocks, max_seqs, max_tokens)
    sched.attention_window = window
    # Decouple the length cap from the pool size: eviction is exactly what
    # lets total sequence length exceed the pool.
    sched.max_model_len = 10**9
    return sched


def test_window_eviction_bounds_decode_kv():
    """Rolling eviction: decode releases leading blocks once the window
    (W=8, block 4) rolls past them; resident blocks stay bounded however
    long the completion grows."""
    sched = make_window_scheduler(8)
    seq = make_seq([1] * 6, max_tokens=40, ignore_eos=True)
    sched.add(seq)
    run_step(sched)  # prefill
    peak = peak_evicted = 0
    for _ in range(39):
        run_step(sched)
        live = len(seq.block_table) - seq.num_evicted_blocks
        peak = max(peak, live)
        peak_evicted = max(peak_evicted, seq.num_evicted_blocks)
    # window 8 spans at most 3 pages of 4, +1 for the page being written.
    assert peak <= 4, peak
    assert peak_evicted > 0  # (deallocate-at-finish resets the watermark)
    assert seq.is_finished
    assert len(sched.block_manager.used_block_ids) == 0  # all returned


def test_window_eviction_outlives_pool_without_preemption():
    """A completion whose total KV exceeds the whole pool still runs without
    preemption: eviction frees pages as fast as decode consumes them."""
    sched = make_window_scheduler(8, num_blocks=8)
    # total length will be 4 + 60 = 64 tokens = 16 pages > the 8-block pool
    seq = make_seq([1] * 4, max_tokens=60, ignore_eos=True)
    sched.add(seq)
    run_step(sched)
    for _ in range(59):
        run_step(sched)
    assert seq.is_finished
    assert not seq.was_preempted
    assert len(sched.block_manager.used_block_ids) == 0  # all returned


def test_window_eviction_preemption_resets_watermark():
    """Preempting an evicted sequence deallocates only the live suffix and
    resets the watermark; re-prefill reallocates a full table."""
    sched = make_window_scheduler(8, num_blocks=16)
    seq = make_seq([1] * 6, max_tokens=30, ignore_eos=True)
    sched.add(seq)
    run_step(sched)
    for _ in range(12):
        run_step(sched)
    assert seq.num_evicted_blocks > 0
    sched.running.remove(seq)  # the scheduler pops before preempting
    sched.preempt(seq)
    assert seq.num_evicted_blocks == 0 and not seq.block_table
    assert len(sched.block_manager.used_block_ids) == 0
    # Re-prefill runs (prefix cache may serve full blocks) and decode resumes.
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [seq]
    sched.postprocess(seqs, [7] * len(seqs))
    for _ in range(5):
        run_step(sched)
    assert seq.num_tokens > 19


def test_window_eviction_stops_hash_registration():
    """Once a sequence starts evicting, no further prefix hashes register
    (the chain's earlier blocks may be freed); earlier registrations stay."""
    sched = make_window_scheduler(8)
    seq = make_seq([1] * 6, max_tokens=40, ignore_eos=True)
    sched.add(seq)
    run_step(sched)
    for _ in range(30):
        run_step(sched)
    assert seq.num_evicted_blocks > 0
    hashes_at_evict = len(sched.block_manager.hash_to_block_id)
    for _ in range(9):
        run_step(sched)
    assert len(sched.block_manager.hash_to_block_id) == hashes_at_evict


def test_no_window_is_noop():
    """attention_window=None leaves block accounting byte-identical."""
    sched = make_scheduler()
    seq = make_seq([1] * 6, max_tokens=20, ignore_eos=True)
    sched.add(seq)
    run_step(sched)
    for _ in range(19):
        run_step(sched)
    assert seq.num_evicted_blocks == 0


def test_window_preempted_long_seq_readmits():
    """A window-evicted sequence longer than the whole pool can be preempted
    and still re-admit: window-lazy allocation reserves only chunk+window
    blocks, and between-chunk eviction keeps re-prefill demand bounded."""
    sched = make_window_scheduler(8, num_blocks=8, max_tokens=16)
    # total length 4 + 60 = 64 tokens = 16 pages, double the 8-block pool
    seq = make_seq([1] * 4, max_tokens=60, ignore_eos=True)
    sched.add(seq)
    run_step(sched)
    for _ in range(20):
        run_step(sched)
    assert seq.num_tokens == 25 and seq.num_evicted_blocks > 0
    sched.running.remove(seq)  # the scheduler pops before preempting
    sched.preempt(seq)
    # Re-prefill: 25 tokens > 16-token budget -> chunked, each chunk's
    # allocation bounded; then decode resumes to completion.
    while not seq.is_finished:
        run_step(sched)
    assert seq.num_tokens == 64
    assert len(sched.block_manager.used_block_ids) == 0


def test_window_long_prompt_exceeding_pool_admits():
    """A fresh windowed prompt larger than the pool admits chunk-by-chunk
    (the full-table reservation would return -1 forever)."""
    sched = make_window_scheduler(8, num_blocks=8, max_tokens=16)
    seq = make_seq([1] * 48, max_tokens=4, ignore_eos=True)  # 12 pages > 8
    sched.add(seq)
    steps = 0
    while not seq.is_finished and steps < 50:
        run_step(sched)
        steps += 1
    assert seq.is_finished and seq.num_completion_tokens == 4
    assert len(sched.block_manager.used_block_ids) == 0


def test_window_evicts_before_capacity_check():
    """At steady state a windowed decode never preempts a peer: the dead
    leading block is released before can_append runs."""
    sched = make_window_scheduler(8, num_blocks=9, max_tokens=64)
    seqs = [make_seq([1] * 4, max_tokens=40, ignore_eos=True)
            for _ in range(3)]
    for s in seqs:
        sched.add(s)
    for _ in range(3):
        run_step(sched)  # prefills
    for _ in range(40):
        if sched.is_finished():
            break
        run_step(sched)
    assert all(s.is_finished for s in seqs)
    assert not any(s.was_preempted for s in seqs)
