"""Engine stress test: randomized staggered admission, mid-flight aborts,
preemption under a tight KV pool, and prefix sharing in one driven run.

The reference has no analogue (its only instrument is example.py's eyeball
smoke, reference bench.py / example.py); this is the serving-path combination
coverage the individual e2e tests don't reach: aborts landing while steps are
in flight, aborts of prefix-cache sharers, preemption interleaved with
admission. Oracles:

- greedy output invariance: survivors' tokens equal a clean run's outputs
  (aborting neighbors must not perturb anyone else),
- resource accounting: every KV block and device slot returns to the pool,
  and mid-run the used-block set is exactly the union of live block tables.
"""

from collections import Counter

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams

ENGINE_KW = dict(
    max_num_batched_tokens=128,
    max_num_seqs=8,
    max_model_len=128,
    kvcache_block_size=16,
    # Tight pool: ~14 prompts of ~2-3 blocks each cannot all be resident, so
    # decode scheduling preempts under pressure (recompute re-prefills).
    num_kvcache_blocks=28,
    decode_buckets=(4, 8),
    prefill_buckets=(64, 128),
    dtype="float32",
    use_pallas_attention=False,
    enforce_eager=True,
)


@pytest.fixture(scope="module")
def llm(tiny_qwen3_dir):
    return LLM(tiny_qwen3_dir, **ENGINE_KW)


def _live_table_union(scheduler):
    ids = []
    for seq in list(scheduler.running) + list(scheduler.waiting):
        ids.extend(seq.block_table)
    return ids


def _assert_block_invariants(scheduler):
    bm = scheduler.block_manager
    live = _live_table_union(scheduler)
    live_counts = Counter(live)
    assert set(live) == bm.used_block_ids, (
        "used blocks != union of live sequences' block tables"
    )
    for bid, n in live_counts.items():
        # ref_count counts owners; prefix-shared blocks have one ref per
        # sharer, and every owner appears in exactly one live block table.
        assert bm.blocks[bid].ref_count == n, (
            f"block {bid}: ref_count {bm.blocks[bid].ref_count} != {n} owners"
        )


def test_stress_aborts_preemption_prefix_sharing(llm, tiny_qwen3_dir):
    rng = np.random.default_rng(7)
    shared_prefix = rng.integers(2, 500, size=34).tolist()
    prompts = []
    for i in range(14):
        if i % 3 == 0:
            # Prefix-cache sharers: same first two blocks, distinct tails.
            body = rng.integers(2, 500, size=int(rng.integers(4, 20))).tolist()
            prompts.append(shared_prefix + body)
        else:
            n = int(rng.integers(6, 60))
            prompts.append(rng.integers(2, 500, size=n).tolist())
    sps = [
        SamplingParams(
            temperature=0.0,
            max_tokens=int(rng.integers(6, 18)),
            ignore_eos=bool(i % 2),
        )
        for i in range(len(prompts))
    ]

    # Clean reference run (no aborts, batch admission).
    ref = llm.generate(prompts, sps, use_tqdm=False)
    assert llm.is_finished()
    _assert_block_invariants(llm.scheduler)

    # Stress run on the SAME engine (dirty prefix cache is part of the test):
    # staggered admission, aborts at planned step indices.
    aborted = {2, 3, 9, 12}  # includes prefix sharers (3, 9, 12) and a plain
    abort_at = {2: 1, 3: 6, 9: 9, 12: 14}  # step index -> fires mid-flight
    live = {}
    next_admit = 0
    t = 0
    while next_admit < len(prompts) or not llm.is_finished():
        # Admit up to 2 requests every other iteration (arrival mid-serving).
        if next_admit < len(prompts) and t % 2 == 0:
            for _ in range(2):
                if next_admit >= len(prompts):
                    break
                live[next_admit] = llm.add_request(
                    prompts[next_admit], sps[next_admit]
                )
                next_admit += 1
        llm.step()
        for idx, at in abort_at.items():
            if t == at and idx in live:
                llm.abort_request(live[idx])
        _assert_block_invariants(llm.scheduler)
        t += 1
        assert t < 2000, "stress loop did not converge"

    # Aborting one sharer must not perturb any survivor (greedy determinism).
    for i, seq in live.items():
        if i in aborted:
            assert seq.is_finished
            continue
        got = seq.completion_token_ids[: seq.num_valued_tokens - seq.num_prompt_tokens]
        assert got == ref[i]["token_ids"], f"survivor {i} diverged"

    # Every resource returned: blocks, ref counts, device slots, pipeline.
    bm = llm.scheduler.block_manager
    assert bm.used_block_ids == set()
    assert len(bm.free_block_ids) == bm.num_blocks
    assert all(b.ref_count == 0 for b in bm.blocks)
    assert len(llm.scheduler.free_slots) == 2 * ENGINE_KW["max_num_seqs"]
    assert not llm.pending

    # An abort on an already-finished sequence is a safe no-op.
    llm.abort_request(live[0])
    assert bm.used_block_ids == set()


def test_stress_moe(tiny_moe_dir):
    """The abort/preemption/prefix stress scenario over the MoE family
    (ragged expert dispatch under churn), on a tight pool."""
    llm = LLM(tiny_moe_dir, **ENGINE_KW)
    rng = np.random.default_rng(71)
    prompts = [rng.integers(2, 500, size=int(rng.integers(6, 40))).tolist()
               for _ in range(10)]
    sps = [SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
           for _ in prompts]
    ref = llm.generate(prompts, sps, use_tqdm=False)
    live = {}
    # One admission per even step: request 6 exists from t=12, so its abort
    # must fire later (t=13) — an earlier step would silently never abort it.
    abort_at = {1: 2, 6: 13}
    next_admit, t = 0, 0
    while next_admit < len(prompts) or not llm.is_finished():
        if next_admit < len(prompts) and t % 2 == 0:
            live[next_admit] = llm.add_request(prompts[next_admit],
                                               sps[next_admit])
            next_admit += 1
        llm.step()
        for idx, at in abort_at.items():
            if t == at and idx in live:
                llm.abort_request(live[idx])
        _assert_block_invariants(llm.scheduler)
        t += 1
        assert t < 2000
    for i, seq in live.items():
        if i in abort_at:
            assert seq.is_finished, f"abort {i} never fired"
            continue
        got = seq.completion_token_ids[
            : seq.num_valued_tokens - seq.num_prompt_tokens]
        assert got == ref[i]["token_ids"], f"survivor {i} diverged"
    bm = llm.scheduler.block_manager
    assert bm.used_block_ids == set()
