"""End-to-end speculative decoding: token identity with the non-spec engine.

Spec-decode CORRECTNESS is weight-independent: greedy acceptance only keeps a
draft when it equals the model's own argmax, so the emitted stream must be
bit-identical to the spec_k=0 run whatever the weights propose. Random tiny
models routinely fall into greedy cycles, which the ngram drafter then
predicts — so these tests exercise real accepted-draft paths, not just the
all-rejected degenerate case (asserted below).
"""

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams


def _gen(path, prompts, params, **kw):
    llm = LLM(
        path,
        max_num_batched_tokens=256,
        max_model_len=256,
        max_num_seqs=8,
        kvcache_block_size=16,
        enforce_eager=True,
        **kw,
    )
    try:
        return llm.generate(prompts, params, use_tqdm=False), llm
    finally:
        llm.exit()


PROMPTS = [
    [3, 4, 5, 3, 4, 5, 3, 4],        # repetitive: ngram matches in-prompt
    [7, 8, 9, 10, 11],
    [2, 2, 2, 2],
    [5, 9, 5, 9, 5, 9],
    [11, 12, 13],
]


def test_spec_greedy_token_identity(tiny_qwen3_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=48, ignore_eos=True)
    base, _ = _gen(tiny_qwen3_dir, PROMPTS, sp)
    for k in (1, 3):
        out, llm = _gen(tiny_qwen3_dir, PROMPTS, sp, spec_k=k)
        for i, (b, o) in enumerate(zip(base, out)):
            assert o["token_ids"] == b["token_ids"], (i, k)


def test_spec_accepts_drafts(tiny_qwen3_dir):
    """Greedy runs of tiny random models cycle; the drafter must ride the
    cycle: strictly fewer decode steps than emitted tokens."""
    sp = SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True)
    llm = LLM(
        tiny_qwen3_dir, max_num_batched_tokens=256, max_model_len=256,
        max_num_seqs=8, kvcache_block_size=16, enforce_eager=True, spec_k=3,
    )
    try:
        llm.generate(PROMPTS, sp, use_tqdm=False)
        m = llm.metrics
        total = len(PROMPTS) * 64
        assert m.num_decode_steps < total, (
            f"no drafts accepted: {m.num_decode_steps} steps for {total} toks"
        )
    finally:
        llm.exit()


def test_spec_max_tokens_exact(tiny_qwen3_dir):
    """Length caps must hold exactly even when they land mid-accepted-pack."""
    params = [
        SamplingParams(temperature=0.0, max_tokens=m, ignore_eos=True)
        for m in (1, 2, 3, 5, 17)
    ]
    base, _ = _gen(tiny_qwen3_dir, PROMPTS, params)
    out, _ = _gen(tiny_qwen3_dir, PROMPTS, params, spec_k=3)
    for i, (b, o) in enumerate(zip(base, out)):
        assert o["token_ids"] == b["token_ids"], i
        assert len(o["token_ids"]) == (1, 2, 3, 5, 17)[i]


def test_spec_mixed_temperature_batch(tiny_qwen3_dir):
    """Non-greedy rows fall back to 1 token/step inside the spec program;
    greedy rows must still match the baseline exactly."""
    params = [
        SamplingParams(temperature=0.0 if i % 2 == 0 else 0.8,
                       max_tokens=32, ignore_eos=True)
        for i in range(len(PROMPTS))
    ]
    base, _ = _gen(tiny_qwen3_dir, PROMPTS, params)
    out, _ = _gen(tiny_qwen3_dir, PROMPTS, params, spec_k=2)
    for i in range(0, len(PROMPTS), 2):  # greedy rows only
        assert out[i]["token_ids"] == base[i]["token_ids"], i
    for i in range(1, len(PROMPTS), 2):  # sampled rows: right length
        assert len(out[i]["token_ids"]) == 32


def test_spec_fallback_features(tiny_qwen3_dir):
    """A logprobs / top-k request forces the whole batch onto the fallback
    decode variant for its steps; everything stays exact."""
    params = [
        SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True),
        SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True,
                       logprobs=True),
        SamplingParams(temperature=0.7, max_tokens=24, ignore_eos=True,
                       top_k=8),
    ]
    prompts = PROMPTS[:3]
    base, _ = _gen(tiny_qwen3_dir, prompts, params)
    out, _ = _gen(tiny_qwen3_dir, prompts, params, spec_k=3)
    assert out[0]["token_ids"] == base[0]["token_ids"]
    assert out[1]["token_ids"] == base[1]["token_ids"]
    assert len(out[1]["logprobs"]) == 24
    assert len(out[2]["token_ids"]) == 24


def test_spec_preemption_identity(tiny_qwen3_dir):
    """A KV pool too small for the whole batch forces preempt-by-recompute
    mid-generation; outputs stay identical to the unconstrained baseline."""
    sp = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
    base, _ = _gen(tiny_qwen3_dir, PROMPTS, sp)
    out, _ = _gen(
        tiny_qwen3_dir, PROMPTS, sp, spec_k=3, num_kvcache_blocks=24
    )
    for i, (b, o) in enumerate(zip(base, out)):
        assert o["token_ids"] == b["token_ids"], i


def test_spec_prefix_cache_identity(tiny_qwen3_dir):
    """Prefix-cache hits skip re-embedding (stale history rows may degrade
    draft quality but never correctness)."""
    long_prompt = list(range(2, 13)) * 5  # > 2 full 16-token blocks
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    llm = LLM(
        tiny_qwen3_dir, max_num_batched_tokens=256, max_model_len=256,
        max_num_seqs=8, kvcache_block_size=16, enforce_eager=True, spec_k=3,
    )
    try:
        first = llm.generate([long_prompt], sp, use_tqdm=False)
        second = llm.generate([long_prompt], sp, use_tqdm=False)  # cache hit
        assert first[0]["token_ids"] == second[0]["token_ids"]
        bm = llm.scheduler.block_manager
        assert bm.cached_prompt_tokens > 0  # the second run actually hit
    finally:
        llm.exit()


def test_spec_gate_disables_on_low_acceptance(tiny_qwen3_dir):
    """A sampled (temperature 1.0) trace accepts ~nothing: the acceptance
    gate must trip after the first drain and stop issuing spec steps (r4
    chip measurement: always-on drafting at acceptance≈0 ran ~10x slower —
    pessimistic lengths park sequences, forcing pipeline drains)."""
    sp = SamplingParams(temperature=1.0, max_tokens=64, ignore_eos=True)
    out, llm = _gen(tiny_qwen3_dir, PROMPTS, sp, spec_k=3,
                    spec_probe_interval=16)
    assert llm._spec_off, "gate should trip on an acceptance≈0 trace"
    m = llm.metrics
    # Un-gated, every decode step drafts ~3*len(PROMPTS) tokens; with the
    # gate only the pre-first-drain window and sparse probes draft.
    assert m.spec_drafted < m.num_decode_steps * 3 * len(PROMPTS) / 2, (
        m.spec_drafted, m.num_decode_steps)
    assert all(len(o["token_ids"]) == 64 for o in out)


def test_spec_gate_probes_after_tripping(tiny_qwen3_dir):
    """While off, one probe spec step per spec_probe_interval keeps the
    acceptance estimate fresh (a shifted workload can re-enable drafting)."""
    sp = SamplingParams(temperature=1.0, max_tokens=96, ignore_eos=True)
    _, llm = _gen(tiny_qwen3_dir, PROMPTS, sp, spec_k=3,
                  spec_probe_interval=3)
    # With a 3-step probe cadence the post-trip probes keep drafting: well
    # more drafted tokens than the pre-trip window (≈ fetch_interval steps
    # × 3 drafts × 5 seqs ≈ 120) alone could produce.
    assert llm._spec_off
    assert llm.metrics.spec_drafted > 200, llm.metrics.spec_drafted


def test_spec_gate_always_on_when_threshold_zero(tiny_qwen3_dir):
    """spec_min_acceptance=0.0 restores unconditional drafting."""
    sp = SamplingParams(temperature=1.0, max_tokens=32, ignore_eos=True)
    _, llm = _gen(tiny_qwen3_dir, PROMPTS, sp, spec_k=3,
                  spec_min_acceptance=0.0)
    assert not llm._spec_off
    m = llm.metrics
    # Every decode step drafted (placeholder caps may trim the tail rows).
    assert m.spec_drafted >= m.num_decode_steps * len(PROMPTS), (
        m.spec_drafted, m.num_decode_steps)


def test_spec_seeded_and_min_tokens_run(tiny_qwen3_dir):
    """Seeded sampling reproduces its trace through the fallback variant,
    and min_tokens still suppresses EOS (conservatively) under spec."""
    sp = SamplingParams(temperature=0.9, max_tokens=16, seed=7,
                        ignore_eos=True)
    a, _ = _gen(tiny_qwen3_dir, PROMPTS[:2], sp, spec_k=2)
    b, _ = _gen(tiny_qwen3_dir, PROMPTS[:2], sp, spec_k=2)
    assert a[0]["token_ids"] == b[0]["token_ids"]
    sp2 = SamplingParams(temperature=0.0, max_tokens=12, min_tokens=12)
    out, _ = _gen(tiny_qwen3_dir, PROMPTS[:1], sp2, spec_k=2)
    assert len(out[0]["token_ids"]) == 12


def test_spec_sampled_rows_accept_drafts(tiny_qwen3_dir):
    """r5: rejection-sampling acceptance — sampled (temperature>0) rows now
    accept drafts too. At a low temperature on a repetitive prompt the
    target distribution is peaked on the cycle, so drafts must be accepted
    with real frequency (the ops-level distribution oracle is
    tests/test_spec_ops.py::test_rejection_sampling_distribution_exact)."""
    prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
    sp = SamplingParams(temperature=0.05, max_tokens=48, ignore_eos=True)
    out, llm = _gen(tiny_qwen3_dir, [prompt] * 3, sp, spec_k=3,
                    spec_min_acceptance=0.0)
    assert all(len(o["token_ids"]) == 48 for o in out)
    m = llm.metrics
    assert m.spec_drafted > 0
    assert m.spec_accepted > 0.05 * m.spec_drafted, (
        m.spec_accepted, m.spec_drafted)


def test_spec_sampled_length_exact(tiny_qwen3_dir):
    """Sampled spec rows respect max_tokens exactly (the emitted count is
    capped at the device; stops may truncate mid-burst)."""
    sp = [
        SamplingParams(temperature=0.4, max_tokens=n, ignore_eos=True)
        for n in (5, 17, 33, 48, 1)
    ]
    out, _ = _gen(tiny_qwen3_dir, PROMPTS, sp, spec_k=3,
                  spec_min_acceptance=0.0)
    assert [len(o["token_ids"]) for o in out] == [5, 17, 33, 48, 1]
