"""Warmup coverage for serving-facing step variants (VERDICT r4 weak #3):
a filtered (top-k/top-p) request — what every OpenAI client sends by
default — must find its program AOT-compiled, not stall on a first-request
compile. The oracle: after warmup, requests of a warmed variant never reach
the jit fallback (`ModelRunner._step`)."""

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams

ENGINE_KW = dict(
    max_num_batched_tokens=128,
    max_num_seqs=8,
    max_model_len=128,
    kvcache_block_size=16,
    num_kvcache_blocks=64,
    decode_buckets=(4, 8),
    prefill_buckets=(64, 128),
    dtype="float32",
    use_pallas_attention=False,
    enforce_eager=False,   # enforce_eager would skip warmup entirely
    aot_warmup=True,
)


def _no_fallback(llm):
    calls = []
    orig = llm.model_runner._step

    def spy(*a, **kw):
        calls.append(a)
        return orig(*a, **kw)

    llm.model_runner._step = spy
    return calls


def test_filtered_requests_hit_warmed_programs(tiny_qwen3_dir):
    llm = LLM(tiny_qwen3_dir, warmup_variants=("filtered",), **ENGINE_KW)
    # Both prefill buckets and both decode rungs are warmed for the
    # filtered variant: short and long prompts, small and full batches.
    calls = _no_fallback(llm)
    prompts = [[3, 4, 5]] * 6 + [list(range(2, 60))]
    sp = SamplingParams(temperature=0.8, top_p=0.7, top_k=3, max_tokens=8,
                        ignore_eos=True)
    out = llm.generate(prompts, sp, use_tqdm=False)
    assert all(len(o["token_ids"]) == 8 for o in out)
    assert not calls, f"{len(calls)} un-warmed compiles hit the jit fallback"


def test_seeded_and_logprobs_variants_warm(tiny_qwen3_dir):
    llm = LLM(
        tiny_qwen3_dir, warmup_variants=("seeded", "logprobs"), **ENGINE_KW
    )
    calls = _no_fallback(llm)
    # Separate batches: a batch mixing seeded AND logprobs rows would select
    # the combined (seeded, want_lp) variant, which warmup deliberately does
    # not enumerate (variant combinations are combinatorial).
    out = llm.generate(
        [[3, 4, 5]],
        SamplingParams(temperature=0.9, seed=7, max_tokens=4,
                       ignore_eos=True),
        use_tqdm=False,
    )
    out2 = llm.generate(
        [[7, 8]],
        SamplingParams(temperature=0.0, logprobs=True, max_tokens=4,
                       ignore_eos=True),
        use_tqdm=False,
    )
    assert len(out) == 1 and "logprobs" in out2[0]
    assert not calls, f"{len(calls)} un-warmed compiles hit the jit fallback"


def test_unknown_warmup_variant_rejected(tiny_qwen3_dir):
    with pytest.raises(AssertionError):
        LLM(tiny_qwen3_dir, warmup_variants=("nucleus",), **ENGINE_KW)
