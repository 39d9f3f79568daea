"""TP communication-path tests: distributed sampling (no logits all-gather)
and bf16 psum payloads (benchmarks/predict_scaling.py found the f32 layer
psums + the [S, V] logits all-gather dominating per-step ICI bytes)."""

import re

import numpy as np


def test_sampled_tp_matches_single_chip(tiny_qwen3_dir):
    """Temperature > 0 under TP=2 must reproduce the single-chip token trace
    BIT-identically: sample_tp slices the same counter-based noise stream the
    unsharded sampler draws, and the deterministic scheduler feeds both runs
    identical per-step keys (rng_seed)."""
    from nanovllm_tpu import LLM, SamplingParams

    prompts = [[3, 4, 5, 6, 7, 8, 9, 10], [9, 8, 7]]
    sp = SamplingParams(temperature=1.0, max_tokens=6, ignore_eos=True)
    kwargs = dict(
        dtype="float32",
        max_model_len=128,
        max_num_batched_tokens=128,
        max_num_seqs=4,
        kvcache_block_size=16,
        num_kvcache_blocks=32,
        decode_buckets=(4,),
        prefill_buckets=(128,),
        rng_seed=7,
    )
    one = LLM(tiny_qwen3_dir, tensor_parallel_size=1, **kwargs)
    ref = one.generate(prompts, sp, use_tqdm=False)
    one.exit()
    two = LLM(tiny_qwen3_dir, tensor_parallel_size=2, **kwargs)
    out = two.generate(prompts, sp, use_tqdm=False)
    two.exit()
    for o, r in zip(out, ref):
        assert o["token_ids"] == r["token_ids"]


def test_filtered_tp_matches_single_chip(tiny_qwen3_dir):
    """top-k/top-p requests under TP=2 match the single-chip trace (peaked
    tiny-model logits: all bounds close inside the window, no nucleus-
    boundary ulp ties)."""
    from nanovllm_tpu import LLM, SamplingParams

    prompts = [[3, 4, 5, 6], [9, 8, 7]]
    params = [
        SamplingParams(temperature=1.0, top_k=8, max_tokens=6,
                       ignore_eos=True),
        SamplingParams(temperature=0.9, top_p=0.8, max_tokens=6,
                       ignore_eos=True),
    ]
    kwargs = dict(
        dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        max_num_seqs=4, kvcache_block_size=16, num_kvcache_blocks=32,
        decode_buckets=(4,), prefill_buckets=(128,), rng_seed=3,
    )
    one = LLM(tiny_qwen3_dir, tensor_parallel_size=1, **kwargs)
    ref = one.generate(prompts, params, use_tqdm=False)
    one.exit()
    two = LLM(tiny_qwen3_dir, tensor_parallel_size=2, **kwargs)
    out = two.generate(prompts, params, use_tqdm=False)
    two.exit()
    for o, r in zip(out, ref):
        assert o["token_ids"] == r["token_ids"]


def test_plain_tp_step_has_no_logits_allgather(tiny_qwen3_dir):
    """The plain decode variant under TP must not gather [S, V] logits: the
    only all-gathers left are the [tp, S]-scalar sample combine (and none
    the size of the vocab)."""
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner

    config = Config(
        tiny_qwen3_dir, dtype="float32", max_model_len=128,
        max_num_batched_tokens=128, max_num_seqs=4, kvcache_block_size=16,
        num_kvcache_blocks=32, tensor_parallel_size=2,
        decode_buckets=(4,), prefill_buckets=(128,), aot_warmup=False,
    )
    runner = ModelRunner(config)
    inputs = runner._dummy_inputs(4, 4, False)
    hlo = runner._step.lower(
        runner.params, runner.kv, runner.token_state, runner.rope, inputs,
        None, None, None, None, False, False, False, False, False, False,
        False, False,
    ).compile().as_text()
    vocab = 512
    for line in hlo.splitlines():
        if re.search(r"\ball-gather(-start)?\(", line):
            dims = [int(d) for d in re.findall(r"\[([\d,]+)\]",
                                               line.split(" = ")[-1][:80])
                    for d in d.split(",")]
            assert not any(d >= vocab for d in dims), line


def test_bf16_model_psums_ride_bf16(tiny_qwen3_dir):
    """bf16-parameter models wire their layer psums in bf16 (half the
    dominant per-step ICI bytes); f32 checkpoints keep exact f32 payloads
    (the TP-equality tests above)."""
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner

    config = Config(
        tiny_qwen3_dir, dtype="bfloat16", max_model_len=128,
        max_num_batched_tokens=128, max_num_seqs=4, kvcache_block_size=16,
        num_kvcache_blocks=32, tensor_parallel_size=2,
        decode_buckets=(4,), prefill_buckets=(128,), aot_warmup=False,
    )
    runner = ModelRunner(config)
    inputs = runner._dummy_inputs(4, 4, False)
    # Pre-backend lowering: the CPU backend PROMOTES bf16 all-reduces to f32
    # compute (region_*_promoted), so the wire dtype is only visible before
    # backend passes; TPU backends reduce bf16 natively.
    hlo = runner._step.lower(
        runner.params, runner.kv, runner.token_state, runner.rope, inputs,
        None, None, None, None, False, False, False, False, False, False,
        False, False,
    ).as_text()
    # A stablehlo.all_reduce is a multi-line block; its operand/result type
    # sits on the closing `}) : (tensor<...>) -> tensor<...>` line.
    types = [
        re.search(r"->\s*tensor<([^>]+)>", chunk[:800]).group(1)
        for chunk in hlo.split("stablehlo.all_reduce")[1:]
    ]
    assert types, "expected layer psums in the TP decode step"
    hid = str(runner.spec.hidden_size)
    acts = [t for t in types if t.endswith(f"x{hid}xbf16")
            or t.endswith(f"x{hid}xf32")]
    assert acts and all(t.endswith("bf16") for t in acts), types


def test_bf16_tp_engine_generates(tiny_qwen3_dir):
    """End-to-end smoke of the bf16-psum + distributed-sampling path."""
    from nanovllm_tpu import LLM, SamplingParams

    llm = LLM(
        tiny_qwen3_dir, dtype="bfloat16", tensor_parallel_size=2,
        max_model_len=128, max_num_batched_tokens=128, max_num_seqs=4,
        kvcache_block_size=16, num_kvcache_blocks=32,
        decode_buckets=(4,), prefill_buckets=(128,),
    )
    outs = llm.generate(
        [[3, 4, 5, 6], [7, 8, 9]],
        SamplingParams(temperature=0.8, max_tokens=5, ignore_eos=True),
        use_tqdm=False,
    )
    llm.exit()
    assert all(len(o["token_ids"]) == 5 for o in outs)
    assert all(0 <= t < 512 for o in outs for t in o["token_ids"])
