"""Qwen3-MoE family: HF greedy/logits parity, TP sharding parity, engine e2e.

The reference (nano-vllm) has no MoE support; this covers our sparse-FFN
extension (models/qwen3.py `_moe_ffn`: f32 softmax router, top-k routing,
sorted-dispatch grouped matmuls via lax.ragged_dot).
"""

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
    enforce_eager=True,
)


from nanovllm_tpu.utils.testing import hf_greedy as _hf_greedy


def hf_greedy(model_dir, token_ids, n_new):
    return _hf_greedy(model_dir, token_ids, n_new)


def test_moe_greedy_matches_hf(tiny_moe_dir):
    llm = LLM(tiny_moe_dir, **ENGINE_KW)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (9, 27, 40)]
    n_new = 10
    sp = SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True)
    outs = llm.generate(prompts, sp, use_tqdm=False)
    for prompt, out in zip(prompts, outs):
        assert out["token_ids"] == hf_greedy(tiny_moe_dir, prompt, n_new)
    # Prefix-cached second pass stays correct (paged KV + MoE interaction).
    outs2 = llm.generate(prompts, sp, use_tqdm=False)
    assert [o["token_ids"] for o in outs2] == [o["token_ids"] for o in outs]


def test_moe_tp2_matches_tp1(tiny_moe_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    rng = np.random.default_rng(4)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (11, 23)]
    tok1 = [
        o["token_ids"]
        for o in LLM(tiny_moe_dir, **ENGINE_KW).generate(
            prompts, sp, use_tqdm=False
        )
    ]
    tok2 = [
        o["token_ids"]
        for o in LLM(
            tiny_moe_dir, tensor_parallel_size=2, **ENGINE_KW
        ).generate(prompts, sp, use_tqdm=False)
    ]
    assert tok1 == tok2


def test_moe_ep2_matches_tp1(tiny_moe_dir):
    """Expert-parallel placement (each rank owns E/tp full-width experts;
    ragged_dot zero-fills non-local rows) reproduces single-device tokens."""
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    rng = np.random.default_rng(6)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (13, 29)]
    tok1 = [
        o["token_ids"]
        for o in LLM(tiny_moe_dir, **ENGINE_KW).generate(
            prompts, sp, use_tqdm=False
        )
    ]
    tok_ep = [
        o["token_ids"]
        for o in LLM(
            tiny_moe_dir, tensor_parallel_size=2, enable_expert_parallel=True,
            **ENGINE_KW
        ).generate(prompts, sp, use_tqdm=False)
    ]
    assert tok1 == tok_ep


def test_moe_offline_quantized_checkpoint(tiny_moe_dir, tmp_path):
    """tools/quantize_checkpoint on a MoE checkpoint: attention/embed tensors
    quantize, expert tensors pass through, and the reloaded engine matches
    load-time quantization token-for-token."""
    import os
    import subprocess
    import sys

    out_dir = str(tmp_path / "moe-int8")
    r = subprocess.run(
        [sys.executable, "tools/quantize_checkpoint.py", tiny_moe_dir,
         out_dir, "--mode", "int8"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ, NANOVLLM_PLATFORM="cpu"),
    )
    assert r.returncode == 0, r.stderr[-500:]
    prompt = np.random.default_rng(55).integers(2, 500, size=14).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    a = LLM(out_dir, **ENGINE_KW).generate([prompt], sp, use_tqdm=False)
    b = LLM(tiny_moe_dir, quantization="int8", **ENGINE_KW).generate(
        [prompt], sp, use_tqdm=False
    )
    assert a[0]["token_ids"] == b[0]["token_ids"]


def test_moe_int8_experts(tiny_moe_dir):
    """int8 expert weights (per-(expert, out-channel) scales applied after
    the grouped matmul): TP=1, width-sharded TP=2, and EP=2 produce identical
    tokens (per-column quantization commutes with the rank-block fuse), and
    stay close to the bf16 run."""
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    rng = np.random.default_rng(8)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (10, 26)]

    def toks(**kw):
        return [
            o["token_ids"]
            for o in LLM(tiny_moe_dir, **ENGINE_KW, **kw).generate(
                prompts, sp, use_tqdm=False
            )
        ]

    t1 = toks(quantization="int8")
    assert t1 == toks(quantization="int8", tensor_parallel_size=2)
    assert t1 == toks(quantization="int8", tensor_parallel_size=2,
                      enable_expert_parallel=True)
    bf16 = toks()
    agree = sum(a == b for a, b in zip(t1, bf16))
    assert agree >= 1, (t1, bf16)  # int8 drift may flip a borderline token


def test_moe_int4_experts(tiny_moe_dir):
    """int4 expert weights (k-nibble-packed storage, group-wise-k scales
    dequantized inside the grouped matmul) serve end-to-end at TP=1,
    width-sharded TP=2, and EP=2, staying close to the bf16 run. Cross-mesh
    token equality is NOT asserted: int4 quant groups (dense row weights AND
    expert stacks) legally shrink with the mesh on this fixture's off-size
    dims, so the quantized model itself differs per mesh — the sharding
    semantics are pinned exactly in test_moe_gmm with fixed quantization.
    The tiny dims also exercise the XLA dequant fallback; the kernel itself
    is covered by test_moe_gmm."""
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (10, 26)]

    def toks(**kw):
        return [
            o["token_ids"]
            for o in LLM(tiny_moe_dir, **ENGINE_KW, **kw).generate(
                prompts, sp, use_tqdm=False
            )
        ]

    bf16 = toks()
    for kw in (
        dict(quantization="int4"),
        dict(quantization="int4", tensor_parallel_size=2),
        dict(quantization="int4", tensor_parallel_size=2,
             enable_expert_parallel=True),
    ):
        t = toks(**kw)
        assert all(len(x) == 8 for x in t)
        # int4 drift may flip borderline tokens of this random tiny model,
        # but at least one greedy completion should survive quantization.
        agree = sum(a == b for a, b in zip(t, bf16))
        assert agree >= 1, (kw, t, bf16)


def test_moe_ep2_tp2_2d_mesh_matches_tp1(tiny_moe_dir):
    """r5 (ROADMAP #4): the 2-D ep x tp mesh — experts sharded over a
    dedicated "ep" axis at width/tp, attention/dense replicated across ep —
    reproduces single-device tokens exactly (f32 fixture; the expert
    combine's two-axis psum must equal the 1-D sum)."""
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    rng = np.random.default_rng(12)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (11, 27)]
    tok1 = [
        o["token_ids"]
        for o in LLM(tiny_moe_dir, **ENGINE_KW).generate(
            prompts, sp, use_tqdm=False
        )
    ]
    for ep, tp in ((2, 2), (4, 1), (2, 1)):
        toks = [
            o["token_ids"]
            for o in LLM(
                tiny_moe_dir, tensor_parallel_size=tp,
                expert_parallel_size=ep, **ENGINE_KW
            ).generate(prompts, sp, use_tqdm=False)
        ]
        assert toks == tok1, (ep, tp)


def test_moe_ep_tp_2d_int8_experts(tiny_moe_dir):
    """2-D mesh with int8 expert weights: per-out-channel scales follow the
    width shard for gate_up and commute with the width psum for down."""
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    rng = np.random.default_rng(13)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (10, 24)]
    a = [
        o["token_ids"]
        for o in LLM(tiny_moe_dir, quantization="int8", **ENGINE_KW).generate(
            prompts, sp, use_tqdm=False
        )
    ]
    b = [
        o["token_ids"]
        for o in LLM(
            tiny_moe_dir, quantization="int8", tensor_parallel_size=2,
            expert_parallel_size=2, **ENGINE_KW
        ).generate(prompts, sp, use_tqdm=False)
    ]
    assert a == b


def test_ep_size_requires_moe(tiny_qwen3_dir):
    with pytest.raises(AssertionError, match="MoE"):
        LLM(tiny_qwen3_dir, expert_parallel_size=2, **ENGINE_KW)
