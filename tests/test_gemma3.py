"""Gemma-3 family: GeGLU + sandwich/(1+w) norms + sqrt(D) embedding scale +
local/global sliding-window interleave with dual rope, vs HF transformers.

Beyond the reference (nano-vllm serves Qwen3 only). The fixture's window (8)
and pattern (every 3rd layer global) are tiny so both the local mask and the
global layers bite within short prompts; the per-layer window rides the
kernels/oracle as a runtime scalar (one compiled program for all layers).
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
WINDOW = 8


@pytest.fixture(scope="module")
def tiny_gemma3_dir(tmp_path_factory):
    import torch
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM

    path = str(tmp_path_factory.mktemp("tiny_gemma3"))
    cfg = Gemma3TextConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        sliding_window=WINDOW,
        sliding_window_pattern=3,   # layers 2 (0-based) and 5... -> global
        rope_theta=1_000_000.0,
        rope_local_base_freq=10_000.0,
        query_pre_attn_scalar=32.0,  # != head_dim: exercises the scale path
        tie_word_embeddings=True,
        torch_dtype="float32",
    )
    torch.manual_seed(3)
    Gemma3ForCausalLM(cfg).save_pretrained(path, safe_serialization=True)
    from nanovllm_tpu.utils.testing import _write_tiny_tokenizer

    _write_tiny_tokenizer(path)
    return path


from nanovllm_tpu.utils.testing import hf_greedy as _hf_greedy


def hf_greedy(model_dir, token_ids, n_new):
    return _hf_greedy(model_dir, token_ids, n_new,
                      attn_implementation="eager")


def test_gemma3_matches_hf(tiny_gemma3_dir):
    llm = LLM(tiny_gemma3_dir, **ENGINE_KW)
    spec = llm.model_runner.spec
    assert spec.layer_windows == (WINDOW, WINDOW, 0, WINDOW)
    assert spec.sliding_window is None  # mixed -> no uniform window
    assert spec.norm_plus_one and spec.sandwich_norms and spec.embed_scale
    rng = np.random.default_rng(13)
    # Prompts 3-5x the window so local layers mask real history.
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (29, 41)]
    n_new = 12
    sp = SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True,
                        logprobs=True)
    outs = llm.generate(prompts, sp, use_tqdm=False)
    for p, o in zip(prompts, outs):
        assert o["token_ids"] == hf_greedy(tiny_gemma3_dir, p, n_new)

    # The window must matter: a no-local-mask run diverges in logprobs.
    import jax.numpy as jnp

    nowin = LLM(tiny_gemma3_dir, **ENGINE_KW)
    nowin.model_runner.spec = spec._replace(
        layer_windows=(1 << 20,) * 4
    )
    nowin.model_runner._build_step_fns()
    outs_nw = nowin.generate(prompts, sp, use_tqdm=False)
    diffs = max(
        float(np.abs(np.asarray(a["logprobs"]) - np.asarray(b["logprobs"])).max())
        for a, b in zip(outs, outs_nw)
    )
    assert diffs > 1e-4, f"local window masks had no effect: {diffs}"


def test_gemma3_chunked_prefill_matches(tiny_gemma3_dir):
    """Chunked prefill crosses the local-window boundary mid-prompt."""
    kw = dict(ENGINE_KW, max_num_batched_tokens=48, prefill_buckets=(48,),
              max_model_len=48)
    llm = LLM(tiny_gemma3_dir, **kw)
    rng = np.random.default_rng(14)
    # Two prompts so the second only partially fits the 48-token budget and
    # prefills in chunks across the window/global-layer boundary.
    prompts = [rng.integers(2, 500, size=40).tolist(),
               rng.integers(2, 500, size=30).tolist()]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    outs = llm.generate(prompts, sp, use_tqdm=False)
    for p, o in zip(prompts, outs):
        assert o["token_ids"] == hf_greedy(tiny_gemma3_dir, p, 6)


def test_gemma3_tp2_matches_tp1(tiny_gemma3_dir):
    """Per-layer windows + dual rope + sandwich norms under shard_map TP
    (kv heads 2 -> 1 per rank)."""
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    rng = np.random.default_rng(15)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (19, 30)]
    tok1 = [
        o["token_ids"]
        for o in LLM(tiny_gemma3_dir, **ENGINE_KW).generate(
            prompts, sp, use_tqdm=False
        )
    ]
    tok2 = [
        o["token_ids"]
        for o in LLM(
            tiny_gemma3_dir, tensor_parallel_size=2, **ENGINE_KW
        ).generate(prompts, sp, use_tqdm=False)
    ]
    assert tok1 == tok2
