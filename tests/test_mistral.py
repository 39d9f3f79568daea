"""Mistral family: sliding-window attention (mask-only v1) vs HF.

Beyond the reference (nano-vllm serves Qwen3 only). Prompts and completions
deliberately exceed the window so the mask actually bites."""

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
def tiny_mistral_dir(tmp_path_factory):
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    path = str(tmp_path_factory.mktemp("tiny_mistral"))
    cfg = MistralConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=1024,
        rope_theta=10000.0,
        sliding_window=WINDOW,
        tie_word_embeddings=True,
        torch_dtype="float32",
    )
    torch.manual_seed(5)
    MistralForCausalLM(cfg).save_pretrained(path, safe_serialization=True)
    from nanovllm_tpu.utils.testing import _write_tiny_tokenizer

    _write_tiny_tokenizer(path)
    return path


from nanovllm_tpu.utils.testing import hf_greedy as _hf_greedy


def hf_greedy(model_dir, token_ids, n_new):
    return _hf_greedy(model_dir, token_ids, n_new, attn_implementation="eager")


def test_mistral_swa_matches_hf(tiny_mistral_dir):
    llm = LLM(tiny_mistral_dir, **ENGINE_KW)
    assert llm.model_runner.spec.sliding_window == WINDOW
    rng = np.random.default_rng(7)
    # Prompts 3-5x the window; 12 decode steps walk the window further.
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (25, 41)]
    n_new = 12
    sp = SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True,
                        logprobs=True)
    outs = llm.generate(prompts, sp, use_tqdm=False)
    for prompt, out in zip(prompts, outs):
        assert out["token_ids"] == hf_greedy(tiny_mistral_dir, prompt, n_new)
    # The window must matter: the unwindowed model's chosen-token logprobs
    # differ (greedy argmax can coincide on a tiny model, so compare the
    # distribution, not the tokens — the oracle must not be vacuous).
    nowin = LLM(tiny_mistral_dir, **ENGINE_KW)
    nowin.model_runner.spec = nowin.model_runner.spec._replace(
        sliding_window=None
    )
    nowin.model_runner._build_step_fns()
    outs2 = nowin.generate(prompts, sp, use_tqdm=False)
    diffs = [
        max(abs(x - y) for x, y in zip(a["logprobs"], b["logprobs"]))
        for a, b in zip(outs, outs2)
    ]
    assert max(diffs) > 1e-3, (
        f"window mask had no effect on logprobs: {diffs}"
    )


def test_mistral_tp2_matches_tp1(tiny_mistral_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (19, 30)]
    tok1 = [
        o["token_ids"]
        for o in LLM(tiny_mistral_dir, **ENGINE_KW).generate(
            prompts, sp, use_tqdm=False
        )
    ]
    tok2 = [
        o["token_ids"]
        for o in LLM(
            tiny_mistral_dir, tensor_parallel_size=2, **ENGINE_KW
        ).generate(prompts, sp, use_tqdm=False)
    ]
    assert tok1 == tok2


def test_rolling_eviction_outlives_pool(tiny_mistral_dir):
    """A completion whose total KV footprint exceeds the whole pool still
    generates HF-exact tokens: rolling eviction (window 8, block 16)
    releases pages as the window rolls past, so the engine never preempts."""
    kw = dict(ENGINE_KW, num_kvcache_blocks=6, max_model_len=120)
    llm = LLM(tiny_mistral_dir, **kw)
    assert llm.model_runner.config.attention_window == WINDOW
    rng = np.random.default_rng(11)
    prompt = rng.integers(2, 500, size=20).tolist()
    n_new = 90  # total 110 tokens = 7 pages > the 6-block pool
    sp = SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True)
    out = llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]
    assert out == hf_greedy(tiny_mistral_dir, prompt, n_new)
    bm = llm.scheduler.block_manager
    assert len(bm.used_block_ids) == 0
