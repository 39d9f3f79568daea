"""Presence / frequency / repetition penalties (ops/penalties.py + the
"penalized" step variant).

The reference has no penalties (its sampler is temperature-only,
nanovllm/layers/sampler.py:8-12); semantics here follow vLLM. The count state
lives ON DEVICE (the async pipeline means the host lags the sampled stream),
so these tests pin the full loop: slab reset/scatter at prefill, per-step
sampled-token counting between chained decode steps, rebuild after
preemption, and isolation from non-penalized traffic sharing a batch.
"""

from collections import Counter

import numpy as np
import pytest

import jax.numpy as jnp

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.ops.penalties import apply_penalties

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
    num_penalty_slots=4,
)


@pytest.fixture(scope="module")
def llm(tiny_qwen3_dir):
    return LLM(tiny_qwen3_dir, **ENGINE_KW)


# ----------------------------------------------------------------- unit math


def test_apply_penalties_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    s, v = 5, 37
    logits = rng.normal(size=(s, v)).astype(np.float32)
    counts = rng.integers(0, 4, size=(s, v)).astype(np.int32)
    prompt = (rng.random((s, v)) < 0.2).astype(np.int8)
    presence = np.array([0.0, 0.5, -1.0, 0.0, 2.0], np.float32)
    frequency = np.array([0.0, 0.2, 0.0, -0.3, 1.5], np.float32)
    repetition = np.array([1.0, 1.3, 0.7, 1.0, 2.0], np.float32)

    ref = logits.copy()
    for i in range(s):
        for t in range(v):
            seen_out = counts[i, t] > 0
            if seen_out or prompt[i, t]:
                ref[i, t] = (
                    ref[i, t] / repetition[i]
                    if ref[i, t] > 0 else ref[i, t] * repetition[i]
                )
            ref[i, t] -= frequency[i] * counts[i, t]
            if seen_out:
                ref[i, t] -= presence[i]

    out = np.asarray(apply_penalties(
        jnp.asarray(logits), jnp.asarray(counts), jnp.asarray(prompt),
        jnp.asarray(presence), jnp.asarray(frequency), jnp.asarray(repetition),
    ))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_neutral_parameters_are_identity():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 17)).astype(np.float32)
    counts = rng.integers(0, 4, size=(3, 17)).astype(np.int32)
    prompt = (rng.random((3, 17)) < 0.5).astype(np.int8)
    out = np.asarray(apply_penalties(
        jnp.asarray(logits), jnp.asarray(counts), jnp.asarray(prompt),
        jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.ones(3, jnp.float32),
    ))
    np.testing.assert_array_equal(out, logits)


# ------------------------------------------------------------- HF-loop oracle


def hf_penalized_greedy(model_dir, token_ids, n_new, *, presence=0.0,
                        frequency=0.0, repetition=1.0):
    """Manual HF greedy loop applying vLLM-semantics penalties on host."""
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(
        model_dir, dtype=torch.float32
    )
    model.eval()
    ids = list(token_ids)
    prompt_set = set(ids)
    out_counts = Counter()
    with torch.no_grad():
        for _ in range(n_new):
            logits = model(torch.tensor([ids])).logits[0, -1].numpy().copy()
            for t in prompt_set | set(out_counts):
                logits[t] = (
                    logits[t] / repetition
                    if logits[t] > 0 else logits[t] * repetition
                )
            for t, c in out_counts.items():
                logits[t] -= frequency * c + presence
            nxt = int(logits.argmax())
            ids.append(nxt)
            out_counts[nxt] += 1
    return ids[len(token_ids):]


def test_greedy_penalties_match_hf_oracle(llm, tiny_qwen3_dir):
    rng = np.random.default_rng(3)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (9, 21, 14)]
    pens = [
        dict(presence=1.5, frequency=0.0, repetition=1.0),
        dict(presence=0.0, frequency=0.9, repetition=1.0),
        dict(presence=0.0, frequency=0.0, repetition=1.8),
    ]
    n_new = 10
    sps = [
        SamplingParams(
            temperature=0.0, max_tokens=n_new, ignore_eos=True,
            presence_penalty=p["presence"], frequency_penalty=p["frequency"],
            repetition_penalty=p["repetition"],
        )
        for p in pens
    ]
    outs = llm.generate(prompts, sps, use_tqdm=False)
    for prompt, p, out in zip(prompts, pens, outs):
        assert out["token_ids"] == hf_penalized_greedy(
            tiny_qwen3_dir, prompt, n_new, **p
        ), p


def test_penalty_changes_output_and_plain_rows_unaffected(llm):
    """A penalized and a plain copy of the same prompt run in one batch; the
    plain row must match an all-plain run exactly (slab isolation), and the
    penalized row must diverge (the penalty actually bites: an untrained
    model loops hard under greedy)."""
    prompt = list(range(2, 20))
    sp_plain = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    sp_pen = SamplingParams(
        temperature=0.0, max_tokens=16, ignore_eos=True,
        frequency_penalty=1.0, presence_penalty=1.0,
    )
    baseline = llm.generate([prompt], sp_plain, use_tqdm=False)[0]["token_ids"]
    outs = llm.generate([prompt, prompt], [sp_pen, sp_plain], use_tqdm=False)
    assert outs[1]["token_ids"] == baseline
    assert outs[0]["token_ids"] != baseline
    # Frequency+presence at this strength caps repeats well below the
    # unpenalized loop's counts.
    assert max(Counter(outs[0]["token_ids"]).values()) <= max(
        Counter(baseline).values()
    )


def test_more_penalized_requests_than_slots(llm, tiny_qwen3_dir):
    """6 penalized requests through 4 penalty slots: admission queues on the
    slot pool and every request still matches its single-request result."""
    rng = np.random.default_rng(5)
    prompts = [rng.integers(2, 500, size=n).tolist()
               for n in (7, 11, 9, 13, 8, 10)]
    sp = SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True,
        repetition_penalty=1.6,
    )
    outs = llm.generate(prompts, sp, use_tqdm=False)
    for prompt, out in zip(prompts, outs):
        assert out["token_ids"] == hf_penalized_greedy(
            tiny_qwen3_dir, prompt, 8, repetition=1.6
        )


def test_counts_rebuild_after_preemption(tiny_qwen3_dir):
    """Force preemption mid-decode (tiny KV pool, competing sequences): the
    re-prefill re-embeds prompt + completion so the device counters rebuild
    in a fresh slab row, and the completion still matches the HF oracle."""
    llm = LLM(
        tiny_qwen3_dir,
        **{**ENGINE_KW, "num_kvcache_blocks": 6, "fetch_interval": 2},
    )
    rng = np.random.default_rng(7)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (30, 26)]
    n_new = 24  # two seqs need 8 blocks total vs a 6-block pool -> preemption
    sp = SamplingParams(
        temperature=0.0, max_tokens=n_new, ignore_eos=True,
        frequency_penalty=0.8,
    )
    outs = llm.generate(prompts, sp, use_tqdm=False)
    for prompt, out in zip(prompts, outs):
        assert out["token_ids"] == hf_penalized_greedy(
            tiny_qwen3_dir, prompt, n_new, frequency=0.8
        )
    llm.exit()


def test_penalties_require_slots(tiny_qwen3_dir, llm):
    with pytest.raises(AssertionError, match="num_penalty_slots"):
        no_slots = LLM(
            tiny_qwen3_dir, **{**ENGINE_KW, "num_penalty_slots": 0}
        )
        try:
            no_slots.generate(
                [[2, 3, 4]],
                SamplingParams(temperature=0.0, presence_penalty=1.0),
                use_tqdm=False,
            )
        finally:
            no_slots.exit()


def test_param_validation():
    with pytest.raises(AssertionError):
        SamplingParams(presence_penalty=3.0)
    with pytest.raises(AssertionError):
        SamplingParams(frequency_penalty=-2.5)
    with pytest.raises(AssertionError):
        SamplingParams(repetition_penalty=0.0)
    assert not SamplingParams().uses_penalties
    assert SamplingParams(repetition_penalty=1.2).uses_penalties


def test_warmup_precompiles_penalized_variants(tiny_qwen3_dir):
    """With num_penalty_slots > 0, warmup AOT-compiles the penalized step
    variant too (ADVICE r3: a server otherwise pays a multi-second tunnel
    compile on the first penalized request per bucket)."""
    llm = LLM(
        tiny_qwen3_dir,
        **{**ENGINE_KW, "enforce_eager": False, "aot_warmup": True},
    )
    try:
        runner = llm.model_runner
        keys = set(runner._compiled)
        pen_decode = [k for k in keys if k[8] and not k[3]]
        pen_prefill = [k for k in keys if k[8] and k[3]]
        assert len(pen_decode) == len(runner.config.decode_buckets)
        # r5: every prefill bucket is covered (a short penalized prompt's
        # completing chunk lands in a small bucket).
        assert {k[0] for k in pen_prefill} == set(runner.prefill_token_buckets)
        # The precompiled executable actually serves a penalized request.
        out = llm.generate(
            [[2, 3, 4]],
            SamplingParams(
                temperature=0.0, max_tokens=4, presence_penalty=0.5
            ),
            use_tqdm=False,
        )
        assert len(out[0]["token_ids"]) == 4
    finally:
        llm.exit()
