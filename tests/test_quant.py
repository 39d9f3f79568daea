"""Weight-only quantization: numerics of the quantized matmul paths and the
end-to-end engine under each mode (reference has no quantization; this is the
BASELINE.md north-star extension)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops import quant


@pytest.mark.parametrize("mode", ["int8", "int4", "fp8"])
def test_matmul_matches_dequantized_dense(mode):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 96)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
    qw = quant.quantize_array(w, mode, axis=0)
    assert qw.q.shape == w.shape

    # Dense reference using the explicitly dequantized weight.
    if mode == "int4":
        g = qw.group
        deq = (
            np.asarray(qw.q, np.float32).reshape(256 // g, g, 96)
            * np.asarray(qw.scale)[:, None, :]
        ).reshape(256, 96)
    else:
        deq = np.asarray(qw.q, np.float32) * np.asarray(qw.scale)[None, :]
    ref = np.asarray(x) @ deq
    out = quant.matmul(x, qw)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)
    # And quantization error itself is bounded.
    exact = np.asarray(x) @ w
    err = np.abs(np.asarray(out) - exact).max()
    assert err < {"int8": 0.05, "int4": 0.4, "fp8": 0.1}[mode]


@pytest.mark.parametrize("mode", ["int8", "int4", "fp8"])
def test_embed_and_head(mode):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.1  # [vocab, d]
    qw = quant.quantize_array(w, mode, axis=1)
    ids = jnp.asarray([0, 5, 63, 5])

    rows = quant.embed_rows(qw, ids, jnp.float32)
    np.testing.assert_allclose(np.asarray(rows), w[np.asarray(ids)],
                               rtol=0, atol=0.05)

    h = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    logits = quant.head_matmul(h, qw)
    ref = np.asarray(h) @ w.T
    # Expected worst-case error scales ~sqrt(d) * scale/2 per dot.
    atol = {"int8": 0.05, "int4": 0.6, "fp8": 0.1}[mode]
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=0, atol=atol)
    # Greedy decisions should survive quantization on well-separated logits.
    assert (np.asarray(logits).argmax(-1) == ref.argmax(-1)).mean() > 0.7


@pytest.mark.parametrize("mode", ["int8", "int4", "fp8"])
def test_engine_e2e_quantized(tiny_qwen3_dir, mode):
    """The engine runs end-to-end under each quant mode and mostly agrees with
    the bf16 path on greedy decodes of a tiny model."""
    from nanovllm_tpu import LLM, SamplingParams

    prompts = [[3, 4, 5, 6, 7], [9, 8, 7]]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    kwargs = dict(
        dtype="float32",
        max_model_len=128,
        max_num_batched_tokens=128,
        max_num_seqs=4,
        kvcache_block_size=16,
        num_kvcache_blocks=32,
        decode_buckets=(4,),
        prefill_buckets=(128,),
    )
    base = LLM(tiny_qwen3_dir, **kwargs)
    ref = base.generate(prompts, sp, use_tqdm=False)
    base.exit()

    llm = LLM(tiny_qwen3_dir, quantization=mode, **kwargs)
    out = llm.generate(prompts, sp, use_tqdm=False)
    llm.exit()
    assert len(out) == 2 and all(len(o["token_ids"]) == 6 for o in out)
    # Token-level agreement is not guaranteed under quantization of a random
    # tiny model, but the first greedy token should usually survive.
    agree = sum(
        o["token_ids"][0] == r["token_ids"][0] for o, r in zip(out, ref)
    )
    assert agree >= 1, (out, ref)


def test_quantized_tp_matches_single_chip(tiny_qwen3_dir):
    """int8 weights sharded over a 2-way mesh produce the same greedy tokens
    as tp=1 (vocab/col/row-parallel QuantWeight shardings)."""
    from nanovllm_tpu import LLM, SamplingParams

    prompts = [[3, 4, 5, 6, 7, 8, 9, 10]]
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    kwargs = dict(
        dtype="float32",
        quantization="int8",
        max_model_len=128,
        max_num_batched_tokens=128,
        max_num_seqs=4,
        kvcache_block_size=16,
        num_kvcache_blocks=32,
        decode_buckets=(4,),
        prefill_buckets=(128,),
    )
    one = LLM(tiny_qwen3_dir, tensor_parallel_size=1, **kwargs)
    ref = one.generate(prompts, sp, use_tqdm=False)
    one.exit()
    two = LLM(tiny_qwen3_dir, tensor_parallel_size=2, **kwargs)
    out = two.generate(prompts, sp, use_tqdm=False)
    two.exit()
    assert out[0]["token_ids"] == ref[0]["token_ids"]


def test_int4_kv_tp_matches_single_chip(tiny_qwen3_4kv_dir):
    """int4 KV under TP=2: the nibble pairing is shard-local (each shard
    packs its own contiguous kv heads), so a 2-way mesh must sample exactly
    the tokens tp=1 does."""
    from nanovllm_tpu import LLM, SamplingParams

    tiny_qwen3_dir = tiny_qwen3_4kv_dir
    prompts = [[3, 4, 5, 6, 7, 8, 9, 10]]
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    kwargs = dict(
        dtype="float32",
        kv_cache_dtype="int4",
        max_model_len=128,
        max_num_batched_tokens=128,
        max_num_seqs=4,
        kvcache_block_size=16,
        num_kvcache_blocks=32,
        decode_buckets=(4,),
        prefill_buckets=(128,),
    )
    one = LLM(tiny_qwen3_dir, tensor_parallel_size=1, **kwargs)
    ref = one.generate(prompts, sp, use_tqdm=False)
    one.exit()
    two = LLM(tiny_qwen3_dir, tensor_parallel_size=2, **kwargs)
    out = two.generate(prompts, sp, use_tqdm=False)
    two.exit()
    assert out[0]["token_ids"] == ref[0]["token_ids"]
