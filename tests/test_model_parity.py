"""Numerical parity of the JAX Qwen3 forward vs HF transformers (CPU fp32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.engine.inputs import build_step_inputs
from nanovllm_tpu.models import qwen3
from nanovllm_tpu.ops.attention import ragged_paged_attention_ref
from nanovllm_tpu.utils.loader import load_params

BLOCK_SIZE = 16


def hf_logits(model_dir, token_ids):
    import torch
    from transformers import Qwen3ForCausalLM

    model = Qwen3ForCausalLM.from_pretrained(model_dir, torch_dtype=torch.float32)
    model.eval()
    with torch.no_grad():
        out = model(torch.tensor([token_ids]))
    return out.logits[0].numpy()


def our_logits(model_dir, token_ids, chunks=None):
    """Run our functional forward; optionally split the prompt into chunks to
    exercise the paged-cache read path (chunked prefill semantics)."""
    from transformers import AutoConfig

    spec = qwen3.spec_from_hf(AutoConfig.from_pretrained(model_dir))
    plan = qwen3.hf_param_plan(spec, tp=1)
    params_np = load_params(spec, plan, model_dir, tp=1)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params_np)

    n = len(token_ids)
    num_blocks = 8
    kv_shape = (spec.num_layers, spec.num_kv_heads, num_blocks, BLOCK_SIZE, spec.head_dim)
    kv = (jnp.zeros(kv_shape, jnp.float32), jnp.zeros(kv_shape, jnp.float32))
    block_table = list(range(-(-n // BLOCK_SIZE)))
    attn = lambda q, kn, vn, kc, vc, layer, meta: ragged_paged_attention_ref(
        q, kn, vn, kc, vc, layer, meta, sm_scale=spec.head_dim**-0.5
    )

    chunks = chunks or [n]
    assert sum(chunks) == n
    hidden_all = []
    start = 0
    for chunk_len in chunks:
        chunk = token_ids[start: start + chunk_len]
        inputs = build_step_inputs(
            [
                dict(
                    token_ids=chunk,
                    start=start,
                    kv_len=start + chunk_len,
                    block_table=block_table,
                    temperature=0.0,
                )
            ],
            block_size=BLOCK_SIZE,
            num_tokens_bucket=chunk_len,
            num_seqs_bucket=1,
            max_blocks_per_seq=num_blocks,
            rng=jnp.zeros(2, jnp.uint32),
        )
        hidden, kv = qwen3.forward(
            spec, params, kv, inputs, attn_impl=attn, scan_layers=True
        )
        hidden_all.append(hidden)
        start += chunk_len
    hidden = jnp.concatenate(hidden_all, axis=0)
    logits = hidden @ qwen3.lm_head_weight(params).T
    return np.asarray(logits)


@pytest.fixture(scope="module")
def prompt():
    rng = np.random.default_rng(0)
    return rng.integers(0, 500, size=45).tolist()


# fp32 accumulation-order drift between torch-CPU (oneDNN) and XLA-CPU reaches
# ~4e-3 on raw logits even for identical math; structural bugs (wrong RoPE
# convention, missing q/k-norm, bad fuse layout) blow past 1e-1. Gate on a
# loose allclose plus exact greedy-argmax agreement at every position.
def _assert_parity(ours, ref):
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-2)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))


def test_forward_matches_hf(tiny_qwen3_dir, prompt):
    ref = hf_logits(tiny_qwen3_dir, prompt)
    ours = our_logits(tiny_qwen3_dir, prompt)
    _assert_parity(ours, ref)


def test_chunked_prefill_matches_full(tiny_qwen3_dir, prompt):
    ref = hf_logits(tiny_qwen3_dir, prompt)
    ours = our_logits(tiny_qwen3_dir, prompt, chunks=[20, 16, 9])
    _assert_parity(ours, ref)


def test_scan_and_unrolled_agree(tiny_qwen3_dir, prompt):
    from transformers import AutoConfig

    spec = qwen3.spec_from_hf(AutoConfig.from_pretrained(tiny_qwen3_dir))
    plan = qwen3.hf_param_plan(spec, tp=1)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32),
        load_params(spec, plan, tiny_qwen3_dir, tp=1),
    )
    n = len(prompt)
    num_blocks = 8
    kv_shape = (spec.num_layers, spec.num_kv_heads, num_blocks, BLOCK_SIZE, spec.head_dim)
    attn = lambda q, kn, vn, kc, vc, layer, meta: ragged_paged_attention_ref(
        q, kn, vn, kc, vc, layer, meta, sm_scale=spec.head_dim**-0.5
    )
    inputs = build_step_inputs(
        [
            dict(
                token_ids=prompt,
                start=0,
                kv_len=n,
                block_table=list(range(-(-n // BLOCK_SIZE))),
                temperature=0.0,
            )
        ],
        block_size=BLOCK_SIZE,
        num_tokens_bucket=n,
        num_seqs_bucket=1,
        max_blocks_per_seq=num_blocks,
        rng=jnp.zeros(2, jnp.uint32),
    )
    kv = (jnp.zeros(kv_shape, jnp.float32), jnp.zeros(kv_shape, jnp.float32))
    h1, _ = qwen3.forward(spec, params, kv, inputs, attn_impl=attn, scan_layers=True)
    kv = (jnp.zeros(kv_shape, jnp.float32), jnp.zeros(kv_shape, jnp.float32))
    h2, _ = qwen3.forward(spec, params, kv, inputs, attn_impl=attn, scan_layers=False)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-5)
