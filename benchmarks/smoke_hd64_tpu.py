"""Real-chip e2e: head_dim-64 arch through the Pallas path (padded cache).

Run from the repo root. Validates model_runner.kernel_head_dim padding on
hardware (Mosaic lane-pads [.., 64] HBM memrefs, breaking page slices — so
off-size head dims run the kernels at the next 128 multiple with zero-padded
q/k/v) plus the compiler-measured KV-pool sizing, against the jnp oracle.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.utils.testing import make_qwen3_dir

arch = dict(
    vocab_size=2048, hidden_size=512, intermediate_size=1024,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
    head_dim=64, max_position_embeddings=2048, rope_theta=10000.0,
    rms_norm_eps=1e-6, tie_word_embeddings=True,
)
model_dir = make_qwen3_dir("/tmp/qwen3-hd64-smoke", arch)
llm = LLM(model_dir, random_weights=True, max_model_len=1024,
          max_num_batched_tokens=2048, max_num_seqs=8,
          kvcache_block_size=256, kv_cache_dtype="int8",
          decode_buckets=(8,), prefill_buckets=(2048,), fetch_interval=4)
r = llm.model_runner
print("use_pallas:", r.use_pallas, "kernel_hd:", r.kernel_head_dim,
      "blocks:", llm.config.num_kvcache_blocks)
assert r.use_pallas and r.kernel_head_dim == 128
rng = np.random.default_rng(0)
prompts = [rng.integers(2, 2000, size=n).tolist() for n in (60, 300, 7)]
outs = llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=16,
                                            ignore_eos=True), use_tqdm=False)
assert all(len(o["token_ids"]) == 16 for o in outs)
# Greedy equivalence vs the jnp oracle path (same weights, same seed).
llm.exit()  # free the sized KV pool before the second engine
llm2 = LLM(model_dir, random_weights=True, max_model_len=1024,
           max_num_batched_tokens=2048, max_num_seqs=8,
           kvcache_block_size=256, kv_cache_dtype="int8",
           use_pallas_attention=False, decode_buckets=(8,),
           prefill_buckets=(2048,), fetch_interval=4,
           num_kvcache_blocks=64)
outs2 = llm2.generate(prompts, SamplingParams(temperature=0.0, max_tokens=16,
                                              ignore_eos=True), use_tqdm=False)
agree = sum(o["token_ids"] == o2["token_ids"] for o, o2 in zip(outs, outs2))
print(f"greedy agreement vs oracle: {agree}/3")
assert agree >= 2, [o["token_ids"] for o in outs] + [o["token_ids"] for o in outs2]
print("HD64 CHIP E2E PASS")
