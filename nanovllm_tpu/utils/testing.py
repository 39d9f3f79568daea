"""Offline model-directory synthesis for benchmarks, dryruns, and tests.

No-network environments have no HF checkpoints; throughput and compile
behavior depend only on the architecture, so benchmarks run real model shapes
with random weights (``LLM(..., random_weights=True)`` skips safetensors).
"""

from __future__ import annotations

import os

# Qwen3-0.6B architecture (HF Qwen/Qwen3-0.6B config.json values).
QWEN3_0_6B = dict(
    vocab_size=151936,
    hidden_size=1024,
    intermediate_size=3072,
    num_hidden_layers=28,
    num_attention_heads=16,
    num_key_value_heads=8,
    head_dim=128,
    max_position_embeddings=40960,
    rope_theta=1000000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=True,
)

# Qwen3-8B architecture.
QWEN3_8B = dict(
    vocab_size=151936,
    hidden_size=4096,
    intermediate_size=12288,
    num_hidden_layers=36,
    num_attention_heads=32,
    num_key_value_heads=8,
    head_dim=128,
    max_position_embeddings=40960,
    rope_theta=1000000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=False,
)

# Qwen3-32B architecture (the BASELINE.md TP=8 / multi-host config).
QWEN3_32B = dict(
    vocab_size=152064,
    hidden_size=5120,
    intermediate_size=27648,
    num_hidden_layers=64,
    num_attention_heads=64,
    num_key_value_heads=8,
    head_dim=128,
    max_position_embeddings=40960,
    rope_theta=1000000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=False,
)

# Qwen2.5-72B architecture (the BASELINE.md 72B multi-host config; Qwen2
# family — qkv bias, no qk-norm — served by the same decoder with spec flags).
QWEN2_72B = dict(
    vocab_size=152064,
    hidden_size=8192,
    intermediate_size=29568,
    num_hidden_layers=80,
    num_attention_heads=64,
    num_key_value_heads=8,
    max_position_embeddings=32768,
    rope_theta=1000000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=False,
    _family="qwen2",
)

# Qwen3-30B-A3B architecture (sparse MoE: 128 experts, 8 active; the MoE
# serving config — 3B active params per token, bf16 experts need multi-chip).
QWEN3_30B_A3B = dict(
    vocab_size=151936,
    hidden_size=2048,
    intermediate_size=6144,
    moe_intermediate_size=768,
    num_experts=128,
    num_experts_per_tok=8,
    norm_topk_prob=True,
    decoder_sparse_step=1,
    mlp_only_layers=[],
    num_hidden_layers=48,
    num_attention_heads=32,
    num_key_value_heads=4,
    head_dim=128,
    max_position_embeddings=40960,
    rope_theta=1000000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=False,
    _family="qwen3_moe",
)

# A ~1.3B-active MoE that fits ONE v5e chip (bf16 experts): the 1-chip MoE
# throughput config for bench.py (BENCH_ARCH=moe-mini).
QWEN3_MOE_MINI = dict(
    vocab_size=151936,
    hidden_size=1024,
    intermediate_size=3072,
    moe_intermediate_size=512,
    num_experts=32,
    num_experts_per_tok=4,
    norm_topk_prob=True,
    decoder_sparse_step=1,
    mlp_only_layers=[],
    num_hidden_layers=16,
    num_attention_heads=16,
    num_key_value_heads=8,
    head_dim=128,
    max_position_embeddings=40960,
    rope_theta=1000000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=True,
    _family="qwen3_moe",
)

# Mistral-7B-v0.3 architecture (sliding-window attention family).
MISTRAL_7B = dict(
    vocab_size=32768,
    hidden_size=4096,
    intermediate_size=14336,
    num_hidden_layers=32,
    num_attention_heads=32,
    num_key_value_heads=8,
    head_dim=128,
    max_position_embeddings=32768,
    rope_theta=1000000.0,
    rms_norm_eps=1e-5,
    sliding_window=4096,
    tie_word_embeddings=False,
    _family="mistral",
)

# Gemma-3-1B text architecture (google/gemma-3-1b-it config.json values):
# 5-local:1-global sliding-window interleave (window 512) with dual rope —
# local layers read at most 3 KV pages however long the context grows
# (window-aware page skipping; the window rides the kernels as a runtime
# scalar so all 26 layers share one compiled program).
GEMMA3_1B = dict(
    vocab_size=262144,
    hidden_size=1152,
    intermediate_size=6912,
    num_hidden_layers=26,
    num_attention_heads=4,
    num_key_value_heads=1,
    head_dim=256,
    max_position_embeddings=32768,
    sliding_window=512,
    sliding_window_pattern=6,
    rope_theta=1000000.0,
    rope_local_base_freq=10000.0,
    query_pre_attn_scalar=256.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=True,
    _family="gemma3_text",
)

# Tiny config for dryruns / CI (all dims divisible by 8 for TP tests).
QWEN3_TINY = dict(
    vocab_size=512,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=8,
    num_key_value_heads=8,
    head_dim=32,
    max_position_embeddings=1024,
    rope_theta=10000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=True,
)


def make_qwen3_dir(path: str, arch: dict) -> str:
    """Write config.json + a tiny offline tokenizer; no weights."""
    from transformers import (Gemma3TextConfig, MistralConfig, Qwen2Config,
                              Qwen3Config, Qwen3MoeConfig)

    arch = dict(arch)
    cfg_cls = {"qwen2": Qwen2Config, "qwen3": Qwen3Config,
               "qwen3_moe": Qwen3MoeConfig, "mistral": MistralConfig,
               "gemma3_text": Gemma3TextConfig}[
        arch.pop("_family", "qwen3")
    ]
    os.makedirs(path, exist_ok=True)
    if not os.path.exists(os.path.join(path, "config.json")):
        cfg_cls(**arch, torch_dtype="bfloat16").save_pretrained(path)
    if not os.path.exists(os.path.join(path, "tokenizer.json")):
        _write_tiny_tokenizer(path)
    return path


def _write_tiny_tokenizer(path: str):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    words = ["hello", "world", "the", "quick", "brown", "fox", "list", "prime",
             "numbers", "tell", "me", "a", "story"]
    vocab = {"<eos>": 0, "<unk>": 1}
    vocab.update({w: i + 2 for i, w in enumerate(words)})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token="<eos>"
    ).save_pretrained(path)


def hf_greedy(model_dir: str, token_ids, n_new: int, **from_pretrained_kw):
    """Manual HF greedy-decode oracle (avoids generate() EOS quirks); shared
    by the family parity tests. Pass e.g. attn_implementation="eager" for
    sliding-window models."""
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(
        model_dir, dtype=torch.float32, **from_pretrained_kw
    )
    model.eval()
    ids = list(token_ids)
    with torch.no_grad():
        for _ in range(n_new):
            logits = model(torch.tensor([ids])).logits[0, -1]
            ids.append(int(logits.argmax()))
    return ids[len(token_ids):]
