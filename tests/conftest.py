"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding logic is exercised without a TPU pod (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override: unit tests are CPU-deterministic
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nanovllm_tpu_jax_cache")

import jax  # noqa: E402

# The TPU-tunnel sitecustomize force-sets jax_platforms="axon,cpu" at
# interpreter startup, overriding the env var — override it back before any
# backend initializes, or "CPU" tests silently run on the real chip.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-compile tests"
    )


def _make_tiny_qwen3(path, *, num_kv_heads: int, seed: int):
    """Write a tiny random-weight HF Qwen3 checkpoint (no network)."""
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=num_kv_heads,
        head_dim=16,
        max_position_embeddings=1024,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        torch_dtype="float32",
    )
    torch.manual_seed(seed)
    Qwen3ForCausalLM(cfg).save_pretrained(path, safe_serialization=True)


@pytest.fixture(scope="session")
def tiny_qwen3_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_qwen3")
    _make_tiny_qwen3(path, num_kv_heads=2, seed=0)

    # A tiny offline word-level tokenizer so the engine's string-prompt path
    # (tokenize/decode, EOS id) works without network access.
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    words = ["hello", "world", "the", "quick", "brown", "fox", "a", "b", "c"]
    vocab = {"<eos>": 0, "<unk>": 1}
    vocab.update({w: i + 2 for i, w in enumerate(words)})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token="<eos>"
    )
    fast.save_pretrained(path)
    return str(path)


@pytest.fixture(scope="session")
def tiny_qwen3_4kv_dir(tmp_path_factory):
    """Like tiny_qwen3_dir but with 4 kv heads: int4-KV nibble packing needs
    an even per-shard head count, so TP=2 tests need >= 4 heads."""
    path = tmp_path_factory.mktemp("tiny_qwen3_4kv")
    _make_tiny_qwen3(path, num_kv_heads=4, seed=1)
    from nanovllm_tpu.utils.testing import _write_tiny_tokenizer

    _write_tiny_tokenizer(str(path))
    return str(path)


@pytest.fixture(scope="session")
def tiny_moe_dir(tmp_path_factory):
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    path = str(tmp_path_factory.mktemp("tiny_qwen3_moe"))
    cfg = Qwen3MoeConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,       # unused (every layer sparse)
        moe_intermediate_size=32,
        num_experts=8,
        num_experts_per_tok=3,
        norm_topk_prob=True,         # Qwen3-30B-A3B setting
        decoder_sparse_step=1,
        mlp_only_layers=[],
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=1024,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        torch_dtype="float32",
    )
    torch.manual_seed(3)
    model = Qwen3MoeForCausalLM(cfg)
    # Router logits on an untrained model are near-uniform; spread them so
    # top-k selections are decisive (parity would otherwise flake on fp
    # tie-breaks between ranks 3 and 4). Amplify the expert outputs too:
    # untrained expert contributions (~1e-3) are otherwise too small to flip
    # greedy tokens, making the parity oracle blind to expert-weight layout
    # bugs (r2 review found an EP fuse-layout bug these tests had missed).
    with torch.no_grad():
        for layer in model.model.layers:
            layer.mlp.gate.weight.mul_(8.0)
            for ex in layer.mlp.experts:
                ex.down_proj.weight.mul_(40.0)
    model.save_pretrained(path, safe_serialization=True)
    from nanovllm_tpu.utils.testing import _write_tiny_tokenizer

    _write_tiny_tokenizer(path)
    return path
