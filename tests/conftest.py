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

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_qwen3_dir(tmp_path_factory):
    """Create a tiny random-weight HF Qwen3 checkpoint on disk (no network)."""
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=1024,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        torch_dtype="float32",
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(cfg)
    path = tmp_path_factory.mktemp("tiny_qwen3")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)
