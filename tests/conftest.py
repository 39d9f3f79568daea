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


# Tests measured > ~12 s (full-suite --durations, r5): marked slow centrally
# so `pytest -m "not slow"` stays a < 5-minute pre-commit loop while the full
# suite (~17 min idle) runs before milestones. Every subsystem keeps faster
# representatives in the default loop. Keyed by (file stem, test name without
# parametrization).
_SLOW = {
    ("test_sampling", "test_sample_tp_bit_identical_to_gathered"),
    ("test_sampling", "test_sample_topk_topp_tp_matches_unsharded"),
    ("test_sampling", "test_head_sample_tp_matches_single_chip"),
    ("test_sampling", "test_head_sample_bit_identical_to_unfused"),
    ("test_guided_engine", "test_device_walk_matches_host"),
    ("test_quant_ckpt", "test_mode_conflict_rejected"),
    ("test_quant_ckpt", "test_prequantized_matches_live_quantization"),
    ("test_moe", "test_moe_offline_quantized_checkpoint"),
    ("test_moe", "test_moe_int8_experts"),
    ("test_spec_engine", "test_spec_seeded_and_min_tokens_run"),
    ("test_spec_engine", "test_spec_preemption_identity"),
    ("test_spec_engine", "test_spec_mixed_temperature_batch"),
    ("test_spec_engine", "test_spec_fallback_features"),
    ("test_spec_engine", "test_spec_gate_probes_after_tripping"),
    ("test_quant", "test_engine_e2e_quantized"),
    ("test_quant", "test_int4_kv_tp_matches_single_chip"),
    ("test_quant", "test_quantized_tp_matches_single_chip"),
    ("test_pallas_attention", "test_decode_spec_qlen_int8_kv"),
    ("test_pallas_attention", "test_decode_partial_page_rungs"),
    ("test_pallas_attention", "test_decode_window_worklist_int8_kv"),
    ("test_pallas_attention", "test_padded_head_dim_matches_unpadded_oracle"),
    ("test_pallas_attention", "test_decode_int8_kv_matches_oracle"),
    ("test_pallas_attention", "test_decode_int4_kv_matches_oracle"),
    ("test_pallas_attention", "test_decode_window_worklist_mixed_groups"),
    ("test_pallas_attention", "test_decode_window_worklist_skipping"),
    ("test_pallas_attention", "test_decode_sliding_window_int8_kv"),
    ("test_pallas_attention", "test_decode_per_layer_window_scalar"),
    ("test_pallas_attention", "test_prefill_int8_kv_matches_oracle"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = (item.module.__name__.rsplit(".", 1)[-1],
               item.name.split("[")[0])
        if key in _SLOW:
            item.add_marker(pytest.mark.slow)


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
