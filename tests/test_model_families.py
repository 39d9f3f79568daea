"""Model-family coverage: Llama and Qwen2 (same decoder family as Qwen3 with
different spec flags — qkv bias for Qwen2, no q/k-norm for both) run through
the full engine and match HF greedy decoding."""

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams

ENGINE_KW = dict(
    max_num_batched_tokens=128,
    max_num_seqs=8,
    max_model_len=128,
    kvcache_block_size=16,
    num_kvcache_blocks=64,
    decode_buckets=(8,),
    prefill_buckets=(128,),
    dtype="float32",
    use_pallas_attention=False,
)


def _save_tiny(tmp_path_factory, family, **extra_cfg):
    import torch

    if family == "llama":
        from transformers import LlamaConfig as Cfg
        from transformers import LlamaForCausalLM as Model
        extra = {}
    else:
        from transformers import Qwen2Config as Cfg
        from transformers import Qwen2ForCausalLM as Model
        extra = {}
    extra.update(extra_cfg)
    cfg = Cfg(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        torch_dtype="float32",
        **extra,
    )
    torch.manual_seed(1)
    model = Model(cfg)
    path = tmp_path_factory.mktemp(f"tiny_{family}")
    model.save_pretrained(path, safe_serialization=True)

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(WordLevel({"<eos>": 0, "<unk>": 1}, unk_token="<unk>"))
    PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token="<eos>"
    ).save_pretrained(path)
    return str(path), model


def _hf_greedy(model, token_ids, n_new):
    import torch

    model.eval()
    ids = list(token_ids)
    with torch.no_grad():
        for _ in range(n_new):
            logits = model(torch.tensor([ids])).logits[0, -1]
            ids.append(int(logits.argmax()))
    return ids[len(token_ids):]


@pytest.mark.parametrize("family", ["llama", "qwen2"])
def test_family_greedy_matches_hf(tmp_path_factory, family):
    path, hf_model = _save_tiny(tmp_path_factory, family)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (6, 19, 30)]
    n_new = 10
    llm = LLM(path, **ENGINE_KW)
    outs = llm.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True),
        use_tqdm=False,
    )
    llm.exit()
    for prompt, out in zip(prompts, outs):
        assert out["token_ids"] == _hf_greedy(hf_model, prompt, n_new), family


@pytest.mark.parametrize(
    "family,rope_scaling",
    [
        # Llama-3.1+ checkpoints ship rope_type "llama3" (frequency remap —
        # it changes logits at EVERY position, not just long contexts).
        (
            "llama",
            {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
             "high_freq_factor": 4.0,
             "original_max_position_embeddings": 64},
        ),
        # Long-context Qwen releases use YaRN (scaled inv_freq + a constant
        # cos/sin attention factor).
        (
            "qwen2",
            {"rope_type": "yarn", "factor": 4.0,
             "original_max_position_embeddings": 64},
        ),
        ("llama", {"rope_type": "linear", "factor": 2.0}),
    ],
)
def test_scaled_rope_matches_hf(tmp_path_factory, family, rope_scaling):
    """rope_scaling checkpoints must reproduce HF exactly — the spec carries
    HF's own computed inverse frequencies (models/qwen3.spec_from_hf), so a
    silent mis-scale would show up as greedy divergence here."""
    path, hf_model = _save_tiny(
        tmp_path_factory, family, rope_scaling=dict(rope_scaling)
    )
    rng = np.random.default_rng(11)
    prompts = [rng.integers(2, 500, size=n).tolist() for n in (6, 27)]
    n_new = 10
    llm = LLM(path, **ENGINE_KW)
    outs = llm.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True),
        use_tqdm=False,
    )
    llm.exit()
    for prompt, out in zip(prompts, outs):
        assert out["token_ids"] == _hf_greedy(hf_model, prompt, n_new), (
            family, rope_scaling,
        )
    # The scaling must actually engage (differ from the unscaled model) —
    # guards against HF silently ignoring the config on tiny fixtures.
    import torch

    from transformers import AutoConfig

    from nanovllm_tpu.models import get_model_family

    hf_cfg = AutoConfig.from_pretrained(path)
    spec = get_model_family(hf_cfg).spec_from_hf(hf_cfg)
    assert spec.rope_inv_freq, "spec did not pick up rope_scaling"


def test_unsupported_rope_scaling_rejected(tmp_path_factory):
    path, _ = _save_tiny(
        tmp_path_factory, "llama",
        rope_scaling={"rope_type": "dynamic", "factor": 2.0},
    )
    with pytest.raises(AssertionError, match="rope_scaling"):
        LLM(path, **ENGINE_KW)


def test_qwen2_72b_arch_spec(tmp_path_factory):
    """The BASELINE 72B config (Qwen2.5-72B arch) resolves to the Qwen2
    family with the right spec flags (bench.py / scaling_harness BENCH_ARCH
    =72b path)."""
    from transformers import AutoConfig

    from nanovllm_tpu.models import get_model_family
    from nanovllm_tpu.utils.testing import QWEN2_72B, make_qwen3_dir

    d = make_qwen3_dir(str(tmp_path_factory.mktemp("q72b")), QWEN2_72B)
    hf = AutoConfig.from_pretrained(d)
    spec = get_model_family(hf).spec_from_hf(hf)
    assert (spec.num_layers, spec.hidden_size, spec.head_dim) == (80, 8192, 128)
    assert spec.has_qkv_bias and not spec.has_qk_norm
    assert not spec.tie_embeddings
