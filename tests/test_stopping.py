"""Stopping controls: multi-EOS sets (generation_config.json lists),
per-request stop_token_ids, and stop strings with output trimming.

Chat checkpoints declare SEVERAL eos ids (e.g. Qwen chat's <|im_end|> +
<|endoftext|>); the reference stops only on tokenizer.eos_token_id. Stop
strings / stop_token_ids are vLLM-surface extensions (reference
sampling_params.py has neither).
"""

import json

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
    fetch_interval=4,  # several drains per completion: spans are exercised
)


def _write_fullvocab_tokenizer(path):
    """Word-level tokenizer covering EVERY model vocab id as a fixed-width
    word ("w000".."w511"), so decoded text is deterministic for any sampled
    id and stop strings can only match at token boundaries."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    vocab = {"<eos>": 0, "<unk>": 1}
    vocab.update({f"w{i:03d}": i for i in range(2, 512)})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token="<eos>"
    ).save_pretrained(path)


@pytest.fixture(scope="module")
def fullvocab_dir(tmp_path_factory):
    from conftest import _make_tiny_qwen3

    path = tmp_path_factory.mktemp("tiny_qwen3_fullvocab")
    _make_tiny_qwen3(path, num_kv_heads=2, seed=0)
    _write_fullvocab_tokenizer(path)
    return str(path)


@pytest.fixture(scope="module")
def llm(fullvocab_dir):
    return LLM(fullvocab_dir, **ENGINE_KW)


PROMPT = np.random.default_rng(7).integers(2, 500, size=13).tolist()
N_NEW = 12


@pytest.fixture(scope="module")
def expected(llm):
    """Greedy completion without any stop controls."""
    sp = SamplingParams(temperature=0.0, max_tokens=N_NEW, ignore_eos=True)
    out = llm.generate([PROMPT], sp, use_tqdm=False)[0]
    assert len(out["token_ids"]) == N_NEW
    return out["token_ids"]


def _word(t):
    return "<eos>" if t == 0 else ("<unk>" if t == 1 else f"w{t:03d}")


def test_stop_token_ids(llm, expected):
    """Generation ends when a per-request stop id is sampled (the stop token
    is included in token_ids, same as the EOS path), even under ignore_eos."""
    # Greedy on the tiny random model may repeat tokens: assert against the
    # FIRST occurrence of the chosen stop id.
    k = expected.index(expected[3])
    sp = SamplingParams(temperature=0.0, max_tokens=N_NEW, ignore_eos=True,
                        stop_token_ids=[expected[3]])
    out = llm.generate([PROMPT], sp, use_tqdm=False)[0]
    assert out["token_ids"] == expected[: k + 1]
    bm = llm.scheduler.block_manager
    assert bm.num_free_blocks == bm.num_blocks  # nothing leaked


def test_stop_string_trims_output(llm, expected):
    k = expected.index(expected[2])  # first occurrence of the stop word
    stop = _word(expected[2])
    sp = SamplingParams(temperature=0.0, max_tokens=N_NEW, ignore_eos=True,
                        stop=stop)
    out = llm.generate([PROMPT], sp, use_tqdm=False)[0]
    # Token tail cut at the token that completed the match; text cut at the
    # match itself (the stop string is excluded).
    assert out["token_ids"] == expected[: k + 1]
    assert out["text"] == "".join(_word(t) for t in expected[:k])
    assert stop not in out["text"]
    bm = llm.scheduler.block_manager
    assert bm.num_free_blocks == bm.num_blocks


def test_stop_string_accepts_single_str_and_tuple():
    a = SamplingParams(stop="done")
    b = SamplingParams(stop=("done", "end"))
    assert a.stop == ("done",) and b.stop == ("done", "end")
    with pytest.raises(AssertionError):
        SamplingParams(stop=("",))


def test_stop_string_streaming(llm, expected):
    k = expected.index(expected[4])
    stop = _word(expected[4])
    sp = SamplingParams(temperature=0.0, max_tokens=N_NEW, ignore_eos=True,
                        stop=stop)
    events = list(llm.generate_stream([PROMPT], sp))
    assert events[-1]["finished"]
    assert events[-1]["text"] == "".join(_word(t) for t in expected[:k])


def test_unmatched_stop_runs_to_max_tokens(llm, expected):
    sp = SamplingParams(temperature=0.0, max_tokens=N_NEW, ignore_eos=True,
                        stop="w999zzz")
    out = llm.generate([PROMPT], sp, use_tqdm=False)[0]
    assert out["token_ids"] == expected


def test_multi_eos_from_generation_config(tmp_path_factory, expected):
    """generation_config.json's eos_token_id LIST joins the engine stop set:
    the run stops at the listed id without ignore_eos tricks."""
    from conftest import _make_tiny_qwen3

    path = tmp_path_factory.mktemp("tiny_qwen3_multieos")
    _make_tiny_qwen3(path, num_kv_heads=2, seed=0)  # same weights as llm
    _write_fullvocab_tokenizer(path)
    # Declare token 0 (<eos>) plus the 3rd greedy token as EOS ids.
    (path / "generation_config.json").write_text(
        json.dumps({"eos_token_id": [0, int(expected[2])]})
    )
    llm2 = LLM(str(path), **ENGINE_KW)
    assert set(llm2.config.eos_ids) >= {0, expected[2]}
    k = expected.index(expected[2])
    sp = SamplingParams(temperature=0.0, max_tokens=N_NEW)
    out = llm2.generate([PROMPT], sp, use_tqdm=False)[0]
    assert out["token_ids"] == expected[: k + 1]  # stops at the listed id


def test_min_tokens_suppresses_eos(tiny_qwen3_dir):
    """min_tokens suppresses the model's EOS set (via injected -inf logit
    biases) until the completion reaches the floor."""
    from nanovllm_tpu import LLM, SamplingParams

    llm = LLM(tiny_qwen3_dir, **ENGINE_KW)
    eos = llm.config.eos
    prompt = [3, 4, 5, 6]
    # Huge positive bias on EOS: greedy would emit it immediately...
    base = dict(temperature=0.0, max_tokens=16, logit_bias={eos: 100.0})
    short = llm.generate([prompt], SamplingParams(**base), use_tqdm=False)[0]
    assert len(short["token_ids"]) == 1  # EOS at the first step
    # ...but min_tokens holds it off for 4 tokens.
    long = llm.generate(
        [prompt], SamplingParams(**base, min_tokens=4), use_tqdm=False
    )[0]
    assert len(long["token_ids"]) >= 4
    assert all(t != eos for t in long["token_ids"][:4])
