"""Guided decoding (JSON mode) end-to-end through the engine.

A tiny Qwen3 checkpoint with a char-level JSON-ish tokenizer: guided rows
must emit token streams that are valid JSON values (complete when EOS fired,
a valid prefix when max_tokens truncated), across plain/filtered sampling,
mixed guided/unguided batches, and preemption (the host resume re-walk).
Device mask/walk parity against the HostWalker oracle is covered directly.
"""

import json

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.ops import guided as guided_ops

# Char-level vocabulary: every printable JSON char as its own token, plus a
# few merged tokens and word filler. Id 0 = <unk>, 1 = <eos>.
CHARS = list(' \t{}[],:"-+.0123456789abcdefghijklmnopqrstuvwxyzETF')
MERGED = ["true", "false", "null", '{"', '":', '",', "}]", "0.5", "-1"]
WORDS = [f"w{i}" for i in range(8)]


def _write_guided_fixture(path):
    import torch
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from transformers import PreTrainedTokenizerFast, Qwen3Config, \
        Qwen3ForCausalLM

    vocab = {"<unk>": 0, "<eos>": 1}
    for t in CHARS + MERGED + WORDS:
        vocab.setdefault(t, len(vocab))
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token="<eos>",
        clean_up_tokenization_spaces=False,
    )
    fast.save_pretrained(path)
    cfg = Qwen3Config(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=1024, tie_word_embeddings=True,
        eos_token_id=1, torch_dtype="float32",
    )
    torch.manual_seed(7)
    Qwen3ForCausalLM(cfg).save_pretrained(path, safe_serialization=True)
    return path


@pytest.fixture(scope="module")
def guided_dir(tmp_path_factory):
    return _write_guided_fixture(
        str(tmp_path_factory.mktemp("guided") / "model")
    )


def _llm(path, **kw):
    kw.setdefault("num_kvcache_blocks", 256)
    return LLM(
        path, max_num_batched_tokens=256, max_model_len=256, max_num_seqs=8,
        kvcache_block_size=16, enforce_eager=True, guided_json=True, **kw,
    )


def _decode(llm, ids):
    return "".join(
        llm.tokenizer.convert_ids_to_tokens(i) for i in ids if i != 1
    )


def _assert_valid_json_stream(llm, out_ids, max_tokens):
    """Complete (EOS before the cap) => parses; truncated => the emitted
    prefix must still be accepted by the automaton (never DEAD)."""
    text = _decode(llm, out_ids)
    if len(out_ids) < max_tokens:          # EOS fired: complete value
        json.loads(text)
        return "complete"
    t = llm.model_runner._guided_host
    w = guided_ops.HostWalker(
        t["trans"], t["accept"], t["token_bytes"], t["token_len"]
    )
    for tok in out_ids:
        assert w.feed_token(int(tok)), (text, tok)
    return "truncated"


PROMPTS = [[5, 6, 7], [8, 9], [10, 11, 12, 13], [14]]


def test_guided_streams_are_json(guided_dir):
    llm = _llm(guided_dir)
    try:
        params = [
            SamplingParams(temperature=t, max_tokens=48, guided="json",
                           seed=s)
            for t, s in ((0.0, None), (0.9, 3), (1.3, 4), (0.7, 5))
        ]
        out = llm.generate(PROMPTS, params, use_tqdm=False)
        kinds = [
            _assert_valid_json_stream(llm, o["token_ids"], 48) for o in out
        ]
        assert len(kinds) == 4
    finally:
        llm.exit()


def test_guided_eos_only_when_complete(guided_dir):
    """Every completed guided row parses; EOS can never cut a value short."""
    llm = _llm(guided_dir)
    try:
        params = SamplingParams(temperature=1.0, max_tokens=64,
                                guided="json", seed=11)
        out = llm.generate(PROMPTS, params, use_tqdm=False)
        for o in out:
            _assert_valid_json_stream(llm, o["token_ids"], 64)
    finally:
        llm.exit()


def test_mixed_guided_unguided_batch(guided_dir):
    """Unguided seeded rows are batch-independent: identical with and
    without a guided neighbor in the batch."""
    sp_plain = SamplingParams(temperature=0.8, max_tokens=24, seed=21,
                              ignore_eos=True)
    llm = _llm(guided_dir)
    try:
        solo = llm.generate(PROMPTS[:1], sp_plain, use_tqdm=False)
        mixed = llm.generate(
            PROMPTS[:2],
            [sp_plain,
             SamplingParams(temperature=0.9, max_tokens=24, guided="json",
                            seed=22)],
            use_tqdm=False,
        )
        assert mixed[0]["token_ids"] == solo[0]["token_ids"]
        _assert_valid_json_stream(llm, mixed[1]["token_ids"], 24)
    finally:
        llm.exit()


def test_guided_with_top_k_filtering(guided_dir):
    llm = _llm(guided_dir)
    try:
        sp = SamplingParams(temperature=1.0, max_tokens=40, guided="json",
                            top_k=8, seed=31)
        out = llm.generate(PROMPTS[:3], sp, use_tqdm=False)
        for o in out:
            _assert_valid_json_stream(llm, o["token_ids"], 40)
    finally:
        llm.exit()


def test_guided_preemption_resume(guided_dir):
    """A KV pool too small for the batch forces preempt-by-recompute; the
    host resume walk must restore automaton state so streams stay valid."""
    llm = _llm(guided_dir, num_kvcache_blocks=20)
    try:
        sp = SamplingParams(temperature=0.9, max_tokens=40, guided="json",
                            seed=41)
        out = llm.generate(PROMPTS, sp, use_tqdm=False)
        for o in out:
            _assert_valid_json_stream(llm, o["token_ids"], 40)
    finally:
        llm.exit()


def test_guided_tp2_matches_tp1(guided_dir):
    """Guided masking under TP runs on the gathered full-vocab logits;
    seeded rows are batch/topology-independent, so tokens must match."""
    sp = SamplingParams(temperature=0.9, max_tokens=24, guided="json",
                        seed=51)
    a = _llm(guided_dir)
    try:
        out1 = a.generate(PROMPTS[:2], sp, use_tqdm=False)
    finally:
        a.exit()
    b = _llm(guided_dir, tensor_parallel_size=2)
    try:
        out2 = b.generate(PROMPTS[:2], sp, use_tqdm=False)
    finally:
        b.exit()
    assert [o["token_ids"] for o in out1] == [o["token_ids"] for o in out2]
    for o in out1:
        _assert_valid_json_stream(a, o["token_ids"], 24)


def test_guided_requires_config(guided_dir):
    llm = LLM(guided_dir, max_num_batched_tokens=256, max_model_len=256,
              max_num_seqs=8, kvcache_block_size=16, enforce_eager=True,
              num_kvcache_blocks=64)
    try:
        with pytest.raises(AssertionError, match="guided_json"):
            llm.generate(
                PROMPTS[:1],
                SamplingParams(max_tokens=4, guided="json"),
                use_tqdm=False,
            )
    finally:
        llm.exit()


def test_device_walk_matches_host(guided_dir):
    """walk_sampled == HostWalker over random mask-legal token streams."""
    import jax.numpy as jnp

    llm = _llm(guided_dir)
    try:
        t = llm.model_runner._guided_host
        trans_d, maskbits_d, tok_bytes_d = llm.model_runner.gtab
        _, allowed = guided_ops.compile_masks(
            t["trans"], t["accept"], t["token_bytes"], t["token_len"],
            eos_ids=(1,),
        )
        rng = np.random.default_rng(5)
        n_slots = llm.model_runner.num_slots
        for trial in range(10):
            w = guided_ops.HostWalker(
                t["trans"], t["accept"], t["token_bytes"], t["token_len"]
            )
            gstate = jnp.full((n_slots,), -1, jnp.int32).at[3].set(1)
            gdepth = jnp.zeros((n_slots,), jnp.int32)
            gstack = jnp.zeros((n_slots, guided_ops.DEPTH_CAP), jnp.int32)
            for _ in range(25):
                ok = np.flatnonzero(allowed[w.state, w.top])
                ok = ok[ok != 1]  # skip EOS
                if not len(ok):
                    break
                tok = int(rng.choice(ok))
                assert w.feed_token(tok)
                gstate, gdepth, gstack = guided_ops.walk_sampled(
                    gstate, gdepth, gstack,
                    jnp.asarray([3], jnp.int32),
                    jnp.asarray([tok], jnp.int32),
                    trans_d, tok_bytes_d, n_slots - 1,
                )
                assert int(gstate[3]) == w.state, (trial, tok)
                assert int(gdepth[3]) == len(w.stack), (trial, tok)
                st = list(np.asarray(gstack[3][: len(w.stack)]))
                assert st == w.stack, (trial, tok)
    finally:
        llm.exit()
