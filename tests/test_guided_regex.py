"""Regex guided decoding (ops/guided_regex.py): the regex->DFA compiler
against Python's ``re.fullmatch`` oracle, and end-to-end engine conformance
through the shared schema-slot machinery."""

import re

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.ops.guided_regex import RegexError, build_regex_automaton

from test_guided_engine import _write_guided_fixture


@pytest.fixture(scope="module")
def guided_dir(tmp_path_factory):
    return _write_guided_fixture(
        str(tmp_path_factory.mktemp("guided_regex") / "model")
    )


def _walk(trans, accept, s):
    st = 1
    for ch in s.encode():
        st = int(trans[st, ch])
        if st == 0:
            return None
    return bool(accept[st])


CASES = [
    # (pattern, matching strings, non-matching strings)
    (r"abc", ["abc"], ["ab", "abcd", "abd", ""]),
    (r"a+b*c?", ["a", "aab", "aabbc", "ac"], ["", "b", "abcc"]),
    (r"[0-9]{3}-[0-9]{4}", ["555-1234"], ["55-1234", "5551234", "555-12345"]),
    (r"(foo|bar)+", ["foo", "barfoo", "foofoofoo"], ["", "fo", "foob"]),
    (r"\d{1,3}(\.\d{1,3}){3}", ["10.0.0.1", "192.168.001.255"],
     ["10.0.0", "1.2.3.4.5", "a.b.c.d"]),
    (r"[a-f0-9]{8}", ["deadbeef", "01234567"], ["DEADBEEF", "0123456"]),
    (r"-?\d+(\.\d+)?", ["-3", "0.5", "42"], ["-", ".", "3.", "+3"]),
    (r"[^ab]+", ["cd", "xyz"], ["", "ax", "b"]),
    (r"\w+@\w+\.(com|org)", ["a_1@b.com", "x@y.org"], ["a@b.net", "@b.com"]),
    (r"(?:ha){2,4}!", ["haha!", "hahahaha!"], ["ha!", "hahahahaha!"]),
    (r"yes|no|maybe", ["yes", "no", "maybe"], ["", "yesno", "y"]),
    (r"a.c", ["abc", "a c", "axc"], ["ac", "a\nc", "abbc"]),
]


@pytest.mark.parametrize("pattern,good,bad", CASES)
def test_regex_dfa_matches_re_fullmatch(pattern, good, bad):
    trans, accept, n = build_regex_automaton(pattern, 384)
    for s in good:
        assert re.fullmatch(pattern, s), (pattern, s)  # case sanity
        assert _walk(trans, accept, s) is True, (pattern, s)
    for s in bad:
        assert not re.fullmatch(pattern, s), (pattern, s)
        assert _walk(trans, accept, s) is not True, (pattern, s)


def test_regex_dfa_random_strings_vs_re():
    """Property check: DFA verdict == re.fullmatch over random small-alphabet
    strings for every case pattern."""
    rng = np.random.default_rng(0)
    alphabet = "ab01.-@xo!hfrmyesn_"
    for pattern, _, _ in CASES:
        trans, accept, _ = build_regex_automaton(pattern, 384)
        for _ in range(200):
            s = "".join(
                rng.choice(list(alphabet))
                for _ in range(int(rng.integers(0, 10)))
            )
            exp = re.fullmatch(pattern, s) is not None
            got = _walk(trans, accept, s) is True
            assert got == exp, (pattern, s)


def test_regex_rejects_unsupported():
    for pattern in (
        r"^abc$",          # anchors (full-match is implicit)
        r"(a)\1",          # backreference
        r"a{1,100}",       # over the expansion cap
        r"a**",            # bare nested quantifier
        r"(?=x)y",         # lookahead ((?= hits the (?: check)
        r"[z-a]",          # bad range
    ):
        with pytest.raises(RegexError):
            build_regex_automaton(pattern, 384)


def test_engine_regex_conformance(guided_dir):
    """End-to-end: completions constrained to a regex are full-match when
    EOS fires and a live DFA prefix when truncated."""
    pattern = r"w[0-7](,w[0-7]){0,5}"
    llm = LLM(
        guided_dir, max_num_batched_tokens=256, max_model_len=256,
        max_num_seqs=8, kvcache_block_size=16, num_kvcache_blocks=256,
        enforce_eager=True, guided_json=True, guided_schema_slots=2,
        guided_schema_states=256,
    )
    try:
        params = [
            SamplingParams(temperature=1.0, max_tokens=24,
                           guided={"regex": pattern}, seed=s)
            for s in range(1, 6)
        ]
        out = llm.generate([[5 + i] for i in range(5)], params,
                           use_tqdm=False)
        trans, accept, _ = build_regex_automaton(pattern, 256)
        complete = 0
        for o in out:
            text = "".join(
                llm.tokenizer.convert_ids_to_tokens(i)
                for i in o["token_ids"] if i != 1
            )
            if len(o["token_ids"]) < 24:
                assert re.fullmatch(pattern, text), text
                complete += 1
            else:
                assert _walk(trans, accept, text) is not None, text
        assert complete >= 1
    finally:
        llm.exit()


def test_engine_choice_via_enum(guided_dir):
    """guided_choice (HTTP) maps to {"enum": [...]}: same machinery."""
    llm = LLM(
        guided_dir, max_num_batched_tokens=256, max_model_len=256,
        max_num_seqs=8, kvcache_block_size=16, num_kvcache_blocks=256,
        enforce_eager=True, guided_json=True, guided_schema_slots=2,
        guided_schema_states=256,
    )
    try:
        out = llm.generate(
            [[5, 6]] * 4,
            [SamplingParams(temperature=1.0, max_tokens=16,
                            guided={"enum": ["w0", "w1"]}, seed=s)
             for s in range(4)],
            use_tqdm=False,
        )
        import json
        done = [o for o in out if len(o["token_ids"]) < 16]
        assert done
        for o in done:
            text = "".join(
                llm.tokenizer.convert_ids_to_tokens(i)
                for i in o["token_ids"] if i != 1
            )
            assert json.loads(text) in ("w0", "w1")
    finally:
        llm.exit()


def test_escaped_multibyte_literal():
    """An escaped non-ASCII char must constrain a byte SEQUENCE, not an
    alternative over its UTF-8 bytes (r5 review finding)."""
    trans, accept, _ = build_regex_automaton("a\\€b", 384)
    assert _walk(trans, accept, "a€b") is True
    assert _walk(trans, accept, "a\xe2b") is not True  # one stray byte


def test_engine_bare_choice(guided_dir):
    """guided={'choice': [...]} (vLLM guided_choice): the completion IS one
    of the strings — bare text, no JSON quoting."""
    llm = LLM(
        guided_dir, max_num_batched_tokens=256, max_model_len=256,
        max_num_seqs=8, kvcache_block_size=16, num_kvcache_blocks=256,
        enforce_eager=True, guided_json=True, guided_schema_slots=2,
        guided_schema_states=256,
    )
    try:
        out = llm.generate(
            [[5, 6]] * 4,
            [SamplingParams(temperature=1.0, max_tokens=12,
                            guided={"choice": ["w0", "w1,w2"]}, seed=s)
             for s in range(4)],
            use_tqdm=False,
        )
        done = [o for o in out if len(o["token_ids"]) < 12]
        assert done
        for o in done:
            text = "".join(
                llm.tokenizer.convert_ids_to_tokens(i)
                for i in o["token_ids"] if i != 1
            )
            assert text in ("w0", "w1,w2"), text
    finally:
        llm.exit()


def test_engine_slot1_automaton_enforces(guided_dir):
    """An automaton in slot >= 1 (global state ids past the first slot's
    row range) must actually ENFORCE its constraint — this is the coverage
    the r5 review flagged: with the old ACT_LSB=256 packing, any global id
    >= 256 decoded as a bogus stack action and slot-1 automata silently
    broke."""
    llm = LLM(
        guided_dir, max_num_batched_tokens=256, max_model_len=256,
        max_num_seqs=8, kvcache_block_size=16, num_kvcache_blocks=256,
        enforce_eager=True, guided_json=True, guided_schema_slots=2,
        guided_schema_states=256,
    )
    try:
        runner = llm.model_runner
        runner.ensure_guided_schema({"type": "integer"})  # occupies slot 0
        start = runner.ensure_guided_schema({"choice": ["w3", "w5"]})
        assert start >= runner._n_generic + runner.config.guided_schema_states
        out = llm.generate(
            [[5 + i] for i in range(5)],
            [SamplingParams(temperature=1.0, max_tokens=12,
                            guided={"choice": ["w3", "w5"]}, seed=s)
             for s in range(5)],
            use_tqdm=False,
        )
        done = [o for o in out if len(o["token_ids"]) < 12]
        assert done, "no row completed (mask/walk broken in slot 1?)"
        for o in done:
            text = "".join(
                llm.tokenizer.convert_ids_to_tokens(i)
                for i in o["token_ids"] if i != 1
            )
            assert text in ("w3", "w5"), text
    finally:
        llm.exit()
