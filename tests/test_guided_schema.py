"""JSON-Schema guided decoding (ops/guided_schema.py): the schema compiler,
the DFA mask compiler, slot install/eviction, and end-to-end engine output
conformance (VERDICT r4 missing #1)."""

import json

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.ops import guided as guided_ops
from nanovllm_tpu.ops.guided_schema import (
    SchemaError, build_schema_automaton, compile_masks_dfa, remap_to_global)

from test_guided_engine import _write_guided_fixture


@pytest.fixture(scope="module")
def guided_dir(tmp_path_factory):
    return _write_guided_fixture(
        str(tmp_path_factory.mktemp("guided_schema") / "model")
    )


def _walk(trans, accept, s, start=1):
    st = start
    for ch in s.encode():
        st = int(trans[st, ch])
        if st == 0:
            return None      # dead
    return bool(accept[st])


SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "color": {"enum": ["red", "green", "blue"]},
        "tags": {"type": "array", "items": {"type": "string"}},
        "score": {"type": "number"},
        "active": {"type": "boolean"},
    },
    "required": ["name", "age"],
}


def test_schema_automaton_accepts_and_rejects():
    trans, accept, n = build_schema_automaton(SCHEMA, 384)
    good = [
        '{"name":"bob","age":3}',
        '{"name": "a\\"b", "age": 42, "color": "red", "tags": ["x","y"],'
        ' "score": -1.5e3, "active": false}',
        '{ "name" : "" , "age" : 0 }',
        '{"name":"b","age":3,"tags":[]}',
        '{"name":"b","age":3,"score":2,"active":true}',  # skip optionals
    ]
    bad = [
        '{"age":3,"name":"b"}',                 # declared order violated
        '{"name":"b"}', '{}',                   # missing required
        '{"name":"b","age":3.5}',               # non-integer
        '{"name":"b","age":3,"color":"purple"}',
        '{"name":"b","age":3,}',                # trailing comma
        '["a"]',
        '{"name":"b","age":3,"extra":1}',       # additional property
        '{"name":"b","age":3,"active":true,"color":"red"}',  # out of order
    ]
    for s in good:
        assert _walk(trans, accept, s) is True, s
        for i in range(1, len(s)):              # every prefix stays alive
            assert _walk(trans, accept, s[:i]) is not None, s[:i]
    for s in bad:
        assert _walk(trans, accept, s) is not True, s


def test_schema_arrays_and_scalars():
    t, a, _ = build_schema_automaton(
        {"type": "array", "items": {"type": "integer"},
         "minItems": 1, "maxItems": 3}, 384,
    )
    assert _walk(t, a, "[1]") and _walk(t, a, "[1,2,3]")
    assert not _walk(t, a, "[]")
    assert _walk(t, a, "[1,2,3,4]") is not True
    assert _walk(t, a, "[1,]") is not True
    t, a, _ = build_schema_automaton(
        {"type": "object", "properties": {
            "kind": {"const": "point"},
            "pos": {"type": "object", "properties": {
                "x": {"type": "number"}, "y": {"type": "number"}}},
            "label": {"type": ["string", "null"]},
        }}, 384,
    )
    assert _walk(t, a, '{"kind":"point","pos":{"x":1,"y":-2.5},"label":null}')
    assert _walk(t, a, '{"kind":"line","pos":{"x":1},"label":null}') is not True


def test_unsupported_keywords_raise():
    for schema in (
        {"type": "string", "pattern": "a+"},
        {"anyOf": [{"type": "string"}]},
        {"type": "integer", "minimum": 3},
        {"type": "object", "properties": {}, "additionalProperties": True},
        {"type": "array"},                       # untyped items
        {"type": "frobnicate"},
        {"enum": [1, 12]},                       # prefix-conflicting enum
    ):
        with pytest.raises((SchemaError, ValueError)):
            build_schema_automaton(schema, 384)


def test_compile_masks_dfa_matches_token_walks():
    """A token's mask bit from state st == 'its byte walk from st survives'
    (brute-forced per token), and EOS bits follow acceptance."""
    trans, accept, n = build_schema_automaton(
        {"type": "object", "properties": {"a": {"type": "integer"}}}, 384
    )
    toks = ['{', '"a"', '"a', ':', '12', '}', '{"', 'x', ' ', '"}']
    L = 8
    tb = np.full((len(toks) + 1, L), guided_ops.PAD_BYTE, np.int32)
    tl = np.zeros(len(toks) + 1, np.int32)
    for i, t in enumerate(toks):
        b = t.encode()
        tb[i, : len(b)] = np.frombuffer(b, np.uint8)
        tl[i] = len(b)
    tl[len(toks)] = -1                          # unmaskable (special) token
    eos = len(toks)
    _, allowed = compile_masks_dfa(trans, accept, tb, tl, eos_ids=())
    for st in range(1, n):
        for i, t in enumerate(toks):
            cur = st
            for ch in t.encode():
                cur = int(trans[cur, ch])
            assert allowed[st, i] == (cur != 0), (st, t)
    assert not allowed[:, eos].any()            # len<=0 never maskable


def test_remap_to_global():
    trans, _, n = build_schema_automaton({"type": "boolean"}, 64)
    g = remap_to_global(trans, 100)
    assert (g[trans == 0] == 0).all()
    assert (g[trans != 0] == trans[trans != 0] + 99).all()


# ---------------------------------------------------------------- engine e2e

E2E_SCHEMA = {
    "type": "object",
    "properties": {
        "a": {"type": "integer"},
        "b": {"enum": ["w0", "w1"]},
        "c": {"type": "array", "items": {"type": "boolean"}, "maxItems": 3},
    },
}


def _llm(path, **kw):
    kw.setdefault("num_kvcache_blocks", 256)
    return LLM(
        path, max_num_batched_tokens=256, max_model_len=256, max_num_seqs=8,
        kvcache_block_size=16, enforce_eager=True, guided_json=True,
        guided_schema_slots=2, guided_schema_states=256, **kw,
    )


def _decode(llm, ids):
    return "".join(
        llm.tokenizer.convert_ids_to_tokens(i) for i in ids if i != 1
    )


def _conforms(text):
    v = json.loads(text)
    assert isinstance(v, dict)
    assert set(v) <= {"a", "b", "c"}
    assert list(v) == [k for k in ("a", "b", "c") if k in v]  # declared order
    if "a" in v:
        assert isinstance(v["a"], int) and not isinstance(v["a"], bool)
    if "b" in v:
        assert v["b"] in ("w0", "w1")
    if "c" in v:
        assert isinstance(v["c"], list) and len(v["c"]) <= 3
        assert all(isinstance(x, bool) for x in v["c"])


def test_engine_schema_outputs_conform(guided_dir):
    llm = _llm(guided_dir)
    try:
        params = [
            SamplingParams(temperature=t, max_tokens=48,
                           guided=E2E_SCHEMA, seed=s)
            for t, s in ((0.0, None), (0.9, 3), (1.3, 4), (0.7, 5))
        ]
        out = llm.generate([[5, 6, 7], [8, 9], [10, 11, 12, 13], [14]],
                           params, use_tqdm=False)
        start = llm.model_runner._schema_registry[
            "js:" + json.dumps(E2E_SCHEMA, sort_keys=True,
                               separators=(",", ":"))
        ]["start"]
        for o in out:
            text = _decode(llm, o["token_ids"])
            if len(o["token_ids"]) < 48:        # EOS fired: complete value
                _conforms(text)
            else:                               # truncated: valid prefix
                th = llm.model_runner._guided_host
                w = guided_ops.HostWalker(
                    th["trans"], th["accept"], th["token_bytes"],
                    th["token_len"], start=start,
                )
                for tok in o["token_ids"]:
                    assert w.feed_token(int(tok)), text
    finally:
        llm.exit()


def test_engine_enum_schema_completes(guided_dir):
    """A finite-language schema must actually FINISH: only '"w0"'/'"w1"'
    (plus trailing whitespace) are emittable, then EOS is the only
    non-whitespace option — across 6 sampled rows at least one closes, and
    every closed row is exactly an enum member."""
    llm = _llm(guided_dir)
    try:
        params = [
            SamplingParams(temperature=1.0, max_tokens=24,
                           guided={"enum": ["w0", "w1"]}, seed=s)
            for s in range(1, 7)
        ]
        out = llm.generate([[5 + i] for i in range(6)], params,
                           use_tqdm=False)
        complete = 0
        for o in out:
            if len(o["token_ids"]) < 24:
                assert json.loads(_decode(llm, o["token_ids"])) in (
                    "w0", "w1"
                )
                complete += 1
        assert complete >= 1
    finally:
        llm.exit()


def test_engine_mixed_schema_generic_unguided(guided_dir):
    llm = _llm(guided_dir)
    try:
        params = [
            SamplingParams(temperature=0.8, max_tokens=32,
                           guided=E2E_SCHEMA, seed=1),
            SamplingParams(temperature=0.8, max_tokens=32, guided="json",
                           seed=2),
            SamplingParams(temperature=0.8, max_tokens=32, seed=3),
        ]
        out = llm.generate([[5, 6], [7, 8], [9, 10]], params, use_tqdm=False)
        assert len(out) == 3
        # schema row: complete => conforms
        if len(out[0]["token_ids"]) < 32:
            _conforms(_decode(llm, out[0]["token_ids"]))
        # generic row: complete => any valid JSON
        if len(out[1]["token_ids"]) < 32:
            json.loads(_decode(llm, out[1]["token_ids"]))
    finally:
        llm.exit()


def test_schema_slot_reuse_and_busy(guided_dir):
    llm = _llm(guided_dir)
    try:
        runner = llm.model_runner
        schemas = [
            {"type": "integer"},
            {"type": "boolean"},
            {"type": "null"},
        ]
        s0 = runner.ensure_guided_schema(schemas[0])
        s1 = runner.ensure_guided_schema(schemas[1])
        assert s0 != s1
        # Cached: same schema returns the same start without recompiling.
        assert runner.ensure_guided_schema(schemas[0]) == s0
        # Both slots held by unfinished requests -> a third schema errors.
        class _Fake:
            is_finished = False
        def key(s):
            return "js:" + json.dumps(s, sort_keys=True,
                                      separators=(",", ":"))
        runner._schema_registry[key(schemas[0])]["seqs"].append(_Fake())
        runner._schema_registry[key(schemas[1])]["seqs"].append(_Fake())
        with pytest.raises(RuntimeError, match="slots"):
            runner.ensure_guided_schema(schemas[2])
        # Finishing one frees its slot for eviction; the new schema lands
        # on that slot's row range.
        runner._schema_registry[key(schemas[0])]["seqs"].clear()
        s2 = runner.ensure_guided_schema(schemas[2])
        assert s2 == s0                         # reused slot -> same base
        # End-to-end through the evicted-and-reinstalled slot.
        out = llm.generate(
            [[5, 6]],
            SamplingParams(temperature=0.6, max_tokens=16,
                           guided=schemas[2], seed=9),
            use_tqdm=False,
        )
        ids = out[0]["token_ids"]
        if len(ids) < 16:
            assert json.loads(_decode(llm, ids)) is None
    finally:
        llm.exit()


def test_schema_requires_slots(guided_dir):
    llm = LLM(
        guided_dir, max_num_batched_tokens=256, max_model_len=256,
        max_num_seqs=8, kvcache_block_size=16, num_kvcache_blocks=256,
        enforce_eager=True, guided_json=True,
    )
    try:
        with pytest.raises(AssertionError, match="guided_schema_slots"):
            llm.generate(
                [[5]],
                SamplingParams(max_tokens=4, guided={"type": "integer"}),
                use_tqdm=False,
            )
    finally:
        llm.exit()
