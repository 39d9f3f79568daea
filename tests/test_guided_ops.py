"""The guided-decoding JSON automaton: host compiler + walker oracle.

Pure-numpy tests (no JAX): the char-level pushdown automaton, the
conservative per-(state, top) token masks, and the bit packing. Device
integration is covered by test_guided_engine.py.
"""

import json

import numpy as np
import pytest

from nanovllm_tpu.ops import guided


# A JSON-ish toy vocabulary: single bytes plus merged multi-byte tokens
# (the interesting mask cases), plus an EOS special.
VOCAB = (
    [c for c in ' \t\n{}[],:"'] +
    [str(d) for d in range(10)] +
    ["-", ".", "+", "e", "E", "\\", "/"] +
    list("abcdefghijklmnopqrstuvwxyz".replace("e", "")) +
    ["true", "false", "null", "tr", "ue", '{"', '"}', "}]", "]]", '":',
     '",', '" ', "ab", "1.5", "-2", "e8", '[{', '[[', '{"a":', '"a"',
     "xyz", "0.", ", "]
)
EOS = len(VOCAB)
V = EOS + 1


@pytest.fixture(scope="module")
def tables():
    trans, accept, names = guided.build_json_automaton()
    tb = np.full((V, 16), guided.PAD_BYTE, dtype=np.int32)
    tl = np.full(V, -1, dtype=np.int32)
    for i, t in enumerate(VOCAB):
        b = t.encode("utf-8")
        tb[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        tl[i] = len(b)
    packed, allowed = guided.compile_masks(trans, accept, tb, tl,
                                           eos_ids=(EOS,))
    return trans, accept, names, tb, tl, packed, allowed


def tok_ids(s: str) -> list[int]:
    """Greedy single-char tokenization (every byte is in VOCAB)."""
    return [VOCAB.index(c) for c in s]


def walk(tables, ids):
    trans, accept, _, tb, tl, _, _ = tables
    w = guided.HostWalker(trans, accept, tb, tl)
    alive = all(w.feed_token(t) for t in ids)
    return w, alive


@pytest.mark.parametrize("s", [
    '{"a": 1}',
    '{"a": [1, 2.5, -3e8], "b": {"c": null}}',
    "[]",
    "[[], [true, false]]",
    '"hi\\n\\u00ff"',
    "-0.5e-10",
    "  {\t\"k\"  :  \"v\" }  ",
    "true",
    "0",
])
def test_valid_json_accepts(tables, s):
    w, alive = walk(tables, tok_ids(s))
    assert alive and w.accepting, s
    json.loads(s)  # sanity: the oracle agrees it's JSON


@pytest.mark.parametrize("s", [
    "{",            # incomplete: alive but not accepting
    '{"a"',
    "[1,",
    '"unterminated',
    "-",
    "1.",
    "12e",
])
def test_incomplete_json_not_accepting(tables, s):
    w, alive = walk(tables, tok_ids(s))
    assert alive and not w.accepting, s


@pytest.mark.parametrize("s", [
    "}",
    "{]",
    '{"a" 1}',
    "[1 2]",
    "01",
    "1.2.3",
    "+1",
    "truex",
    '{"a": }',
    "[,]",
    '{,}',
    "]",
    '{"a":1}}',
])
def test_invalid_json_dies(tables, s):
    _, alive = walk(tables, tok_ids(s))
    assert not alive, s


def test_merged_tokens_walk(tables):
    # '{"' push+start-key, '":' end-key+colon, merged number, '", ' etc.
    ids = [VOCAB.index(t) for t in ['{"', "a", '":', "1.5", ", ",
                                    '"a"', ":", '{"', "z", '":', "0",
                                    "}", "}"]]
    w, alive = walk(tables, ids)
    assert alive and w.accepting
    assert json.loads("".join(VOCAB[i] for i in ids)) == \
        {"a": 1.5, "a": {"z": 0}} | {"a": {"z": 0}}


def test_mask_soundness_random_configs(tables):
    """Every token the mask allows must survive the exact walk from a
    matching live configuration (conservative => sound)."""
    trans, accept, _, tb, tl, _, allowed = tables
    rng = np.random.default_rng(0)
    # Reach diverse configurations by walking random valid prefixes.
    seeds = ['{"a": ', "[[1, ", '{"x": {"y": [', "", '["s', "-1", '{"q": 2']
    for s in seeds:
        w = guided.HostWalker(trans, accept, tb, tl)
        for t in tok_ids(s):
            assert w.feed_token(t), s
        st, top = w.state, w.top
        ok_tokens = np.flatnonzero(allowed[st, top])
        for t in ok_tokens[rng.permutation(len(ok_tokens))[:20]]:
            if t == EOS:
                assert accept[st, top] or st == guided.DEAD
                continue
            w2 = guided.HostWalker(trans, accept, tb, tl)
            w2.state, w2.stack = st, list(w.stack)
            assert w2.feed_token(int(t)), (s, VOCAB[t])


def test_mask_single_char_completeness(tables):
    """Single-char tokens must be allowed exactly when the char edge (with
    the true stack) survives — the conservative rules only bite multi-pop
    merged tokens."""
    trans, accept, _, tb, tl, _, allowed = tables
    w = guided.HostWalker(trans, accept, tb, tl)
    for t in tok_ids('{"a": [1, '):
        w.feed_token(t)
    st, top = w.state, w.top  # VAL inside [obj, arr]
    for i, tok in enumerate(VOCAB):
        if len(tok.encode()) != 1:
            continue
        w2 = guided.HostWalker(trans, accept, tb, tl)
        w2.state, w2.stack = st, list(w.stack)
        assert allowed[st, top][i] == w2.feed_token(i), tok


def test_mask_conservative_multi_pop(tables):
    """From AFTER_VAL with top=arr, '}]' (pop-below-top) must be masked out
    while ']' and ', ' stay allowed; ']]' is allowed only via the visible
    top + unknown-ws rule (it pops 2 -> masked out)."""
    _, _, _, _, _, _, allowed = tables
    st = 6  # AFTER_VAL
    assert allowed[st, guided.TOP_ARR][VOCAB.index("]")]
    assert allowed[st, guided.TOP_ARR][VOCAB.index(", ")]
    assert not allowed[st, guided.TOP_ARR][VOCAB.index("}]")]
    assert not allowed[st, guided.TOP_ARR][VOCAB.index("]]")]
    assert not allowed[st, guided.TOP_OBJ][VOCAB.index("]")]
    assert allowed[st, guided.TOP_OBJ][VOCAB.index("}")]


def test_eos_only_at_accept(tables):
    _, accept, _, _, _, _, allowed = tables
    eos_col = allowed[:, :, EOS]
    want = accept.copy()
    want[guided.DEAD, :] = True  # graceful stop from the dead sink
    assert (eos_col == want).all()


def test_guided_generation_parses(tables):
    """Sampling uniformly from the mask (with the exact device-walk rule)
    always yields a parseable JSON value — the end-to-end property the
    engine relies on."""
    trans, accept, _, tb, tl, _, allowed = tables
    rng = np.random.default_rng(1)
    for trial in range(50):
        w = guided.HostWalker(trans, accept, tb, tl)
        out = []
        for _ in range(400):
            ok = np.flatnonzero(allowed[w.state, w.top])
            assert len(ok) > 0, (trial, out)
            # Bias toward closing/EOS so traces terminate.
            weights = np.ones(len(ok))
            for j, t in enumerate(ok):
                if t == EOS:
                    weights[j] = 60.0
                elif VOCAB[t] in ("}", "]", '"'):
                    weights[j] = 12.0
            t = int(rng.choice(ok, p=weights / weights.sum()))
            if t == EOS:
                break
            assert w.feed_token(t), (trial, out, VOCAB[t])
            out.append(VOCAB[t])
        else:
            continue  # hit the length cap: incomplete is fine, skip parse
        if w.accepting:
            json.loads("".join(out))


def test_pack_mask_bits_roundtrip():
    rng = np.random.default_rng(2)
    a = rng.random((3, 4, 100)) < 0.3
    packed = guided.pack_mask_bits(a)
    words = packed.view(np.uint32)
    unpacked = (
        (words[..., np.arange(100) // 32] >> (np.arange(100) % 32)) & 1
    ).astype(bool)
    assert (unpacked == a).all()


def test_conservative_mask_cost_is_multi_pop_only():
    """Quantify VERDICT r4 weak #8: the (state, top)-conditioned masks are
    conservative ONLY for tokens whose byte walk would pop below the
    visible top (multi-close sequences like '}]'). Every mask-banned,
    sometimes-legal token must contain >= 2 closing brackets beyond its
    opens; single-close tokens are never banned — the model closes one
    container per token, which still reaches every valid JSON."""
    import itertools

    import numpy as np

    from nanovllm_tpu.ops import guided

    trans, accept, names = guided.build_json_automaton()
    toks = ["}", "]", "}]", "}}", "]]", "}]}", ",", "{", "[", '"a"', "1",
            " }", "} ]"]
    L = 8
    tb = np.full((len(toks), L), guided.PAD_BYTE, np.int32)
    tl = np.zeros(len(toks), np.int32)
    for i, t in enumerate(toks):
        b = t.encode()
        tb[i, : len(b)] = np.frombuffer(b, np.uint8)
        tl[i] = len(b)
    _, allowed = guided.compile_masks(trans, accept, tb, tl)

    def legal_with_stack(state, stack, tok):
        w = guided.HostWalker(trans, accept, tb, tl)
        w.state, w.stack = state, list(stack)
        return w.feed_token(tok)

    # Enumerate real stacks of depth <= 3 consistent with each visible top.
    syms = (guided.TOP_OBJ, guided.TOP_ARR)
    over_bans = 0
    for st in range(1, trans.shape[0]):
        for top in (guided.TOP_NONE, guided.TOP_OBJ, guided.TOP_ARR):
            for i, t in enumerate(toks):
                if allowed[st, top, i]:
                    continue  # mask allows: nothing conservative here
                stacks = [[]] if top == guided.TOP_NONE else [
                    list(pre) + [top]
                    for d in range(3)
                    for pre in itertools.product(syms, repeat=d)
                ]
                if any(legal_with_stack(st, s, i) for s in stacks):
                    over_bans += 1
                    closes = t.count("}") + t.count("]")
                    opens = t.count("{") + t.count("[")
                    assert closes - opens >= 2, (
                        f"non-multi-pop token {t!r} over-banned at "
                        f"({names[st]}, top={top})"
                    )
    # The conservativeness exists (multi-close tokens ARE over-banned
    # somewhere) but touches nothing else.
    assert over_bans > 0
