"""Guided decoding (JSON mode): an on-device pushdown automaton.

vLLM's guided decoding (outlines / xgrammar backends) runs a host-side FSM
that must see each sampled token before it can emit the next step's logit
mask — a per-step host sync this engine's async pipeline forbids (the
sampled tokens stay on device for `fetch_interval` steps; see
docs/serving_configs.md). The TPU-native answer is to move the automaton
itself on device:

- A char(byte)-level pushdown automaton for JSON values is compiled on the
  host into three SMALL dense tables (the full [n_states, V] token
  transition matrix of a token-level DFA — 100s of MB at a 152k vocab —
  is never materialized):

  * ``trans``   i16[n_states, 4, 257]: (state, top-of-stack, byte) ->
    next-state + stack action (push obj / push arr / pop), 257th column =
    padding no-op. Tops: none / obj / arr / unknown.
  * ``mask``    u32[n_states, 4, ceil(V/32)]: bit b of word w set iff
    token w*32+b may be sampled from (state, top). Computed by walking
    every token's bytes on the host, CONSERVATIVELY: a token may pop at
    most the visible top (deeper stack is unknown at mask-build time), so
    multi-close tokens like ``"}]"`` are excluded where ambiguous — the
    model closes one level per token there, which is still valid JSON.
    Quantified (tests/test_guided_ops.py
    test_conservative_mask_cost_is_multi_pop_only): the over-ban touches
    ONLY tokens whose walk nets >= 2 closes beyond their opens;
    single-close tokens are never banned, so every valid JSON value stays
    reachable — the sole expressiveness loss is that deep closings take
    one token per level.
  * ``token_bytes`` u8[V, L] (+ ``token_len`` i32[V]): each token's UTF-8
    bytes, padded with 256 (the no-op column).

- Per sequence, the device keeps (state, depth, stack[D]) in donated
  slabs. Each guided decode step adds the mask row (gathered by
  (state, top), unpacked from bits) as -inf biases BEFORE sampling, then
  walks the sampled token's bytes through ``trans`` with the REAL stack —
  the walk is exact even where the mask was conservative.

EOS is allowed exactly in accepting configurations (complete top-level
value, depth 0); everywhere else the EOS bit is cleared, so the model
cannot stop mid-value (max_tokens still truncates — same caveat as vLLM).

No reference analogue (nano-vllm has no guided decoding); vLLM semantics
target: ``SamplingParams(guided="json")``.
"""

from __future__ import annotations

import numpy as np

# Stack symbols / "top" values.
TOP_NONE = 0     # depth == 0
TOP_OBJ = 1
TOP_ARR = 2
TOP_UNKNOWN = 3  # mask-build only: below the visible top

# Stack actions, encoded into the transition table as state + ACT * ACT_LSB.
# GLOBAL state ids must stay < ACT_LSB: the generic block (38 states) plus
# every schema/regex slot row (Config.guided_schema_slots x
# guided_schema_states appended after it) — schema entries carry plain
# global ids, and an id >= ACT_LSB would decode as a bogus stack action
# (r5 review finding; ModelRunner._init_guided asserts the budget). The
# int16 host table caps ACT_LSB at ACT_POP * ACT_LSB + ACT_LSB <= 32767.
ACT_NONE, ACT_PUSH_OBJ, ACT_PUSH_ARR, ACT_POP = 0, 1, 2, 3
ACT_LSB = 4096

DEAD = 0  # state 0 is the dead state (self-loop, never accepting)

PAD_BYTE = 256  # padding column in trans: always a no-op self-edge

# ---------------------------------------------------------------------------
# Char-level JSON pushdown automaton (host construction)
# ---------------------------------------------------------------------------

_WS = [ord(c) for c in " \t\n\r"]
_DIGITS = list(range(ord("0"), ord("9") + 1))
_DIGITS19 = list(range(ord("1"), ord("9") + 1))
_HEX = _DIGITS + list(range(ord("a"), ord("f") + 1)) + \
    list(range(ord("A"), ord("F") + 1))
_ESCAPABLE = [ord(c) for c in '"\\/bfnrt']


def build_json_automaton():
    """Returns (trans i16[n_states, 4, 257], accept_mask bool[n_states, 4],
    state name list). States are context-free sub-states; container nesting
    lives on the runtime stack, so arbitrary (depth-capped) nesting costs no
    states."""
    names = [
        "DEAD", "VAL", "ARR_START", "OBJ_START", "OBJ_COLON", "OBJ_NEXTKEY",
        "AFTER_VAL", "STR", "ESC", "U1", "U2", "U3", "U4",
        "KEY", "KESC", "KU1", "KU2", "KU3", "KU4", "KEY_END",
        "NNEG", "NZERO", "NINT", "NDOT", "NFRAC", "NE", "NESIGN", "NEXP",
        "T1", "T2", "T3", "F1", "F2", "F3", "F4", "N1", "N2", "N3",
    ]
    s = {n: i for i, n in enumerate(names)}
    n = len(names)
    trans = np.zeros((n, 4, 258), dtype=np.int32)  # 258th col unused, sliced
    trans[:, :, :] = s["DEAD"]

    def edge(frm, chars, to, act=ACT_NONE, tops=(0, 1, 2, 3)):
        if isinstance(chars, int):
            chars = [chars]
        for t in tops:
            for c in chars:
                trans[s[frm], t, c] = s[to] + act * ACT_LSB

    # Padding byte: no-op self edge everywhere (keeps vectorized walks sane).
    for name in names:
        for t in range(4):
            trans[s[name], t, PAD_BYTE] = s[name]

    # Value start (top-level start; after '[', ',' in array, ':' in object).
    for frm in ("VAL", "ARR_START"):
        edge(frm, _WS, frm)
        edge(frm, ord('"'), "STR")
        edge(frm, ord("-"), "NNEG")
        edge(frm, ord("0"), "NZERO")
        edge(frm, _DIGITS19, "NINT")
        edge(frm, ord("t"), "T1")
        edge(frm, ord("f"), "F1")
        edge(frm, ord("n"), "N1")
        edge(frm, ord("{"), "OBJ_START", ACT_PUSH_OBJ)
        edge(frm, ord("["), "ARR_START", ACT_PUSH_ARR)
    edge("ARR_START", ord("]"), "AFTER_VAL", ACT_POP, tops=(TOP_ARR,))

    # Object body.
    edge("OBJ_START", _WS, "OBJ_START")
    edge("OBJ_START", ord('"'), "KEY")
    edge("OBJ_START", ord("}"), "AFTER_VAL", ACT_POP, tops=(TOP_OBJ,))
    edge("OBJ_NEXTKEY", _WS, "OBJ_NEXTKEY")
    edge("OBJ_NEXTKEY", ord('"'), "KEY")
    edge("KEY_END", _WS, "KEY_END")
    edge("KEY_END", ord(":"), "VAL")
    edge("OBJ_COLON", _WS, "OBJ_COLON")  # legacy alias of KEY_END (unused)
    edge("OBJ_COLON", ord(":"), "VAL")

    # Strings (value and key variants; \uXXXX spelled out).
    str_chars = [c for c in range(0x20, 0x100) if c not in (0x22, 0x5C)]
    edge("STR", str_chars, "STR")
    edge("STR", ord("\\"), "ESC")
    edge("STR", ord('"'), "AFTER_VAL")
    edge("ESC", _ESCAPABLE, "STR")
    edge("ESC", ord("u"), "U1")
    edge("U1", _HEX, "U2")
    edge("U2", _HEX, "U3")
    edge("U3", _HEX, "U4")
    edge("U4", _HEX, "STR")
    edge("KEY", str_chars, "KEY")
    edge("KEY", ord("\\"), "KESC")
    edge("KEY", ord('"'), "KEY_END")
    edge("KESC", _ESCAPABLE, "KEY")
    edge("KESC", ord("u"), "KU1")
    edge("KU1", _HEX, "KU2")
    edge("KU2", _HEX, "KU3")
    edge("KU3", _HEX, "KU4")
    edge("KU4", _HEX, "KEY")

    # Literals.
    for lit, chain in (("true", ["T1", "T2", "T3"]),
                       ("false", ["F1", "F2", "F3", "F4"]),
                       ("null", ["N1", "N2", "N3"])):
        for i, frm in enumerate(chain):
            to = chain[i + 1] if i + 1 < len(chain) else "AFTER_VAL"
            edge(frm, ord(lit[i + 1]), to)

    # Numbers. Delimiters terminate a complete number by delegating to
    # AFTER_VAL's edge for that char (set after AFTER_VAL below).
    edge("NNEG", ord("0"), "NZERO")
    edge("NNEG", _DIGITS19, "NINT")
    edge("NZERO", ord("."), "NDOT")
    edge("NZERO", [ord("e"), ord("E")], "NE")
    edge("NINT", _DIGITS, "NINT")
    edge("NINT", ord("."), "NDOT")
    edge("NINT", [ord("e"), ord("E")], "NE")
    edge("NDOT", _DIGITS, "NFRAC")
    edge("NFRAC", _DIGITS, "NFRAC")
    edge("NFRAC", [ord("e"), ord("E")], "NE")
    edge("NE", [ord("+"), ord("-")], "NESIGN")
    edge("NE", _DIGITS, "NEXP")
    edge("NESIGN", _DIGITS, "NEXP")
    edge("NEXP", _DIGITS, "NEXP")

    # After a complete value: ws, ',' (container-dependent), or close-pop.
    edge("AFTER_VAL", _WS, "AFTER_VAL")
    edge("AFTER_VAL", ord(","), "OBJ_NEXTKEY", tops=(TOP_OBJ,))
    edge("AFTER_VAL", ord(","), "VAL", tops=(TOP_ARR,))
    edge("AFTER_VAL", ord("}"), "AFTER_VAL", ACT_POP, tops=(TOP_OBJ,))
    edge("AFTER_VAL", ord("]"), "AFTER_VAL", ACT_POP, tops=(TOP_ARR,))

    # Number-terminating delimiters delegate to AFTER_VAL rows.
    for frm in ("NZERO", "NINT", "NFRAC", "NEXP"):
        for c in _WS + [ord(","), ord("}"), ord("]")]:
            trans[s[frm], :, c] = trans[s["AFTER_VAL"], :, c]

    # Accepting (EOS-allowed) configurations: complete top-level value.
    accept = np.zeros((n, 4), dtype=bool)
    for frm in ("AFTER_VAL", "NZERO", "NINT", "NFRAC", "NEXP"):
        accept[s[frm], TOP_NONE] = True

    return trans[:, :, :257].astype(np.int16), accept, names


# ---------------------------------------------------------------------------
# Tokenizer -> byte table
# ---------------------------------------------------------------------------

def token_byte_table(tokenizer, vocab_size: int, max_len: int = 16):
    """u8-as-i32[V, L] byte table + i32[V] lengths. Tokens longer than
    ``max_len`` bytes (rare merged words; never short JSON glue) and special
    tokens are marked length -1 = never maskable. Bytes come from decoding
    each id alone; byte-level BPE round-trips exactly."""
    tb = np.full((vocab_size, max_len), PAD_BYTE, dtype=np.int32)
    tl = np.full(vocab_size, -1, dtype=np.int32)
    specials = set(getattr(tokenizer, "all_special_ids", []) or [])
    # The model's (padded) vocab can exceed the tokenizer's id space; ids
    # past it stay unmaskable (-1).
    n = min(vocab_size, len(tokenizer))
    # Batch-decode for speed (one Python call per id is minutes at 152k).
    texts = tokenizer.batch_decode(
        [[i] for i in range(n)], skip_special_tokens=False
    )
    for i, t in enumerate(texts):
        if i in specials:
            continue
        b = t.encode("utf-8")
        if 0 < len(b) <= max_len:
            tb[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
            tl[i] = len(b)
    return tb, tl


# ---------------------------------------------------------------------------
# Mask compilation (host): conservative per-(state, top) allowed tokens
# ---------------------------------------------------------------------------

def compile_masks(trans, accept, token_bytes, token_len, eos_ids=()):
    """u32-as-i32[n_states, 4, ceil(V/32)] packed allowed-token bits.

    A token is allowed from (state, top) iff walking its bytes never dies,
    never pops below the visible top (the deeper stack is unknown here —
    the device walk is exact, the mask only has (state, top)), and pushes
    within the token are tracked exactly. EOS ids are allowed iff the
    configuration is accepting."""
    n_states = trans.shape[0]
    V, L = token_bytes.shape
    allowed = np.zeros((n_states, 4, V), dtype=bool)
    for st in range(n_states):
        if st == DEAD:
            continue
        for top in range(4):
            # Vectorized walk over all tokens from (st, top). Virtual stack
            # of within-token pushes; rel depth -1 == popped the visible top.
            cur = np.full(V, st, dtype=np.int32)
            rel = np.zeros(V, dtype=np.int32)       # pushes above base
            below = np.zeros(V, dtype=bool)         # popped visible top
            vstack = np.zeros((V, L), dtype=np.int32)
            ok = token_len > 0
            for p in range(L):
                # Current visible top for each token's walk.
                topv = np.where(
                    rel > 0,
                    vstack[np.arange(V), np.maximum(rel - 1, 0)],
                    np.where(below, TOP_UNKNOWN, top),
                )
                e = trans[cur, topv, token_bytes[:, p]]
                nxt = e % ACT_LSB
                act = e // ACT_LSB
                # A pop below the visible top is unknowable here: kill.
                pop_bad = (act == ACT_POP) & (rel == 0) & below
                # Popping the base when there is none (top == TOP_NONE edges
                # never pop by construction, but guard anyway).
                pop_base = (act == ACT_POP) & (rel == 0) & ~below
                step_ok = (nxt != DEAD) & ~pop_bad
                ok &= step_ok | (p >= token_len)
                live = p < token_len
                # Apply pushes/pops where the walk is still live.
                push = live & (act == ACT_PUSH_OBJ)
                vstack[push, np.minimum(rel[push], L - 1)] = TOP_OBJ
                pusha = live & (act == ACT_PUSH_ARR)
                vstack[pusha, np.minimum(rel[pusha], L - 1)] = TOP_ARR
                rel = np.where(live & (act >= ACT_PUSH_OBJ) & (act <= ACT_PUSH_ARR), rel + 1, rel)
                pop_v = live & (act == ACT_POP) & (rel > 0)
                rel = np.where(pop_v, rel - 1, rel)
                below = below | (live & pop_base)
                cur = np.where(live, nxt, cur)
            allowed[st, top] = ok
    # EOS exactly in accepting configurations — plus from DEAD (a walk that
    # hit the device depth cap parks there; EOS ends it gracefully instead
    # of sampling an argmax over all -inf).
    for e in eos_ids:
        if 0 <= e < V:
            allowed[:, :, e] = False
            allowed[accept, e] = True
            allowed[DEAD, :, e] = True
    return pack_mask_bits(allowed), allowed


def pack_mask_bits(allowed: np.ndarray) -> np.ndarray:
    """bool[..., V] -> i32[..., ceil(V/32)] little-endian bit packing
    (bit b of word w covers token w*32 + b)."""
    V = allowed.shape[-1]
    W = -(-V // 32)
    pad = np.zeros(allowed.shape[:-1] + (W * 32 - V,), dtype=bool)
    bits = np.concatenate([allowed, pad], axis=-1)
    bits = bits.reshape(allowed.shape[:-1] + (W, 32))
    weights = (1 << np.arange(32, dtype=np.uint64))
    words = (bits.astype(np.uint64) * weights).sum(-1)
    return words.astype(np.uint32).view(np.int32).reshape(
        allowed.shape[:-1] + (W,)
    )


# ---------------------------------------------------------------------------
# Host reference walker (tests / oracle)
# ---------------------------------------------------------------------------

def build_engine_tables(tokenizer, vocab_size: int, eos_ids):
    """Everything the engine needs, as host numpy: the automaton, packed
    masks, token byte tables. ~seconds at a 152k vocab (vectorized walks);
    tiny-vocab test fixtures are instant."""
    trans, accept, _ = build_json_automaton()
    tb, tl = token_byte_table(tokenizer, vocab_size)
    packed, _ = compile_masks(trans, accept, tb, tl, eos_ids=eos_ids)
    return dict(
        trans=trans.astype(np.int32), accept=accept,
        maskbits=packed, token_bytes=tb, token_len=tl,
    )


# ---------------------------------------------------------------------------
# Device side (JAX): logit masking + exact sampled-token walk
# ---------------------------------------------------------------------------

DEPTH_CAP = 32  # device stack depth; past it the walk parks in DEAD


def mask_logits(logits, gstate, gdepth, gstack, slot_ids, maskbits,
                v_offset=0):
    """-inf-mask ``logits`` [S, Vl] by each row's (state, top) allowed set.

    ``maskbits`` i32[n_states, 4, W] packed bits; ``v_offset`` is this
    rank's global vocab offset (vocab-sharded logits gather their own word
    window — W need not align to rank boundaries). Rows with state < 0
    (unguided) pass through untouched."""
    import jax
    import jax.numpy as jnp

    S, Vl = logits.shape
    slot = slot_ids[:S]
    st = gstate[slot]
    active = st >= 0
    depth = gdepth[slot]
    top = jnp.where(
        depth > 0,
        jnp.take_along_axis(
            gstack[slot], jnp.clip(depth - 1, 0, gstack.shape[1] - 1)[:, None],
            axis=1,
        )[:, 0],
        TOP_NONE,
    )
    rows = maskbits[jnp.clip(st, 0, maskbits.shape[0] - 1), top]  # [S, W]
    vidx = jnp.arange(Vl, dtype=jnp.int32) + v_offset
    words = jnp.take_along_axis(
        rows, jnp.broadcast_to(vidx // 32, (S, Vl)), axis=1
    )
    ok = (words >> (vidx % 32)[None, :]) & 1
    bad = (ok == 0) & active[:, None]
    return jnp.where(bad, jnp.float32(-1e30), logits.astype(jnp.float32))


def walk_sampled(gstate, gdepth, gstack, slot_ids, tokens, trans, tok_bytes,
                 dead_slot, update_mask=None):
    """Advance per-slot automaton state by each row's sampled token.

    The exact pushdown walk (real stack, depth-capped to DEAD): 16 fixed
    char steps through ``trans`` i32[n_states, 4, 257]; padding bytes are
    self-edges. Rows with state < 0 (or excluded by ``update_mask``) write
    to ``dead_slot``."""
    import jax
    import jax.numpy as jnp

    S = tokens.shape[0]
    slot = slot_ids[:S]
    st = gstate[slot]
    active = st >= 0
    if update_mask is not None:
        active = active & update_mask
    depth = gdepth[slot]
    stack = gstack[slot]                       # [S, D]
    D = stack.shape[1]
    chars = tok_bytes[tokens]                  # [S, L]
    n_states = trans.shape[0]

    def body(p, carry):
        st, depth, stack = carry
        ch = jax.lax.dynamic_index_in_dim(chars.T, p, 0, keepdims=False)
        top = jnp.where(
            depth > 0,
            jnp.take_along_axis(
                stack, jnp.clip(depth - 1, 0, D - 1)[:, None], axis=1
            )[:, 0],
            TOP_NONE,
        )
        e = trans[jnp.clip(st, 0, n_states - 1), top, ch]
        nxt = e % ACT_LSB
        act = e // ACT_LSB
        push = (act == ACT_PUSH_OBJ) | (act == ACT_PUSH_ARR)
        at_cap = push & (depth >= D)
        sym = jnp.where(act == ACT_PUSH_OBJ, TOP_OBJ, TOP_ARR)
        wcol = jnp.clip(depth, 0, D - 1)
        cur = jnp.take_along_axis(stack, wcol[:, None], axis=1)[:, 0]
        newv = jnp.where(push & ~at_cap, sym, cur)
        stack = jax.vmap(
            lambda row, c, v: row.at[c].set(v)
        )(stack, wcol, newv)
        depth = depth + jnp.where(push & ~at_cap, 1, 0)
        depth = depth - jnp.where((act == ACT_POP) & (depth > 0), 1, 0)
        st = jnp.where(at_cap, DEAD, nxt)
        return st, depth, stack

    st2, depth2, stack2 = jax.lax.fori_loop(
        0, chars.shape[1], body, (st, depth, stack)
    )
    wslot = jnp.where(active, slot, dead_slot)
    gstate = gstate.at[wslot].set(jnp.where(active, st2, 0))
    gdepth = gdepth.at[wslot].set(jnp.where(active, depth2, 0))
    gstack = gstack.at[wslot].set(
        jnp.where(active[:, None], stack2, 0)
    )
    return gstate, gdepth, gstack


class HostWalker:
    """Pure-Python mirror of the device walk — the test oracle and the
    re-prefill resume walker. ``start`` is the automaton's start state
    (1 = generic VAL; JSON-Schema automata start at their slot base)."""

    def __init__(self, trans, accept, token_bytes, token_len, depth_cap=32,
                 start=1):
        self.trans, self.accept = trans, accept
        self.tb, self.tl = token_bytes, token_len
        self.depth_cap = depth_cap
        self.start = start
        self.reset()

    def reset(self):
        self.state, self.stack = self.start, []

    @property
    def top(self):
        return self.stack[-1] if self.stack else TOP_NONE

    def feed_token(self, tok: int) -> bool:
        n = self.tl[tok]
        if n <= 0:
            self.state = DEAD
            return False
        for p in range(n):
            e = int(self.trans[self.state, self.top, self.tb[tok, p]])
            nxt, act = e % ACT_LSB, e // ACT_LSB
            if nxt == DEAD:
                self.state = DEAD
                return False
            if act == ACT_PUSH_OBJ or act == ACT_PUSH_ARR:
                if len(self.stack) >= self.depth_cap:
                    self.state = DEAD
                    return False
                self.stack.append(
                    TOP_OBJ if act == ACT_PUSH_OBJ else TOP_ARR
                )
            elif act == ACT_POP:
                if not self.stack:
                    self.state = DEAD
                    return False
                self.stack.pop()
            self.state = nxt
        return True

    @property
    def accepting(self) -> bool:
        return bool(self.accept[self.state, self.top])
