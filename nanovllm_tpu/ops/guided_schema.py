"""JSON-Schema guided decoding: compile a schema subset into a char-level DFA
in the SAME table format as the generic JSON pushdown automaton
(ops/guided.py), so the on-device mask/walk machinery runs UNCHANGED.

Per-request automata install into reserved row ranges of the GLOBAL
transition/mask tables (Config.guided_schema_slots slots of
guided_schema_states rows each, after the generic block): the device step
programs index tables by global state id, so a schema request simply arms at
its automaton's start state — no program recompiles, no per-step host sync
(vLLM's schema backends, outlines/xgrammar, run host-side FSMs; here the
walk stays on device like generic JSON mode).

Supported subset (structured-output style):
- ``object``: properties emitted in DECLARED ORDER; ``required`` lists the
  keys that may not be skipped (absent -> all properties required); no
  additionalProperties.
- ``array``: ``items`` subschema; ``minItems`` / ``maxItems`` (unrolled,
  maxItems <= 16).
- ``string`` (free-form JSON string), ``integer``, ``number``, ``boolean``,
  ``null``; ``type`` may be a list of those scalar names.
- ``enum`` (strings / numbers / booleans / null) and ``const``.
Anything else (anyOf/oneOf/$ref/pattern/bounds/additionalProperties...)
raises SchemaError — the caller falls back to generic ``guided="json"`` or
rejects the request loudly, never silently under-constrains.

A fixed structure needs no container stack: schema rows carry no push/pop
actions, the walk's depth stays 0, so every (state, top) gather sees
top == TOP_NONE (rows are replicated across the 4 top columns for safety).
"""

from __future__ import annotations

import json

import numpy as np

from nanovllm_tpu.ops.guided import DEAD, PAD_BYTE, pack_mask_bits

_WS = [ord(c) for c in " \t\n\r"]
_DIGITS = list(range(ord("0"), ord("9") + 1))
_DIGITS19 = list(range(ord("1"), ord("9") + 1))
_HEX = _DIGITS + list(range(ord("a"), ord("f") + 1)) + \
    list(range(ord("A"), ord("F") + 1))
_ESCAPABLE = [ord(c) for c in '"\\/bfnrt']
_STR_CHARS = [c for c in range(0x20, 0x100) if c not in (0x22, 0x5C)]

# Keywords that change what strings a schema admits. Present-but-unsupported
# ones must ERROR (silently ignoring them would emit out-of-schema output).
_UNSUPPORTED = (
    "anyOf", "oneOf", "allOf", "not", "$ref", "pattern", "format",
    "minLength", "maxLength", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "multipleOf", "patternProperties",
    "minProperties", "maxProperties", "uniqueItems", "prefixItems",
    "additionalItems", "if", "then", "else", "dependentSchemas",
    "propertyNames", "contains",
)


class SchemaError(ValueError):
    """The schema uses a keyword/shape outside the supported subset."""


class _Builder:
    """Char-level DFA under construction. Local state 0 = DEAD; state ids are
    LOCAL here and remapped to a global row range at install time."""

    def __init__(self, cap: int):
        self.cap = cap
        self.trans = np.zeros((cap, 257), np.int32)   # 0 = DEAD everywhere
        self.accept = np.zeros(cap, bool)
        self.n = 1
        # (number-complete state, exit): at finalize, the exit's outgoing
        # edges are copied into the state wherever it has none — numbers
        # have no terminator char, so a complete number must accept exactly
        # the delimiters its context accepts (the generic automaton's
        # AFTER_VAL delegation trick, ops/guided.py).
        self.delegations: list[tuple[int, int]] = []

    def new(self) -> int:
        if self.n >= self.cap:
            raise SchemaError(
                f"schema compiles to more than {self.cap - 1} states "
                f"(Config.guided_schema_states); simplify the schema or "
                f"raise the knob"
            )
        self.n += 1
        return self.n - 1

    def edge(self, frm: int, chars, to: int):
        if isinstance(chars, int):
            chars = [chars]
        for c in chars:
            cur = self.trans[frm, c]
            if cur != DEAD and cur != to:
                raise SchemaError(
                    f"ambiguous schema: byte {chr(c)!r} leads two ways "
                    f"from one position (e.g. enum values where one is a "
                    f"prefix of another, or a type list with overlapping "
                    f"first characters)"
                )
            self.trans[frm, c] = to

    def ws(self, st: int):
        for c in _WS:
            if self.trans[st, c] == DEAD:
                self.trans[st, c] = st

    # ------------------------------------------------------------- values

    def lit_trie(self, entry: int, data: bytes, exit_: int):
        """Insert one literal byte string as a trie path entry -> exit."""
        cur = entry
        for i, c in enumerate(data):
            last = i == len(data) - 1
            nxt = int(self.trans[cur, c])
            if last:
                self.edge(cur, c, exit_)
            elif nxt == DEAD:
                to = self.new()
                self.edge(cur, c, to)
                cur = to
            elif nxt == exit_:
                raise SchemaError(
                    f"enum/const values conflict: one is a prefix of "
                    f"another ({data!r})"
                )
            else:
                cur = nxt

    def string(self, entry: int, exit_: int):
        body = self.new()
        self.edge(entry, ord('"'), body)
        self.edge(body, _STR_CHARS, body)
        self.edge(body, ord('"'), exit_)
        esc = self.new()
        self.edge(body, ord("\\"), esc)
        self.edge(esc, _ESCAPABLE, body)
        u = [self.new() for _ in range(4)]
        self.edge(esc, ord("u"), u[0])
        for a, bto in zip(u, u[1:] + [body]):
            self.edge(a, _HEX, bto)

    def number(self, entry: int, exit_: int, integer: bool):
        nneg, nzero, nint = self.new(), self.new(), self.new()
        self.edge(entry, ord("-"), nneg)
        self.edge(entry, ord("0"), nzero)
        self.edge(entry, _DIGITS19, nint)
        self.edge(nneg, ord("0"), nzero)
        self.edge(nneg, _DIGITS19, nint)
        self.edge(nint, _DIGITS, nint)
        complete = [nzero, nint]
        if not integer:
            ndot, nfrac, ne, nesign, nexp = (self.new() for _ in range(5))
            self.edge(nzero, ord("."), ndot)
            self.edge(nint, ord("."), ndot)
            self.edge(ndot, _DIGITS, nfrac)
            self.edge(nfrac, _DIGITS, nfrac)
            for frm in (nzero, nint, nfrac):
                self.edge(frm, [ord("e"), ord("E")], ne)
            self.edge(ne, [ord("+"), ord("-")], nesign)
            self.edge(ne, _DIGITS, nexp)
            self.edge(nesign, _DIGITS, nexp)
            self.edge(nexp, _DIGITS, nexp)
            complete += [nfrac, nexp]
        for st in complete:
            self.delegations.append((st, exit_))

    def value(self, entry: int, schema, exit_: int):
        if not isinstance(schema, dict):
            raise SchemaError(f"subschema must be an object, got {schema!r}")
        bad = [k for k in _UNSUPPORTED if k in schema]
        if bad:
            raise SchemaError(f"unsupported schema keywords: {bad}")
        if "const" in schema:
            vals = [schema["const"]]
        elif "enum" in schema:
            vals = list(schema["enum"])
            if not vals:
                raise SchemaError("empty enum")
        else:
            vals = None
        if vals is not None:
            for v in vals:
                if isinstance(v, (dict, list)):
                    raise SchemaError(
                        f"enum/const of composite values unsupported: {v!r}"
                    )
                self.lit_trie(
                    entry, json.dumps(v, separators=(",", ":")).encode(),
                    exit_,
                )
            return
        t = schema.get("type")
        if t is None and "properties" in schema:
            t = "object"
        types = t if isinstance(t, list) else [t]
        if t is None:
            raise SchemaError(
                "subschema without type/enum/const/properties (free-form "
                "values need generic guided='json')"
            )
        if isinstance(t, list) and any(
            x in ("object", "array") for x in t
        ):
            raise SchemaError("type lists may only mix scalar types")
        if "number" in types and "integer" in types:
            raise SchemaError("type list with both number and integer")
        for typ in types:
            if typ == "object":
                self.object(entry, schema, exit_)
            elif typ == "array":
                self.array(entry, schema, exit_)
            elif typ == "string":
                self.string(entry, exit_)
            elif typ == "integer":
                self.number(entry, exit_, integer=True)
            elif typ == "number":
                self.number(entry, exit_, integer=False)
            elif typ == "boolean":
                self.lit_trie(entry, b"true", exit_)
                self.lit_trie(entry, b"false", exit_)
            elif typ == "null":
                self.lit_trie(entry, b"null", exit_)
            else:
                raise SchemaError(f"unsupported type {typ!r}")

    def object(self, entry: int, schema, exit_: int):
        if schema.get("additionalProperties"):
            raise SchemaError("additionalProperties unsupported")
        props = list((schema.get("properties") or {}).items())
        req = schema.get("required")
        required = set(req) if req is not None else {k for k, _ in props}
        unknown = required - {k for k, _ in props}
        if unknown:
            raise SchemaError(f"required names not in properties: {unknown}")
        m = len(props)

        def allowed(i):
            """Key indices emittable next from position i: optional keys may
            be skipped in order, required ones may not."""
            out = []
            for j in range(i, m):
                out.append(j)
                if props[j][0] in required:
                    break
            return out

        def can_close(i):
            return all(k not in required for k, _ in props[i:])

        # Each key's ':' + value + after-value machinery is built ONCE and
        # shared by every origin whose trie lands on it (with optional keys,
        # a key is reachable from several predecessor positions; only the
        # short '"key"' trie paths are per-origin).
        kend_memo, comma_memo = {}, {}

        def key_target(j):
            if j in kend_memo:
                return kend_memo[j]
            ke = self.new()
            kend_memo[j] = ke
            self.ws(ke)
            ventry = self.new()
            self.edge(ke, ord(":"), ventry)
            self.ws(ventry)
            vafter = self.new()
            self.value(ventry, props[j][1], vafter)
            self.ws(vafter)
            if can_close(j + 1):
                self.edge(vafter, ord("}"), exit_)
            if allowed(j + 1):
                self.edge(vafter, ord(","), comma_state(j + 1))
            return ke

        def key_tries(st, i):
            """From ``st``, expect (in declared order) some key j >= i."""
            self.ws(st)
            for j in allowed(i):
                self.lit_trie(
                    st, json.dumps(props[j][0]).encode(), key_target(j)
                )

        def comma_state(i):
            """State after a ',': a key MUST follow (no trailing commas)."""
            if i in comma_memo:
                return comma_memo[i]
            st = self.new()
            comma_memo[i] = st
            key_tries(st, i)
            return st

        open_ = self.new()
        self.edge(entry, ord("{"), open_)
        if can_close(0):
            self.edge(open_, ord("}"), exit_)
        key_tries(open_, 0)

    def array(self, entry: int, schema, exit_: int):
        items = schema.get("items")
        if items is None:
            raise SchemaError(
                "array without items unsupported (free-form arrays need "
                "generic guided='json')"
            )
        mn = int(schema.get("minItems", 0))
        mx = schema.get("maxItems")
        if mx is not None:
            mx = int(mx)
            if not 0 <= mn <= mx <= 16:
                raise SchemaError(
                    f"need 0 <= minItems <= maxItems <= 16 for unrolling, "
                    f"got [{mn}, {mx}]"
                )
        elif mn > 16:
            raise SchemaError(f"minItems {mn} > 16 (unrolled)")
        open_ = self.new()
        self.edge(entry, ord("["), open_)
        self.ws(open_)
        if mn == 0:
            self.edge(open_, ord("]"), exit_)
        if mx == 0:
            return

        def item(ent, k):
            """One unrolled item instance from ``ent``; its after state may
            close once at least minItems items were emitted."""
            after = self.new()
            self.value(ent, items, after)
            self.ws(after)
            if k + 1 >= mn:
                self.edge(after, ord("]"), exit_)
            return after

        ent = open_
        # Unroll max(mn, 1) instances, then (if unbounded) one looping one.
        unroll = mx if mx is not None else max(mn, 1)
        last_after = None
        for k in range(unroll):
            last_after = item(ent, k)
            if k + 1 < unroll:
                ent = self.new()
                self.edge(last_after, ord(","), ent)
                self.ws(ent)
        if mx is None:
            loop_ent = self.new()
            self.edge(last_after, ord(","), loop_ent)
            self.ws(loop_ent)
            loop_after = self.new()
            self.value(loop_ent, items, loop_after)
            self.ws(loop_after)
            self.edge(loop_after, ord("]"), exit_)
            self.edge(loop_after, ord(","), loop_ent)

    # ----------------------------------------------------------- finalize

    def finalize(self):
        n = self.n
        trans = self.trans[:n].copy()
        accept = self.accept[:n].copy()
        # Number-complete delegation: copy the exit's edges where the number
        # state has none, and inherit its acceptance. Exits are structural
        # states (never themselves delegated), so one pass suffices.
        delegated = {st for st, _ in self.delegations}
        for _, ex in self.delegations:
            assert ex not in delegated, "delegation chain (builder bug)"
        for st, ex in self.delegations:
            for c in range(257):
                if trans[st, c] == DEAD and trans[ex, c] != DEAD:
                    trans[st, c] = trans[ex, c]
            accept[st] |= accept[ex]
        # Padding byte: self-edge (vectorized walks are length-padded).
        for st in range(1, n):
            trans[st, PAD_BYTE] = st
        return trans, accept


def build_schema_automaton(schema, max_states: int):
    """schema (a dict) -> (trans i32[n, 257], accept bool[n], n) with LOCAL
    ids (0 = DEAD, 1 = start). Raises SchemaError outside the subset."""
    b = _Builder(max_states)
    start = b.new()
    b.ws(start)
    final = b.new()
    b.ws(final)
    b.accept[final] = True
    b.value(start, schema, final)
    trans, accept = b.finalize()
    return trans, accept, b.n


def build_choice_automaton(choices, max_states: int):
    """Bare-text choices (vLLM ``guided_choice`` semantics: the completion
    is EXACTLY one of the strings — no JSON quoting, no whitespace): a
    UTF-8 byte trie with EOS at the leaves. Choices where one is a strict
    prefix of another raise (the DFA could not tell where to stop)."""
    if not choices:
        raise SchemaError("empty choice list")
    b = _Builder(max_states)
    start = b.new()
    final = b.new()
    b.accept[final] = True
    for c in choices:
        data = str(c).encode("utf-8")
        if not data:
            raise SchemaError("empty string in choice list")
        b.lit_trie(start, data, final)
    trans, accept = b.finalize()
    return trans, accept, b.n


def compile_masks_dfa(trans, accept, token_bytes, token_len, eos_ids=()):
    """Token masks for a stack-free (DFA) automaton block: token allowed
    from state st iff its byte walk never dies. Much cheaper than the
    generic ``compile_masks`` (no virtual stack, single top) — the first
    step's full [n, V] gather dominates; later steps touch survivors only.

    Returns (packed i32[n, 4, W], allowed bool[n, V]) with rows replicated
    across the 4 top columns (schema walks always see top == TOP_NONE)."""
    n = trans.shape[0]
    V, L = token_bytes.shape
    cur = np.broadcast_to(
        np.arange(n, dtype=np.int32)[:, None], (n, V)
    ).copy()
    for p in range(L):
        live = (token_len > p)[None, :] & (cur != DEAD)
        r, c = np.nonzero(live)
        if r.size == 0:
            break
        cur[r, c] = trans[cur[r, c], token_bytes[c, p]]
    allowed = (cur != DEAD) & (token_len > 0)[None, :]
    allowed[DEAD] = False
    for e in eos_ids:
        if 0 <= e < V:
            allowed[:, e] = accept
    rep = np.repeat(allowed[:, None, :], 4, axis=1)
    return pack_mask_bits(rep), allowed


def remap_to_global(trans_local: np.ndarray, base: int) -> np.ndarray:
    """Rebase local state ids onto global table rows: local 0 (DEAD) stays
    global 0 (the generic automaton's dead row); local s >= 1 becomes
    base + s - 1. Schema rows carry no stack actions, so entries are plain
    state ids."""
    return np.where(
        trans_local == DEAD, 0, trans_local + (base - 1)
    ).astype(np.int32)
