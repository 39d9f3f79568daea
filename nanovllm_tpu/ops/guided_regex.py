"""Regex guided decoding: compile a regex subset to a byte-level DFA in the
generic guided-automaton table format (vLLM's ``guided_regex`` analogue).

Rides the SAME per-request slot machinery as JSON Schemas
(ops/guided_schema.py / ModelRunner.ensure_guided_automaton): the DFA
installs into a reserved row range of the global tables, the on-device
mask/walk programs run unchanged, and the completion must FULL-match the
regex (EOS is sampleable exactly at accept states — outlines/vLLM
semantics).

Supported subset (byte-oriented; ASCII-first):
- literals (UTF-8 multi-byte literals work byte-wise), ``.`` (any byte
  except ``\\n``), escapes ``\\d \\D \\w \\W \\s \\S \\n \\t \\r \\\\`` and
  escaped punctuation;
- character classes ``[a-z0-9_]`` / negated ``[^...]`` (byte ranges;
  negation is over bytes 0x00-0xFF minus newline-safe semantics of the
  listed set);
- grouping ``(...)`` (non-capturing semantics), alternation ``|``;
- quantifiers ``* + ?`` and bounded ``{m}``, ``{m,}``, ``{m,n}``
  (n <= 64, expanded).

Construction: recursive-descent parse -> Thompson NFA -> subset-construction
DFA, capped at the slot's state budget. Out-of-subset syntax raises
``RegexError`` — requests fail loudly, never under-constrained.
"""

from __future__ import annotations

import numpy as np

from nanovllm_tpu.ops.guided import DEAD, PAD_BYTE


class RegexError(ValueError):
    """Regex outside the supported subset (or too large for the slot)."""


_DIGITS = frozenset(range(ord("0"), ord("9") + 1))
_WORD = frozenset(
    list(range(ord("a"), ord("z") + 1)) + list(range(ord("A"), ord("Z") + 1))
    + list(_DIGITS) + [ord("_")]
)
_SPACE = frozenset(b" \t\n\r\x0b\x0c")
_ALL = frozenset(range(256))
_DOT = _ALL - {ord("\n")}

_ESCAPES = {
    "d": _DIGITS, "D": _ALL - _DIGITS,
    "w": _WORD, "W": _ALL - _WORD,
    "s": _SPACE, "S": _ALL - _SPACE,
}
_CTRL = {"n": ord("\n"), "t": ord("\t"), "r": ord("\r"), "0": 0,
         "f": ord("\f"), "v": ord("\v")}


# --------------------------------------------------------------------- parse
# AST nodes: ("lit", frozenset_of_bytes) | ("seq", [..]) | ("alt", [..]) |
# ("rep", node, min, max_or_None)

class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def error(self, msg):
        raise RegexError(f"{msg} at position {self.i} in {self.p!r}")

    def peek(self):
        return self.p[self.i] if self.i < len(self.p) else None

    def eat(self):
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self):
        node = self.alt()
        if self.i != len(self.p):
            self.error(f"unexpected {self.peek()!r}")
        return node

    def alt(self):
        branches = [self.seq()]
        while self.peek() == "|":
            self.eat()
            branches.append(self.seq())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def seq(self):
        items = []
        while self.peek() not in (None, "|", ")"):
            items.append(self.repeat())
        if len(items) == 1:
            return items[0]
        return ("seq", items)

    def repeat(self):
        node = self.atom()
        c = self.peek()
        if c == "*":
            self.eat()
            node = ("rep", node, 0, None)
        elif c == "+":
            self.eat()
            node = ("rep", node, 1, None)
        elif c == "?":
            self.eat()
            node = ("rep", node, 0, 1)
        elif c == "{":
            self.eat()
            spec = ""
            while self.peek() not in (None, "}"):
                spec += self.eat()
            if self.peek() != "}":
                self.error("unterminated {")
            self.eat()
            parts = spec.split(",")
            try:
                if len(parts) == 1:
                    m = n = int(parts[0])
                elif len(parts) == 2:
                    m = int(parts[0]) if parts[0] else 0
                    n = int(parts[1]) if parts[1] else None
                else:
                    raise ValueError
            except ValueError:
                self.error(f"bad repetition {{{spec}}}")
            if n is not None and (n < m or n > 64):
                self.error(f"need m <= n <= 64 in {{{spec}}}")
            if m > 64:
                self.error(f"need m <= 64 in {{{spec}}}")
            node = ("rep", node, m, n)
        if self.peek() in ("*", "+", "?", "{"):
            self.error("nested bare quantifier (wrap in a group)")
        return node

    def atom(self):
        c = self.eat()
        if c == "(":
            if self.peek() == "?":
                # (?: ) non-capturing — same semantics here; others rejected.
                self.eat()
                if self.peek() != ":":
                    self.error("only (?: ) groups are supported")
                self.eat()
            node = self.alt()
            if self.peek() != ")":
                self.error("unterminated group")
            self.eat()
            return node
        if c == "[":
            return ("lit", self.char_class())
        if c == ".":
            return ("lit", _DOT)
        if c == "\\":
            return ("lit", self.escape())
        if c in ("^", "$"):
            self.i -= 1
            self.error("anchors are implicit (full-match semantics)")
        if c in ("*", "+", "?", "{", ")"):
            self.i -= 1
            self.error(f"unexpected {c!r}")
        return ("lit", frozenset(c.encode("utf-8")) if ord(c) < 128
                else self._utf8_seq(c))

    def _utf8_seq(self, c):
        # Multi-byte literal char: a SEQUENCE of its bytes.
        bs = c.encode("utf-8")
        return ("seq", [("lit", frozenset([b])) for b in bs])

    def escape(self):
        if self.peek() is None:
            self.error("dangling backslash")
        c = self.eat()
        if c in _ESCAPES:
            return _ESCAPES[c]
        if c in _CTRL:
            return frozenset([_CTRL[c]])
        if not c.isalnum():
            bs = c.encode("utf-8")
            if len(bs) == 1:
                return frozenset(bs)
            # Escaped multi-byte char: a byte SEQUENCE, not an alternative
            # over its bytes (r5 review finding). Only atom() callers can
            # take a sequence; char_class rejects it below.
            return ("seq", [("lit", frozenset([b])) for b in bs])
        self.error(f"unsupported escape \\{c}")

    def char_class(self):
        neg = False
        if self.peek() == "^":
            self.eat()
            neg = True
        chars = set()
        first = True
        while True:
            c = self.peek()
            if c is None:
                self.error("unterminated character class")
            if c == "]" and not first:
                self.eat()
                break
            first = False
            c = self.eat()
            if c == "\\":
                s = self.escape()
                if isinstance(s, tuple):
                    self.error("multi-byte char in class")
                chars |= s
                continue
            lo = ord(c)
            if lo > 127:
                self.error("non-ASCII char in class (use a literal)")
            if self.peek() == "-" and self.i + 1 < len(self.p) \
                    and self.p[self.i + 1] != "]":
                self.eat()
                hi_c = self.eat()
                if hi_c == "\\":
                    self.error("escape as range endpoint")
                hi = ord(hi_c)
                if hi < lo or hi > 127:
                    self.error(f"bad range {chr(lo)}-{chr(hi)}")
                chars |= set(range(lo, hi + 1))
            else:
                chars.add(lo)
        return frozenset(_ALL - chars) if neg else frozenset(chars)


def _normalize(node):
    """Flatten the atom helper's nested seq form."""
    if isinstance(node, tuple) and node[0] == "lit" and isinstance(
        node[1], tuple
    ):
        return node[1]
    return node


# ----------------------------------------------------------- NFA (Thompson)

class _NFA:
    def __init__(self):
        self.eps = []     # list of set(target)
        self.edges = []   # list of list[(frozenset bytes, target)]

    def new(self):
        self.eps.append(set())
        self.edges.append([])
        return len(self.eps) - 1

    def build(self, node, src, dst):
        node = _normalize(node)
        kind = node[0]
        if kind == "lit":
            self.edges[src].append((node[1], dst))
        elif kind == "seq":
            cur = src
            items = node[1]
            if not items:
                self.eps[src].add(dst)
                return
            for it in items[:-1]:
                nxt = self.new()
                self.build(it, cur, nxt)
                cur = nxt
            self.build(items[-1], cur, dst)
        elif kind == "alt":
            for br in node[1]:
                a, b = self.new(), self.new()
                self.eps[src].add(a)
                self.eps[b].add(dst)
                self.build(br, a, b)
        elif kind == "rep":
            _, sub, m, n = node
            cur = src
            for _ in range(m):                       # mandatory copies
                nxt = self.new()
                self.build(sub, cur, nxt)
                cur = nxt
            if n is None:                            # unbounded loop
                a = self.new()
                self.eps[cur].add(a)
                self.eps[cur].add(dst)
                b = self.new()
                self.build(sub, a, b)
                self.eps[b].add(a)
                self.eps[b].add(dst)
            else:
                for _ in range(n - m):               # optional copies
                    nxt = self.new()
                    self.build(sub, cur, nxt)
                    self.eps[cur].add(dst)
                    cur = nxt
                self.eps[cur].add(dst)
        else:  # pragma: no cover
            raise RegexError(f"internal: unknown node {kind}")

    def closure(self, states):
        out = set(states)
        stack = list(states)
        while stack:
            s = stack.pop()
            for t in self.eps[s]:
                if t not in out:
                    out.add(t)
                    stack.append(t)
        return frozenset(out)


def build_regex_automaton(pattern: str, max_states: int):
    """pattern -> (trans i32[n, 257], accept bool[n], n) with LOCAL ids
    (0 = DEAD, 1 = start) — the ops/guided_schema table format, installable
    by the same slot machinery. Full-match semantics."""
    ast = _Parser(pattern).parse()
    nfa = _NFA()
    s0, acc = nfa.new(), nfa.new()
    nfa.build(ast, s0, acc)

    start = nfa.closure({s0})
    dfa_ids = {start: 1}
    trans_rows = {1: np.zeros(257, np.int32)}
    accept = {1: acc in start}
    work = [start]
    key_of = {1: start}
    while work:
        S = work.pop()
        sid = dfa_ids[S]
        # Partition bytes by the NFA target signature.
        targets_by_byte = {}
        for s in S:
            for bytes_, t in nfa.edges[s]:
                for b in bytes_:
                    targets_by_byte.setdefault(b, set()).add(t)
        sig_cache = {}
        for b, ts in targets_by_byte.items():
            key = frozenset(ts)
            T = sig_cache.get(key)
            if T is None:
                T = nfa.closure(key)
                sig_cache[key] = T
            tid = dfa_ids.get(T)
            if tid is None:
                tid = len(dfa_ids) + 1
                if tid >= max_states:
                    raise RegexError(
                        f"regex compiles to more than {max_states - 1} DFA "
                        f"states (Config.guided_schema_states); simplify it "
                        f"or raise the knob"
                    )
                dfa_ids[T] = tid
                trans_rows[tid] = np.zeros(257, np.int32)
                accept[tid] = acc in T
                key_of[tid] = T
                work.append(T)
            trans_rows[sid][b] = tid
    n = len(dfa_ids) + 1
    trans = np.zeros((n, 257), np.int32)
    acc_arr = np.zeros(n, bool)
    for sid, row in trans_rows.items():
        trans[sid] = row
        trans[sid, PAD_BYTE] = sid
        acc_arr[sid] = accept[sid]
    trans[DEAD, PAD_BYTE] = DEAD
    return trans, acc_arr, n
