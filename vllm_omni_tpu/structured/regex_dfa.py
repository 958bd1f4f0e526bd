"""Regex -> byte-level DFA via Brzozowski derivatives.

The constrained-decoding equivalent of the reference's xgrammar matcher
(reference worker/gpu_ar_model_runner.py:268-330 applies xgrammar's
bitmask per step). We compile the pattern over the BYTE alphabet
(UTF-8), so any tokenizer whose tokens decode to byte strings composes
with it, and build the DFA with derivative construction — no NFA
intermediate, states are regex ASTs hash-consed into ids.

Supported syntax (the subset JSON-schema compilation emits, plus the
usual practical operators): literals, escapes (\\d \\w \\s \\D \\W \\S
\\n \\t \\r \\\\ \\. etc.), char classes [a-z0-9_] with negation and
ranges, '.', grouping, alternation '|', '*', '+', '?', bounded
repetition {m}, {m,}, {m,n} (n <= 256).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Union

# ---------------------------------------------------------------- AST
# Nodes are hashable tuples (smart-constructed into canonical form):
#   ("empty",)                 the empty language
#   ("eps",)                   the empty string
#   ("chars", frozenset[int])  one byte from the set
#   ("cat", r, s)
#   ("alt", (r1, r2, ...))     sorted tuple
#   ("star", r)

EMPTY = ("empty",)
EPS = ("eps",)

Node = tuple


def chars(s: frozenset) -> Node:
    if not s:
        return EMPTY
    return ("chars", s)


def cat(r: Node, s: Node) -> Node:
    if r == EMPTY or s == EMPTY:
        return EMPTY
    if r == EPS:
        return s
    if s == EPS:
        return r
    # right-associate so equal languages share structure
    if r[0] == "cat":
        return cat(r[1], cat(r[2], s))
    return ("cat", r, s)


def alt(*nodes: Node) -> Node:
    flat: set = set()
    charset: set = set()
    for n in nodes:
        if n == EMPTY:
            continue
        if n[0] == "alt":
            for m in n[1]:
                if m[0] == "chars":
                    charset |= m[1]
                else:
                    flat.add(m)
        elif n[0] == "chars":
            charset |= n[1]
        else:
            flat.add(n)
    if charset:
        flat.add(chars(frozenset(charset)))
    if not flat:
        return EMPTY
    if len(flat) == 1:
        return next(iter(flat))
    return ("alt", tuple(sorted(flat)))


def star(r: Node) -> Node:
    if r in (EMPTY, EPS):
        return EPS
    if r[0] == "star":
        return r
    return ("star", r)


@lru_cache(maxsize=None)
def nullable(r: Node) -> bool:
    tag = r[0]
    if tag in ("eps", "star"):
        return True
    if tag in ("empty", "chars"):
        return False
    if tag == "cat":
        return nullable(r[1]) and nullable(r[2])
    if tag == "alt":
        return any(nullable(n) for n in r[1])
    raise ValueError(tag)


@lru_cache(maxsize=None)
def deriv(r: Node, c: int) -> Node:
    """Brzozowski derivative of r w.r.t. byte c."""
    tag = r[0]
    if tag in ("empty", "eps"):
        return EMPTY
    if tag == "chars":
        return EPS if c in r[1] else EMPTY
    if tag == "cat":
        d = cat(deriv(r[1], c), r[2])
        if nullable(r[1]):
            return alt(d, deriv(r[2], c))
        return d
    if tag == "alt":
        return alt(*(deriv(n, c) for n in r[1]))
    if tag == "star":
        return cat(deriv(r[1], c), r)
    raise ValueError(tag)


# ------------------------------------------------------------- parser
_DIGITS = frozenset(range(0x30, 0x3A))
_WORD = frozenset(
    list(range(0x30, 0x3A)) + list(range(0x41, 0x5B))
    + list(range(0x61, 0x7B)) + [0x5F])
_SPACE = frozenset([0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C])
_ALL = frozenset(range(256))
_DOT = _ALL - frozenset([0x0A])  # '.' = any byte but newline

_ESCAPES = {
    "d": _DIGITS, "D": _ALL - _DIGITS,
    "w": _WORD, "W": _ALL - _WORD,
    "s": _SPACE, "S": _ALL - _SPACE,
    "n": frozenset([0x0A]), "t": frozenset([0x09]),
    "r": frozenset([0x0D]), "f": frozenset([0x0C]),
    "v": frozenset([0x0B]), "0": frozenset([0x00]),
}


class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def peek(self) -> str:
        return self.p[self.i] if self.i < len(self.p) else ""

    def next(self) -> str:
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self) -> Node:
        r = self.alternation()
        if self.i != len(self.p):
            raise ValueError(f"unexpected '{self.peek()}' at {self.i}")
        return r

    def alternation(self) -> Node:
        branches = [self.concat()]
        while self.peek() == "|":
            self.next()
            branches.append(self.concat())
        return alt(*branches) if len(branches) > 1 else branches[0]

    def concat(self) -> Node:
        parts = []
        while self.peek() not in ("", "|", ")"):
            parts.append(self.repeat())
        r = EPS
        for p in reversed(parts):
            r = cat(p, r)
        return r

    def repeat(self) -> Node:
        r = self.atom()
        while True:
            c = self.peek()
            if c == "*":
                self.next()
                r = star(r)
            elif c == "+":
                self.next()
                r = cat(r, star(r))
            elif c == "?":
                self.next()
                r = alt(r, EPS)
            elif c == "{":
                r = self._bounded(r)
            else:
                return r

    def _bounded(self, r: Node) -> Node:
        save = self.i
        self.next()  # '{'
        num = ""
        while self.peek().isdigit():
            num += self.next()
        if not num:
            # not a repetition: treat '{' as a literal byte
            self.i = save + 1
            return cat(r, chars(frozenset(b"{")))
        m = int(num)
        n: Union[int, None] = m
        if self.peek() == ",":
            self.next()
            num2 = ""
            while self.peek().isdigit():
                num2 += self.next()
            n = int(num2) if num2 else None
        if self.peek() != "}":
            raise ValueError(f"bad repetition at {self.i}")
        self.next()
        if n is not None and (n < m or n > 256):
            raise ValueError(f"bad repetition bounds {{{m},{n}}}")
        out = EPS
        for _ in range(m):
            out = cat(out, r)
        if n is None:
            out = cat(out, star(r))
        else:
            opt = alt(r, EPS)
            for _ in range(n - m):
                out = cat(out, opt)
        return out

    def atom(self) -> Node:
        c = self.next()
        if c == "(":
            if self.peek() == "?":  # (?:...) non-capturing
                self.next()
                if self.peek() != ":":
                    raise ValueError("only (?:...) groups supported")
                self.next()
            r = self.alternation()
            if self.peek() != ")":
                raise ValueError("unbalanced group")
            self.next()
            return r
        if c == "[":
            return chars(self._char_class())
        if c == ".":
            return chars(_DOT)
        if c == "\\":
            return chars(self._escape())
        if c in "*+?{":
            raise ValueError(f"dangling '{c}'")
        return self._literal(c)

    def _literal(self, ch: str) -> Node:
        bs = ch.encode("utf-8")
        r = EPS
        for b in bs:
            r = cat(r, chars(frozenset([b])))
        return r

    def _escape(self) -> frozenset:
        e = self.next()
        if e in _ESCAPES:
            return _ESCAPES[e]
        if e == "x":
            h = self.next() + self.next()
            return frozenset([int(h, 16)])
        return frozenset(e.encode("utf-8")) if len(e.encode("utf-8")) == 1 \
            else frozenset(e.encode("utf-8"))  # non-ascii literal escape

    def _char_class(self) -> frozenset:
        negate = False
        if self.peek() == "^":
            self.next()
            negate = True
        out: set = set()
        first = True
        while True:
            c = self.peek()
            if c == "":
                raise ValueError("unterminated char class")
            if c == "]" and not first:
                self.next()
                break
            first = False
            self.next()
            if c == "\\":
                s = self._escape()
                if len(s) > 1:
                    out |= s
                    continue
                lo = next(iter(s))
            else:
                eb = c.encode("utf-8")
                if len(eb) > 1:
                    out |= set(eb)
                    continue
                lo = eb[0]
            if self.peek() == "-" and self.i + 1 < len(self.p) \
                    and self.p[self.i + 1] != "]":
                self.next()  # '-'
                hc = self.next()
                if hc == "\\":
                    hi = next(iter(self._escape()))
                else:
                    hi = hc.encode("utf-8")[0]
                out |= set(range(lo, hi + 1))
            else:
                out.add(lo)
        return frozenset(_ALL - out if negate else out)


# ---------------------------------------------------------------- DFA
class RegexDFA:
    """Byte-level DFA. States are dense ints; state 0 is the start.

    trans[s] : dict byte -> state (missing byte = dead)
    finals   : set of accepting states
    """

    def __init__(self, pattern: str):
        root = _Parser(pattern).parse()
        # partition bytes into equivalence classes by which char-sets of
        # the regex contain them: one derivative per class, not per byte
        sets = self._collect_charsets(root)
        sig_to_bytes: dict[tuple, list[int]] = {}
        for b in range(256):
            sig = tuple(b in s for s in sets)
            sig_to_bytes.setdefault(sig, []).append(b)
        classes = list(sig_to_bytes.values())

        self.trans: list[dict[int, int]] = []
        self.finals: set[int] = set()
        ids: dict[Node, int] = {}

        def intern(n: Node) -> int:
            sid = ids.get(n)
            if sid is None:
                sid = ids[n] = len(self.trans)
                self.trans.append({})
                if nullable(n):
                    self.finals.add(sid)
            return sid

        start = intern(root)
        assert start == 0
        work = [root]
        seen = {root}
        while work:
            n = work.pop()
            sid = ids[n]
            for cls in classes:
                d = deriv(n, cls[0])
                if d == EMPTY:
                    continue
                did = intern(d)
                for b in cls:
                    self.trans[sid][b] = did
                if d not in seen:
                    seen.add(d)
                    work.append(d)

    @staticmethod
    def _collect_charsets(root: Node) -> list[frozenset]:
        out: list[frozenset] = []
        seen: set = set()
        stack = [root]
        while stack:
            n = stack.pop()
            tag = n[0]
            if tag == "chars":
                if n[1] not in seen:
                    seen.add(n[1])
                    out.append(n[1])
            elif tag == "cat":
                stack += [n[1], n[2]]
            elif tag == "alt":
                stack += list(n[1])
            elif tag == "star":
                stack.append(n[1])
        return out

    @property
    def num_states(self) -> int:
        return len(self.trans)

    def step(self, state: int, byte: int) -> int:
        """Next state or -1 (dead)."""
        return self.trans[state].get(byte, -1)

    def walk(self, state: int, bs: bytes) -> int:
        for b in bs:
            state = self.trans[state].get(b, -1)
            if state < 0:
                return -1
        return state

    def matches(self, s: Union[str, bytes]) -> bool:
        bs = s.encode("utf-8") if isinstance(s, str) else s
        st = self.walk(0, bs)
        return st >= 0 and st in self.finals
