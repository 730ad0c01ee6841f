"""Recursive-descent parser for the seafan expression grammar.

Own implementation (the reference, parser.go:200-503, uses a repeated
outside-in operator scan over the raw string; a tokenizer + descent is the
natural Python shape and produces the same trees — verified against the
reference's 42-formula test corpus).

Grammar (loosest binding first, all left-associative):

    expr    := cmp (('&&' | '||') cmp)*
    cmp     := add (('>'|'>='|'<'|'<='|'=='|'!=') add)*
    add     := term (('+'|'-') term)*
    term    := '-' term | mul          # unary minus wraps a whole product
    mul     := pw (('*'|'/') pw)*
    pw      := atom ('^' atom)*
    atom    := NUMBER | QUOTED | IDENT '(' args ')' | IDENT
             | '(' expr ')' | '-' atom
    args    := expr (',' expr)*
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class ParseError(ValueError):
    pass


@dataclass
class Node:
    """Expression AST node."""

    kind: str  # 'num' | 'qlit' | 'field' | 'neg' | 'op' | 'func'
    value: str = ""
    children: list["Node"] = field(default_factory=list)

    def walk(self):
        yield self
        for c in self.children:
            yield from c.walk()


_TOKEN_RE = re.compile(
    r"""
    (?P<quoted>'[^']*')
  | (?P<number>(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op2>&&|\|\||>=|<=|==|!=)
  | (?P<op1>[+\-*/^><(),])
  | (?P<ws>\s+)
""",
    re.VERBOSE,
)


def tokenize(text: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ParseError(f"unexpected character {text[pos]!r} at {pos} in {text!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append((kind, m.group()))
    return toks


_CMP_OPS = {">", ">=", "<", "<=", "==", "!="}
_LOGIC_OPS = {"&&", "||"}


class _Parser:
    def __init__(self, toks: list[tuple[str, str]], text: str):
        self.toks = toks
        self.i = 0
        self.text = text

    def peek(self) -> str | None:
        return self.toks[self.i][1] if self.i < len(self.toks) else None

    def peek_kind(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise ParseError(f"unexpected end of expression: {self.text!r}")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str) -> None:
        k, v = self.next()
        if v != val:
            raise ParseError(f"expected {val!r}, got {v!r} in {self.text!r}")

    # precedence levels
    def parse_expr(self) -> Node:
        node = self.parse_cmp()
        while self.peek() in _LOGIC_OPS:
            _, op = self.next()
            node = Node("op", op, [node, self.parse_cmp()])
        return node

    def parse_cmp(self) -> Node:
        node = self.parse_add()
        while self.peek() in _CMP_OPS:
            _, op = self.next()
            node = Node("op", op, [node, self.parse_add()])
        return node

    def parse_add(self) -> Node:
        node = self.parse_term()
        while self.peek() in ("+", "-"):
            _, op = self.next()
            node = Node("op", op, [node, self.parse_term()])
        return node

    def parse_term(self) -> Node:
        # unary minus wraps the whole following product: -D*3 == -(D*3)
        if self.peek() == "-":
            self.next()
            return Node("neg", "-", [self.parse_term()])
        return self.parse_mul()

    def parse_mul(self) -> Node:
        node = self.parse_pow()
        while self.peek() in ("*", "/"):
            _, op = self.next()
            node = Node("op", op, [node, self.parse_pow()])
        return node

    def parse_pow(self) -> Node:
        node = self.parse_atom()
        while self.peek() == "^":
            self.next()
            node = Node("op", "^", [node, self.parse_atom()])
        return node

    def parse_atom(self) -> Node:
        kind, val = self.next()
        if kind == "number":
            return Node("num", val)
        if kind == "quoted":
            return Node("qlit", val[1:-1])
        if kind == "ident":
            if self.peek() == "(":
                self.next()
                args: list[Node] = []
                if self.peek() == ")":
                    self.next()
                else:
                    args.append(self.parse_expr())
                    while self.peek() == ",":
                        self.next()
                        args.append(self.parse_expr())
                    self.expect(")")
                return Node("func", val, args)
            return Node("field", val)
        if val == "(":
            node = self.parse_expr()
            self.expect(")")
            return node
        if val == "-":
            return Node("neg", "-", [self.parse_atom()])
        raise ParseError(f"unexpected token {val!r} in {self.text!r}")


def parse(expression: str) -> Node:
    """Parse a seafan expression string into an AST (Expr2Tree analogue)."""
    toks = tokenize(expression)
    if not toks:
        raise ParseError("empty expression")
    p = _Parser(toks, expression)
    node = p.parse_expr()
    if p.i != len(toks):
        raise ParseError(f"trailing input {p.toks[p.i:]} in {expression!r}")
    return node
