"""Recursive-descent parser for the HTSQL-style language.

Grammar (loosest → tightest binding), modeled on the reference's
grammar (reference: src/htsql/core/syn/parse.py::parse,
src/htsql/core/syn/grammar.py):

    query      : '/'? expr ('/'? pipe)* END
    expr       : pipe
    pipe       : sieve (':' NAME piped-args?)*
    sieve      : or (('?' or) | ('^' or))*
    or         : and ('|' and)*
    and        : not ('&' not)*
    not        : '!' not | comparison
    comparison : additive (CMP additive)?        CMP: = != == !== ~ !~ < <= > >=
    additive   : multiplicative (('+'|'-') multiplicative)*
    multiplicative : unary (('*'|'/') unary)*
    unary      : ('-'|'+') unary | postfix
    postfix    : atom ( '.' member | '{' items '}' | '[' identity ']' )*
    member     : NAME ('(' args ')')? | '*'
    atom       : NAME ('(' args ')')? | NUMBER | STRING | '*' NUMBER?
               | '^' | '$' NAME | '@' postfix | '(' expr ')'
               | '{' items '}' | '/' expr?
    item       : (NAME | '$' NAME) ':=' expr | expr ('+'|'-')?
"""

from __future__ import annotations

import decimal

from .lex import ParseError, Token, tokenize  # noqa: F401 — ParseError re-exported
from . import nodes as N


_CMP_OPS = {"=", "!=", "==", "!==", "~", "!~", "<", "<=", ">", ">="}
_ITEM_TERMINATORS = {",", "}", ")", "]", ":", "?", "^"}


class _Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    # -- token helpers -------------------------------------------------
    @property
    def tok(self) -> Token:
        return self.toks[self.i]

    def peek(self, k: int = 1) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def at(self, kind: str, text: str | None = None) -> bool:
        t = self.tok
        return t.kind == kind and (text is None or t.text == text)

    def at_sym(self, *texts: str) -> bool:
        return self.tok.kind == "SYMBOL" and self.tok.text in texts

    def advance(self) -> Token:
        t = self.tok
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> Token:
        if not self.at(kind, text):
            raise ParseError(
                f"expected {text or kind!r}, got {self.tok.text!r} at position {self.tok.pos}"
            )
        return self.advance()

    # -- entry ---------------------------------------------------------
    def parse_query(self) -> N.Node:
        segment = False
        if self.at_sym("/"):
            self.advance()
            segment = True
        if self.at("END"):
            if segment:
                return N.Segment(None)
            raise ParseError("empty query")
        node = self.parse_expr()
        # trailing format pipes:  /query/:csv
        while self.at_sym("/") and self.peek().kind == "SYMBOL" and self.peek().text == ":":
            self.advance()
            node = self.parse_pipe_tail(node)
        if not self.at("END"):
            raise ParseError(f"unexpected {self.tok.text!r} at position {self.tok.pos}")
        return N.Segment(node) if segment else node

    # -- precedence ladder --------------------------------------------
    def parse_expr(self) -> N.Node:
        return self.parse_pipe()

    def parse_pipe(self) -> N.Node:
        node = self.parse_sieve()
        while self.at_sym(":"):
            node = self.parse_pipe_tail(node)
        return node

    def parse_pipe_tail(self, node: N.Node) -> N.Node:
        self.expect("SYMBOL", ":")
        name = self.expect("NAME").text
        args: list[N.Node] = [node]
        if self.at_sym("("):
            self.advance()
            args.extend(self.parse_args(")"))
            self.expect("SYMBOL", ")")
        elif self.tok.kind in ("NAME", "NUMBER", "STRING") or self.at_sym("$"):
            # single bare argument:  expr :as 'Title'
            args.append(self.parse_item())
        return N.Apply(name, args)

    def parse_sieve(self) -> N.Node:
        node = self.parse_or()
        while self.at_sym("?", "^"):
            op = self.advance().text
            rhs = self.parse_or()
            if op == "?":
                node = N.Sieve(node, rhs)
            else:
                node = _attach_quotient(node, rhs)
        return node

    def parse_or(self) -> N.Node:
        node = self.parse_and()
        while self.at_sym("|"):
            self.advance()
            node = N.Operator("|", node, self.parse_and())
        return node

    def parse_and(self) -> N.Node:
        node = self.parse_not()
        while self.at_sym("&"):
            self.advance()
            node = N.Operator("&", node, self.parse_not())
        return node

    def parse_not(self) -> N.Node:
        if self.at_sym("!"):
            self.advance()
            return N.Unary("!", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> N.Node:
        node = self.parse_additive()
        if self.tok.kind == "SYMBOL" and self.tok.text in _CMP_OPS:
            op = self.advance().text
            rhs = self.parse_additive()
            node = N.Operator(op, node, rhs)
        return node

    def _ends_expression(self) -> bool:
        t = self.tok
        return t.kind == "END" or (t.kind == "SYMBOL" and t.text in _ITEM_TERMINATORS)

    def parse_additive(self) -> N.Node:
        node = self.parse_multiplicative()
        while self.at_sym("+", "-"):
            # sort decorator `expr-` / `expr+`: the sign is trailed by a
            # terminator rather than an operand — leave it for parse_item.
            nxt = self.peek()
            if nxt.kind == "END" or (nxt.kind == "SYMBOL" and nxt.text in _ITEM_TERMINATORS):
                break
            op = self.advance().text
            node = N.Operator(op, node, self.parse_multiplicative())
        return node

    def parse_multiplicative(self) -> N.Node:
        node = self.parse_unary()
        while self.at_sym("*", "/"):
            # `*` only multiplies when an operand follows; `{a, *}` keeps
            # wildcard semantics because `*` appears in atom position.
            # `/query/:csv` — a `/` directly followed by a pipe or a
            # terminator is a segment separator, not division.
            nxt = self.peek()
            if nxt.kind == "END" or (nxt.kind == "SYMBOL" and nxt.text in _ITEM_TERMINATORS):
                break
            op = self.advance().text
            node = N.Operator(op, node, self.parse_unary())
        return node

    def parse_unary(self) -> N.Node:
        if self.at_sym("-", "+"):
            op = self.advance().text
            return N.Unary(op, self.parse_unary())
        return self.parse_postfix()

    # -- postfix chain -------------------------------------------------
    def parse_postfix(self) -> N.Node:
        node = self.parse_atom()
        while True:
            if self.at_sym("."):
                # numbers such as `1.3` never reach here (lexed as one
                # NUMBER); `.` is always composition.
                self.advance()
                node = N.Compose(node, self.parse_member())
            elif self.at_sym("{"):
                self.advance()
                items = self.parse_args("}")
                self.expect("SYMBOL", "}")
                node = N.Selection(node, items)
            elif self.at_sym("["):
                self.advance()
                ident = self.parse_identity()
                self.expect("SYMBOL", "]")
                node = N.Locate(node, ident)
            else:
                return node

    def parse_member(self) -> N.Node:
        if self.at_sym("*"):
            self.advance()
            return N.Wildcard()
        name = self.expect("NAME").text
        if self.at_sym("("):
            self.advance()
            args = self.parse_args(")")
            self.expect("SYMBOL", ")")
            return N.Apply(name, args)
        return N.Identifier(name)

    def parse_atom(self) -> N.Node:
        t = self.tok
        if t.kind == "NAME":
            self.advance()
            low = t.text.lower()
            if low == "true" and not self.at_sym("("):
                return N.Literal(True, "boolean")
            if low == "false" and not self.at_sym("("):
                return N.Literal(False, "boolean")
            if low == "null" and not self.at_sym("("):
                return N.Literal(None, "null")
            if self.at_sym("("):
                self.advance()
                args = self.parse_args(")")
                self.expect("SYMBOL", ")")
                return N.Apply(t.text, args)
            return N.Identifier(t.text)
        if t.kind == "NUMBER":
            self.advance()
            return _number_literal(t.text)
        if t.kind == "STRING":
            self.advance()
            return N.Literal(t.text, "untyped")
        if self.at_sym("*"):
            self.advance()
            if self.tok.kind == "NUMBER" and "." not in self.tok.text:
                idx = int(self.advance().text)
                return N.Wildcard(idx)
            return N.Wildcard()
        if self.at_sym("^"):
            self.advance()
            return N.Complement()
        if self.at_sym("$"):
            self.advance()
            return N.Reference(self.expect("NAME").text)
        if self.at_sym("@"):
            self.advance()
            return N.Detach(self.parse_postfix())
        if self.at_sym("("):
            self.advance()
            node = self.parse_expr()
            self.expect("SYMBOL", ")")
            return node
        if self.at_sym("{"):
            self.advance()
            items = self.parse_args("}")
            self.expect("SYMBOL", "}")
            return N.Selection(None, items)
        if self.at_sym("/"):
            self.advance()
            if self._ends_expression():
                return N.Segment(None)
            return N.Segment(self.parse_expr())
        raise ParseError(f"unexpected {t.text!r} at position {t.pos}")

    # -- argument / item lists ----------------------------------------
    def parse_args(self, closer: str) -> list[N.Node]:
        items: list[N.Node] = []
        if self.at_sym(closer):
            return items
        items.append(self.parse_item())
        while self.at_sym(","):
            self.advance()
            if self.at_sym(closer):  # tolerate trailing comma
                break
            items.append(self.parse_item())
        return items

    def parse_item(self) -> N.Node:
        # assignment forms:  name := expr   /   $name := expr
        if self.tok.kind == "NAME" and self.peek().kind == "SYMBOL" and self.peek().text == ":=":
            name = self.advance().text
            self.advance()
            return N.Assignment(name, self.parse_expr())
        if (
            self.at_sym("$")
            and self.peek().kind == "NAME"
            and self.peek(2).kind == "SYMBOL"
            and self.peek(2).text == ":="
        ):
            self.advance()
            name = self.advance().text
            self.advance()
            return N.Assignment(name, self.parse_expr(), is_reference=True)
        node = self.parse_expr()
        if self.at_sym("+", "-") and (
            self.peek().kind == "END"
            or (self.peek().kind == "SYMBOL" and self.peek().text in _ITEM_TERMINATORS)
        ):
            asc = self.advance().text == "+"
            return N.Direction(node, asc)
        return node

    def parse_identity(self) -> list[object]:
        """Identity literal inside `[...]` — dotted labels
        (reference: src/htsql/core/domain.py::IdentityDomain)."""
        parts: list[object] = []

        def push(tok: Token) -> None:
            if tok.kind == "NUMBER":
                if "." in tok.text:
                    # `[1.3]` lexes as one NUMBER; `['a'.3]` leaves a
                    # NUMBER `.3` whose leading dot is the separator
                    for p in tok.text.split("."):
                        if p:
                            parts.append(int(p))
                else:
                    parts.append(int(tok.text))
            else:
                parts.append(tok.text)

        while not self.at_sym("]"):
            t = self.tok
            if t.kind in ("NUMBER", "NAME", "STRING"):
                push(self.advance())
            elif self.at_sym("."):
                self.advance()
            elif self.at_sym("-") and self.peek().kind == "NUMBER":
                self.advance()
                neg = self.advance()
                parts.append(-int(neg.text))
            else:
                raise ParseError(f"bad identity literal at position {t.pos}")
        return parts


def _attach_quotient(base: N.Node, rhs: N.Node) -> N.Node:
    """`flow ^ kernel{selection}…` — a selection (and anything after
    it) binds to the *quotient*, not the kernel: rebase the postfix
    chain so the Quotient sits under the first Selection.  A plain
    postfix chain with no selection (`^nation.name`) is all kernel."""
    rebased, split = _rebase_quotient(base, rhs)
    return rebased if split else N.Quotient(base, rhs)


def _rebase_quotient(base: N.Node, rhs: N.Node) -> tuple[N.Node, bool]:
    if isinstance(rhs, N.Selection) and rhs.base is not None:
        inner, split = _rebase_quotient(base, rhs.base)
        if split:
            return N.Selection(inner, rhs.items), True
        return N.Selection(N.Quotient(base, rhs.base), rhs.items), True
    if isinstance(rhs, N.Selection) and rhs.base is None:
        # a bare record at the head of the chain IS the kernel; what
        # follows (`.define(...)`, a selection, …) binds to the
        # quotient: `flow^{k}.define(v := sum(^.x))` groups first,
        # then defines on the quotient flow
        return N.Quotient(base, rhs), True
    if isinstance(rhs, N.Compose):
        inner, split = _rebase_quotient(base, rhs.base)
        if split:
            return N.Compose(inner, rhs.op), True
        return rhs, False
    if isinstance(rhs, N.Locate):
        inner, split = _rebase_quotient(base, rhs.base)
        if split:
            return N.Locate(inner, rhs.identity), True
        return rhs, False
    return rhs, False


def _number_literal(text: str) -> N.Literal:
    if "e" in text or "E" in text:
        return N.Literal(float(text), "float")
    if "." in text:
        return N.Literal(decimal.Decimal(text), "decimal")
    return N.Literal(int(text), "integer")


def parse(text: str) -> N.Node:
    """Parse query text → AST."""
    return _Parser(tokenize(text)).parse_query()
