"""Lexer for the HTSQL-style query language.

Regex-driven scanner producing a flat token stream (reference:
src/htsql/core/syn/scan.py::scan, src/htsql/core/syn/token.py::Token).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class ParseError(ValueError):
    """Syntax-level user error (lexing or parsing)."""


class LexError(ParseError):
    pass


@dataclass(frozen=True)
class Token:
    kind: str  # NAME NUMBER STRING SYMBOL END
    text: str
    pos: int

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.kind}:{self.text!r}@{self.pos}"


# longest-match-first symbol list
_SYMBOLS = [
    ":=", "!==", "!=~", "==", "!=", "<=", ">=", "!~", "~", "->",
    "?", "^", ".", ",", "{", "}", "(", ")", "[", "]", "*", "+", "-",
    "/", ":", ";", "=", "<", ">", "&", "|", "!", "$", "@",
]

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<string>'(?:[^']|'')*')
  | (?P<symbol>""" + "|".join(re.escape(s) for s in _SYMBOLS) + r""")
    """,
    re.VERBOSE,
)


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise LexError(f"unexpected character {text[pos]!r} at position {pos}")
        if m.lastgroup != "ws":
            kind = {"number": "NUMBER", "name": "NAME", "string": "STRING", "symbol": "SYMBOL"}[m.lastgroup]
            tok_text = m.group()
            if kind == "STRING":
                tok_text = tok_text[1:-1].replace("''", "'")
            out.append(Token(kind, tok_text, pos))
        pos = m.end()
    out.append(Token("END", "", n))
    return out
