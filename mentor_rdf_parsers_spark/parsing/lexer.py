"""Priority-ordered regex lexer with pre-assigned blank-node IDs.

Re-creates the behavior of the reference Chevrotain lexers
(/root/reference/src/*/parser.ts) as a single compiled alternation that is
built once per interpreter (the Spark analogue of amortizing
``performSelfAnalysis()``, /root/reference/src/turtle/parser.ts:516): every
Arrow batch re-uses the module-level compiled tables.

First-match-wins over the ordered vocabulary == Python ``re`` alternation
semantics (leftmost alternative preferred), matching Chevrotain's
"order of tokens matters" contract.

Blank-node ID pre-assignment ports /root/reference/src/utils.ts:9-93:
tokens that can create blank nodes get an ID at lex time from a counter
walking the token stream; labeled nodes reuse one ID per distinct label;
the file-scoped generator prefixes a djb2/base36 hash of the document id.
"""

from __future__ import annotations

import re
from typing import Callable, NamedTuple, Optional

from .tokens import CASE_INSENSITIVE

__all__ = [
    "Token",
    "LexError",
    "Lexer",
    "assign_blank_node_ids",
    "default_bnode_generator",
    "file_scoped_bnode_generator",
    "djb2_base36",
    "BLANK_NODE_TOKEN_NAMES",
]


class Token(NamedTuple):
    type: str
    image: str
    start: int
    # Pre-assigned blank-node ID (mutated list cell so NamedTuple stays cheap)
    bnode_id: Optional[str] = None

    def with_bnode(self, bid: str) -> "Token":
        return Token(self.type, self.image, self.start, bid)


class LexError(NamedTuple):
    offset: int
    length: int
    message: str


# /root/reference/src/utils.ts:9-17
BLANK_NODE_TOKEN_NAMES = frozenset(
    {
        "LBRACKET",
        "LPARENT",
        "OPEN_ANNOTATION",
        "TILDE",
        "OPEN_REIFIED_TRIPLE",
        "LCURLY",
        "BLANK_NODE_LABEL",
    }
)


def default_bnode_generator(counter: int, token: Token) -> str:
    """/root/reference/src/utils.ts:32-37 — 'b0', 'b1', …; labels keep label."""
    if token.type == "BLANK_NODE_LABEL":
        return token.image[2:]
    return f"b{counter}"


def djb2_base36(s: str) -> str:
    """Bit-exact port of the JS hash in src/utils.ts:81-93.

    JS: h = 5381; h = (h * 33 ^ c) | 0  (32-bit signed);  (h >>> 0).toString(36)
    """
    h = 5381
    for ch in s:
        # JS charCodeAt yields UTF-16 units; encode astral chars as a pair.
        cp = ord(ch)
        if cp > 0xFFFF:
            cp -= 0x10000
            units = (0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF))
        else:
            units = (cp,)
        for u in units:
            h = ((h * 33) & 0xFFFFFFFF) ^ u
            h &= 0xFFFFFFFF
    # (h >>> 0) is just the unsigned value; to base36 lowercase
    n = h
    if n == 0:
        return "0"
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    out = []
    while n:
        n, r = divmod(n, 36)
        out.append(digits[r])
    return "".join(reversed(out))


def file_scoped_bnode_generator(
    doc_id: str, prefix: Optional[str] = None
) -> Callable[[int, Token], str]:
    """/root/reference/src/utils.ts:81-93 — collision-free cross-file IDs.

    Pass a precomputed ``prefix`` when the caller already hashed the
    doc_id (the extract loop needs the prefix anyway — hashing twice per
    document showed up at ~10% of parse time in profiles)."""
    if prefix is None:
        prefix = djb2_base36(doc_id)

    def gen(counter: int, token: Token) -> str:
        if token.type == "BLANK_NODE_LABEL":
            return f"{prefix}_{token.image[2:]}"
        return f"{prefix}_b{counter}"

    return gen


def assign_blank_node_ids(
    tokens: list[Token],
    generator: Callable[[int, Token], str] = default_bnode_generator,
) -> list[Token]:
    """Port of /root/reference/src/utils.ts:47-71.

    Counter increments for every blank-node-capable token except repeated
    occurrences of an already-seen label.
    """
    counter = 0
    label_map: dict[str, str] = {}
    out = list(tokens)
    for i, tok in enumerate(out):
        if tok.type in BLANK_NODE_TOKEN_NAMES:
            if tok.type == "BLANK_NODE_LABEL":
                label = tok.image
                bid = label_map.get(label)
                if bid is None:
                    bid = generator(counter, tok)
                    counter += 1
                    label_map[label] = bid
            else:
                bid = generator(counter, tok)
                counter += 1
            out[i] = tok.with_bnode(bid)
    return out


class Lexer:
    """Compiled ordered-alternation lexer for one syntax vocabulary.

    Whitespace and comments are fused into the master regex as a skip
    prefix, so a `ws* token` pair costs ONE C-level match instead of two
    (every parser drops COMMENT tokens immediately, so never emitting
    them is behavior-preserving; profiled ~1.6× on the lex stage)."""

    _SKIP = r"(?:[\s﻿]+|#[^\n\r]*)"

    def __init__(self, vocabulary: list[tuple[str, str]]):
        parts = []
        for name, pat in vocabulary:
            body = f"(?i:{pat})" if name in CASE_INSENSITIVE else pat
            parts.append(f"(?P<{name}>{body})")
        self._re = re.compile("|".join(parts))
        self._skip_re = re.compile(self._SKIP + "+")
        self._names = [name for name, _ in vocabulary]

    def tokenize(
        self,
        text: str,
        bnode_generator: Optional[Callable[[int, Token], str]] = default_bnode_generator,
        comment_sink: Optional[list] = None,
    ) -> tuple[list[Token], list[LexError]]:
        """Scan the whole document. Unmatchable characters are skipped one at
        a time and reported (Chevrotain default error recovery).

        ``comment_sink``: when given, COMMENT tokens (normally dropped)
        are appended to it in source order — the input to the comment-
        lineage attachment of turtle.read_quad_contexts (mirrors the
        reference keeping comments in the token stream for
        readQuadContexts, src/turtle/reader.ts:94-98)."""
        tokens: list[Token] = []
        errors: list[LexError] = []
        append = tokens.append
        skip_match = self._skip_re.match
        pos = 0
        n = len(text)
        # One C-level finditer step per token; a gap between consecutive
        # matches is unlexable input (minus any whitespace/comments inside
        # it) → error record, mirroring Chevrotain's skip-and-report.
        for m in self._re.finditer(text):
            start = m.start()
            if start != pos:
                sm = skip_match(text, pos)
                skip_end = sm.end() if sm is not None else pos
                if skip_end < start:
                    errors.append(
                        LexError(
                            skip_end,
                            start - skip_end,
                            f"unexpected character(s): {text[skip_end:start]!r}",
                        )
                    )
            name = m.lastgroup
            if name != "WS" and name != "COMMENT":
                append(Token(name, m.group(), start))
            elif name == "COMMENT" and comment_sink is not None:
                comment_sink.append(Token(name, m.group(), start))
            pos = m.end()
        if pos < n:
            sm = skip_match(text, pos)
            skip_end = sm.end() if sm is not None else pos
            if skip_end < n:
                errors.append(
                    LexError(
                        skip_end, n - skip_end,
                        f"unexpected character(s): {text[skip_end:n]!r}",
                    )
                )
        if bnode_generator is not None:
            tokens = assign_blank_node_ids(tokens, bnode_generator)
        return tokens, errors
