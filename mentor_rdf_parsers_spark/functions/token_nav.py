"""Token navigation utilities — the editor/tooling API surface of the
reference's ``src/utils.ts:100-273``, over this engine's ``Token``
stream (``parsing/lexer.py``).

These are driver-side helpers for building formatters, highlighters and
language tooling on top of the lexers; nothing in the distributed
extract path calls them. Tokens are the ``parsing.lexer.Token``
NamedTuples (type, image, start, bnode_id); offsets are 0-based like
the reference's Chevrotain offsets.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

from ..parsing.lexer import BLANK_NODE_TOKEN_NAMES, Token

#: ``BLANK_NODE_TOKEN_NAMES`` is re-exported from ``parsing.lexer`` —
#: the single source of truth for which token types carry lex-time
#: pre-assigned blank-node IDs (src/utils.ts:9-17).


def get_blank_node_id_from_token(token: Token) -> Optional[str]:
    """The lex-time pre-assigned blank-node ID (src/utils.ts:100-102)."""
    return token.bnode_id


def split_prefixed_name(
    pname: str, use_whole_as_prefix_when_missing_colon: bool = False,
) -> Tuple[str, str]:
    """Split ``ex:foo`` → (``"ex"``, ``"foo"``); ``:foo`` → (``""``,
    ``"foo"``) (src/utils.ts:111-128). Without a colon, the whole string
    is the prefix only when the flag says so — mirroring the reference's
    completion-time behavior."""
    i = pname.find(":")
    if i > -1:
        return pname[:i], pname[i + 1:]
    return (pname if use_whole_as_prefix_when_missing_colon else "", "")


def get_next_token(tokens: List[Token], token: Token) -> Optional[Token]:
    """The token after ``token`` in the stream (src/utils.ts:135-141).
    Identity-based like the reference's ``indexOf`` so duplicate images
    at different offsets resolve to the right position."""
    for i, t in enumerate(tokens):
        if t is token:
            return tokens[i + 1] if i < len(tokens) - 1 else None
    return None


def get_previous_token(tokens: List[Token], token: Token) -> Optional[Token]:
    """The token before ``token`` in the stream (src/utils.ts:148-154)."""
    for i, t in enumerate(tokens):
        if t is token:
            return tokens[i - 1] if i > 0 else None
    return None


def get_first_token_of_type(tokens: List[Token], type_name: str) -> Optional[Token]:
    """First token whose type matches (src/utils.ts:162-168)."""
    for t in tokens:
        if t.type == type_name:
            return t
    return None


def get_last_token_of_type(
    tokens: List[Token], types: Iterable[str],
) -> Optional[Token]:
    """Last token whose type is in ``types`` (src/utils.ts:176-183)."""
    wanted = set(types)
    for t in reversed(tokens):
        if t.type in wanted:
            return t
    return None


def get_token_at_offset(tokens: List[Token], offset: int) -> List[Token]:
    """All tokens whose [start, start+len] span covers ``offset``
    (src/utils.ts:191-193; inclusive end, so a cursor sitting just after
    a token still hits it)."""
    return [
        t for t in tokens
        if t.start <= offset <= t.start + len(t.image)
    ]


def get_token_position(token: Token, text: Optional[str] = None) -> dict:
    """Source position record (src/utils.ts:198-214). Line/column are
    derived from ``text`` when given (the lexer stores offsets only —
    line bookkeeping stays out of the hot path)."""
    pos = {
        "start_offset": token.start,
        "end_offset": token.start + len(token.image) - 1,
    }
    if text is not None:
        before = text[: token.start]
        pos["start_line"] = before.count("\n") + 1
        pos["start_column"] = token.start - (before.rfind("\n") + 1) + 1
        inner = token.image[:-1] if token.image else ""
        pos["end_line"] = pos["start_line"] + inner.count("\n")
        last_nl = token.image.rfind("\n", 0, max(len(token.image) - 1, 0))
        if last_nl == -1:
            pos["end_column"] = pos["start_column"] + len(token.image) - 1
        else:
            pos["end_column"] = len(token.image) - last_nl - 1
    return pos


def is_variable_token(token: Token) -> bool:
    """SPARQL/N3 variable tokens (src/utils.ts:221-229)."""
    return token.type in ("VAR", "VAR1", "VAR2", "QUICK_VAR")


def is_upper_case_token(token: Optional[Token]) -> bool:
    """True when the token image is already upper-case
    (src/utils.ts:236-238)."""
    return token.image == token.image.upper() if token else False


def get_prefix_from_token(token: Token) -> str:
    """Namespace prefix of a PNAME token (src/utils.ts:243-251)."""
    if token.type == "PNAME_LN":
        return token.image.split(":")[0]
    if token.type == "PNAME_NS":
        return token.image[:-1]
    raise ValueError(f"Cannot get prefix from token type: {token.type}")
