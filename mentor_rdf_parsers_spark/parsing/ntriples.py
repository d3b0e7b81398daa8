"""N-Triples / N-Quads 1.2 parser (lex + parse + read fused).

Re-creates the quad semantics of the reference's N-Triples and N-Quads
modules (/root/reference/src/ntriples/{parser,reader}.ts,
/root/reference/src/nquads/{parser,reader}.ts) as a single pass:

* grammar: ``triple ::= subject predicate object '.'``, N-Quads adds an
  optional graph label (IRI or blank node); ``VERSION "…"`` directives emit
  nothing;
* only absolute IRIs (IRIREF_ABS token, src/tokens.ts:164-170);
* language tags are lowercased (src/ntriples/reader.ts:246,
  src/nquads/reader.ts:279);
* blank-node identity quirk preserved: N-Triples keeps the raw token image
  INCLUDING the ``_:`` prefix (src/ntriples/reader.ts:275-277), N-Quads uses
  the pre-assigned lexer ID with the prefix stripped
  (src/nquads/reader.ts:315-319);
* triple terms ``<<( s p o )>>`` allowed in object position, recursively.

A regex fast path handles the common flat ``s p o [g] .`` statement shape in
one C-speed match per line; documents where any line misses the shape
(triple terms, multi-line layout, syntax errors) fall back to the
token-stream parser. Both paths produce identical output.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Tuple

from .lexer import Lexer, Token, default_bnode_generator
from .terms import Term, unescape_iri, unescape_rdf_string
from .tokens import (
    BLANK_NODE_LABEL,
    IRIREF_ABS,
    LANGTAG,
    NQUADS_TOKENS,
    STRING_LITERAL_QUOTE,
)

QuadRec = Tuple[Term, Term, Term, Optional[Term], int, int, int]
ErrorRec = Tuple[str, int, str]  # (stage, offset, message)

_LEXER = Lexer(NQUADS_TOKENS)

# ---------------------------------------------------------------------------
# Fast path: one regex per full statement (no triple terms involved).
# ---------------------------------------------------------------------------


def _named(name: str, pattern: str) -> str:
    return "(?P<" + name + ">" + pattern + ")"


def _subj_pat(n: str) -> str:
    return "(?:" + _named(n + "_iri", IRIREF_ABS) + "|" + _named(n + "_bn", BLANK_NODE_LABEL) + ")"


def _obj_pat(n: str) -> str:
    lit = (
        _named(n + "_lit", STRING_LITERAL_QUOTE)
        + "(?:\\^\\^"
        + _named(n + "_dt", IRIREF_ABS)
        + "|"
        + _named(n + "_lang", LANGTAG)
        + ")?"
    )
    return (
        "(?:"
        + _named(n + "_iri", IRIREF_ABS)
        + "|"
        + _named(n + "_bn", BLANK_NODE_LABEL)
        + "|"
        + lit
        + ")"
    )


_STMT_RE = re.compile(
    r"[ \t]*"
    + _subj_pat("s")
    + r"[ \t]+"
    + _named("p_iri", IRIREF_ABS)
    + r"[ \t]+"
    + _obj_pat("o")
    + r"(?:[ \t]+"
    + _subj_pat("g")
    + r")?"
    + r"[ \t]*\.[ \t]*(?:#[^\n\r]*)?"
)

_SKIP_LINE_RE = re.compile(r"[ \t]*(?:#.*)?")
_VERSION_LINE_RE = re.compile(r"[ \t]*VERSION", re.I)


# ---------------------------------------------------------------------------
# Token-stream parser (full 1.2 grammar incl. triple terms)
# ---------------------------------------------------------------------------


class _ParseError(Exception):
    def __init__(self, offset: int, message: str):
        super().__init__(message)
        self.offset = offset
        self.message = message


class _TokenParser:
    def __init__(self, tokens: List[Token], nquads: bool, bnode_value):
        self.toks = tokens
        self.i = 0
        self.nquads = nquads
        self.bnode_value = bnode_value

    def peek(self) -> Optional[Token]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def expect(self, ttype: str) -> Token:
        t = self.peek()
        if t is None or t.type != ttype:
            got = t.type if t else "EOF"
            off = t.start if t else (self.toks[-1].start if self.toks else 0)
            raise _ParseError(off, f"expected {ttype}, got {got}")
        self.i += 1
        return t

    def subject(self) -> Tuple[Term, int]:
        t = self.peek()
        if t and t.type == "IRIREF_ABS":
            self.i += 1
            return ("iri", unescape_iri(t.image[1:-1])), t.start
        if t and t.type == "BLANK_NODE_LABEL":
            self.i += 1
            return ("bnode", self.bnode_value(t)), t.start
        raise _ParseError(t.start if t else 0, "invalid subject")

    def predicate(self) -> Tuple[Term, int]:
        t = self.expect("IRIREF_ABS")
        return ("iri", unescape_iri(t.image[1:-1])), t.start

    def object(self) -> Tuple[Term, int]:
        t = self.peek()
        if t is None:
            raise _ParseError(0, "invalid object")
        if t.type == "IRIREF_ABS":
            self.i += 1
            return ("iri", unescape_iri(t.image[1:-1])), t.start
        if t.type == "BLANK_NODE_LABEL":
            self.i += 1
            return ("bnode", self.bnode_value(t)), t.start
        if t.type == "STRING_LITERAL_QUOTE":
            return self.literal()
        if t.type == "OPEN_TRIPLE_TERM":
            return self.triple_term()
        raise _ParseError(t.start, f"invalid object: {t.type}")

    def literal(self) -> Tuple[Term, int]:
        t = self.expect("STRING_LITERAL_QUOTE")
        value = unescape_rdf_string(t.image[1:-1])
        nxt = self.peek()
        if nxt and nxt.type == "DCARET":
            self.i += 1
            dt = self.expect("IRIREF_ABS")
            return ("literal", value, None, unescape_iri(dt.image[1:-1])), t.start
        if nxt and nxt.type == "LANGTAG":
            self.i += 1
            return ("literal", value, nxt.image[1:].lower(), None), t.start
        return ("literal", value, None, None), t.start

    def triple_term(self) -> Tuple[Term, int]:
        t = self.expect("OPEN_TRIPLE_TERM")
        s, _ = self.subject()
        p, _ = self.predicate()
        o, _ = self.object()
        self.expect("CLOSE_TRIPLE_TERM")
        return ("tripleterm", (s, p, o)), t.start


def parse_ntriples(
    text: str,
    nquads: bool = False,
    bnode_generator: Callable[[int, Token], str] = default_bnode_generator,
    strict: bool = True,
) -> Tuple[List[QuadRec], List[ErrorRec]]:
    """Parse an N-Triples (or N-Quads) document into quad records."""
    quads: List[QuadRec] = []
    errors: List[ErrorRec] = []

    if nquads:
        # N-Quads strips '_:' via the pre-assigned ID (src/nquads/reader.ts:315-319)
        label_map: dict[str, str] = {}
        counter = [0]

        def fast_bnode(image: str) -> str:
            bid = label_map.get(image)
            if bid is None:
                bid = bnode_generator(counter[0], Token("BLANK_NODE_LABEL", image, 0))
                counter[0] += 1
                label_map[image] = bid
            return bid

    else:
        # N-Triples keeps the raw image incl. '_:' (src/ntriples/reader.ts:275-277)
        def fast_bnode(image: str) -> str:
            return image

    def fast_term(m: re.Match, n: str) -> Optional[Term]:
        iri = m.group(n + "_iri")
        if iri is not None:
            return ("iri", unescape_iri(iri[1:-1]))
        bn = m.group(n + "_bn")
        if bn is not None:
            return ("bnode", fast_bnode(bn))
        if n == "o":
            lit = m.group("o_lit")
            if lit is not None:
                value = unescape_rdf_string(lit[1:-1])
                dt = m.group("o_dt")
                if dt is not None:
                    return ("literal", value, None, unescape_iri(dt[1:-1]))
                lang = m.group("o_lang")
                if lang is not None:
                    return ("literal", value, lang[1:].lower(), None)
                return ("literal", value, None, None)
        return None

    # --- fast path: statement-per-line regex --------------------------------
    fast_ok = True
    offset = 0
    for line in text.split("\n"):
        raw_len = len(line)
        line = line.rstrip("\r")
        if _SKIP_LINE_RE.fullmatch(line):
            offset += raw_len + 1
            continue
        if _VERSION_LINE_RE.match(line):
            # rare; let the token parser validate the version specifier
            fast_ok = False
            break
        m = _STMT_RE.fullmatch(line)
        if m is None or (m.group("g_iri") or m.group("g_bn")) and not nquads:
            fast_ok = False
            break
        s = fast_term(m, "s")
        p = fast_term(m, "p")
        o = fast_term(m, "o")
        g = fast_term(m, "g") if (m.group("g_iri") or m.group("g_bn")) else None
        s_off = offset + m.start("s_iri" if m.group("s_iri") is not None else "s_bn")
        if m.group("o_iri") is not None:
            o_start = m.start("o_iri")
        elif m.group("o_bn") is not None:
            o_start = m.start("o_bn")
        else:
            o_start = m.start("o_lit")
        quads.append((s, p, o, g, s_off, offset + m.start("p_iri"), offset + o_start))
        offset += raw_len + 1

    if fast_ok:
        return quads, errors

    # --- slow path: full token parse of the whole document ------------------
    quads = []
    errors = []
    tokens, lex_errors = _LEXER.tokenize(text, bnode_generator)
    for le in lex_errors:
        errors.append(("lex", le.offset, le.message))
    if strict and errors:
        return [], errors
    tokens = [t for t in tokens if t.type != "COMMENT"]

    if nquads:
        def bnode_value(tok: Token) -> str:
            return tok.bnode_id if tok.bnode_id is not None else tok.image[2:]
    else:
        def bnode_value(tok: Token) -> str:
            return tok.image

    p = _TokenParser(tokens, nquads, bnode_value=bnode_value)
    while p.peek() is not None:
        t = p.peek()
        try:
            if t.type == "SPARQL_VERSION":
                p.i += 1
                p.expect("STRING_LITERAL_QUOTE")
                continue
            s, s_off = p.subject()
            pred, p_off = p.predicate()
            o, o_off = p.object()
            g = None
            nxt = p.peek()
            if nquads and nxt is not None and nxt.type in ("IRIREF_ABS", "BLANK_NODE_LABEL"):
                if nxt.type == "IRIREF_ABS":
                    g = ("iri", unescape_iri(nxt.image[1:-1]))
                else:
                    g = ("bnode", bnode_value(nxt))
                p.i += 1
            p.expect("PERIOD")
            quads.append((s, pred, o, g, s_off, p_off, o_off))
        except _ParseError as e:
            errors.append(("parse", e.offset, e.message))
            if strict:
                return [], errors
            # recovery: skip to just past the next PERIOD
            while p.peek() is not None and p.peek().type != "PERIOD":
                p.i += 1
            if p.peek() is not None:
                p.i += 1

    if strict and errors:
        return [], errors
    return quads, errors
