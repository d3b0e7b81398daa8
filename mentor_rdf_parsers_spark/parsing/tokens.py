"""Token vocabulary for the W3C RDF syntaxes.

Python re translation of the reference token patterns
(/root/reference/src/tokens.ts:30-415). Semantics preserved:

* priority-ordered, first-match-wins alternation (Chevrotain lexes by trying
  the token list in order at the current offset and taking the FIRST pattern
  that matches, /root/reference/src/turtle/parser.ts:10 "order of tokens
  matters");
* JS surrogate ranges in PN_CHARS_BASE are widened to the astral plane
  (\\U00010000-\\U0010FFFF) because Python strings are code points, not UTF-16
  units — acceptance is identical;
* WS additionally matches U+FEFF to mirror JS ``\\s`` (leading BOMs lex as
  whitespace in the reference).

Per-syntax ordered token lists mirror:
  N-Triples  /root/reference/src/ntriples/parser.ts:8-22
  N-Quads    /root/reference/src/nquads/parser.ts:9-23
  Turtle     /root/reference/src/turtle/parser.ts:11-50
  TriG       /root/reference/src/trig/parser.ts:9-51
  N3         /root/reference/src/n3/parser.ts:8-52
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Character-class fragments (src/tokens.ts:105-161)
# ---------------------------------------------------------------------------

HEX = r"[0-9A-Fa-f]"

ECHAR = r"\\[tbnrf\"'\\]"

UCHAR = rf"(\\u{HEX}{{4}}|\\U{HEX}{{8}})"

PERCENT = rf"%{HEX}{HEX}"

# src/tokens.ts:116-120 — the JS version enumerates UTF-16 surrogate halves;
# here the astral plane is one range.
PN_CHARS_BASE = (
    r"[A-Za-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF\u0370-\u037D"
    r"\u037F-\u1FFF\u200C-\u200D\u2070-\u218F\u2C00-\u2FEF\u3001-\uD7FF"
    r"\uF900-\uFDCF\uFDF0-\uFFFD\U00010000-\U0010FFFF]"
)

PN_CHARS_U = rf"({PN_CHARS_BASE}|_)"

PN_CHARS = rf"({PN_CHARS_U}|-|\d|\u00b7|[\u0300-\u036f]|[\u203f-\u2040])"

PN_LOCAL_ESC = r"\\[_~.\-!$&'()*+,=/?#@%;]"

PLX = rf"({PERCENT}|{PN_LOCAL_ESC})"

PN_LOCAL = (
    rf"({PN_CHARS_U}|:|\d|{PLX})"
    rf"((({PN_CHARS}|\.|:|{PLX})*({PN_CHARS}|:|{PLX})))?"
)

PN_PREFIX = rf"{PN_CHARS_BASE}((({PN_CHARS}|\.)*{PN_CHARS}))?"

PNAME_NS = rf"({PN_PREFIX})?:"

PNAME_LN = rf"{PNAME_NS}{PN_LOCAL}"

BLANK_NODE_LABEL = rf"_:({PN_CHARS_U}|\d)((({PN_CHARS}|\.)*{PN_CHARS}))?"

# JS \s ∪ {FEFF}; src/tokens.ts:32
WS = r"[\s\ufeff]+"

COMMENT = r"#[^\n\r]*"

EXPONENT = r"[eE][+-]?\d+"
INTEGER = r"[+-]?(\d+)"
DECIMAL = r"[+-]?(\d*\.\d+)"
DOUBLE = (
    rf"([+-]?(\d+\.\d*){EXPONENT}"
    rf"|[+-]?(\.\d+){EXPONENT}"
    rf"|[+-]?(\d+){EXPONENT})"
)

LANGTAG = r"@[a-zA-Z]+(-[a-zA-Z0-9]+)*(--(ltr|rtl))?"

# src/tokens.ts:166-177 — IRIREF_ABS forbids relative IRIs (N-Triples/N-Quads).
IRI_CHAR = rf"([^\u0000-\u0020<>\"{{}}|\^`\\]|{UCHAR})"
IRIREF_ABS = rf"<[a-zA-Z0-9_\-]+:{IRI_CHAR}*>"
IRIREF = rf"<{IRI_CHAR}*>"

STRING_LITERAL_QUOTE = rf"\"([^\"\\\n\r]|{ECHAR}|{UCHAR})*\""
STRING_LITERAL_SINGLE_QUOTE = rf"'([^'\\\n\r]|{ECHAR}|{UCHAR})*'"
STRING_LITERAL_LONG_QUOTE = rf"\"\"\"((\"|\"\")?([^\"\\]|{ECHAR}|{UCHAR}))*\"\"\""
STRING_LITERAL_LONG_SINGLE_QUOTE = rf"'''(('|'')?([^'\\]|{ECHAR}|{UCHAR}))*'''"

ANON = rf"\[({WS})*\]"

# 'a' must not continue into a prefixed name (src/tokens.ts:89)
A = r"a(?![A-Za-z0-9_:])"

QUICK_VAR = rf"\?({PN_CHARS_U}|\d){PN_CHARS}*"

# ---------------------------------------------------------------------------
# Per-syntax ordered vocabularies: list of (token_name, pattern).
# Token with name 'WS' is skipped by the lexer; 'COMMENT' is kept in the
# stream and filtered before parsing (src/parser-helpers.ts:6-11).
# ---------------------------------------------------------------------------

NTRIPLES_TOKENS = [
    ("WS", WS),
    ("PERIOD", r"\."),
    ("OPEN_TRIPLE_TERM", r"<<\("),
    ("CLOSE_TRIPLE_TERM", r"\)>>"),
    ("OPEN_REIFIED_TRIPLE", r"<<"),
    ("CLOSE_REIFIED_TRIPLE", r">>"),
    ("IRIREF_ABS", IRIREF_ABS),
    ("BLANK_NODE_LABEL", BLANK_NODE_LABEL),
    ("STRING_LITERAL_QUOTE", STRING_LITERAL_QUOTE),
    ("DCARET", r"\^\^"),
    ("LANGTAG", LANGTAG),
    ("SPARQL_VERSION", r"VERSION\b"),  # case-insensitive, see lexer flags
    ("COMMENT", COMMENT),
]

NQUADS_TOKENS = list(NTRIPLES_TOKENS)

TURTLE_TOKENS = [
    ("WS", WS),
    ("COMMA", r","),
    ("SEMICOLON", r";"),
    ("DCARET", r"\^\^"),
    ("LBRACKET", r"\["),
    ("RBRACKET", r"\]"),
    ("OPEN_ANNOTATION", r"\{\|"),
    ("CLOSE_ANNOTATION", r"\|\}"),
    ("OPEN_TRIPLE_TERM", r"<<\("),
    ("CLOSE_TRIPLE_TERM", r"\)>>"),
    ("OPEN_REIFIED_TRIPLE", r"<<"),
    ("CLOSE_REIFIED_TRIPLE", r">>"),
    ("TILDE", r"~"),
    ("LPARENT", r"\("),
    ("RPARENT", r"\)"),
    ("A", A),
    ("TRUE", r"true"),
    ("FALSE", r"false"),
    ("VERSION", r"@version"),
    ("TTL_PREFIX", r"@prefix"),
    ("TTL_BASE", r"@base"),
    ("SPARQL_VERSION", r"VERSION\b"),
    ("PREFIX", r"PREFIX\b"),
    ("BASE", r"BASE\b"),
    ("PNAME_LN", PNAME_LN),
    ("PNAME_NS", PNAME_NS),
    ("BLANK_NODE_LABEL", BLANK_NODE_LABEL),
    ("LANGTAG", LANGTAG),
    ("DOUBLE", DOUBLE),
    ("DECIMAL", DECIMAL),
    ("INTEGER", INTEGER),
    ("PERIOD", r"\."),
    ("IRIREF", IRIREF),
    ("STRING_LITERAL_LONG_SINGLE_QUOTE", STRING_LITERAL_LONG_SINGLE_QUOTE),
    ("STRING_LITERAL_LONG_QUOTE", STRING_LITERAL_LONG_QUOTE),
    ("STRING_LITERAL_SINGLE_QUOTE", STRING_LITERAL_SINGLE_QUOTE),
    ("STRING_LITERAL_QUOTE", STRING_LITERAL_QUOTE),
    ("COMMENT", COMMENT),
]

TRIG_TOKENS = [
    ("WS", WS),
    ("COMMA", r","),
    ("SEMICOLON", r";"),
    ("DCARET", r"\^\^"),
    ("LBRACKET", r"\["),
    ("RBRACKET", r"\]"),
    ("OPEN_ANNOTATION", r"\{\|"),
    ("CLOSE_ANNOTATION", r"\|\}"),
    ("OPEN_TRIPLE_TERM", r"<<\("),
    ("CLOSE_TRIPLE_TERM", r"\)>>"),
    ("OPEN_REIFIED_TRIPLE", r"<<"),
    ("CLOSE_REIFIED_TRIPLE", r">>"),
    ("TILDE", r"~"),
    ("LPARENT", r"\("),
    ("RPARENT", r"\)"),
    ("LCURLY", r"\{"),
    ("RCURLY", r"\}"),
    ("A", A),
    ("TRUE", r"true"),
    ("FALSE", r"false"),
    ("VERSION", r"@version"),
    ("TTL_PREFIX", r"@prefix"),
    ("TTL_BASE", r"@base"),
    ("SPARQL_VERSION", r"VERSION\b"),
    ("PREFIX", r"PREFIX\b"),
    ("BASE", r"BASE\b"),
    ("GRAPH", r"GRAPH\b"),
    ("PNAME_LN", PNAME_LN),
    ("PNAME_NS", PNAME_NS),
    ("BLANK_NODE_LABEL", BLANK_NODE_LABEL),
    ("LANGTAG", LANGTAG),
    ("DOUBLE", DOUBLE),
    ("DECIMAL", DECIMAL),
    ("INTEGER", INTEGER),
    ("PERIOD", r"\."),
    ("IRIREF", IRIREF),
    ("STRING_LITERAL_LONG_SINGLE_QUOTE", STRING_LITERAL_LONG_SINGLE_QUOTE),
    ("STRING_LITERAL_LONG_QUOTE", STRING_LITERAL_LONG_QUOTE),
    ("STRING_LITERAL_SINGLE_QUOTE", STRING_LITERAL_SINGLE_QUOTE),
    ("STRING_LITERAL_QUOTE", STRING_LITERAL_QUOTE),
    ("COMMENT", COMMENT),
]

N3_TOKENS = [
    ("WS", WS),
    ("COMMA", r","),
    ("SEMICOLON", r";"),
    ("DCARET", r"\^\^"),
    ("LBRACKET", r"\["),
    ("RBRACKET", r"\]"),
    ("LPARENT", r"\("),
    ("RPARENT", r"\)"),
    ("LCURLY", r"\{"),
    ("RCURLY", r"\}"),
    ("IMPLIES", r"=>"),
    ("IMPLIED_BY", r"<="),
    ("EQUALS_SIGN", r"="),
    ("INVERSE_OF", r"<-"),
    ("EXCL", r"!"),
    ("CARET", r"\^"),
    ("A", A),
    ("TRUE", r"true"),
    ("FALSE", r"false"),
    ("FORALL", r"@forAll"),
    ("FORSOME", r"@forSome"),
    ("TTL_PREFIX", r"@prefix"),
    ("TTL_BASE", r"@base"),
    ("PREFIX", r"PREFIX\b"),
    ("BASE", r"BASE\b"),
    ("HAS", r"has\b"),
    ("IS", r"is\b"),
    ("OF", r"of\b"),
    ("QUICK_VAR", QUICK_VAR),
    ("PNAME_LN", PNAME_LN),
    ("PNAME_NS", PNAME_NS),
    ("BLANK_NODE_LABEL", BLANK_NODE_LABEL),
    ("LANGTAG", LANGTAG),
    ("DOUBLE", DOUBLE),
    ("DECIMAL", DECIMAL),
    ("INTEGER", INTEGER),
    ("PERIOD", r"\."),
    ("IRIREF", IRIREF),
    ("STRING_LITERAL_LONG_SINGLE_QUOTE", STRING_LITERAL_LONG_SINGLE_QUOTE),
    ("STRING_LITERAL_LONG_QUOTE", STRING_LITERAL_LONG_QUOTE),
    ("STRING_LITERAL_SINGLE_QUOTE", STRING_LITERAL_SINGLE_QUOTE),
    ("STRING_LITERAL_QUOTE", STRING_LITERAL_QUOTE),
    ("COMMENT", COMMENT),
]

# Tokens whose patterns are case-insensitive keywords in the reference
# (created with the /i flag in src/tokens.ts).
CASE_INSENSITIVE = {
    "SPARQL_VERSION",
    "PREFIX",
    "BASE",
    "GRAPH",
}
