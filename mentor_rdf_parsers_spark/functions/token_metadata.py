"""Token metadata categories for RDF/SPARQL formatting tooling.

Behavior port of the reference's formatter metadata
(``/root/reference/src/token-metadata.ts:5-320``): every token type is
tagged with the flags a formatter / syntax highlighter needs (keyword
casing, clause breaks, bracket pairing, spacing). The reference stores
one record per token; here each flag is a frozenset of token-type names
— O(1) membership, trivially unionable, and flags compose with plain set
algebra.

Names are THIS engine's token vocabulary (``parsing/tokens.py`` for the
Turtle/TriG/N-Triples/N-Quads/N3 lexers, ``sparql/parser.py`` for the
SPARQL lexer). Where the reference suffixes ``_KW`` to dodge TypeScript
name clashes (``MIN_KW``, ``REPLACE_KW``…) the plain name is used, since
our vocabularies are already namespaced per syntax.

This is metadata only — nothing in the parse/extract hot path reads it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, FrozenSet, Optional

# --- flag sets (reference src/token-metadata.ts:44-305) -------------------

IS_WHITESPACE = frozenset({"WS"})
IS_COMMENT = frozenset({"COMMENT"})

#: Reserved words a formatter may case-transform.
IS_KEYWORD = frozenset({
    "TRUE", "FALSE", "A", "A_KW",
    "TTL_BASE", "TTL_PREFIX", "VERSION",
    "BASE", "PREFIX", "SPARQL_VERSION",
    "SELECT", "CONSTRUCT", "DESCRIBE", "ASK",
    "FROM", "NAMED", "GRAPH",
    "WHERE", "OPTIONAL", "UNION", "MINUS", "FILTER", "BIND", "VALUES",
    "SERVICE", "SILENT",
    "ORDER", "BY", "ASC", "DESC", "LIMIT", "OFFSET", "DISTINCT", "REDUCED",
    "GROUP", "HAVING", "AS",
    "IN", "NOT", "EXISTS", "AND", "OR", "UNDEF",
    "INSERT", "DELETE", "DATA", "LOAD", "CLEAR", "DROP", "CREATE", "ADD",
    "MOVE", "COPY", "INTO", "TO", "USING", "WITH", "DEFAULT", "ALL",
    "SEPARATOR",
    "FORALL", "FORSOME", "HAS", "IS", "OF",
}) | frozenset({
    # aggregate / builtin function keywords (also IS_FUNCTION below)
    "COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT",
    "STR", "STRLEN", "SUBSTR", "UCASE", "LCASE", "STRSTARTS", "STRENDS",
    "CONTAINS", "STRBEFORE", "STRAFTER", "ENCODE_FOR_URI", "CONCAT",
    "REGEX", "REPLACE",
    "ABS", "ROUND", "CEIL", "FLOOR", "RAND",
    "NOW", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS",
    "TIMEZONE", "TZ",
    "MD5", "SHA1", "SHA256", "SHA384", "SHA512",
    "LANG", "LANGMATCHES", "LANGDIR", "DATATYPE", "BOUND", "IRI", "URI",
    "BNODE", "STRLANG", "STRLANGDIR", "STRDT", "UUID", "STRUUID",
    "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC", "SAMETERM",
    "HASLANG", "HASLANGDIR",
    "ISTRIPLE", "TRIPLE", "SUBJECT", "PREDICATE", "OBJECT",
    "IF", "COALESCE",
})

#: Keywords that must remain lowercase (src/token-metadata.ts:50-56, 285-287).
IS_LOWERCASE_ONLY = frozenset({"TRUE", "FALSE", "A", "A_KW", "HAS", "IS", "OF"})

#: Starts a major SPARQL clause — formatter inserts a blank line before.
IS_MAJOR_CLAUSE = frozenset({
    "SELECT", "CONSTRUCT", "DESCRIBE", "ASK",
    "OPTIONAL", "VALUES",
    "ORDER", "LIMIT", "OFFSET", "GROUP", "HAVING",
    "INSERT", "DELETE", "LOAD", "CLEAR", "DROP", "CREATE", "ADD",
    "MOVE", "COPY", "WITH",
})

#: Starts on a new line without a preceding blank line.
IS_NEWLINE_KEYWORD = frozenset({"FROM", "NAMED", "WHERE"})

#: Built-in function — no space before the opening paren.
IS_FUNCTION = frozenset({
    "FILTER", "BIND", "EXISTS",
    "COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT",
    "STR", "STRLEN", "SUBSTR", "UCASE", "LCASE", "STRSTARTS", "STRENDS",
    "CONTAINS", "STRBEFORE", "STRAFTER", "ENCODE_FOR_URI", "CONCAT",
    "REGEX", "REPLACE",
    "ABS", "ROUND", "CEIL", "FLOOR", "RAND",
    "NOW", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS",
    "TIMEZONE", "TZ",
    "MD5", "SHA1", "SHA256", "SHA384", "SHA512",
    "LANG", "LANGMATCHES", "LANGDIR", "DATATYPE", "BOUND", "IRI", "URI",
    "BNODE", "STRLANG", "STRLANGDIR", "STRDT", "UUID", "STRUUID",
    "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC", "SAMETERM",
    "HASLANG", "HASLANGDIR",
    "ISTRIPLE", "TRIPLE", "SUBJECT", "PREDICATE", "OBJECT",
    "IF", "COALESCE",
})

#: IRI-shaped tokens.
IS_IRI = frozenset({"IRIREF", "IRIREF_ABS", "PNAME_LN", "PNAME_NS"})

#: Literal-valued tokens.
IS_LITERAL = frozenset({
    "TRUE", "FALSE", "BOOLEAN",
    "STRING_LITERAL_QUOTE", "STRING_LITERAL_SINGLE_QUOTE",
    "STRING_LITERAL_LONG_QUOTE", "STRING_LITERAL_LONG_SINGLE_QUOTE",
    "STRING1", "STRING2", "STRING_LONG1", "STRING_LONG2",
    "INTEGER", "DECIMAL", "DOUBLE",
    "INTEGER_POSITIVE", "DECIMAL_POSITIVE", "DOUBLE_POSITIVE",
    "INTEGER_NEGATIVE", "DECIMAL_NEGATIVE", "DOUBLE_NEGATIVE",
})

#: Tokens usable as a subject/predicate/object term.
IS_TERM = (
    IS_IRI
    | IS_LITERAL
    | frozenset({
        "A", "A_KW",
        "VAR", "VAR1", "VAR2", "QUICK_VAR",
        "BLANK_NODE_LABEL", "ANON", "NIL",
    })
)

IS_OPENING_BRACKET = frozenset({
    "LBRACKET", "LPARENT", "LCURLY",
    "OPEN_TRIPLE_TERM", "OPEN_REIFIED_TRIPLE", "OPEN_ANNOTATION",
    "TT_OPEN", "RT_OPEN", "ANN_OPEN",
})

IS_CLOSING_BRACKET = frozenset({
    "RBRACKET", "RPARENT", "RCURLY",
    "CLOSE_TRIPLE_TERM", "CLOSE_REIFIED_TRIPLE", "CLOSE_ANNOTATION",
    "TT_CLOSE", "RT_CLOSE", "ANN_CLOSE",
})

#: Opens a fresh blank-node label scope (src/token-metadata.ts:246-251).
IS_BLANK_NODE_SCOPE = frozenset({
    "ANON", "LBRACKET", "LPARENT", "LCURLY",
    "OPEN_REIFIED_TRIPLE", "OPEN_ANNOTATION", "RT_OPEN", "ANN_OPEN",
    "TILDE",
})

#: Statement punctuation with no space before it.
NO_SPACE_BEFORE = frozenset({"PERIOD", "SEMICOLON", "COMMA"})

IS_PUNCTUATION = (
    IS_OPENING_BRACKET
    | IS_CLOSING_BRACKET
    | NO_SPACE_BEFORE
    | frozenset({
        "DCARET", "HATHAT", "LANGTAG", "TILDE", "NIL",
        "IMPLIES", "IMPLIED_BY", "EQUALS_SIGN", "INVERSE_OF", "EXCL",
        "CARET",
        "STAR", "SLASH", "PIPE", "PLUS_SIGN", "MINUS_SIGN",
        "QUESTION_MARK", "BANG",
        "EQ", "NEQ", "NE", "LT", "GT", "LTE", "GTE", "LE", "GE",
        "ANDAND", "OROR",
    })
)


@dataclass(frozen=True)
class TokenMetadata:
    """Flag record for one token type (src/token-metadata.ts:5-36)."""

    is_keyword: bool = False
    is_lowercase_only: bool = False
    is_major_clause: bool = False
    is_newline_keyword: bool = False
    is_function: bool = False
    is_term: bool = False
    is_iri: bool = False
    is_literal: bool = False
    is_punctuation: bool = False
    is_opening_bracket: bool = False
    is_closing_bracket: bool = False
    no_space_before: bool = False
    is_blank_node_scope: bool = False
    is_whitespace: bool = False
    is_comment: bool = False


_FLAG_SETS: Dict[str, FrozenSet[str]] = {
    "is_keyword": IS_KEYWORD,
    "is_lowercase_only": IS_LOWERCASE_ONLY,
    "is_major_clause": IS_MAJOR_CLAUSE,
    "is_newline_keyword": IS_NEWLINE_KEYWORD,
    "is_function": IS_FUNCTION,
    "is_term": IS_TERM,
    "is_iri": IS_IRI,
    "is_literal": IS_LITERAL,
    "is_punctuation": IS_PUNCTUATION,
    "is_opening_bracket": IS_OPENING_BRACKET,
    "is_closing_bracket": IS_CLOSING_BRACKET,
    "no_space_before": NO_SPACE_BEFORE,
    "is_blank_node_scope": IS_BLANK_NODE_SCOPE,
    "is_whitespace": IS_WHITESPACE,
    "is_comment": IS_COMMENT,
}

_ALL_KNOWN = frozenset().union(*_FLAG_SETS.values())


def get_token_metadata(token_type: str) -> Optional[TokenMetadata]:
    """Metadata record for a token-type name, or None if uncategorized
    (src/token-metadata.ts:307-311)."""
    if token_type not in _ALL_KNOWN:
        return None
    return TokenMetadata(
        **{flag: token_type in names for flag, names in _FLAG_SETS.items()}
    )


def has_token_flag(token_type: str, flag: str) -> bool:
    """True iff the token type carries the flag
    (src/token-metadata.ts:317-320). Unknown flags are an error, unknown
    token types are simply False."""
    return token_type in _FLAG_SETS[flag]
