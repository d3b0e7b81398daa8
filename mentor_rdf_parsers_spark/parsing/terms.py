"""RDF term model and canonical N-Triples (1.2) serialization.

Terms are small tuples (cheap inside the hot Arrow-batch loop):

    ('iri',   value)
    ('bnode', id)
    ('literal', value, lang_or_None, datatype_or_None)
    ('var',   name)                       # N3 quickVars
    ('tripleterm', (s, p, o))             # RDF 1.2 triple term, recursive

A quad is (s, p, o, g) with g=None for the default graph.

Spark's flat ``triples`` schema cannot hold recursive structs, so a
triple-term object is encoded as its canonical N-Triples string with
``o_kind='tripleterm'`` (SURVEY.md §1.3); :func:`serialize_term` is the
reversible, comparable encoding and :mod:`golden` can parse it back.

String unescaping ports /root/reference/src/reader-helpers.ts:59-76; IRI
unicode-escape decoding ports /root/reference/src/turtle/reader.ts:1233-1238.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

Term = Tuple  # structural tuples as documented above

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = ("iri", RDF + "type")
RDF_FIRST = ("iri", RDF + "first")
RDF_REST = ("iri", RDF + "rest")
RDF_NIL = ("iri", RDF + "nil")
RDF_REIFIES = ("iri", RDF + "reifies")
OWL_SAMEAS = ("iri", "http://www.w3.org/2002/07/owl#sameAs")
LOG_IMPLIES = ("iri", "http://www.w3.org/2000/10/swap/log#implies")
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_DOUBLE = XSD + "double"
XSD_BOOLEAN = XSD + "boolean"
XSD_STRING = XSD + "string"

_UNESCAPE_RE = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})|\\(.)", re.S)

_ECHAR_MAP = {
    "t": "\t",
    "n": "\n",
    "r": "\r",
    "b": "\b",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}


def unescape_rdf_string(raw: str) -> str:
    """Port of unescapeRdfString (src/reader-helpers.ts:59-76)."""
    if "\\" not in raw:
        return raw

    def sub(m: re.Match) -> str:
        u4, u8, ch = m.group(1), m.group(2), m.group(3)
        if u4:
            return chr(int(u4, 16))
        if u8:
            return chr(int(u8, 16))
        return _ECHAR_MAP.get(ch, m.group(0))

    return _UNESCAPE_RE.sub(sub, raw)


_IRI_U4 = re.compile(r"\\u([0-9A-Fa-f]{4})")
_IRI_U8 = re.compile(r"\\U([0-9A-Fa-f]{8})")


def unescape_iri(raw: str) -> str:
    """Unicode escapes only — src/turtle/reader.ts:1233-1238."""
    if "\\" not in raw:
        return raw
    raw = _IRI_U4.sub(lambda m: chr(int(m.group(1), 16)), raw)
    return _IRI_U8.sub(lambda m: chr(int(m.group(1), 16)), raw)


_LOCAL_ESC = re.compile(r"\\([_~.\-!$&'()*+,;=/?#@%])")


def unescape_local_name(local: str) -> str:
    """PN_LOCAL_ESC removal — src/turtle/reader.ts:985."""
    if "\\" not in local:
        return local
    return _LOCAL_ESC.sub(r"\1", local)


# --- canonical N-Triples serialization ------------------------------------

_NT_ESC = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}
_NT_ESC_RE = re.compile(r'[\\"\n\r\t\b\f]')


def _escape_literal(value: str) -> str:
    return _NT_ESC_RE.sub(lambda m: _NT_ESC[m.group(0)], value)


def serialize_term(term: Term) -> str:
    """Canonical NT 1.2 string for a term (reversible, join-safe)."""
    kind = term[0]
    if kind == "iri":
        return f"<{term[1]}>"
    if kind == "bnode":
        return f"_:{term[1]}"
    if kind == "literal":
        _, value, lang, dt = term
        s = f'"{_escape_literal(value)}"'
        if lang:
            return f"{s}@{lang}"
        if dt and dt != XSD_STRING:
            return f"{s}^^<{dt}>"
        return s
    if kind == "var":
        return f"?{term[1]}"
    if kind == "tripleterm":
        s, p, o = term[1]
        return f"<<( {serialize_term(s)} {serialize_term(p)} {serialize_term(o)} )>>"
    raise ValueError(f"unknown term kind: {term!r}")


def _simple_value(term: Term) -> str:
    """Column value for a term: raw value for iri/bnode/var, canonical
    string otherwise (literal subjects/predicates are N3-only corners)."""
    if term[0] in ("iri", "bnode", "var"):
        return term[1]
    return serialize_term(term)


def quad_to_row(
    doc_id: str,
    s: Term,
    p: Term,
    o: Term,
    g: Optional[Term],
    s_off: int = -1,
    p_off: int = -1,
    o_off: int = -1,
) -> tuple:
    """Flatten a quad into the ``triples`` table row layout (FIXTURES.md §3,
    plus a ``p_kind`` column because N3 predicates may be variables)."""
    o_kind = o[0]
    if o_kind == "literal":
        o_val, o_lang, o_dt = o[1], o[2], o[3]
    elif o_kind == "tripleterm":
        o_val, o_lang, o_dt = serialize_term(o), None, None
    else:
        o_val, o_lang, o_dt = o[1], None, None
    if g is None:
        g_kind, g_val = None, None
    else:
        g_kind, g_val = g[0], g[1]
    return (
        doc_id,
        s[0],
        _simple_value(s),
        p[0],
        _simple_value(p),
        o_kind,
        o_val,
        o_lang,
        o_dt,
        g_kind,
        g_val,
        s_off,
        p_off,
        o_off,
    )


def row_to_quad(row) -> tuple:
    """Inverse of :func:`quad_to_row` (lineage offsets dropped).

    Accepts any sequence laid out per FIXTURES.md §3 + p_kind. Triple-term
    objects are re-parsed from their canonical string by the golden parser.
    """
    from .golden import parse_term_string  # late import to avoid cycle

    _, s_kind, s, p_kind, p, o_kind, o, o_lang, o_dt, g_kind, g = row[:11]
    s_term = parse_term_string(s) if s_kind in ("tripleterm", "literal") else (s_kind, s)
    p_term = parse_term_string(p) if p_kind in ("tripleterm", "literal") else (p_kind, p)
    if o_kind == "literal":
        o_term = ("literal", o, o_lang or None, o_dt or None)
    elif o_kind == "tripleterm":
        o_term = parse_term_string(o)
    else:
        o_term = (o_kind, o)
    g_term = None if g_kind is None else (g_kind, g)
    return (s_term, p_term, o_term, g_term)
