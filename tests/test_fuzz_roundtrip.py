"""Property-based fuzzing of the canonical-encoding invariants
(VERDICT r4 ask #6: the 1,559-test suite was all example-based).

The SPARQL triple-term builtins, the VALUES/constructor join path, and
the r5 JVM-side accessors all depend on one invariant: for every term
the parsers can produce, ``parse_term_string(serialize_term(t)) == t``
and the serialized form is single-line and join-safe. Hypothesis
generates arbitrary terms — full-unicode literal values (quotes,
backslashes, control characters), language tags, datatypes, and
recursively nested triple terms — and shrinks any counterexample.

IRIs are generated grammar-valid (no whitespace/angle brackets: the
IRIREF production excludes #x00-#x20, and the lexers reject documents
that violate it), because the JVM accessor's token split relies on
subject/predicate tokens being space-free — the invariant these tests
pin down.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mentor_rdf_parsers_spark.parsing.golden import (
    parse_nt12,
    parse_term_string,
)
from mentor_rdf_parsers_spark.parsing.terms import (
    XSD_STRING,
    _escape_literal,
    serialize_term,
)

# --- strategies -----------------------------------------------------------

_iri_body = st.text(
    alphabet=st.characters(
        min_codepoint=0x21,
        max_codepoint=0x2FF,
        blacklist_characters='<>"{}|^`\\',
    ),
    min_size=0,
    max_size=16,
)
iris = st.builds(lambda s: ("iri", "http://ex/" + s), _iri_body)
bnodes = st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,11}", fullmatch=True).map(
    lambda label: ("bnode", label)
)
_values = st.text(max_size=40)  # full unicode incl. \n, ", \, controls
_langs = st.from_regex(
    r"[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8}){0,2}", fullmatch=True
)
plain_lits = st.builds(lambda v: ("literal", v, None, None), _values)
lang_lits = st.builds(lambda v, l: ("literal", v, l, None), _values, _langs)
# generated dt IRIs all start http://ex/ so never collide with xsd:string
# (whose serialization is suppressed and would not round-trip verbatim)
typed_lits = st.builds(
    lambda v, d: ("literal", v, None, d[1]), _values, iris
)
literals = st.one_of(plain_lits, lang_lits, typed_lits)

objects = st.deferred(
    lambda: st.one_of(iris, bnodes, literals, tripleterms)
)
tripleterms = st.builds(
    lambda s, p, o: ("tripleterm", (s, p, o)),
    st.one_of(iris, bnodes),
    iris,
    objects,
)
any_terms = st.one_of(iris, bnodes, literals, tripleterms)


# --- pure round-trips -----------------------------------------------------

@given(any_terms)
@settings(max_examples=300)
def test_serialize_parse_term_roundtrip(term):
    s = serialize_term(term)
    assert "\n" not in s and "\r" not in s  # join-safe single line
    assert parse_term_string(s) == term


@given(st.lists(
    st.tuples(st.one_of(iris, bnodes, tripleterms), iris, objects,
              st.one_of(st.none(), iris, bnodes)),
    min_size=1, max_size=6,
))
@settings(max_examples=150)
def test_nt_document_roundtrip(quads):
    doc = "\n".join(
        " ".join(serialize_term(t) for t in (s, p, o))
        + (f" {serialize_term(g)} ." if g is not None else " .")
        for (s, p, o, g) in quads
    )
    assert parse_nt12(doc) == quads


@given(_values)
@settings(max_examples=200)
def test_turtle_literal_escape_roundtrip(value):
    """An arbitrary unicode value, NT-escaped into a real Turtle doc,
    comes back verbatim through the production Turtle parser."""
    from mentor_rdf_parsers_spark.parsing.turtle import parse_turtle

    doc = f'<http://ex/s> <http://ex/p> "{_escape_literal(value)}" .'
    quads, errors = parse_turtle(doc)
    assert errors == []
    assert len(quads) == 1
    assert quads[0][2] == ("literal", value, None, None)


@given(_values)
@settings(max_examples=200)
def test_xsd_string_normalizes(value):
    """dt=xsd:string serializes bare (canonical NT 1.2) and re-parses as
    the plain form — the one intentional non-identity in the encoding."""
    s = serialize_term(("literal", value, None, XSD_STRING))
    assert parse_term_string(s) == ("literal", value, None, None)


# --- JVM accessor vs golden parser ----------------------------------------

def _expected_component(term, pos):
    """TERM-struct dict the executor should produce for component pos,
    derived from the golden parser (the spec the JVM path must match)."""
    c = term[1][pos]
    if c[0] == "literal":
        return {"kind": "literal", "v": c[1], "lang": c[2] or "",
                "dt": c[3] or ""}
    if c[0] == "tripleterm":
        return {"kind": "tripleterm", "v": serialize_term(c),
                "lang": "", "dt": ""}
    return {"kind": c[0], "v": c[1], "lang": "", "dt": ""}


@given(st.lists(tripleterms, min_size=1, max_size=8))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_jvm_accessor_matches_golden_parser(spark, terms):
    """The r5 JVM-side SUBJECT/PREDICATE/OBJECT decomposition agrees
    with the golden parser on arbitrary (nested, escaped) triple terms."""
    from pyspark.sql import functions as F

    from mentor_rdf_parsers_spark.sparql.executor import (
        TERM,
        _tripleterm_component,
    )
    from pyspark.sql.types import StructField, StructType

    rows = [
        ({"kind": "tripleterm", "v": serialize_term(t), "lang": "",
          "dt": ""},)
        for t in terms
    ]
    df = spark.createDataFrame(
        rows, StructType([StructField("t", TERM, False)])
    )
    got = df.select(
        *[
            _tripleterm_component(F.col("t"), pos).alias(f"c{pos}")
            for pos in range(3)
        ]
    ).collect()
    for term, row in zip(terms, got):
        for pos in range(3):
            exp = _expected_component(term, pos)
            act = row[f"c{pos}"].asDict()
            assert act == exp, (term, pos)
