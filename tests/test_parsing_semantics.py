"""Hand-derived golden checks for semantics the golden files don't cover.

Each case encodes behavior read directly from the reference reader source
(file:line cited inline). These guard the 'known semantic traps checklist'
from SURVEY.md §7.
"""

from __future__ import annotations

from mentor_rdf_parsers_spark.parsing.lexer import djb2_base36, file_scoped_bnode_generator
from mentor_rdf_parsers_spark.parsing.n3 import parse_n3
from mentor_rdf_parsers_spark.parsing.ntriples import parse_ntriples
from mentor_rdf_parsers_spark.parsing.turtle import parse_turtle
from mentor_rdf_parsers_spark.parsing.terms import RDF, XSD_INTEGER


def spo(quads):
    return [(s, p, o) for (s, p, o, g, *_r) in quads]


def spog(quads):
    return [(s, p, o, g) for (s, p, o, g, *_r) in quads]


# --- langtag case (src/turtle/reader.ts:931 vs src/ntriples/reader.ts:246) ---

def test_langtag_case_divergence():
    # direction suffix is lowercase-only in the grammar (src/tokens.ts:103)
    q, _ = parse_turtle('@prefix : <http://x/> .\n:s :p "v"@EN-GB--ltr .')
    assert q[0][2] == ("literal", "v", "EN-GB--ltr", None)
    q, _ = parse_ntriples('<http://x/s> <http://x/p> "v"@EN-GB--ltr .')
    assert q[0][2] == ("literal", "v", "en-gb--ltr", None)


# --- lexical-form preservation (src/turtle/reader.ts:900-920) ---

def test_numeric_lexical_preservation():
    q, _ = parse_turtle("@prefix : <http://x/> .\n:s :p 1.50, 007, 1.0E0, true .")
    values = [(o[1], o[3]) for (_s, _p, o) in spo(q)]
    assert values == [
        ("1.50", "http://www.w3.org/2001/XMLSchema#decimal"),
        ("007", XSD_INTEGER),
        ("1.0E0", "http://www.w3.org/2001/XMLSchema#double"),
        ("true", "http://www.w3.org/2001/XMLSchema#boolean"),
    ]


# --- collections (src/turtle/reader.ts:745-785) ---

def test_collection_structure():
    q, _ = parse_turtle("@prefix : <http://x/> .\n:s :p (1 2) .")
    triples = spo(q)
    # side-effect quads first (list chain), then the statement quad
    first = RDF + "first"
    rest = RDF + "rest"
    nil = RDF + "nil"
    assert triples[0][1][1] == first and triples[0][2][1] == "1"
    head = triples[0][0]
    assert triples[1][1][1] == rest
    second = triples[1][2]
    assert second == ("bnode", f"{head[1]}-rest-1")
    assert triples[2] == (second, ("iri", first), ("literal", "2", None, XSD_INTEGER))
    assert triples[3] == (second, ("iri", rest), ("iri", nil))
    assert triples[4][1][1] == "http://x/p" and triples[4][2] == head


def test_empty_collection_is_nil():
    q, _ = parse_turtle("@prefix : <http://x/> .\n:s :p () .")
    assert spo(q) == [(("iri", "http://x/s"), ("iri", "http://x/p"), ("iri", RDF + "nil"))]


# --- turtle hoists directives; last @base wins (src/turtle/reader.ts:46-70) ---

def test_turtle_directive_hoisting_last_base_wins():
    q, _ = parse_turtle("@base <http://a/> .\n<s> <p> <o> .\n@base <http://b/> .\n<s2> <p2> <o2> .")
    subjects = [s[1] for (s, _p, _o) in spo(q)]
    assert subjects == ["http://b/s", "http://b/s2"]


def test_trig_directives_in_source_order():
    q, _ = parse_turtle(
        "@base <http://a/> .\n<s> <p> <o> .\n@base <http://b/> .\n<s2> <p2> <o2> .", trig=True
    )
    subjects = [s[1] for (s, _p, _o) in spo(q)]
    assert subjects == ["http://a/s", "http://b/s2"]


# --- prefix use-before-declare is a parse-time error (src/turtle/parser.ts:185-207)

def test_prefix_use_before_declare_rejected():
    q, errors = parse_turtle(":s :p :o .\n@prefix : <http://x/> .")
    assert errors and errors[0][0] == "semantic"


# --- TriG graph stamping (src/trig/reader.ts:701-837) ---

def test_trig_graph_blocks():
    text = (
        "@prefix : <http://x/> .\n"
        ":g1 { :a :b :c . :d :e :f }\n"
        "GRAPH :g2 { :h :i (1) . }\n"
        "{ :j :k :l }\n"
        ":m :n :o .\n"
    )
    q, errors = parse_turtle(text, trig=True)
    assert errors == []
    graphs = [(g[1] if g else None) for (_s, _p, _o, g) in spog(q)]
    assert graphs == [
        "http://x/g1",
        "http://x/g1",
        "http://x/g2",  # rdf:first 1   (collection quads are graph-stamped)
        "http://x/g2",  # rdf:rest nil
        "http://x/g2",  # :h :i head
        None,
        None,
    ]


def test_trig_labeled_bnode_keeps_raw_image():
    # src/trig/reader.ts:1394-1398 vs Turtle's stripped id
    q, _ = parse_turtle("@prefix : <http://x/> .\n_:foo { :a :b _:bar . }", trig=True)
    rows = spog(q)
    assert rows[0][3] == ("bnode", "_:foo")
    assert rows[0][2] == ("bnode", "_:bar")
    q, _ = parse_turtle("@prefix : <http://x/> .\n:a :b _:bar .")
    assert spo(q)[0][2] == ("bnode", "bar")


# --- RDF 1.2 reification/annotation (src/turtle/reader.ts:1132-1220) ---

def test_annotation_reifier_pairing():
    text = '@prefix : <http://x/> .\n:s :p :o ~:r1 {| :q 1 |} ~:r2 {| :q 2 |} .'
    q, errors = parse_turtle(text)
    assert errors == []
    triples = spo(q)
    # order: outer quad, then r1 reifies + its block, r2 reifies + block
    assert triples[0] == (("iri", "http://x/s"), ("iri", "http://x/p"), ("iri", "http://x/o"))
    assert triples[1][0] == ("iri", "http://x/r1") and triples[1][1][1] == RDF + "reifies"
    assert triples[2] == (("iri", "http://x/r1"), ("iri", "http://x/q"), ("literal", "1", None, XSD_INTEGER))
    assert triples[3][0] == ("iri", "http://x/r2")
    assert triples[4][0] == ("iri", "http://x/r2")


def test_bare_annotation_block_gets_fresh_bnode():
    q, _ = parse_turtle('@prefix : <http://x/> .\n:s :p :o {| :q 1 |} .')
    triples = spo(q)
    assert triples[1][0][0] == "bnode"  # fresh reifier
    assert triples[1][1][1] == RDF + "reifies"
    assert triples[1][2][0] == "tripleterm"
    assert triples[2][0] == triples[1][0]


# --- N3 verb sugar (src/n3/reader.ts:251-302) ---

def test_n3_verb_sugar():
    text = (
        "@prefix : <http://x/>.\n"
        ":a = :b .\n"
        ":a => :b .\n"
        ":a <= :b .\n"
        ":a has :p :b .\n"
        ":a is :p of :b .\n"
        ":a <- :p :b .\n"
    )
    q, errors = parse_n3(text)
    assert errors == []
    triples = spo(q)
    A, B, P = ("iri", "http://x/a"), ("iri", "http://x/b"), ("iri", "http://x/p")
    same = ("iri", "http://www.w3.org/2002/07/owl#sameAs")
    implies = ("iri", "http://www.w3.org/2000/10/swap/log#implies")
    assert triples == [
        (A, same, B),
        (A, implies, B),
        (B, implies, A),  # <= inverted
        (A, P, B),        # has
        (B, P, A),        # is … of inverted
        (B, P, A),        # <- inverted
    ]


def test_n3_paths():
    q, _ = parse_n3("@prefix : <http://x/>.\n:a!:p1 :q :b .\n:c^:p2 :r :d .")
    triples = spo(q)
    assert triples[0] == (("iri", "http://x/a"), ("iri", "http://x/p1"), ("bnode", "_path0"))
    assert triples[1] == (("bnode", "_path0"), ("iri", "http://x/q"), ("iri", "http://x/b"))
    assert triples[2] == (("bnode", "_path1"), ("iri", "http://x/p2"), ("iri", "http://x/c"))
    assert triples[3] == (("bnode", "_path1"), ("iri", "http://x/r"), ("iri", "http://x/d"))


def test_n3_formula_graph_and_quickvar():
    q, errors = parse_n3("@prefix : <http://x/>.\n{ ?x :p :b } => { ?x :q :c } .")
    assert errors == []
    rows = spog(q)
    # formula contents first (each in its formula's graph), then the implies quad
    f1 = rows[0][3]
    f2 = rows[1][3]
    assert rows[0] == (("var", "x"), ("iri", "http://x/p"), ("iri", "http://x/b"), f1)
    assert rows[1] == (("var", "x"), ("iri", "http://x/q"), ("iri", "http://x/c"), f2)
    assert rows[2][:3] == (f1, ("iri", "http://www.w3.org/2000/10/swap/log#implies"), f2)
    assert f1[0] == "bnode" and f2[0] == "bnode" and f1 != f2


def test_n3_nested_formula_clobbers_inner_graph():
    # reference formula() re-wraps ALL inner quads with the outer node
    # (src/n3/reader.ts:885-893) — nested graph labels are overwritten
    q, _ = parse_n3("@prefix : <http://x/>.\n{ :a :b { :c :d :e } } :p :o .")
    rows = spog(q)
    outer = rows[-1][0]
    assert all(r[3] == outer for r in rows[:-1])


def test_n3_implicit_empty_prefix():
    q, errors = parse_n3(":a :b :c .")
    assert errors == []
    assert spo(q)[0][0] == ("iri", "#a")


def test_n3_zero_predicate_statement():
    q, errors = parse_n3("@prefix : <http://x/>.\n:a .")
    assert errors == [] and q == []


# --- skolemization (src/utils.ts:81-93) ---

def test_djb2_base36_bit_exact():
    # expected values computed by running the JS algorithm
    # (src/utils.ts:81-93) in node, including UTF-16 surrogate handling
    assert djb2_base36("") == "45h"
    assert djb2_base36("docA") == "yirz4c"
    assert djb2_base36("turtle/x.ttl#1") == "8hhhn0"
    assert djb2_base36("héllo𝄞") == "jrv7ep"


def test_file_scoped_generator():
    gen = file_scoped_bnode_generator("docA")
    prefix = djb2_base36("docA")
    q, _ = parse_turtle("@prefix : <http://x/> .\n[ :p :o ] .\n_:x :q :r .", bnode_generator=gen)
    triples = spo(q)
    assert triples[0][0] == ("bnode", f"{prefix}_b0")
    assert triples[1][0] == ("bnode", f"{prefix}_x")


def test_relative_iri_no_base_kept():
    q, _ = parse_turtle("<s> <p> <o> .")
    assert spo(q)[0] == (("iri", "s"), ("iri", "p"), ("iri", "o"))


def test_iri_with_colon_is_absolute():
    q, _ = parse_turtle("@base <http://b/> .\n<a:b> <p> <o> .")
    assert spo(q)[0][0] == ("iri", "a:b")


# ---------------------------------------------------------------------------
# Comment lineage (read_quad_contexts) — mirrors the reference's
# TurtleReader.readQuadContexts cases (src/turtle/reader.test.ts:835-1060)


class TestQuadContextComments:
    PREFIX = "@prefix ex: <http://example.org/> .\n"

    def _ctx(self, body):
        from mentor_rdf_parsers_spark.parsing.turtle import read_quad_contexts

        contexts, errors = read_quad_contexts(self.PREFIX + body)
        assert not errors
        return contexts

    def test_no_comments(self):
        infos = self._ctx("ex:Alice ex:knows ex:Bob .")
        assert len(infos) == 1
        assert infos[0].quad[0] == ("iri", "http://example.org/Alice")
        assert infos[0].leading_comments == ()
        assert infos[0].trailing_comment is None

    def test_leading_comment(self):
        infos = self._ctx("# This is Alice\nex:Alice ex:knows ex:Bob .")
        assert len(infos) == 1
        assert infos[0].leading_comments == ("# This is Alice",)
        assert infos[0].trailing_comment is None

    def test_trailing_comment_same_line(self):
        infos = self._ctx("ex:Alice ex:knows ex:Bob . # end of line")
        assert len(infos) == 1
        assert infos[0].leading_comments == ()
        assert infos[0].trailing_comment == "# end of line"

    def test_leading_and_trailing(self):
        infos = self._ctx(
            "# Leading comment\nex:Alice ex:knows ex:Bob . # Trailing comment"
        )
        assert len(infos) == 1
        assert infos[0].leading_comments == ("# Leading comment",)
        assert infos[0].trailing_comment == "# Trailing comment"

    def test_distributes_between_statements(self):
        infos = self._ctx(
            "# Comment for Alice\nex:Alice ex:knows ex:Bob .\n"
            "# Comment for Carol\nex:Carol ex:knows ex:Dave . # End of Carol"
        )
        assert len(infos) == 2
        assert infos[0].quad[0] == ("iri", "http://example.org/Alice")
        assert infos[0].leading_comments == ("# Comment for Alice",)
        assert infos[0].trailing_comment is None
        assert infos[1].quad[0] == ("iri", "http://example.org/Carol")
        assert infos[1].leading_comments == ("# Comment for Carol",)
        assert infos[1].trailing_comment == "# End of Carol"

    def test_shared_subject_first_and_last_quad(self):
        infos = self._ctx(
            "# About Alice\nex:Alice ex:knows ex:Bob ;\n"
            "         ex:likes ex:Carol . # End of Alice"
        )
        assert len(infos) == 2
        assert infos[0].quad[1] == ("iri", "http://example.org/knows")
        assert infos[0].leading_comments == ("# About Alice",)
        assert infos[0].trailing_comment is None
        assert infos[1].quad[1] == ("iri", "http://example.org/likes")
        assert infos[1].leading_comments == ()
        assert infos[1].trailing_comment == "# End of Alice"

    def test_multiple_leading_comments(self):
        infos = self._ctx(
            "# First comment\n# Second comment\n# Third comment\n"
            "ex:Alice ex:knows ex:Bob ."
        )
        assert len(infos) == 1
        assert infos[0].leading_comments == (
            "# First comment", "# Second comment", "# Third comment")

    def test_footer_comments_attach_to_last_statement(self):
        infos = self._ctx(
            "ex:Alice ex:knows ex:Bob .\n# Footer comment 1\n# Footer comment 2"
        )
        assert len(infos) == 1
        assert infos[0].leading_comments == (
            "# Footer comment 1", "# Footer comment 2")

    def test_only_directives(self):
        infos = self._ctx("# Just a comment")
        assert infos == []

    def test_quads_match_parse_turtle(self):
        from mentor_rdf_parsers_spark.parsing.turtle import (
            parse_turtle,
            read_quad_contexts,
        )

        doc = self.PREFIX + (
            "# lead\nex:a ex:p (ex:x ex:y) . # trail\n"
            "ex:b ex:q [ ex:r ex:s ] ."
        )
        plain, _ = parse_turtle(doc)
        contexts, _ = read_quad_contexts(doc)
        assert [c.quad for c in contexts] == plain
        # inner collection/bnpl quads never carry comments
        with_comments = [
            c for c in contexts if c.leading_comments or c.trailing_comment
        ]
        for c in with_comments:
            assert c.quad[0][0] == "iri"
