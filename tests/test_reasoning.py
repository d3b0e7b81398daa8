"""N3 log:implies forward chaining: parse rules through the real N3
path, materialize, check the entailed facts (the reference parses these
rules but cannot evaluate them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mentor_rdf_parsers_spark.operators.extract import extract_triples, split_extract
from mentor_rdf_parsers_spark.operators.reasoning import forward_chain
from mentor_rdf_parsers_spark.schemas import DOCUMENTS


def _facts(spark, n3_text):
    rows = [("doc.n3", [("text", n3_text, None, 0)], "n3", None)]
    docs = spark.createDataFrame(rows, DOCUMENTS)
    triples, errors = split_extract(extract_triples(docs, skolemize=False))
    assert errors.count() == 0
    return triples


def test_modus_ponens(spark):
    t = _facts(spark, """@prefix : <http://ex/> .
:socrates a :Man .
:plato a :Man .
:rex a :Dog .
{ ?x a :Man } => { ?x a :Mortal } .
""")
    out = forward_chain(t)
    mortals = {r["s"] for r in out.where(F.col("o") == "http://ex/Mortal").collect()}
    assert mortals == {"http://ex/socrates", "http://ex/plato"}
    # facts table contains no rule machinery
    assert out.where(F.col("s_kind") == "var").count() == 0


def test_transitive_closure_rule(spark):
    t = _facts(spark, """@prefix : <http://ex/> .
:a :anc :b . :b :anc :c . :c :anc :d .
{ ?x :anc ?y . ?y :anc ?z } => { ?x :anc ?z } .
""")
    out = forward_chain(t)
    pairs = {(r["s"], r["o"]) for r in out.where(F.col("p") == "http://ex/anc").collect()}
    short = {(s.rsplit("/", 1)[1], o.rsplit("/", 1)[1]) for s, o in pairs}
    assert short == {("a", "b"), ("b", "c"), ("c", "d"),
                     ("a", "c"), ("b", "d"), ("a", "d")}


def test_chained_rules(spark):
    t = _facts(spark, """@prefix : <http://ex/> .
:x a :A .
{ ?s a :A } => { ?s a :B } .
{ ?s a :B } => { ?s a :C } .
""")
    out = forward_chain(t)
    types = {r["o"] for r in out.where(F.col("s") == "http://ex/x").collect()}
    assert types == {"http://ex/A", "http://ex/B", "http://ex/C"}


def test_existential_rule_skipped(spark):
    t = _facts(spark, """@prefix : <http://ex/> .
:a a :Thing .
{ ?x a :Thing } => { ?x :related ?somethingNew . ?somethingNew a :Ghost } .
""")
    # ?somethingNew appears... in premise? no → rule skipped, no crash
    out = forward_chain(t)
    assert out.where(F.col("o") == "http://ex/Ghost").count() == 0
