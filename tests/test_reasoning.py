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


def _rows(df):
    key = ["s_kind", "s", "p", "o_kind", "o", "o_lang", "o_dt"]
    return sorted(tuple(r[c] for c in key) for r in df.collect())


def test_transitive_fast_path_equals_generic(spark):
    t = _facts(spark, """@prefix : <http://ex/> .
:a :anc :b . :b :anc :c . :c :anc :d . :d :anc :e .
:p :sub :q . :q :sub :r .
{ ?x :anc ?y . ?y :anc ?z } => { ?x :anc ?z } .
{ ?u :sub ?v . ?v :sub ?w } => { ?u :sub ?w } .
""")
    fast = forward_chain(t)                      # all-transitive → fast path
    slow = forward_chain(t, specialize=False)    # generic semi-naive
    assert _rows(fast) == _rows(slow)
    # the :anc closure over a 4-edge chain is 10 ordered pairs
    assert fast.where(F.col("p") == "http://ex/anc").count() == 10
    assert fast.where(F.col("p") == "http://ex/sub").count() == 3


def test_mixed_rule_set_falls_back_to_generic(spark):
    t = _facts(spark, """@prefix : <http://ex/> .
:a :anc :b . :b :anc :c .
:a a :Person .
{ ?x :anc ?y . ?y :anc ?z } => { ?x :anc ?z } .
{ ?s a :Person } => { ?s a :Agent } .
""")
    out = forward_chain(t)  # non-transitive rule present → generic loop
    pairs = {(r["s"], r["o"]) for r in out.where(F.col("p") == "http://ex/anc").collect()}
    assert ("http://ex/a", "http://ex/c") in pairs
    assert out.where(F.col("o") == "http://ex/Agent").count() == 1


def test_transitive_shape_rejects_non_transitive():
    from mentor_rdf_parsers_spark.operators.reasoning import _transitive_shape

    P = ("iri", "http://ex/p")
    Q = ("iri", "http://ex/q")
    x, y, z = ("var", "x"), ("var", "y"), ("var", "z")
    assert _transitive_shape([(x, P, y), (y, P, z)], [(x, P, z)]) == (P, "x", "z")
    # reversed premise order accepted
    assert _transitive_shape([(y, P, z), (x, P, y)], [(x, P, z)]) == (P, "x", "z")
    # different predicate in conclusion → no
    assert _transitive_shape([(x, P, y), (y, P, z)], [(x, Q, z)]) is None
    # swapped conclusion vars (z, P, x) → no
    assert _transitive_shape([(x, P, y), (y, P, z)], [(z, P, x)]) is None
    # shared var missing → no
    assert _transitive_shape([(x, P, y), (z, P, y)], [(x, P, z)]) is None
    # constant in premise subject → no
    assert _transitive_shape([(("iri", "http://ex/a"), P, y), (y, P, z)], [(x, P, z)]) is None
