"""Differential fuzzing for SPARQL Update: random update SEQUENCES vs a
set-algebra model.

Round-5 extension of the executor differential fuzz to the update
surface: hypothesis draws a random initial graph plus a 1–3-step
sequence of INSERT DATA / DELETE DATA / DELETE WHERE operations,
renders each to SPARQL Update text, applies them in order through
``execute_update`` (full parse → DataFrame set algebra), and compares
the final graph against a plain-Python model where the graph is a set
of triples, INSERT DATA unions, DELETE DATA subtracts, and DELETE WHERE
subtracts the pattern's matches (via the independent naive evaluator's
``match_pattern``).

Ground INSERT/DELETE DATA templates are bnode-free (a bnode in INSERT
DATA mints a FRESH node per the spec, so its identity is untestable;
DELETE DATA forbids bnodes outright).  The initial graph may still hold
bnodes — DELETE WHERE variables range over them.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.naive_sparql import match_pattern
from tests.test_fuzz_sparql_differential import (
    O_LITS,
    P_IRIS,
    S_IRIS,
    sparql_token,
    to_df,
    triples_st,
)

# ground (bnode-free) triples for INSERT/DELETE DATA text
ground_triple = st.tuples(
    st.sampled_from(S_IRIS),
    st.sampled_from(P_IRIS),
    st.sampled_from(S_IRIS + O_LITS),
)

VAR_A, VAR_B, VAR_C = ("var", "a"), ("var", "b"), ("var", "c")
pattern_t = st.tuples(
    st.sampled_from([VAR_A] + S_IRIS),
    st.sampled_from([VAR_B] + P_IRIS),
    st.sampled_from([VAR_C] + S_IRIS + O_LITS),
)

# MODIFY: DELETE {tmpl} INSERT {tmpl} WHERE {patterns} — both templates
# instantiated from the SAME WHERE binding set against the pre-update
# graph, deletes applied before inserts (§3.1.3)
template_t = st.tuples(
    st.sampled_from([VAR_A] + S_IRIS),
    st.sampled_from([VAR_B] + P_IRIS),
    st.sampled_from([VAR_C] + S_IRIS + O_LITS),
)


@st.composite
def modify_op(draw):
    dels = draw(st.lists(template_t, min_size=0, max_size=2))
    ins = draw(st.lists(template_t, min_size=0 if dels else 1, max_size=2))
    where = draw(st.lists(pattern_t, min_size=1, max_size=2))
    return ("modify", dels, ins, where)


op_st = st.one_of(
    st.builds(lambda ts: ("insert_data", ts),
              st.lists(ground_triple, min_size=1, max_size=3)),
    st.builds(lambda ts: ("delete_data", ts),
              st.lists(ground_triple, min_size=1, max_size=3)),
    st.builds(lambda p: ("delete_where", p), pattern_t),
    modify_op(),
)


@st.composite
def update_case(draw):
    return draw(triples_st), draw(st.lists(op_st, min_size=1, max_size=3))


def _tmpl_text(triples) -> str:
    return " ".join(
        " ".join(sparql_token(t) for t in triple) + " ." for triple in triples
    )


def render_op(op) -> str:
    kind = op[0]
    if kind in ("insert_data", "delete_data"):
        kw = "INSERT DATA" if kind == "insert_data" else "DELETE DATA"
        return f"{kw} {{ {_tmpl_text(op[1])} }}"
    if kind == "modify":
        _, dels, ins, where = op
        parts = []
        if dels:
            parts.append("DELETE { " + _tmpl_text(dels) + " }")
        if ins:
            parts.append("INSERT { " + _tmpl_text(ins) + " }")
        parts.append("WHERE { " + _tmpl_text(where) + " }")
        return " ".join(parts)
    body = " ".join(sparql_token(t) for t in op[1]) + " ."
    return f"DELETE WHERE {{ {body} }}"


def model_apply(graph: set, op) -> set:
    kind = op[0]
    if kind == "insert_data":
        return graph | set(op[1])
    if kind == "delete_data":
        return graph - set(op[1])
    if kind == "modify":
        from tests.naive_sparql import eval_group
        from tests.test_fuzz_sparql_differential import naive_construct

        _, dels, ins, where = op
        sols = eval_group([("pattern", p) for p in where], sorted(graph, key=repr))
        # both templates instantiate from the PRE-update bindings;
        # deletes apply before inserts (invalid/unbound instantiations
        # drop, same rules as CONSTRUCT)
        return (graph - naive_construct(dels, sols)) | naive_construct(ins, sols)
    # delete_where: remove every triple the pattern matches
    pattern = op[1]
    doomed = set()
    for t in graph:
        if match_pattern(pattern, [t]):
            doomed.add(t)
    return graph - doomed


def df_to_triples(df) -> set:
    out = set()
    for r in df.collect():
        s = (r["s_kind"], r["s"])
        p = ("iri", r["p"])
        if r["o_kind"] == "literal":
            o = ("literal", r["o"], r["o_lang"] or None, r["o_dt"] or None)
        else:
            o = (r["o_kind"], r["o"])
        out.add((s, p, o))
    return out


@given(update_case())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_update_sequence_matches_model(spark, case):
    from mentor_rdf_parsers_spark.sparql.updates import execute_update

    data, ops = case
    df = to_df(spark, data)
    model = set(data)
    for op in ops:
        df = execute_update(render_op(op), df)
        model = model_apply(model, op)
    actual = df_to_triples(df)
    assert actual == model, " ; ".join(render_op(o) for o in ops)


def test_update_anchor(spark):
    """Fixed case with a hand-computed answer (guards against a bug that
    breaks both sides identically)."""
    from mentor_rdf_parsers_spark.sparql.updates import execute_update

    S0, S1 = S_IRIS[0], S_IRIS[1]
    P0 = P_IRIS[0]
    L1 = O_LITS[3]  # "1"^^xsd:integer
    data = [(S0, P0, L1), (S1, P0, S0)]
    df = to_df(spark, data)
    df = execute_update(
        f"INSERT DATA {{ {sparql_token(S1)} {sparql_token(P0)} "
        f"{sparql_token(L1)} . }}", df)
    df = execute_update(
        f"DELETE WHERE {{ ?a {sparql_token(P0)} {sparql_token(L1)} . }}", df)
    assert df_to_triples(df) == {(S1, P0, S0)}
