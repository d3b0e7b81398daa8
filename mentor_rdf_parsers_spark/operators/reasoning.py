"""N3 rule materialization: forward chaining over `log:implies`.

The reference parses N3 rules — `{ premise } => { conclusion }` becomes
a `log:implies` triple between two formula graphs (quads stamped with
the formula's bnode label, src/n3/reader.ts:859-897) — but never
evaluates them. This operator materializes the entailed facts:

    premise  = BGP with quickvars, compiled through the SPARQL
               executor's pattern machinery (joins on shared vars)
    conclusion = template instantiated per premise binding

iterated to fixpoint (derived facts can fire other rules). Rules are
assumed few (collected to the driver); the DATA side stays distributed.
Conclusion variables that never occur in the premise would be N3
existentials — those rules are skipped with a warning entry.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sparql.executor import Executor
from ..sparql.updates import _instantiate

LOG_IMPLIES = "http://www.w3.org/2000/10/swap/log#implies"

_KEY = ["s_kind", "s", "p", "o_kind", "o", "o_lang", "o_dt"]


def _row_term(kind: str, v: str, lang=None, dt=None):
    if kind == "var":
        return ("var", v)
    if kind == "literal":
        return ("literal", v, lang, dt)
    return (kind, v)


def extract_rules(triples: DataFrame) -> List[Tuple[list, list]]:
    """Collect (premise_patterns, conclusion_patterns) for every
    log:implies rule. Formula bodies are small by construction."""
    impl = triples.where(
        (F.col("p") == LOG_IMPLIES)
        & (F.col("s_kind") == "bnode")
        & (F.col("o_kind") == "bnode")
    ).select("s", "o").collect()
    if not impl:
        return []
    formula_ids = {r["s"] for r in impl} | {r["o"] for r in impl}
    body = (
        triples.where(F.col("g").isin(list(formula_ids)))
        .select("g", "s_kind", "s", "p_kind", "p", "o_kind", "o", "o_lang", "o_dt")
        .collect()
    )
    by_formula: dict[str, list] = {}
    for r in body:
        by_formula.setdefault(r["g"], []).append(
            (
                _row_term(r["s_kind"], r["s"]),
                _row_term(r["p_kind"], r["p"]),
                _row_term(r["o_kind"], r["o"], r["o_lang"], r["o_dt"]),
            )
        )
    rules = []
    for r in impl:
        premise = by_formula.get(r["s"], [])
        conclusion = by_formula.get(r["o"], [])
        if premise and conclusion:
            rules.append((premise, conclusion))
    return rules


def _vars_of(patterns: list) -> set:
    out = set()
    for tp in patterns:
        for t in tp:
            if t[0] == "var":
                out.add(t[1])
    return out


def forward_chain(triples: DataFrame, max_iter: int = 10) -> DataFrame:
    """Materialize the default graph under the document's log:implies
    rules; returns facts (original default-graph triples + derived,
    deduplicated). Fixpoint loop bounded by max_iter; each round runs
    every rule's premise BGP as distributed joins."""
    rules = [
        (p, c) for (p, c) in extract_rules(triples)
        if _vars_of(c) <= _vars_of(p)  # no existentials in conclusions
    ]
    facts = triples.where(
        F.col("g").isNull() & (F.col("p") != LOG_IMPLIES)
        & (F.col("s_kind") != "var") & (F.col("o_kind") != "var")
    )
    if not rules:
        return facts
    facts = facts.localCheckpoint(eager=True)
    prev_count = facts.count()
    for _ in range(max_iter):
        ex = Executor(facts)
        derived = None
        for premise, conclusion in rules:
            bindings = ex._compile_pattern(
                {"type": "bgp", "triples": premise}, None
            )
            new = _instantiate(
                ex, bindings, [(s, p, o, None) for (s, p, o) in conclusion]
            )
            derived = new if derived is None else derived.unionByName(new)
        facts = (
            facts.unionByName(derived.select(facts.columns))
            .dropDuplicates(_KEY)
            .localCheckpoint(eager=True)
        )
        count = facts.count()
        if count == prev_count:
            break
        prev_count = count
    return facts
