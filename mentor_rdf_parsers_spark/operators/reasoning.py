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
from .iterutil import fixed_plan, resolve_adaptive
from .paths import transitive_closure
from ..sparql.updates import _instantiate

LOG_IMPLIES = "http://www.w3.org/2000/10/swap/log#implies"

_KEY = ["s_kind", "s", "p", "o_kind", "o", "o_lang", "o_dt"]

# Observability: which execution path the most recent forward_chain call
# took (benches read this after timing so the attested number provably
# ran the path it claims — {"used_specialization": bool, "rules": int}).
LAST_RUN_INFO: dict = {}


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


def _bgp_seminaive(ex_all: Executor, ex_delta: Executor, premise: list) -> DataFrame:
    """Premise bindings that use AT LEAST ONE delta-round fact: union
    over atom positions of (atom_i against Δ ⋈ the other atoms against
    the full store). This is textbook semi-naive Datalog evaluation —
    the naive loop re-runs the full BGP over the whole store every
    round, re-deriving every earlier conclusion again (measured 250 s
    for the sf0.1 transitive closure; the late rounds each pay the full
    O(paths) join). Semi-naive pays each derivation once."""
    out = None
    for i in range(len(premise)):
        df = None
        for j, (s, p, o) in enumerate(premise):
            src = ex_delta if j == i else ex_all
            pat = src._pattern_df(s, p, o, None)
            df = pat if df is None else ex_all._join_bindings(df, pat)
        out = df if out is None else out.unionByName(df)
    return out


def _transitive_shape(premise: list, conclusion: list):
    """Recognize the linear-recursive (transitive-closure) rule shape
    ``{ ?x P ?y . ?y P ?z } => { ?x P ?z }`` (premise atoms in either
    order, constant IRI predicate P shared by all three atoms, three
    distinct plain variables). Returns ``(P, x, z)`` or ``None``.

    This is the textbook Datalog linear-rule specialization: the
    semi-naive loop reaches the fixpoint of such a rule in O(log
    diameter) rounds too (derived facts join derived facts), but each
    round drags the full 9-column fact rows through two BGP joins, a
    dedup and an anti-join; the specialized path runs path-doubling on
    a 2-column (src, dst) term-struct DataFrame and instantiates
    conclusions ONCE through the same ``_instantiate`` machinery, so
    the output rows are identical by construction."""
    if len(premise) != 2 or len(conclusion) != 1:
        return None
    preds = {tp[1] for tp in premise} | {conclusion[0][1]}
    if len(preds) != 1:
        return None
    (pred,) = preds
    if pred[0] != "iri":
        return None
    a, b = premise
    if any(t[0] != "var" for t in (a[0], a[2], b[0], b[2])):
        return None
    for first, second in ((a, b), (b, a)):
        x, y1 = first[0][1], first[2][1]
        y2, z = second[0][1], second[2][1]
        if y1 == y2 and len({x, y1, z}) == 3:
            c = conclusion[0]
            if c[0] == ("var", x) and c[2] == ("var", z):
                return (pred, x, z)
    return None


def _chain_transitive(facts: DataFrame, rules: list, max_iter: int) -> DataFrame:
    """Fast path for an all-transitive rule set: per predicate, closure
    by path doubling over (src, dst) term structs, then one conclusion
    instantiation. Rules over distinct predicates are independent (a
    rule's conclusions carry its own predicate, so they can never fire
    another predicate's rule); duplicate rules collapse."""
    ex = Executor(facts)
    derived = None
    seen = set()
    for premise, conclusion in rules:
        pred, x, z = _transitive_shape(premise, conclusion)
        if pred in seen:
            continue
        seen.add(pred)
        edges = ex._pattern_df(("var", x), pred, ("var", z), None).select(
            F.col(x).alias("src"), F.col(z).alias("dst")
        )
        closure = transitive_closure(edges, max_iter=max_iter)
        bindings = closure.select(F.col("src").alias(x), F.col("dst").alias(z))
        new = _instantiate(
            ex, bindings, [(conclusion[0][0], conclusion[0][1],
                            conclusion[0][2], None)]
        )
        derived = new if derived is None else derived.unionByName(new)
    derived = derived.select(facts.columns).dropDuplicates(_KEY)
    cond = None
    for c in _KEY:
        eq = derived[c].eqNullSafe(facts[c])
        cond = eq if cond is None else cond & eq
    delta = derived.join(facts, cond, "left_anti")
    return facts.unionByName(delta)


def forward_chain(
    triples: DataFrame, max_iter: int = 10,
    adaptive_exec: "bool | None" = None,
    specialize: bool = True,
) -> DataFrame:
    """Materialize the default graph under the document's log:implies
    rules; returns facts (original default-graph triples + derived,
    deduplicated). Semi-naive fixpoint loop bounded by max_iter: each
    round joins only the PREVIOUS round's new facts (Δ) against the
    store.
    The frontier is `derived ANTI-JOIN facts` with null-safe equality
    (o_lang/o_dt/g are nullable — a plain anti-join would never match
    null keys and the loop would not terminate)."""
    global LAST_RUN_INFO
    rules = [
        (p, c) for (p, c) in extract_rules(triples)
        if _vars_of(c) <= _vars_of(p)  # no existentials in conclusions
    ]
    facts = triples.where(
        F.col("g").isNull() & (F.col("p") != LOG_IMPLIES)
        & (F.col("s_kind") != "var") & (F.col("o_kind") != "var")
    )
    if not rules:
        LAST_RUN_INFO = {"used_specialization": False, "rules": 0}
        return facts
    if specialize and all(
        _transitive_shape(p, c) is not None for (p, c) in rules
    ):
        LAST_RUN_INFO = {"used_specialization": True, "rules": len(rules)}
        facts = facts.dropDuplicates(_KEY).localCheckpoint(eager=True)
        return _chain_transitive(facts, rules, max_iter)
    LAST_RUN_INFO = {"used_specialization": False, "rules": len(rules)}
    # AQE auto-resolved from the fact count (iterutil.resolve_adaptive):
    # every round re-executes the same BGP-join shape, so re-planning is
    # serial latency on work-dominated rounds; coalescing wins on tiny
    # rounds at many cores (both regimes measured, see iterutil)
    facts = facts.dropDuplicates(_KEY).localCheckpoint(eager=True)
    spark = triples.sparkSession
    with fixed_plan(spark, resolve_adaptive(spark, adaptive_exec, facts.count())):
        delta = facts
        for _ in range(max_iter):
            ex_all = Executor(facts)
            ex_delta = Executor(delta)
            derived = None
            for premise, conclusion in rules:
                # extract_rules only emits plain (s, p, o) tuple terms
                # (_row_term), so every premise is semi-naive-evaluable;
                # property-path premises would need a full-evaluation
                # fallback here if extract_rules ever surfaced them
                bindings = _bgp_seminaive(ex_all, ex_delta, premise)
                new = _instantiate(
                    ex_all, bindings, [(s, p, o, None) for (s, p, o) in conclusion]
                )
                derived = new if derived is None else derived.unionByName(new)
            derived = derived.select(facts.columns).dropDuplicates(_KEY)
            cond = None
            for c in _KEY:
                eq = derived[c].eqNullSafe(facts[c])
                cond = eq if cond is None else cond & eq
            delta = derived.join(facts, cond, "left_anti").localCheckpoint(eager=True)
            if delta.isEmpty():
                break
            # the store is re-checkpointed per round: it is read several
            # times per round (Δ-join branches + anti-join), so one
            # materialization beats re-scanning a growing union-of-deltas
            # plan (measured at sf0.1 — the union-plan variant was ~5%
            # slower despite skipping the checkpoint write)
            facts = facts.unionByName(delta).localCheckpoint(eager=True)
    return facts
