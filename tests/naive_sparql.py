"""Independent in-memory SPARQL core evaluator — the differential
oracle for fuzzing the Spark executor (round-5 extension of VERDICT r4
ask #6 from the parsers to execution).

This is a from-the-spec implementation of the SPARQL 1.1/1.2 algebra
core (join / left-join / union / minus / VALUES-with-UNDEF / filter
over solution-mapping multisets, with three-valued filter logic),
sharing NO code with
``mentor_rdf_parsers_spark.sparql.executor`` — no parser, no Spark, no
term serialization.  Solutions are plain dicts; triples are tuples.
Anything the two implementations disagree on is a bug in one of them.

Term representation (matches the parsers' tuples so the fuzz driver
can build both sides from one sample):

    ("iri", value) | ("bnode", label) | ("literal", value, lang, dt)

Pattern slots are terms or ("var", name).  Expression trees:

    ("bound", var) | ("sameterm", a, b) | ("eq", a, b)
    | ("isiri", a) | ("isliteral", a) | ("isblank", a)
    | ("lt"/"gt", a, b)            # numeric, xsd:integer only
    | ("and"/"or", e1, e2) | ("not", e)

where a/b are ("var", name) or term constants.  Filter evaluation is
three-valued: True / False / ERROR, per SPARQL 17.2 (errors eliminate
the row; && / || recover per the truth tables; ! preserves error).
"""

from __future__ import annotations

from typing import Optional

XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_BOOLEAN = "http://www.w3.org/2001/XMLSchema#boolean"

ERROR = object()  # the third truth value


# --------------------------------------------------------------- algebra

def match_pattern(pattern, triples):
    """Multiset of solution mappings for one triple pattern."""
    out = []
    for t in triples:
        binding = {}
        ok = True
        for slot, term in zip(pattern, t):
            if slot[0] == "var":
                name = slot[1]
                if name in binding and binding[name] != term:
                    ok = False
                    break
                binding[name] = term
            elif slot != term:
                ok = False
                break
        if ok:
            out.append(binding)
    return out


def compatible(a: dict, b: dict) -> bool:
    return all(a[k] == b[k] for k in a.keys() & b.keys())


def join(left: list, right: list) -> list:
    return [
        {**l, **r} for l in left for r in right if compatible(l, r)
    ]


def left_join(left: list, right: list) -> list:
    out = []
    for l in left:
        exts = [{**l, **r} for r in right if compatible(l, r)]
        out.extend(exts if exts else [l])
    return out


def minus(left: list, right: list) -> list:
    """SPARQL §18.5 Minus: drop μ1 iff ∃ μ2 compatible with μ1 AND
    dom(μ1) ∩ dom(μ2) ≠ ∅ (disjoint-domain μ2 removes nothing)."""
    return [
        l for l in left
        if not any(compatible(l, r) and (l.keys() & r.keys()) for r in right)
    ]


# ---------------------------------------------------------------- paths

def graph_nodes(triples) -> set:
    """All subject/object terms (the spec's zero-length-path domain)."""
    out: set = set()
    for (s, _p, o) in triples:
        out.add(s)
        out.add(o)
    return out


def path_pairs(path, triples) -> list:
    """Multiset of (subj, obj) pairs for a property-path expression.

    Path AST (independent of the executor's):
        ("iri", p)                       plain step
        ("inv", P) | ("seq", P, Q) | ("alt", P, Q)
        ("mod", P, "?"|"*"|"+")
        ("negset", [p_iri, ...])         forward-only !(…)

    Spec §18.4 semantics: seq/alt/inv/negset preserve multiplicity
    (seq is a join over a fresh middle variable, alt a bag union,
    negset one row per matching triple); the closure modifiers ? * +
    are DISTINCT over node pairs, with zero-length paths ranging over
    all graph nodes."""
    if path[0] == "iri":
        return [(s, o) for (s, p, o) in triples if p == path]
    op = path[0]
    if op == "inv":
        return [(o, s) for (s, o) in path_pairs(path[1], triples)]
    if op == "seq":
        lefts = path_pairs(path[1], triples)
        rights = path_pairs(path[2], triples)
        return [(s, o2) for (s, m) in lefts for (m2, o2) in rights if m == m2]
    if op == "alt":
        return path_pairs(path[1], triples) + path_pairs(path[2], triples)
    if op == "negset":
        excluded = {p[1] for p in path[1]}
        return [(s, o) for (s, p, o) in triples if p[1] not in excluded]
    if op == "mod":
        inner = set(path_pairs(path[1], triples))
        if path[2] == "?":
            pairs = inner | {(n, n) for n in graph_nodes(triples)}
            return sorted(pairs, key=repr)
        closure = set(inner)
        while True:
            new = {
                (s, o2)
                for (s, m) in closure for (m2, o2) in closure if m == m2
            } - closure
            if not new:
                break
            closure |= new
        if path[2] == "*":
            closure |= {(n, n) for n in graph_nodes(triples)}
        return sorted(closure, key=repr)
    raise AssertionError(f"unknown path {path}")


def match_path_pattern(s_slot, path, o_slot, triples) -> list:
    """(s_slot, path, o_slot) → multiset of solution mappings."""
    out = []
    for (sv, ov) in path_pairs(path, triples):
        binding = {}
        ok = True
        for slot, term in ((s_slot, sv), (o_slot, ov)):
            if slot[0] == "var":
                name = slot[1]
                if name in binding and binding[name] != term:
                    ok = False
                    break
                binding[name] = term
            elif slot != term:
                ok = False
                break
        if ok:
            out.append(binding)
    return out


# ----------------------------------------------------------- expressions

def _resolve(operand, sol):
    """Operand → term, None (unbound var) — constants pass through."""
    if operand[0] == "var":
        return sol.get(operand[1])
    return operand


def _numeric(term) -> Optional[int]:
    if term is not None and term[0] == "literal" and term[3] == XSD_INTEGER:
        try:
            return int(term[1])
        except ValueError:
            return None
    return None


def eval_expr(expr, sol, triples=()):
    """→ True | False | ERROR (SPARQL 17.2 three-valued logic)."""
    op = expr[0]
    if op == "exists":
        # §18.6 substitution semantics: bind μ's variables inside the
        # inner group, then test non-emptiness. Seeding the group
        # evaluation with [μ] is equivalent for the pattern-only groups
        # the fuzzer generates (and unbound μ-vars stay free, matching
        # anything — the executor must NOT drop them in its semi-join).
        inner = eval_group(expr[1], triples, seed=[sol])
        found = len(inner) > 0
        return (not found) if expr[2] else found
    if op == "and":
        a, b = (eval_expr(expr[1], sol, triples),
                eval_expr(expr[2], sol, triples))
        if a is False or b is False:
            return False
        if a is ERROR or b is ERROR:
            return ERROR
        return True
    if op == "or":
        a, b = (eval_expr(expr[1], sol, triples),
                eval_expr(expr[2], sol, triples))
        if a is True or b is True:
            return True
        if a is ERROR or b is ERROR:
            return ERROR
        return False
    if op == "not":
        a = eval_expr(expr[1], sol, triples)
        return ERROR if a is ERROR else (not a)

    if op == "bound":
        return expr[1][1] in sol

    a = _resolve(expr[1], sol)
    if op in ("isiri", "isliteral", "isblank"):
        if a is None:
            return ERROR
        return a[0] == {"isiri": "iri", "isliteral": "literal",
                        "isblank": "bnode"}[op]

    b = _resolve(expr[2], sol)
    if a is None or b is None:
        return ERROR  # unbound argument → type error
    if op == "sameterm":
        return a == b
    if op == "eq":
        # RDFterm-equal: same term → true; both literals, different
        # terms → type error unless both are of a value-comparable
        # datatype (here: xsd:integer value compare, plain/lang string
        # compare); any other combination → false.
        if a == b:
            return True
        if a[0] == "literal" and b[0] == "literal":
            na, nb = _numeric(a), _numeric(b)
            if na is not None and nb is not None:
                return na == nb
            simple = lambda t: t[2] is None and t[3] is None  # noqa: E731
            if simple(a) and simple(b):
                return False  # same-type values, genuinely unequal
            return ERROR
        return False
    if op in ("lt", "gt"):
        na, nb = _numeric(a), _numeric(b)
        if na is not None and nb is not None:
            return na < nb if op == "lt" else na > nb
        simple = lambda t: (  # noqa: E731 — plain/xsd:string literal
            t[0] == "literal" and t[2] is None and t[3] is None
        )
        if simple(a) and simple(b):
            # fn:compare on simple literals: codepoint ordering
            return a[1] < b[1] if op == "lt" else a[1] > b[1]
        return ERROR  # any other pairing → type error
    raise AssertionError(f"unknown expr {expr}")


def eval_term_expr(expr, sol, triples=()):
    """Expression → term tuple, or None on unbound-var / type ERROR
    (BIND then leaves the target unbound, §18.2.2.6 Extend)."""
    if isinstance(expr, tuple) and expr[0] == "var":
        return sol.get(expr[1])
    if isinstance(expr, tuple) and expr[0] in ("iri", "literal", "bnode"):
        return expr
    b = eval_expr(expr, sol, triples)
    if b is ERROR:
        return None
    return ("literal", "true" if b else "false", None, XSD_BOOLEAN)


# ---------------------------------------------------------------- groups

def eval_group(elements, triples, seed=None, dataset=None):
    """SPARQL 18.2.2 group translation: fold elements left-to-right
    (OPTIONAL → LeftJoin with the group-so-far), filters collected and
    applied to the WHOLE group at the end.  ``seed`` pre-binds solutions
    (used for EXISTS substitution).  ``triples`` is the ACTIVE graph;
    ``dataset`` is ``{"named": {iri_term: [triple, ...]}}`` for GRAPH
    elements (absent → no named graphs)."""
    sols = [dict(s) for s in seed] if seed is not None else [{}]
    filters = []
    for el in elements:
        kind = el[0]
        if kind == "pattern":
            sols = join(sols, match_pattern(el[1], triples))
        elif kind == "pathpattern":
            _, s_slot, pth, o_slot = el
            sols = join(sols, match_path_pattern(s_slot, pth, o_slot, triples))
        elif kind == "optional":
            sols = left_join(sols, eval_group(el[1], triples, dataset=dataset))
        elif kind == "union":
            sols = join(
                sols,
                eval_group(el[1], triples, dataset=dataset)
                + eval_group(el[2], triples, dataset=dataset),
            )
        elif kind == "minus":
            sols = minus(sols, eval_group(el[1], triples, dataset=dataset))
        elif kind == "values":
            # el = ("values", [varname, ...], [row, ...]); an UNDEF cell
            # (None) binds nothing, so it's simply absent from the mapping
            vsols = [
                {v: c for v, c in zip(el[1], row) if c is not None}
                for row in el[2]
            ]
            sols = join(sols, vsols)
        elif kind == "graph":
            # GRAPH g { P } (§13.3): constant IRI → evaluate P over that
            # named graph (empty when absent); variable → union over all
            # named graphs with the variable bound to the graph name
            # (constraining, not overwriting, when P also binds it)
            _, gslot, inner_els = el
            named = (dataset or {}).get("named", {})
            if gslot[0] == "var":
                gsols = []
                for gname, gtriples in named.items():
                    for m in eval_group(inner_els, gtriples,
                                        dataset=dataset):
                        if gslot[1] in m:
                            if m[gslot[1]] == gname:
                                gsols.append(m)
                        else:
                            gsols.append({**m, gslot[1]: gname})
            else:
                gsols = eval_group(inner_els, named.get(gslot, []),
                                   dataset=dataset)
            sols = join(sols, gsols)
        elif kind == "subselect":
            # { SELECT [DISTINCT] vars WHERE { … } }: evaluate the inner
            # group on its own (outer bindings are NOT visible — bottom-
            # up evaluation), project to the chosen vars (projecting an
            # unbound var leaves it absent), then join. DISTINCT dedups
            # the PROJECTED multiset.
            _, proj, inner_els, distinct = el
            inner = [
                {v: m[v] for v in proj if m.get(v) is not None}
                for m in eval_group(inner_els, triples, dataset=dataset)
            ]
            if distinct:
                seen, uniq = set(), []
                for m in inner:
                    key = tuple(sorted(m.items()))
                    if key not in seen:
                        seen.add(key)
                        uniq.append(m)
                inner = uniq
            sols = join(sols, inner)
        elif kind == "bind":
            # Extend(Ω, var, expr): evaluated per solution IN ORDER
            # (sees only bindings made before it); error → unbound
            _, expr, var = el
            out = []
            for s in sols:
                val = eval_term_expr(expr, s, triples)
                out.append({**s, var: val} if val is not None else s)
            sols = out
        elif kind == "filter":
            filters.append(el[1])
        else:
            raise AssertionError(f"unknown element {el}")
    for f in filters:
        sols = [s for s in sols if eval_expr(f, s, triples) is True]
    return sols


def eval_select(elements, triples, project, distinct=False,
                dataset=None):
    """→ multiset (sorted list) of projected row tuples; each cell is
    the term tuple or None when unbound."""
    sols = eval_group(elements, triples, dataset=dataset)
    rows = [tuple(s.get(v) for v in project) for s in sols]
    if distinct:
        rows = list(set(rows))
    return sorted(rows, key=repr)


def group_vars(elements) -> set:
    """All variables appearing anywhere in the group (SELECT * scope)."""
    out: set = set()
    for el in elements:
        if el[0] == "pattern":
            out |= {s[1] for s in el[1] if s[0] == "var"}
        elif el[0] == "pathpattern":
            out |= {s[1] for s in (el[1], el[3]) if s[0] == "var"}
        elif el[0] == "optional":
            out |= group_vars(el[1])
        elif el[0] == "union":
            out |= group_vars(el[1]) | group_vars(el[2])
        elif el[0] == "values":
            out |= set(el[1])
        elif el[0] == "bind":
            out.add(el[2])
        elif el[0] == "subselect":
            out |= set(el[1])  # only the projected vars are in scope
        elif el[0] == "graph":
            out |= group_vars(el[2])
            if el[1][0] == "var":
                out.add(el[1][1])
        # "minus" contributes nothing: its variables are not in scope
    return out
