"""Blank-node-insensitive quad-set comparison and precision/recall.

Port of the reference comparison harness
(/root/reference/src/helpers.ts:47-163):

* every blank node is relabeled ``_b0, _b1, …`` in first-occurrence order
  walking the quads in document order (recursing into triple terms);
* quads are serialized, sorted, deduplicated (RDF graphs are sets);
* :func:`quads_match` is the reference's boolean set equality;
* :func:`precision_recall` generalizes it for the P/R ≥ 0.95 gate.

A plain literal and an explicitly ``^^xsd:string``-typed literal are equal,
mirroring RDF/JS ``dataFactory.literal`` defaulting.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

from .terms import Term, XSD_STRING

Quad = Tuple[Term, Term, Term, Optional[Term]]


def _canon_term(term: Optional[Term], bmap: dict, counter: list) -> Optional[tuple]:
    if term is None:
        return None
    kind = term[0]
    if kind == "bnode":
        label = term[1]
        if label not in bmap:
            bmap[label] = f"_b{counter[0]}"
            counter[0] += 1
        return ("bnode", bmap[label])
    if kind == "tripleterm":
        s, p, o = term[1]
        return (
            "tripleterm",
            _canon_term(s, bmap, counter),
            _canon_term(p, bmap, counter),
            _canon_term(o, bmap, counter),
        )
    if kind == "literal":
        _, value, lang, dt = term
        lang = lang or ""
        dt = dt or XSD_STRING
        if lang:
            dt = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
        return ("literal", value, lang, dt)
    return tuple(term)


def canonicalize_quad_set(quads: Iterable[Quad]) -> List[tuple]:
    """First-occurrence bnode relabel in quad order, sort, dedup."""
    bmap: dict = {}
    counter = [0]
    canon = [
        (
            _canon_term(s, bmap, counter),
            _canon_term(p, bmap, counter),
            _canon_term(o, bmap, counter),
            _canon_term(g, bmap, counter),
        )
        for (s, p, o, g) in quads
    ]
    canon.sort(key=repr)
    deduped: List[tuple] = []
    for q in canon:
        if not deduped or q != deduped[-1]:
            deduped.append(q)
    return deduped


def quads_match(a: Iterable[Quad], b: Iterable[Quad]) -> bool:
    """Boolean set equality — helpers.ts:47-68."""
    return canonicalize_quad_set(a) == canonicalize_quad_set(b)


def precision_recall(actual: Iterable[Quad], expected: Iterable[Quad]) -> tuple[float, float]:
    """P = |A∩E|/|A|, R = |A∩E|/|E| over canonicalized quad sets.

    Canonical relabeling is per-set and order-dependent (reference quirk),
    so isomorphic graphs emitted in the same statement order score 1.0.
    """
    ca = set(map(repr, canonicalize_quad_set(actual)))
    ce = set(map(repr, canonicalize_quad_set(expected)))
    if not ca and not ce:
        return 1.0, 1.0
    inter = len(ca & ce)
    p = inter / len(ca) if ca else 1.0
    r = inter / len(ce) if ce else 1.0
    return p, r
