"""SPARQL query-prep utilities, parity with the reference:

* `selected_variables` ≈ SparqlVariableParser.getSelectedVariables
  (/root/reference/src/sparql/parser.ts:299-429): projected variable
  names incl. `AS` aliases; `SELECT *` collects WHERE-clause variables
  in first-appearance order.
* `extract_from_clause_graph_uris` ≈ extractFromClauseGraphUris
  (/root/reference/src/utils.ts:274-326): FROM / FROM NAMED IRIs in
  document order, deduplicated, brackets stripped.
"""

from __future__ import annotations

import re
from typing import List

from .parser import parse_sparql


def _walk_vars(node, out: List[str]) -> None:
    if isinstance(node, tuple):
        if len(node) == 2 and node[0] == "var":
            if node[1] not in out:
                out.append(node[1])
        elif node and node[0] == "tripleterm":
            for t in node[1]:
                _walk_vars(t, out)
        else:
            for x in node:
                _walk_vars(x, out)
    elif isinstance(node, dict):
        for v in node.values():
            _walk_vars(v, out)
    elif isinstance(node, list):
        for x in node:
            _walk_vars(x, out)


def selected_variables(query_text: str) -> List[str]:
    """Projected variable names of a SELECT query (aliases included;
    `SELECT *` → WHERE-clause variables in first-appearance order)."""
    q = parse_sparql(query_text)
    if q.get("form") != "select":
        return []
    proj = q["projection"]
    if proj == "*":
        out: List[str] = []
        _walk_vars(q["where"], out)
        return out
    names = []
    for p in proj:
        if p[0] == "var":
            names.append(p[1])
        else:
            names.append(p[2])
    return names


_FROM_RE = re.compile(
    r"\bFROM\s+(NAMED\s+)?<([^<>\"{}|^`\\\s]*)>", re.IGNORECASE
)


def extract_from_clause_graph_uris(query_text: str) -> List[str]:
    """FROM [NAMED] graph IRIs in document order, deduplicated.

    Token-scan based like the reference (works on syntactically invalid
    queries too, src/utils.ts:274-326)."""
    seen: List[str] = []
    for m in _FROM_RE.finditer(query_text):
        uri = m.group(2)
        if uri not in seen:
            seen.append(uri)
    return seen
