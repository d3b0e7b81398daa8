"""SPARQL 1.2 front end + Spark execution.

The reference ships a parse-only SPARQL module (`/root/reference/src/
sparql/parser.ts`, productions [1]-[158]; `src/index.ts:12` exports only
the parser — no evaluator). This package provides parity for the parse
surface (`parser.parse_sparql`, `utils.selected_variables`,
`utils.extract_from_clause_graph_uris`) **plus** a DataFrame executor
(`executor.execute`) that the reference does not have: SELECT / ASK /
CONSTRUCT / DESCRIBE over the engine's `triples` table, compiled to
Spark DataFrame plans per SURVEY.md §2.B.
"""

from .executor import SparqlExecutionError, execute
from .parser import SparqlParseError, parse_sparql, resolve_codepoint_escapes
from .updates import execute_update
from .utils import extract_from_clause_graph_uris, selected_variables

__all__ = [
    "SparqlExecutionError",
    "SparqlParseError",
    "execute",
    "execute_update",
    "parse_sparql",
    "resolve_codepoint_escapes",
    "extract_from_clause_graph_uris",
    "selected_variables",
]
