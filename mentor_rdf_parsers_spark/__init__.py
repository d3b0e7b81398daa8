"""PySpark-native knowledge-graph construction engine.

From-scratch re-creation of the query/data-processing capabilities of
faubulous/mentor-rdf-parsers (reference at /root/reference, studied for
behavior only) as a distributed Spark dataflow:
extract -> link -> canonicalize -> materialize.
"""

__version__ = "0.1.0"

# Flagship public surface: run a SPARQL 1.2 string over a triples
# DataFrame and get a DataFrame back (the reference only PARSES SPARQL;
# execution is this engine's differentiator). Quick start:
#
#     from mentor_rdf_parsers_spark import execute, extract_triples, split_extract
#     triples, errors = split_extract(extract_triples(docs))
#     execute("SELECT ?s ?o WHERE { ?s <http://ex/p> ?o }", triples).show()
#
from .operators.extract import extract_triples, split_extract  # noqa: E402
from .sparql import (  # noqa: E402
    SparqlExecutionError,
    SparqlParseError,
    execute,
    execute_update,
    parse_sparql,
)

__all__ = [
    "SparqlExecutionError",
    "SparqlParseError",
    "execute",
    "execute_update",
    "extract_triples",
    "parse_sparql",
    "split_extract",
]
