"""PySpark-native knowledge-graph construction engine.

From-scratch re-creation of the query/data-processing capabilities of
faubulous/mentor-rdf-parsers (reference at /root/reference, studied for
behavior only) as a distributed Spark dataflow:
extract -> link -> canonicalize -> materialize.
"""

__version__ = "0.1.0"
