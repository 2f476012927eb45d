"""rdfcmap_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Reproduces the query/data-processing semantics of Osthus-Technology/rdfcmap
(CXL concept maps -> RDF triples, reference at /root/reference) re-expressed
Spark-first: triple extraction, entity linking, canonicalization and graph
materialization over tables of multi-turn conversation transcripts, as pure
DataFrame ops plus vectorized Arrow UDFs.

Nothing here is a port of the reference's Jena-based single-JVM execution;
citations in docstrings are `path:line` into /root/reference for semantic
parity only.
"""

__version__ = "0.1.0"
