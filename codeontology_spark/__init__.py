"""codeontology_spark — a PySpark-native code-to-knowledge-graph engine.

Reimplements the query and data-processing capabilities of the reference
CodeOntology pipeline (code → AST entities → (subj, pred, obj) triples →
graph queries) as declarative Spark DataFrame plans:

- per-file structural extraction runs inside Arrow-batched ``mapInPandas``
  (embarrassingly parallel, no driver-side loops);
- triple emission is a union of JVM-side column projections (no Python in
  the hot path);
- the reference's SPARQL template catalog becomes DataFrame/Spark SQL plans
  (broadcast joins, anti-joins, hash aggregates, iterative frontier joins
  for transitive closure);
- incremental maintenance is content-hash anti-joins plus per-partition
  lineage rows for checkpoint resume.

Blueprint: /root/repo/SURVEY.md. Reference cited per-function as file:line
into /root/reference (semantics only — no code is derived from it).
"""

__version__ = "0.1.0"

CODE = "http://codeontology.org/"
CODEBASE = "http://codebase.local/"
RDF_TYPE = "rdf:type"
