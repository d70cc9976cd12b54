"""RDF interchange: distributed N-Triples export/import for the triple
table.

The reference persists its graph as Turtle via a single-process rdflib
serializer (/root/reference/src/graph/graph_store.py:479-543). Turtle's
document-level prefix block makes it awkward to shard; N-Triples is the
line-oriented member of the same family — one triple per line, fully
parallel to write and to parse — so the export stays distributed at any
scale (`df.write.text`, one shard per task) and any rdflib-based
consumer can load the result (rdflib parses .nt natively).

Skolem bnode ids (``_:tag|owner-uri``, emit._bnode) contain characters
N-Triples bnode labels forbid, so they are relabeled ``_:b<md5(id)>`` —
deterministic, so the relabeling is a bijection and the exported graph
is structurally identical; round-trip tests reproduce the mapping
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PREFIXES = {
    # graph_store.py:59-60 / ontology_builder.py:31-32
    "code": "http://codeontology.org/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
}
_XSD = "http://www.w3.org/2001/XMLSchema#"
# \x00 as the unescape sentinel: absent from source text in practice
_SENTINEL = "\x00"


def _expand_iri(col):
    """code:X / rdf:X → full IRI; already-absolute IRIs pass through."""
    out = col
    for pfx, ns in PREFIXES.items():
        out = F.when(
            col.startswith(f"{pfx}:"),
            F.concat(F.lit(ns), F.substring(col, len(pfx) + 2, 1 << 20)),
        ).otherwise(out)
    return out


def _term_subj(col):
    return F.when(
        col.startswith("_:"), F.concat(F.lit("_:b"), F.md5(col))
    ).otherwise(F.concat(F.lit("<"), _expand_iri(col), F.lit(">")))


def _escape_lit(col):
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    return out


def _unescape_lit(col):
    # chained literal replaces can't parse escapes left-to-right, so park
    # the escaped backslash in a sentinel first (classic two-pass trick)
    out = F.replace(col, F.lit("\\\\"), F.lit(_SENTINEL))
    out = F.replace(out, F.lit('\\"'), F.lit('"'))
    out = F.replace(out, F.lit("\\n"), F.lit("\n"))
    out = F.replace(out, F.lit("\\r"), F.lit("\r"))
    out = F.replace(out, F.lit("\\t"), F.lit("\t"))
    return F.replace(out, F.lit(_SENTINEL), F.lit("\\"))


def nt_lines(triples: DataFrame) -> DataFrame:
    """(repo, line) — one N-Triples line per triple row, pure codegen."""
    subj = _term_subj(F.col("subj"))
    pred = F.concat(F.lit("<"), _expand_iri(F.col("pred")), F.lit(">"))
    lit = F.concat(F.lit('"'), _escape_lit(F.col("obj")), F.lit('"'))
    typed = {
        dt: F.concat(lit, F.lit(f'^^<{_XSD}{dt}>'))
        for dt in ("integer", "boolean", "anyURI")
    }
    obj = (
        F.when(F.col("dtype") == "bnode", F.concat(F.lit("_:b"), F.md5(F.col("obj"))))
        .when(F.col("is_uri"), F.concat(F.lit("<"), _expand_iri(F.col("obj")), F.lit(">")))
        .when(F.col("dtype") == "integer", typed["integer"])
        .when(F.col("dtype") == "boolean", typed["boolean"])
        .when(F.col("dtype") == "anyURI", typed["anyURI"])
        .otherwise(lit)
    )
    return triples.select(
        "repo",
        F.concat_ws(" ", subj, pred, obj).alias("line"),
    ).withColumn("line", F.concat(F.col("line"), F.lit(" .")))


def write_ntriples(triples: DataFrame, path: str) -> None:
    """Distributed .nt export, one directory per repo (partition discovery
    recovers `repo` on read). Each task writes its own shard — no driver
    serialization bottleneck at any graph size."""
    nt_lines(triples).write.partitionBy("repo").mode("overwrite").text(path)


# one regex per N-Triples term shape; parsing is line-local → map-only
_NT_RE = (
    r"^(<[^>]*>|_:\S+) "      # subject
    r"<([^>]*)> "             # predicate
    r"(<[^>]*>|_:\S+|\"(?:[^\"\\]|\\.)*\"(?:\^\^<[^>]*>)?)"  # object
    r" \.$"
)


def _contract_iri(col):
    out = col
    for pfx, ns in PREFIXES.items():
        out = F.when(
            col.startswith(ns), F.concat(F.lit(f"{pfx}:"), F.substring(col, len(ns) + 1, 1 << 20))
        ).otherwise(out)
    return out


def read_ntriples(spark: SparkSession, path: str, strict: bool = False) -> DataFrame:
    """Parse an exported .nt directory back into the triple-table shape.
    Bnode labels come back as the deterministic ``_:b<md5>`` relabeling
    (graph-isomorphic to the original skolem ids). Line parsing is one
    regexp per term — map-only, no Python.

    Lines that don't match the N-Triples grammar are DROPPED by default
    (blank lines, comments, corrupt shards — the crawl-friendly
    contract); with ``strict=True`` the first malformed non-empty,
    non-comment line raises instead."""
    raw = spark.read.text(path)
    if strict:
        bad = raw.filter(
            (F.trim("value") != "")
            & ~F.col("value").startswith("#")
            & ~F.col("value").rlike(_NT_RE)
        )
        sample = bad.limit(1).collect()
        if sample:
            raise ValueError(f"malformed N-Triples line: {sample[0].value[:200]!r}")
    s = F.regexp_extract("value", _NT_RE, 1)
    p = F.regexp_extract("value", _NT_RE, 2)
    o = F.regexp_extract("value", _NT_RE, 3)
    is_obj_iri = o.startswith("<")
    is_obj_bnode = o.startswith("_:")
    dt_match = F.regexp_extract(o, r"\^\^<" + _XSD + r"([A-Za-z]+)>$", 1)
    lit_body = F.regexp_extract(o, r'^"((?:[^"\\]|\\.)*)"', 1)
    subj = F.when(s.startswith("_:"), s).otherwise(
        _contract_iri(F.regexp_extract(s, r"^<(.*)>$", 1))
    )
    obj = (
        F.when(is_obj_iri, _contract_iri(F.regexp_extract(o, r"^<(.*)>$", 1)))
        .when(is_obj_bnode, o)
        .otherwise(_unescape_lit(lit_body))
    )
    dtype = (
        F.when(is_obj_bnode, F.lit("bnode"))
        .when(is_obj_iri, F.lit("uri"))
        .when(dt_match != "", dt_match)
        .otherwise(F.lit("string"))
    )
    out = raw.filter(F.col("value").rlike(_NT_RE)).select(
        F.col("repo") if "repo" in raw.columns else F.lit("").alias("repo"),
        subj.alias("subj"),
        _contract_iri(p).alias("pred"),
        obj.alias("obj"),
        is_obj_iri.alias("is_uri"),
        dtype.alias("dtype"),
    )
    return out
