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
    # TBox vocabularies: instance triples never use these, but ontology
    # preload (turtle.load_ontology, mirroring ontology_builder.py:44-57)
    # unions owl/rdfs declarations into the same table, and export/import
    # must round-trip them. No namespace here is a prefix of another, so
    # the chained contract/expand whens are order-independent.
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
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


_CHAR_ESCAPES = {
    "\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
    "'": "'",
}


def nt_unescape_full(s: str) -> str:
    """Left-to-right N-Triples string unescape including \\uXXXX /
    \\UXXXXXXXX numeric escapes (rdflib and most serializers emit them
    for non-ASCII; the codegen _unescape_lit path covers only the
    round-trip escapes this module writes — ADVICE r4). Lenient on
    malformed escapes: bad hex, lone surrogates (unencodable in UTF-8 /
    Arrow), and out-of-range code points keep their raw escape text so
    one bad literal never fails a distributed read."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "\\" or i + 1 >= n:
            out.append(c)
            i += 1
            continue
        e = s[i + 1]
        width = 6 if e == "u" else 10 if e == "U" else 0
        if width and i + width <= n:
            hexpart = s[i + 2 : i + width]
            try:
                cp = int(hexpart, 16)
                if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
                    raise ValueError
                out.append(chr(cp))
                i += width
                continue
            except ValueError:
                pass
        if e in _CHAR_ESCAPES:
            out.append(_CHAR_ESCAPES[e])
            i += 2
        else:  # lone backslash before an unknown char: keep raw
            out.append(c)
            i += 1
    return "".join(out)


def _pd_nt_unescape():
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def unescape(col):
        return col.map(lambda s: None if s is None else nt_unescape_full(s))

    return unescape


def nt_lines(triples: DataFrame) -> DataFrame:
    """(repo, line) — one N-Triples line per triple row, pure codegen."""
    subj = _term_subj(F.col("subj"))
    pred = F.concat(F.lit("<"), _expand_iri(F.col("pred")), F.lit(">"))
    lit = F.concat(F.lit('"'), _escape_lit(F.col("obj")), F.lit('"'))
    typed = {
        dt: F.concat(lit, F.lit(f'^^<{_XSD}{dt}>'))
        for dt in ("integer", "boolean", "anyURI", "decimal", "double")
    }
    obj = F.when(
        F.col("dtype") == "bnode", F.concat(F.lit("_:b"), F.md5(F.col("obj")))
    ).when(F.col("is_uri"), F.concat(F.lit("<"), _expand_iri(F.col("obj")), F.lit(">")))
    for dt, expr in typed.items():
        obj = obj.when(F.col("dtype") == dt, expr)
    obj = obj.otherwise(lit)
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
    # literals carrying \uXXXX-style escapes (rdflib output, never our own
    # round-trip) route through a full Python unescaper; the UDF input is
    # MASKED to null for every other row, so the Arrow transfer is a null
    # column and the common path stays pure codegen. The rlike also hits
    # escaped-backslash-then-u ("\\\\u…") — a false positive that is still
    # decoded correctly because the Python pass parses left-to-right.
    needs_py = lit_body.rlike(r"\\[uU]")
    lit_unescaped = F.coalesce(
        _pd_nt_unescape()(F.when(needs_py, lit_body)), _unescape_lit(lit_body)
    )
    obj = (
        F.when(is_obj_iri, _contract_iri(F.regexp_extract(o, r"^<(.*)>$", 1)))
        .when(is_obj_bnode, o)
        .otherwise(lit_unescaped)
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
