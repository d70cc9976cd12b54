"""Turtle reader: load the reference's shipped ``.ttl`` artifacts (graph
dumps under ``graph_data/`` and the ``code-ontology.owl`` TBox, which is
Turtle syntax despite its extension) into the triple-table shape.

The reference saves and loads its graph as Turtle via rdflib
(/root/reference/src/graph/graph_store.py:479-543, :522-543); rdflib is
not in this container, so this is a self-written recursive-descent parser
for the Turtle subset those artifacts (and common serializers) emit:
@prefix/@base + SPARQL-style PREFIX/BASE, IRIs, prefixed names, the ``a``
keyword, ``;``/``,`` predicate-object lists, nested anonymous bnode
property lists ``[ ... ]``, labeled bnodes, string literals (single/double
quoted and long-quoted) with language tags and ``^^`` datatypes, numeric
and boolean literals, and comments.

Scale note: Turtle is DOCUMENT-scoped — the prefix block at the top binds
the whole file, so a single ``.ttl`` file cannot be split across tasks.
``read_turtle`` therefore parallelizes per FILE (binaryFile scan →
mapInPandas, one document per row); that is the honest ceiling for this
format. For splittable, any-scale interchange use rdfio.write_ntriples /
read_ntriples — this reader exists for interop with the reference's
shipped artifacts, which are small per-codebase dumps.

RDF 1.1 note: a plain string literal and one typed ``^^xsd:string`` are
the same term; both map to dtype 'string' (the reference's dumps type
strings explicitly, our N-Triples export writes them plain — equal under
RDF 1.1 semantics, and the histogram tests compare on this mapping).
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .rdfio import PREFIXES, nt_unescape_full
from .schemas import TRIPLE_SCHEMA

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_XSD = "http://www.w3.org/2001/XMLSchema#"

_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+|\#[^\n]*)
    | (?P<IRI><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<STR3>\"\"\"(?:[^"\\]|\\.|"(?!")|""(?!"))*\"\"\"
              |'''(?:[^'\\]|\\.|'(?!')|''(?!'))*''')
    | (?P<STR>"(?:[^"\\\n\r]|\\.)*"|'(?:[^'\\\n\r]|\\.)*')
    | (?P<DIRECTIVE>@prefix\b|@base\b|(?i:PREFIX)(?=\s)|(?i:BASE)(?=\s))
    | (?P<LANG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<DTYPE>\^\^)
    | (?P<BNODE>_:[A-Za-z0-9][A-Za-z0-9_.\-]*)
    | (?P<BOOL>\b(?:true|false)\b)
    | (?P<KW_A>\ba\b)
    | (?P<NUM>[+-]?(?:\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?
                   |\d+[eE][+-]?\d+|\d+))
    | (?P<PUNCT>[.;,\[\]()])
    | (?P<PNAME>[A-Za-z][A-Za-z0-9_.\-]*:[A-Za-z0-9_\-.%]*|:[A-Za-z0-9_\-.%]*)
    """,
    re.VERBOSE,
)

# contraction map shared with rdfio so exported/imported graphs agree
_NS_TO_PFX = {ns: pfx for pfx, ns in PREFIXES.items()}


def _contract(iri: str) -> str:
    for ns, pfx in _NS_TO_PFX.items():
        if iri.startswith(ns):
            return f"{pfx}:{iri[len(ns):]}"
    return iri


class TurtleSyntaxError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos, n = 0, len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            snippet = text[pos : pos + 40]
            raise TurtleSyntaxError(f"unrecognized Turtle at offset {pos}: {snippet!r}")
        kind = m.lastgroup
        val = m.group()
        pos = m.end()
        if kind == "WS":
            continue
        if kind == "PNAME" and val.endswith(".") and not val.endswith(".."):
            # statement-final dot glued to a prefixed name ("code:x.")
            val = val[:-1]
            toks.append((kind, val))
            toks.append(("PUNCT", "."))
            continue
        if kind == "DIRECTIVE":
            val = val.strip()
        toks.append((kind, val))
    toks.append(("EOF", ""))
    return toks


class _Parser:
    """One Turtle document → list of (subj, pred, obj, is_uri, dtype)
    rows in the internal contracted-IRI convention (emit.py's shape:
    ``code:``/``rdf:`` prefixed names, bnodes as ``_:b<md5>``, dtype one
    of uri|bnode|string|integer|boolean|anyURI|decimal|double|<other
    xsd local name>)."""

    # Bounds recursive descent through nested [ ... ] / ( ... ) terms so
    # an adversarial document raises a typed TurtleSyntaxError instead of
    # RecursionError (which would escape the except clause a caller
    # naturally writes and blow the executor's Python stack). Real
    # serializer output nests a handful of levels; 100 is generous and
    # keeps the ~5-frames-per-level descent well inside Python's default
    # 1000-frame recursion limit.
    MAX_DEPTH = 100

    def __init__(self, text: str, bnode_seed: str = ""):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.bnode_seed = bnode_seed
        self.anon_n = 0
        self.depth = 0
        self.rows: list[tuple[str, str, str, bool, str]] = []

    # --- token helpers ---------------------------------------------------
    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise TurtleSyntaxError(f"expected {kind} {val or ''}, got {k} {v!r}")
        return v

    # --- term helpers ----------------------------------------------------
    def _resolve_iri(self, raw: str) -> str:
        iri = nt_unescape_full(raw[1:-1])
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            iri = self.base + iri
        return _contract(iri)

    def _resolve_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise TurtleSyntaxError(f"undeclared prefix {pfx!r} in {pname!r}")
        return _contract(self.prefixes[pfx] + local)

    def _bnode_label(self, label: str) -> str:
        h = hashlib.md5(f"{self.bnode_seed}|{label}".encode()).hexdigest()
        return f"_:b{h}"

    def _fresh_bnode(self) -> str:
        self.anon_n += 1
        return self._bnode_label(f"anon#{self.anon_n}")

    # --- grammar ---------------------------------------------------------
    def parse(self) -> list[tuple[str, str, str, bool, str]]:
        while True:
            k, v = self.peek()
            if k == "EOF":
                return self.rows
            if k == "DIRECTIVE":
                self._directive()
            else:
                self._triples_stmt()

    def _directive(self) -> None:
        _, v = self.next()
        sparql_style = not v.startswith("@")
        if v.lower().lstrip("@").startswith("prefix"):
            pname = self.expect("PNAME")
            if not pname.endswith(":"):
                raise TurtleSyntaxError(f"bad prefix declaration {pname!r}")
            iri = self.expect("IRI")
            self.prefixes[pname[:-1]] = nt_unescape_full(iri[1:-1])
        else:
            iri = self.expect("IRI")
            self.base = nt_unescape_full(iri[1:-1])
        if not sparql_style:
            self.expect("PUNCT", ".")

    def _triples_stmt(self) -> None:
        k, v = self.peek()
        if k == "PUNCT" and v == "[":
            subj = self._bnode_property_list()
            # a bare "[ ... ] ." statement is legal; a following
            # predicate-object list is too
            if self.peek() != ("PUNCT", "."):
                self._predicate_object_list(subj)
        else:
            subj = self._subject()
            self._predicate_object_list(subj)
        self.expect("PUNCT", ".")

    def _subject(self) -> str:
        k, v = self.next()
        if k == "IRI":
            return self._resolve_iri(v)
        if k == "PNAME":
            return self._resolve_pname(v)
        if k == "BNODE":
            return self._bnode_label(v)
        raise TurtleSyntaxError(f"bad subject token {k} {v!r}")

    def _predicate_object_list(self, subj: str) -> None:
        while True:
            k, v = self.peek()
            if k == "KW_A":
                self.next()
                pred = _contract(_RDF_TYPE)
            elif k == "IRI":
                self.next()
                pred = self._resolve_iri(v)
            elif k == "PNAME":
                self.next()
                pred = self._resolve_pname(v)
            else:
                raise TurtleSyntaxError(f"bad predicate token {k} {v!r}")
            self._object_list(subj, pred)
            if self.peek() == ("PUNCT", ";"):
                self.next()
                # trailing ';' before '.' / ']' is legal Turtle
                if self.peek()[0] in ("PUNCT",) and self.peek()[1] in (".", "]"):
                    return
                continue
            return

    def _object_list(self, subj: str, pred: str) -> None:
        while True:
            obj, is_uri, dtype = self._object()
            self.rows.append((subj, pred, obj, is_uri, dtype))
            if self.peek() == ("PUNCT", ","):
                self.next()
                continue
            return

    def _object(self) -> tuple[str, bool, str]:
        k, v = self.next()
        if k == "IRI":
            return self._resolve_iri(v), True, "uri"
        if k == "PNAME":
            return self._resolve_pname(v), True, "uri"
        if k == "BNODE":
            return self._bnode_label(v), False, "bnode"
        if k == "PUNCT" and v == "[":
            self.i -= 1
            return self._bnode_property_list(), False, "bnode"
        if k == "PUNCT" and v == "(":
            return self._collection()
        if k == "BOOL":
            return v, False, "boolean"
        if k == "NUM":
            if re.fullmatch(r"[+-]?\d+", v):
                return v, False, "integer"
            return v, False, ("double" if "e" in v.lower() else "decimal")
        if k in ("STR", "STR3"):
            body = v[3:-3] if k == "STR3" else v[1:-1]
            lex = nt_unescape_full(body)
            nk, nv = self.peek()
            if nk == "LANG":
                self.next()  # language tag kept only as plain string
                return lex, False, "string"
            if nk == "DTYPE":
                self.next()
                dk, dv = self.next()
                if dk == "IRI":
                    dt_iri = nt_unescape_full(dv[1:-1])
                elif dk == "PNAME":
                    pfx, _, local = dv.partition(":")
                    if pfx not in self.prefixes:
                        raise TurtleSyntaxError(f"undeclared prefix in datatype {dv!r}")
                    dt_iri = self.prefixes[pfx] + local
                else:
                    raise TurtleSyntaxError(f"bad datatype token {dk} {dv!r}")
                if dt_iri == _XSD + "string":
                    return lex, False, "string"
                if dt_iri.startswith(_XSD):
                    return lex, False, dt_iri[len(_XSD) :]
                return lex, False, _contract(dt_iri)
            return lex, False, "string"
        raise TurtleSyntaxError(f"bad object token {k} {v!r}")

    def _collection(self) -> tuple[str, bool, str]:
        """RDF collection ``( o1 o2 ... )`` → rdf:first/rdf:rest bnode
        chain ending in rdf:nil (the ontology file uses these in
        owl:unionOf range declarations). '(' is already consumed.
        Returns the head term: a bnode, or rdf:nil for ``()``."""
        self.depth += 1
        if self.depth > self.MAX_DEPTH:
            raise TurtleSyntaxError(f"nesting deeper than {self.MAX_DEPTH}")
        items: list[tuple[str, bool, str]] = []
        while self.peek() != ("PUNCT", ")"):
            if self.peek()[0] == "EOF":
                raise TurtleSyntaxError("unterminated collection")
            items.append(self._object())
        self.next()  # ')'
        self.depth -= 1
        if not items:
            return "rdf:nil", True, "uri"
        head = prev = self._fresh_bnode()
        for idx, (obj, is_uri, dtype) in enumerate(items):
            self.rows.append((prev, "rdf:first", obj, is_uri, dtype))
            if idx == len(items) - 1:
                self.rows.append((prev, "rdf:rest", "rdf:nil", True, "uri"))
            else:
                nxt = self._fresh_bnode()
                self.rows.append((prev, "rdf:rest", nxt, False, "bnode"))
                prev = nxt
        return head, False, "bnode"

    def _bnode_property_list(self) -> str:
        self.depth += 1
        if self.depth > self.MAX_DEPTH:
            raise TurtleSyntaxError(f"nesting deeper than {self.MAX_DEPTH}")
        self.expect("PUNCT", "[")
        node = self._fresh_bnode()
        if self.peek() != ("PUNCT", "]"):
            self._predicate_object_list(node)
        self.expect("PUNCT", "]")
        self.depth -= 1
        return node


def parse_turtle(text: str, bnode_seed: str = "") -> list[tuple[str, str, str, bool, str]]:
    """Parse one Turtle document into (subj, pred, obj, is_uri, dtype)
    rows. ``bnode_seed`` (typically the file path) namespaces bnode ids
    so documents parsed into one table cannot collide labels."""
    return _Parser(text, bnode_seed=bnode_seed).parse()


def read_turtle(
    spark: SparkSession, path: str, repo: str | None = None
) -> DataFrame:
    """Distributed Turtle ingest: every ``.ttl``/``.owl`` file under
    ``path`` parses as one mapInPandas row (Turtle's document-level
    prefix block forbids intra-file splits — see module docstring), so
    parallelism is the file count: right for the reference's
    one-dump-per-codebase layout, and the reason any-scale interchange
    goes through N-Triples instead.

    ``repo`` defaults to the ``repo=<name>`` directory component when
    present (write_turtle's layout), else each file's basename without
    extension (the reference names dumps ``knowledge_graph_<ts>.ttl``
    per codebase, graph_store.py:489-495). Returns TRIPLE_SCHEMA shape.
    """
    import pandas as pd

    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.{ttl,owl}")
        .load(path)
        .select("path", "content")
    )

    fixed_repo = repo

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["repo", "subj", "pred", "obj", "is_uri", "dtype"]
        for pdf in batches:
            out: list[tuple] = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                name = fixed_repo
                if name is None:
                    m = re.search(r"/repo=([^/]+)/", fpath)
                    if m:
                        name = m.group(1)
                    else:
                        name = re.sub(r"\.(ttl|owl)$", "", fpath.rsplit("/", 1)[-1])
                text = bytes(blob).decode("utf-8", errors="replace")
                for s, p, o, is_uri, dt in parse_turtle(text, bnode_seed=fpath):
                    out.append((name, s, p, o, is_uri, dt))
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(gen, schema=TRIPLE_SCHEMA)


def write_turtle(
    triples: DataFrame, path: str, write_metadata: bool = True
) -> None:
    """Distributed Turtle export — the reference's default save format
    (graph_store.py:479-520 serializes with rdflib format='turtle' and
    writes a sibling metadata JSON with the triple count).

    One ``.ttl`` document per repo under ``<path>/repo=<name>/``: an
    ``@prefix`` header followed by one statement per line. Statement
    lines are the N-Triples rendering — N-Triples is a syntactic subset
    of Turtle, so the document is valid Turtle that rdflib (and
    ``read_turtle``) parse directly, while staying fully distributed:
    no driver-side serialization, each repo written by the task that
    owns its hash. Prefixed-name compaction is deliberately NOT applied
    to terms — entity URIs embed ``/``, ``#`` and ``:`` (SURVEY §1.3
    minting), which PN_LOCAL forbids unescaped, and escaping them buys
    bytes at the cost of a second dialect to test.

    ``write_metadata`` adds ``<path>/metadata.json`` (per-repo and total
    triple counts — the reference's ``.metadata.json`` twin; one small
    aggregate collect, scale-safe)."""
    import json

    from .rdfio import nt_lines

    header = [(pfx, ns) for pfx, ns in sorted(PREFIXES.items())]
    spark = triples.sparkSession
    repos = triples.select("repo").distinct()
    head_df = repos.crossJoin(
        spark.createDataFrame(
            [(i, f"@prefix {p}: <{ns}> .") for i, (p, ns) in enumerate(header)],
            "hord int, line string",
        )
    ).select("repo", F.col("hord").alias("ord"), "line")
    body = nt_lines(triples).select(
        "repo", F.lit(len(header)).alias("ord"), "line"
    )
    (
        head_df.unionByName(body)
        .repartition("repo")
        .sortWithinPartitions("repo", "ord")
        .select("repo", "line")
        .write.partitionBy("repo")
        .mode("overwrite")
        .text(path)
    )
    # the text writer names shards part-*.txt; rename to .ttl so the
    # layout reads as what it is and read_turtle's *.ttl glob matches.
    # Hadoop FS API (not os.rename): works on hdfs://s3a:// targets too;
    # one rename per shard = one per repo, driver cost O(#repos)
    jvm = triples.sparkSession._jvm
    hconf = triples.sparkSession._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    for st in fs.globStatus(jvm.org.apache.hadoop.fs.Path(f"{path}/repo=*/part-*.txt")):
        src = st.getPath()
        dst = jvm.org.apache.hadoop.fs.Path(
            src.getParent(), src.getName()[: -len(".txt")] + ".ttl"
        )
        fs.rename(src, dst)
    if write_metadata:
        counts = {
            r["repo"]: r["n"]
            for r in triples.groupBy("repo").agg(F.count("*").alias("n")).collect()
        }
        meta = {
            "format": "turtle",
            "triples_count": sum(counts.values()),
            "repos": counts,
        }
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/metadata.json")
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        out = fs.create(p, True)
        out.write(bytearray(json.dumps(meta, indent=1).encode()))
        out.close()


def load_ontology(
    spark: SparkSession,
    path: str = "/root/reference/ontologies/code-ontology.owl",
    repo: str = "__ontology__",
) -> DataFrame:
    """TBox preload: parse the code-ontology vocabulary (Turtle-syntax
    ``.owl``, 16 owl:Class + object/data property declarations) into
    triple rows unionable with instance triples — the optional preload
    the reference supports but ships off by default
    (/root/reference/src/graph/ontology_builder.py:44-57; processor.py:109
    never passes a path, so graphs are instance-only unless the caller
    opts in, mirrored here by this being a separate call).

    Driver-side parse: the ontology is a single tiny document (591
    lines); there is nothing to distribute."""
    with open(path, "rb") as f:
        text = f.read().decode("utf-8", errors="replace")
    rows = [
        (repo, s, p, o, u, d)
        for s, p, o, u, d in parse_turtle(text, bnode_seed=path)
    ]
    return spark.createDataFrame(rows, schema=TRIPLE_SCHEMA)
