"""Execute the reference implementation (read-only at /root/reference) to
produce EXECUTED ground truth — not a re-lowering of our own parse.

Two dependency gaps are bridged with minimal stand-ins, neither of which
replaces reference logic:

- ``tree_sitter`` / ``tree_sitter_languages`` are absent in this sandbox,
  so ``ASTParser`` takes its regex-fallback path (ast_parser.py:76-121,
  139-305), which is pure ``re`` + pydantic and runs verbatim. The
  ``tree_sitter`` stub below only satisfies the module-level import; the
  fallback never touches it.
- ``rdflib`` is absent, so a ~70-line shim (Graph/Namespace/Literal/
  URIRef/BNode + RDF/RDFS/XSD/OWL namespaces) records triples;
  ``OntologyBuilder.add_entities`` (ontology_builder.py:59-368) executes
  verbatim on top of it.

`builder_triples(entities)` therefore IS the reference emitter running,
and `reference_parse(files)` IS the reference parser running (fallback
path). Both feed pytest comparisons against the engine.
"""

from __future__ import annotations

import os
import pathlib
import sys
import tempfile
import types

REF = "/root/reference"
CODE_NS = "http://codeontology.org/"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"


class ShimURIRef(str):
    pass


class ShimBNode(str):
    _n = [0]

    def __new__(cls, value: str | None = None):
        if value is None:
            cls._n[0] += 1
            value = f"_:ref{cls._n[0]}"
        return str.__new__(cls, value)


class ShimLiteral(str):
    datatype: str | None

    def __new__(cls, value, datatype=None, lang=None):
        if isinstance(value, bool):
            s = "true" if value else "false"  # rdflib canonical boolean form
        else:
            s = str(value)
        obj = str.__new__(cls, s)
        obj.datatype = datatype
        return obj


class ShimNamespace(str):
    def __getattr__(self, name: str) -> ShimURIRef:
        if name.startswith("__"):
            raise AttributeError(name)
        return ShimURIRef(self + name)

    def __getitem__(self, name: str) -> ShimURIRef:
        return ShimURIRef(self + name)


class ShimGraph:
    def __init__(self, *a, **k):
        self.triples_set: set[tuple] = set()

    def bind(self, *a, **k):
        pass

    def add(self, triple):
        self.triples_set.add(tuple(triple))

    def __iter__(self):
        return iter(self.triples_set)

    def __len__(self):
        return len(self.triples_set)


def _install_stubs() -> None:
    if "tree_sitter" not in sys.modules:
        ts = types.ModuleType("tree_sitter")

        class _NoTreeSitter:
            def __init__(self, *a, **k):
                raise RuntimeError("tree-sitter is not available in this sandbox")

        ts.Parser = _NoTreeSitter
        ts.Language = _NoTreeSitter
        ts.Node = object
        sys.modules["tree_sitter"] = ts
    if "rdflib" not in sys.modules:
        rdflib = types.ModuleType("rdflib")
        rdflib.Graph = ShimGraph
        rdflib.Namespace = ShimNamespace
        rdflib.Literal = ShimLiteral
        rdflib.URIRef = ShimURIRef
        rdflib.BNode = ShimBNode
        ns = types.ModuleType("rdflib.namespace")
        ns.RDF = ShimNamespace(RDF_NS)
        ns.RDFS = ShimNamespace(RDFS_NS)
        ns.XSD = ShimNamespace(XSD_NS)
        ns.OWL = ShimNamespace(OWL_NS)
        rdflib.namespace = ns
        sys.modules["rdflib"] = rdflib
        sys.modules["rdflib.namespace"] = ns


_REF_MODULES: dict = {}


# Content pins for the executed reference files (ADVICE r2): this harness
# runs third-party code in-process; a silently-changed reference tree must
# fail loudly here instead of executing unreviewed new code.
_REF_SHA256 = {
    "src/parsers/ast_parser.py":
        "d3f330a87c21359670f680563ab40c39b5260d22dc74c02973eec47a494ee965",
    "src/graph/ontology_builder.py":
        "febcb70f920f057905368d9a5ccfba6c547ee36ba9f5e8f587b77d0641ba302d",
    "src/models/code_entities.py":
        "fd307ef68056f5a9fd9d14d873d2c35e61e021ce92364ab3381f1873fc93043f",
}


def _pin_reference_files() -> None:
    import hashlib

    for rel, want in _REF_SHA256.items():
        got = hashlib.sha256(pathlib.Path(REF, rel).read_bytes()).hexdigest()
        if got != want:
            raise RuntimeError(
                f"refusing to execute changed reference file {rel}: "
                f"sha256 {got} != pinned {want}"
            )


def load_reference():
    """Import the reference's parser + emitter modules (read-only),
    content-pinned by sha256 before any code executes."""
    if _REF_MODULES:
        return _REF_MODULES
    _pin_reference_files()
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import src.graph.ontology_builder as ob  # noqa: PLC0415
    import src.models.code_entities as ce  # noqa: PLC0415
    import src.parsers.ast_parser as ap  # noqa: PLC0415

    _REF_MODULES.update({"ast_parser": ap, "ontology_builder": ob, "code_entities": ce})
    return _REF_MODULES


def _prefixed(u: str) -> str:
    if u.startswith(CODE_NS):
        return "code:" + u[len(CODE_NS):]
    if u.startswith(RDF_NS):
        return "rdf:" + u[len(RDF_NS):]
    return u


def graph_to_rows(graph: ShimGraph) -> list[tuple]:
    """Shim triples → the engine's (subj, pred, obj, is_uri, dtype) rows."""
    rows = []
    for s, p, o in graph:
        subj = _prefixed(str(s))
        pred = _prefixed(str(p))
        if isinstance(o, ShimBNode):
            rows.append((subj, pred, str(o), False, "bnode"))
        elif isinstance(o, ShimLiteral):
            dt = o.datatype
            dtype = str(dt).rsplit("#", 1)[-1] if dt else "string"
            rows.append((subj, pred, str(o), False, dtype))
        else:  # URIRef (check last: Literal/BNode are str subclasses too)
            rows.append((subj, pred, _prefixed(str(o)), True, "uri"))
    return rows


def builder_triples(entities: list) -> list[tuple]:
    """Run the reference OntologyBuilder on pydantic entities → rows."""
    ref = load_reference()
    builder = ref["ontology_builder"].OntologyBuilder()
    builder.add_entities(entities)
    return graph_to_rows(builder.graph)


def reference_parse(files: dict[str, str]) -> dict[str, list]:
    """Run the reference ASTParser (regex-fallback path) on a file dict
    {relative_path: content}; paths are passed relative so minted URIs use
    repo-relative paths like the engine's."""
    ref = load_reference()
    parser = ref["ast_parser"].ASTParser()
    assert parser.use_fallback, "expected the regex-fallback path in-sandbox"
    out: dict[str, list] = {}
    with tempfile.TemporaryDirectory() as td:
        old = os.getcwd()
        os.chdir(td)
        try:
            for rel, content in files.items():
                p = pathlib.Path(rel)
                if p.parent != pathlib.Path("."):
                    p.parent.mkdir(parents=True, exist_ok=True)
                p.write_text(content, encoding="utf-8")
            for rel in files:
                _root, ents = parser.parse_file(rel)
                out[rel] = ents
        finally:
            os.chdir(old)
    return out


# ---------------------------------------------------------------------------
# jsparse Ent → reference pydantic entities (URIs re-minted BY the reference)
# ---------------------------------------------------------------------------

def ents_to_pydantic(path: str, ents: list) -> list:
    """Convert the engine's entity rows into the reference's pydantic models
    so the EXECUTED reference emitter can lower them.

    URIs are passed as None so the reference's own `_generate_uri`
    (code_entities.py:43-56) mints them — any divergence from the engine's
    minting surfaces as an assertion here. The parameter quirk is
    reproduced by construction order: parameters are built with an empty
    file_path (URI minted with empty base), then patched to the real path
    (ast_parser.py:441-445), exactly like the reference extractor.
    """
    ref = load_reference()
    ce = ref["code_entities"]

    def loc(e, file_path: str):
        return ce.SourceLocation(
            file_path=file_path,
            line_number=e.line,
            column=e.col,
            end_line=e.end_line,
            end_column=e.end_col,
        )

    out = []
    for e in ents:
        common = dict(
            name=e.name,
            body_hash=e.body_hash,
            docstring=e.docstring,
            comments=list(e.comments),
        )
        if e.kind == "module":
            ent = ce.ModuleEntity(
                location=loc(e, path),
                module_type=e.module_type or "commonjs",
                functions=list(e.functions),
                classes=list(e.classes),
                exports=list(e.exports),
                imports=list(e.imports),
                **common,
            )
        elif e.kind == "function":
            ent = ce.FunctionEntity(
                location=loc(e, path),
                is_async=e.is_async,
                is_generator=e.is_generator,
                is_arrow_function=e.is_arrow,
                is_exported=e.is_exported,
                is_default_export=e.is_default_export,
                scope=e.scope or "global",
                calls=list(e.calls),
                **common,
            )
        elif e.kind == "method":
            ent = ce.MethodEntity(
                location=loc(e, path),
                is_async=e.is_async,
                is_generator=e.is_generator,
                is_exported=e.is_exported,
                is_default_export=e.is_default_export,
                scope=e.scope or "global",
                calls=list(e.calls),
                is_static=e.is_static,
                is_private=e.is_private,
                is_constructor=e.is_constructor,
                parent_class_uri=e.parent_class_uri,
                **common,
            )
        elif e.kind == "class":
            ent = ce.ClassEntity(
                location=loc(e, path),
                methods=list(e.methods),
                extends_class=e.extends_name,
                is_exported=e.is_exported,
                is_default_export=e.is_default_export,
                **common,
            )
        elif e.kind == "interface":
            ent = ce.InterfaceEntity(
                location=loc(e, path),
                is_exported=e.is_exported,
                **common,
            )
        elif e.kind == "variable":
            ent = ce.VariableEntity(
                location=loc(e, path),
                is_const=e.is_const,
                is_let=e.is_let,
                is_var=e.is_var,
                initialization_value=e.init_value,
                scope=e.scope or "global",
                **common,
            )
        elif e.kind == "parameter":
            ent = ce.ParameterEntity(
                location=loc(e, ""),  # URI minted with empty path (quirk)
                is_rest_parameter=e.is_rest,
                **common,
            )
            ent.location.file_path = path  # patched after minting
        elif e.kind == "import":
            ent = ce.ImportEntity(
                location=loc(e, path),
                module_path=e.module_path,
                import_type=e.import_type or "named",
                imported_symbols=list(e.imported_symbols),
                **common,
            )
        elif e.kind == "export":
            ent = ce.ExportEntity(
                location=loc(e, path),
                exported_symbol_uri="",
                export_type=e.export_type or "named",
                **common,
            )
        elif e.kind == "call":
            ent = ce.CallExpressionEntity(
                location=loc(e, path),
                caller_uri=e.caller_uri or "",
                callee_uri=e.callee_uri,
                callee_name=e.callee_name,
                is_method_call=e.is_method_call,
                arguments=list(e.arguments),
                **common,
            )
        else:
            raise ValueError(f"unmapped entity kind: {e.kind}")
        assert ent.uri == e.uri, (
            f"URI minting divergence for {e.kind} {e.name!r}: "
            f"engine={e.uri} reference={ent.uri}"
        )
        out.append(ent)
    return out
