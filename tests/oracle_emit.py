"""Test-side oracle: an INDEPENDENT lowering of entity rows to triples.

Written separately from codeontology_spark.emit (different code path:
per-entity Python loops instead of Catalyst projections) so the Spark
emission plumbing — array construction, explodes, unions, skolemization —
is checked against a second implementation of the same reference semantics
(/root/reference/src/graph/ontology_builder.py:59-368). Bnode ids here are
per-call counters, NOT the engine's skolem scheme, so equality must go
through compare.canonicalize.
"""

from __future__ import annotations

from codeontology_spark.jsparse import Ent


def oracle_triples(path: str, ents: list[Ent]) -> list[tuple]:
    out: list[tuple] = []
    n_b = [0]

    def bnode() -> str:
        n_b[0] += 1
        return f"_:oracle|{path}|{n_b[0]}"  # path-scoped: ids must not
        # collide across files or canonicalize() would merge clusters

    def add(s, p, o, is_uri=False, dtype="string"):
        out.append((s, p, str(o), is_uri, dtype))

    def boolean(s, p, v):
        add(s, p, "true" if v else "false", False, "boolean")

    def location(s, e, with_path=True):
        b = bnode()
        add(s, "code:locatedAt", b, False, "bnode")
        add(b, "rdf:type", "code:SourceLocation", True, "uri")
        add(b, "code:filePath", path)
        add(b, "code:lineNumber", e.line, False, "integer")
        add(b, "code:columnNumber", e.col, False, "integer")
        if e.end_line:
            add(b, "code:endLineNumber", e.end_line, False, "integer")
        if e.end_col:
            add(b, "code:endColumnNumber", e.end_col, False, "integer")

    def basics(e):
        add(e.uri, "code:hasName", e.name)
        add(e.uri, "code:hasURI", e.uri, False, "anyURI")
        if e.docstring:
            add(e.uri, "code:hasDocstring", e.docstring)
        if e.body_hash:
            add(e.uri, "code:hasBodyHash", e.body_hash)
        location(e.uri, e)
        for c in e.comments:
            b = bnode()
            add(e.uri, "code:hasComment", b, False, "bnode")
            add(b, "code:commentText", c)

    uris = {e.uri for e in ents}
    for e in ents:
        basics(e)
        if e.kind == "module":
            add(e.uri, "rdf:type", "code:Module", True, "uri")
            add(e.uri, "code:moduleType", e.module_type or "commonjs")
        elif e.kind in ("function", "method"):
            # isinstance-order flattening: methods emit as plain Function
            add(e.uri, "rdf:type", "code:Function", True, "uri")
            boolean(e.uri, "code:isAsync", e.is_async)
            boolean(e.uri, "code:isGenerator", e.is_generator)
            boolean(e.uri, "code:isArrowFunction", e.is_arrow)
            boolean(e.uri, "code:isExported", e.is_exported)
            boolean(e.uri, "code:isDefaultExport", e.is_default_export)
            add(e.uri, "code:hasScope", e.scope or "global")
        elif e.kind == "class":
            add(e.uri, "rdf:type", "code:Class", True, "uri")
            boolean(e.uri, "code:isAbstract", False)
            boolean(e.uri, "code:isExported", e.is_exported)
            boolean(e.uri, "code:isDefaultExport", e.is_default_export)
        elif e.kind == "interface":
            add(e.uri, "rdf:type", "code:Interface", True, "uri")
            boolean(e.uri, "code:isExported", e.is_exported)
        elif e.kind == "variable":
            add(e.uri, "rdf:type", "code:Variable", True, "uri")
            boolean(e.uri, "code:isConst", e.is_const)
            boolean(e.uri, "code:isLet", e.is_let)
            boolean(e.uri, "code:isVar", e.is_var)
            add(e.uri, "code:hasScope", e.scope or "global")
            if e.init_value:
                add(e.uri, "code:initializationValue", e.init_value)
        elif e.kind == "parameter":
            add(e.uri, "rdf:type", "code:Parameter", True, "uri")
            # second basic-properties pass: duplicate literals collapse
            # (set), second location bnode survives
            location(e.uri, e)
            boolean(e.uri, "code:isRestParameter", e.is_rest)
            boolean(e.uri, "code:isOptional", False)
        elif e.kind == "import":
            add(e.uri, "rdf:type", "code:Import", True, "uri")
            add(e.uri, "code:modulePath", e.module_path)
            add(e.uri, "code:importType", e.import_type or "named")
            boolean(e.uri, "code:isTypeOnly", False)
            for sym in e.imported_symbols:
                add(e.uri, "code:importsSymbol", sym)
        elif e.kind == "export":
            add(e.uri, "rdf:type", "code:Export", True, "uri")
            add(e.uri, "code:exportType", e.export_type or "named")
            boolean(e.uri, "code:isReExport", False)
        elif e.kind == "call":
            add(e.uri, "rdf:type", "code:CallExpression", True, "uri")
            add(e.uri, "code:callsFunction", e.callee_name)
            boolean(e.uri, "code:isMethodCall", e.is_method_call)
            for i, arg in enumerate(e.arguments):
                b = bnode()
                add(e.uri, "code:hasArgument", b, False, "bnode")
                add(b, "code:argumentPosition", i, False, "integer")
                add(b, "code:argumentValue", arg)

    # relationships, second pass (set semantics via dedup at the end)
    for e in ents:
        if e.kind in ("function", "method"):
            for c in e.calls:
                if c in uris:
                    add(e.uri, "code:calls", c, True, "uri")
                    add(c, "code:calledBy", e.uri, True, "uri")
        if e.kind == "class":
            for m in e.methods:
                if m in uris:
                    add(e.uri, "code:hasMethod", m, True, "uri")
                    add(m, "code:memberOf", e.uri, True, "uri")
            if e.extends_name and e.extends_name in uris:
                add(e.uri, "code:extends", e.extends_name, True, "uri")
        if e.kind == "module":
            for d in list(e.functions) + list(e.classes):
                if d in uris:
                    add(e.uri, "code:defines", d, True, "uri")
                    add(d, "code:declaredIn", e.uri, True, "uri")
            for x in e.exports:
                if x in uris:
                    add(e.uri, "code:exports", x, True, "uri")
            for m in e.imports:
                add(e.uri, "code:imports", m, True, "uri")
        if e.kind == "call":
            if e.caller_uri and e.caller_uri in uris:
                add(e.uri, "code:madeBy", e.caller_uri, True, "uri")
            if e.callee_uri and e.callee_uri in uris:
                add(e.uri, "code:callsFunction", e.callee_uri, True, "uri")
                add(e.callee_uri, "code:calledAt", e.uri, True, "uri")

    # rdflib Graph set semantics — but bnode rows are all distinct by id,
    # so plain dedup on ground rows is enough
    seen = set()
    deduped = []
    for t in out:
        if t[4] == "bnode" or t[0].startswith("_:"):
            deduped.append(t)
            continue
        if t not in seen:
            seen.add(t)
            deduped.append(t)
    return deduped
