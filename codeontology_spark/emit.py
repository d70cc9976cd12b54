"""Triple emission: entity rows → (subj, pred, obj) triples, all JVM-side.

Reimplements the reference's OntologyBuilder two-pass lowering
(/root/reference/src/graph/ontology_builder.py:59-368) as Catalyst column
expressions: one array-of-structs explode for per-entity property triples
plus a handful of filtered explodes for list-valued properties and
relationship edges. No Python runs in this stage and — because entity rows
and their list fields are already duplicate-free (extract.py) and triples
are file-local — no global dropDuplicates shuffle is needed.

Blank nodes (SourceLocation, call arguments) are skolemized
deterministically as ``_:<tag>|<owner-uri>`` (SURVEY.md §4.4); rdflib's
run-random BNode ids are compared structurally by compare.py.

Fidelity quirks reproduced on purpose (SURVEY.md §1.3):
- methods are typed ``code:Function`` and get only function-level booleans:
  the reference's isinstance-elif dispatch tests FunctionEntity before
  MethodEntity (ontology_builder.py:88-101) and MethodEntity ⊂
  FunctionEntity;
- parameters re-run the basic-properties pass (ontology_builder.py:237-241)
  → literal triples dedup away but a SECOND location bnode survives;
- ``code:callsFunction`` is dual-typed: a string literal of the callee name
  on every CallExpression (:286) and a URIRef edge when resolved (:367);
- relationship edges fire only for targets present in the entity batch
  (:303-368), except module ``code:imports`` which is unconditional (:355).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .schemas import TRIPLE_SCHEMA

_TCOLS = ["subj", "pred", "obj", "is_uri", "dtype"]


def _t(subj: Column, pred: str, obj: Column, is_uri: bool, dtype: str) -> Column:
    return F.struct(
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        obj.cast("string").alias("obj"),
        F.lit(is_uri).alias("is_uri"),
        F.lit(dtype).alias("dtype"),
    )


def _lit(subj: Column, pred: str, obj: Column, dtype: str = "string") -> Column:
    return _t(subj, pred, obj, False, dtype)


def _uri(subj: Column, pred: str, obj: Column) -> Column:
    return _t(subj, pred, obj, True, "uri")


def _bool(subj: Column, pred: str, flag: Column) -> Column:
    lex = F.when(F.coalesce(flag, F.lit(False)), F.lit("true")).otherwise(F.lit("false"))
    return _lit(subj, pred, lex, "boolean")


def _bnode(tag: str, owner: Column) -> Column:
    return F.concat(F.lit(f"_:{tag}|"), owner)


def _loc_cluster(subj: Column, bnode: Column, path, line, col, end_line, end_col) -> list[Column]:
    """locatedAt + SourceLocation value object (ontology_builder.py:132-145).
    endColumnNumber is gated on truthiness — a 0 end column is dropped,
    matching the reference's ``if location.end_column:`` check."""
    return [
        _t(subj, "code:locatedAt", bnode, False, "bnode"),
        _uri(bnode, "rdf:type", F.lit("code:SourceLocation")),
        _lit(bnode, "code:filePath", path),
        _lit(bnode, "code:lineNumber", line, "integer"),
        _lit(bnode, "code:columnNumber", col, "integer"),
        F.when(end_line.isNotNull() & (end_line != 0), _lit(bnode, "code:endLineNumber", end_line, "integer")),
        F.when(end_col.isNotNull() & (end_col != 0), _lit(bnode, "code:endColumnNumber", end_col, "integer")),
    ]


def dedup_colliding_uris(entities: DataFrame) -> DataFrame:
    """Global first-wins for cross-file URI collisions.

    Only parameter URIs omit the file path (quirk §1.3-2), so only they can
    collide across files; the reference's batch-global ``_uri_cache`` keeps
    the first occurrence in sorted-file order (ontology_builder.py:79-82,
    processor.py:273 sorted()). A window over just the parameter rows —
    a tiny fraction of the table — reproduces that.
    """
    params = entities.filter(F.col("kind") == "parameter")
    others = entities.filter(F.col("kind") != "parameter")
    w = Window.partitionBy("repo", "uri").orderBy("path", "line", "col")
    first = (
        params.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return others.unionByName(first)


def triples_from_entities(entities: DataFrame) -> DataFrame:
    """Entity rows → triple rows. Caller should persist ``entities`` since
    several projections scan it (pipeline.py does)."""
    e = entities
    subj = F.col("uri")
    kind = F.col("kind")
    repo = F.col("repo")

    loc0 = _bnode("loc0", subj)
    common = [
        _lit(subj, "code:hasName", F.col("name")),
        _lit(subj, "code:hasURI", subj, "anyURI"),
        F.when(F.col("body_hash").isNotNull(), _lit(subj, "code:hasBodyHash", F.col("body_hash"))),
        *_loc_cluster(subj, loc0, F.col("path"), F.col("line"), F.col("col"),
                      F.col("end_line"), F.col("end_col")),
    ]

    func_arr = F.array(
        _uri(subj, "rdf:type", F.lit("code:Function")),
        _bool(subj, "code:isAsync", F.col("is_async")),
        _bool(subj, "code:isGenerator", F.col("is_generator")),
        _bool(subj, "code:isArrowFunction", F.col("is_arrow")),
        _bool(subj, "code:isExported", F.col("is_exported")),
        _bool(subj, "code:isDefaultExport", F.col("is_default_export")),
        _lit(subj, "code:hasScope", F.coalesce(F.col("scope"), F.lit("global"))),
    )
    module_arr = F.array(
        _uri(subj, "rdf:type", F.lit("code:Module")),
        _lit(subj, "code:moduleType", F.coalesce(F.col("module_type"), F.lit("commonjs"))),
    )
    class_arr = F.array(
        _uri(subj, "rdf:type", F.lit("code:Class")),
        _bool(subj, "code:isAbstract", F.lit(False)),
        _bool(subj, "code:isExported", F.col("is_exported")),
        _bool(subj, "code:isDefaultExport", F.col("is_default_export")),
    )
    interface_arr = F.array(
        _uri(subj, "rdf:type", F.lit("code:Interface")),
        _bool(subj, "code:isExported", F.col("is_exported")),
    )
    variable_arr = F.array(
        _uri(subj, "rdf:type", F.lit("code:Variable")),
        _bool(subj, "code:isConst", F.col("is_const")),
        _bool(subj, "code:isLet", F.col("is_let")),
        _bool(subj, "code:isVar", F.col("is_var")),
        _lit(subj, "code:hasScope", F.coalesce(F.col("scope"), F.lit("global"))),
        F.when(F.col("init_value").isNotNull(),
               _lit(subj, "code:initializationValue", F.col("init_value"))),
    )
    loc1 = _bnode("loc1", subj)
    param_arr = F.concat(
        F.array(
            _uri(subj, "rdf:type", F.lit("code:Parameter")),
            _bool(subj, "code:isRestParameter", F.col("is_rest")),
            _bool(subj, "code:isOptional", F.lit(False)),
        ),
        # second basic-properties pass (ontology_builder.py:237-241): the
        # repeated literals dedup away under set semantics; the fresh
        # location bnode does not → every parameter carries two identical
        # location value objects
        F.array(*[c for c in _loc_cluster(subj, loc1, F.col("path"), F.col("line"),
                                          F.col("col"), F.col("end_line"), F.col("end_col"))]),
    )
    import_arr = F.array(
        _uri(subj, "rdf:type", F.lit("code:Import")),
        _lit(subj, "code:modulePath", F.col("module_path")),
        _lit(subj, "code:importType", F.coalesce(F.col("import_type"), F.lit("named"))),
        _bool(subj, "code:isTypeOnly", F.lit(False)),
    )
    export_arr = F.array(
        _uri(subj, "rdf:type", F.lit("code:Export")),
        _lit(subj, "code:exportType", F.coalesce(F.col("export_type"), F.lit("named"))),
        _bool(subj, "code:isReExport", F.lit(False)),
    )
    call_arr = F.array(
        _uri(subj, "rdf:type", F.lit("code:CallExpression")),
        # dual-typed callsFunction: string literal of the callee name here;
        # the resolved URIRef edge is a separate projection below
        _lit(subj, "code:callsFunction", F.col("callee_name")),
        _bool(subj, "code:isMethodCall", F.col("is_method_call")),
    )

    kind_arr = (
        F.when(kind == "module", module_arr)
        .when(kind.isin("function", "method"), func_arr)  # method flattening quirk
        .when(kind == "class", class_arr)
        .when(kind == "interface", interface_arr)
        .when(kind == "variable", variable_arr)
        .when(kind == "parameter", param_arr)
        .when(kind == "import", import_arr)
        .when(kind == "export", export_arr)
        .when(kind == "call", call_arr)
        .otherwise(F.array())
    )

    props = e.select(
        repo,
        F.explode(
            F.filter(F.concat(F.array(*common), kind_arr), lambda x: x.isNotNull())
        ).alias("t"),
    ).select("repo", "t.*")

    # ---- list-valued properties & relationship edges ----------------------
    parts: list[DataFrame] = [props]

    def proj(df: DataFrame, *triples: Column) -> DataFrame:
        return df.select(
            repo, F.explode(F.filter(F.array(*triples), lambda x: x.isNotNull())).alias("t")
        ).select("repo", "t.*")

    # importsSymbol (ontology_builder.py:264-265)
    imp_sym = e.filter((kind == "import") & (F.size("imported_symbols") > 0)).select(
        repo, subj.alias("s"), F.explode("imported_symbols").alias("sym")
    )
    parts.append(proj(imp_sym, _lit(F.col("s"), "code:importsSymbol", F.col("sym"))))

    # call arguments (ontology_builder.py:290-294)
    args = e.filter((kind == "call") & (F.size("arguments") > 0)).select(
        repo, subj.alias("s"), F.posexplode("arguments").alias("pos", "val")
    )
    argb = F.concat(F.lit("_:arg"), F.col("pos"), F.lit("|"), F.col("s"))
    parts.append(
        proj(
            args,
            _t(F.col("s"), "code:hasArgument", argb, False, "bnode"),
            _lit(argb, "code:argumentPosition", F.col("pos"), "integer"),
            _lit(argb, "code:argumentValue", F.col("val")),
        )
    )

    # calls / calledBy (ontology_builder.py:303-307)
    calls = e.filter(kind.isin("function", "method") & (F.size("calls") > 0)).select(
        repo, subj.alias("s"), F.explode("calls").alias("c")
    )
    parts.append(
        proj(
            calls,
            _uri(F.col("s"), "code:calls", F.col("c")),
            _uri(F.col("c"), "code:calledBy", F.col("s")),
        )
    )

    # hasMethod / memberOf (ontology_builder.py:326-329)
    meths = e.filter((kind == "class") & (F.size("methods") > 0)).select(
        repo, subj.alias("s"), F.explode("methods").alias("m")
    )
    parts.append(
        proj(
            meths,
            _uri(F.col("s"), "code:hasMethod", F.col("m")),
            _uri(F.col("m"), "code:memberOf", F.col("s")),
        )
    )

    # module defines/declaredIn over functions ∪ classes (:339-347)
    defs = e.filter(
        (kind == "module") & ((F.size("functions") > 0) | (F.size("classes") > 0))
    ).select(
        repo,
        subj.alias("s"),
        F.explode(F.concat("functions", "classes")).alias("d"),
    )
    parts.append(
        proj(
            defs,
            _uri(F.col("s"), "code:defines", F.col("d")),
            _uri(F.col("d"), "code:declaredIn", F.col("s")),
        )
    )

    # module exports edges (:350-352)
    exps = e.filter((kind == "module") & (F.size("exports") > 0)).select(
        repo, subj.alias("s"), F.explode("exports").alias("x")
    )
    parts.append(proj(exps, _uri(F.col("s"), "code:exports", F.col("x"))))

    # module imports edges — unconditional (:354-359)
    imps = e.filter((kind == "module") & (F.size("imports") > 0)).select(
        repo, subj.alias("s"), F.explode("imports").alias("m")
    )
    parts.append(proj(imps, _uri(F.col("s"), "code:imports", F.col("m"))))

    # call madeBy (:362-364) — caller URIs are minted from entities in the
    # same file, so map-membership is guaranteed by construction
    made = e.filter((kind == "call") & (F.col("caller_uri") != "")).select(
        repo, subj.alias("s"), F.col("caller_uri").alias("c")
    )
    parts.append(proj(made, _uri(F.col("s"), "code:madeBy", F.col("c"))))

    # resolved callee: callsFunction URIRef + calledAt (:366-368)
    res = e.filter((kind == "call") & F.col("callee_uri").isNotNull()).select(
        repo, subj.alias("s"), F.col("callee_uri").alias("c")
    )
    parts.append(
        proj(
            res,
            _uri(F.col("s"), "code:callsFunction", F.col("c")),
            _uri(F.col("c"), "code:calledAt", F.col("s")),
        )
    )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select([F.col(c) for c in TRIPLE_SCHEMA.fieldNames()])
