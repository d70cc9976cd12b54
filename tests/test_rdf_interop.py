"""Interop with the reference's SHIPPED artifacts: the Turtle graph dumps
under /root/reference/graph_data/ and the code-ontology.owl TBox.

Until round 5 only *re-executed* reference output was compared
(tests/test_ref_ground_truth.py); these tests close the last seam by
loading the reference's real published files and pinning the SURVEY §1.3
emission profile against them (11,610 triples; 415 CallExpression / 141
Function / 63 Import / 44 Parameter / 28 Export / 24 Module; 759
SourceLocation bnodes; predicate frequency table).
"""

import os

import pytest
from pyspark.sql import functions as F

from codeontology_spark.rdfio import read_ntriples, write_ntriples
from codeontology_spark.turtle import (
    TurtleSyntaxError,
    load_ontology,
    parse_turtle,
    read_turtle,
)

REF_GRAPH_DIR = "/root/reference/graph_data"
REF_TTL = f"{REF_GRAPH_DIR}/knowledge_graph_20250913_144426.ttl"
REF_OWL = "/root/reference/ontologies/code-ontology.owl"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_GRAPH_DIR), reason="reference artifacts not present"
)


# ---------------------------------------------------------------- parser unit


def test_parse_basic_forms():
    rows = parse_turtle(
        """
        @prefix code: <http://codeontology.org/> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        <http://x/f1> a code:Function ;
            code:hasName "caf\\u00e9" ;
            code:lineNumber 7 ;
            code:isAsync false ;
            code:hasURI "http://x/f1"^^xsd:anyURI ;
            code:locatedAt [ a code:SourceLocation ; code:lineNumber 7 ] .
        """,
        bnode_seed="t",
    )
    d = {(p, o) for _, p, o, _, _ in rows}
    assert ("rdf:type", "code:Function") in d
    assert ("code:hasName", "caf\u00e9") in d  # \uXXXX decoded
    by_pred = {p: (o, u, dt) for _, p, o, u, dt in rows}
    assert by_pred["code:lineNumber"][2] == "integer"
    assert by_pred["code:isAsync"] == ("false", False, "boolean")
    assert by_pred["code:hasURI"][2] == "anyURI"
    # nested bnode: locatedAt object is a bnode that is also a subject
    bnode = by_pred["code:locatedAt"][0]
    assert bnode.startswith("_:b") and by_pred["code:locatedAt"][2] == "bnode"
    assert any(s == bnode and p == "rdf:type" for s, p, o, _, _ in [r for r in rows])


def test_parse_collections_lang_and_sparql_directives():
    rows = parse_turtle(
        """
        PREFIX ex: <http://e/>
        ex:s ex:list ( ex:a "two" 3 ) ;
             ex:label "bonjour"@fr .
        """,
        bnode_seed="t",
    )
    firsts = [(o, dt) for _, p, o, _, dt in rows if p == "rdf:first"]
    assert firsts == [("http://e/a", "uri"), ("two", "string"), ("3", "integer")]
    rests = [o for _, p, o, _, _ in rows if p == "rdf:rest"]
    assert rests[-1] == "rdf:nil" and len(rests) == 3
    assert ("bonjour", "string") in {(o, dt) for _, p, o, _, dt in rows if p == "http://e/label"}


def test_parse_rejects_garbage_and_undeclared_prefix():
    with pytest.raises(TurtleSyntaxError):
        parse_turtle("undeclared:x a undeclared:Y .")
    with pytest.raises(TurtleSyntaxError):
        parse_turtle("<http://x> <http://y> @@nonsense .")


def test_bnode_seed_namespaces_labels():
    doc = "@prefix e: <http://e/> .\n_:n e:p e:o ."
    a = parse_turtle(doc, bnode_seed="fileA")[0][0]
    b = parse_turtle(doc, bnode_seed="fileB")[0][0]
    assert a != b and a.startswith("_:b") and b.startswith("_:b")


# ------------------------------------------------------- reference artifacts


@needs_ref
def test_reference_ttl_histogram(spark):
    """SURVEY §1.3 pin: the published dump profile, from the real file."""
    t = read_turtle(spark, REF_TTL).cache()
    try:
        assert t.count() == 11610
        types = dict(
            t.filter(F.col("pred") == "rdf:type")
            .groupBy("obj")
            .count()
            .collect()
        )
        assert types == {
            "code:SourceLocation": 759,
            "code:CallExpression": 415,
            "code:Function": 141,
            "code:Import": 63,
            "code:Parameter": 44,
            "code:Export": 28,
            "code:Module": 24,
        }
        preds = dict(t.groupBy("pred").count().collect())
        # §1.3's frequency table was derived by grepping predicate
        # OCCURRENCES; Turtle comma-lists expand one occurrence into
        # several TRIPLES (e.g. 299 `code:hasArgument [..], [..]`
        # occurrences → 388 triples — exactly one per argument bnode,
        # cross-checked by the 388 argumentPosition/argumentValue rows,
        # and 715 locatedAt occurrences → 759 triples, one per
        # SourceLocation bnode which §1.3 itself pins at 759). The
        # numbers below are the true triple counts; the total (11,610)
        # equals the dump's own .metadata.json triples_count, i.e. what
        # rdflib counted when the reference saved it.
        assert preds["code:hasName"] == 715
        assert preds["code:hasURI"] == 715
        assert preds["code:locatedAt"] == 759
        assert preds["code:callsFunction"] == 421
        assert preds["code:isMethodCall"] == 415
        assert preds["code:madeBy"] == 448
        assert preds["code:hasArgument"] == 388
        assert preds["code:argumentPosition"] == 388
        assert preds["code:argumentValue"] == 388
        assert preds["code:declaredIn"] == 138
        assert preds["code:defines"] == 138
        assert preds["code:calledBy"] == 5
        assert preds["code:calledAt"] == 6
        assert preds["code:calls"] == 5
        assert preds["code:imports"] == 1
        # zero Method/Class/Variable/Property/Interface instances (§1.3)
        absent = {"code:Method", "code:Class", "code:Variable", "code:Property", "code:Interface"}
        assert not absent & set(types)
        # bnode objects resolve: every locatedAt object is a subject
        dangling = (
            t.filter(F.col("dtype") == "bnode")
            .select(F.col("obj").alias("subj"))
            .join(t.select("subj").distinct(), "subj", "left_anti")
            .count()
        )
        assert dangling == 0
    finally:
        t.unpersist()


@needs_ref
def test_reference_graph_dir_scan(spark):
    """Directory scan picks up every dump, one repo per file."""
    t = read_turtle(spark, REF_GRAPH_DIR)
    per_repo = dict(t.groupBy("repo").count().collect())
    assert per_repo["latest"] == 11610
    assert per_repo["knowledge_graph_20250913_144426"] == 11610
    assert per_repo["knowledge_graph_20250913_144144"] == 1035


@needs_ref
def test_owl_tbox_preload_and_union(spark):
    """ontology_builder.py:44-57 parity: optional TBox preload produces
    the vocabulary's class/property declarations in the triple shape and
    unions cleanly with instance triples (default remains instance-only
    because preload is a separate opt-in call)."""
    tbox = load_ontology(spark, REF_OWL).cache()
    try:
        types = dict(
            tbox.filter(F.col("pred") == "rdf:type").groupBy("obj").count().collect()
        )
        assert types["owl:Class"] == 17
        assert types["owl:ObjectProperty"] == 25
        assert types["owl:DatatypeProperty"] == 47
        # subclass spine present (Method ⊂ Function, Parameter ⊂ Variable)
        sub = {
            (r["subj"], r["obj"])
            for r in tbox.filter(F.col("pred") == "rdfs:subClassOf").collect()
        }
        assert ("code:Method", "code:Function") in sub
        assert ("code:Parameter", "code:Variable") in sub
        inst = read_turtle(spark, REF_TTL)
        both = inst.unionByName(tbox)
        assert both.count() == 11610 + tbox.count()
    finally:
        tbox.unpersist()


@needs_ref
def test_turtle_to_ntriples_roundtrip(spark, tmp_path):
    """Reference dump → our distributed .nt export → re-import: graph
    preserved (bnode labels re-minted deterministically, everything else
    byte-identical)."""
    src = read_turtle(spark, REF_TTL)
    out = str(tmp_path / "nt")
    write_ntriples(src, out)
    back = read_ntriples(spark, out, strict=True)
    assert back.count() == src.count()
    cols = ["repo", "subj", "pred", "obj", "dtype"]
    nb_src = src.filter(~F.col("subj").startswith("_:") & (F.col("dtype") != "bnode"))
    nb_back = back.filter(~F.col("subj").startswith("_:") & (F.col("dtype") != "bnode"))
    assert nb_src.select(cols).exceptAll(nb_back.select(cols)).count() == 0
    assert nb_back.select(cols).exceptAll(nb_src.select(cols)).count() == 0
    # bnode structure preserved as a multiset of (pred, dtype) rows
    b_src = src.subtract(nb_src).groupBy("pred", "dtype").count()
    b_back = back.subtract(nb_back).groupBy("pred", "dtype").count()
    assert b_src.exceptAll(b_back).count() == 0


# ----------------------------------------------------- .nt unicode escapes


def test_read_ntriples_unicode_escapes(spark, tmp_path):
    """ADVICE r4: \\uXXXX / \\UXXXXXXXX escapes must decode; escaped
    backslash before 'u' must NOT; malformed hex is kept raw, not fatal."""
    p = tmp_path / "u.nt"
    p.write_text(
        '<http://x/a> <http://x/p> "caf\\u00e9" .\n'
        '<http://x/b> <http://x/p> "rocket \\U0001F680" .\n'
        '<http://x/c> <http://x/p> "dir C:\\\\users" .\n'
        '<http://x/d> <http://x/p> "bad \\uZZZZ" .\n'
        '<http://x/e> <http://x/p> "plain" .\n'
    )
    rows = {
        r["subj"]: r["obj"]
        for r in read_ntriples(spark, str(p)).collect()
    }
    assert rows["http://x/a"] == "caf\u00e9"
    assert rows["http://x/b"] == "rocket \U0001F680"
    assert rows["http://x/c"] == "dir C:\\users"  # \\u is backslash + u
    assert rows["http://x/d"] == "bad \\uZZZZ"  # lenient: raw, not a crash
    assert rows["http://x/e"] == "plain"


@needs_ref
def test_write_turtle_roundtrip_and_metadata(spark, tmp_path):
    """The serialize half of the interop seam: write_turtle produces
    one valid-Turtle document per repo (@prefix header + N-Triples-subset
    statements — rdflib-loadable, graph_store.py:479-520's format) that
    our own strict parser reads back to the identical graph, plus the
    reference-style metadata JSON with the triple count."""
    import json as _json

    from codeontology_spark.turtle import write_turtle

    src = read_turtle(spark, REF_TTL, repo="dump").cache()
    out = str(tmp_path / "ttl_export")
    try:
        write_turtle(src, out)

        shards = list((tmp_path / "ttl_export").glob("repo=dump/*.ttl"))
        assert shards, "shards renamed to .ttl"
        text = shards[0].read_text()
        assert text.startswith("@prefix ")
        # document parses standalone with the strict recursive-descent
        # parser — i.e. it IS Turtle, not just something our reader eats
        rows = parse_turtle(text, bnode_seed="x")
        assert len(rows) == 11610

        meta = _json.loads((tmp_path / "ttl_export" / "metadata.json").read_text())
        assert meta["triples_count"] == 11610 and meta["repos"] == {"dump": 11610}

        back = read_turtle(spark, out)
        assert back.count() == src.count()
        assert {r.repo for r in back.select("repo").distinct().collect()} == {"dump"}
        cols = ["repo", "subj", "pred", "obj", "is_uri", "dtype"]
        nb_src = src.filter(
            ~F.col("subj").startswith("_:") & (F.col("dtype") != "bnode")
        ).select(cols)
        nb_back = back.filter(
            ~F.col("subj").startswith("_:") & (F.col("dtype") != "bnode")
        ).select(cols)
        assert nb_src.exceptAll(nb_back).count() == 0
        assert nb_back.exceptAll(nb_src).count() == 0
        # bnode-touching rows: structure preserved as (pred, dtype) multiset
        b_src = src.select(cols).exceptAll(nb_src).groupBy("pred", "dtype").count()
        b_back = back.select(cols).exceptAll(nb_back).groupBy("pred", "dtype").count()
        assert b_src.exceptAll(b_back).count() == 0
    finally:
        src.unpersist()
