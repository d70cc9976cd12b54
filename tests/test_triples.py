"""End-to-end: fixture repo table → Spark pipeline → triples, checked for
exact structural equality (P=R=1.0) against the independent oracle emitter,
plus the reference test-suite's own query-level assertions re-expressed
over the triple table."""

import pytest
from pyspark.sql import functions as F

from codeontology_spark.compare import canonicalize, diff, precision_recall
from codeontology_spark.fixtures import FIXTURES
from codeontology_spark.jsparse import extract_file
from codeontology_spark.pipeline import build_graph, graph_stats, verify_content_invariant
from codeontology_spark.synth import fixture_table_parquet

from oracle_emit import oracle_triples


@pytest.fixture(scope="module")
def built(spark):
    src = fixture_table_parquet(spark)
    res = build_graph(src, apply_filters=True, persist=True)
    res.triples = res.triples.cache()
    yield src, res
    res.entities.unpersist()


def _expected_for(fx_names):
    rows = []
    for fx in fx_names:
        for path, content in FIXTURES[fx].items():
            ents = extract_file(path, content)
            rows.extend(oracle_triples(path, ents))
    return rows


def test_triples_match_oracle_exactly(spark, built):
    src, res = built
    by_repo: dict[str, list] = {}
    for r in res.triples.collect():
        by_repo.setdefault(r.repo, []).append((r.subj, r.pred, r.obj, r.is_uri, r.dtype))
    for fx in sorted(FIXTURES):
        actual = by_repo.get(f"fixture/{fx}", [])
        expected = _expected_for([fx])
        pr = precision_recall(canonicalize(expected), canonicalize(actual))
        assert pr["precision"] == 1.0 and pr["recall"] == 1.0, (
            fx,
            pr,
            diff(canonicalize(expected), canonicalize(actual)),
        )


def test_five_functions_query(built):
    """test_pipeline.py:91-100 re-expressed on the triple table."""
    _, res = built
    t = res.triples.filter(F.col("repo") == "fixture/simple5")
    funcs = t.filter((F.col("pred") == "rdf:type") & (F.col("obj") == "code:Function"))
    names = (
        funcs.alias("f")
        .join(
            t.filter(F.col("pred") == "code:hasName").alias("n"),
            F.col("f.subj") == F.col("n.subj"),
        )
        .select(F.col("n.obj").alias("name"))
    )
    got = {r.name for r in names.collect()}
    assert {"add", "subtract", "multiply", "divide", "calculate"} <= got


def test_class_methods_query(built):
    """test_pipeline.py:609-626: UserService hasMethod."""
    _, res = built
    t = res.triples.filter(F.col("repo") == "fixture/layers3")
    svc = t.filter((F.col("pred") == "code:hasName") & (F.col("obj") == "UserService"))
    methods = (
        svc.alias("c")
        .join(t.filter(F.col("pred") == "code:hasMethod").alias("hm"),
              F.col("c.subj") == F.col("hm.subj"))
        .join(t.filter(F.col("pred") == "code:hasName").alias("mn"),
              F.col("hm.obj") == F.col("mn.subj"))
        .select(F.col("mn.obj").alias("name"))
    )
    got = {r.name for r in methods.collect()}
    assert got == {"getUsers", "createUser", "modifyUser", "removeUser"}


def test_async_functions_query(built):
    """test_pipeline.py:380-390: isAsync=true finds the api functions."""
    _, res = built
    t = res.triples.filter(F.col("repo") == "fixture/nextjs_mini")
    async_f = t.filter((F.col("pred") == "code:isAsync") & (F.col("obj") == "true"))
    names = (
        async_f.alias("a")
        .join(t.filter(F.col("pred") == "code:hasName").alias("n"),
              F.col("a.subj") == F.col("n.subj"))
        .select(F.col("n.obj").alias("name"))
    )
    got = {r.name for r in names.collect()}
    assert "fetchPosts" in got and "getStaticProps" in got


def test_parameter_double_location(built):
    """Quirk §1.3-3: every parameter carries exactly two location objects."""
    _, res = built
    t = res.triples.filter(F.col("repo") == "fixture/simple5")
    params = t.filter((F.col("pred") == "rdf:type") & (F.col("obj") == "code:Parameter"))
    locs = (
        params.alias("p")
        .join(t.filter(F.col("pred") == "code:locatedAt").alias("l"),
              F.col("p.subj") == F.col("l.subj"))
        .groupBy("p.subj")
        .count()
    )
    counts = {r["count"] for r in locs.collect()}
    assert counts == {2}


def test_no_extends_edges(built):
    """Quirk §1.3-6: code:extends never fires (bare-name targets)."""
    _, res = built
    assert res.triples.filter(F.col("pred") == "code:extends").count() == 0


def test_content_invariant(built):
    src, res = built
    violations = verify_content_invariant(src, res.entities)
    assert violations.count() == 0


def test_graph_stats(built):
    _, res = built
    stats = {r.entity_type: r["count"] for r in graph_stats(res.triples).collect()}
    assert stats["code:Module"] == sum(len(v) for v in FIXTURES.values())
    assert stats["code:Function"] > 0
    assert stats["code:CallExpression"] > 0


def test_calls_edges(built):
    """calculate → add/subtract/multiply/divide calls + calledBy inverses."""
    _, res = built
    t = res.triples.filter(F.col("repo") == "fixture/simple5")
    calls = t.filter(F.col("pred") == "code:calls").count()
    called_by = t.filter(F.col("pred") == "code:calledBy").count()
    assert calls == 4 and called_by == 4
    made_by = t.filter(F.col("pred") == "code:madeBy")
    assert made_by.count() == 4  # all four call sites inside calculate


def test_infer_patterns(built):
    """A15 (processor.py:390-438): factory/create heuristics, import
    dependency rollup, exported API boundaries — as queryable rows."""
    from codeontology_spark.pipeline import infer_patterns

    _, res = built
    found = infer_patterns(res.entities)
    by_kind = {r["finding"] for r in found.select("finding").distinct().collect()}
    assert {"factory", "module_dependency"} <= by_kind
    factories = {
        r.detail for r in found.filter("finding = 'factory'").collect()
    }
    assert "createUser" in factories  # layers3 fixture
    deps = {r.detail for r in found.filter("finding = 'module_dependency'").collect()}
    assert "./database.js" in deps
    # tree-sitter-path quirk: _check_export_status always returns False
    # (ast_parser.py:773-776), so is_exported is never set and the API-
    # boundary scan finds 0 — exactly the reference's printed result
    assert found.filter("finding = 'public_api'").count() == 0


def test_docstring_and_comment_triples(spark):
    """code:hasDocstring + hasComment/commentText emission (the reference
    models these at code_entities.py:35-36 and lowers them at
    ontology_builder.py:117-130 but never populates them; the jsparse path
    extracts leading JSDoc/comments)."""
    from codeontology_spark.schemas import INPUT_SCHEMA

    src_text = (
        "/**\n * Greets a user.\n */\n// note line\n"
        "function greet(name) { return name; }\n"
    )
    src = spark.createDataFrame(
        [("r", "doc.js", "c", "javascript", src_text)], schema=INPUT_SCHEMA
    )
    res = build_graph(src, persist=True)
    t = res.triples
    fn = "http://codebase.local/doc.js#function_greet_5"
    doc = t.filter((F.col("subj") == fn) & (F.col("pred") == "code:hasDocstring"))
    assert [r.obj for r in doc.collect()] == ["Greets a user."]
    cmt = t.filter((F.col("subj") == fn) & (F.col("pred") == "code:hasComment"))
    bnodes = [r.obj for r in cmt.collect()]
    assert len(bnodes) == 1 and bnodes[0].startswith("_:cmt")
    texts = t.filter((F.col("subj") == bnodes[0]) & (F.col("pred") == "code:commentText"))
    assert [r.obj for r in texts.collect()] == ["note line"]
    res.entities.unpersist()


def test_content_dedup_same_path_different_content(spark, tmp_path):
    """r6 extract optimization: parse-once-per-distinct-(path, content-sha)
    with join-back. The join key must include the content sha — two repos
    carrying the SAME relative path with DIFFERENT content must get their
    own entity rows (and commits), not cross-attached ones; two repos with
    identical (path, content) must both get rows from the single parse.
    The dedup path must be byte-identical to the parse-every-row path."""
    from codeontology_spark.schemas import INPUT_SCHEMA

    rows = [
        ("repo/a", "lib/x.js", "ca", "javascript", "function fa() { return 1; }"),
        ("repo/b", "lib/x.js", "cb", "javascript", "function fb() { return 2; }"),
        ("repo/c", "lib/x.js", "cc", "javascript", "function fa() { return 1; }"),
    ]
    # parquet round-trip: createDataFrame→UDF would chain 2 Python workers
    p = str(tmp_path / "src")
    spark.createDataFrame(rows, schema=INPUT_SCHEMA).write.parquet(p)
    src = spark.read.parquet(p)

    dedup = build_graph(src, persist=False, dedup_content=True).entities
    plain = build_graph(src, persist=False, dedup_content=False).entities
    key = ["repo", "path", "commit", "kind", "name", "uri"]
    d = sorted(map(tuple, dedup.select(*key).collect()))
    q = sorted(map(tuple, plain.select(*key).collect()))
    assert d == q
    funcs = {(r.repo, r.name, r.commit) for r in dedup.filter(F.col("kind") == "function").collect()}
    assert funcs == {("repo/a", "fa", "ca"), ("repo/b", "fb", "cb"), ("repo/c", "fa", "cc")}


def test_spread_scale_adaptive(spark, tmp_path):
    """ops.layout.spread: repartitions only sources the optimizer estimates
    as underparallel; unknown-estimate frames (local relations report the
    defaultSizeInBytes sentinel) are left alone — at production scale the
    helper must be a no-op, never an extra shuffle."""
    from codeontology_spark.ops.layout import spread

    small = str(tmp_path / "small")
    spark.range(100).selectExpr("id AS doc_id", "'x' AS text").write.parquet(small)
    scan = spark.read.parquet(small)
    plan = spread(scan)._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" in plan and "doc_id" in plan
    # rows unchanged, no duplicates
    assert sorted(r.doc_id for r in spread(scan).collect()) == list(range(100))

    sentinel = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    assert spread(sentinel) is sentinel  # unknown size → untouched


def test_cap_bucket_forms_identical(spark):
    """dedup._cap_bucket: the adaptive single-window form (small source)
    and the two-phase salted form (large/unknown source) must produce
    byte-identical row sets — the SQL oracles pin the QUALIFY semantics."""
    from codeontology_spark.ops.dedup import _cap_bucket

    rows = [(i, f"b{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, sig string")
    small = _cap_bucket(df, "sig", 7, src_bytes=1024)
    large = _cap_bucket(df, "sig", 7, src_bytes=1 << 40)
    unknown = _cap_bucket(df, "sig", 7, src_bytes=None)
    s = sorted(map(tuple, small.collect()))
    assert s == sorted(map(tuple, large.collect())) == sorted(map(tuple, unknown.collect()))
    assert len(s) == 21  # 3 buckets x cap 7
