"""Query-layer tests: template catalog, closure semantics, NL routing,
pattern matching, graph algorithms."""

import pytest
from pyspark.sql import functions as F

from codeontology_spark import nlq
from codeontology_spark import queries as Q
from codeontology_spark.pipeline import build_graph
from codeontology_spark.synth import fixture_table_parquet


@pytest.fixture(scope="module")
def triples(spark):
    res = build_graph(fixture_table_parquet(spark), persist=True)
    t = res.triples.cache()
    t.count()
    yield t
    res.unpersist()
    t.unpersist()


def test_functions_called_by(triples):
    got = {r.callee_name for r in Q.functions_called_by(triples, "calculate").collect()}
    assert got == {"add", "subtract", "multiply", "divide"}


def test_functions_in_module(triples):
    got = {r.func_name for r in Q.functions_in_module(triples, "simple").collect()}
    assert got == {"add", "subtract", "multiply", "divide", "calculate"}


def test_transitive_closure_cycle_terminates(spark):
    edges = spark.createDataFrame(
        [("g", "a", "b"), ("g", "b", "c"), ("g", "c", "a")],
        "repo string, src string, dst string",
    )
    pairs = {(r.src, r.dst) for r in Q.transitive_closure(edges).collect()}
    assert len(pairs) == 9  # complete closure of a 3-cycle


def test_call_chain_between(triples):
    """validation2: callerFunction → targetFunction is direct (no
    intermediates); via layers the chain query shape still executes."""
    out = Q.call_chain_between(triples, "callerFunction", "targetFunction")
    assert out.count() == 0  # SPARQL B6 finds strictly-intermediate nodes


def test_unused_functions_excludes_called(triples):
    names = {r.name for r in Q.unused_functions(triples).collect()}
    assert "add" not in names  # called by calculate
    assert "calculate" in names  # never called, never exported (quirk)


def test_high_complexity(triples):
    out = Q.high_complexity_functions(triples, min_calls=3).collect()
    assert [r.name for r in out] == ["calculate"]
    assert out[0].call_count == 4


def test_pattern_match(triples):
    out = Q.pattern_match(triples, node_type="code:Function", name_regex="^valid")
    assert {r.name for r in out.collect()} == {"validateUser", "validateEmail"}


def test_get_context(triples):
    uri = "http://codebase.local/simple.js#function_add_4"
    ctx = Q.get_context(triples, uri, depth=1)
    preds = {r.pred for r in ctx.collect()}
    assert "code:hasName" in preds and "rdf:type" in preds
    # depth-1 neighborhood includes calculate (calls edge) and the module
    subjects = {r.subj for r in ctx.collect()}
    assert any(s.endswith("#function_calculate_21") for s in subjects)


def test_get_context_pred_filter(triples):
    """B15 relationship-type filter (VERDICT r3 #10, query_engine.py:
    248-295): with preds restricting the walkable edge types, the
    neighborhood must only grow along those predicates."""
    uri = "http://codebase.local/simple.js#function_add_4"
    unfiltered = {r.subj for r in Q.get_context(triples, uri, depth=1).collect()}
    only_calls = {
        r.subj
        for r in Q.get_context(triples, uri, depth=1, preds=["code:calls"]).collect()
    }
    assert only_calls < unfiltered  # strictly smaller: location bnodes gone
    # the calls neighbor is still reached...
    assert any(s.endswith("#function_calculate_21") for s in only_calls)
    # ...but location bnodes (reachable only via code:locatedAt) are not
    assert not any(s.startswith("_:loc") for s in only_calls)
    assert any(s.startswith("_:loc") for s in unfiltered)
    # a predicate that never links URIs yields just the seed's own triples
    none = Q.get_context(triples, uri, depth=1, preds=["code:noSuchPred"])
    assert {r.subj for r in none.collect()} == {uri}


def test_get_context_object_only_uri(spark):
    """A URI appearing ONLY as an object (external target with no triples
    of its own) still has a neighborhood: the adjacency seed covers it."""
    t = spark.createDataFrame(
        [
            ("r", "u:mod", "code:imports", "u:external", True, "uri"),
            ("r", "u:mod", "code:hasName", "mod", False, "string"),
        ],
        "repo string, subj string, pred string, obj string, is_uri boolean, dtype string",
    )
    ctx = Q.get_context(t, "u:external", depth=1)
    assert {r.subj for r in ctx.collect()} == {"u:mod"}


def test_register_views_and_example_sql(spark, triples):
    """B12 raw-query surface (VERDICT r3 #9): temp views + the documented
    EXAMPLE_SQL run verbatim via spark.sql, matching the DataFrame twins."""
    Q.register_views(spark, triples)
    by_desc = dict(Q.EXAMPLE_SQL)

    callers = spark.sql(by_desc["callers of a named function (B1 twin)"])
    assert {r.caller_name for r in callers.collect()} == {"calculate"}

    counts = spark.sql(by_desc["entity counts by rdf:type (B16 twin)"])
    cmap = {r.entity_type: r.n for r in counts.collect()}
    assert cmap["code:Function"] == 43 and cmap["code:Module"] == 16

    deps = spark.sql(by_desc["modules importing a given module (C5 twin)"])
    assert {r.dependent_module for r in deps.collect()} == {
        "http://codebase.local/moduleA.js#module"
    }


def test_degree_and_pagerank(spark):
    edges = spark.createDataFrame(
        [("g", "a", "b"), ("g", "a", "c"), ("g", "b", "c")],
        "repo string, src string, dst string",
    )
    deg = {r.uri: r.degree for r in Q.degree_centrality(edges).collect()}
    assert deg == {"a": 2, "b": 2, "c": 2}
    pr = {r.uri: r.rank for r in Q.pagerank(edges, iters=5).collect()}
    assert pr["c"] > pr["b"] > pr["a"]  # c receives the most rank mass


def test_connected_components_chain(spark):
    rows = [("g", f"n{i:02d}", f"n{i+1:02d}") for i in range(20)] + [("g", "x1", "x2")]
    edges = spark.createDataFrame(rows, "repo string, src string, dst string")
    cc = Q.connected_components(edges)
    comps = {}
    for r in cc.collect():
        comps.setdefault(r.component, set()).add(r.uri)
    sizes = sorted(len(v) for v in comps.values())
    assert sizes == [2, 21]


def test_nl_routing(triples):
    out = nlq.natural_language_query(triples, "find functions that call add")
    assert {r.caller_name for r in out.collect()} == {"calculate"}
    out = nlq.natural_language_query(triples, "find unused functions")
    assert out.count() > 0
    out = nlq.natural_language_query(triples, "find circular dependencies")
    assert out.count() == 2
    assert nlq.natural_language_query(triples, "gibberish with no intent") is None


def test_suggestions_and_explain(triples):
    assert nlq.get_query_suggestions("func") == [
        "functions_called_by_function",
        "functions_calling_function",
        "functions_in_module",
        "functions_with_many_parameters",
    ]
    plan = nlq.explain_query(Q.unused_functions(triples))
    assert "Physical Plan" in plan


def test_simple_paths(spark):
    edges = spark.createDataFrame(
        [("g", "a", "b"), ("g", "b", "c"), ("g", "a", "c"), ("g", "c", "d"), ("g", "b", "a")],
        "repo string, src string, dst string",
    )
    out = Q.simple_paths(edges, "a", "d", cutoff=4)
    paths = {tuple(r.path) for r in out.collect()}
    assert paths == {("a", "b", "c", "d"), ("a", "c", "d")}
    # cycle a->b->a must not loop
    out2 = Q.simple_paths(edges, "a", "a", cutoff=4)
    assert all("a" == r.path[0] for r in out2.collect())


def test_graph_density_stats(spark):
    # triangle a-b-c plus a pendant d
    edges = spark.createDataFrame(
        [("g", "a", "b"), ("g", "b", "c"), ("g", "c", "a"), ("g", "c", "d")],
        "repo string, src string, dst string",
    )
    r = Q.graph_density_stats(edges).collect()[0]
    assert r.n_nodes == 4 and r.n_edges == 4 and r.triangles == 1
    assert abs(r.density - round(2 * 4 / (4 * 3), 6)) < 1e-9


def test_betweenness_matches_networkx(spark):
    """Exact mode (sample >= |V|) must reproduce networkx's unnormalized
    directed Brandes betweenness (the algorithm graph_store.py:374-390
    runs), scaled by 1/|V| (our per-sampled-root averaging)."""
    import networkx as nx

    raw = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"),
           ("b", "d"), ("e", "a"), ("c", "e")]
    edges = spark.createDataFrame(
        [("g", s, d) for s, d in raw], "repo string, src string, dst string"
    )
    out = {r.uri: r.betweenness for r in
           Q.betweenness_centrality(edges, sample_sources=100).collect()}
    g = nx.DiGraph(raw)
    exp = nx.betweenness_centrality(g, normalized=False)
    n = g.number_of_nodes()
    for node, bc in exp.items():
        assert abs(out.get(node, 0.0) - bc / n) < 1e-9, (node, out, exp)


def test_betweenness_sampled_is_bounded(spark):
    """Sampled mode touches only frontier-state per level and returns a
    per-root-averaged score comparable across sample sizes."""
    chain = [("g", f"n{i}", f"n{i+1}") for i in range(12)]
    edges = spark.createDataFrame(chain, "repo string, src string, dst string")
    out = Q.betweenness_centrality(edges, sample_sources=4, max_depth=15)
    rows = out.collect()
    assert rows and all(r.betweenness >= 0 for r in rows)


def test_chain_intermediates_bfs(spark):
    edges = spark.createDataFrame(
        [("g", "a", "b"), ("g", "b", "c"), ("g", "c", "d"), ("g", "x", "c")],
        "repo string, src string, dst string",
    )
    starts = spark.createDataFrame([("g", "a")], "repo string, uri string")
    ends = spark.createDataFrame([("g", "d")], "repo string, uri string")
    mids = {r.uri for r in Q.chain_intermediates(edges, starts, ends).collect()}
    assert mids == {"b", "c"}


def test_get_context_plan_has_no_nested_loop_join(triples):
    """B15 regression (VERDICT r1): the k-hop frontier must expand through
    hash equi-joins; an OR-condition join would degrade to a
    BroadcastNestedLoopJoin rescan of the link table per hop."""
    import contextlib
    import io

    uri = "http://codebase.local/simple.js#function_add_4"
    ctx = Q.get_context(triples, uri, depth=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ctx.explain("formatted")
    assert "BroadcastNestedLoopJoin" not in buf.getvalue()


def test_get_context_does_not_leak_across_repos(spark):
    """Colliding subject URIs in different repos must stay separated: the
    frontier and final membership join carry `repo`."""
    rows = [
        ("r1", "u:x", "code:calls", "u:y", True, "uri"),
        ("r1", "u:x", "code:hasName", "xname-r1", False, "string"),
        ("r2", "u:x", "code:calls", "u:z", True, "uri"),
        ("r2", "u:x", "code:hasName", "xname-r2", False, "string"),
    ]
    t = spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, is_uri boolean, dtype string"
    )
    ctx = Q.get_context(t, "u:x", depth=1)
    # both repos contain u:x, so both neighborhoods surface — but each row
    # keeps its own repo and r1 rows never include r2's objects
    got = {(r.repo, r.subj, r.obj) for r in ctx.collect()}
    assert ("r1", "u:x", "u:y") in got and ("r2", "u:x", "u:z") in got
    assert ("r1", "u:x", "u:z") not in got


def test_scc_known_components(spark):
    """Directed graph with known SCCs: {a,b,c} 3-cycle, {e,f} 2-cycle,
    self-loop g, and an acyclic bridge d plus chain h->i (all singletons).
    Two repos assert no cross-repo label bleed."""
    edges = spark.createDataFrame(
        [
            ("r1", "a", "b"), ("r1", "b", "c"), ("r1", "c", "a"),
            ("r1", "c", "d"), ("r1", "d", "e"),
            ("r1", "e", "f"), ("r1", "f", "e"),
            ("r1", "g", "g"), ("r1", "h", "i"),
            ("r2", "a", "b"),  # same names, different repo, no cycle
        ],
        "repo string, src string, dst string",
    )
    scc = {
        (r.repo, r.uri): r.scc
        for r in Q.strongly_connected_components(edges).collect()
    }
    assert scc[("r1", "a")] == scc[("r1", "b")] == scc[("r1", "c")] == "a"
    assert scc[("r1", "e")] == scc[("r1", "f")] == "e"
    assert scc[("r1", "d")] == "d" and scc[("r1", "h")] == "h"
    assert scc[("r2", "a")] == "a" and scc[("r2", "b")] == "b"
    # every vertex got exactly one assignment
    assert len(scc) == 11

    cyc = {(r.repo, r.uri) for r in Q.cycle_nodes(edges).collect()}
    assert cyc == {("r1", "a"), ("r1", "b"), ("r1", "c"),
                   ("r1", "e"), ("r1", "f"), ("r1", "g")}


def test_reachable_with_path_matches_networkx(spark):
    """B17 path recovery (VERDICT r3 #6): distances must equal networkx
    single_source_shortest_path_length, every returned path must be a real
    edge walk seed→node, and the tie-break is the lexicographically
    smallest shortest path (diamond: a→b→d beats a→c→d)."""
    import pytest

    nx = pytest.importorskip("networkx")

    edge_list = [
        ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "a"),  # cycle back
        ("c", "f"), ("f", "g"), ("x", "y"),  # y unreachable from a
    ]
    edges = spark.createDataFrame(
        [("r", s, t) for s, t in edge_list], "repo string, src string, dst string"
    )
    seeds = spark.createDataFrame([("r", "a")], "repo string, uri string")
    got = {r.uri: list(r.path) for r in Q.reachable_with_path(edges, seeds).collect()}

    g = nx.DiGraph(edge_list)
    want = nx.single_source_shortest_path_length(g, "a")
    assert set(got) == set(want)  # same reachable set (incl. seed)
    eset = set(edge_list)
    for node, path in got.items():
        assert len(path) - 1 == want[node]          # shortest length
        assert path[0] == "a" and path[-1] == node  # anchored
        assert all((u, v) in eset for u, v in zip(path, path[1:]))  # real walk
    assert got["a"] == ["a"]            # trivial seed path, nx semantics
    assert got["d"] == ["a", "b", "d"]  # lexmin among the two shortest


def test_scc_chain_of_many_cycles_fully_resolves(spark):
    """Round-3 ADVICE (medium): FW-BW coloring can resolve as little as one
    SCC per round on a chain of non-trivial SCCs, and the old max_outer=10
    silently DROPPED the unresolved tail. A chain of 12 two-node cycles
    (labels increasing downstream — the worst case: only the SCC holding
    the global min resolves each round) must now come back complete."""
    rows = []
    for i in range(12):
        a, b = f"n{i:02d}a", f"n{i:02d}b"
        rows += [("r", a, b), ("r", b, a)]  # 2-cycle i
        if i:
            rows.append(("r", f"n{i-1:02d}a", a))  # bridge from previous cycle
    edges = spark.createDataFrame(rows, "repo string, src string, dst string")
    scc = {r.uri: r.scc for r in Q.strongly_connected_components(edges).collect()}
    assert len(scc) == 24  # nothing vanished
    for i in range(12):
        assert scc[f"n{i:02d}a"] == scc[f"n{i:02d}b"] == f"n{i:02d}a"


def test_circular_dependencies_never_materializes_closure(triples, monkeypatch):
    """B7 must run on SCC (frontier-sized state), not the imports+ closure:
    the closure is O(V*avg-reach) rows on a layered mega-repo even when no
    cycle exists."""
    def _boom(*a, **k):
        raise AssertionError("circular_dependencies called transitive_closure")

    monkeypatch.setattr(Q, "transitive_closure", _boom)
    got = {r.module_uri for r in Q.circular_dependencies(triples).collect()}
    assert got == {
        "http://codebase.local/moduleA.js#module",
        "http://codebase.local/moduleB.js#module",
    }


def test_get_context_depth4_bounded_plan(spark):
    """Deep traversals checkpoint the frontier/visited per hop, so the
    final plan stays bounded instead of nesting one join tree per hop."""
    import contextlib
    import io

    rows = []
    chain = ["u:a", "u:b", "u:c", "u:d", "u:e"]
    for s, o in zip(chain, chain[1:]):
        rows.append(("r", s, "code:calls", o, True, "uri"))
    t = spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, is_uri boolean, dtype string"
    )
    ctx = Q.get_context(t, "u:a", depth=4)
    got = {r.subj for r in ctx.collect()}
    assert got == {"u:a", "u:b", "u:c", "u:d"}  # subjects within 4 hops
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ctx.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ExistingRDD" in plan  # checkpointed state, not a 4-deep join tree


def test_get_context_jobs_and_plan_linear_in_depth(spark):
    """VERDICT r4 #6: regression guard for the multiplicative-plan bug
    class fixed in r3 — the Spark JOB count per extra hop must be a
    constant increment (checkpoint frontier + checkpoint visited +
    isEmpty per hop) and the FINAL plan size must not grow with depth at
    all (each hop reads checkpointed RDD state, not a re-derived join
    tree). Measured via job groups on a 30-node chain."""
    chain = [("g", f"c{i}", "code:calls", f"c{i+1}", True, "uri") for i in range(30)]
    t = spark.createDataFrame(
        chain,
        "repo string, subj string, pred string, obj string, is_uri boolean, dtype string",
    )
    sc = spark.sparkContext

    jobs, plan_lens = {}, {}
    for depth in (4, 6, 8):
        grp = f"ctx_linear_{depth}"
        sc.setJobGroup(grp, "get_context depth sweep")
        try:
            df = Q.get_context(t, "c0", depth=depth)
            assert df.count() == depth + 1  # chain: c0..c<depth>
        finally:
            sc.setJobGroup("ctx_linear_done", "")
        jobs[depth] = len(sc.statusTracker().getJobIdsForGroup(grp))
        plan_lens[depth] = len(df._jdf.queryExecution().optimizedPlan().toString())

    # linear in depth: equal increments per extra hop (±2 jobs of slack
    # for AQE re-optimization variance); measured 12 jobs/hop
    inc_46 = jobs[6] - jobs[4]
    inc_68 = jobs[8] - jobs[6]
    assert inc_46 > 0 and abs(inc_68 - inc_46) <= 2, jobs
    # the multiplicative bug grew the plan with depth; checkpointing
    # makes the final plan depth-independent
    assert plan_lens[8] <= 1.2 * plan_lens[4], plan_lens


def test_betweenness_sampling_error_bound(spark):
    """VERDICT r4 #7: what the sample_sources knob buys. On a
    deterministic 200-node hub graph, Spearman rank correlation between
    sampled and exact (networkx) Brandes betweenness rises with sample
    size; the min-k-of-xxhash64 source sample is deterministic, so these
    floors are stable, not flaky. Measured: ρ ≈ 0.24 / 0.40 / 0.81 at
    8 / 32 / 128 sources."""
    import networkx as nx
    import numpy as np

    n = 200
    raw = set()
    for i in range(n):
        raw.add((i, (i * 7 + 1) % n))
        raw.add((i, (i * 13 + 5) % n))
        if i % 9 == 0:
            raw.add((i, 0))
        if i % 11 == 0:
            raw.add((3, i))
    raw = sorted((f"n{a}", f"n{b}") for a, b in raw if a != b)
    g = nx.DiGraph(raw)
    exact = nx.betweenness_centrality(g, normalized=False)
    nodes = sorted(exact)
    ex = np.array([exact[u] for u in nodes])

    def spearman(a, b):
        def avg_rank(x):
            order = np.argsort(x, kind="stable")
            r = np.empty(len(x))
            r[order] = np.arange(len(x), dtype=float)
            out = np.empty(len(x))
            by_val = {}
            for i, v in enumerate(x):
                by_val.setdefault(v, []).append(i)
            for idx in by_val.values():
                out[idx] = np.mean(r[idx])
            return out

        ra, rb = avg_rank(a), avg_rank(b)
        ra -= ra.mean()
        rb -= rb.mean()
        return float((ra * rb).sum() / np.sqrt((ra * ra).sum() * (rb * rb).sum()))

    edges = spark.createDataFrame(
        [("g", s, d) for s, d in raw], "repo string, src string, dst string"
    )
    floors = {8: 0.15, 32: 0.30, 128: 0.70}
    rhos = {}
    for s, floor in floors.items():
        got = {
            r.uri: r.betweenness
            for r in Q.betweenness_centrality(
                edges, sample_sources=s, max_depth=20
            ).collect()
        }
        gv = np.array([got.get(u, 0.0) for u in nodes])
        rhos[s] = spearman(ex, gv)
        assert rhos[s] >= floor, rhos
    # more sources → strictly better rank agreement on this fixture
    assert rhos[8] < rhos[32] < rhos[128], rhos
