"""Graph query layer: the reference's SPARQL template catalog
(/root/reference/src/graph/query_engine.py:59-162) and graph-store
traversals (graph_store.py:318-390, 630-662) as DataFrame plans.

Conventions: ``t`` is the triples DataFrame (repo, subj, pred, obj, is_uri,
dtype). ``edge(t, p)`` projects one predicate into a narrow (repo, src,
dst) slice that Catalyst prunes and pushes down. All joins are name-based
equi-joins on (repo, <uri col>) so plans stay unambiguous and co-partition
on the same keys; the small name/target dimensions broadcast. Transitive
closure is an iterative frontier join with a visited-set anti-join and
per-iteration localCheckpoint to cut lineage (SURVEY.md §4.1 — Spark has
no recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge(t: DataFrame, pred: str, src: str = "src", dst: str = "dst") -> DataFrame:
    return t.filter(F.col("pred") == pred).select(
        "repo", F.col("subj").alias(src), F.col("obj").alias(dst)
    )


def names(t: DataFrame, uri: str = "uri", name: str = "name") -> DataFrame:
    return t.filter(F.col("pred") == "code:hasName").select(
        "repo", F.col("subj").alias(uri), F.col("obj").alias(name)
    )


def typed(t: DataFrame, rdf_class: str, uri: str = "uri") -> DataFrame:
    return t.filter((F.col("pred") == "rdf:type") & (F.col("obj") == rdf_class)).select(
        "repo", F.col("subj").alias(uri)
    )


# -- B1/B2: call-edge lookups (query_engine.py:62-74) -----------------------

def functions_calling(t: DataFrame, target_name: str) -> DataFrame:
    """Callers of any function named target_name (reverse edge lookup)."""
    calls = edge(t, "code:calls", "caller_uri", "callee_uri")
    target = names(t, "callee_uri").filter(F.col("name") == target_name).drop("name")
    caller_names = names(t, "caller_uri", "caller_name")
    return (
        calls.join(F.broadcast(target), ["repo", "callee_uri"])
        .join(caller_names, ["repo", "caller_uri"])
        .select("repo", "caller_uri", "caller_name")
    )


def functions_called_by(t: DataFrame, source_name: str) -> DataFrame:
    calls = edge(t, "code:calls", "caller_uri", "callee_uri")
    source = names(t, "caller_uri").filter(F.col("name") == source_name).drop("name")
    callee_names = names(t, "callee_uri", "callee_name")
    return (
        calls.join(F.broadcast(source), ["repo", "caller_uri"])
        .join(callee_names, ["repo", "callee_uri"])
        .select("repo", "callee_uri", "callee_name")
    )


# -- B3: classes implementing interface (query_engine.py:76-81) -------------

def classes_implementing(t: DataFrame, interface_name: str) -> DataFrame:
    impl = edge(t, "code:implements", "class_uri", "iface_uri")
    iface = names(t, "iface_uri").filter(F.col("name") == interface_name).drop("name")
    cls_names = names(t, "class_uri", "class_name")
    return (
        impl.join(F.broadcast(iface), ["repo", "iface_uri"])
        .join(cls_names, ["repo", "class_uri"])
        .select("repo", "class_uri", "class_name")
    )


# -- B4: functions in module (query_engine.py:83-89) ------------------------

def functions_in_module(t: DataFrame, module_name: str) -> DataFrame:
    defines = edge(t, "code:defines", "module_uri", "func_uri")
    mod = names(t, "module_uri").filter(F.col("name") == module_name).drop("name")
    funcs = typed(t, "code:Function", "func_uri")
    fn_names = names(t, "func_uri", "func_name")
    return (
        defines.join(F.broadcast(mod), ["repo", "module_uri"])
        .join(funcs, ["repo", "func_uri"])
        .join(fn_names, ["repo", "func_uri"])
        .select("repo", "func_uri", "func_name")
    )


# -- B5: variables accessed by function (query_engine.py:91-97) -------------

def variables_accessed_by(t: DataFrame, func_name: str) -> DataFrame:
    refs = edge(t, "code:references", "func_uri", "var_uri")
    fn = names(t, "func_uri").filter(F.col("name") == func_name).drop("name")
    var_names = names(t, "var_uri", "var_name")
    vars_ = typed(t, "code:Variable", "var_uri")
    return (
        refs.join(F.broadcast(fn), ["repo", "func_uri"])
        .join(vars_, ["repo", "var_uri"])
        .join(var_names, ["repo", "var_uri"])
        .select("repo", "var_uri", "var_name")
    )


# -- B8: database operations string filter (query_engine.py:113-128) --------

def database_operations(t: DataFrame) -> DataFrame:
    """Functions whose resolved callees have db-ish names (CONTAINS/LCASE)."""
    calls = edge(t, "code:calls", "caller_uri", "callee_uri")
    callee_names = names(t, "callee_uri", "callee_name")
    caller_names = names(t, "caller_uri", "caller_name")
    lc = F.lower(F.col("callee_name"))
    cond = (
        lc.contains("query") | lc.contains("select") | lc.contains("insert")
        | lc.contains("update") | lc.contains("delete") | lc.contains("find")
        | lc.contains("save")
    )
    return (
        calls.join(callee_names, ["repo", "callee_uri"])
        .filter(cond)
        .join(caller_names, ["repo", "caller_uri"])
        .select("repo", "caller_uri", "caller_name", "callee_name")
    )


# -- B9: unused functions — anti-join MINUS (query_engine.py:130-138) -------

def unused_functions(t: DataFrame) -> DataFrame:
    funcs = typed(t, "code:Function")
    exported = t.filter(
        (F.col("pred") == "code:isExported") & (F.col("obj") == "true")
    ).select("repo", F.col("subj").alias("uri"))
    called = edge(t, "code:calls").select("repo", F.col("dst").alias("uri"))
    out = funcs.join(exported, ["repo", "uri"], "left_anti").join(
        called, ["repo", "uri"], "left_anti"
    )
    return out.join(names(t), ["repo", "uri"]).select("repo", "uri", "name")


# -- B10/B11: HAVING-style aggregates (query_engine.py:141-161) -------------

def high_complexity_functions(t: DataFrame, min_calls: int = 5) -> DataFrame:
    calls = edge(t, "code:calls", "uri", "callee_uri")
    agg = (
        calls.groupBy("repo", "uri")
        .agg(F.count("*").alias("call_count"))
        .filter(F.col("call_count") > min_calls)
    )
    return agg.join(names(t), ["repo", "uri"]).orderBy(F.desc("call_count"))


def functions_with_many_parameters(t: DataFrame, min_params: int = 4) -> DataFrame:
    params = edge(t, "code:hasParameter", "uri", "param_uri")
    agg = (
        params.groupBy("repo", "uri")
        .agg(F.count("*").alias("param_count"))
        .filter(F.col("param_count") > min_params)
    )
    return agg.join(names(t), ["repo", "uri"]).orderBy(F.desc("param_count"))


# -- closure engine: B6/B7/B15/B17/B18 (SURVEY.md §4.1) ----------------------

def transitive_closure(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """All (repo, src, dst) pairs reachable via ≥1 hops.

    Path-doubling: R_{k+1} = R_k ∪ (R_k ∘ R_k), so a diameter-d graph
    converges in ⌈log2 d⌉ rounds instead of d frontier steps — the
    per-round driver/job overhead is what dominates iterative DataFrame
    loops, and at cluster scale it halves the number of shuffles too.
    New pairs are anti-joined against the known set so cycles terminate;
    localCheckpoint() cuts the exploding lineage. edges: (repo, src, dst).
    """
    visited = edges.select("repo", "src", "dst").dropDuplicates(
        ["repo", "src", "dst"]
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        hop = visited.select("repo", F.col("src").alias("dst"), F.col("dst").alias("nxt"))
        step = (
            visited.join(hop, ["repo", "dst"])
            .select("repo", "src", F.col("nxt").alias("dst"))
            .dropDuplicates(["repo", "src", "dst"])
        )
        new = step.join(visited, ["repo", "src", "dst"], "left_anti").localCheckpoint(
            eager=True
        )
        if new.isEmpty():
            break
        visited = visited.unionByName(new).localCheckpoint(eager=True)
    return visited


def call_chain_between(t: DataFrame, start_name: str, end_name: str) -> DataFrame:
    """B6 (query_engine.py:99-104): intermediates on a calls+ path."""
    closure = transitive_closure(edge(t, "code:calls"))
    start = names(t, "src").filter(F.col("name") == start_name).drop("name")
    end = names(t, "dst").filter(F.col("name") == end_name).drop("name")
    fwd = closure.join(F.broadcast(start), ["repo", "src"]).select(
        "repo", F.col("dst").alias("uri")
    )
    bwd = closure.join(F.broadcast(end), ["repo", "dst"]).select(
        "repo", F.col("src").alias("uri")
    )
    mid = fwd.intersect(bwd)
    return mid.join(names(t), ["repo", "uri"]).select("repo", "uri", "name")


def circular_dependencies(t: DataFrame) -> DataFrame:
    """B7 (query_engine.py:106-111): modules on an imports+ cycle."""
    closure = transitive_closure(edge(t, "code:imports"))
    return (
        closure.filter(F.col("src") == F.col("dst"))
        .select("repo", F.col("src").alias("module_uri"))
        .distinct()
    )


def get_context(t: DataFrame, uri: str, depth: int = 1) -> DataFrame:
    """B15 k-hop neighborhood (graph_store.py:630-662): union of outgoing
    and incoming triples around a URI, iterated to depth. Depth is small
    and user-driven; each hop is two semi-joins against a broadcast
    frontier."""
    link = t.filter(F.col("is_uri") | (F.col("dtype") == "bnode")).select(
        "repo", "subj", "obj"
    )
    frontier = None
    reached = None
    for d in range(max(depth, 1)):
        if frontier is None:
            cond = (F.col("subj") == uri) | (F.col("obj") == uri)
            hop = link.filter(cond)
        else:
            fr = F.broadcast(frontier)
            hop = link.join(
                fr, (link.subj == fr.u) | (link.obj == fr.u)
            ).select("repo", "subj", "obj")
        reached = hop if reached is None else reached.unionByName(hop).distinct()
        frontier = (
            reached.select(F.col("subj").alias("u"))
            .union(reached.select(F.col("obj").alias("u")))
            .distinct()
        )
    members = frontier.withColumnRenamed("u", "subj").distinct()
    return t.join(members, ["subj"]).distinct()


# -- B19: connected components (graph_store.py:364-372; SURVEY §4.2) --------

def connected_components(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """Min-label propagation with pointer jumping over the symmetrized edge
    set (GraphFrames/large-star-style iterative DataFrame joins). Each round
    does (1) a neighbor-min step and (2) a label-of-label jump, so chains of
    length n converge in O(log n) rounds — the per-round job overhead and
    shuffle count, not per-row work, dominate iterative loops. Returns
    (repo, uri, component) with component = min member id.
    """
    sym = (
        edges.select("repo", F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select("repo", F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select("repo", F.col("a").alias("uri"))
        .distinct()
        .withColumn("component", F.col("uri"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # (1) neighbor min
        nbr = sym.select("repo", F.col("b").alias("uri"), F.col("a").alias("nbr_uri"))
        cand = nbr.join(labels, ["repo", "uri"]).select(
            "repo", F.col("nbr_uri").alias("uri"), "component"
        )
        stepped = (
            labels.unionByName(cand)
            .groupBy("repo", "uri")
            .agg(F.min("component").alias("component"))
        )
        # (2) pointer jump: component ← component's component
        parent = stepped.select(
            "repo", F.col("uri").alias("component"), F.col("component").alias("grand")
        )
        jumped = (
            stepped.join(parent, ["repo", "component"], "left")
            .select(
                "repo", "uri",
                F.least(F.col("component"), F.coalesce("grand", "component")).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.withColumnRenamed("component", "new_component")
            .join(labels, ["repo", "uri"])
            .filter(F.col("new_component") != F.col("component"))
        )
        labels = jumped
        if changed.isEmpty():
            break
    return labels


# -- B20: degree centrality / pagerank (graph_store.py:374-390) --------------

def degree_centrality(edges: DataFrame) -> DataFrame:
    out_deg = edges.groupBy("repo", F.col("src").alias("uri")).agg(
        F.count("*").alias("out_degree")
    )
    in_deg = edges.groupBy("repo", F.col("dst").alias("uri")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_deg.join(in_deg, ["repo", "uri"], "full_outer")
        .fillna(0, ["out_degree", "in_degree"])
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
        .orderBy(F.desc("degree"))
    )


def pagerank(edges: DataFrame, iters: int = 10, damping: float = 0.85) -> DataFrame:
    """Iterative join-aggregate pagerank over (repo, src, dst) edges."""
    verts = (
        edges.select("repo", F.col("src").alias("uri"))
        .unionByName(edges.select("repo", F.col("dst").alias("uri")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out_deg = edges.groupBy("repo", F.col("src").alias("uri")).agg(
        F.count("*").alias("deg")
    )
    links = (
        edges.withColumnRenamed("src", "uri")
        .join(out_deg, ["repo", "uri"])
        .select("repo", F.col("uri").alias("src"), "dst", "deg")
        .localCheckpoint(eager=True)
    )
    ranks = verts.withColumn("rank", F.lit(1.0))
    for _ in range(iters):
        contribs = (
            links.join(ranks.withColumnRenamed("uri", "src"), ["repo", "src"])
            .select("repo", F.col("dst").alias("uri"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("repo", "uri")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            verts.join(contribs, ["repo", "uri"], "left")
            .fillna(0.0, ["c"])
            .select(
                "repo", "uri",
                (F.lit(1 - damping) + F.lit(damping) * F.col("c")).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.orderBy(F.desc("rank"))


# -- B13: pattern match (query_engine.py:208-246, 433-483) -------------------

def pattern_match(
    t: DataFrame,
    node_type: str | None = None,
    name_regex: str | None = None,
    edge_pred: str | None = None,
) -> DataFrame:
    """Programmatic builder: type filter + rlike name filter + optional edge
    constraint — the DataFrame analogue of _pattern_to_sparql."""
    base = names(t)
    if node_type:
        base = base.join(typed(t, node_type), ["repo", "uri"])
    if name_regex:
        base = base.filter(F.col("name").rlike(name_regex))
    if edge_pred:
        e = edge(t, edge_pred, "uri", "target")
        base = base.join(e, ["repo", "uri"])
    return base


# -- B18: bounded all-simple-paths (graph_store.py:350-362) ------------------

def simple_paths(edges: DataFrame, src_uri: str, dst_uri: str, cutoff: int = 4) -> DataFrame:
    """All simple paths src→dst up to `cutoff` hops: iterative frontier join
    carrying an array-typed path column with an array_contains cycle guard
    (the DataFrame analogue of nx.all_simple_paths)."""
    base = edges.select("repo", "src", "dst")
    frontier = base.filter(F.col("src") == src_uri).select(
        "repo", F.col("dst").alias("head"), F.array(F.col("src"), F.col("dst")).alias("path")
    )
    found = frontier.filter(F.col("head") == dst_uri).select("repo", "path")
    for _ in range(cutoff - 1):
        frontier = (
            frontier.filter(F.col("head") != dst_uri)
            .join(base.select("repo", F.col("src").alias("head"), F.col("dst").alias("nxt")),
                  ["repo", "head"])
            .filter(~F.array_contains("path", F.col("nxt")))
            .select("repo", F.col("nxt").alias("head"),
                    F.array_append("path", F.col("nxt")).alias("path"))
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        found = found.unionByName(
            frontier.filter(F.col("head") == dst_uri).select("repo", "path")
        )
    return found.withColumn("length", F.size("path") - 1)


# -- B21: density / triangle / clustering stats (graph_store.py:432-455) -----

def graph_density_stats(edges: DataFrame) -> DataFrame:
    """Per-repo node/edge counts, density (directed), and triangle count via
    a 2-hop join closed by a third edge (each triangle counted once by
    ordering its vertices)."""
    sym = (
        edges.select("repo", F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select("repo", F.col("dst").alias("a"), F.col("src").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    ordered = sym.filter(F.col("a") < F.col("b"))
    tri = (
        ordered.alias("e1")
        .join(
            ordered.select("repo", F.col("a").alias("b"), F.col("b").alias("c")).alias("e2"),
            ["repo", "b"],
        )
        .join(
            ordered.select("repo", F.col("a").alias("a2"), F.col("b").alias("c")).alias("e3"),
            ["repo", "c"],
        )
        .filter(F.col("a") == F.col("a2"))
        .groupBy("repo")
        .agg(F.count("*").alias("triangles"))
    )
    nodes = (
        sym.select("repo", F.col("a").alias("uri")).distinct()
        .groupBy("repo").agg(F.count("*").alias("n_nodes"))
    )
    n_edges = ordered.groupBy("repo").agg(F.count("*").alias("n_edges"))
    out = (
        nodes.join(n_edges, "repo", "left")
        .join(tri, "repo", "left")
        .fillna(0, ["n_edges", "triangles"])
        .withColumn(
            "density",
            F.when(
                F.col("n_nodes") > 1,
                F.round(2.0 * F.col("n_edges") / (F.col("n_nodes") * (F.col("n_nodes") - 1)), 6),
            ).otherwise(F.lit(0.0)),
        )
    )
    return out
