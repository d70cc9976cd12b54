"""Parser unit tests — expectations hand-derived from the reference's own
test assertions (/root/reference/tests/test_pipeline.py) and its extraction
semantics (ast_parser.py tree-sitter path)."""

from codeontology_spark.fixtures import FIXTURES, perf50
from codeontology_spark.jsparse import extract_file, mint_uri, safe_name, sha16


def ents_of(fx, path):
    return extract_file(path, FIXTURES[fx][path])


def by_kind(ents, kind):
    return [e for e in ents if e.kind == kind]


def test_uri_minting():
    assert safe_name("<arrow_function>") == "_arrow_function_"
    assert mint_uri("a/b.js", "module", "x", 9) == "http://codebase.local/a/b.js#module"
    assert (
        mint_uri("a/b.js", "function", "foo", 3)
        == "http://codebase.local/a/b.js#function_foo_3"
    )
    # parameter quirk: URIs minted with empty path
    assert mint_uri("", "parameter", "b", 124) == "http://codebase.local/#parameter_b_124"


def test_simple5_functions():
    """test_pipeline.py:38-100: 5 named functions + intra-file calls."""
    ents = ents_of("simple5", "simple.js")
    funcs = by_kind(ents, "function")
    assert {f.name for f in funcs} == {"add", "subtract", "multiply", "divide", "calculate"}
    calc = next(f for f in funcs if f.name == "calculate")
    called = {c.rsplit("_", 2)[0].rsplit("#", 1)[1] + "" for c in calc.calls}
    assert len(calc.calls) == 4
    # calls resolve to the four operations
    names = {c.split("#function_")[1].rsplit("_", 1)[0] for c in calc.calls}
    assert names == {"add", "subtract", "multiply", "divide"}
    # params: 2+2+2+2+3, URIs lack the file path
    params = by_kind(ents, "parameter")
    assert len(params) == 11
    assert all(p.uri.startswith("http://codebase.local/#parameter_") for p in params)
    # module rollup: defines all five functions
    mod = by_kind(ents, "module")[0]
    assert len(mod.functions) == 5
    # `new Error(...)` must NOT create a call; `switch(op)` is excluded
    callees = {c.callee_name for c in by_kind(ents, "call")}
    assert callees == {"add", "subtract", "multiply", "divide"}


def test_imports2():
    """test_pipeline.py:102-160."""
    utils = ents_of("imports2", "utils.js")
    main = ents_of("imports2", "main.js")
    assert {f.name for f in by_kind(utils, "function")} == {"formatString", "validateEmail"}
    # const CONSTANTS is a lexical_declaration — never a Variable entity
    assert by_kind(utils, "variable") == []
    assert len(by_kind(utils, "export")) == 3
    imp = by_kind(main, "import")[0]
    assert imp.module_path == "./utils.js"
    assert imp.imported_symbols == ["formatString", "validateEmail", "CONSTANTS"]
    assert imp.name == "import_utils"
    # module-to-module import edge resolves by path math
    mod = by_kind(main, "module")[0]
    assert mod.imports == ["http://codebase.local/utils.js#module"]
    # chained member call produces nested call entities like tree-sitter
    callees = {c.callee_name for c in by_kind(utils, "call")}
    assert callees == {"str.trim", "str.trim().toLowerCase", "regex.test"}


def test_inherit3():
    """test_pipeline.py:162-234: classes + methods; extends stays a bare
    name (quirk §1.3-6) so no extends edge is linkable."""
    base = ents_of("inherit3", "base.js")
    animals = ents_of("inherit3", "animals.js")
    assert {c.name for c in by_kind(base, "class")} == {"Animal"}
    assert {c.name for c in by_kind(animals, "class")} == {"Dog", "Cat"}
    dog = next(c for c in by_kind(animals, "class") if c.name == "Dog")
    assert dog.extends_name == "Animal"
    assert len(dog.methods) == 3  # constructor, speak, wagTail
    meths = by_kind(animals, "method")
    assert {m.name for m in meths} == {"constructor", "speak", "wagTail", "climb"}
    # method params are never emitted as entities (ast_parser.py:400-402)
    assert by_kind(animals, "parameter") == []
    # super(...) is a call attributed to the class (current_class context)
    sup = [c for c in by_kind(animals, "call") if c.callee_name == "super"]
    assert len(sup) == 2
    assert all(c.caller_uri.endswith(("#class_Dog_4", "#class_Cat_19")) for c in sup)


def test_layers3_userservice():
    """test_pipeline.py:609-626: UserService methods."""
    svc = ents_of("layers3", "userService.js")
    cls = by_kind(svc, "class")[0]
    assert cls.name == "UserService"
    names = {m.name for m in by_kind(svc, "method")}
    assert names == {"getUsers", "createUser", "modifyUser", "removeUser"}
    assert len(cls.methods) == 4
    # async methods detected
    assert all(m.is_async for m in by_kind(svc, "method"))


def test_nextjs_async_and_arrows():
    """test_pipeline.py:274-390: async functions + arrows + JSX survival."""
    api = ents_of("nextjs_mini", "lib/api.js")
    funcs = by_kind(api, "function")
    byname = {f.name: f for f in funcs}
    assert byname["fetchPosts"].is_async
    assert byname["getStaticProps"].is_async
    # the posts.map(post => ({...})) arrow
    arrows = [f for f in funcs if f.is_arrow]
    assert len(arrows) == 1 and arrows[0].name == "<arrow_function>"
    header = ents_of("nextjs_mini", "components/Header.jsx")
    # destructured param ({ title }) is an object_pattern — no parameters
    assert by_kind(header, "parameter") == []
    assert {i.module_path for i in by_kind(header, "import")} == {"react", "next/link"}
    # non-relative imports produce no module-import edges
    assert by_kind(header, "module")[0].imports == []


def test_export_names_and_types():
    """Export naming: export_{node.text[:50]} (ast_parser.py:663-683)."""
    utils = ents_of("imports2", "utils.js")
    exps = by_kind(utils, "export")
    assert all(e.export_type == "named" for e in exps)
    assert any(e.name.startswith("export_export function formatString(str)") for e in exps)
    idx = ents_of("nextjs_mini", "pages/index.js")
    exps = {e.export_type for e in by_kind(idx, "export")}
    assert exps == {"named", "default"}
    dflt = next(e for e in by_kind(idx, "export") if e.export_type == "default")
    # default export of a declaration: symbol is the declaration text[:50]
    assert dflt.name.startswith("export_function HomePage")


def test_circular2_import_edges():
    a = ents_of("circular2", "moduleA.js")
    b = ents_of("circular2", "moduleB.js")
    assert by_kind(a, "module")[0].imports == ["http://codebase.local/moduleB.js#module"]
    assert by_kind(b, "module")[0].imports == ["http://codebase.local/moduleA.js#module"]


def test_perf50_shape():
    files = perf50()
    assert len(files) == 50
    ents = extract_file("file_3.js", files["file_3.js"])
    assert {f.name for f in by_kind(ents, "function")} == {"function_3_1", "function_3_2"}
    assert len(by_kind(ents, "export")) == 1


def test_body_hash_is_sha256_prefix():
    ents = ents_of("simple5", "simple.js")
    mod = by_kind(ents, "module")[0]
    assert mod.body_hash == sha16(FIXTURES["simple5"]["simple.js"])
    add = next(f for f in by_kind(ents, "function") if f.name == "add")
    src = FIXTURES["simple5"]["simple.js"]
    # node text spans 'function' .. closing brace
    start = src.index("function add")
    end = src.index("}", src.index("return a + b;")) + 1
    assert add.body_hash == sha16(src[start:end])


def test_validation2_call_resolution():
    v = ents_of("validation2", "validation.js")
    caller = next(f for f in by_kind(v, "function") if f.name == "callerFunction")
    target = next(f for f in by_kind(v, "function") if f.name == "targetFunction")
    assert caller.calls == [target.uri]
    repo_cls = by_kind(v, "class")[0]
    assert repo_cls.name == "TestRepository"
    assert {m.name for m in by_kind(v, "method")} == {"constructor", "save"}


def test_namespace_import_has_no_symbols():
    """ADVICE r1: `import * as ns from './x'` — the reference's
    import_clause.find_child('identifier') is direct-children-only, so a
    namespace import records NO imported symbols (the alias lives inside
    the namespace_import node)."""
    ents = extract_file("a.js", "import * as ns from './x.js';\nns.go();\n")
    imp = [e for e in ents if e.kind == "import"][0]
    assert imp.imported_symbols == []
    # default + namespace combined: only the default identifier records
    ents2 = extract_file("b.js", "import dflt, * as ns from './x.js';\n")
    imp2 = [e for e in ents2 if e.kind == "import"][0]
    assert imp2.imported_symbols == ["dflt"]


def test_ts_interface_and_type_alias():
    src = (
        "export interface A { x: number; }\n"
        "type B = { y: string };\n"
        "export type C = A | B;\n"
    )
    ents = extract_file("t.ts", src)
    ifaces = {e.name: e for e in ents if e.kind == "interface"}
    assert set(ifaces) == {"A", "B", "C"}
    assert ifaces["A"].uri.endswith("#interface_A_1")
    assert ifaces["C"].line == 3
    # the same text in a .js file parses with the JS grammar: no interfaces
    assert [e for e in extract_file("t.js", src) if e.kind == "interface"] == []


def test_object_literal_methods():
    src = "const api = {\n  run(x) { helper(x); },\n  get size() { return 1; },\n};\nfunction helper(v) {}\n"
    ents = extract_file("o.js", src)
    methods = {e.name: e for e in ents if e.kind == "method"}
    assert set(methods) == {"run", "size"}
    assert methods["run"].parent_class_uri is None
    # the method-looking tokens must NOT also produce call entities
    calls = [e.callee_name for e in ents if e.kind == "call"]
    assert calls == ["helper"]


def test_iife_callee_is_parenthesized_expression():
    src = "(function boot() { go(); })();\nfunction go() {}\n(() => { go(); })();\n"
    ents = extract_file("i.js", src)
    calls = [e for e in ents if e.kind == "call"]
    texts = sorted(c.callee_name for c in calls)
    assert "go" in texts
    iife = [c for c in calls if c.callee_name.startswith("(")]
    assert len(iife) == 2  # children[0].text incl. parens (ast_parser.py:709-710)
    assert any("function boot()" in c.callee_name for c in iife)
    # control parens never become callees
    ents2 = extract_file("c.js", "if (x) (y);\n")
    assert [e for e in ents2 if e.kind == "call"] == []


def test_interface_extends_generic_object_literal():
    """ADVICE r2: the extends clause's <...> type arguments may contain a
    '{' (object-literal type) — the body scan must skip balanced generics,
    and a type-only body must emit no call entities."""
    src = "interface Foo extends Bar<{x: number}> { greet(msg: string): void; }\n"
    ents = extract_file("t.ts", src)
    ifaces = by_kind(ents, "interface")
    assert [i.name for i in ifaces] == ["Foo"]
    assert by_kind(ents, "call") == []  # no phantom call_greet


def test_spread_position_object_literal_method():
    """ADVICE r2: `f(...{run(){}})` — object-literal methods in spread
    position were skipped because the lexer never emits a '...' token."""
    src = "function f(x) { return x; }\nf({ ...{ run() { return 1; } } });\n"
    ents = extract_file("s.js", src)
    assert "run" in {e.name for e in by_kind(ents, "method")}


def test_nullish_coalescing_lexes_as_one_token():
    """`a ?? {}` must not mis-scan; '??' is now a single punct token and a
    valid object-literal predecessor."""
    src = "const v = a ?? { run() { return 2; } };\nfunction g() {}\n"
    ents = extract_file("n.js", src)
    assert "run" in {e.name for e in by_kind(ents, "method")}
    assert "g" in {e.name for e in by_kind(ents, "function")}
