"""Property-based robustness for the hand-written parsers (SURVEY §5's
"never crash on garbage" requirement, hypothesis edition).

The extraction UDF runs these pure-Python parsers over every file of a
100 TB crawl; a single unhandled exception in a worker fails the whole
task, so total-ness on arbitrary input IS the production contract. No
SparkSession needed — parsers are plain functions, so hundreds of
examples run in seconds.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from codeontology_spark.fallback import extract_file_fallback
from codeontology_spark.jsparse import extract_file
from codeontology_spark.ops.multimodal import _parse_header

# text biased toward JS-meaningful characters so the scanner's state
# machine is actually exercised (pure random unicode rarely leaves the
# default state), mixed with arbitrary unicode
_jsish = st.lists(
    st.sampled_from(
        list("abcxyz_$ (){}[];:,.='\"`\\\n\t*/+-!?<>&|%^~#@0123456789")
        + ["function ", "class ", "import ", "export ", "const ", "=>", "/*", "*/", "//", "\n"]
    ),
    max_size=120,
).map("".join)
_any_text = st.one_of(_jsish, st.text(max_size=200))


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(content=_any_text)
def test_jsparse_total_on_arbitrary_text(content):
    ents = extract_file("f.js", content)
    # structural invariants the emission layer relies on
    assert ents, "module row must always exist"
    assert ents[0].kind == "module"
    uris = [e.uri for e in ents]
    assert len(set(uris)) == len(uris)  # URI-deduped
    for e in ents:
        assert e.uri and e.line >= 1 and e.col >= 0
        assert isinstance(e.kind, str) and e.kind


@settings(max_examples=200, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(content=_any_text)
def test_fallback_parser_total_on_arbitrary_text(content):
    ents = extract_file_fallback("f.js", content)
    for e in ents:
        assert e.uri and e.line >= 1


def test_parsers_total_on_every_truncation_of_real_constructs():
    """Deterministic EOF-robustness sweep: every prefix of realistic JS/TS
    constructs must parse without raising (a crawl truncates files at
    arbitrary byte offsets all the time). This is the class of bug the
    hypothesis run found (bare `export` at EOF → IndexError)."""
    real = [
        "export default async function f(a, b) { return a; }",
        "export { a as b, c };",
        "import { x, y as z } from './m';",
        "class A extends B { constructor(x) { super(x); } get v() {} }",
        "const f = async (a = {b: [1,2]}) => ({...a});",
        "interface I<T extends U> { m(x: T): void; }",
        "/** doc */ // line\nfunction g() { h(i, j(k)); }",
        "const s = `tpl ${x + `${y}`} end`;",
    ]
    for src in real:
        for cut in range(len(src) + 1):
            extract_file("f.ts", src[:cut])
            extract_file_fallback("f.ts", src[:cut])


@settings(max_examples=300, deadline=None)
@given(payload=st.one_of(st.none(), st.binary(max_size=128)))
def test_media_header_parser_total_on_arbitrary_bytes(payload):
    out = _parse_header(payload)
    assert out["format"] in ("png", "wav", "unknown")
    if out["format"] == "unknown":
        assert out["width"] is None and out["sample_rate_hz"] is None
