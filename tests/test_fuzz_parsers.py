"""Property-based robustness for the hand-written parsers (SURVEY §5's
"never crash on garbage" requirement, hypothesis edition).

The extraction UDF runs these pure-Python parsers over every file of a
100 TB crawl; a single unhandled exception in a worker fails the whole
task, so total-ness on arbitrary input IS the production contract. No
SparkSession needed — parsers are plain functions, so hundreds of
examples run in seconds.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from codeontology_spark.fallback import extract_file_fallback
from codeontology_spark.jsparse import extract_file
from codeontology_spark.ops.multimodal import _parse_header, _wav_pcm_stats
from codeontology_spark.rdfio import nt_unescape_full
from codeontology_spark.turtle import TurtleSyntaxError, parse_turtle

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


# RIFF-biased bytes so the WAV chunk walker actually runs (pure random
# bytes almost never start with a valid RIFF/WAVE header)
_riffish = st.binary(max_size=96).map(lambda b: b"RIFF" + b[:4] + b"WAVE" + b[4:])


@settings(max_examples=300, deadline=None)
@given(payload=st.one_of(st.none(), st.binary(max_size=128), _riffish))
def test_wav_sample_decoder_total_on_arbitrary_bytes(payload):
    """decode_wav_samples' per-row core: any byte soup → a stats dict,
    never an exception; garbage yields all-nulls, and whenever frames ARE
    decoded the aggregate invariants hold."""
    out = _wav_pcm_stats(payload)
    if out["n_frames"] is None:
        assert out["sum_amp"] is None and out["min_amp"] is None
    else:
        assert out["n_frames"] >= 0 and out["n_channels"] >= 1
        if out["n_frames"] > 0:
            assert out["min_amp"] <= out["max_amp"]
            assert out["sum_sq"] >= 0
            n = out["n_frames"] * out["n_channels"]
            assert out["min_amp"] * n <= out["sum_amp"] <= out["max_amp"] * n


# ------------------------------------------------------------- RDF parsers


@settings(max_examples=300, deadline=None)
@given(s=st.text(max_size=120))
def test_nt_unescape_total_on_arbitrary_text(s):
    """The .nt literal unescaper runs inside a distributed read; it must
    be total (lenient contract: malformed escapes stay raw) and can only
    shrink or preserve length (every escape is >= 1 char shorter)."""
    out = nt_unescape_full(s)
    assert isinstance(out, str) and len(out) <= len(s)
    if "\\" not in s:
        assert out == s


def test_nt_unescape_known_escapes():
    assert nt_unescape_full("a\\u00e9b") == "aéb"
    assert nt_unescape_full("\\U0001F680") == "\U0001F680"
    # escaped backslash consumes the '\': the following "u0041" stays raw
    assert nt_unescape_full(r"x\\u0041") == "x\\" + "u0041"
    assert nt_unescape_full(r"\n\t\"\\") == '\n\t"\\'
    # malformed: bad hex, lone surrogate, out-of-range — all kept raw
    assert nt_unescape_full(r"\uZZZZ") == r"\uZZZZ"
    assert nt_unescape_full(r"\uD800") == r"\uD800"
    assert nt_unescape_full(r"\U00110000") == r"\U00110000"
    assert nt_unescape_full("tail\\") == "tail\\"


# Turtle-biased alphabet: directives, punctuation, quotes, pnames — pure
# random unicode would die in the tokenizer's first match and never reach
# the grammar
_turtleish = st.lists(
    st.sampled_from(
        list(" \n.;,[]()<>\"'^^@:#0-9a")
        + ["@prefix ", "PREFIX ", "code:", "xsd:", "<http://x/y>", '"lit"',
           "^^", "@en", "_:b0", "true", "42", "3.14", "a ", "[ ", " ]", "( ", " )"]
    ),
    max_size=60,
).map("".join)


@settings(max_examples=400, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(doc=st.one_of(_turtleish, st.text(max_size=150)))
def test_turtle_parser_raises_only_typed_errors(doc):
    """parse_turtle runs one-file-per-task in read_turtle; on arbitrary
    input it must either return well-formed rows or raise the TYPED
    TurtleSyntaxError — never IndexError/RecursionError/struct garbage
    that would escape a caller's except clause."""
    try:
        rows = parse_turtle(doc, bnode_seed="fuzz")
    except TurtleSyntaxError:
        return
    for s, p, o, is_uri, dt in rows:
        assert isinstance(s, str) and s
        assert isinstance(p, str) and p
        assert isinstance(o, str)
        assert isinstance(is_uri, bool) and isinstance(dt, str) and dt
        if dt == "bnode":
            assert o.startswith("_:b") and not is_uri
        if is_uri:
            assert dt == "uri"


def test_turtle_parser_total_on_every_truncation_of_real_docs():
    """EOF-robustness sweep mirroring the jsparse one: every prefix of
    realistic Turtle (the constructs the reference's dumps and the OWL
    file actually use) parses or raises TurtleSyntaxError."""
    real = [
        '@prefix code: <http://codeontology.org/> .\n'
        '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n'
        '<http://x/f> a code:Function ;\n'
        '    code:hasName "caf\\u00e9"^^xsd:string ;\n'
        '    code:locatedAt [ a code:SourceLocation ; code:lineNumber 7 ] ;\n'
        '    code:hasArgument [ code:argumentPosition 0 ], [ code:argumentPosition 1 ] .\n',
        'PREFIX owl: <http://www.w3.org/2002/07/owl#>\n'
        'PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>\n'
        '<http://x/P> a owl:ObjectProperty ;\n'
        '    rdfs:range [ a owl:Class ; owl:unionOf ( <http://x/A> <http://x/B> ) ] .\n',
        '@base <http://base/> .\n<rel> <p> "multi\nline"@en .\n'.replace(
            '"multi\nline"', '"""multi\nline"""'
        ),
    ]
    for doc in real:
        for cut in range(len(doc) + 1):
            try:
                parse_turtle(doc[:cut], bnode_seed="t")
            except TurtleSyntaxError:
                pass


def test_turtle_parser_depth_bounded():
    """Adversarial nesting raises the typed error, not RecursionError."""
    deep = "@prefix e: <http://e/> .\ne:s e:p " + "[ e:q " * 300 + "e:o" + " ]" * 300 + " ."
    with pytest.raises(TurtleSyntaxError, match="nesting"):
        parse_turtle(deep)
    deep_coll = "@prefix e: <http://e/> .\ne:s e:p " + "( " * 300 + ") " * 300 + "."
    with pytest.raises(TurtleSyntaxError, match="nesting"):
        parse_turtle(deep_coll)
