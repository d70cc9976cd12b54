"""Regex-fallback extraction mode (A6): the reference's degraded path when
tree-sitter grammars are unavailable (ast_parser.py:139-305), re-expressed
over this engine's Ent rows.

This mode exists for BEHAVIORAL parity, quirks included — it is what a
reference user gets in an environment without tree-sitter, and it is the
one parser path we can EXECUTE from /root/reference in this sandbox, so
tests/test_ref_ground_truth.py compares this module's output against the
actually-running reference code file-by-file (entities AND triples).

Reproduced quirks (all executed-reference-verified, none "fixed"):
- `export function f` is NOT extracted (func regex must start at
  `function`, ast_parser.py:153); the export scan only flips is_exported
  on functions found by the main regex (:210-222).
- Method scan inside a class block has no keyword filter, so `if (x) {`
  at statement start inside a class body becomes a "method" named `if`
  (:155, 256).
- Method call-scan starts at class_block.find('{', mm.end()) — mm already
  consumed the method's opening brace, so calls are collected from the
  next nested '{...}' block (or nowhere), not the method body (:275).
- Imports create Import entities but are NOT linked into module.imports —
  no code:imports triples on this path (:225-233).
- Parameter URIs use the real file path (no empty-path minting quirk —
  that quirk is tree-sitter-path-only, :176 vs :736-760).
- Call resolution is by bare name over a last-wins dict of all
  functions+methods; duplicates in a body append duplicate call URIs
  (:295-303); emission dedups them (rdflib Graph set semantics).
"""

from __future__ import annotations

import posixpath
import re

from .jsparse import Ent, mint_uri, sha16

_FUNC = re.compile(r"^\s*function\s+([A-Za-z_][\w]*)\s*\(([^)]*)\)", re.MULTILINE)
_CLASS = re.compile(r"^\s*class\s+([A-Za-z_][\w]*)\s*\{", re.MULTILINE)
_METHOD = re.compile(r"^\s*([A-Za-z_#][\w]*)\s*\(([^)]*)\)\s*\{", re.MULTILINE)
_IMPORT = re.compile(r"^\s*import\s+[^;]*?from\s+['\"]([^'\"]+)['\"]", re.MULTILINE)
_EXPORT_FUNC = re.compile(r"^\s*export\s+function\s+([A-Za-z_][\w]*)", re.MULTILINE)
_EXPORT_DEFAULT_FUNC = re.compile(
    r"^\s*export\s+default\s+function\s+([A-Za-z_][\w]*)?", re.MULTILINE
)
_CALL = re.compile(r"\b([A-Za-z_][\w]*)\s*\(")
_CALL_KEYWORDS = {"if", "for", "while", "switch", "catch", "function", "class",
                  "return", "console"}


def _line_of(src: str, off: int) -> int:
    return src.count("\n", 0, off) + 1


def _param_names(params_text: str) -> list[str]:
    """Parameter-name sanitization of ast_parser.py:170-176 (defaults and
    destructuring wrappers stripped; empties dropped)."""
    out = []
    for p in params_text.split(","):
        p = p.strip()
        if not p:
            continue
        pname = p.split("=")[0].strip().strip("{}[]() ")
        if pname:
            out.append(pname)
    return out


def _brace_block(src: str, open_at: int) -> str:
    """Text from the '{' at open_at to its matching '}' (exclusive), or to
    EOF when unbalanced — the naive counter of ast_parser.py:190-201."""
    depth = 1
    i = open_at + 1
    n = len(src)
    while i < n and depth > 0:
        c = src[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        i += 1
    return src[open_at:i - 1] if depth == 0 else src[open_at:]


def _call_names(body: str) -> list[str]:
    return [
        m.group(1) for m in _CALL.finditer(body)
        if m.group(1) not in _CALL_KEYWORDS
    ]


def extract_file_fallback(path: str, src: str) -> list[Ent]:
    """One file → entity rows under regex-fallback semantics."""
    module = Ent(
        kind="module",
        name=posixpath.splitext(posixpath.basename(path))[0],
        uri=mint_uri(path, "module", "", 1),
        line=1,
        col=0,
        body_hash=sha16(src),
        module_type="commonjs",
    )
    ents: list[Ent] = [module]
    pending_calls: list[tuple[Ent, list[str]]] = []

    # top-level function declarations (+ their params, params appended first)
    for m in _FUNC.finditer(src):
        line = _line_of(src, m.start())
        for pname in _param_names(m.group(2)):
            ents.append(Ent(
                kind="parameter", name=pname,
                uri=mint_uri(path, "parameter", pname, line),
                line=line, col=0,
            ))
        fn = Ent(
            kind="function", name=m.group(1),
            uri=mint_uri(path, "function", m.group(1), line),
            line=line, col=0, scope="global",
            body_hash=sha16(m.group(0)),
        )
        ents.append(fn)
        module.functions.append(fn.uri)
        brace = src.find("{", m.end())
        if brace != -1:
            pending_calls.append((fn, _call_names(_brace_block(src, brace))))

    # export markers flip is_exported on already-found functions only
    exported = {m.group(1) for m in _EXPORT_FUNC.finditer(src)}
    exported |= {m.group(1) for m in _EXPORT_DEFAULT_FUNC.finditer(src) if m.group(1)}
    fn_by_name = {e.name: e for e in ents if e.kind == "function"}
    for name in exported:
        if name in fn_by_name:
            fn_by_name[name].is_exported = True

    # import entities (module.imports deliberately untouched on this path)
    for m in _IMPORT.finditer(src):
        spec = m.group(1)
        line = _line_of(src, m.start())
        name = f"import_{posixpath.splitext(posixpath.basename(spec))[0]}"
        ents.append(Ent(
            kind="import", name=name,
            uri=mint_uri(path, "import", name, line),
            line=line, col=0, module_path=spec, import_type="named",
        ))

    # classes and their "methods" (keyword-free scan, see module docstring)
    for cm in _CLASS.finditer(src):
        line = _line_of(src, cm.start())
        cls = Ent(
            kind="class", name=cm.group(1),
            uri=mint_uri(path, "class", cm.group(1), line),
            line=line, col=0, body_hash=sha16(cm.group(0)),
        )
        ents.append(cls)
        module.classes.append(cls.uri)
        block = _brace_block(src, cm.end() - 1)[1:]  # text after class '{'
        block_off = cm.end()
        for mm in _METHOD.finditer(block):
            mline = _line_of(src, block_off + mm.start())
            for pname in _param_names(mm.group(2)):
                ents.append(Ent(
                    kind="parameter", name=pname,
                    uri=mint_uri(path, "parameter", pname, mline),
                    line=mline, col=0,
                ))
            meth = Ent(
                kind="method", name=mm.group(1),
                uri=mint_uri(path, "method", mm.group(1), mline),
                line=mline, col=0, scope="global",
                parent_class_uri=cls.uri,
            )
            ents.append(meth)
            cls.methods.append(meth.uri)
            # call scan starts AFTER the method's own '{' was consumed by
            # the regex: only a nested '{...}' block gets scanned (quirk)
            inner = block.find("{", mm.end())
            if inner != -1:
                pending_calls.append((meth, _call_names(_brace_block(block, inner))))

    # name-based call resolution (last-wins dict, duplicates preserved)
    by_name: dict[str, Ent] = {
        e.name: e for e in ents if e.kind in ("function", "method")
    }
    for ent, names in pending_calls:
        for callee_name in names:
            target = by_name.get(callee_name)
            if target is not None:
                ent.calls.append(target.uri)

    return ents
