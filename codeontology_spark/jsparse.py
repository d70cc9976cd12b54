"""Structural JavaScript/TypeScript extractor (pure Python, Arrow-UDF ready).

Produces, for one source file, the flat entity rows that the reference
pipeline's tree-sitter path produces as Pydantic objects
(/root/reference/src/parsers/ast_parser.py:307-830 +
/root/reference/src/models/code_entities.py). This module is deliberately
dependency-free so it can run inside a vectorized ``mapInPandas`` stage on
every executor.

It is NOT a port of the reference (which drives a tree-sitter CST); it is a
single-pass token scanner that recognises exactly the constructs the
reference's dispatch table handles — function_declaration, arrow_function,
class_declaration, method_definition, variable_declaration (``var`` only —
the reference never matches tree-sitter's ``lexical_declaration`` for
const/let, see ast_parser.py:404 and the zero code:Variable count in its
shipped TTL dumps), import_statement, export_statement, call_expression —
and reproduces the reference's *observed emission semantics*, including its
fidelity-critical quirks (SURVEY.md §1.3):

* parameter URIs are minted before the file path is backfilled
  (ast_parser.py:58-66 file_path="" + code_entities.py:43-45 post-init),
  so they look like ``http://codebase.local/#parameter_b_124``;
* ``_check_export_status`` is a stub returning (False, False)
  (ast_parser.py:769-772) — every entity carries isExported=false;
* ``extends`` targets are bare class names, never URIs, so the
  ``code:extends`` edge never fires (ontology_builder.py:317-318);
* method parameters are parsed but never appended to the entity list
  (ast_parser.py:400-402 vs :357-366), so only function/arrow parameters
  are emitted;
* ``func.parameter_uris = ...`` raises on the Pydantic model and is
  swallowed (ast_parser.py:463-466), so ``code:hasParameter`` is never
  emitted;
* call expressions inside class method bodies are attributed to the CLASS
  (ast_parser.py:712-717: current_function is never set for methods);
* duplicate extraction passes in the reference produce same-URI entity
  copies that its URI cache collapses keeping the first (context-ful) copy
  (ontology_builder.py:79-82) — this scanner visits once with the same
  contexts, which yields the identical surviving entity set.
"""

from __future__ import annotations

import hashlib
import posixpath
import re
from dataclasses import dataclass, field

BASE = "http://codebase.local/"

# Keywords that can precede '(' without forming a call_expression node.
_NONCALL_KEYWORDS = {
    "if", "for", "while", "switch", "catch", "return", "function", "class",
    "do", "else", "typeof", "instanceof", "in", "of", "delete", "void",
    "throw", "case", "with", "await", "yield", "new", "var", "let", "const",
}

# keywords whose following '(...)' is statement/new syntax, so a trailing
# argument list does NOT make the paren group a callee (`if (a) (b)` has no
# call node; `return (f)(x)` does)
_CONTROL_PAREN_KEYWORDS = {"if", "for", "while", "switch", "catch", "with", "new"}

_ID_RE = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
_SAFE_RE = re.compile(r"[^A-Za-z0-9_]+")

# Tokens after which a '/' starts a regex literal rather than division.
# '<' and '>' deliberately excluded so JSX close tags lex as punctuation.
_REGEX_PRECEDERS = {
    "(", ",", "=", ":", "[", "!", "&", "|", "?", "??", ";", "{", "}", "=>",
    "&&", "||", "==", "===", "!=", "!==", "+", "-", "*", "%", "return",
    "case", "typeof", "new", "in", "of", "delete", "void", "instanceof",
    "do", "else", "throw", "await", "yield",
}


def sha16(text: str) -> str:
    """Content-hash used throughout the reference (code_entities.py:58-60)."""
    return hashlib.sha256(text.encode()).hexdigest()[:16]


def safe_name(raw: str) -> str:
    """URI-safe name per code_entities.py:47-56."""
    s = _SAFE_RE.sub("_", raw or "unknown")
    return s or "unknown"


def mint_uri(file_path: str, kind: str, name: str, line: int) -> str:
    """URI scheme of code_entities.py:47-56 (modules: :167-168)."""
    if kind == "module":
        return f"{BASE}{file_path}#module"
    return f"{BASE}{file_path}#{kind}_{safe_name(name)}_{line}"


@dataclass
class Tok:
    kind: str  # id | num | str | punct | regex | tmpl
    text: str
    a: int  # start offset
    b: int  # end offset (exclusive)


class _Lexer:
    """Tokenizer with template-literal substitution support and a JSX-safe
    regex-literal heuristic."""

    def __init__(self, src: str):
        self.src = src
        self.n = len(src)
        self.toks: list[Tok] = []
        self.comments: list[Tok] = []  # skipped but recorded, for docstrings

    def run(self) -> list[Tok]:
        self._code(0, top=True)
        return self.toks

    def _prev_text(self) -> str | None:
        return self.toks[-1].text if self.toks else None

    def _code(self, i: int, top: bool, stop_at_rbrace: bool = False) -> int:
        """Lex code until end (top) or until the '}' closing a template
        substitution (stop_at_rbrace). Returns index after consumption."""
        src, n = self.src, self.n
        depth = 0
        while i < n:
            c = src[i]
            if c in " \t\r\n":
                i += 1
                while i < n and src[i] in " \t\r\n":
                    i += 1
                continue
            if c == "/" and i + 1 < n and src[i + 1] == "/":
                j = src.find("\n", i)
                end = n if j < 0 else j
                self.comments.append(Tok("comment", src[i:end], i, end))
                i = end + 1
                continue
            if c == "/" and i + 1 < n and src[i + 1] == "*":
                j = src.find("*/", i + 2)
                end = n if j < 0 else j + 2
                self.comments.append(Tok("comment", src[i:end], i, end))
                i = end
                continue
            if c in "'\"":
                j = self._string_end(i)
                self.toks.append(Tok("str", src[i:j], i, j))
                i = j
                continue
            if c == "`":
                i = self._template(i)
                continue
            if c == "/":
                prev = self._prev_text()
                if prev is None or prev in _REGEX_PRECEDERS:
                    j = self._regex_end(i)
                    if j > 0:
                        self.toks.append(Tok("regex", src[i:j], i, j))
                        i = j
                        continue
                # fall through: division / JSX close-tag slash
            m = _ID_RE.match(src, i)
            if m:
                self.toks.append(Tok("id", m.group(0), i, m.end()))
                i = m.end()
                continue
            if c.isdigit():
                j = i + 1
                while j < n and (src[j].isalnum() or src[j] in "._xXbBoOeE+-"):
                    # crude numeric literal scan (enough: numbers are opaque)
                    if src[j] in "+-" and src[j - 1] not in "eE":
                        break
                    j += 1
                self.toks.append(Tok("num", src[i:j], i, j))
                i = j
                continue
            # multi-char punctuators we care about (first-char gated: the
            # startswith probes were ~25% of tokenizer time)
            if c in "=?!&|":
                for p in ("=>", "?.", "??", "===", "!==", "==", "!=", "&&", "||"):
                    if src.startswith(p, i):
                        self.toks.append(Tok("punct", p, i, i + len(p)))
                        i += len(p)
                        break
                else:
                    self.toks.append(Tok("punct", c, i, i + 1))
                    i += 1
                continue
            if stop_at_rbrace:
                if c == "{":
                    depth += 1
                elif c == "}":
                    if depth == 0:
                        return i  # caller consumes the '}'
                    depth -= 1
            self.toks.append(Tok("punct", c, i, i + 1))
            i += 1
        return i

    def _string_end(self, i: int) -> int:
        src, n, q = self.src, self.n, self.src[i]
        j = i + 1
        while j < n:
            if src[j] == "\\":
                j += 2
                continue
            if src[j] == q or src[j] == "\n":
                return j + 1
            j += 1
        return n

    def _regex_end(self, i: int) -> int:
        """End offset of a regex literal starting at i, or -1 on failure."""
        src, n = self.src, self.n
        j = i + 1
        in_class = False
        while j < n:
            c = src[j]
            if c == "\\":
                j += 2
                continue
            if c == "\n":
                return -1
            if in_class:
                if c == "]":
                    in_class = False
            elif c == "[":
                in_class = True
            elif c == "/":
                j += 1
                while j < n and src[j].isalpha():
                    j += 1
                return j
            j += 1
        return -1

    def _template(self, i: int) -> int:
        """Consume a template literal; lexes ${...} substitutions inline so
        call/arrow detection sees them (tree-sitter recurses into
        template_substitution children the same way)."""
        src, n = self.src, self.n
        self.toks.append(Tok("punct", "`", i, i + 1))
        j = i + 1
        while j < n:
            c = src[j]
            if c == "\\":
                j += 2
                continue
            if c == "`":
                self.toks.append(Tok("punct", "`", j, j + 1))
                return j + 1
            if c == "$" and j + 1 < n and src[j + 1] == "{":
                self.toks.append(Tok("punct", "${", j, j + 2))
                j = self._code(j + 2, top=False, stop_at_rbrace=True)
                if j < n and src[j] == "}":
                    # distinct close text so '{'/'}' brace matchers treat the
                    # whole ${...} substitution as balanced-invisible
                    self.toks.append(Tok("punct", "}$", j, j + 1))
                    j += 1
                continue
            j += 1
        return n


def tokenize(src: str) -> list[Tok]:
    return _Lexer(src).run()


# ---------------------------------------------------------------------------
# entity rows
# ---------------------------------------------------------------------------

FUNC_KINDS = ("function", "method")  # arrow functions use kind "function"


@dataclass
class Ent:
    kind: str
    name: str
    uri: str
    line: int
    col: int
    end_line: int | None = None
    end_col: int | None = None
    body_hash: str | None = None
    scope: str | None = None
    is_async: bool = False
    is_generator: bool = False
    is_arrow: bool = False
    is_exported: bool = False
    is_default_export: bool = False
    is_static: bool = False
    is_private: bool = False
    is_constructor: bool = False
    is_const: bool = False
    is_let: bool = False
    is_var: bool = False
    init_value: str | None = None
    module_type: str | None = None
    module_path: str | None = None
    import_type: str | None = None
    imported_symbols: list = field(default_factory=list)
    export_type: str | None = None
    callee_name: str | None = None
    caller_uri: str | None = None
    callee_uri: str | None = None
    is_method_call: bool = False
    arguments: list = field(default_factory=list)
    calls: list = field(default_factory=list)
    parent_class_uri: str | None = None
    is_rest: bool = False
    extends_name: str | None = None  # bare name; never a URI (quirk §1.3-6)
    # rollups (module/class rows)
    functions: list = field(default_factory=list)
    classes: list = field(default_factory=list)
    methods: list = field(default_factory=list)
    exports: list = field(default_factory=list)
    imports: list = field(default_factory=list)
    # extension fields (not part of reference fidelity)
    import_candidates: list = field(default_factory=list)
    # docstring/comments: modeled by the reference (code_entities.py:35-36)
    # and lowered by its emitter (ontology_builder.py:117-130) but never
    # populated by its parser — this engine extracts them on the jsparse
    # path (leading JSDoc + contiguous comments); the fallback path stays
    # empty, preserving executed-reference fallback parity
    docstring: str | None = None
    comments: list = field(default_factory=list)
    # parameter-URI quirk: URI minted with empty path, filePath literal real


def _clean_block_comment(text: str) -> str:
    """/** ... */ → the prose: delimiters stripped, per-line leading '*'
    gutter removed."""
    body = text
    if body.startswith("/**"):
        body = body[3:]
    elif body.startswith("/*"):
        body = body[2:]
    if body.endswith("*/"):
        body = body[:-2]
    lines = []
    for ln in body.splitlines():
        s = ln.strip()
        if s.startswith("*"):
            s = s[1:].strip()
        lines.append(s)
    return "\n".join(lines).strip()


def _clean_comment(text: str) -> str:
    if text.startswith("//"):
        return text[2:].strip()
    return _clean_block_comment(text)


_DOC_MODIFIERS = {
    "export", "default", "async", "static", "get", "set",
    "public", "private", "protected", "abstract",
}


class _Extractor:
    def __init__(self, path: str, src: str):
        self.path = path
        self.src = src
        # TS grammar only for .ts/.tsx (ast_parser.py:86-91 language_map);
        # interface/type_alias nodes cannot appear under the JS grammar
        self.is_ts = path.endswith((".ts", ".tsx"))
        lx = _Lexer(src)
        self.toks = lx.run()
        self.comments = lx.comments
        self._comment_ends = [c.b for c in self.comments]
        # line starts for offset -> (line, col)
        self.line_starts = [0]
        for m in re.finditer("\n", src):
            self.line_starts.append(m.end())
        self.ents: list[Ent] = []
        self.module = Ent(
            kind="module",
            name=posixpath.splitext(posixpath.basename(path))[0],
            uri=mint_uri(path, "module", "", 1),
            line=1,
            col=0,
            body_hash=sha16(src),
            module_type="commonjs",
        )
        self.ents.append(self.module)
        # arrow starts: token index of arrow node start -> arrow info
        self.arrows = self._find_arrows()

    # -- position helpers ---------------------------------------------------
    def linecol(self, off: int) -> tuple[int, int]:
        import bisect

        li = bisect.bisect_right(self.line_starts, off) - 1
        return li + 1, off - self.line_starts[li]

    # -- token helpers ------------------------------------------------------
    def _match_fwd(self, k: int, open_p: str, close_p: str) -> int:
        """Index of the token closing the bracket at token k."""
        depth = 0
        t = self.toks
        for i in range(k, len(t)):
            if t[i].kind == "punct":
                if t[i].text == open_p:
                    depth += 1
                elif t[i].text == close_p:
                    depth -= 1
                    if depth == 0:
                        return i
        return len(t) - 1

    def _match_back(self, k: int, open_p: str, close_p: str) -> int:
        depth = 0
        t = self.toks
        for i in range(k, -1, -1):
            if t[i].kind == "punct":
                if t[i].text == close_p:
                    depth += 1
                elif t[i].text == open_p:
                    depth -= 1
                    if depth == 0:
                        return i
        return 0

    def _find_arrows(self) -> dict[int, dict]:
        """Map start-token-index -> {params:(lo,hi) token range, arrow:k}.

        tree-sitter arrow_function spans from 'async'/params to body end."""
        arrows: dict[int, dict] = {}
        t = self.toks
        for k, tok in enumerate(t):
            if tok.text != "=>" or tok.kind != "punct":
                continue
            p = k - 1
            if p < 0:
                continue
            if t[p].text == ")":
                lo = self._match_back(p, "(", ")")
                params = (lo + 1, p)
                start = lo
            elif t[p].kind == "id":
                params = None  # single bare param: no formal_parameters node
                start = p
            else:
                continue
            if start - 1 >= 0 and t[start - 1].text == "async":
                start = start - 1
            arrows[start] = {"params": params, "arrow": k}
        return arrows

    # -- parameter extraction (ast_parser.py:736-764) -----------------------
    def _params_from_range(self, lo: int, hi: int, owner_line_for: str = "") -> list[Ent]:
        """Plain-identifier and rest params only; destructuring/defaults are
        object_pattern/assignment_pattern nodes the reference skips."""
        t = self.toks
        out = []
        depth = 0
        i = lo
        expect = True  # at a top-level parameter start position
        while i < hi:
            tok = t[i]
            if tok.kind == "punct":
                if tok.text in "([{":
                    depth += 1
                elif tok.text in ")]}":
                    depth -= 1
                elif tok.text == "," and depth == 0:
                    expect = True
                    i += 1
                    continue
            if depth == 0 and expect:
                if tok.kind == "id":
                    nxt = t[i + 1].text if i + 1 < hi else ","
                    if nxt in (",", ")") or i + 1 >= hi:
                        line, col = self.linecol(tok.a)
                        el, ec = self.linecol(tok.b)
                        out.append(self._mk_param(tok.text, line, col, el, ec, rest=False))
                    expect = False
                elif tok.text == "." and i + 2 < hi and t[i + 1].text == "." and t[i + 2].text == ".":
                    # rest parameter ...args (node starts at '...')
                    if i + 3 < hi and t[i + 3].kind == "id":
                        line, col = self.linecol(tok.a)
                        el, ec = self.linecol(t[i + 3].b)
                        out.append(self._mk_param(t[i + 3].text, line, col, el, ec, rest=True))
                        i += 3
                    expect = False
                else:
                    expect = False
            i += 1
        return out

    def _mk_param(self, name: str, line: int, col: int, el: int, ec: int, rest: bool) -> Ent:
        # QUIRK: URI minted while location.file_path=="" (ast_parser.py:58-66,
        # code_entities.py:43-56); the filePath literal is backfilled later.
        return Ent(
            kind="parameter",
            name=name,
            uri=mint_uri("", "parameter", name, line),
            line=line,
            col=col,
            end_line=el,
            end_col=ec,
            is_rest=rest,
        )

    # -- main scan ----------------------------------------------------------
    def run(self) -> list[Ent]:
        self._scan(0, len(self.toks), cur_func=None, cur_class=None, in_class_body=False)
        self._resolve()
        return self._dedup()

    def _scope(self, cur_func, cur_class) -> str:
        # ast_parser.py:774-781
        if cur_func is not None:
            return "function"
        if cur_class is not None:
            return "class"
        return "global"

    def _attach_doc(self, ent: Ent, start_k: int) -> None:
        """Attach leading comments to the declaration starting at token
        start_k: the contiguous comment block (whitespace-only gaps)
        immediately above the statement. The closest comment becomes the
        docstring when it is a JSDoc `/** */`; everything else lands in
        `comments`. Engine enrichment, NOT reference fidelity — the
        reference models and lowers these fields but never populates them
        (code_entities.py:35-36, ontology_builder.py:117-130)."""
        if not self.comments:
            return
        import bisect

        t = self.toks
        k = start_k
        while k > 0 and t[k - 1].kind == "id" and t[k - 1].text in _DOC_MODIFIERS:
            k -= 1
        bound = t[k].a
        idx = bisect.bisect_right(self._comment_ends, bound) - 1
        group: list[Tok] = []
        while idx >= 0:
            c = self.comments[idx]
            if c.b <= bound and self.src[c.b:bound].strip() == "":
                group.append(c)
                bound = c.a
                idx -= 1
            else:
                break
        if not group:
            return
        group.reverse()  # source order
        doc_idx = max(
            (i for i, g in enumerate(group) if g.text.startswith("/**")), default=None
        )
        if doc_idx is not None:  # last JSDoc block in the group = docstring
            ent.docstring = _clean_block_comment(group[doc_idx].text) or None
            group = group[:doc_idx] + group[doc_idx + 1:]
        ent.comments = [c for c in (_clean_comment(g.text) for g in group) if c]

    def _stmt_pos(self, k: int) -> bool:
        if k == 0:
            return True
        pt = self.toks[k - 1].text
        return pt in (";", "{", "}", "(") or pt in ("export", "default", "else", "`", "${")

    def _object_literal_pos(self, k: int) -> bool:
        """True when a '{' at token k opens an object literal (expression
        position). Tree-sitter decides this grammatically; at token level
        the preceding token is the discriminator. `=>` is excluded (arrow
        BLOCK body); `case x:`-label blocks are a known ambiguity accepted
        here (rare, and a non-method body inside scans identically)."""
        if k == 0:
            return False
        pt = self.toks[k - 1]
        if pt.kind == "punct":
            if pt.text in ("=", "(", ",", "[", ":", "?", "&&", "||", "??", "${"):
                return True
            # spread-position literal f(...{run(){}}): the lexer emits three
            # '.' tokens, so the discriminator is a '.' preceded by a '.'
            return pt.text == "." and k >= 2 and self.toks[k - 2].text == "."
        return pt.kind == "id" and pt.text in ("return", "in", "of", "typeof", "yield")

    def _scan(self, lo: int, hi: int, cur_func, cur_class, in_class_body: bool,
              in_object: bool = False):
        t = self.toks
        k = lo
        while k < hi:
            tok = t[k]

            if k in self.arrows:
                k = self._handle_arrow(k, hi, cur_func, cur_class)
                continue

            if tok.kind == "id" and tok.text == "function":
                # function_declaration requires statement position AND a name
                # (tree-sitter grammar: seq('function', $.identifier, ...));
                # function *expressions* have no dispatch case in the
                # reference, so only their children are visited
                head = k - 1 if (k > 0 and t[k - 1].text == "async") else k
                prev = t[head - 1].text if head > 0 else None
                is_decl = prev in (None, ";", "{", "}", "export", "default", "else", "do")
                named = k + 1 < hi and t[k + 1].kind == "id"
                k = self._handle_function(k, hi, cur_func, cur_class, emit=is_decl and named)
                continue

            if tok.kind == "id" and tok.text == "class":
                prev = t[k - 1].text if k > 0 else None
                is_decl = prev in (None, ";", "{", "}", "export", "default")
                named = k + 1 < hi and t[k + 1].kind == "id"
                k = self._handle_class(k, hi, cur_func, cur_class, emit=is_decl and named)
                continue

            if (
                self.is_ts
                and tok.kind == "id"
                and tok.text in ("interface", "type")
                and (self._stmt_pos(k) or (k > 0 and t[k - 1].text == "export"))
                and k + 1 < hi
                and t[k + 1].kind == "id"
            ):
                nxt = self._handle_ts_type(k, hi)
                if nxt is not None:
                    k = nxt
                    continue

            if tok.kind == "id" and tok.text == "var" and self._stmt_pos(k):
                self._handle_var(k, hi, cur_func, cur_class)
                k += 1  # keep scanning initializers for calls/arrows
                continue

            if tok.kind == "id" and tok.text == "import" and self._stmt_pos(k) and (
                k + 1 < hi and t[k + 1].text != "("
            ):
                k = self._handle_import(k, hi)
                continue

            if tok.kind == "id" and tok.text == "export" and self._stmt_pos(k):
                self._handle_export(k, hi)
                k += 1  # inner declaration is scanned normally
                continue

            if in_class_body:
                m = self._try_method(k, hi, cur_func, cur_class)
                if m is not None:
                    k = m
                    continue

            if in_object:
                # object-literal method_definition: same node type as class
                # methods in the tree-sitter grammar, dispatched by the same
                # branch (ast_parser.py:400-402). parent_class_uri follows
                # context['current_class'] — None at top level, the
                # enclosing class when the object sits inside a class body
                # (the rollup into cls.methods is parent-uri-driven either
                # way, _establish_relationships)
                m = self._try_method(k, hi, cur_func, cur_class)
                if m is not None:
                    k = m
                    continue

            if tok.kind == "punct" and tok.text == "{" and self._object_literal_pos(k):
                bclose = self._match_fwd(k, "{", "}")
                self._scan(k + 1, bclose, cur_func, cur_class, False, in_object=True)
                k = bclose + 1
                continue

            if tok.kind == "punct" and tok.text == "(":
                self._maybe_call(k, cur_func, cur_class)
                k += 1
                continue

            k += 1

    # -- constructs ---------------------------------------------------------
    def _node_text(self, a_off: int, b_off: int) -> str:
        return self.src[a_off:b_off]

    def _handle_arrow(self, k: int, hi: int, cur_func, cur_class) -> int:
        info = self.arrows[k]
        t = self.toks
        start_off = t[k].a
        arrow_k = info["arrow"]
        # body span
        bk = arrow_k + 1
        if bk < hi and t[bk].text == "{" and t[bk].kind == "punct":
            bend = self._match_fwd(bk, "{", "}")
            end_off = t[bend].b
            body_range = (bk + 1, bend)
            cont = bend + 1
        else:
            bend = self._expr_end(bk, hi)
            end_off = t[bend - 1].b if bend > bk else t[arrow_k].b
            body_range = (bk, bend)
            cont = bend
        line, col = self.linecol(start_off)
        el, ec = self.linecol(end_off)
        params = (
            self._params_from_range(*info["params"]) if info["params"] else []
        )
        ent = Ent(
            kind="function",
            name="<arrow_function>",
            uri=mint_uri(self.path, "function", "<arrow_function>", line),
            line=line,
            col=col,
            end_line=el,
            end_col=ec,
            body_hash=sha16(self._node_text(start_off, end_off)),
            scope=self._scope(cur_func, cur_class),
            is_arrow=True,
            is_async=t[k].text == "async",
        )
        self.ents.append(ent)
        for p in params:
            self.ents.append(p)
        self.module.functions.append(ent.uri)
        # params span then body span, same contexts (arrows set no context:
        # ast_parser.py:375-382 has no body visit of its own)
        if info["params"]:
            self._scan(info["params"][0], info["params"][1], cur_func, cur_class, False)
        self._scan(body_range[0], body_range[1], cur_func, cur_class, False)
        return cont

    def _expr_end(self, k: int, hi: int) -> int:
        """Token index one past a concise arrow body starting at token k."""
        t = self.toks
        depth = 0
        i = k
        while i < hi:
            tx = t[i].text if t[i].kind == "punct" else None
            if tx in ("(", "[", "{"):
                depth += 1
            elif tx in (")", "]", "}"):
                if depth == 0:
                    return i
                depth -= 1
            elif depth == 0 and tx in (",", ";"):
                return i
            i += 1
        return hi

    def _handle_function(self, k: int, hi: int, cur_func, cur_class, emit: bool) -> int:
        t = self.toks
        start_k = k - 1 if (k > 0 and t[k - 1].text == "async") else k
        is_async = start_k != k
        i = k + 1
        name = "<anonymous>"
        is_gen = False
        if i < hi and t[i].text == "*":
            is_gen = False  # reference checks child text == 'generator': never true
            i += 1
        if i < hi and t[i].kind == "id":
            name = t[i].text
            i += 1
        if i >= hi or t[i].text != "(":
            return k + 1
        pclose = self._match_fwd(i, "(", ")")
        params_range = (i + 1, pclose)
        j = pclose + 1
        if j < hi and t[j].text == "{":
            bclose = self._match_fwd(j, "{", "}")
        else:
            return k + 1
        start_off = t[start_k].a
        end_off = t[bclose].b
        line, col = self.linecol(start_off)
        el, ec = self.linecol(end_off)
        if emit:
            params = self._params_from_range(*params_range)
            ent = Ent(
                kind="function",
                name=name,
                uri=mint_uri(self.path, "function", name, line),
                line=line,
                col=col,
                end_line=el,
                end_col=ec,
                body_hash=sha16(self._node_text(start_off, end_off)),
                scope=self._scope(cur_func, cur_class),
                is_async=is_async,
                is_generator=is_gen,
            )
            self._attach_doc(ent, start_k)
            self.ents.append(ent)
            for p in params:
                self.ents.append(p)
            self.module.functions.append(ent.uri)
            # body visited with current_function set (ast_parser.py:362-373)
            self._scan(params_range[0], params_range[1], ent, cur_class, False)
            self._scan(j + 1, bclose, ent, cur_class, False)
        else:
            # function expression: children visited with unchanged context
            self._scan(params_range[0], params_range[1], cur_func, cur_class, False)
            self._scan(j + 1, bclose, cur_func, cur_class, False)
        return bclose + 1

    def _handle_class(self, k: int, hi: int, cur_func, cur_class, emit: bool) -> int:
        t = self.toks
        i = k + 1
        name = "<anonymous>"
        if i < hi and t[i].kind == "id" and t[i].text != "extends":
            name = t[i].text
            i += 1
        extends_name = None
        if i < hi and t[i].text == "extends":
            i += 1
            if i < hi and t[i].kind == "id":
                # single-identifier heritage only (class_heritage
                # .find_child('identifier'), ast_parser.py:497-501);
                # member expressions yield None
                if i + 1 < hi and t[i + 1].text == "{":
                    extends_name = t[i].text
                # skip heritage expression tokens until '{'
            while i < hi and t[i].text != "{":
                i += 1
        if i >= hi or t[i].text != "{":
            return k + 1
        bclose = self._match_fwd(i, "{", "}")
        start_off = t[k].a
        end_off = t[bclose].b
        line, col = self.linecol(start_off)
        el, ec = self.linecol(end_off)
        if emit:
            ent = Ent(
                kind="class",
                name=name,
                uri=mint_uri(self.path, "class", name, line),
                line=line,
                col=col,
                end_line=el,
                end_col=ec,
                body_hash=sha16(self._node_text(start_off, end_off)),
                # extends_class stays a bare NAME: the code:extends edge only
                # fires on URI map hits, i.e. never (ontology_builder.py:317)
                extends_name=extends_name,
            )
            self._attach_doc(ent, k)
            self.ents.append(ent)
            self.module.classes.append(ent.uri)
            self._scan(i + 1, bclose, cur_func, ent, in_class_body=True)
        else:
            self._scan(i + 1, bclose, cur_func, cur_class, in_class_body=True)
        return bclose + 1

    def _try_method(self, k: int, hi: int, cur_func, cur_class) -> int | None:
        """Match a method_definition at token k inside a class_body or an
        object literal. The body scans with the ENCLOSING (cur_func,
        cur_class): the reference dispatch never sets current_function for
        method_definition (ast_parser.py:400-402), so calls inside a method
        attribute to the surrounding function, else the class, else ''."""
        t = self.toks
        i = k
        start_k = k
        is_static = is_async = is_get = is_set = False
        # modifier prefix
        while i < hi and t[i].kind == "id" and t[i].text in ("static", "async", "get", "set"):
            nxt = t[i + 1] if i + 1 < hi else None
            if nxt is None:
                return None
            # 'get(' etc. would be the method *name*, not a modifier
            if nxt.text == "(":
                break
            if t[i].text == "static":
                is_static = True
            elif t[i].text == "async":
                is_async = True
            elif t[i].text == "get":
                is_get = True
            else:
                is_set = True
            i += 1
        if i < hi and t[i].text == "*":
            i += 1
        if i >= hi:
            return None
        name_tok = t[i]
        name = None
        if name_tok.kind == "id":
            name = name_tok.text
        elif name_tok.text == "#" and i + 1 < hi and t[i + 1].kind == "id":
            name = "#" + t[i + 1].text
            i += 1
        else:
            return None
        if i + 1 >= hi or t[i + 1].text != "(":
            return None
        pclose = self._match_fwd(i + 1, "(", ")")
        j = pclose + 1
        if j >= hi or t[j].text != "{":
            return None
        bclose = self._match_fwd(j, "{", "}")
        start_off = t[start_k].a
        end_off = t[bclose].b
        line, col = self.linecol(start_off)
        el, ec = self.linecol(end_off)
        ent = Ent(
            kind="method",
            name=name,
            uri=mint_uri(self.path, "method", name, line),
            line=line,
            col=col,
            end_line=el,
            end_col=ec,
            body_hash=sha16(self._node_text(start_off, end_off)),
            scope="global",  # MethodEntity default; _determine_scope not called
            is_async=is_async,
            is_static=is_static,
            is_private=name.startswith("#"),
            is_constructor=name == "constructor",
            parent_class_uri=cur_class.uri if cur_class else None,
        )
        self._attach_doc(ent, start_k)
        # method parameters are parsed but never appended to the entity list
        # (ast_parser.py:400-402) — so none are created here at all
        self.ents.append(ent)
        self._scan(i + 2, pclose, cur_func, cur_class, False)
        self._scan(j + 1, bclose, cur_func, cur_class, False)
        return bclose + 1

    def _handle_var(self, k: int, hi: int, cur_func, cur_class):
        """`var` declarations only (tree-sitter 'variable_declaration';
        const/let are 'lexical_declaration' which the reference's dispatch
        never matches — ast_parser.py:404)."""
        t = self.toks
        i = k + 1
        scope = self._scope(cur_func, cur_class)
        while i < hi:
            if t[i].kind != "id":
                break
            name_tok = t[i]
            line, col = self.linecol(name_tok.a)
            init_txt = None
            j = i + 1
            if j < hi and t[j].text == "=":
                e = self._expr_end(j + 1, hi)
                init_txt = self.src[t[j + 1].a: t[e - 1].b].strip() if e > j + 1 else None
                el, ec = self.linecol(t[e - 1].b if e > j + 1 else name_tok.b)
                j = e
            else:
                el, ec = self.linecol(name_tok.b)
            self.ents.append(
                Ent(
                    kind="variable",
                    name=name_tok.text,
                    uri=mint_uri(self.path, "variable", name_tok.text, line),
                    line=line,
                    col=col,
                    end_line=el,
                    end_col=ec,
                    is_var=True,
                    init_value=init_txt,
                    scope=scope,
                )
            )
            if j < hi and t[j].text == ",":
                i = j + 1
                continue
            break

    def _handle_import(self, k: int, hi: int) -> int:
        t = self.toks
        i = k + 1
        symbols: list[str] = []
        default_sym = None
        spec = None
        end_k = k
        saw_star = False
        while i < hi:
            tok = t[i]
            if tok.kind == "str":
                spec = tok.text[1:-1]
                end_k = i
                break
            if tok.kind == "punct" and tok.text == "*":
                # namespace import `* as ns`: the reference's
                # import_clause.find_child('identifier') is
                # direct-children-only, so the alias inside the
                # namespace_import node emits NO imported symbols
                # (ast_parser.py:630-644); skip the `as <id>` pair.
                saw_star = True
                i += 1
                continue
            if tok.kind == "punct" and tok.text == "{":
                close = self._match_fwd(i, "{", "}")
                j = i + 1
                expect = True
                while j < close:
                    if t[j].kind == "id" and expect:
                        if t[j].text != "as":
                            symbols.append(t[j].text)
                        expect = False
                    elif t[j].text == ",":
                        expect = True
                    j += 1
                i = close + 1
                continue
            if tok.kind == "id" and tok.text not in ("from", "type") and default_sym is None and not symbols:
                if saw_star:
                    if tok.text == "as":
                        i += 2  # skip `as <alias>` — alias is not a symbol
                        continue
                else:
                    default_sym = tok.text
            if tok.text == ";":
                end_k = i
                break
            i += 1
        if spec is None:
            return k + 1
        if default_sym:
            symbols = symbols + [default_sym]  # named first, default appended
            # (ast_parser.py:630-644: named loop, then default identifier)
        line, col = self.linecol(t[k].a)
        # node end: tree-sitter includes the trailing ';' if present
        j = end_k + 1
        if j < hi and t[j].text == ";":
            end_k = j
        el, ec = self.linecol(t[end_k].b)
        name = f"import_{posixpath.splitext(posixpath.basename(spec))[0]}"
        ent = Ent(
            kind="import",
            name=name,
            uri=mint_uri(self.path, "import", name, line),
            line=line,
            col=col,
            end_line=el,
            end_col=ec,
            module_path=spec,
            import_type="named",
            imported_symbols=symbols,
        )
        self.ents.append(ent)
        # module-import resolution (ast_parser.py:607-629): relative specs
        # resolve against the importing file's directory; extension tries
        # become join candidates in the Spark linking stage
        if spec.startswith("."):
            base = posixpath.dirname(self.path)
            resolved = posixpath.normpath(posixpath.join(base, spec))
            if posixpath.splitext(resolved)[1]:
                self.module.imports.append(f"{BASE}{resolved}#module")
            else:
                cands = [f"{resolved}{ext}" for ext in (".ts", ".tsx", ".js", ".jsx")]
                cands += [f"{resolved}/index.{e}" for e in ("ts", "tsx", "js", "jsx")]
                ent.import_candidates = cands
                # reference keeps the extensionless path when nothing exists
                self.module.imports.append(f"{BASE}{resolved}#module")
        return end_k + 1

    def _type_expr_end(self, k: int, hi: int) -> int:
        """Last token of a type-alias value starting at token k, including a
        trailing ';' (the statement node spans it). Brackets (incl. TS
        generics) are balanced; at depth 0 an unmatched closer or an
        ASI-style line break after a type-terminating token ends the node."""
        t = self.toks
        depth = 0
        i = k
        last = k
        while i < hi:
            tx = t[i].text if t[i].kind == "punct" else None
            if tx == ";" and depth == 0:
                return i
            if tx in ("(", "[", "{", "<"):
                depth += 1
            elif tx in (")", "]", "}", ">"):
                if depth == 0:
                    return last
                depth -= 1
            elif depth == 0 and i > k:
                prev = t[i - 1]
                line_i, _ = self.linecol(t[i].a)
                line_p, _ = self.linecol(prev.b)
                ends_type = prev.kind in ("id", "num", "str") or (
                    prev.kind == "punct" and prev.text in (")", "]", "}", ">")
                )
                if line_i > line_p and ends_type:
                    return last
            last = i
            i += 1
        return last

    def _handle_ts_type(self, k: int, hi: int) -> int | None:
        """TS interface_declaration / type_alias_declaration: both dispatch
        to _extract_interface (ast_parser.py:419-422, :686-701), lowering to
        one Interface entity named by the type identifier (is_exported stays
        False: _check_export_status :773-776). The body is a type context —
        no expression children exist in the CST — so scanning resumes after
        the node."""
        t = self.toks
        name_tok = t[k + 1]
        if t[k].text == "interface":
            # scan for the BODY '{', skipping balanced <...> generic groups:
            # `interface Foo extends Bar<{x: number}> {` must not take the
            # object-literal-type '{' inside the type arguments as the body
            j = k + 2
            while j < hi:
                if t[j].kind == "punct":
                    if t[j].text == "<":
                        j = self._match_fwd(j, "<", ">") + 1
                        continue
                    if t[j].text in ("{", ";", "}"):
                        break
                j += 1
            if j >= hi or t[j].text != "{":
                return None
            end_k = self._match_fwd(j, "{", "}")
        else:
            j = k + 2
            if j < hi and t[j].kind == "punct" and t[j].text == "<":
                j = self._match_fwd(j, "<", ">") + 1
            if j >= hi or not (t[j].kind == "punct" and t[j].text == "="):
                return None  # `type` here is an ordinary identifier
            end_k = self._type_expr_end(j + 1, hi)
        line, col = self.linecol(t[k].a)
        el, ec = self.linecol(t[end_k].b)
        self.ents.append(
            Ent(
                kind="interface",
                name=name_tok.text,
                uri=mint_uri(self.path, "interface", name_tok.text, line),
                line=line,
                col=col,
                end_line=el,
                end_col=ec,
                body_hash=sha16(self._node_text(t[k].a, t[end_k].b)),
            )
        )
        self._attach_doc(self.ents[-1], k)
        # module.interfaces has NO relationship loop in the reference
        # emitter (ontology_builder.py:337-359 covers functions/classes/
        # exports/imports only), so nothing is tracked on the module row
        return end_k + 1

    def _handle_export(self, k: int, hi: int):
        t = self.toks
        is_default = k + 1 < hi and t[k + 1].text == "default"
        decl_k = k + (2 if is_default else 1)
        end_k = decl_k
        is_decl = False
        if decl_k < hi:
            dtx = t[decl_k].text
            if dtx == "async" and decl_k + 1 < hi and t[decl_k + 1].text == "function":
                dtx = "function"
            if dtx in ("function", "class") or (self.is_ts and dtx == "interface"):
                is_decl = True
                # body starts at the first '{' at paren-depth 0
                bk = decl_k
                depth = 0
                while bk < hi:
                    tx = t[bk].text if t[bk].kind == "punct" else None
                    if tx == "(":
                        depth += 1
                    elif tx == ")":
                        depth -= 1
                    elif tx == "{" and depth == 0:
                        break
                    bk += 1
                end_k = self._match_fwd(bk, "{", "}") if bk < hi else decl_k
            elif dtx in ("const", "let", "var") or t[decl_k].text == "{" or True:
                if t[decl_k].kind == "punct" and t[decl_k].text == "{":
                    end_k = self._match_fwd(decl_k, "{", "}")
                else:
                    e = decl_k
                    depth = 0
                    while e < hi:
                        tx = t[e].text if t[e].kind == "punct" else None
                        if tx in ("(", "[", "{"):
                            depth += 1
                        elif tx in (")", "]", "}"):
                            if depth == 0:
                                break
                            depth -= 1
                        elif tx == ";" and depth == 0:
                            e -= 1
                            break
                        e += 1
                    end_k = min(e, hi - 1)
        # a bare `export` / `export default` at EOF leaves decl_k/end_k
        # past the token list — clamp to the last real token (k itself is
        # always < hi, so the clamp never moves before the keyword)
        end_k = min(end_k, hi - 1)
        decl_k = min(decl_k, hi - 1)
        # trailing semicolon is part of the export_statement node
        has_semi = end_k + 1 < hi and t[end_k + 1].text == ";"
        if has_semi:
            end_k += 1
        start_off, end_off = t[k].a, t[end_k].b
        node_text = self.src[start_off:end_off]
        if is_default:
            # symbol from the LAST child's text (ast_parser.py:670-675):
            # a trailing ';' child for expression exports, else the
            # declaration/expression node text, truncated to 50 chars
            if t[end_k].text == ";" and not is_decl:
                sym = ";"
            else:
                sym = self.src[t[decl_k].a: end_off][:50]
            etype = "default"
        else:
            sym = node_text[:50]
            etype = "named"
        line, col = self.linecol(start_off)
        el, ec = self.linecol(end_off)
        name = f"export_{sym}"
        ent = Ent(
            kind="export",
            name=name,
            uri=mint_uri(self.path, "export", name, line),
            line=line,
            col=col,
            end_line=el,
            end_col=ec,
            export_type=etype,
        )
        self.ents.append(ent)
        self.module.exports.append(ent.uri)

    def _maybe_call(self, k: int, cur_func, cur_class):
        """call_expression detection at an argument-list '(' (node dispatch
        ast_parser.py:424-430; extraction :699-734)."""
        t = self.toks
        p = k - 1
        if p < 0:
            return
        pt = t[p]
        if pt.kind == "id":
            if pt.text in _NONCALL_KEYWORDS:
                return
        elif not (pt.kind == "punct" and pt.text in (")", "]")):
            return
        # walk back over the member chain to the callee start
        i = p
        crossed_group = False  # saw a (...)/[...] group inside the chain
        group_callee = False  # the callee IS a parenthesized expression
        while True:
            if t[i].kind == "punct" and t[i].text in (")", "]"):
                g = self._match_back(i, "(" if t[i].text == ")" else "[", t[i].text)
                if g < 0:
                    return
                before = g - 1
                if before >= 0 and (
                    t[before].kind == "id" and t[before].text not in _NONCALL_KEYWORDS
                    or t[before].kind == "punct" and t[before].text in (")", "]")
                ):
                    i = before
                    crossed_group = True
                    continue
                # nothing chains into the group: a '(...)' standing alone is
                # itself the callee — parenthesized_expression as
                # call_expression children[0], i.e. an IIFE
                # (ast_parser.py:708-710) — unless the paren is statement
                # syntax (if/while/...) or binds to `new`
                if t[i].text == ")" and not (
                    before >= 0
                    and t[before].kind == "id"
                    and t[before].text in _CONTROL_PAREN_KEYWORDS
                ):
                    i = g
                    group_callee = True
                    break
                return
            if t[i].kind != "id":
                return
            if i - 1 >= 0 and t[i - 1].kind == "punct" and t[i - 1].text in (".", "?."):
                i -= 2
                continue
            break
        start_tok = i
        if not group_callee:
            if t[start_tok].kind == "id" and t[start_tok].text in _NONCALL_KEYWORDS:
                return  # e.g. `if (a) (b)` — control paren, not a callee
            if not crossed_group and start_tok - 1 >= 0 and t[start_tok - 1].text == "new":
                # `new a.b.c(args)` binds the parens to the new_expression —
                # no call node; `new X().m(...)` past a group IS a call
                return
        callee_text = self.src[t[start_tok].a: t[p].b]
        close = self._match_fwd(k, "(", ")")
        args = self._split_args(k + 1, close)
        line, col = self.linecol(t[start_tok].a)
        el, ec = self.linecol(t[close].b)
        caller_uri = ""
        if cur_func is not None:
            caller_uri = cur_func.uri
        elif cur_class is not None:
            caller_uri = cur_class.uri
        name = f"call_{callee_text}"
        self.ents.append(
            Ent(
                kind="call",
                name=name,
                uri=mint_uri(self.path, "callexpression", name, line),
                line=line,
                col=col,
                end_line=el,
                end_col=ec,
                callee_name=callee_text,
                caller_uri=caller_uri,
                is_method_call="." in callee_text,
                arguments=args,
            )
        )

    def _split_args(self, lo: int, hi: int) -> list[str]:
        t = self.toks
        args = []
        depth = 0
        seg_start = lo
        for i in range(lo, hi):
            tx = t[i].text if t[i].kind == "punct" else None
            if tx in ("(", "[", "{"):
                depth += 1
            elif tx in (")", "]", "}"):
                depth -= 1
            elif tx == "," and depth == 0:
                if i > seg_start:
                    args.append(self.src[t[seg_start].a: t[i - 1].b])
                seg_start = i + 1
        if hi > seg_start:
            args.append(self.src[t[seg_start].a: t[hi - 1].b])
        return args

    # -- post passes ---------------------------------------------------------
    def _resolve(self):
        """Intra-file linking (ast_parser.py:797-830 _establish_relationships):
        name map is last-wins over ALL entity kinds; calls resolve only to
        Function/Method entities; caller.calls fills only when the caller is
        itself a Function/Method."""
        by_name: dict[str, Ent] = {}
        by_uri: dict[str, Ent] = {}
        for e in self.ents:
            by_name[e.name] = e
            by_uri.setdefault(e.uri, e)  # first copy wins, like _uri_cache
        for e in self.ents:
            if e.kind != "call":
                continue
            callee = by_name.get(e.callee_name or "")
            if callee is not None and callee.kind in ("function", "method"):
                e.callee_uri = callee.uri
                caller = by_uri.get(e.caller_uri or "")
                if caller is not None and caller.kind in ("function", "method"):
                    caller.calls.append(callee.uri)
        # class-member rollup
        for e in self.ents:
            if e.kind == "method" and e.parent_class_uri:
                parent = by_uri.get(e.parent_class_uri)
                if parent is not None and parent.kind == "class":
                    parent.methods.append(e.uri)

    def _dedup(self) -> list[Ent]:
        seen: set[str] = set()
        out = []
        for e in self.ents:
            if e.uri in seen:
                continue  # URI cache keeps the first copy (ontology_builder.py:79-82)
            seen.add(e.uri)
            out.append(e)
        return out


def extract_file(path: str, content: str) -> list[Ent]:
    """Extract all entity rows for one file (document order, URI-deduped)."""
    return _Extractor(path, content).run()
