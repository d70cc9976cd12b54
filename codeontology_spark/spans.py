"""A14: Blob + SourceSpan emission (optional operator).

Reimplements /root/reference/src/graph/source_span_emitter.py over the
source table: blob URIs ``blob:git://<repo>@<commit>:<path>`` (:55-58 —
repo/commit come from the table instead of a git subprocess), byte offsets
from line/col via splitlines(keepends=True) prefix sums (:61-71, including
its fallbacks end_line→line, end_col→col+80), span contentHash = sha256 of
the exact byte slice, astHash = sha256 of whitespace-collapsed bytes
(:109-112), previewText ≤300 chars (:130-136). The reference only emits
spans for two hard-coded sample files (:141-158) and its shipped dumps
contain none, so this operator is additive and kept out of the
fidelity-mode triple stream.

Runs as one Arrow mapInPandas pass over source rows (hashing needs the
bytes anyway); span bnodes are skolemized ``_:span|<entity-uri>``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .extract import source_filter
from .jsparse import extract_file
from .schemas import TRIPLE_SCHEMA


def _language(path: str) -> str:
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    if ext in ("ts", "tsx"):
        return "typescript"
    if ext in ("js", "jsx", "mjs", "cjs"):
        return "javascript"
    return ext or "unknown"


def _byte_offsets(content: bytes, ls: int, cs: int, le: int, ce: int) -> tuple[int, int]:
    lines = content.splitlines(keepends=True)
    ls0, le0 = max(1, ls) - 1, max(1, le) - 1
    pre = [0]
    for ln in lines:
        pre.append(pre[-1] + len(ln))
    def at(idx: int) -> int:
        return pre[min(idx, len(lines))]
    b0 = at(ls0) + max(0, cs)
    b1 = at(le0) + max(0, ce)
    b0 = max(0, min(b0, len(content)))
    b1 = max(b0, min(b1, len(content)))
    return b0, b1


def _file_span_rows(repo: str, path: str, commit: str, content: str) -> list[tuple]:
    out: list[tuple] = []
    data = content.encode("utf-8")
    blob = f"blob:git://{repo}@{commit or 'WORKING'}:{path}"

    def add(s, p, o, is_uri=False, dtype="string"):
        out.append((repo, s, p, str(o), is_uri, dtype))

    add(blob, "rdf:type", "code:Blob", True, "uri")
    add(blob, "code:language", _language(path))
    add(blob, "code:contentHash", hashlib.sha256(data).hexdigest())

    for e in extract_file(path, content):
        ls = e.line or 1
        cs = e.col or 0
        le = e.end_line or ls
        ce = e.end_col if e.end_col else cs + 80  # reference fallback :107
        b0, b1 = _byte_offsets(data, ls, cs, le, ce)
        sl = data[b0:b1]
        span = f"_:span|{e.uri}"
        add(e.uri, "code:hasSourceSpan", span, False, "bnode")
        add(span, "rdf:type", "code:SourceSpan", True, "uri")
        add(span, "code:inBlob", blob, True, "uri")
        add(span, "code:byteStart", b0, False, "integer")
        add(span, "code:byteEnd", b1, False, "integer")
        add(span, "code:lineStart", ls, False, "integer")
        add(span, "code:lineEnd", le, False, "integer")
        add(span, "code:contentHash", hashlib.sha256(sl).hexdigest())
        add(span, "code:astHash", hashlib.sha256(b" ".join(sl.split())).hexdigest())
        if sl:
            add(span, "code:previewText", sl.decode("utf-8", errors="ignore")[:300])
    return out


def span_triples(source_df: DataFrame, apply_filters: bool = True) -> DataFrame:
    df = source_filter(source_df) if apply_filters else source_df

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["repo", "subj", "pred", "obj", "is_uri", "dtype"]
        for pdf in batches:
            rows: list[tuple] = []
            for repo, path, commit, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
            ):
                try:
                    rows.extend(_file_span_rows(repo, path, commit, content or ""))
                except Exception:
                    continue
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, schema=TRIPLE_SCHEMA)
