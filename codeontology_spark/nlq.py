"""Natural-language query routing + query-engine utilities.

B14 natural_language_query (query_engine.py:297-374): regex intent routing
onto the DataFrame template catalog. B22 explain_query (:550-588), B23
benchmark_queries (:590-607), B24 get_query_suggestions (:524-548).
Routing is driver-side Python (it only picks a plan); execution is the
DataFrame layer.
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable

from pyspark.sql import DataFrame

from . import queries as Q

TEMPLATES: dict[str, Callable] = {
    "functions_calling_function": Q.functions_calling,
    "functions_called_by_function": Q.functions_called_by,
    "classes_implementing_interface": Q.classes_implementing,
    "functions_in_module": Q.functions_in_module,
    "variables_accessed_by_function": Q.variables_accessed_by,
    "call_chain_between_functions": Q.call_chain_between,
    "circular_dependencies": lambda t: Q.circular_dependencies(t),
    "database_operations": lambda t: Q.database_operations(t),
    "unused_functions": lambda t: Q.unused_functions(t),
    "high_complexity_functions": lambda t: Q.high_complexity_functions(t),
    "functions_with_many_parameters": lambda t: Q.functions_with_many_parameters(t),
}

# intent patterns mirroring query_engine.py:306-352
_INTENTS: list[tuple[str, str, bool]] = [
    (r"find\s+functions?\s+(?:that\s+)?call(?:s|ing)?\s+(\w+)", "functions_calling_function", True),
    (r"(?:what|which)\s+functions?\s+does\s+(\w+)\s+call", "functions_called_by_function", True),
    (r"find\s+(?:functions?|calls?).*database", "database_operations", False),
    (r"database\s+operations?", "database_operations", False),
    (r"unused\s+functions?", "unused_functions", False),
    (r"circular\s+dependen", "circular_dependencies", False),
    (r"complex\s+functions?|high.?complexity", "high_complexity_functions", False),
    (r"many\s+parameters", "functions_with_many_parameters", False),
    (r"classes?\s+implement(?:ing)?\s+(\w+)", "classes_implementing_interface", True),
    (r"functions?\s+in\s+(?:module\s+)?(\w+)", "functions_in_module", True),
]


def natural_language_query(triples: DataFrame, text: str) -> DataFrame | None:
    """Route a natural-language question to a template plan; None when no
    intent matches (the reference returns an empty 'natural' result)."""
    low = text.lower().strip()
    for pattern, template, takes_arg in _INTENTS:
        m = re.search(pattern, low)
        if m:
            fn = TEMPLATES[template]
            if takes_arg:
                return fn(triples, m.group(1))
            return fn(triples)
    return None


def explain_query(df: DataFrame) -> str:
    """B22: the reference's heuristic EXPLAIN becomes Catalyst's real one."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def benchmark_queries(
    triples: DataFrame, names: list[str] | None = None, iterations: int = 3
) -> dict[str, float]:
    """B23: n-iteration timing loop per zero-arg template."""
    out: dict[str, float] = {}
    zero_arg = {
        k: v
        for k, v in TEMPLATES.items()
        if k in ("circular_dependencies", "database_operations", "unused_functions",
                 "high_complexity_functions", "functions_with_many_parameters")
    }
    for name, fn in zero_arg.items():
        if names and name not in names:
            continue
        best = float("inf")
        for _ in range(iterations):
            t0 = time.perf_counter()
            fn(triples).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    return out


def get_query_suggestions(prefix: str = "", limit: int = 10) -> list[str]:
    """B24: template-name prefix matching."""
    names = sorted(TEMPLATES)
    if prefix:
        names = [n for n in names if n.startswith(prefix.lower())]
    return names[:limit]
