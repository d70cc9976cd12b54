"""Triple-set comparison with structural blank-node equivalence.

rdflib mints random BNode ids per run while this engine skolemizes
deterministically, so triple sets are compared after canonicalizing every
bnode-rooted value object (SourceLocation, call argument, comment) into
(owner, predicate, frozenset of property/value pairs). Multiset semantics
preserve the reference's duplicate parameter-location quirk (two identical
location objects per parameter must both be present). SURVEY.md §4.4/§7.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable

Triple = tuple  # (subj, pred, obj, is_uri, dtype)


def canonicalize(triples: Iterable[Triple]) -> Counter:
    """Triple rows → canonical multiset.

    Bnode object ids are any obj with dtype == 'bnode'; their property rows
    have the bnode as subject. Ground triples pass through unchanged.
    """
    ground: list[tuple] = []
    owners: dict[str, tuple] = {}  # bnode id -> (owner subj, pred)
    props: dict[str, list] = {}  # bnode id -> [(pred, obj, is_uri, dtype)]
    bnode_ids: set[str] = set()

    rows = list(triples)
    for s, p, o, is_uri, dtype in rows:
        if dtype == "bnode":
            owners[o] = (s, p)
            bnode_ids.add(o)
    for s, p, o, is_uri, dtype in rows:
        if s in bnode_ids:
            props.setdefault(s, []).append((p, o, bool(is_uri), dtype))
        elif dtype != "bnode":
            ground.append((s, p, o, bool(is_uri), dtype))

    out: Counter = Counter(ground)
    for b, (owner, pred) in owners.items():
        out[(owner, pred, frozenset(props.get(b, [])))] += 1
    return out


def precision_recall(expected: Counter, actual: Counter) -> dict:
    inter = sum((expected & actual).values())
    n_exp = sum(expected.values())
    n_act = sum(actual.values())
    p = inter / n_act if n_act else 1.0
    r = inter / n_exp if n_exp else 1.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": f1,
        "expected": n_exp,
        "actual": n_act,
        "matched": inter,
    }


def diff(expected: Counter, actual: Counter, limit: int = 20) -> dict:
    missing = list((expected - actual).elements())[:limit]
    extra = list((actual - expected).elements())[:limit]
    return {"missing": missing, "extra": extra}
