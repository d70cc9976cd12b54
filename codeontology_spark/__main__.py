"""spark-submit-able job driver: ``python -m codeontology_spark <cmd>``.

The north rule's deployment shape is ``spark-submit --py-files
codeontology_spark.zip`` on a multi-executor cluster; this module is the
script that submit runs. The same entry points work standalone on
``local[N]`` for development. Mirrors the reference's CLI surface
(/root/reference/demo.py:718-760: positional codebase path + --backend/
--watch/--no-queries; /root/reference/src/pipeline/processor.py:536-556:
process path -> save -> sample queries -> stats) as subcommands over the
Spark engine:

  build    source parquet -> triples + file/stage lineage + metrics JSON;
           --resume anti-joins the lineage ledger so a killed run
           reprocesses only unfinished files (appending triples + ledger
           rows), --dry-run reports what a resume WOULD do.
  stats    entity-type histogram of a stored graph (B16).
  query    named template queries (B1-B15) or raw SQL over the
           registered triple/edge views, to stdout or parquet.
  export   distributed N-Triples / Turtle dumps (A17 interop).

Session policy: under spark-submit the JVM gateway already exists
(PYSPARK_GATEWAY_PORT is set) and --master/--conf belong to submit, so
the builder inherits them untouched; standalone we fall back to the
tuned local-mode factory (session.get_spark). An already-active session
(tests, notebooks) is always reused — getOrCreate never forks.

Resume caveat (SURVEY §1.3-2, soak-test-documented): colliding parameter
URIs dedup within one build batch only, so a resumed run that re-parses
a file whose parameters collide with an already-stored file's keeps both
rows — the same faithful divergence the incremental path has vs a global
rebuild.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import SparkSession


def _get_session(app: str, cores: int | None) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    if "PYSPARK_GATEWAY_PORT" in os.environ:
        # launched by spark-submit: the JVM (and its --master/--conf) is
        # already up; setting master here would fight the submit args
        return SparkSession.builder.appName(app).getOrCreate()
    from .session import get_spark

    return get_spark(app, cores=cores)


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    """Driver-side small-file write through the Hadoop FileSystem API so
    metrics land next to the data on whatever FS holds the graph
    (file://, hdfs://, s3a://) — same route compact() uses for deletes."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _emit(summary: dict) -> None:
    print(json.dumps(summary, sort_keys=True))


# ---------------------------------------------------------------- build


def cmd_build(args: argparse.Namespace) -> int:
    from .pipeline import build_graph, verify_content_invariant
    from .store import (
        resume_pending,
        stage_lineage,
        write_file_lineage,
        write_triples,
    )

    spark = _get_session("ckg-build", args.cores)
    t_start = time.perf_counter()
    # --src-table reads through the session catalog (Iceberg/Hive table
    # or temp view — the north rule's deployed input shape); --src is a
    # bare parquet path for catalog-less runs
    src = (
        spark.read.table(args.src_table)
        if args.src_table
        else spark.read.parquet(args.src)
    )

    timings: dict[str, float] = {}
    if args.resume or args.dry_run:
        pending = resume_pending(spark, src, args.out, args.snapshot)
    else:
        pending = src
    t0 = time.perf_counter()
    n_pending = pending.count()
    timings["count_pending_s"] = round(time.perf_counter() - t0, 3)

    if args.dry_run:
        _emit({"cmd": "build", "dry_run": True, "n_pending_files": n_pending})
        return 0
    run_id = time.strftime("%Y%m%d_%H%M%S", time.gmtime())
    if n_pending == 0:
        _emit({"cmd": "build", "run_id": run_id, "n_pending_files": 0,
               "note": "nothing to do — ledger covers every input"})
        return 0

    res = build_graph(
        pending,
        apply_filters=not args.no_filters,
        repartition=args.repartition,
        mode=args.mode,
    )
    try:
        if not args.skip_invariant:
            t0 = time.perf_counter()
            bad = verify_content_invariant(pending, res.entities).count()
            timings["invariant_s"] = round(time.perf_counter() - t0, 3)
            if bad:
                _emit({"cmd": "build", "run_id": run_id, "error":
                       f"content-sha256 invariant violated on {bad} files"})
                return 2

        write_mode = "append" if args.resume else "overwrite"
        t0 = time.perf_counter()
        triples_path = write_triples(
            res.triples,
            args.out,
            snapshot=args.snapshot,
            buckets_per_pred=args.buckets_per_pred,
            write_mode=write_mode,
        )
        timings["write_triples_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        write_file_lineage(
            res.entities, args.out, snapshot=args.snapshot, write_mode=write_mode
        )
        if args.write_entities:
            # the entity table is what read_current/compact resolve
            # superseded subjects against — persist it beside the triples
            # so the incremental path can start from a CLI build
            res.entities.write.mode(write_mode).parquet(
                f"{args.out}/entities/snap={args.snapshot}"
            )
        # per-partition stage lineage (north rule bookkeeping): computed
        # from the persisted entity table, appended per run
        (
            stage_lineage(res.entities, f"extract:{run_id}")
            .write.mode("append")
            .parquet(f"{args.out}/stage_lineage/snap={args.snapshot}")
        )
        timings["write_lineage_s"] = round(time.perf_counter() - t0, 3)
    finally:
        res.unpersist()

    n_triples_total = spark.read.parquet(triples_path).count()
    timings["total_s"] = round(time.perf_counter() - t_start, 3)
    summary = {
        "cmd": "build",
        "run_id": run_id,
        "mode": args.mode,
        "resumed": bool(args.resume),
        "n_pending_files": n_pending,
        "n_triples_total": n_triples_total,
        "triples_path": triples_path,
        "timings": timings,
    }
    _write_text(
        spark,
        f"{args.out}/metrics/run_{run_id}.json",
        json.dumps(summary, sort_keys=True, indent=1),
    )
    _emit(summary)
    return 0


# ---------------------------------------------------------------- stats


def cmd_stats(args: argparse.Namespace) -> int:
    from .pipeline import graph_stats
    from .store import read_triples

    spark = _get_session("ckg-stats", args.cores)
    t = read_triples(spark, args.graph, args.snapshot)
    merged = False
    if args.state_dir:
        from .incremental import read_current

        ents = _entities_or_none(spark, args.graph, args.snapshot)
        if ents is None:
            _emit({"cmd": "stats", "error":
                   "--state-dir needs the entity table: rebuild with "
                   "build --write-entities (or compact first)"})
            return 2
        t = read_current(spark, t, ents, args.state_dir)
        merged = True
    rows = graph_stats(t).collect()
    _emit({"cmd": "stats", "n_triples": t.count(), "merged_deltas": merged,
           "entity_counts": {r["entity_type"]: r["count"] for r in rows}})
    return 0


def _entities_or_none(spark, graph: str, snapshot: str):
    try:
        return spark.read.parquet(f"{graph}/entities/snap={snapshot}")
    except Exception:
        return None


def cmd_compact(args: argparse.Namespace) -> int:
    from .incremental import compact
    from .store import read_triples

    spark = _get_session("ckg-compact", args.cores)
    base = read_triples(spark, args.graph, args.base_snapshot)
    ents = _entities_or_none(spark, args.graph, args.base_snapshot)
    if ents is None:
        _emit({"cmd": "compact", "error":
               f"no entity table at {args.graph}/entities/"
               f"snap={args.base_snapshot}: rebuild with "
               "build --write-entities (compacted snapshots carry one)"})
        return 2
    path = compact(
        spark, base, ents, args.state_dir, args.graph, snapshot=args.snapshot
    )
    n = spark.read.parquet(path).count()
    _emit({"cmd": "compact", "snapshot": args.snapshot, "n_triples": n,
           "triples_path": path})
    return 0


# ---------------------------------------------------------------- query

#: name -> (callable(triples, *args), help). Positional --arg values are
#: passed through; ints auto-cast so "--arg 5" hits int parameters.
def _registry():
    from . import nlq, queries as Q
    from .pipeline import graph_stats

    return {
        "calls": (Q.functions_calling, "functions calling <name>"),
        "called-by": (Q.functions_called_by, "functions <name> calls"),
        "in-module": (Q.functions_in_module, "functions in module <name>"),
        "implements": (Q.classes_implementing, "classes implementing <name>"),
        "accesses": (Q.variables_accessed_by, "variables accessed by <name>"),
        "unused": (Q.unused_functions, "functions never called"),
        "high-complexity": (Q.high_complexity_functions,
                            "functions making >= <min_calls=5> calls"),
        "many-params": (Q.functions_with_many_parameters,
                        "functions with >= <min_params=4> parameters"),
        "circular": (Q.circular_dependencies, "module import cycles"),
        "db-ops": (Q.database_operations, "DB-flavored call expressions"),
        "entity-counts": (graph_stats, "rdf:type histogram"),
        "context": (Q.get_context, "k-hop context of <uri> [depth]"),
        "chain": (Q.call_chain_between, "call chain <from> <to>"),
        "nl": (nlq.natural_language_query, "route a natural-language question"),
    }


def cmd_query(args: argparse.Namespace) -> int:
    from .queries import register_views
    from .store import read_triples

    spark = _get_session("ckg-query", args.cores)
    t = read_triples(spark, args.graph, args.snapshot)
    if args.sql:
        register_views(spark, t)
        df = spark.sql(args.sql)
    else:
        reg = _registry()
        if args.name not in reg:
            _emit({"cmd": "query", "error": f"unknown query '{args.name}'",
                   "known": {k: v[1] for k, v in sorted(reg.items())}})
            return 2
        fn = reg[args.name][0]
        conv = [int(a) if a.lstrip("-").isdigit() else a for a in args.arg]
        df = fn(t, *conv)
        if df is None:  # nl routing miss
            _emit({"cmd": "query", "name": args.name,
                   "error": "no route for that question"})
            return 2
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        _emit({"cmd": "query", "rows": spark.read.parquet(args.out).count(),
               "out": args.out})
    else:
        rows = df.limit(args.limit).collect()
        _emit({"cmd": "query", "rows_shown": len(rows),
               "rows": [r.asDict(recursive=True) for r in rows]})
    return 0


# ---------------------------------------------------------------- export


def cmd_export(args: argparse.Namespace) -> int:
    from .rdfio import write_ntriples
    from .store import read_triples
    from .turtle import write_turtle

    spark = _get_session("ckg-export", args.cores)
    t = read_triples(spark, args.graph, args.snapshot)
    if args.format == "nt":
        write_ntriples(t, args.out)
    else:
        write_turtle(t, args.out)
    _emit({"cmd": "export", "format": args.format, "out": args.out})
    return 0


# ---------------------------------------------------------------- corpus


def cmd_corpus(args: argparse.Namespace) -> int:
    """LLM-corpus preparation over a documents parquet
    (doc_id, text, lang, source, ...) — the ops/ family behind one
    deployable entry point, writing the result parquet to --out."""
    from .ops import corpus as C, dedup as D, text as TX

    spark = _get_session("ckg-corpus", args.cores)
    docs = spark.read.parquet(args.inp)
    if args.op == "exact-dedup":
        df = D.exact_dedup(docs)
    elif args.op == "near-dup-clusters":
        df = C.dedup_clusters(docs, threshold=args.threshold)
    elif args.op == "clean":
        df = TX.clean_corpus(docs)
    elif args.op == "c4":
        df = TX.c4_line_filter(docs)
    elif args.op == "decontaminate":
        if not args.benchmark:
            _emit({"cmd": "corpus", "error": "--benchmark required"})
            return 2
        df = C.decontaminate(docs, spark.read.parquet(args.benchmark))
    elif args.op == "shard":
        df = C.shard_corpus(docs, n_shards=args.n_shards)
    elif args.op == "sample":
        fr = {}
        for spec in args.rate:
            lang, _, frac = spec.partition("=")
            fr[lang] = float(frac)
        df = C.stratified_sample(docs, fr, default=args.default_rate)
    elif args.op == "vocab":
        df = C.top_vocab(docs, k=args.k)
    elif args.op == "pack":
        df = C.pack_sequences(docs, seq_len=args.seq_len,
                              n_shards=args.n_shards)
    elif args.op == "freq-score":
        df = C.corpus_freq_score(docs, vocab_size=args.vocab_size)
    else:  # mixture
        df = C.mixture_weights(docs, alpha=args.alpha)
    df.write.mode("overwrite").parquet(args.out)
    _emit({"cmd": "corpus", "op": args.op,
           "rows": spark.read.parquet(args.out).count(), "out": args.out})
    return 0


# ----------------------------------------------------------------- main


def _parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m codeontology_spark",
        description=__doc__.split("\n\n")[0],
    )
    ap.add_argument("--cores", type=int, default=None,
                    help="standalone local[N] cores (ignored under spark-submit)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="source parquet -> triple store")
    bsrc = b.add_mutually_exclusive_group(required=True)
    bsrc.add_argument("--src", help="source table parquet path")
    bsrc.add_argument("--src-table",
                      help="catalog table name (Iceberg/Hive/temp view)")
    b.add_argument("--out", required=True, help="graph store base dir")
    b.add_argument("--snapshot", default="latest")
    b.add_argument("--mode", choices=["treesitter", "fallback"],
                   default="treesitter")
    b.add_argument("--resume", action="store_true",
                   help="process only files absent from the lineage ledger; append")
    b.add_argument("--dry-run", action="store_true",
                   help="report pending-file count and exit")
    b.add_argument("--no-filters", action="store_true",
                   help="skip A1/A2 discovery filters")
    b.add_argument("--repartition", type=int, default=None)
    b.add_argument("--buckets-per-pred", type=int, default=8)
    b.add_argument("--skip-invariant", action="store_true",
                   help="skip the per-row content-sha256 check")
    b.add_argument("--write-entities", action="store_true",
                   help="persist the entity table (enables stats "
                        "--state-dir and compact)")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("stats", help="entity-type histogram")
    s.add_argument("--graph", required=True)
    s.add_argument("--snapshot", default="latest")
    s.add_argument("--state-dir",
                   help="merge streamed deltas (incremental state dir) "
                        "into the view first")
    s.set_defaults(fn=cmd_stats)

    k = sub.add_parser("compact",
                       help="fold streamed deltas into a fresh snapshot")
    k.add_argument("--graph", required=True)
    k.add_argument("--state-dir", required=True)
    k.add_argument("--base-snapshot", default="latest")
    k.add_argument("--snapshot", default="compacted")
    k.set_defaults(fn=cmd_compact)

    q = sub.add_parser("query", help="template query or raw SQL")
    q.add_argument("--graph", required=True)
    q.add_argument("--snapshot", default="latest")
    g = q.add_mutually_exclusive_group(required=True)
    g.add_argument("--name", help="template name (see error output for list)")
    g.add_argument("--sql", help="raw SQL over registered views")
    q.add_argument("--arg", action="append", default=[],
                   help="positional argument for --name (repeatable)")
    q.add_argument("--limit", type=int, default=50)
    q.add_argument("--out", help="write full result parquet instead of stdout")
    q.set_defaults(fn=cmd_query)

    c = sub.add_parser("corpus", help="LLM-corpus prep over a documents parquet")
    c.add_argument("--in", dest="inp", required=True,
                   help="documents parquet (doc_id, text, lang, source, ...)")
    c.add_argument("--out", required=True, help="result parquet path")
    c.add_argument("--op", required=True,
                   choices=["exact-dedup", "near-dup-clusters", "clean", "c4",
                            "decontaminate", "shard", "sample", "vocab",
                            "mixture", "pack", "freq-score"])
    c.add_argument("--benchmark", help="benchmark parquet (decontaminate)")
    c.add_argument("--threshold", type=float, default=0.6)
    c.add_argument("--n-shards", type=int, default=64)
    c.add_argument("--rate", action="append", default=[],
                   help="lang=fraction (sample; repeatable)")
    c.add_argument("--default-rate", type=float, default=0.0)
    c.add_argument("--k", type=int, default=20)
    c.add_argument("--alpha", type=float, default=0.5)
    c.add_argument("--seq-len", type=int, default=2048)
    c.add_argument("--vocab-size", type=int, default=1000)
    c.set_defaults(fn=cmd_corpus)

    e = sub.add_parser("export", help="dump the graph as .nt or .ttl")
    e.add_argument("--graph", required=True)
    e.add_argument("--snapshot", default="latest")
    e.add_argument("--format", choices=["nt", "ttl"], required=True)
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_export)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
