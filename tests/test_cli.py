"""The spark-submit job driver (python -m codeontology_spark).

Exercises the CLI through main(argv) against the shared test session
(the module's _get_session reuses an active session, so no second JVM is
launched — the sandbox cannot run two concurrently)."""

import json

import pytest

from codeontology_spark.__main__ import main
from codeontology_spark.synth import fixture_table


def _last_json(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


@pytest.fixture(scope="module")
def built_graph(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    src = str(d / "src")
    fixture_table(spark).coalesce(1).write.mode("overwrite").parquet(src)
    out = str(d / "graph")
    rc = main(["build", "--src", src, "--out", out])
    assert rc == 0
    return src, out


def test_build_summary_and_metrics(spark, built_graph, capsys):
    src, out = built_graph
    # the build fixture already ran; re-run to capture its summary here
    rc = main(["build", "--src", src, "--out", out])
    assert rc == 0
    s = _last_json(capsys)
    assert s["cmd"] == "build" and not s["resumed"]
    n_files = spark.read.parquet(src).count()
    assert s["n_pending_files"] == n_files  # every fixture file pending
    assert s["n_triples_total"] > 300
    # metrics JSON written next to the data (Hadoop FS route)
    import glob

    files = glob.glob(f"{out}/metrics/run_*.json")
    assert files
    m = json.loads(open(sorted(files)[-1]).read())
    assert m["n_triples_total"] == s["n_triples_total"]


def test_stats_histogram(built_graph, capsys):
    _, out = built_graph
    assert main(["stats", "--graph", out]) == 0
    s = _last_json(capsys)
    assert s["entity_counts"]["code:Function"] == 43
    assert s["entity_counts"]["code:Module"] == 16


def test_named_query_and_sql(built_graph, capsys):
    _, out = built_graph
    assert main(["query", "--graph", out, "--name", "calls",
                 "--arg", "add"]) == 0
    s = _last_json(capsys)
    assert s["rows_shown"] >= 1

    assert main(["query", "--graph", out, "--sql",
                 "SELECT COUNT(*) AS n FROM triples"]) == 0
    s = _last_json(capsys)
    assert s["rows"][0]["n"] > 300

    rc = main(["query", "--graph", out, "--name", "nope"])
    assert rc == 2
    assert "unknown query" in _last_json(capsys)["error"]


def test_query_parquet_out(built_graph, tmp_path, capsys):
    _, out = built_graph
    dest = str(tmp_path / "res")
    assert main(["query", "--graph", out, "--name", "entity-counts",
                 "--out", dest]) == 0
    assert _last_json(capsys)["rows"] == 9  # fixture type histogram


def test_export_roundtrip(spark, built_graph, tmp_path, capsys):
    from codeontology_spark.rdfio import read_ntriples
    from codeontology_spark.store import read_triples

    _, out = built_graph
    nt = str(tmp_path / "nt")
    assert main(["export", "--graph", out, "--format", "nt",
                 "--out", nt]) == 0
    back = read_ntriples(spark, nt)
    assert back.count() == read_triples(spark, out).count()


def test_resume_appends_only_pending(spark, tmp_path, capsys):
    rows_all = fixture_table(spark)
    paths = sorted(r.path for r in rows_all.select("path").collect())
    first = paths[: len(paths) // 2]
    src_a = str(tmp_path / "src_a")
    src_b = str(tmp_path / "src_b")
    rows_all.filter(rows_all.path.isin(first)).coalesce(1).write.parquet(src_a)
    rows_all.coalesce(1).write.parquet(src_b)
    out = str(tmp_path / "graph")

    assert main(["build", "--src", src_a, "--out", out]) == 0
    a = _last_json(capsys)

    # dry-run against the full table: reports the other half, writes nothing
    assert main(["build", "--src", src_b, "--out", out, "--resume",
                 "--dry-run"]) == 0
    dr = _last_json(capsys)
    assert dr["dry_run"] and dr["n_pending_files"] == len(paths) - len(first)

    assert main(["build", "--src", src_b, "--out", out, "--resume"]) == 0
    b = _last_json(capsys)
    assert b["resumed"] and b["n_pending_files"] == len(paths) - len(first)

    # resumed store ≡ fresh full build (set equality over all triples)
    out_full = str(tmp_path / "graph_full")
    assert main(["build", "--src", src_b, "--out", out_full]) == 0
    from codeontology_spark.store import read_triples

    resumed = read_triples(spark, out)
    full = read_triples(spark, out_full)
    assert resumed.exceptAll(full).isEmpty() and full.exceptAll(resumed).isEmpty()

    # third run: ledger covers everything → no-op
    assert main(["build", "--src", src_b, "--out", out, "--resume"]) == 0
    assert _last_json(capsys)["n_pending_files"] == 0


def test_corpus_subcommand(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(i, f"doc {i} text with words and lines here", "en", f"s{i % 2}", 40)
         for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    src = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(src)

    out = str(tmp_path / "shards")
    assert main(["corpus", "--in", src, "--out", out, "--op", "shard",
                 "--n-shards", "4"]) == 0
    s = _last_json(capsys)
    assert s["rows"] == 20
    got = spark.read.parquet(out)
    assert got.select("shard").distinct().count() <= 4

    out2 = str(tmp_path / "sample")
    assert main(["corpus", "--in", src, "--out", out2, "--op", "sample",
                 "--rate", "en=0.5"]) == 0
    assert 0 < _last_json(capsys)["rows"] < 20

    out3 = str(tmp_path / "mix")
    assert main(["corpus", "--in", src, "--out", out3, "--op", "mixture"]) == 0
    w = {r["source_key"]: r["weight"] for r in spark.read.parquet(out3).collect()}
    assert abs(sum(w.values()) - 1.0) < 1e-6

    # decontaminate requires --benchmark
    assert main(["corpus", "--in", src, "--out", str(tmp_path / "x"),
                 "--op", "decontaminate"]) == 2


def test_build_from_catalog_table(spark, tmp_path, capsys):
    fixture_table(spark).createOrReplaceTempView("cli_src_view")
    out = str(tmp_path / "graph")
    assert main(["build", "--src-table", "cli_src_view", "--out", out]) == 0
    s = _last_json(capsys)
    assert s["n_triples_total"] > 300


def test_stream_then_cli_compact(spark, tmp_path, capsys):
    """build --write-entities → streamed delta → stats --state-dir shows
    the merged view → compact folds it into a snapshot the plain stats
    path reads back identically."""
    import json as _json

    from codeontology_spark.incremental import stream_updates

    src = [("r", "a.js", "c0", "javascript", "function base_a() { return 0; }"),
           ("r", "b.js", "c0", "javascript", "function base_b() { return 0; }")]
    srcp = str(tmp_path / "src")
    spark.createDataFrame(
        src, "repo string, path string, commit string, lang string, content string"
    ).coalesce(1).write.parquet(srcp)
    out = str(tmp_path / "graph")
    assert main(["build", "--src", srcp, "--out", out,
                 "--write-entities"]) == 0

    inbox, state, ckpt = (tmp_path / d for d in ("inbox", "state", "ckpt"))
    inbox.mkdir()
    q = stream_updates(spark, str(inbox), str(state), str(ckpt),
                       trigger_seconds=1)
    try:
        (inbox / "b1.json").write_text(_json.dumps(
            {"repo": "r", "path": "a.js", "ts": "2026-01-01T00:00:00",
             "event_type": "updated", "commit": "c1", "lang": "javascript",
             "content": "function v2_a() { return 1; }"}))
        q.processAllAvailable()
    finally:
        q.stop()

    assert main(["stats", "--graph", out, "--state-dir", str(state)]) == 0
    merged = _last_json(capsys)
    assert merged["merged_deltas"] is True

    assert main(["compact", "--graph", out, "--state-dir", str(state),
                 "--snapshot", "epoch1"]) == 0
    c = _last_json(capsys)
    assert c["n_triples"] == merged["n_triples"]

    assert main(["stats", "--graph", out, "--snapshot", "epoch1"]) == 0
    snap = _last_json(capsys)
    assert snap["entity_counts"] == merged["entity_counts"]
    # deltas cleared: merged view over the new snapshot needs no state
    from codeontology_spark.incremental import DELTA_TRIPLES
    import glob
    assert not glob.glob(f"{state}/{DELTA_TRIPLES}/*.parquet")
