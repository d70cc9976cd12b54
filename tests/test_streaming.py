"""C3 end-to-end: file-source micro-batches → latest-wins → incremental
graph deltas via foreachBatch (incremental.stream_updates)."""

import json
import time

import pytest
from pyspark.sql import functions as F

from codeontology_spark.incremental import stream_updates


def test_stream_updates_end_to_end(spark, tmp_path):
    inbox = tmp_path / "inbox"
    state = tmp_path / "state"
    ckpt = tmp_path / "ckpt"
    inbox.mkdir()

    events = [
        {"repo": "r", "path": "a.js", "ts": "2026-01-01T00:00:00", "event_type": "updated",
         "commit": "c1", "lang": "javascript",
         "content": "function stale() { return 0; }"},
        {"repo": "r", "path": "a.js", "ts": "2026-01-01T00:00:01", "event_type": "updated",
         "commit": "c1", "lang": "javascript",
         "content": "function fresh(x) { return x; }"},
        {"repo": "r", "path": "b.js", "ts": "2026-01-01T00:00:00", "event_type": "updated",
         "commit": "c1", "lang": "javascript",
         "content": "function other() { return 1; }"},
    ]
    (inbox / "batch1.json").write_text("\n".join(json.dumps(e) for e in events))

    q = stream_updates(spark, str(inbox), str(state), str(ckpt), trigger_seconds=1)
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                delta = spark.read.parquet(f"{state}/triples_delta")
                if delta.count() > 0:
                    break
            except Exception:
                time.sleep(1)
    finally:
        q.stop()

    delta = spark.read.parquet(f"{state}/triples_delta")
    names = {
        r.obj for r in delta.filter(F.col("pred") == "code:hasName").collect()
    }
    # latest-wins: the ts=00:00:01 version of a.js supersedes the stale one
    assert "fresh" in names and "other" in names
    assert "stale" not in names


def test_read_current_merges_base_and_deltas_lww(spark, tmp_path):
    """VERDICT r3 #3: the merged reader. Base graph has a.js/b.js/c.js; two
    SEPARATE micro-batches update a.js (v1 then v2) and the second deletes
    b.js. read_current must show a.js's v2 only (last writer wins by
    batch_id, across batches AND over the base), no b.js rows, and c.js
    untouched; compact() folds the merged view into a snapshot and clears
    the deltas."""
    from codeontology_spark.incremental import (
        DELTA_KEYS,
        DELTA_TRIPLES,
        compact,
        read_current,
        read_current_entities,
        stream_updates,
    )
    from codeontology_spark.pipeline import build_graph
    from codeontology_spark.store import read_triples

    src = [
        ("r", "a.js", "c0", "javascript", "function base_a() { return 0; }"),
        ("r", "b.js", "c0", "javascript", "function base_b() { return 0; }"),
        ("r", "c.js", "c0", "javascript", "function base_c() { return 0; }"),
    ]
    srcp = str(tmp_path / "base_src")
    spark.createDataFrame(
        src, "repo string, path string, commit string, lang string, content string"
    ).write.parquet(srcp)
    base = build_graph(spark.read.parquet(srcp), persist=True)

    inbox = tmp_path / "inbox_lww"
    state = tmp_path / "state_lww"
    ckpt = tmp_path / "ckpt_lww"
    inbox.mkdir()

    def ev(path, ts, content, event_type="updated"):
        return {"repo": "r", "path": path, "ts": ts, "event_type": event_type,
                "commit": "c1", "lang": "javascript", "content": content}

    q = stream_updates(spark, str(inbox), str(state), str(ckpt), trigger_seconds=1)
    try:
        (inbox / "b1.json").write_text(json.dumps(
            ev("a.js", "2026-01-01T00:00:00", "function v1_a() { return 1; }")))
        q.processAllAvailable()
        (inbox / "b2.json").write_text("\n".join([
            json.dumps(ev("a.js", "2026-01-01T00:01:00", "function v2_a(x) { return x; }")),
            json.dumps(ev("b.js", "2026-01-01T00:01:00", None, event_type="deleted")),
        ]))
        q.processAllAvailable()
    finally:
        q.stop()

    # two distinct batches actually landed (else LWW across batches is untested)
    assert (
        spark.read.parquet(f"{state}/{DELTA_KEYS}")
        .select("batch_id").distinct().count() == 2
    )

    merged = read_current(spark, base.triples, base.entities, str(state))
    names = {r.obj for r in merged.filter(F.col("pred") == "code:hasName").collect()}
    assert "v2_a" in names and "x" in names      # winning batch, incl. its params
    assert "v1_a" not in names                   # superseded delta
    assert "base_a" not in names                 # superseded base
    assert "base_b" not in names                 # deleted file
    assert "base_c" in names                     # untouched base file
    # bnode-SUBJECT triples (_:loc0|<uri>, ...) of superseded files must
    # go too — the anti-join matches by owning entity, not raw subject
    subjects = {r.subj for r in merged.select("subj").distinct().collect()}
    assert not any("base_a" in s or "base_b" in s or "v1_a" in s for s in subjects)
    assert any(s.startswith("_:loc") and "v2_a" in s for s in subjects)
    # no stale subjects for a.js: every a.js-located triple is v2's
    ents = read_current_entities(spark, base.entities, str(state))
    a_ents = ents.filter(F.col("path") == "a.js")
    assert {r.name for r in a_ents.filter(F.col("kind") == "function").collect()} == {"v2_a"}

    # at-least-once replay: re-appending the winning batch's delta rows
    # (what a crash between append and checkpoint commit produces) must
    # not duplicate triples in the merged view
    merged_count = merged.count()
    winning = spark.read.parquet(f"{state}/{DELTA_TRIPLES}")
    winning.filter(
        F.col("batch_id") == winning.agg(F.max("batch_id")).collect()[0][0]
    ).write.mode("append").parquet(f"{state}/{DELTA_TRIPLES}")
    remerged = read_current(spark, base.triples, base.entities, str(state))
    assert remerged.count() == merged_count

    store_base = str(tmp_path / "store_lww")
    compact(spark, base.triples, base.entities, str(state), store_base, snapshot="s1")
    snap = read_triples(spark, store_base, snapshot="s1")
    snap_names = {r.obj for r in snap.filter(F.col("pred") == "code:hasName").collect()}
    assert snap_names == names
    import os
    assert not os.path.exists(f"{state}/{DELTA_TRIPLES}")
    # compact also persisted the MERGED entity table — the pre-compaction
    # entities would miss v2_a and make a later update of a.js leave
    # v2_a's rows behind
    from codeontology_spark.incremental import read_compacted_entities

    snap_ents = read_compacted_entities(spark, store_base, snapshot="s1")
    efuncs = {r.name for r in snap_ents.filter(
        (F.col("path") == "a.js") & (F.col("kind") == "function")).collect()}
    assert efuncs == {"v2_a"}
    # post-compaction: with deltas cleared, read_current is the identity
    again = read_current(spark, snap, snap_ents, str(state))
    assert again.count() == snap.count()

    # ADVICE r4: a second compaction cycle reading FROM snap=s1 must not
    # be allowed to overwrite snap=s1 (read-under-overwrite corrupts);
    # the guard fires before any write or delta delete happens
    with pytest.raises(ValueError, match="input of the base"):
        compact(spark, snap, snap_ents, str(state), store_base, snapshot="s1")
    # a distinct snapshot name is fine
    compact(spark, snap, snap_ents, str(state), store_base, snapshot="s2")
    assert read_triples(spark, store_base, snapshot="s2").count() == snap.count()


def test_stream_updates_restart_from_checkpoint(spark, tmp_path):
    """C3 durability: stopping the stream and starting a NEW query over the
    same checkpoint must (a) not reprocess the already-committed batch and
    (b) continue batch_id numbering, so read_current's last-writer-wins
    stays correct across restarts."""
    from codeontology_spark.incremental import (
        DELTA_KEYS,
        read_current,
        stream_updates,
    )
    from codeontology_spark.pipeline import build_graph

    src = [("r", "f.js", "c0", "javascript", "function base_f() { return 0; }")]
    srcp = str(tmp_path / "restart_src")
    spark.createDataFrame(
        src, "repo string, path string, commit string, lang string, content string"
    ).write.parquet(srcp)
    base = build_graph(spark.read.parquet(srcp), persist=True)

    inbox = tmp_path / "inbox_rs"
    state = tmp_path / "state_rs"
    ckpt = tmp_path / "ckpt_rs"
    inbox.mkdir()

    def ev(ts, content):
        return {"repo": "r", "path": "f.js", "ts": ts, "event_type": "updated",
                "commit": "c1", "lang": "javascript", "content": content}

    q1 = stream_updates(spark, str(inbox), str(state), str(ckpt), trigger_seconds=1)
    try:
        (inbox / "b1.json").write_text(json.dumps(
            ev("2026-01-01T00:00:00", "function gen1_f() { return 1; }")))
        q1.processAllAvailable()
    finally:
        q1.stop()

    q2 = stream_updates(spark, str(inbox), str(state), str(ckpt), trigger_seconds=1)
    try:
        (inbox / "b2.json").write_text(json.dumps(
            ev("2026-01-01T00:01:00", "function gen2_f(x) { return x; }")))
        q2.processAllAvailable()
    finally:
        q2.stop()

    keys = spark.read.parquet(f"{state}/{DELTA_KEYS}")
    batch_ids = sorted(r.batch_id for r in keys.select("batch_id").distinct().collect())
    assert len(batch_ids) == 2 and batch_ids[0] < batch_ids[1]  # no replay, ids advance
    merged = read_current(spark, base.triples, base.entities, str(state))
    names = {r.obj for r in merged.filter(F.col("pred") == "code:hasName").collect()}
    assert "gen2_f" in names and "gen1_f" not in names and "base_f" not in names


def test_stream_change_rates_watermarked_window(spark, tmp_path):
    """Watermarked event-time windowed aggregate: counts land in the right
    window per (repo, event_type); state is bounded by the watermark."""
    from codeontology_spark.incremental import stream_change_rates

    inbox = tmp_path / "inbox2"
    ckpt = tmp_path / "ckpt2"
    inbox.mkdir()
    events = [
        {"repo": "r1", "path": "a.js", "ts": "2026-01-01T00:00:01", "event_type": "updated"},
        {"repo": "r1", "path": "b.js", "ts": "2026-01-01T00:00:03", "event_type": "updated"},
        {"repo": "r1", "path": "c.js", "ts": "2026-01-01T00:00:12", "event_type": "deleted"},
        {"repo": "r2", "path": "d.js", "ts": "2026-01-01T00:00:04", "event_type": "updated"},
    ]
    (inbox / "b1.json").write_text("\n".join(json.dumps(e) for e in events))

    q = stream_change_rates(spark, str(inbox), str(ckpt), window_seconds=10,
                            query_name="rates_test")
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM rates_test").collect()
            if rows:
                break
            time.sleep(1)
    finally:
        q.stop()

    got = {(r.window.start.isoformat(), r.repo, r.event_type, r.n) for r in rows}
    assert ("2026-01-01T00:00:00", "r1", "updated", 2) in got
    assert ("2026-01-01T00:00:10", "r1", "deleted", 1) in got
    assert ("2026-01-01T00:00:00", "r2", "updated", 1) in got


def test_stream_sessionize_watermarked(spark, tmp_path):
    """Streaming session windows: sessions are appended once the
    watermark passes their end — the same session_window aggregate as
    the batch op, state bounded by the watermark."""
    from codeontology_spark.ops.events import stream_sessionize

    inbox = tmp_path / "sess_inbox"
    ckpt = tmp_path / "sess_ckpt"
    inbox.mkdir()

    def ev(eid, uid, ts):
        return {"event_id": eid, "ts": ts, "user_id": uid,
                "event_type": "c", "value": 1.0, "props": "{}"}

    q = stream_sessionize(spark, str(inbox), str(ckpt), gap_minutes=30,
                          watermark_minutes=60, query_name="sess_t")
    try:
        (inbox / "b1.json").write_text("\n".join(json.dumps(e) for e in [
            ev(1, 7, "2024-01-01T00:00:00"),
            ev(2, 7, "2024-01-01T00:10:00"),   # merges with ev1
            ev(3, 7, "2024-01-01T01:00:00"),   # 50' gap -> second session
        ]))
        q.processAllAvailable()
        # advance event time far enough that the watermark closes everything
        (inbox / "b2.json").write_text(json.dumps(ev(99, 99, "2024-01-01T06:00:00")))
        q.processAllAvailable()
        (inbox / "b3.json").write_text(json.dumps(ev(100, 99, "2024-01-01T12:00:00")))
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM sess_t WHERE user_id = 7").collect()
    got = sorted((r.n_events, r.session_start.isoformat()) for r in rows)
    assert got == [(1, "2024-01-01T01:00:00"), (2, "2024-01-01T00:00:00")]


def test_stream_user_activity_custom_state(spark, tmp_path):
    """applyInPandasWithState custom operator: per-user running totals
    across micro-batches, flushed + evicted once the user is quiet in
    EVENT time (watermark-driven timeout — deterministic, no wall-clock
    sleeps)."""
    from codeontology_spark.ops.events import stream_user_activity

    inbox = tmp_path / "act_inbox"
    ckpt = tmp_path / "act_ckpt"
    inbox.mkdir()

    def ev(eid, uid, ts, v):
        return {"event_id": eid, "ts": ts, "user_id": uid,
                "event_type": "c", "value": v, "props": "{}"}

    q = stream_user_activity(spark, str(inbox), str(ckpt), quiet_seconds=60,
                             watermark_minutes=10, query_name="act_t")
    try:
        (inbox / "b1.json").write_text("\n".join(json.dumps(e) for e in [
            ev(1, 7, "2024-01-01T00:00:00", 2.5),
            ev(2, 7, "2024-01-01T00:00:01", 1.5),
        ]))
        q.processAllAvailable()
        # second batch accumulates ONTO the kept state
        (inbox / "b2.json").write_text(json.dumps(ev(3, 7, "2024-01-01T00:00:02", 6.0)))
        q.processAllAvailable()
        rows = {(r.n_events, r.total_value) for r in
                spark.sql("SELECT * FROM act_t WHERE user_id = 7").collect()}
        assert (2, 4.0) in rows and (3, 10.0) in rows
        # advance EVENT time far past user 7's quiet deadline: the
        # watermark (max ts - 10 min) crosses 00:00:02+60s and the next
        # batch fires the timeout. Two pokes: watermark used by batch N
        # comes from batch N-1's data.
        (inbox / "b3.json").write_text(json.dumps(ev(100, 99, "2024-01-01T02:00:00", 0.0)))
        q.processAllAvailable()
        (inbox / "b4.json").write_text(json.dumps(ev(101, 99, "2024-01-01T02:00:01", 0.0)))
        q.processAllAvailable()
        flushed = spark.sql(
            "SELECT * FROM act_t WHERE user_id = 7 AND flushed_by_timeout"
        ).collect()
        assert flushed and (flushed[0].n_events, flushed[0].total_value) == (3, 10.0)
    finally:
        q.stop()


def test_stream_dedup_documents_bounded_state(spark, tmp_path):
    """Streaming exact-dedup twin of ops.dedup.exact_dedup: duplicates
    within the watermark are dropped, first occurrence survives."""
    import json as _json

    from codeontology_spark.incremental import stream_dedup_documents

    inbox = tmp_path / "docs_inbox"
    ckpt = tmp_path / "docs_ckpt"
    inbox.mkdir()
    docs = [
        {"doc_id": 1, "ts": "2026-01-01T00:00:00", "text": "same boilerplate page"},
        {"doc_id": 2, "ts": "2026-01-01T00:00:01", "text": "same boilerplate page"},
        {"doc_id": 3, "ts": "2026-01-01T00:00:02", "text": "a unique document"},
        {"doc_id": 4, "ts": "2026-01-01T00:00:03", "text": "same boilerplate page"},
    ]
    (inbox / "b1.json").write_text("\n".join(_json.dumps(d) for d in docs))

    q = stream_dedup_documents(spark, str(inbox), str(ckpt), query_name="dd_docs")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM dd_docs").collect()
    ids = sorted(r.doc_id for r in out)
    assert ids == [1, 3]  # first of the dup cluster + the unique doc
    assert all(len(r.text_sha) == 64 for r in out)


@pytest.mark.slow
def test_stream_soak_churn_restart_equals_batch_rebuild(spark, tmp_path):
    """VERDICT r4 #5 scale soak: a synthetic churn of 1,200 files across
    24 micro-batches with a kill/restart mid-run. Final merged state
    (read_current / read_current_entities over base ⊕ deltas) must equal
    a from-scratch batch rebuild of the files' final contents — exactly,
    as triple SETS (bnode skolem labels are deterministic functions of
    (path, uri), so even they must agree). Also pins that the restarted
    query resumes from the checkpoint instead of reprocessing (no
    duplicate batch_ids for the same inbox file)."""
    from codeontology_spark.incremental import (
        DELTA_KEYS,
        read_current,
        read_current_entities,
        stream_updates,
    )
    from codeontology_spark.pipeline import build_graph

    N = 1200
    BATCHES = 24

    # per-file-unique parameter names: the reference's parameter URIs
    # strip file paths (quirk §1.3-2), so same-named params at the same
    # line in DIFFERENT files mint the SAME URI. A global rebuild dedups
    # those collisions corpus-wide (A13), but per-batch incremental
    # builds can only dedup within their own batch — both engines (ours
    # and the reference's rdflib set-union) accumulate the collided
    # rows incrementally. That's faithful divergence, not a merge bug;
    # the soak pins merge CORRECTNESS, so its fixture avoids the quirk.
    def content(i, version):
        return (
            f"function f{i}_v{version}(a{i}, b{i}) "
            f"{{ return g{i}(a{i}) + {version}; }}\n"
            f"function g{i}(x{i}) {{ return x{i} * {i % 13}; }}\n"
        )

    # base graph = version 0 of every file (batch-built snapshot)
    base_src = spark.createDataFrame(
        [("soak", f"d{i % 10}/f{i}.js", "c0", "javascript", content(i, 0))
         for i in range(N)],
        "repo string, path string, commit string, lang string, content string",
    )
    base = build_graph(base_src, persist=True)

    # churn: every file gets v1; files with i%3==0 also get v2 (later ts,
    # possibly in a LATER batch); files with i%10==0 are finally deleted.
    # Events are ordered so cross-batch last-writer-wins is exercised.
    def ev(i, ts_min, event_type, version=None):
        return {
            "repo": "soak", "path": f"d{i % 10}/f{i}.js",
            "ts": f"2026-01-01T00:{ts_min:02d}:00", "event_type": event_type,
            "commit": "c1", "lang": "javascript",
            "content": content(i, version) if version is not None else None,
        }

    # batch assignment must respect per-file ts order (a later version in
    # an EARLIER batch would make batch_id-LWW legitimately keep the older
    # one — arrival order IS the stream's truth): v1 events spread over
    # batches 0-11, v2 over 12-19, deletes over 20-23, hashed by file so
    # every batch carries a mix
    batches = [[] for _ in range(BATCHES)]
    for i in range(N):
        batches[i % 12].append(ev(i, 1, "updated", 1))
        if i % 3 == 0:
            batches[12 + i % 8].append(ev(i, 2, "updated", 2))
        if i % 10 == 0:
            batches[20 + i % 4].append(ev(i, 3, "deleted"))

    inbox = tmp_path / "soak_inbox"
    state = tmp_path / "soak_state"
    ckpt = tmp_path / "soak_ckpt"
    inbox.mkdir()

    def feed(q, idx):
        (inbox / f"b{idx:03d}.json").write_text(
            "\n".join(json.dumps(e) for e in batches[idx])
        )
        q.processAllAvailable()

    half = BATCHES // 2
    q = stream_updates(spark, str(inbox), str(state), str(ckpt), trigger_seconds=1)
    try:
        for idx in range(half):
            feed(q, idx)
    finally:
        q.stop()  # the "kill": mid-run, deltas half-applied

    # restart a NEW query over the same checkpoint; it must resume, not
    # replay (checkpointed file-source offsets)
    keys_before = spark.read.parquet(f"{state}/{DELTA_KEYS}")
    n_batches_before = keys_before.select("batch_id").distinct().count()
    q2 = stream_updates(spark, str(inbox), str(state), str(ckpt), trigger_seconds=1)
    try:
        q2.processAllAvailable()  # nothing new → no replays
        keys_mid = spark.read.parquet(f"{state}/{DELTA_KEYS}")
        assert keys_mid.select("batch_id").distinct().count() == n_batches_before
        for idx in range(half, BATCHES):
            feed(q2, idx)
    finally:
        q2.stop()

    # expected final state per file: deleted if i%10==0, else v2 when
    # i%3==0, else v1
    expected_src = spark.createDataFrame(
        [("soak", f"d{i % 10}/f{i}.js", "c1", "javascript",
          content(i, 2 if i % 3 == 0 else 1))
         for i in range(N) if i % 10 != 0],
        "repo string, path string, commit string, lang string, content string",
    )
    expected = build_graph(expected_src, persist=True)

    merged = read_current(spark, base.triples, base.entities, str(state))
    cols = ["repo", "subj", "pred", "obj", "is_uri", "dtype"]
    assert merged.select(cols).exceptAll(expected.triples.select(cols)).count() == 0
    assert expected.triples.select(cols).exceptAll(merged.select(cols)).count() == 0

    ents = read_current_entities(spark, base.entities, str(state))
    ecols = ["repo", "path", "uri", "kind", "name"]
    assert ents.select(ecols).exceptAll(expected.entities.select(ecols)).count() == 0
    assert expected.entities.select(ecols).exceptAll(ents.select(ecols)).count() == 0
