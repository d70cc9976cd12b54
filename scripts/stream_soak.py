"""Streaming-path scale soak (VERDICT r4 #5 BENCH evidence): drive
incremental.stream_updates over a larger synthetic churn than the pytest
soak and record STATE-STORE SIZE OVER TIME — delta-directory bytes and
row counts after every micro-batch, the merged-read (read_current)
latency as deltas accumulate, and the post-compaction reset.

What this evidences at 100 TB: the delta store grows linearly with
CHURNED files (not with the base graph), read_current's merge cost grows
with the delta size only, and compact() returns both to O(base). A
deployment sizes its compaction cadence from exactly this curve.

Usage: python scripts/stream_soak.py [n_files] [n_batches] [out_json]
Defaults: 10_000 files, 40 batches, BENCH/r5_stream_soak.json.
Writes one JSON record; prints a one-line pointer (the bench-record
truncation lesson from round 4: big JSON goes to files, not stdout).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dir_stats(path: str) -> tuple[int, int]:
    """(bytes, file_count) of a local directory tree; (0, 0) if absent."""
    total = files = 0
    for root, _, names in os.walk(path):
        for n in names:
            try:
                total += os.path.getsize(os.path.join(root, n))
                files += 1
            except OSError:
                pass
    return total, files


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "r5_stream_soak.json",
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from codeontology_spark.incremental import (
        DELTA_TRIPLES,
        compact,
        read_current,
        stream_updates,
    )
    from codeontology_spark.pipeline import build_graph
    from codeontology_spark.session import get_spark

    spark = get_spark("stream-soak", cores=int(cpus), shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # per-file-unique param names: avoids the §1.3-2 parameter-URI
    # collision quirk so merged counts stay comparable to a rebuild
    # (see the pytest soak for the full rationale)
    def content(i: int, version: int) -> str:
        return (
            f"function f{i}_v{version}(a{i}, b{i}) "
            f"{{ return g{i}(a{i}) + {version}; }}\n"
            f"function g{i}(x{i}) {{ return x{i} * {i % 13}; }}\n"
        )

    work = tempfile.mkdtemp(prefix="stream_soak_")
    inbox = os.path.join(work, "inbox")
    state = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")
    store = os.path.join(work, "store")
    os.makedirs(inbox)

    base_src = spark.createDataFrame(
        [("soak", f"d{i % 50}/f{i}.js", "c0", "javascript", content(i, 0))
         for i in range(n_files)],
        "repo string, path string, commit string, lang string, content string",
    )
    t0 = time.monotonic()
    base = build_graph(base_src, persist=True)
    base_triples = base.triples.localCheckpoint(eager=True)
    base_entities = base.entities.localCheckpoint(eager=True)
    base_n = base_triples.count()
    base_build_s = round(time.monotonic() - t0, 2)

    # churn: each batch b updates the slice of files i ≡ b (mod n_batches)
    # to version b+1 — every file churns exactly once, batches are even
    def ev(i: int, b: int) -> dict:
        return {
            "repo": "soak", "path": f"d{i % 50}/f{i}.js",
            "ts": f"2026-01-01T{b // 60:02d}:{b % 60:02d}:00",
            "event_type": "updated", "commit": "c1", "lang": "javascript",
            "content": content(i, b + 1),
        }

    q = stream_updates(spark, inbox, state, ckpt, trigger_seconds=1)
    samples = []
    try:
        for b in range(n_batches):
            batch = [ev(i, b) for i in range(b, n_files, n_batches)]
            with open(os.path.join(inbox, f"b{b:04d}.json"), "w") as f:
                f.write("\n".join(json.dumps(e) for e in batch))
            tb = time.monotonic()
            q.processAllAvailable()
            proc_s = round(time.monotonic() - tb, 3)
            d_bytes, d_files = dir_stats(os.path.join(state, DELTA_TRIPLES))
            tr = time.monotonic()
            merged_n = read_current(spark, base_triples, base_entities, state).count()
            samples.append({
                "batch": b, "events": len(batch), "process_s": proc_s,
                "delta_bytes": d_bytes, "delta_files": d_files,
                "read_current_s": round(time.monotonic() - tr, 3),
                "merged_triples": merged_n,
            })
            print(f"[soak] batch {b}: delta={d_bytes >> 20}MiB "
                  f"read_current={samples[-1]['read_current_s']}s", file=sys.stderr)
    finally:
        q.stop()

    tc = time.monotonic()
    compact(spark, base_triples, base_entities, state, store, snapshot="epoch1")
    compact_s = round(time.monotonic() - tc, 2)
    post_bytes, _ = dir_stats(os.path.join(state, DELTA_TRIPLES))

    record = {
        "metric": "stream_soak",
        "n_files": n_files,
        "n_batches": n_batches,
        "cpus": int(cpus),
        "base_triples": base_n,
        "base_build_s": base_build_s,
        "final_merged_triples": samples[-1]["merged_triples"] if samples else None,
        "compact_s": compact_s,
        "delta_bytes_after_compact": post_bytes,
        "samples": samples,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "samples"}))
    print(f"[soak] full record: {out_path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
