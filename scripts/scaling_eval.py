"""Noise-robust N→4N scaling-efficiency protocol (north rule evidence).

Interleaves single-trial scaling_run.py legs A-B-A-B (8 and 32 cores
alternating, one JVM at a time, same pre-written corpus) so co-tenant
windows hit both legs equally, then reports:

- wall medians per leg and wall-based efficiency
  (median_wall_N / median_wall_4N) / 4;
- task-time efficiency median(taskTime_N) / median(taskTime_4N) for both
  executorRunTime and executorCpuTime. Total task time is
  parallelism-invariant for a perfectly-scaling job (same work, just
  spread over more threads), so this ratio isolates the job's scaling
  behavior from host steal and scheduling gaps that pollute wall clock on
  this co-tenanted box.

Usage: python scripts/scaling_eval.py [n_repos] [reps_per_leg]
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))


def prewrite_corpus(n_repos: int, path: str) -> None:
    """Write the shared corpus in a SUBPROCESS: spark.stop() does not exit
    the py4j gateway JVM, and a lingering 20 GB pre-touched heap would
    contend with every timed leg."""
    script = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from codeontology_spark.session import get_spark\n"
        "from codeontology_spark.synth import synth_table\n"
        "spark = get_spark('scaling-corpus', cores=32, shuffle_partitions=32)\n"
        "synth_table(spark, n_repos=int(sys.argv[3]), partitions=64)"
        ".write.mode('overwrite').parquet(sys.argv[2] + '/src')\n"
        "synth_table(spark, n_repos=200, partitions=64)"
        ".write.mode('overwrite').parquet(sys.argv[2] + '/warm')\n"
    )
    repo = os.path.dirname(HERE)
    subprocess.run(
        [sys.executable, "-c", script, repo, path, str(n_repos)], check=True
    )


def _host() -> tuple[float, int, int]:
    """(load1, steal_ticks, total_ticks) — per-leg noise stamp so the
    record itself shows whether a leg ran in a contended window. Parsing
    shared with bench.py (same /proc fields, one place to fix)."""
    from bench import _cpu_ticks, _load1

    steal, total = _cpu_ticks()
    return _load1(), steal, total


def run_leg(cores: int, n_repos: int, src: str) -> dict:
    load1, s0, t0 = _host()
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "scaling_run.py"),
            str(cores),
            str(n_repos),
            "1",
            src,
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    _, s1, t1 = _host()
    r = json.loads(out.stdout.strip().splitlines()[-1])
    dt = t1 - t0
    r["host"] = {
        "load1_start": load1,
        "steal_pct": round(100.0 * (s1 - s0) / dt, 2) if dt > 0 else 0.0,
    }
    return r


def main() -> None:
    n_repos = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    large = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    tmp = tempfile.mkdtemp(prefix="scaling_eval_")
    prewrite_corpus(n_repos, tmp)

    legs: dict[int, list[dict]] = {small: [], large: []}
    for rep in range(reps):  # A-B-A-B interleave: noise hits both legs
        for cores in (small, large):
            r = run_leg(cores, n_repos, tmp)
            legs[cores].append(r)
            print(
                f"[scaling] rep {rep} local[{cores}]: wall {r['trials_sec'][0]}s "
                f"task_run {r['task_run_sec'][0]}s task_cpu {r['task_cpu_sec'][0]}s",
                file=sys.stderr,
            )

    def med(cores: int, key: str) -> float:
        return statistics.median(x[key][0] for x in legs[cores])

    wall_s, wall_l = med(small, "trials_sec"), med(large, "trials_sec")
    run_s, run_l = med(small, "task_run_sec"), med(large, "task_run_sec")
    cpu_s, cpu_l = med(small, "task_cpu_sec"), med(large, "task_cpu_sec")
    result = {
        "n_repos": n_repos,
        "reps_per_leg": reps,
        "cores": [small, large],
        "wall_sec_median": {small: wall_s, large: wall_l},
        "wall_all": {c: [x["trials_sec"][0] for x in legs[c]] for c in legs},
        "task_run_sec_median": {small: run_s, large: run_l},
        "task_cpu_sec_median": {small: cpu_s, large: cpu_l},
        "efficiency_wall": round((wall_s / wall_l) / (large / small), 3),
        "efficiency_task_run": round(run_s / run_l, 3),
        "efficiency_task_cpu": round(cpu_s / cpu_l, 3),
        "n_triples": legs[large][0]["n_triples"],
        "host_per_leg": {c: [x.get("host") for x in legs[c]] for c in legs},
    }
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
