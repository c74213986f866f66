"""Alternating fresh-session bench A/B between two code checkouts.

The BENCH.json `movers_ab_*` method as a reusable tool (r16): when a
round's driver bench shows per-query movers beyond the ~1.3x box-noise
band, adjudicate CODE vs ENVIRONMENT by timing the exact catalog
queries from two checkouts in alternating fresh JVM subprocesses
(A B A B ...), min per arm, identical position within each session.

Usage:
    python tools/movers_ab.py <repoA> <repoB> <sf_dir> q1 q2 ... \
        [--rounds=2]

Appends one JSON line to PROGRESS.jsonl (cwd) and prints it. Check
`uptime` is idle before trusting any numbers (CLAUDE.md).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

def _runner_src() -> str:
    return r"""
import json, sys, time
repo, sf_dir = sys.argv[1], sys.argv[2]
queries = sys.argv[3:]
sys.path.insert(0, repo)
from metadata_ingestion_framework_spark import get_spark
from metadata_ingestion_framework_spark.catalog_queries import QUERIES

spark = get_spark("movers-ab")
out = {}
for name in queries:
    fn = QUERIES[name]
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.collect()
        dt = time.perf_counter() - t0
        for dep in getattr(df, "_persisted_deps", ()):
            dep.unpersist()
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 2)
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_arm(repo: str, sf_dir: str, queries: list[str]) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", _runner_src(), repo, sf_dir, *queries],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"arm {repo} produced no RESULT:\n{p.stdout[-2000:]}\n"
        f"{p.stderr[-2000:]}"
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = 2
    for a in sys.argv[1:]:
        if a.startswith("--rounds"):
            if "=" not in a:
                raise SystemExit("use --rounds=N (no space)")
            rounds = int(a.split("=", 1)[1])
    repo_a, repo_b, sf_dir, *queries = args
    mins: dict[str, dict[str, float]] = {"a": {}, "b": {}}
    for rnd in range(rounds):
        for tag, repo in (("a", repo_a), ("b", repo_b)):
            print(f"== round {rnd + 1} arm {tag} ({repo}) ==",
                  file=sys.stderr)
            got = run_arm(repo, sf_dir, queries)
            print(f"   {got}", file=sys.stderr)
            for q, v in got.items():
                cur = mins[tag].get(q)
                mins[tag][q] = v if cur is None else min(cur, v)
    result = {
        "probe": "movers_ab",
        "repo_a": repo_a,
        "repo_b": repo_b,
        "sf_dir": sf_dir,
        "rounds": rounds,
        "min_a": mins["a"],
        "min_b": mins["b"],
        "ratio_b_over_a": {
            q: round(mins["b"][q] / max(mins["a"][q], 0.01), 2)
            for q in mins["a"]
        },
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
