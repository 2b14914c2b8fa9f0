#!/usr/bin/env python3
"""Append a per-round summary record to PROGRESS.jsonl (r13 nit, closed
in r16): the driver's heartbeats carry wall/commits/loc/turns, but
reconstructing WHAT a round shipped meant reading VERDICT.md. This tool
derives one machine-readable `round_summary` line per round from the
repo's own artifacts:

  - registry/oracle counts from RegistrySpec's pinned literals,
  - test count = static `test(` occurrences (check_readme_counts rule),
  - correctness match/bad/rows-only from CORRECTNESS_r{N}.json,
  - bench total/failures from BENCH_r{N}.json (parsed field) or
    BENCH_FULL.json for the in-flight round,
  - commit subjects since the previous round's closing commit.

Usage: tools/round_summary.py <round-number>   (idempotent: replaces an
existing summary line for the same round instead of duplicating it).
Registry/test counts read HEAD, so run it at the END of round N for
round N — a retroactive summary for an earlier round would misstate
them.
"""
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def registry_counts():
    with open(os.path.join(ROOT, "src/test/scala/graft/RegistrySpec.scala")) as fh:
        src = fh.read()
    q = int(re.search(r"queries\.size === (\d+)", src).group(1))
    o = int(re.search(r"oracleSql\.size === (\d+)", src).group(1))
    tests = 0
    for dirpath, _, files in os.walk(os.path.join(ROOT, "src/test")):
        for f in files:
            if f.endswith(".scala"):
                with open(os.path.join(dirpath, f)) as fh:
                    tests += len(re.findall(r"^\s*test\(", fh.read(), re.M))
    return q, o, tests


def correctness(n):
    p = os.path.join(ROOT, f"CORRECTNESS_r{n:02d}.json")
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        d = json.load(fh)
    match = sum(1 for v in d.values() if isinstance(v, dict) and v.get("hash_match"))
    rows_only = sum(1 for v in d.values()
                    if isinstance(v, dict) and v.get("err") == "no_oracle")
    bad = len(d) - match - rows_only
    return {"queries": len(d), "hash_match": match,
            "rows_only": rows_only, "bad": bad}


def bench(n):
    for p, key in ((f"BENCH_r{n:02d}.json", "parsed"), ("BENCH_FULL.json", None)):
        fp = os.path.join(ROOT, p)
        if not os.path.isfile(fp):
            continue
        with open(fp) as fh:
            d = json.load(fh)
        d = d.get(key, d) if key else d
        if isinstance(d, dict) and "value" in d:
            return {"source": p, "total_sec": d["value"],
                    "n_queries": d.get("n_queries"),
                    "n_failed": d.get("n_failed")}
    return None


def commits_since_round_close(n):
    """Subjects after the driver's closing commit of round n-1.

    Fails loudly when the sentinel commit is missing (e.g. the driver's
    subject wording changed): silently returning the WHOLE history would
    misstate the round's commit list.
    """
    log = subprocess.run(
        ["git", "-C", ROOT, "log", "--format=%H %s"],
        capture_output=True, text=True, check=True).stdout.splitlines()
    out = []
    found = n <= 1  # round 1 has no prior closing commit by definition
    for line in log:  # newest first
        h, _, subj = line.partition(" ")
        if re.match(rf"round {n - 1}: verdict", subj):
            found = True
            break
        out.append(subj)
    if not found:
        sys.exit(f"round_summary: sentinel commit 'round {n - 1}: verdict' "
                 "not found in git log — refusing to report the entire "
                 "history as this round's commits")
    return list(reversed(out))


def main():
    n = int(sys.argv[1])
    q, o, tests = registry_counts()
    rec = {
        "type": "round_summary",
        "round": n,
        "ts": time.time(),
        "queries": q,
        "oracles": o,
        "rows_only": q - o,
        "tests": tests,
        "correctness": correctness(n),
        "bench": bench(n),
        "commits": commits_since_round_close(n),
    }
    path = os.path.join(ROOT, "PROGRESS.jsonl")
    lines = []
    if os.path.isfile(path):
        with open(path) as fh:
            lines = [l for l in fh.read().splitlines() if l.strip()]
    # idempotent: drop a prior summary for the same round
    lines = [l for l in lines
             if not (l.startswith('{"type": "round_summary"') and
                     json.loads(l).get("round") == n)]
    lines.append(json.dumps(rec))
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"round_summary appended for round {n}: {q} queries / {o} oracles"
          f" / {tests} tests, {len(rec['commits'])} commits")


if __name__ == "__main__":
    main()
