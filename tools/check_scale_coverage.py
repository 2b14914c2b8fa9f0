#!/usr/bin/env python3
"""Mechanized blowup discipline: every BLOCKING registry query must have a
measured scale row in SCALE.md.

Round-9 hid a k²-per-copy join in dedup_semantic, round-10 shipped
dedup_containment without its 10x point — both times the rule "run the
blowup on every new blocking operator" existed but lived in prose. This
check makes it structural: it derives the blocking-operator list FROM THE
CODE (registry entries in SparkEntry.scala whose body calls a
pair-generator of Dedup/Multimodal — the family whose candidate growth
depends on data distribution, not plan shape) and fails if any such query
name never appears in SCALE.md's measured tables.

Run by tools/verify_local.sh; exits 1 on an unmeasured blocking query.
"""
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pair_generators():
    """Names of the candidate-pair generator family, derived from the
    operator sources so a new generator is picked up automatically."""
    names = set()
    for rel in ("src/main/scala/graft/operators/Dedup.scala",
                "src/main/scala/graft/operators/Multimodal.scala",
                "src/main/scala/graft/operators/TextAnalysis.scala"):
        with open(os.path.join(ROOT, rel)) as fh:
            src = fh.read()
        names |= set(re.findall(r"def (\w*[Pp]airs\w*)\(", src))
        names |= set(re.findall(r"def (audioMatch)\(", src))
        names |= set(re.findall(r"def (\w*[Cc]lusters\w*)\(", src))
    # intraPairs is the bounded within-group expansion helper every
    # generator shares, not a blocking strategy of its own
    names.discard("intraPairs")
    return names


def blocking_queries(gens):
    """Registry query names whose entry body calls a pair generator."""
    with open(os.path.join(ROOT, "src/main/scala/graft/SparkEntry.scala")) as fh:
        src = fh.read()
    # split on registry keys: "name" -> ((s, dir) => ...  up to the next key
    entries = re.split(r'"([a-z0-9_]+)" -> \(\(s, dir\)', src)
    out = []
    for i in range(1, len(entries), 2):
        name, body = entries[i], entries[i + 1]
        if any(re.search(r"\b%s\b" % g, body) for g in gens):
            out.append(name)
    return out


# Queries whose SCALE.md story is "~flat at rest" (reads only probe
# cells / pruned ranges / a capped candidate set, regardless of corpus
# size). A 10x row cannot certify that claim — these must carry a
# measured 100x table row too (round-12 verdict item 3: the 100x
# spot-checks were by hand; this makes them part of the ratchet).
AT_REST_FLAT = [
    "knn_ivf_at_rest",
    "knn_ivf_filtered",
    "s_balanced_layout",
    "dedup_winnowing",
]

# Blocking queries whose measured sf0.1 -> sf1 ratios were the highest
# of their class (round-13 table: 5.7 / 3.7 / 3.4 / 3.0 / 2.3): a 10x
# ratio that high earns a measured 100x row too — one decade can hide
# the onset of super-linear candidate growth that two expose (round-14
# verdict item 4 made this part of the ratchet, not prose).
HIGH_RATIO_100X = [
    "dedup_winnowing",
    "pipeline_shards",
    "dedup_sorted_neighborhood",
    "pipeline_dsir",
    "dedup_simhash",
]


def measured_names(must_mention=None):
    """Backticked names appearing in SCALE.md MARKDOWN TABLE ROWS that
    also carry a digit in another cell — a measurement, not prose. (The
    round-11 version accepted any backticked token anywhere, so pasting
    this tool's own UNMEASURED backlog into prose satisfied the gate.)
    With `must_mention`, only rows whose non-name text matches that
    regex count (e.g. r"100[x×]" for the 100x ratchet)."""
    names = set()
    with open(os.path.join(ROOT, "SCALE.md")) as fh:
        for line in fh:
            line = line.strip()
            if not line.startswith("|"):
                continue
            cells = [c.strip() for c in line.strip("|").split("|")]
            row_names = set()
            has_number = False
            mentioned = must_mention is None
            for c in cells:
                row_names |= set(re.findall(r"`([a-z0-9_]+)`", c))
                stripped = re.sub(r"`[^`]*`", "", c)
                if re.search(r"\d", stripped):
                    has_number = True
                if must_mention and re.search(must_mention, stripped):
                    mentioned = True
            if has_number and mentioned:
                names |= row_names
    return names


def main():
    gens = pair_generators()
    blocking = blocking_queries(gens)
    if not blocking:
        print("[scale-coverage] ERROR: derived zero blocking queries — "
              "the extractor regex no longer matches SparkEntry.scala")
        return 1
    measured = measured_names()
    missing = [q for q in blocking if q not in measured]
    print(f"[scale-coverage] {len(blocking)} blocking queries "
          f"(generators: {len(gens)}), {len(blocking) - len(missing)} "
          f"measured in SCALE.md")
    if missing:
        print("[scale-coverage] UNMEASURED blocking queries (add a blowup "
              "row to SCALE.md — tools/make_blowup.py + "
              "SPARK_GRAFT_BENCH_ONLY):")
        for q in missing:
            print(f"  - {q}")
        return 1
    measured_100x = measured_names(must_mention=r"100[x×]")
    missing_100x = [q for q in AT_REST_FLAT if q not in measured_100x]
    print(f"[scale-coverage] {len(AT_REST_FLAT)} at-rest-flat queries, "
          f"{len(AT_REST_FLAT) - len(missing_100x)} with a 100x row")
    if missing_100x:
        print("[scale-coverage] at-rest-flat queries MISSING a measured "
              "100x SCALE.md row (the ~flat claim needs two orders, "
              "not one):")
        for q in missing_100x:
            print(f"  - {q}")
        return 1
    missing_hr = [q for q in HIGH_RATIO_100X if q not in measured_100x]
    print(f"[scale-coverage] {len(HIGH_RATIO_100X)} high-ratio blocking "
          f"queries, {len(HIGH_RATIO_100X) - len(missing_hr)} with a "
          f"100x row")
    if missing_hr:
        print("[scale-coverage] high-sf1-ratio blocking queries MISSING "
              "a measured 100x SCALE.md row:")
        for q in missing_hr:
            print(f"  - {q}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
