#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: compare graft.Verify parquet
dumps against SparkEntry.oracleSql run in DuckDB over the same tables.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir> [--allow-stale]

Freshness guard (the round-4 lesson: a checker that races its own inputs
reports green on stale artifacts): the checker REFUSES to run when
  (a) oracle_sql.json is missing or older than any query dump — Verify
      writes it last, so that means a Verify run is still in flight; or
  (b) any artifact predates the newest source edit under src/main/scala —
      the dump does not reflect the code being shipped.
Pass --allow-stale to downgrade the refusal to a loud warning. The output
JSON embeds the git SHA and every mtime so "what was actually checked" is
reconstructible after the fact.
"""
import sys, os, json, math, time, threading, subprocess
import duckdb

# Per-oracle runtime budget (seconds). Round 11 shipped two oracles
# DuckDB could not finish in 15+ minutes; the driver's gate timed out
# and emitted an EMPTY correctness artifact for the whole round. Type
# safety (audit_oracle_types.py) wasn't enough — COST is a gate
# property too: any oracle breaching the budget is a hard failure here,
# so it can never reach the driver.
ORACLE_BUDGET_SEC = float(os.environ.get("GRAFT_ORACLE_BUDGET_SEC", "30"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return "0x" + v.hex()
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def newest_mtime(root, suffix):
    newest, newest_path = 0.0, None
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(suffix):
                m = os.path.getmtime(os.path.join(dirpath, f))
                if m > newest:
                    newest, newest_path = m, os.path.join(dirpath, f)
    return newest, newest_path


def dump_mtime(d):
    """Newest file inside one query dump dir (parquet part + _SUCCESS)."""
    newest = 0.0
    for dirpath, _, files in os.walk(d):
        for f in files:
            newest = max(newest, os.path.getmtime(os.path.join(dirpath, f)))
    return newest


def freshness(out_dir, repo_root):
    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    problems = []
    meta = {"checked_at": time.strftime("%Y-%m-%dT%H:%M:%S%z")}
    try:
        meta["git_sha"] = subprocess.run(
            ["git", "-C", repo_root, "rev-parse", "HEAD"],
            capture_output=True, text=True).stdout.strip()
        meta["git_dirty"] = bool(subprocess.run(
            ["git", "-C", repo_root, "status", "--porcelain",
             "--", "src", "tools"],
            capture_output=True, text=True).stdout.strip())
    except OSError:
        meta["git_sha"] = None

    if not os.path.exists(oracle_path):
        problems.append("oracle_sql.json missing — Verify did not finish")
        return meta, problems
    oracle_m = os.path.getmtime(oracle_path)
    meta["oracle_sql_mtime"] = oracle_m

    src_m, src_p = newest_mtime(os.path.join(repo_root, "src", "main"), ".scala")
    meta["src_newest_mtime"] = src_m
    meta["src_newest_file"] = src_p

    dump_ms = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if os.path.isdir(d):
            dump_ms[name] = dump_mtime(d)
    meta["dump_mtimes"] = dump_ms

    # (a) Verify writes oracle_sql.json LAST: any dump newer than it means
    # a concurrent/interrupted Verify run — exactly the round-4 race.
    late = [n for n, m in dump_ms.items() if m > oracle_m + 1.0]
    if late:
        problems.append(
            f"{len(late)} dump(s) newer than oracle_sql.json "
            f"(Verify still running / interrupted?): {late[:5]}")
    # (b) artifacts must postdate the code they claim to verify.
    if src_m and oracle_m < src_m:
        problems.append(
            f"oracle_sql.json ({time.ctime(oracle_m)}) predates newest "
            f"source edit {src_p} ({time.ctime(src_m)}) — rerun Verify")
    stale = [n for n, m in dump_ms.items() if src_m and m < src_m]
    if stale:
        problems.append(
            f"{len(stale)} dump(s) predate newest source edit: {stale[:5]}")
    return meta, problems


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    allow_stale = "--allow-stale" in sys.argv
    out_dir, sf_dir = args[0], args[1]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    meta, problems = freshness(out_dir, repo_root)
    for p in problems:
        print(f"{'WARNING' if allow_stale else 'REFUSING'}: STALE — {p}")
    if problems and not allow_stale:
        print("(pass --allow-stale to check anyway)")
        sys.exit(2)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        rel = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        scols, srows = list(rel.columns), rel.fetchall()
        entry = {"rows": len(srows), "cols": sorted(scols)}
        if name in oracle:
            # watchdog: interrupt the connection if the oracle exceeds
            # the budget — an infeasible oracle must fail HERE, loudly,
            # not time out the driver's whole gate (round-11 lesson)
            timer = threading.Timer(ORACLE_BUDGET_SEC, con.interrupt)
            t0 = time.monotonic()
            try:
                timer.start()
                orel = con.sql(oracle[name])
                ocols, orows = list(orel.columns), orel.fetchall()
                timer.cancel()
                entry["oracle_sec"] = round(time.monotonic() - t0, 2)
                entry["oracle_rows"] = len(orows)
                entry["rows_match"] = len(srows) == len(orows)
                entry["schema_match"] = sorted(scols) == sorted(ocols)
                sset, oset = rowset(scols, srows), rowset(ocols, orows)
                entry["hash_match"] = sset == oset
                if not entry["hash_match"]:
                    diff_s = [r for r in sset if r not in oset][:3]
                    diff_o = [r for r in oset if r not in sset][:3]
                    entry["spark_only"] = diff_s
                    entry["oracle_only"] = diff_o
            except Exception as e:
                timer.cancel()
                elapsed = time.monotonic() - t0
                entry["oracle_sec"] = round(elapsed, 2)
                if elapsed >= ORACLE_BUDGET_SEC - 0.5:
                    entry["oracle_error"] = (
                        f"ORACLE-TIMEOUT: exceeded {ORACLE_BUDGET_SEC}s "
                        f"budget at sf0.01 — infeasible for the driver "
                        f"gate; restructure the SQL or demote to "
                        f"rows-only ({str(e)[:200]})")
                else:
                    entry["oracle_error"] = str(e)[:500]
        else:
            entry["rows_only"] = True
        results[name] = entry

    ok = bad = rows_only = 0
    for name, e in sorted(results.items()):
        if e.get("rows_only"):
            rows_only += 1
            print(f"  ROWS-ONLY {name}: {e['rows']} rows")
        elif e.get("oracle_error"):
            bad += 1
            print(f"✗ ORACLE-ERR {name}: {e['oracle_error'][:200]}")
        elif e.get("rows_match") and e.get("schema_match") and e.get("hash_match"):
            ok += 1
            print(f"✓ MATCH {name}: {e['rows']} rows")
        else:
            bad += 1
            print(f"✗ MISMATCH {name}: spark={e['rows']} oracle={e.get('oracle_rows')} "
                  f"schema={e.get('schema_match')} hash={e.get('hash_match')}")
            for k in ("spark_only", "oracle_only"):
                if e.get(k):
                    print(f"    {k}: {e[k][0]}")
    # queries that produced no parquet at all (failed in Verify); under a
    # SPARK_GRAFT_VERIFY_ONLY run the dump is a deliberate subset — only
    # the requested names count as missing
    dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    only_path = os.path.join(out_dir, "verify_only.txt")
    expected = set(oracle)
    if os.path.exists(only_path):
        requested = set(open(only_path).read().split())
        expected &= requested
        print(f"  (subset run: {len(requested)} requested)")
    missing = expected - dumped
    for name in sorted(missing):
        bad += 1
        print(f"✗ NO-OUTPUT {name} (query failed in Verify)")
    # cost telemetry: surface the slowest oracles every run so a drift
    # toward the budget is visible long before it breaches
    timed = sorted(((e["oracle_sec"], n) for n, e in results.items()
                    if "oracle_sec" in e), reverse=True)
    if timed:
        total_sec = round(sum(t for t, _ in timed), 1)
        tops = ", ".join(f"{n}={t}s" for t, n in timed[:5])
        print(f"  oracle cost: {total_sec}s total over {len(timed)}; "
              f"slowest: {tops} (budget {ORACLE_BUDGET_SEC}s each)")
        for t, n in timed:
            if t > ORACLE_BUDGET_SEC / 2 and not results[n].get("oracle_error"):
                print(f"  WARNING: oracle {n} at {t}s is past half "
                      f"the {ORACLE_BUDGET_SEC}s budget")
    print(f"\n{ok} match, {bad} bad, {rows_only} rows-only  "
          f"[sha {str(meta.get('git_sha'))[:9]}"
          f"{' DIRTY' if meta.get('git_dirty') else ''}"
          f"{' STALE' if problems else ''}]")
    payload = {"meta": meta, "stale_problems": problems, "results": results}
    for dest in ("/tmp/correctness_local.json",
                 os.path.join(out_dir, "correctness_check.json")):
        json.dump(payload, open(dest, "w"), indent=1, default=str)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
