#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: compare graft.Verify parquet
dumps against SparkEntry.oracleSql run in DuckDB over the same tables.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, math
import duckdb

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


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
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
            try:
                orel = con.sql(oracle[name])
                ocols, orows = list(orel.columns), orel.fetchall()
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
    # queries that produced no parquet at all (failed in Verify)
    dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    missing = set(oracle) - dumped
    for name in sorted(missing):
        bad += 1
        print(f"✗ NO-OUTPUT {name} (query failed in Verify)")
    print(f"\n{ok} match, {bad} bad, {rows_only} rows-only")
    json.dump(results, open("/tmp/correctness_local.json", "w"), indent=1, default=str)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
