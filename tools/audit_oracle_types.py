#!/usr/bin/env python3
"""Mechanized oracle-type audit (the round-9 lesson, round-7 repeat).

DuckDB widens SUM(BIGINT) to HUGEINT; the driver's pandas canonicalizer
turns HUGEINT into float64 while the Spark parquet dump stays int64, so
the values hash-mismatch even when identical. The LOCAL checker does not
reproduce this (duckdb fetchall returns Python ints), which is exactly
why two HUGEINT oracles shipped green-locally and red at the driver.
This audit kills the class: DESCRIBE every oracle and fail on any
HUGEINT/UHUGEINT output column.

Usage:
  python3 tools/audit_oracle_types.py <oracle_sql.json> [sf_dir]

Get oracle_sql.json in seconds without a full Verify run via
  sbt -batch "runMain graft.DumpOracles /tmp/oracle_sql.json"
verify_local.sh runs this automatically after the Verify dump.
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BANNED = {"HUGEINT", "UHUGEINT"}


def main():
    if len(sys.argv) < 2:
        print("usage: audit_oracle_types.py <oracle_sql.json> [sf_dir]\n"
              "dump oracle_sql.json via: sbt -batch "
              '"runMain graft.DumpOracles /tmp/oracle_sql.json"')
        return 2
    oracle_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad, err = [], []
    for name in sorted(oracle):
        try:
            desc = con.sql(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            err.append((name, str(e)[:200]))
            continue
        hits = [(c, t) for c, t, *_ in desc
                if any(b in t.upper() for b in BANNED)]
        if hits:
            bad.append((name, hits))
    for name, hits in bad:
        print(f"✗ HUGEINT {name}: {hits} — wrap in CAST(... AS BIGINT)")
    for name, e in err:
        print(f"✗ DESCRIBE-ERR {name}: {e}")
    print(f"[oracle-type-audit] {len(oracle)} oracles, "
          f"{len(bad)} banned-type, {len(err)} describe-errors")
    return 1 if (bad or err) else 0


if __name__ == "__main__":
    sys.exit(main())
