#!/usr/bin/env bash
# End-to-end local correctness run, strictly sequential on a FRESH dir:
#   compile -> graft.Verify dump -> DuckDB oracle compare.
# This is the only sanctioned way to claim "correctness green" locally —
# it cannot race its own artifacts (the checker additionally refuses stale
# inputs; see tools/check_correctness.py).
#
# Usage: tools/verify_local.sh [sf_dir] [out_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/verify_out_$(date +%Y%m%d_%H%M%S)}"
rm -rf "$OUT_DIR"
echo "== verify_local: sf=$SF_DIR out=$OUT_DIR sha=$(git rev-parse --short HEAD)"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
# Mechanized oracle-type audit (HUGEINT class — the twice-shipped
# regression the local fetchall compare cannot reproduce).
python3 tools/audit_oracle_types.py "$OUT_DIR/oracle_sql.json" "$SF_DIR"
# Blowup discipline: every blocking (pair-generator) registry query must
# have a measured scale row in SCALE.md — the twice-hit gap (r9 semantic
# k², r10 containment) is now structural, not prose.
python3 tools/check_scale_coverage.py
python3 tools/check_correctness.py "$OUT_DIR" "$SF_DIR"
