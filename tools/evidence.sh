#!/usr/bin/env bash
# One-command evidence refresh for the graft engine: the full chain the
# per-round judgment reads, assembled in one invocation instead of by hand.
#
#   1. unit + plan-gate tests            (sbt test)
#   2. correctness at sf0.01             (Verify dump -> DuckDB oracle compare)
#   3. bench at sf0.1                    (official scoreboard shape, calib_sec included)
#   4. sf1 data-dominated replay         (ScaleUp if needed -> Verify -> per-query
#                                         oracle compare with timeouts -> Bench)
#
# Usage: tools/evidence.sh [--skip-sf1] [--skip-tests]
# Artifacts: /tmp/evidence/{test.log,verify_sf001.log,selfcheck_sf001.log,
#            bench_sf01.json,verify_sf1.log,selfcheck_sf1.log,bench_sf1.json}
# Exit code is non-zero as soon as any stage fails.
set -euo pipefail
cd "$(dirname "$0")/.."

SKIP_SF1=0; SKIP_TESTS=0
for a in "$@"; do
  case "$a" in
    --skip-sf1)   SKIP_SF1=1 ;;
    --skip-tests) SKIP_TESTS=1 ;;
    *) echo "unknown flag: $a" >&2; exit 2 ;;
  esac
done

OUT=/tmp/evidence
mkdir -p "$OUT"
CPUS="${SPARK_GRAFT_CPUS:-32}"

echo "== [1/4] sbt test"
if [ "$SKIP_TESTS" = 1 ]; then
  echo "   (skipped by flag)"
else
  sbt -batch test 2>&1 | tee "$OUT/test.log" | grep -E "Tests:|All tests|\*\*\* FAILED" || true
  grep -q "All tests passed." "$OUT/test.log"
fi

echo "== [2/4] correctness at sf0.01 (Verify -> DuckDB)"
SPARK_GRAFT_VERIFY_SOFT_FAIL=1 SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT/verify_sf001" \
  2>&1 | tee "$OUT/verify_sf001.log" | grep -E "\[verify\]|error" || true
# Verify now writes an explicit per-query failure record; empty = all dumped
python3 -c "import json,sys;sys.exit(1 if json.load(open('$OUT/verify_sf001/errors.json')) else 0)"
python3 tools/selfcheck.py /root/testdata/sf0.01 "$OUT/verify_sf001" \
  2>&1 | tee "$OUT/selfcheck_sf001.log" | tail -3
grep -qE "^== [0-9]+ pass, 0 fail" "$OUT/selfcheck_sf001.log"

echo "== [3/4] bench at sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E "^\{\"metric\"|\[bench\]" | tail -8
cp /tmp/bench.json "$OUT/bench_sf01.json"

if [ "$SKIP_SF1" = 1 ]; then
  echo "== [4/4] sf1 replay skipped by flag"; exit 0
fi

echo "== [4/4] sf1 replay (data-dominated point)"
if [ ! -f .localdata/sf1/documents.parquet ]; then
  echo "   regenerating sf1 corpus"
  SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.tools.ScaleUp" >/dev/null
fi
SPARK_GRAFT_VERIFY_SOFT_FAIL=1 SPARK_GRAFT_CPUS="$CPUS" sbt -batch "runMain graft.Verify $PWD/.localdata/sf1 $OUT/verify_sf1" \
  2>&1 | tee "$OUT/verify_sf1.log" | grep -E "\[verify\]|error" || true
python3 -c "import json,sys;sys.exit(1 if json.load(open('$OUT/verify_sf1/errors.json')) else 0)"
# Per-query with timeouts: a few oracles (recursive CC closure, minhash
# verify) legitimately need minutes in DuckDB at sf1 — the adaptive-band
# CC oracles measured 9-14 min in round 8, hence the 1500 s default;
# anything past the timeout is reported, not silently dropped.
SF1_TIMEOUT="${SF1_TIMEOUT:-1500}"
: > "$OUT/selfcheck_sf1.log"
for q in $(python3 -c "import json;print(' '.join(sorted(json.load(open('$OUT/verify_sf1/oracle_sql.json')))))"); do
  if timeout "$SF1_TIMEOUT" python3 tools/selfcheck.py "$PWD/.localdata/sf1" "$OUT/verify_sf1" "$q" \
      | tail -1 >> "$OUT/selfcheck_sf1.log"; then :; else
    echo "== TIMEOUT/ERR $q" >> "$OUT/selfcheck_sf1.log"
  fi
done
PASS=$(grep -c "1 pass, 0 fail" "$OUT/selfcheck_sf1.log" || true)
TOTAL=$(wc -l < "$OUT/selfcheck_sf1.log")
echo "   sf1 oracle: $PASS/$TOTAL hash-match"
grep -vE "1 pass, 0 fail" "$OUT/selfcheck_sf1.log" || true
[ "$PASS" = "$TOTAL" ]
SPARK_GRAFT_SF_DIR="$PWD/.localdata/sf1" SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E "^\{\"metric\"|\[bench\]" | tail -8
cp /tmp/bench.json "$OUT/bench_sf1.json"
echo "== evidence chain complete: $OUT"
