#!/bin/bash
# Kill-resilience proof for graft.Bench's shutdown-hook JSON emit
# (round-3 postmortem: driver bench rc=124 with parsed:null must be
# impossible now — a SIGTERM mid-run must still leave ONE parsable line).
#
# Usage: tools/bench_kill_test.sh [kill_after_sec] [sf_dir]
# Runs Bench under `timeout -s TERM` exactly like an external driver would,
# then asserts the log contains a JSON line with "partial":true that parses.
set -u
KILL_AFTER=${1:-75}
SF=${2:-/root/testdata/sf0.001}
LOG=$(mktemp /tmp/bench_kill_XXXX.log)
echo "[kill-test] running Bench with SIGTERM after ${KILL_AFTER}s, sf=$SF"
SPARK_GRAFT_SF_DIR=$SF timeout -s TERM "$KILL_AFTER" \
  sbt -batch "runMain graft.Bench" >"$LOG" 2>&1
RC=$?
echo "[kill-test] timeout rc=$RC (124 = killed as intended)"
LINE=$(grep -ao '{"metric".*' "$LOG" | tail -1)
if [ -z "$LINE" ]; then
  echo "[kill-test] FAIL: no JSON line in $LOG"
  exit 1
fi
python3 - "$LINE" <<'EOF'
import json, sys
d = json.loads(sys.argv[1])
assert d.get("partial") is True, f"expected partial:true, got {d.get('partial')}"
assert "queries" in d and "scaling" in d, "sections missing"
print(f"[kill-test] PASS: parsable partial artifact, "
      f"{len(d['queries'])} queries recorded, skipped={len(d['skipped'])}")
EOF
exit $?
