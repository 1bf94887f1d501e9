#!/usr/bin/env bash
# Exactly-once-under-crash driver: halt the streaming JVM mid-micro-batch
# (Runtime.halt, no graceful stop) at each given offset, recover from the
# checkpoint, finish the replay, and hash-compare the sink against the
# DuckDB oracle. Requires a completed StreamGate workDir for the source.
#   tools/stream_crash_gate.sh <sfDir> <streamGateWorkDir> <gate> [crashSecs...]
#   gate ∈ q40 | sessionize | dedup     default crashes: 5s and 11s
set -euo pipefail
cd "$(dirname "$0")/.."
sf=$1; wd=$2; gate=$3; shift 3
crashes=("$@"); [ ${#crashes[@]} -eq 0 ] && crashes=(5 11)
rm -rf "$wd/crash_$gate"
for t in "${crashes[@]}"; do
  echo "[crash-gate] run with halt after ${t}s"
  tools/run_main.sh -Xmx24g graft.tools.StreamCrashGate "$sf" "$wd" "$gate" "$t" \
    || echo "[crash-gate] JVM halted (expected, rc=$?)"
done
echo "[crash-gate] final run to completion"
tools/run_main.sh -Xmx24g graft.tools.StreamCrashGate "$sf" "$wd" "$gate" 0
python3 tools/check.py "$sf" "$wd/crash_$gate/out"
