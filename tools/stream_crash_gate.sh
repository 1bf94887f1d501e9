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
  # only rc=137 (the deliberate Runtime.halt) is expected; anything else
  # — OOM, missing source, a streaming exception, or rc=3 (replay
  # finished before the crash offset: nothing was crashed) — is a real
  # failure and must stop the gate
  rc=0; tools/run_main.sh -Xmx24g graft.tools.StreamCrashGate "$sf" "$wd" "$gate" "$t" || rc=$?
  if [ "$rc" -eq 137 ]; then
    echo "[crash-gate] JVM halted mid-stream (expected, rc=137)"
  else
    echo "[crash-gate] run exited rc=$rc without a mid-stream halt" >&2
    exit "${rc:-1}"
  fi
done
echo "[crash-gate] final run to completion"
tools/run_main.sh -Xmx24g graft.tools.StreamCrashGate "$sf" "$wd" "$gate" 0
python3 tools/check.py "$sf" "$wd/crash_$gate/out"
