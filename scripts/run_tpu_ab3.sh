#!/bin/sh
# Round-3 third TPU A/B batch: half-tile cluster-enter predicate (SPLIT).
# Alternating arms, fresh process each (pallas executable caches survive
# module-global flips), best-of-2 per arm against the pooled TPU's noise.
set -u
cd "$(dirname "$0")/.."
LOG="${LOG:-/tmp/tpu_ab3.log}"
T="${T:-1500}"

run() {
  name="$1"; shift
  echo "=== $name $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "$T" python "$@" >> "$LOG" 2>>"$LOG.err"
  echo "rc=$? $name" >> "$LOG"
}

run split1_a  scripts/bench_mesh.py
run split2_a  scripts/bench_mesh.py --split 2
run split1_b  scripts/bench_mesh.py
run split2_b  scripts/bench_mesh.py --split 2
echo "=== batch done $(date -u +%H:%M:%S)" >> "$LOG"
