#!/bin/sh
# Sequential TPU A/B batch (VERDICT round-2 items #3-#6). Run in ONE
# background bash with a generous outer timeout; each experiment is a fresh
# process so pallas executable caches can't leak between flag settings.
# Results append to $LOG (default /tmp/tpu_ab.log) as JSON lines.
set -u
cd "$(dirname "$0")/.."
LOG="${LOG:-/tmp/tpu_ab.log}"
T="${T:-1500}"

run() {
  name="$1"; shift
  echo "=== $name $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "$T" python "$@" >> "$LOG" 2>>"$LOG.err"
  echo "rc=$? $name" >> "$LOG"
}

# megakernel flag A/Bs on the headline scene (closed box)
run control      scripts/tpu_experiments.py headline
run static_tab   scripts/tpu_experiments.py static_tables
run early_cornell scripts/tpu_experiments.py early_exit
# early-exit where it should actually win: open scene, rays escape
run sphere_ctrl  scripts/tpu_experiments.py headline    --scene scenes/sphere.txt
run sphere_early scripts/tpu_experiments.py early_exit  --scene scenes/sphere.txt
# shard_map overhead bound (dp=1/sp=1 vs plain, same chip)
run shard11      scripts/tpu_experiments.py shard11

# mesh pipeline sweeps (VERDICT #3): fused sort, sort cadence, batch
run mesh_ctrl    scripts/bench_mesh.py
run mesh_fused   scripts/bench_mesh.py --fused-sort
run mesh_fused_e2 scripts/bench_mesh.py --fused-sort --sort-every 2
run mesh_e2      scripts/bench_mesh.py --sort-every 2
run mesh_batch2  scripts/bench_mesh.py --batch 2
echo "=== batch done $(date -u +%H:%M:%S)" >> "$LOG"
