#!/bin/sh
# Round-3 second TPU A/B batch: megakernel headroom hunt.
# chunk=40 throughout the interleave sweep so the effective factor equals
# the requested one (40 is divisible by 4, 5, 8, 10, 20); each experiment
# is a fresh process (pallas executable caches survive flag flips).
set -u
cd "$(dirname "$0")/.."
LOG="${LOG:-/tmp/tpu_ab2.log}"
T="${T:-1500}"

run() {
  name="$1"; shift
  echo "=== $name $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "$T" python "$@" >> "$LOG" 2>>"$LOG.err"
  echo "rc=$? $name" >> "$LOG"
}

# interleave sweep at the new defaults (STATIC_TABLES on)
run ctrl_c40  scripts/tpu_experiments.py headline   --chunk 40
run il4_c40   scripts/tpu_experiments.py interleave --interleave 4  --chunk 40
run il8_c40   scripts/tpu_experiments.py interleave --interleave 8  --chunk 40
run il10_c40  scripts/tpu_experiments.py interleave --interleave 10 --chunk 40
run il20_c40  scripts/tpu_experiments.py interleave --interleave 20 --chunk 40

# where does the time go? knock out one stage at a time (chunk 25 defaults)
run abl_ctrl      scripts/tpu_experiments.py headline
run abl_noprng    scripts/tpu_experiments.py ablation --ablation noprng
run abl_nointer   scripts/tpu_experiments.py ablation --ablation nointersect
run abl_noscatter scripts/tpu_experiments.py ablation --ablation noscatter

# tile rows at IL=5 (the r1 sweep was at IL=1)
run tr8   scripts/tpu_experiments.py tile_rows --tile-rows 8
run tr32  scripts/tpu_experiments.py tile_rows --tile-rows 32

# mesh: origin-grid resolution of the fused sort key
run mesh_cells8  scripts/bench_mesh.py --sort-cells 8
run mesh_cells2  scripts/bench_mesh.py --sort-cells 2
echo "=== batch done $(date -u +%H:%M:%S)" >> "$LOG"
