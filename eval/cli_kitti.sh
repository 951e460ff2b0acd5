#!/usr/bin/env bash
# KITTI 00-21 evaluation runs (TPU engine).
#
# Counterpart of the reference eval/cli_kitti.sh:23-49: run every sequence,
# save TUM trajectories + simplemaps, then score with kitti-metrics-eval
# (external tool) when present.  Sequence-level parallelism uses xargs -P
# (GNU parallel is not assumed); for the TPU-native *batched* evaluation
# (all sequences as one vmapped fleet on one chip) use eval/fleet_eval.py.
set -u
SCRIPT_DIR=$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )

PIPELINE_YAML="${PIPELINE_YAML:-$SCRIPT_DIR/../pipelines/lidar3d-default.yaml}"
DEFAULT_SEQS_TO_RUN="00 01 02 03 04 05 06 07 08 09 10 11 12 13 14 15 16 17 18 19 20 21"
SEQS_TO_RUN="${SEQS_TO_RUN:-${DEFAULT_SEQS_TO_RUN}}"
NUM_JOBS="${NUM_JOBS:-1}"   # >1 only makes sense on multi-chip hosts
CLI="python -m mola_lidar_odometry_tpu.apps.cli"

mkdir -p results

run_one() {
  seq="$1"
  MOLA_INITIAL_VX=18.0 \
  MOLA_GENERATE_SIMPLEMAP=true \
  MOLA_SIMPLEMAP_ALSO_NON_KEYFRAMES=true \
  MOLA_SIMPLEMAP_MIN_XYZ=10.0 \
  MOLA_SIMPLEMAP_MIN_ROT=20.0 \
  $CLI -c "$PIPELINE_YAML" \
    --input-kitti-seq "$seq" \
    --output-tum-path "results/kitti_${seq}_mola.tum" \
    --output-simplemap "results/kitti_${seq}.simplemap.npz"
}
export -f run_one 2>/dev/null || true
export PIPELINE_YAML CLI

echo "$SEQS_TO_RUN" | tr ' ' '\n' | xargs -P "$NUM_JOBS" -I {} bash -c 'run_one {}'

# Score each sequence (external metric tool, same as the reference)
for d in $SEQS_TO_RUN; do
  if command -v kitti-metrics-eval >/dev/null && [ -f "results/kitti_${d}_mola.tum" ]; then
    kitti-metrics-eval -r "results/kitti_${d}_mola.tum" -s "${d}" --no-figures
  fi
done
