#!/usr/bin/env bash
# KITTI-360 evaluation runs (counterpart of eval/cli_kitti360.sh).
set -u
SCRIPT_DIR=$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )
PIPELINE_YAML="${PIPELINE_YAML:-$SCRIPT_DIR/../pipelines/lidar3d-default.yaml}"
SEQS_TO_RUN="${SEQS_TO_RUN:-00 02 03 04 05 06 07 09 10}"
CLI="python -m mola_lidar_odometry_tpu.apps.cli"
mkdir -p results
for seq in $SEQS_TO_RUN; do
  MOLA_INITIAL_VX=10.0 \
  $CLI -c "$PIPELINE_YAML" \
    --input-kitti360-seq "$seq" \
    --output-tum-path "results/kitti360_${seq}_mola.tum"
done
