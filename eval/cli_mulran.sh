#!/usr/bin/env bash
# MulRan evaluation runs + ATE scoring (counterpart of eval/cli_mulran.sh:23-50).
set -u
SCRIPT_DIR=$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )
PIPELINE_YAML="${PIPELINE_YAML:-$SCRIPT_DIR/../pipelines/lidar3d-default.yaml}"
SEQS_TO_RUN="${SEQS_TO_RUN:-KAIST01 KAIST02 KAIST03 DCC01 DCC02 DCC03 Riverside01 Riverside02 Riverside03 Sejong01 Sejong02 Sejong03}"
CLI="python -m mola_lidar_odometry_tpu.apps.cli"
mkdir -p results
for seq in $SEQS_TO_RUN; do
  $CLI -c "$PIPELINE_YAML" \
    --input-mulran-seq "$seq" \
    --output-tum-path "results/mulran_${seq}_mola.tum"
  if command -v evo_ape >/dev/null && [ -f "results/mulran_${seq}_mola.tum.gt.tum" ]; then
    evo_ape tum "results/mulran_${seq}_mola.tum.gt.tum" "results/mulran_${seq}_mola.tum" -a
  fi
done
