#!/usr/bin/env bash
# KITTI runs with the NDT pipeline (counterpart of eval/cli_kitti_ndt.sh).
SCRIPT_DIR=$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )
PIPELINE_YAML="$SCRIPT_DIR/../pipelines/lidar3d-ndt.yaml" exec "$SCRIPT_DIR/cli_kitti.sh" "$@"
