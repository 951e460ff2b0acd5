#!/usr/bin/env bash
# Any .rawlog dataset with the live GUI — covers the reference's
# gui_backpack_ual_citeIV.sh / gui_vlp16_ual_campus_2018_dataset_{1,2}.sh
# (all three are rawlog launches differing only in the dataset file).
SCRIPT_DIR=$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )
cd "$SCRIPT_DIR/.." || exit 1
RAWLOG="${1:?usage: gui_rawlog.sh <dataset.rawlog> [cli args...]}"; shift || true
exec python -m mola_lidar_odometry_tpu.apps.cli \
  -c "${PIPELINE_YAML:-pipelines/lidar3d-default.yaml}" \
  --input-rawlog "$RAWLOG" \
  --live-viz "${LIVE_VIZ_PORT:-8731}" "$@"
