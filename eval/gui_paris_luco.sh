#!/usr/bin/env bash
# Paris-LuCo sequence with the live GUI (counterpart of the reference's
# eval/gui_paris_luco.sh; the GUI is the HTTP viewer on --live-viz).
SCRIPT_DIR=$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )
cd "$SCRIPT_DIR/.." || exit 1
exec python -m mola_lidar_odometry_tpu.apps.cli \
  -c "${PIPELINE_YAML:-pipelines/lidar3d-default.yaml}" \
  --input-paris-luco \
  --live-viz "${LIVE_VIZ_PORT:-8731}" "$@"
