"""mola_lidar_odometry_tpu — a TPU-native LiDAR odometry framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
MOLAorg/mola_lidar_odometry (reference: /root/reference, v0.3.3): per-scan
motion-model prior -> generator/filter pipelines (voxel decimate, range/bbox
cull, motion deskew) -> ICP against a sliding-window local voxel map
(hash-grid NN matcher -> robust Gauss-Newton -> paired-ratio quality) ->
quality gating -> constant-velocity state fusion -> keyframed local-map and
simple-map updates.  Everything numeric runs inside one jitted scan-step over
fixed-shape padded point buffers; sequences are host loops or ``lax.scan``;
fleets of independent odometry instances are ``vmap``/``shard_map`` over a
device mesh.

Layer map (mirrors reference SURVEY.md section 1):
  ops/      geometry (SE(3)/SO(3)), point buffers, filters, voxel maps,
            matchers, solvers, the ICP loop  (reference L0-L2)
  models/   navstate fuser, adaptive threshold, keyframing, the scan-step
            orchestrator, pipeline builders          (reference L3-L4)
  parallel/ vmap fleets + shard_map sharding over jax.sharding.Mesh
  utils/    YAML config + runtime expression DSL, TUM I/O, datasets,
            synthetic LiDAR simulator, profiler      (reference L6-L10)
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bf16 inputs; geometry (pose algebra, point
# transforms at coordinates of hundreds of meters, 6x6 normal equations)
# needs full f32. Hot kernels that can tolerate bf16 request it explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")
