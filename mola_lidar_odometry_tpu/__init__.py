"""mola_lidar_odometry_tpu — TPU-native LiDAR odometry framework.

Public surface:

    from mola_lidar_odometry_tpu import LidarOdometry
    lo = LidarOdometry.from_yaml_file("pipelines/lidar3d-default.yaml")
    out = lo.on_lidar_scan(xyz, stamp, times=times)

See README.md / docs/ for the architecture and docs/parity.md for the
component-by-component correspondence with MOLAorg/mola_lidar_odometry.
"""

__version__ = "0.1.0"

__all__ = [
    "LidarOdometry",
    "OdometrySpec",
    "spec_from_yaml",
    "AsyncLidarOdometry",
    "Observation",
]


def __getattr__(name):  # lazy: importing the package must not pull in jax
    if name == "LidarOdometry":
        from mola_lidar_odometry_tpu.models.odometry import LidarOdometry

        return LidarOdometry
    if name in ("OdometrySpec", "spec_from_yaml"):
        from mola_lidar_odometry_tpu.models import spec as _spec

        return getattr(_spec, name)
    if name in ("AsyncLidarOdometry", "Observation"):
        from mola_lidar_odometry_tpu.utils import runtime as _rt

        return getattr(_rt, name)
    raise AttributeError(name)
