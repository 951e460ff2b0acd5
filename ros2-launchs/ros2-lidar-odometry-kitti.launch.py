"""ROS 2 launch: KITTI replay -> TPU LiDAR odometry, publishing to ROS 2.

Counterpart of the reference ros2-launchs/ros2-lidar-odometry-kitti.launch.py:
replays a KITTI sequence through the odometry while the ROS 2 bridge
publishes /tf, Odometry, and map updates (launchs/lidar_odometry_ros2.yaml
output contract).  Requires a ROS 2 environment.
"""

import os

from ament_index_python import get_package_share_directory
from launch import LaunchDescription
from launch.actions import DeclareLaunchArgument, SetEnvironmentVariable
from launch.substitutions import LaunchConfiguration
from launch_ros.actions import Node


def generate_launch_description():
    share = get_package_share_directory("mola_lidar_odometry_tpu")

    seq = DeclareLaunchArgument(
        "kitti_sequence", default_value="00", description="KITTI sequence id (00..21)"
    )

    return LaunchDescription(
        [
            seq,
            SetEnvironmentVariable("KITTI_SEQ", LaunchConfiguration("kitti_sequence")),
            Node(
                package="mola_lidar_odometry_tpu",
                executable="mola-lo-launcher",
                output="screen",
                arguments=[
                    os.path.join(share, "launchs", "lidar_odometry_from_kitti.yaml")
                ],
            ),
            Node(
                package="rviz2",
                executable="rviz2",
                name="rviz2",
                arguments=[
                    "-d", os.path.join(share, "rviz2", "kitti-lidar-odometry.rviz")
                ],
            ),
        ]
    )
