"""ROS 2 launch: live LiDAR topic -> TPU LiDAR odometry (+ rviz2).

Counterpart of the reference ros2-launchs/ros2-lidar-odometry.launch.py:
declares the same launch arguments (lidar_topic_name, gnss_topic_name,
ignore_lidar_pose_from_tf), maps them to the same MOLA_* environment
variables, and starts the odometry via our launcher running the
``launchs/lidar_odometry_ros2.yaml`` module graph (apps/ros2_bridge.py
provides the PointCloud2/NavSatFix in, /tf + Odometry + map out contract).

Requires a ROS 2 environment (rclpy); the file is contract documentation
plus a runnable entry point on robots.
"""

import os

from ament_index_python import get_package_share_directory
from launch import LaunchDescription
from launch.actions import DeclareLaunchArgument, SetEnvironmentVariable
from launch.substitutions import LaunchConfiguration
from launch_ros.actions import Node


def generate_launch_description():
    share = get_package_share_directory("mola_lidar_odometry_tpu")

    lidar_topic = DeclareLaunchArgument(
        "lidar_topic_name",
        description="PointCloud2 topic to listen on (e.g. '/ouster/points')",
    )
    gnss_topic = DeclareLaunchArgument(
        "gnss_topic_name",
        default_value="/gps",
        description="NavSatFix topic for GNSS input",
    )
    ignore_tf = DeclareLaunchArgument(
        "ignore_lidar_pose_from_tf",
        default_value="false",
        description="If true, assume the LiDAR sits at base_link instead of "
        "reading the sensor pose from /tf",
    )

    env = [
        SetEnvironmentVariable("MOLA_LIDAR_TOPIC", LaunchConfiguration("lidar_topic_name")),
        SetEnvironmentVariable("MOLA_GNSS_TOPIC", LaunchConfiguration("gnss_topic_name")),
        SetEnvironmentVariable(
            "MOLA_USE_FIXED_LIDAR_POSE", LaunchConfiguration("ignore_lidar_pose_from_tf")
        ),
    ]

    odometry = Node(
        package="mola_lidar_odometry_tpu",
        executable="mola-lo-launcher",
        output="screen",
        arguments=[os.path.join(share, "launchs", "lidar_odometry_ros2.yaml")],
    )
    rviz = Node(
        package="rviz2",
        executable="rviz2",
        name="rviz2",
        arguments=["-d", os.path.join(share, "rviz2", "lidar-odometry.rviz")],
    )

    return LaunchDescription([lidar_topic, gnss_topic, ignore_tf, *env, odometry, rviz])
