from pctpu.geom.se3 import (
    Pose6f,
    euler_zyx_to_matrix,
    interpolate_pose,
    is_rotation_matrix,
    quat_from_matrix,
    quat_slerp,
    quat_to_matrix,
    rotation_matrix_to_euler_angles,
    pose_distance,
    yaw_rotation_4x4,
)

__all__ = [
    "Pose6f",
    "euler_zyx_to_matrix",
    "interpolate_pose",
    "is_rotation_matrix",
    "quat_from_matrix",
    "quat_slerp",
    "quat_to_matrix",
    "rotation_matrix_to_euler_angles",
    "pose_distance",
    "yaw_rotation_4x4",
]
