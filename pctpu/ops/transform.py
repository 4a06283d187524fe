"""Rigid transforms of clouds on device.

Replaces ``pcl::transformPointCloud`` (/root/reference/CloudManip.cpp:128):
one (N, 3) @ (3, 3) matmul + translation broadcast, batchable with vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pctpu.cloud import Cloud


def transform_xyz(xyz: jnp.ndarray, matrix4: jnp.ndarray) -> jnp.ndarray:
    """Apply a homogeneous 4x4 to (..., 3) points (float32, full precision)."""
    matrix4 = jnp.asarray(matrix4, jnp.float32)
    rotated = jnp.matmul(
        xyz, matrix4[:3, :3].T, precision=jax.lax.Precision.HIGHEST
    )
    return rotated + matrix4[:3, 3]


def transform_cloud(cloud: Cloud, matrix4: jnp.ndarray) -> Cloud:
    return cloud.replace(xyz=transform_xyz(cloud.xyz, matrix4))


def make_rigid_transform(tx: float, ty: float, tz: float, yaw_rad: float) -> jnp.ndarray:
    """Translation + yaw, the cloud_manip argv transform
    (/root/reference/CloudManip.cpp:119-128)."""
    c = jnp.cos(yaw_rad)
    s = jnp.sin(yaw_rad)
    return jnp.array(
        [[c, -s, 0, tx], [s, c, 0, ty], [0, 0, 1, tz], [0, 0, 0, 1]], jnp.float32
    )
