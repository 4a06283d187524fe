"""Synthetic miniature dataset trees for end-to-end pipeline tests."""

from __future__ import annotations

import os

import numpy as np

from pctpu.io import kitti


def synth_kitti_scan(rng, rings: int = 6, per_ring: int = 1300) -> np.ndarray:
    """An (N, 4) float32 scan whose azimuth pattern drives the reference ring
    segmentation: each ring sweeps azimuth from +179° down to -179°, so ring
    boundaries are the (az<=0 → az>0) flips, and per_ring > 0.6*2083 satisfies
    the ring-length guard (/root/reference/KittiPointCloudSelect.cpp:218)."""
    pts = []
    for ring in range(rings):
        az = np.linspace(179.0, -179.0, per_ring)
        # elevations chosen so z lands inside the 24 BEV layers
        # (z/0.25 + 2 ∈ [0, 24) ⟺ z ∈ [-0.5, 5.5) for HDL-64E)
        elev = np.radians(-0.5 + ring * 0.6)
        r = rng.uniform(3.0, 60.0, per_ring)
        x = r * np.cos(np.radians(az))
        y = r * np.sin(np.radians(az))
        z = r * np.tan(elev) + rng.normal(0, 0.05, per_ring)
        i = rng.random(per_ring)
        pts.append(np.stack([x, y, z, i], axis=1))
    return np.concatenate(pts).astype(np.float32)


def make_kitti_tree(root: str, num_frames: int = 6, spacing: float = 3.0) -> None:
    """A KITTI-layout dataset: velodyne/*.bin + times.txt + global_pose.txt.

    Poses advance `spacing` metres per frame along lidar +x so a 2 m keyframe
    gate keeps every frame.
    """
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "velodyne"), exist_ok=True)
    cam_rows = []
    a_inv = np.linalg.inv(kitti.CAM_WRT_LIDAR)
    for idx in range(num_frames):
        scan = synth_kitti_scan(rng)
        scan.tofile(os.path.join(root, "velodyne", f"{idx:06d}.bin"))
        t_lidar = np.eye(4)
        yaw = 0.05 * idx
        c, s = np.cos(yaw), np.sin(yaw)
        t_lidar[:2, :2] = [[c, -s], [s, c]]
        t_lidar[0, 3] = spacing * idx
        t_lidar[1, 3] = 0.3 * np.sin(idx)
        t_cam = a_inv @ t_lidar @ kitti.CAM_WRT_LIDAR
        cam_rows.append(" ".join(f"{v:.9e}" for v in t_cam[:3, :4].reshape(-1)))
    with open(os.path.join(root, "global_pose.txt"), "w") as f:
        f.write("\n".join(cam_rows) + "\n")
    with open(os.path.join(root, "times.txt"), "w") as f:
        f.write("\n".join(f"{i * 0.1:.6e}" for i in range(num_frames)) + "\n")
