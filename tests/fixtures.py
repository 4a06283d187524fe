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


def make_mulran_tree(root: str, num_frames: int = 5, spacing_m: float = 3.0) -> None:
    """A MulRan-layout tree: sensor_data/Ouster/*.bin + stamps + global_pose.csv."""
    rng = np.random.default_rng(1)
    os.makedirs(os.path.join(root, "sensor_data", "Ouster"), exist_ok=True)
    stamps = [1_000_000_000 + i * 100_000 for i in range(num_frames)]
    # GT poses bracket the cloud stamps (one before, one after each)
    pose_rows = []
    for k in range(num_frames + 1):
        t = 1_000_000_000 - 50_000 + k * 100_000
        x = (k - 0.5) * spacing_m
        # y offset 2.5 keeps frame 0 beyond the selector's origin sentinel
        pose_rows.append(
            f"{t},1.0,0.0,0.0,{x:.6f},0.0,1.0,0.0,2.5,0.0,0.0,1.0,0.0"
        )
    with open(os.path.join(root, "global_pose.csv"), "w") as f:
        f.write("\n".join(pose_rows) + "\n")
    with open(os.path.join(root, "sensor_data", "ouster_front_stamp.csv"), "w") as f:
        f.write("\n".join(str(s) for s in stamps) + "\n")
    for s in stamps:
        n = 4096
        pts = np.stack(
            [
                rng.uniform(-40, 40, n),
                rng.uniform(-40, 40, n),
                rng.uniform(-2, 6, n),
                rng.random(n),
            ],
            axis=1,
        ).astype(np.float32)
        pts.tofile(os.path.join(root, "sensor_data", "Ouster", f"{s:010d}.bin"))


def make_oxford_tree(root: str, num_frames: int = 5, spacing_m: float = 3.0,
                     rpy_cols: tuple = (0.01, 0.02, 0.03)) -> None:
    """An Oxford-layout tree: velodyne_left/*.bin + .timestamps + gps/ins.csv.

    ``rpy_cols`` fills ins.csv tokens 12-14 (header roll,pitch,yaw) — note
    the reference reads yaw from token 12 and roll from token 14, i.e. the
    header-swapped order (OxfordPointCloudSelect.cpp:249-251)."""
    rng = np.random.default_rng(2)
    os.makedirs(os.path.join(root, "velodyne_left"), exist_ok=True)
    os.makedirs(os.path.join(root, "gps"), exist_ok=True)
    stamps = [1_500_000_000 + i * 100_000 for i in range(num_frames)]
    header = (
        "timestamp,ins_status,latitude,longitude,altitude,northing,easting,"
        "down,utm_zone,velocity_north,velocity_east,velocity_down,roll,pitch,yaw"
    )
    rows = [header]
    for k in range(num_frames + 1):
        t = 1_500_000_000 - 50_000 + k * 100_000
        easting = 600000.0 + (k - 0.5) * spacing_m
        rows.append(
            f"{t},INS_SOLUTION_GOOD,51.76,-1.26,114.7,5735848.0,{easting:.6f},"
            f"-114.7,30U,0.1,0.0,0.0,{rpy_cols[0]},{rpy_cols[1]},{rpy_cols[2]}"
        )
    with open(os.path.join(root, "gps", "ins.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(os.path.join(root, "velodyne_left.timestamps"), "w") as f:
        f.write("\n".join(f"{s} 1" for s in stamps) + "\n")
    for s in stamps:
        n = 2048
        x = rng.uniform(-40, 40, n).astype(np.float32)
        y = rng.uniform(-40, 40, n).astype(np.float32)
        z = rng.uniform(-4, 2, n).astype(np.float32)
        i = rng.random(n).astype(np.float32)
        np.concatenate([x, y, z, i]).tofile(
            os.path.join(root, "velodyne_left", f"{s:010d}.bin")
        )
