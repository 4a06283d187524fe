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


def make_kitti_raw_tree(root: str, num_frames: int = 5, spacing: float = 3.0) -> None:
    """A KITTI tree for the RAW-variant selector: ``global_pose.txt`` rows
    are the lidar poses DIRECTLY (no camera extrinsic), with distinct
    translation components per axis so the raw selector's x/y/z shuffle
    (x=T03, y=T23, z=T13) is observable."""
    rng = np.random.default_rng(3)
    os.makedirs(os.path.join(root, "velodyne"), exist_ok=True)
    rows = []
    for idx in range(num_frames):
        scan = synth_kitti_scan(rng)
        scan.tofile(os.path.join(root, "velodyne", f"{idx:06d}.bin"))
        t = np.eye(4)
        yaw = 0.04 * idx
        c, s = np.cos(yaw), np.sin(yaw)
        t[:2, :2] = [[c, -s], [s, c]]
        t[0, 3] = spacing * idx  # raw pose .x
        t[1, 3] = 10.0 + idx     # raw pose .z
        t[2, 3] = 5.0            # raw pose .y
        rows.append(" ".join(f"{v:.9e}" for v in t[:3, :4].reshape(-1)))
    with open(os.path.join(root, "global_pose.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")
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


def _raycast_hits(ox, oy, yaw, d, buildings, z_ground, z_top, rng,
                  h_sensor: float = 0.0):
    """Cast sensor-frame direction array ``d`` (..., 3) from world pose
    (ox, oy, yaw) against a flat ground plane + cylindrical buildings.
    Returns (range, valid, is_wall) per ray, with small range noise."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    dw = d.copy()
    dw[..., 0] = cy * d[..., 0] - sy * d[..., 1]
    dw[..., 1] = sy * d[..., 0] + cy * d[..., 1]

    dz = dw[..., 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        t_ground = np.where(dz < -1e-6, (z_ground - h_sensor) / dz, np.inf)
    t_hit = t_ground
    is_wall = np.zeros(t_hit.shape, bool)
    for cx, cyd, radius in buildings:
        a = dw[..., 0] ** 2 + dw[..., 1] ** 2
        bq = 2.0 * ((ox - cx) * dw[..., 0] + (oy - cyd) * dw[..., 1])
        c0 = (ox - cx) ** 2 + (oy - cyd) ** 2 - radius**2
        disc = bq * bq - 4.0 * a * c0
        with np.errstate(invalid="ignore"):
            tw = (-bq - np.sqrt(np.maximum(disc, 0.0))) / (2.0 * a)
        zw = tw * dz
        ok = (disc > 0) & (tw > 0.5) & (zw >= z_ground) & (zw <= z_top)
        closer = ok & (tw < t_hit)
        t_hit = np.where(closer, tw, t_hit)
        is_wall |= closer
    t_hit = t_hit + rng.normal(0, 0.01, t_hit.shape)  # range noise
    valid = np.isfinite(t_hit) & (t_hit < 90.0)
    return t_hit, valid, is_wall


def make_mulran_raycast_world(
    root: str,
    num_frames: int = 6,
    n_cols: int = 192,
    spacing_m: float = 2.2,
    yaw_step_deg: float = 2.5,
    seed: int = 0,
):
    """A geometrically CONSISTENT MulRan-layout drive: every frame ray-casts
    the same static world (flat ground plane at z = -1.9 + cylindrical
    buildings) from a moving ego pose, with the Ouster emission order the
    reference's reader expects (row = k mod 64, col = azimuth bin,
    /root/reference/MulranPointCloudSelect.cpp:114-128).

    Unlike the random-scan fixtures, ground marking genuinely fires on this
    geometry (flat-ground ring pairs pass the 10-degree slope test, walls
    fail it) and registration of keyframe pairs has a known ground-truth
    relative pose.  Returns {"stamps": [...], "poses": [(x, y, yaw_rad)]}
    (the TRUE ego pose per frame; GT csv rows bracket the stamps so the
    selector's interpolation path is exercised and lands back on these).

    Rays: 64 rings (elevation +16.6 .. -16.6 degrees, top first so larger
    row = lower ring like the sensor) x ``n_cols`` azimuth columns of the
    1024-bin horizon.  No-return rays (sky) emit (0, 0, 0, 0) like real
    Ouster frames.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "sensor_data", "Ouster"), exist_ok=True)

    # static world: ground plane z=-1.9; buildings inside the rendered
    # azimuth wedge (0..n_cols/1024*360 deg from +x) at 25-55 m so ego
    # motion never rotates them out of the wedge
    buildings = []
    for k in range(7):
        az = np.radians(14.0 + 4.5 * k)
        dist = 25.0 + 4.5 * k
        buildings.append((dist * np.cos(az), dist * np.sin(az), 3.5))
    z_ground, z_top, h_sensor = -1.9, 6.0, 0.0

    el = np.radians(16.6 - np.arange(64) * (33.2 / 63.0))  # top first
    az = np.radians(np.arange(n_cols) * (360.0 / 1024.0))
    # (n_cols, 64, 3) sensor-frame directions, emission order c-major
    d = np.stack(
        [
            np.cos(el)[None, :] * np.cos(az)[:, None],
            np.cos(el)[None, :] * np.sin(az)[:, None],
            np.broadcast_to(np.sin(el)[None, :], (n_cols, 64)),
        ],
        axis=-1,
    )

    t0 = 1_000_000_000
    stamps = [t0 + i * 100_000 for i in range(num_frames)]
    yaw_step = np.radians(yaw_step_deg)

    def true_pose(u: float):
        return (spacing_m * u, 0.15 * u, yaw_step * u)

    # GT csv rows bracket every stamp (one before, one after), constant-rate
    # motion so the selector's lerp+slerp lands exactly on true_pose(i)
    rows = []
    for k in range(num_frames + 1):
        t = t0 - 50_000 + k * 100_000
        x, y, yaw = true_pose((t - t0) / 100_000.0)
        c, s = np.cos(yaw), np.sin(yaw)
        rows.append(
            f"{t},{c:.9f},{-s:.9f},0.0,{x:.6f},{s:.9f},{c:.9f},0.0,{y:.6f},"
            "0.0,0.0,1.0,0.0"
        )
    with open(os.path.join(root, "global_pose.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(os.path.join(root, "sensor_data", "ouster_front_stamp.csv"), "w") as f:
        f.write("\n".join(str(s) for s in stamps) + "\n")

    poses = []
    for i, stamp in enumerate(stamps):
        ox, oy, yaw = true_pose(float(i))
        poses.append((ox, oy, yaw))
        t_hit, valid, is_wall = _raycast_hits(
            ox, oy, yaw, d, buildings, z_ground, z_top, rng
        )
        pts = d * np.where(valid, t_hit, 0.0)[..., None]  # SENSOR frame
        intensity = np.where(
            valid, np.where(is_wall, 0.7, 0.35) + rng.uniform(0, 0.2, t_hit.shape), 0.0
        )
        scan = np.concatenate(
            [pts.reshape(-1, 3), intensity.reshape(-1, 1)], axis=1
        ).astype(np.float32)
        scan.tofile(
            os.path.join(root, "sensor_data", "Ouster", f"{stamp:010d}.bin")
        )
    return {"stamps": stamps, "poses": poses}


def make_oxford_raycast_world(
    root: str,
    num_frames: int = 5,
    n_cols: int = 176,
    spacing_m: float = 2.2,
    yaw_step_deg: float = 2.5,
    seed: int = 3,
):
    """A geometrically consistent Oxford-layout drive, exercising every
    convention quirk of that ingest path jointly
    (/root/reference/OxfordPointCloudSelect.cpp):

      * the .bin stores the RAW upside-down sensor frame in the transposed
        all-x/all-y/all-z/all-i layout — the reader's x=-x, z=-z flip must
        recover the vehicle frame or the ground-truth registration below
        fails (the flip is a 180-degree rotation about y, so a missing flip
        negates every relative yaw);
      * rows come from elevation (the 32 HDL-32E ring angles +10.67 down by
        1.3335 deg), cols from azimuth;
      * ins.csv carries yaw in token 12 (the header-swapped order) and
        position as (easting, northing, altitude) at realistic 6e5-magnitude
        eastings (f32 pose quantization ~0.03 m, like real data).

    Returns {"stamps": [...], "poses": [(x=easting, y=northing, yaw_rad)]}
    (true ego poses; GT rows bracket the stamps for the interpolation path).
    No-return rays are simply omitted (the Oxford layout is variable-N).
    """
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "velodyne_left"), exist_ok=True)
    os.makedirs(os.path.join(root, "gps"), exist_ok=True)

    e0, n0 = 600000.0, 5735848.0  # realistic UTM-magnitude origin
    buildings = []
    for k in range(6):
        az = np.radians(12.0 + 5.5 * k)
        dist = 20.0 + 4.0 * k
        buildings.append(
            (e0 + dist * np.cos(az), n0 + dist * np.sin(az), 3.0)
        )
    z_ground, z_top = -1.9, 5.0

    el = np.radians(10.67 - 1.3335 * np.arange(32))  # ring elevations
    az = np.radians(np.arange(n_cols) * (360.0 / 1056.0))
    d = np.stack(
        [
            np.cos(el)[None, :] * np.cos(az)[:, None],
            np.cos(el)[None, :] * np.sin(az)[:, None],
            np.broadcast_to(np.sin(el)[None, :], (n_cols, 32)),
        ],
        axis=-1,
    )

    t0 = 1_500_000_000
    stamps = [t0 + i * 100_000 for i in range(num_frames)]
    yaw_step = np.radians(yaw_step_deg)

    # constant northing: at 5.7e6 the f32 pose ulp is 0.5 m, so a sub-metre
    # lateral drift would be invisible in the keyframe csv anyway (the
    # reference quantizes real Oxford northings identically)
    def true_pose(u: float):
        return (e0 + spacing_m * u, n0, yaw_step * u)

    header = (
        "timestamp,ins_status,latitude,longitude,altitude,northing,easting,"
        "down,utm_zone,velocity_north,velocity_east,velocity_down,roll,pitch,yaw"
    )
    rows = [header]
    for k in range(num_frames + 1):
        t = t0 - 50_000 + k * 100_000
        x, y, yaw = true_pose((t - t0) / 100_000.0)
        # token 12 is yaw, 14 is roll (the reference's header-swapped read)
        rows.append(
            f"{t},INS_SOLUTION_GOOD,51.76,-1.26,0.0,{y:.6f},{x:.6f},"
            f"0.0,30U,0.1,0.0,0.0,{yaw:.9f},0.0,0.0"
        )
    with open(os.path.join(root, "gps", "ins.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(os.path.join(root, "velodyne_left.timestamps"), "w") as f:
        f.write("\n".join(f"{s} 1" for s in stamps) + "\n")

    poses = []
    for i, stamp in enumerate(stamps):
        ox, oy, yaw = true_pose(float(i))
        poses.append((ox, oy, yaw))
        t_hit, valid, is_wall = _raycast_hits(
            ox, oy, yaw, d, buildings, z_ground, z_top, rng
        )
        # vehicle frame, hits only (zero out no-return rows before the
        # multiply: inf ranges times zero direction components would NaN)
        pts = (d * np.where(valid, t_hit, 0.0)[..., None])[valid]
        inten = (np.where(is_wall, 0.7, 0.35)
                 + rng.uniform(0, 0.2, t_hit.shape))[valid]
        # store the RAW upside-down sensor frame, transposed layout
        raw = np.concatenate(
            [-pts[:, 0], pts[:, 1], -pts[:, 2], inten]
        ).astype(np.float32)
        raw.tofile(os.path.join(root, "velodyne_left", f"{stamp:010d}.bin"))
    return {"stamps": stamps, "poses": poses}
