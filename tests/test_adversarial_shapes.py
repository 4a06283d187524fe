"""Adversarial real-log SHAPES sweep (VERDICT r3 item 4).

Real sensor logs fail in characteristic ways that synthetic happy-path
fixtures never exercise: dropped packets leave empty azimuth sectors,
GT files carry duplicate or shuffled timestamps, clouds overflow the
pipeline's fixed grid capacity, and scenes degenerate to all-ground or
zero-ground.  Each case here asserts the REFERENCE's semantics for that
shape (cited per test), not merely "doesn't crash".
"""

import math
import os

import numpy as np
import pytest

from pctpu.config import SensorParams

from .fixtures import make_mulran_raycast_world
from .ref_impl import ordered_cloud_ref

TINY = SensorParams(n_scan=8, horizon_scan=48, ground_upper_scan=4,
                    height_res=0.5)


def _pcd_fields(xyz, intensity=None, row=None, col=None, label=None):
    n = len(xyz)
    return {
        "x": xyz[:, 0].astype(np.float32),
        "y": xyz[:, 1].astype(np.float32),
        "z": xyz[:, 2].astype(np.float32),
        "intensity": (np.ones(n, np.float32) if intensity is None
                      else intensity.astype(np.float32)),
        "row": (np.zeros(n, np.uint16) if row is None
                else row.astype(np.uint16)),
        "col": (np.zeros(n, np.uint16) if col is None
                else col.astype(np.uint16)),
        "t": np.arange(n, dtype=np.uint32) + 1,
        "label": (np.zeros(n, np.int16) if label is None
                  else label.astype(np.int16)),
    }


def test_compact_last_wins_matches_loop_oracle():
    """Host over-capacity compaction + the device ordering kernel reproduce
    getOrderedCloud (/root/reference/BatchMultiBevGen.cpp:94-117) on clouds
    LARGER than the grid — including duplicate cells whose winner arrives
    after the capacity cutoff, which plain truncation would lose."""
    import jax

    from pctpu.cloud import make_cloud
    from pctpu.ops.ordering import compact_last_wins, get_ordered_cloud

    rng = np.random.default_rng(3)
    g = TINY.grid_size
    n = g + 200  # strictly over capacity
    rows = rng.integers(-1, TINY.n_scan + 1, n)
    cols = rng.integers(-2, TINY.horizon_scan + 2, n)
    xyz = rng.normal(0, 10, (n, 3)).astype(np.float32)
    fields = _pcd_fields(xyz, intensity=rng.random(n), row=np.maximum(rows, 0),
                         col=np.maximum(cols, 0), label=rng.integers(-2, 1, n))
    # restore genuine out-of-bounds values (uint16 storage is the on-disk
    # format; use int arrays directly here to also cover the negative branch)
    fields["row"] = rows.astype(np.int32)
    fields["col"] = cols.astype(np.int32)

    compacted, n_keep = compact_last_wins(fields, n, TINY)
    assert n_keep <= g

    cloud = make_cloud(
        np.stack([compacted["x"], compacted["y"], compacted["z"]], 1),
        intensity=compacted["intensity"], row=compacted["row"],
        col=compacted["col"], t=compacted["t"], label=compacted["label"],
        capacity=g,
    )
    ordered = jax.device_get(
        jax.jit(lambda c: get_ordered_cloud(c, TINY))(cloud)
    )

    pts = [
        {"x": float(xyz[i, 0]), "y": float(xyz[i, 1]), "z": float(xyz[i, 2]),
         "intensity": float(fields["intensity"][i]), "row": int(rows[i]),
         "col": int(cols[i]), "t": int(fields["t"][i]),
         "label": int(fields["label"][i])}
        for i in range(n)
    ]
    ref = ordered_cloud_ref(pts, TINY.n_scan, TINY.horizon_scan)
    np.testing.assert_array_equal(
        np.asarray(ordered.xyz),
        np.array([[p["x"], p["y"], p["z"]] for p in ref], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(ordered.t), np.array([p["t"] for p in ref], np.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(ordered.label), np.array([p["label"] for p in ref])
    )


@pytest.mark.slow
def test_multi_bev_over_capacity_cloud_last_wins(tmp_path):
    """run_multi_bev on a PCD with more points than grid_size: the late
    duplicate-cell winner (input index beyond capacity) must land in the
    output, as the reference's unbounded per-point loop would place it."""
    from pctpu.io.pcd import read_pcd, write_pcd
    from pctpu.pipelines.multi_bev import run_multi_bev

    g = TINY.grid_size
    rng = np.random.default_rng(4)
    n = g + 64
    rows = rng.integers(0, TINY.n_scan, n)
    cols = rng.integers(0, TINY.horizon_scan, n)
    # the very last point duplicates the first point's cell with a
    # distinctive z — last wins means IT must appear in the ordered output
    rows[-1], cols[-1] = rows[0], cols[0]
    xyz = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(2.0, 5.0, n)  # walls, no ground ambiguity
    xyz[-1, 2] = np.float32(4.321)

    root = tmp_path / "tree"
    cloud_dir = root / "keyframe_point_cloud"
    os.makedirs(cloud_dir)
    write_pcd(str(cloud_dir / "000000.pcd"),
              _pcd_fields(xyz, row=rows, col=cols))
    (root / "keyframe_pose.csv").write_text(
        "000000, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0,"
        " 0.0, 0.0, 1.0\n"
    )

    out = run_multi_bev(str(root), TINY, batch_size=1, write_pngs=False)
    assert out.num_clouds == 1
    data, meta = read_pcd(str(root / "non_ground_point_cloud" / "000000.pcd"))
    assert meta["points"] == g  # ordered layout
    slot = int(rows[0]) * TINY.horizon_scan + int(cols[0])
    assert data["z"][slot] == np.float32(4.321), (
        "late-arriving duplicate-cell winner was truncated away"
    )


@pytest.mark.slow
def test_mulran_empty_azimuth_sector_pipeline(tmp_path):
    """Dropped-packet shape: a contiguous azimuth sector of every frame is
    no-return (all-zero rays, as real Ouster frames emit).  The selector and
    BEV pipeline must run unchanged, and the ordered clouds keep the
    sector's cells all-zero (empty cells are label-0 by convention —
    ordered-cloud invariant, CLAUDE.md)."""
    from pctpu.io.pcd import read_pcd
    from pctpu.pipelines.multi_bev import run_multi_bev
    from pctpu.pipelines.selectors import run_mulran_select

    root = str(tmp_path / "drive")
    make_mulran_raycast_world(root, num_frames=3)
    # zero a contiguous azimuth sector in every frame: cols 40-79 of the
    # 192 rendered columns (emission order is column-major, 64 rows/col)
    bin_dir = os.path.join(root, "sensor_data", "Ouster")
    for name in os.listdir(bin_dir):
        path = os.path.join(bin_dir, name)
        scan = np.fromfile(path, np.float32).reshape(-1, 64, 4)
        scan[40:80] = 0.0
        scan.tofile(path)

    n = run_mulran_select(root, 2.0)
    assert n == 2
    tree = os.path.join(root, "selected_keyframes_2.00m")
    out = run_multi_bev(tree, "OS1_64", batch_size=2, write_pngs=False)
    assert out.num_clouds == 2

    data, _ = read_pcd(
        os.path.join(tree, "non_ground_point_cloud", "000000.pcd")
    )
    # the dropped sector's columns are entirely empty cells: all-zero
    # coordinates and label 0
    cols = np.arange(1024)[None, :].repeat(64, 0).reshape(-1)
    sector = (cols >= 40) & (cols < 80)
    assert np.all(data["x"][sector] == 0.0)
    assert np.all(data["z"][sector] == 0.0)
    assert np.all(data["label"][sector] == 0)
    # ...and the rest of the scene still produced geometry + ground labels
    assert np.any(data["x"][~sector] != 0.0)


@pytest.mark.slow
def test_mulran_duplicate_gt_stamp_nan_pose_skipped(tmp_path):
    """Duplicate GT timestamps give 0/0 in the reference's double
    interpolation math (/root/reference/MulranPointCloudSelect.cpp:320-346)
    — a NaN pose.  The frame is still SAVED: the keyframe gate skips only
    when ``dist < interval`` (:348-351), and NaN compares false, so the NaN
    pose lands in keyframe_pose.csv and later frames select normally (their
    NaN distance-to-last also compares false)."""
    from pctpu.pipelines.selectors import run_mulran_select

    root = tmp_path / "drive"
    os.makedirs(root / "sensor_data" / "Ouster")
    # two GT rows with the SAME stamp bracketing cloud stamp 200 → lam = 0/0
    rows = [
        "200,1.0,0.0,0.0,0.0,0.0,1.0,0.0,0.0,0.0,0.0,1.0,0.0",
        "200,1.0,0.0,0.0,7.0,0.0,1.0,0.0,0.0,0.0,0.0,1.0,0.0",
        "300,1.0,0.0,0.0,5.0,0.0,1.0,0.0,5.0,0.0,0.0,1.0,0.0",
    ]
    (root / "global_pose.csv").write_text("\n".join(rows) + "\n")
    (root / "sensor_data" / "ouster_front_stamp.csv").write_text("200\n250\n")
    rng = np.random.default_rng(0)
    for s in (200, 250):
        pts = rng.uniform(-10, 10, (64 * 16, 4)).astype(np.float32)
        pts.tofile(root / "sensor_data" / "Ouster" / f"{s:010d}.bin")

    n = run_mulran_select(str(root), 2.0)
    assert n == 2  # NaN dist compares false against the gate → both saved
    pose_csv = (
        root / "selected_keyframes_2.00m" / "keyframe_pose.csv"
    ).read_text()
    lines = pose_csv.strip().split("\n")
    assert len(lines) == 2
    assert lines[0].startswith("000000") and "nan" in lines[0].lower()
    # the second frame brackets (200, 300) normally: a real, finite pose
    assert lines[1].startswith("000001") and "nan" not in lines[1].lower()


@pytest.mark.slow
def test_mulran_shuffled_gt_rows_identical_output(tmp_path):
    """GT and stamp files arrive sorted-by-reader
    (/root/reference/MulranPointCloudSelect.cpp:216-228): shuffling the rows
    on disk must produce byte-identical selector output."""
    from pctpu.pipelines.selectors import run_mulran_select

    roots = []
    for shuffle in (False, True):
        root = str(tmp_path / ("shuf" if shuffle else "sorted"))
        make_mulran_raycast_world(root, num_frames=3)
        if shuffle:
            gt = os.path.join(root, "global_pose.csv")
            rows = open(gt).read().strip().split("\n")
            rng = np.random.default_rng(1)
            rng.shuffle(rows)
            open(gt, "w").write("\n".join(rows) + "\n")
            st = os.path.join(root, "sensor_data", "ouster_front_stamp.csv")
            srows = open(st).read().strip().split("\n")
            rng.shuffle(srows)
            open(st, "w").write("\n".join(srows) + "\n")
        n = run_mulran_select(root, 2.0)
        assert n == 2
        roots.append(root)

    for rel in ("keyframe_pose.csv", "keyframe_point_cloud/000000.pcd",
                "keyframe_point_cloud/000001.pcd"):
        a = open(os.path.join(roots[0], "selected_keyframes_2.00m", rel), "rb").read()
        b = open(os.path.join(roots[1], "selected_keyframes_2.00m", rel), "rb").read()
        assert a == b, rel


@pytest.mark.slow
def test_zero_ground_and_all_ground_scenes():
    """Degenerate scenes: a wall-only cloud marks (almost) nothing as
    ground; a flat plane marks the swept band as ground.  Both produce
    finite BEVs — the sweep's closed form must not NaN out on constant
    z-columns (/root/reference/BatchMultiBevGen.cpp ground slope test)."""
    import jax

    from pctpu.cloud import make_cloud
    from pctpu.ops.preprocess import preprocess_batch

    g = TINY.grid_size
    rows = np.arange(g) // TINY.horizon_scan
    cols = np.arange(g) % TINY.horizon_scan
    az = cols * (2 * np.pi / TINY.horizon_scan)

    def run(z):
        r = 5.0 + 0.5 * rows
        xyz = np.stack(
            [r * np.cos(az), r * np.sin(az), z], axis=1
        ).astype(np.float32)
        # every input point starts as an obstacle (-2); ground marking
        # relabels marked points to 0, which the BEV rasters then skip
        cloud = make_cloud(xyz, row=rows, col=cols,
                           label=np.full(g, -2), capacity=g)
        batch = jax.tree.map(lambda x: np.asarray(x)[None], cloud)
        labeled, multi, single = jax.device_get(
            jax.jit(
                lambda b: preprocess_batch(b, TINY, assume_ordered=False)
            )(batch)
        )
        assert np.all(np.isfinite(np.asarray(labeled.xyz)))
        assert np.all(np.isfinite(np.asarray(single)))
        return np.asarray(labeled.label)[0], np.asarray(multi)

    # steep wall: dz ≈ 0.8 vs dr ≈ 0.5 between adjacent rings (~58° ≫ 10°)
    # — zero ground may be marked, the obstacle BEV keeps the scene
    lab_wall, multi_w = run(z=(-1.5 + 0.8 * (TINY.n_scan - 1 - rows)))
    assert int((lab_wall == 0).sum()) == 0, "wall ring was swallowed as ground"
    assert multi_w.sum() > 0

    # flat plane at z=-1.9: the swept band is genuinely flat → ground fires
    # across it (all-ground scene), and the marked points leave the BEV
    lab_flat, _ = run(z=np.full(g, -1.9, np.float32))
    swept = rows >= TINY.n_scan - TINY.ground_upper_scan - 1
    marked = int((lab_flat == 0).sum())
    assert marked > 0.5 * int(swept.sum()), (
        f"flat plane barely marked: {marked} of {int(swept.sum())} swept cells"
    )


@pytest.mark.slow
def test_kitti_missing_bin_raises(tmp_path):
    """KITTI selector on a tree whose velodyne bin vanished mid-sequence:
    the reference exits with an error
    (/root/reference/KittiPointCloudSelect.cpp:427-430) — pctpu raises."""
    from .fixtures import make_kitti_tree
    from pctpu.pipelines.selectors import run_kitti_select

    root = str(tmp_path / "kitti")
    make_kitti_tree(root, num_frames=3, spacing=3.0)
    os.remove(os.path.join(root, "velodyne", "000001.bin"))
    with pytest.raises(FileNotFoundError):
        run_kitti_select(root, 2.0)
