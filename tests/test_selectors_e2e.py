"""MulRan / Oxford selector end-to-end over synthetic layout trees."""

import os

import numpy as np
import pytest

from pctpu.io.pcd import read_pcd
from pctpu.io.poses import read_keyframe_poses

from .fixtures import make_mulran_tree, make_oxford_tree


def test_mulran_select_e2e(tmp_path):
    from pctpu.pipelines.selectors import run_mulran_select

    root = str(tmp_path / "mulran")
    make_mulran_tree(root, num_frames=5, spacing_m=3.0)
    n = run_mulran_select(root, 2.0)
    assert n == 5  # 3 m spacing > 2 m gate
    out = os.path.join(root, "selected_keyframes_2.00m")
    files = sorted(os.listdir(os.path.join(out, "keyframe_point_cloud")))
    assert files == [f"{i:06d}.pcd" for i in range(5)]
    data, meta = read_pcd(os.path.join(out, "keyframe_point_cloud", "000000.pcd"))
    assert meta["points"] == 4096
    # MulRan keeps real intensity (no KITTI quirk) and labels -2
    assert np.all(data["label"] == -2)
    assert np.all(data["intensity"] >= 0)
    np.testing.assert_array_equal(data["row"], np.arange(4096) % 64)

    poses = read_keyframe_poses(os.path.join(out, "keyframe_pose.csv"))
    assert len(poses) == 5
    # cloud stamp sits midway between bracketing poses → x interpolates
    # halfway between (k-0.5)*3 and (k+0.5)*3 = 3k
    for i, (cloud_idx, pose) in enumerate(poses):
        assert cloud_idx == i
        assert pose.x == pytest.approx(3.0 * i, abs=1e-4)
        assert pose.y == pytest.approx(2.5, abs=1e-4)


def test_oxford_select_e2e(tmp_path):
    from pctpu.pipelines.selectors import run_oxford_select

    root = str(tmp_path / "oxford")
    make_oxford_tree(root, num_frames=5, spacing_m=3.0)
    n = run_oxford_select(root, 2.0)
    assert n == 5
    out = os.path.join(root, "selected_keyframes_2.00m")
    data, meta = read_pcd(os.path.join(out, "keyframe_point_cloud", "000000.pcd"))
    assert meta["points"] == 2048
    assert np.all(data["label"] == -2)
    assert data["row"].max() <= 31
    poses = read_keyframe_poses(os.path.join(out, "keyframe_pose.csv"))
    assert len(poses) == 5
    # x = easting interpolated at midpoints → 600000 + 3k
    for i, (cloud_idx, pose) in enumerate(poses):
        assert pose.x == pytest.approx(600000.0 + 3.0 * i, rel=0, abs=0.51)


def test_mulran_missing_cloud_skipped(tmp_path):
    from pctpu.pipelines.selectors import run_mulran_select

    root = str(tmp_path / "mulran")
    make_mulran_tree(root, num_frames=3, spacing_m=3.0)
    # delete one bin: reference logs and continues with an empty cloud
    victim = sorted(os.listdir(os.path.join(root, "sensor_data", "Ouster")))[1]
    os.remove(os.path.join(root, "sensor_data", "Ouster", victim))
    n = run_mulran_select(root, 2.0)
    assert n == 3  # pose row still written; pcd missing for the victim

@pytest.mark.slow
def test_mulran_to_multibev_integration(tmp_path):
    """Full user flow: MulRan select → batch_multi_bev_gen (OS1_64).

    Unlike KITTI (intensity=-1 quirk), MulRan keeps real intensity, so
    ground marking is ACTIVE end-to-end: labels 0 must appear and ground
    points must be excluded from the BEVs."""
    from pctpu.pipelines.multi_bev import run_multi_bev
    from pctpu.pipelines.selectors import run_mulran_select

    root = str(tmp_path / "mulran")
    # ground-heavy synthetic clouds: rewrite the fixture bins with a flat
    # ground plane plus towers so the slope test fires
    make_mulran_tree(root, num_frames=3, spacing_m=3.0)
    rng = np.random.default_rng(7)
    bin_dir = os.path.join(root, "sensor_data", "Ouster")
    for name in os.listdir(bin_dir):
        n = 4096
        r = rng.uniform(3, 35, n)
        az = rng.uniform(0, 2 * np.pi, n)
        ground = rng.random(n) < 0.7
        z = np.where(ground, -1.9 + rng.normal(0, 0.01, n), rng.uniform(0, 6, n))
        pts = np.stack(
            [r * np.cos(az), r * np.sin(az), z, rng.uniform(0.1, 1.0, n)], 1
        ).astype(np.float32)
        pts.tofile(os.path.join(bin_dir, name))

    n_kf = run_mulran_select(root, 2.0)
    assert n_kf == 3
    tree = os.path.join(root, "selected_keyframes_2.00m")
    out = run_multi_bev(tree, "OS1_64", batch_size=2)
    assert out.num_clouds == 3

    data, meta = read_pcd(os.path.join(tree, "non_ground_point_cloud", "000000.pcd"))
    assert meta["points"] == 64 * 1024
    n_ground = int((data["label"] == 0).sum())
    n_nonground = int((data["label"] == -2).sum())
    # ground marking fired on a ground-dominated scene
    assert n_ground > 1000, f"expected active ground labeling, got {n_ground}"
    assert n_nonground > 100

    # ground exclusion: BEV layers near z=-1.9 (layer round(-1.9/1.0+2)=0)
    # should be sparse relative to total ground points
    blob = np.frombuffer(
        open(os.path.join(tree, "output_multi_bev", "binary", "000000.bin"), "rb").read(),
        np.uint8,
    ).reshape(24, 224, 224)
    assert blob.sum() > 0  # non-ground towers present
    occupied_layer0 = int((blob[0] > 0).sum())
    assert occupied_layer0 < n_ground / 4  # most ground points filtered out


def test_kitti_select_large_interval_keeps_first_only(tmp_path):
    """Frames inside the distance gate are skipped (the per-cloud continue
    branch), not written."""
    from pctpu.pipelines.selectors import run_kitti_select

    from .fixtures import make_kitti_tree

    root = str(tmp_path / "kitti")
    make_kitti_tree(root, num_frames=5, spacing=3.0)
    n = run_kitti_select(root, interval=100.0)
    assert n == 1
    out = os.path.join(root, "selected_keyframes_100.00m")
    assert sorted(os.listdir(os.path.join(out, "keyframe_point_cloud"))) == \
        ["000000.pcd"]
    assert len(read_keyframe_poses(
        os.path.join(out, "keyframe_pose.csv"))) == 1


def test_selector_resume_skips_existing_pcds(tmp_path):
    """--resume: keyframe PCDs already on disk are not re-extracted, but the
    pose CSV is fully rewritten (identical outputs, idempotent)."""
    import os

    from pctpu.pipelines.selectors import run_kitti_select

    from .fixtures import make_kitti_tree

    kitti_tree = str(tmp_path / "kitti")
    make_kitti_tree(kitti_tree, num_frames=5, spacing=3.0)
    n = run_kitti_select(kitti_tree, interval=2.0)
    out = os.path.join(kitti_tree, "selected_keyframes_2.00m")
    marker = os.path.join(out, "keyframe_point_cloud", "000000.pcd")
    before = os.path.getmtime(marker)
    pose_csv_before = open(os.path.join(out, "keyframe_pose.csv")).read()
    n2 = run_kitti_select(kitti_tree, interval=2.0, resume=True)
    assert n2 == n
    assert os.path.getmtime(marker) == before  # untouched on resume
    assert open(os.path.join(out, "keyframe_pose.csv")).read() == pose_csv_before

    # WITHOUT resume an existing output tree is cleared and rebuilt
    # (the reference shells out rm -rf)
    n3 = run_kitti_select(kitti_tree, interval=2.0)
    assert n3 == n
    assert os.path.getmtime(marker) > before


def test_oxford_euler_convention_negative_yaw(tmp_path):
    """Oxford's LOCAL Pose6f::interpolate derives euler via Eigen
    eulerAngles(2,1,0) (OxfordPointCloudSelect.cpp:84-99) — for headings
    with conventional yaw < 0 the CSV roll/pitch/yaw columns carry Eigen's
    alternate triple (yaw in [0, pi]), NOT the custom extraction MulRan
    uses.  (The euler consumers re-derive from the matrix, so this is a
    byte-format contract of keyframe_pose.csv columns 4-6.)"""
    import math

    from pctpu.geom.se3 import euler_zyx_to_matrix
    from pctpu.pipelines.selectors import run_oxford_select

    root = str(tmp_path / "oxford")
    # token 12 is the reference's YAW (header-swapped read, :249-251)
    make_oxford_tree(root, num_frames=4, spacing_m=3.0,
                     rpy_cols=(-0.8, 0.02, 0.01))
    n = run_oxford_select(root, 2.0)
    assert n == 4
    out = os.path.join(root, "selected_keyframes_2.00m")
    expected_rot = euler_zyx_to_matrix(0.01, 0.02, -0.8)
    with open(os.path.join(out, "keyframe_pose.csv")) as f:
        rows = [line.strip().split(",") for line in f if line.strip()]
    assert len(rows) == 4
    for fields in rows:
        roll_col, pitch_col, yaw_col = (float(fields[4]), float(fields[5]),
                                        float(fields[6]))
        # Eigen branch: first angle wrapped into [0, pi]
        assert 0.0 <= yaw_col <= math.pi + 1e-6
        assert yaw_col == pytest.approx(-0.8 + math.pi, abs=1e-4)
        # the alternate triple still encodes the same rotation
        np.testing.assert_allclose(
            euler_zyx_to_matrix(roll_col, pitch_col, yaw_col), expected_rot,
            atol=1e-5,
        )
        mat = np.array([float(v) for v in fields[7:16]]).reshape(3, 3)
        np.testing.assert_allclose(mat, expected_rot, atol=1e-5)
    # the pose reader re-derives euler from the matrix via the custom
    # extraction (BatchMultiBevGen.cpp:381-460), giving the conventional yaw
    poses = read_keyframe_poses(os.path.join(out, "keyframe_pose.csv"))
    for _, pose in poses:
        assert pose.yaw == pytest.approx(-0.8, abs=1e-4)


def test_mulran_stamp_outside_gt_skipped(tmp_path):
    """A cloud stamp with no bracketing GT pose logs the reference's error
    and is skipped (MulRanPointCloudSelect.cpp monotone cursor miss)."""
    from pctpu.pipelines.selectors import run_mulran_select

    from .fixtures import make_mulran_tree

    root = str(tmp_path)
    make_mulran_tree(root, num_frames=5)
    stamp_file = os.path.join(root, "sensor_data", "ouster_front_stamp.csv")
    orphan = 9_000_000_000  # far beyond the last GT stamp
    with open(stamp_file, "a") as f:
        f.write(f"{orphan}\n")
    np.zeros(4096 * 4, np.float32).tofile(
        os.path.join(root, "sensor_data", "Ouster", f"{orphan:010d}.bin"))

    n = run_mulran_select(root, 2.0)
    assert n == 5  # the orphan never becomes a keyframe


def test_oxford_missing_cloud_skipped(tmp_path):
    """A selected keyframe whose .bin is missing logs 'Failed to open point
    cloud file' and is skipped (OxfordPointCloudSelect.cpp open failure)."""
    from pctpu.pipelines.selectors import run_oxford_select

    from .fixtures import make_oxford_tree

    root = str(tmp_path)
    make_oxford_tree(root, num_frames=5)
    bins = sorted(os.listdir(os.path.join(root, "velodyne_left")))
    os.remove(os.path.join(root, "velodyne_left", bins[2]))

    # pose row still written and counted; only the victim's pcd is missing
    # (same contract as the mulran missing-cloud case)
    n = run_oxford_select(root, 2.0)
    assert n == 5
    cloud_dir = os.path.join(root, "selected_keyframes_2.00m",
                             "keyframe_point_cloud")
    written = sorted(os.listdir(cloud_dir))
    assert len(written) == 4 and "000002.pcd" not in written


def test_kitti_pose_count_mismatch_raises(tmp_path):
    """Pose/cloud count disagreement is a hard error, reference message
    preserved (KittiPointCloudSelect.cpp:427-430)."""
    import pytest

    from pctpu.pipelines.selectors import run_kitti_select

    from .fixtures import make_kitti_tree

    root = str(tmp_path)
    make_kitti_tree(root, num_frames=4)
    times = os.path.join(root, "times.txt")
    lines = open(times).read().strip().split("\n")
    open(times, "w").write("\n".join(lines[:-1]) + "\n")
    with pytest.raises(ValueError, match="do NOT agree"):
        run_kitti_select(root, 2.0)


# --- the dead raw-variant KITTI selector ------------------------------------


def test_kitti_raw_structuring_matches_oracle():
    """Vectorized raw structuring (assign_rings_raw + structure_cloud) is
    byte-identical to the plain-loop transcription of
    KittiRawPointCloudSelect.cpp:155-206, including spurious unguarded
    rings, >64-ring overflow drops, and the never-assigned point 0."""
    from pctpu.io import kitti

    from .fixtures import synth_kitti_scan
    from .ref_impl import kitti_raw_structured_ref

    rng = np.random.default_rng(11)
    scans = [
        synth_kitti_scan(rng),                       # clean sweeps
        rng.normal(0, 20, (4000, 4)).astype(np.float32),  # noisy: many rings
        synth_kitti_scan(rng, rings=70, per_ring=40),     # ring overflow >64
        np.zeros((0, 4), np.float32),                # empty .bin
    ]
    # negative-start scan: first azimuth <= 0 → ring starts at -1
    neg = synth_kitti_scan(rng)
    neg[0, :2] = [1.0, -0.5]
    scans.append(neg)
    for scan in scans:
        got = kitti.structure_cloud(scan, rings=kitti.assign_rings_raw(scan))
        want = kitti_raw_structured_ref(scan)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_kitti_raw_select_e2e(tmp_path):
    from pctpu.pipelines.selectors import run_kitti_raw_select

    from .fixtures import make_kitti_raw_tree

    root = str(tmp_path / "kraw")
    make_kitti_raw_tree(root, num_frames=5, spacing=3.0)
    n = run_kitti_raw_select(root)
    assert n == 5  # per-step shuffled-coords distance ~3.16 m > fixed 2 m
    out = os.path.join(root, "selected_keyframes")
    cloud_dir = os.path.join(out, "keyframe_point_cloud")
    files = sorted(os.listdir(cloud_dir))
    assert files == [f"{i:06d}.pcd" for i in range(5)]
    data, meta = read_pcd(os.path.join(cloud_dir, "000000.pcd"))
    assert meta["points"] == 64 * 2083
    filled = data["label"] == -2
    assert filled.any()
    assert np.all(data["intensity"][filled] == -1.0)

    # pose rows: x,y,z,roll,pitch,yaw at %.6f — no index, no rotation cols;
    # x/y/z shuffled from T(0,3)/T(2,3)/T(1,3) and eulers from
    # eulerAngles(2,1,0)
    lines = open(os.path.join(out, "keyframe_pose.csv")).read().strip().split("\n")
    assert len(lines) == 5
    for i, ln in enumerate(lines):
        parts = ln.split(",")
        assert len(parts) == 6
        assert all("." in p for p in parts)  # %.6f fixed format
        x, y, z, roll, pitch, yaw = map(float, parts)
        assert x == pytest.approx(3.0 * i, abs=1e-5)
        assert y == pytest.approx(5.0, abs=1e-5)       # T(2,3)
        assert z == pytest.approx(10.0 + i, abs=1e-5)  # T(1,3)
        assert yaw == pytest.approx(0.04 * i, abs=1e-5)
        assert roll == pytest.approx(0.0, abs=1e-5)

    # rerunning always recreates the output tree (the reference rm -r's it)
    assert run_kitti_raw_select(root) == 5


def test_kitti_raw_missing_bin_writes_empty_cloud(tmp_path):
    """A missing .bin saves an EMPTY cloud after a stderr complaint
    (KittiRawPointCloudSelect.cpp:135-138 returns the unfilled cloud) —
    unlike the live selector, nothing is skipped."""
    from pctpu.pipelines.selectors import run_kitti_raw_select

    from .fixtures import make_kitti_raw_tree

    root = str(tmp_path / "kraw")
    make_kitti_raw_tree(root, num_frames=4)
    os.remove(os.path.join(root, "velodyne", "000002.bin"))
    assert run_kitti_raw_select(root) == 4
    cloud_dir = os.path.join(root, "selected_keyframes", "keyframe_point_cloud")
    assert sorted(os.listdir(cloud_dir)) == [f"{i:06d}.pcd" for i in range(4)]
    data, meta = read_pcd(os.path.join(cloud_dir, "000002.pcd"))
    assert meta["points"] == 0 and len(data["x"]) == 0


def test_kitti_raw_cli(tmp_path, capsys):
    from pctpu.cli.kitti_raw_point_cloud_select import main

    from .fixtures import make_kitti_raw_tree

    root = str(tmp_path / "kraw")
    make_kitti_raw_tree(root, num_frames=3)
    assert main([root]) == 0
    assert os.path.isdir(os.path.join(root, "selected_keyframes"))
    with pytest.raises(SystemExit):
        main([])
