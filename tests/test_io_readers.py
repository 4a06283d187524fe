"""Differential tests for the dataset .bin readers (vs literal loop oracles)."""

import numpy as np

from pctpu.io import kitti, mulran, oxford

from .fixtures import synth_kitti_scan


def kitti_rings_oracle(points):
    """Literal transcription of the ring/col loop
    (/root/reference/KittiPointCloudSelect.cpp:188-243)."""
    n = len(points)
    az = np.empty(n, np.float32)
    for i in range(n):
        az[i] = np.float32(
            float(np.arctan2(np.float32(points[i, 1]), np.float32(points[i, 0])))
            / np.pi
            * 180.0
        )
    ring = 0 if az[0] > 0 else -1
    num = 0
    rows = np.full(n, -1, np.int32)
    cols = np.zeros(n, np.int32)
    for i in range(1, n):
        if az[i - 1] <= 0 and az[i] > 0:
            if ring == -1:
                ring = 0
                num = 0
            elif num > kitti.HORIZON_SCAN * np.float32(0.60):
                ring += 1
                num = 0
        a = az[i]
        if a >= 360.0:
            a = np.float32(a - np.float32(360.0))
        elif a < 0:
            a = np.float32(a + np.float32(360.0))
        col = int(np.floor(float(a) / (360.0 / kitti.HORIZON_SCAN) + 0.5)) if a >= 0 else 0
        if 0 <= ring < kitti.N_SCAN:
            if col >= kitti.HORIZON_SCAN:
                col -= kitti.HORIZON_SCAN
            elif col < 0:
                col += kitti.HORIZON_SCAN
            rows[i] = ring
            cols[i] = col
        num += 1
    return rows, cols


def test_kitti_ring_assignment_matches_oracle():
    rng = np.random.default_rng(0)
    scan = synth_kitti_scan(rng, rings=4, per_ring=1300)
    rows_ref, cols_ref = kitti_rings_oracle(scan)
    rows, cols, assigned = kitti.assign_rings(scan)
    ref_assigned = rows_ref >= 0
    np.testing.assert_array_equal(assigned, ref_assigned)
    np.testing.assert_array_equal(rows[assigned], rows_ref[ref_assigned])
    np.testing.assert_array_equal(cols[assigned], cols_ref[ref_assigned])


def test_kitti_structure_cloud_quirk():
    rng = np.random.default_rng(1)
    scan = synth_kitti_scan(rng, rings=3, per_ring=1300)
    fields = kitti.structure_cloud(scan)
    assigned = fields["label"] == -2
    assert assigned.sum() > 1000
    # the reference overwrites intensity with -1 on every structured point
    assert np.all(fields["intensity"][assigned] == -1.0)
    assert np.all(fields["intensity"][~assigned] == 0.0)
    # keep_intensity preserves the original values instead
    fields2 = kitti.structure_cloud(scan, keep_intensity=True)
    assert np.all(fields2["intensity"][fields2["label"] == -2] >= 0.0)


def test_kitti_first_point_never_assigned():
    rng = np.random.default_rng(2)
    scan = synth_kitti_scan(rng, rings=2, per_ring=1300)
    _, _, assigned = kitti.assign_rings(scan)
    assert not assigned[0]  # loop starts at i=1 (:212)


def test_mulran_reader(tmp_path):
    rng = np.random.default_rng(3)
    n = 2000
    pts = np.stack(
        [
            rng.uniform(-50, 50, n),
            rng.uniform(-50, 50, n),
            rng.uniform(-3, 10, n),
            rng.random(n),
        ],
        axis=1,
    ).astype(np.float32)
    path = str(tmp_path / "cloud.bin")
    pts.tofile(path)
    fields = mulran.read_bin(path)
    np.testing.assert_array_equal(fields["x"], pts[:, 0])
    np.testing.assert_array_equal(fields["intensity"], pts[:, 3])
    np.testing.assert_array_equal(fields["row"], np.arange(n) % 64)
    assert np.all(fields["label"] == -2)
    # col formula spot-check against the loop semantics
    i = 7
    az = float(np.float32(np.arctan2(pts[i, 1], pts[i, 0]).astype(np.float64) / np.pi * 180.0))
    if az < 0:
        az += 360.0
    expect = int(np.floor(np.float32(az) / np.float32(360.0) * np.float32(1024) + 0.5))
    assert fields["col"][i] == expect


def test_oxford_reader_transposed_layout(tmp_path):
    rng = np.random.default_rng(4)
    n = 500
    x = rng.uniform(-30, 30, n).astype(np.float32)
    y = rng.uniform(-30, 30, n).astype(np.float32)
    z = rng.uniform(-5, 5, n).astype(np.float32)
    i = rng.random(n).astype(np.float32)
    path = str(tmp_path / "cloud.bin")
    np.concatenate([x, y, z, i]).tofile(path)  # columnwise layout
    fields = oxford.read_bin(path)
    # upside-down fix: x and z negated
    np.testing.assert_array_equal(fields["x"], -x)
    np.testing.assert_array_equal(fields["y"], y)
    np.testing.assert_array_equal(fields["z"], -z)
    np.testing.assert_array_equal(fields["intensity"], i)
    assert fields["row"].min() >= 0 and fields["row"].max() <= 31
    assert fields["col"].max() < 1056


def test_mulran_pose_csv(tmp_path):
    # 13-field rows, out of order → sorted by stamp
    rows = [
        "200,1,0,0,5.0,0,1,0,6.0,0,0,1,7.0",
        "100,1,0,0,1.0,0,1,0,2.0,0,0,1,3.0",
    ]
    path = str(tmp_path / "global_pose.csv")
    open(path, "w").write("\n".join(rows) + "\n")
    stamps, mats = mulran.read_global_poses(path)
    np.testing.assert_array_equal(stamps, [100, 200])
    np.testing.assert_allclose(mats[0][:3, 3], [1, 2, 3])
    np.testing.assert_allclose(mats[1][:3, 3], [5, 6, 7])


def test_pose_csv_short_row_stops_scan_with_message(tmp_path, capsys):
    """readKeyframePose parity: a row with != 16 tokens prints the reference's
    stderr message and stops the scan (BatchMultiBevGen.cpp:415-419)."""
    from pctpu.io.poses import read_keyframe_poses

    p = tmp_path / "keyframe_pose.csv"
    good = ("000000,1.0,2.0,3.0,0,0,0,"
            "1.0,0.0,0.0,0.0,1.0,0.0,0.0,0.0,1.0\n")
    p.write_text(good + "000001,1.0,2.0\n" + good)
    entries = read_keyframe_poses(str(p))
    assert len(entries) == 1  # scan stopped at the malformed row
    assert "while expecting 16" in capsys.readouterr().err


def test_match_results_short_row_raises(tmp_path):
    from pctpu.pipelines.registration import load_match_results

    p = tmp_path / "match_result.txt"
    p.write_text("0 1 10.0\n\n1 2\n")
    try:
        load_match_results(str(p))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "line 3" in str(e)
    p.write_text("0 1 10.0\n\n2 3 20.0\n")  # empty lines skipped
    assert len(load_match_results(str(p))) == 2
