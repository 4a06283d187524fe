"""Capstone integration scenario: the complete reference workflow on ONE
geometrically consistent synthetic drive with known ground truth.

A ray-cast MulRan world (flat ground + cylindrical buildings, persistent
across frames — tests/fixtures.make_mulran_raycast_world) flows through every
tool the way a FreSCo data-prep user chains them
(/root/reference/README.md:23-30):

  mulran_point_cloud_select  →  keyframe PCDs + interpolated pose csv
  batch_multi_bev_gen        →  ground labels, BEVs, keyframe labels
  batch_top_part_registration →  relative poses + success classification

and every stage is checked against the scenario's ground truth:

  * pose interpolation lands exactly on the true constant-rate ego poses;
  * ground marking genuinely fires on the geometry (flat-ground ring pairs
    pass the 10° slope test, walls fail it) — unlike the random-scan
    fixtures, where labels exercise only the arithmetic;
  * the multi-BEV contains the buildings, the single BEV the ground ring
    structure;
  * registration of overlapping keyframe pairs recovers the TRUE relative
    pose inside the north-star window (<0.5° yaw, BASELINE.json:5), and a
    low-overlap (backward-looking) pair is correctly classified failed by
    the reference's fitness > 1.5 gate
    (/root/reference/BatchTopPartRegistration.cpp:508-510).
"""

import math
import os

import numpy as np
import pytest

from .fixtures import make_mulran_raycast_world


def _pose_mat(x, y, yaw):
    m = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    m[0, 3], m[1, 3] = x, y
    return m


@pytest.fixture(scope="module")
def scenario(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("drive"))
    gt = make_mulran_raycast_world(root, num_frames=5)
    return root, gt


@pytest.mark.slow
def test_full_toolchain_scenario(scenario):
    root, gt = scenario
    from pctpu.io.pcd import read_pcd
    from pctpu.io.poses import read_keyframe_poses
    from pctpu.pipelines.multi_bev import run_multi_bev
    from pctpu.pipelines.registration import run_batch_top_part_registration
    from pctpu.pipelines.selectors import run_mulran_select

    # --- selection: frame 0 sits on the origin sentinel, the rest pass the
    # 2 m gate (2.205 m spacing) ------------------------------------------------
    n = run_mulran_select(root, 2.0)
    assert n == 4
    tree = os.path.join(root, "selected_keyframes_2.00m")
    entries = read_keyframe_poses(os.path.join(tree, "keyframe_pose.csv"))
    assert [src for src, _ in entries] == [1, 2, 3, 4]

    # interpolated poses land exactly on the true constant-rate ego poses
    # (linear position lerp + constant-rate quaternion slerp are both exact)
    for src, pose in entries:
        tx, ty, tyaw = gt["poses"][src]
        assert abs(pose.x - tx) < 1e-4 and abs(pose.y - ty) < 1e-4
        assert abs(pose.yaw - tyaw) < 1e-5

    # --- BEV generation: ground marking fires on real geometry ----------------
    out = run_multi_bev(tree, "OS1_64", batch_size=2, write_pngs=False)
    assert out.num_clouds == 4

    ng, _ = read_pcd(os.path.join(tree, "non_ground_point_cloud", "000000.pcd"))
    lab = ng["label"].astype(np.int32)
    real = ng["intensity"] > 0.05  # rendered returns (empty slots carry 0)
    n_ground = int(((lab == 0) & real).sum())
    n_obstacle = int(((lab != 0) & real).sum())
    # the wedge renders ~half ground rays / half wall+sky; the slope test
    # must label the flat ground and spare the walls
    assert n_ground > 3000, f"ground marking barely fired: {n_ground}"
    assert n_obstacle > 1500, f"walls were swallowed as ground: {n_obstacle}"

    blob = open(
        os.path.join(tree, "output_multi_bev", "binary", "000000.bin"), "rb"
    ).read()
    multi = np.frombuffer(blob, np.uint8).reshape(24, 224, 224)
    assert int((multi > 0).sum()) > 100  # building walls occupy the layers

    labels_csv = open(os.path.join(tree, "keyframe_label.csv")).read()
    rows = labels_csv.strip().split("\n")
    assert len(rows) == 4
    for row in rows:
        vals = [float(v) for v in row.split(",") if v]
        assert abs(sum(vals) - 1.0) < 1e-5

    # --- registration vs ground truth -----------------------------------------
    # keyframe k holds source frame k+1; query-later-onto-match-earlier pairs
    # overlap (the wedge sweeps forward), the reversed pair does not
    pairs = [(2, 0), (3, 1), (0, 2)]  # last = low-overlap failure case

    def rel(qk, mk):
        q_src, m_src = entries[qk][0], entries[mk][0]
        pq = _pose_mat(*gt["poses"][q_src])
        pm = _pose_mat(*gt["poses"][m_src])
        return np.linalg.inv(pm) @ pq

    match_file = os.path.join(root, "match_result.txt")
    with open(match_file, "w") as f:
        for qk, mk in pairs:
            t_gt = rel(qk, mk)
            guess = math.degrees(math.atan2(t_gt[1, 0], t_gt[0, 0])) + 2.0
            f.write(f"{qk} {mk} {guess:.3f}\n")

    reports = run_batch_top_part_registration(
        match_file,
        os.path.join(tree, "non_ground_point_cloud"),
        report_path=os.path.join(root, "icp_precision_report.txt"),
        flat_cap=4096,
    )
    assert len(reports) == 3

    for (qk, mk), rep in zip(pairs[:2], reports[:2]):
        assert rep.success, f"pair {qk}->{mk}: fitness {rep.fitness_fine}"
        t_gt = rel(qk, mk)
        tf = rep.transform_fine
        yaw_err = abs(
            (math.degrees(
                math.atan2(tf[1, 0], tf[0, 0])
                - math.atan2(t_gt[1, 0], t_gt[0, 0])
            ) + 180.0) % 360.0 - 180.0
        )
        t_err = float(np.hypot(tf[0, 3] - t_gt[0, 3], tf[1, 3] - t_gt[1, 3]))
        # the north-star acceptance window (BASELINE.json:5)
        assert yaw_err < 0.5, f"pair {qk}->{mk}: yaw error {yaw_err}°"
        assert t_err < 0.30, f"pair {qk}->{mk}: translation error {t_err} m"

    # the backward pair maps query wedge content outside the match's field of
    # view; its fine fitness (mean squared NN over ALL voxeled source points)
    # exceeds the reference's 1.5 gate even though the TRANSFORM it found is
    # good — exactly how the reference classifies low-overlap pairs
    assert not reports[2].success
    assert reports[2].fitness_fine > 1.5

    # the report file carries one "diff_xy diff_yaw" line per SUCCESS
    report_lines = (
        open(os.path.join(root, "icp_precision_report.txt")).read().strip()
    )
    assert len(report_lines.split("\n")) == 2


@pytest.mark.slow
def test_oxford_toolchain_scenario(tmp_path_factory):
    """The Oxford ingest path on a consistent ray-cast drive: the transposed
    upside-down .bin layout, elevation-derived rows, and the header-swapped
    yaw token are validated JOINTLY by ground-truth registration — a missing
    upside-down flip is a 180° rotation about y and would negate every
    relative yaw; a wrong euler/token convention shifts the interpolated
    poses.  (/root/reference/OxfordPointCloudSelect.cpp:146-267)"""
    from tests.fixtures import make_oxford_raycast_world

    from pctpu.io.pcd import read_pcd
    from pctpu.io.poses import read_keyframe_poses
    from pctpu.pipelines.multi_bev import run_multi_bev
    from pctpu.pipelines.registration import run_batch_top_part_registration
    from pctpu.pipelines.selectors import run_oxford_select

    root = str(tmp_path_factory.mktemp("oxdrive"))
    gt = make_oxford_raycast_world(root, num_frames=5)
    n = run_oxford_select(root, 2.0)
    assert n == 5  # easting ~6e5 is far from the origin sentinel
    tree = os.path.join(root, "selected_keyframes_2.00m")
    entries = read_keyframe_poses(os.path.join(tree, "keyframe_pose.csv"))
    assert [src for src, _ in entries] == [0, 1, 2, 3, 4]
    for src, pose in entries:
        tx, ty, tyaw = gt["poses"][src]
        # positions are f32 at UTM magnitude (ulp ~0.03 m at 6e5)
        assert abs(pose.x - tx) < 0.08 and abs(pose.y - ty) < 0.08
        assert abs(pose.yaw - tyaw) < 1e-5

    out = run_multi_bev(tree, "HDL_32E", batch_size=2, write_pngs=False)
    assert out.num_clouds == 5
    ng, _ = read_pcd(os.path.join(tree, "non_ground_point_cloud", "000000.pcd"))
    lab = ng["label"].astype(np.int32)
    real = ng["intensity"] > 0.05
    assert int(((lab == 0) & real).sum()) > 1500  # ground marking fired
    assert int(((lab != 0) & real).sum()) > 800   # walls spared

    pairs = [(2, 0), (3, 1)]
    match_file = os.path.join(root, "match_result.txt")

    def rel(qk, mk):
        pq = _pose_mat(*gt["poses"][entries[qk][0]])
        pm = _pose_mat(*gt["poses"][entries[mk][0]])
        return np.linalg.inv(pm) @ pq

    with open(match_file, "w") as f:
        for qk, mk in pairs:
            t_gt = rel(qk, mk)
            guess = math.degrees(math.atan2(t_gt[1, 0], t_gt[0, 0])) + 2.0
            f.write(f"{qk} {mk} {guess:.3f}\n")
    reports = run_batch_top_part_registration(
        match_file, os.path.join(tree, "non_ground_point_cloud"),
        report_path=os.path.join(root, "icp_precision_report.txt"),
        flat_cap=4096,
    )
    for (qk, mk), rep in zip(pairs, reports):
        assert rep.success, f"pair {qk}->{mk}: fitness {rep.fitness_fine}"
        t_gt = rel(qk, mk)
        tf = rep.transform_fine
        yaw_err = abs(
            (math.degrees(
                math.atan2(tf[1, 0], tf[0, 0])
                - math.atan2(t_gt[1, 0], t_gt[0, 0])
            ) + 180.0) % 360.0 - 180.0
        )
        t_err = float(np.hypot(tf[0, 3] - t_gt[0, 3], tf[1, 3] - t_gt[1, 3]))
        assert yaw_err < 0.5, f"pair {qk}->{mk}: yaw error {yaw_err}°"
        assert t_err < 0.30, f"pair {qk}->{mk}: translation error {t_err} m"


@pytest.mark.slow
def test_scenario_manip_and_pca_tools(scenario, tmp_path):
    """The remaining user-facing tools on the same drive: cloud_manip's
    transform+float-BEV against the native C++ oracle on the transformed
    points, and the 3-D PCA demo's filter semantics on real geometry."""
    root, _ = scenario
    tree = os.path.join(root, "selected_keyframes_2.00m")
    src_pcd = os.path.join(tree, "non_ground_point_cloud", "000000.pcd")
    if not os.path.exists(src_pcd):  # allow standalone -k runs
        pytest.skip("scenario BEV stage has not run")

    from pctpu.pipelines.cloud_manip import run_cloud_manip

    out = run_cloud_manip(src_pcd, 1.5, -2.0, 0.0, 10.0,
                          output_dir=str(tmp_path))
    assert set(out) == {"input", "output"}
    written = sorted(os.listdir(tmp_path))
    assert any(w.endswith("_output.csv") for w in written)
    # the output BEV must differ from the input (the transform moved things)
    assert not np.array_equal(out["input"], out["output"])

    from . import native_oracle

    if native_oracle.available():
        from pctpu.io.pcd import read_pcd

        data, _ = read_pcd(src_pcd)
        xyz = np.stack([data["x"], data["y"], data["z"]], 1).astype(np.float32)
        nat_in = native_oracle.float_bev(
            xyz, data["label"].astype(np.int32), filter_ground=False
        )
        np.testing.assert_array_equal(out["input"], nat_in)

    from pctpu.io.pcd import load_cloud_pcd
    from pctpu.ops.pca import pca3d, pca_test_filter

    cloud = load_cloud_pcd(src_pcd, 65536)
    # main.cpp:60-74 filter keeps z >= 0, range <= 30, label > 0 — the demo
    # expects positively-labeled clouds, so relabel the non-ground points the
    # way a downstream labeling consumer would; the filter then isolates the
    # upper wall returns of the near building
    cloud = cloud.replace(
        label=np.where(np.asarray(cloud.label) == -2, 1, 0).astype(np.int32)
    )
    xyz, keep = pca_test_filter(cloud)
    assert int(np.asarray(keep).sum()) > 50
    mean, evals, _ = pca3d(xyz, keep)
    assert np.all(np.isfinite(np.asarray(mean)))
    evals = np.asarray(evals)  # ascending, like Eigen's SelfAdjointEigenSolver
    assert 0 <= evals[0] <= evals[1] <= evals[2]
