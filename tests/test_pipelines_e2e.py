"""End-to-end pipeline tests over a miniature KITTI-layout tree (CPU jax)."""

import os

import numpy as np
import pytest

from pctpu.io.pcd import read_pcd
from pctpu.io.png import read_gray_png
from pctpu.io.poses import read_keyframe_poses

from .fixtures import make_kitti_tree


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    make_kitti_tree(root, num_frames=5, spacing=3.0)
    return root


@pytest.fixture(scope="module")
def selected_tree(kitti_tree):
    from pctpu.pipelines.selectors import run_kitti_select

    n = run_kitti_select(kitti_tree, 2.0)
    assert n == 5  # 3 m spacing > 2 m gate keeps every frame
    return os.path.join(kitti_tree, "selected_keyframes_2.00m")


def test_kitti_select_outputs(selected_tree):
    files = sorted(os.listdir(os.path.join(selected_tree, "keyframe_point_cloud")))
    assert files == [f"{i:06d}.pcd" for i in range(5)]
    data, meta = read_pcd(
        os.path.join(selected_tree, "keyframe_point_cloud", "000000.pcd")
    )
    assert meta["points"] == 64 * 2083
    # the KITTI intensity=-1 quirk on assigned points
    assigned = data["label"] == -2
    assert assigned.sum() > 1000
    assert np.all(data["intensity"][assigned] == -1.0)
    poses = read_keyframe_poses(os.path.join(selected_tree, "keyframe_pose.csv"))
    assert len(poses) == 5
    assert poses[0][0] == 0
    # lidar poses: x advances ~3 m per frame
    assert poses[1][1].x == pytest.approx(3.0, abs=1e-3)
    fmt = open(os.path.join(selected_tree, "keyframe_pose_format.csv")).read()
    assert fmt.startswith("cloud_idx, x, y, z, roll, pitch, yaw,")


def test_pose_entry_format_is_reference_exact(selected_tree):
    line = open(os.path.join(selected_tree, "keyframe_pose.csv")).readline().rstrip("\n")
    fields = line.split(",")
    assert len(fields) == 16
    assert fields[0] == "000000"
    for v in fields[1:]:
        assert "." in v and len(v.split(".")[1]) == 6  # {:.6f}


@pytest.mark.slow
def test_multi_bev_pipeline_e2e(selected_tree):
    from pctpu.pipelines.multi_bev import run_multi_bev

    out = run_multi_bev(selected_tree, "HDL_64E", batch_size=2, write_pngs=True)
    assert out.num_clouds == 5

    # the reported [TIME] average covers the reference's span (device compute
    # + BEV writeback, /root/reference/BatchMultiBevGen.cpp:731-749): the
    # async-writer time must be measured into it, not dropped
    assert out.avg_bev_write_ms_per_cloud > 0.0
    assert out.avg_device_ms_per_cloud > 0.0
    assert out.avg_ms_per_cloud == pytest.approx(
        out.avg_device_ms_per_cloud + out.avg_bev_write_ms_per_cloud
    )

    bin_dir = os.path.join(selected_tree, "output_multi_bev", "binary")
    bins = sorted(os.listdir(bin_dir))
    assert bins == [f"{i:06d}.bin" for i in range(5)]
    blob = open(os.path.join(bin_dir, "000000.bin"), "rb").read()
    assert len(blob) == 24 * 224 * 224
    multi = np.frombuffer(blob, np.uint8).reshape(24, 224, 224)
    assert set(np.unique(multi)) <= {0, 255}
    assert multi.sum() > 0  # KITTI quirk: ground never labeled → points present

    # per-layer pngs decode to the bin layers
    img_dir = os.path.join(selected_tree, "output_multi_bev", "image", "000000")
    for layer in (0, 7, 23):
        png = read_gray_png(os.path.join(img_dir, f"{layer:02d}.png"))
        assert np.array_equal(png, multi[layer])

    single_png = read_gray_png(
        os.path.join(selected_tree, "output_single_bev", "image", "000000.png")
    )
    csv_text = open(
        os.path.join(selected_tree, "output_single_bev", "csv", "000000.csv")
    ).read()
    csv_mat = np.array(
        [[int(v) for v in row.split(",")] for row in csv_text.strip().split("\n")],
        np.uint8,
    )
    assert np.array_equal(csv_mat, single_png)

    # non-ground cloud: full ordered grid, nothing deleted
    data, meta = read_pcd(
        os.path.join(selected_tree, "non_ground_point_cloud", "000000.pcd")
    )
    assert meta["points"] == 64 * 2083

    # labels: 5 keyframes over ~12 m → exactly 1 major frame (20 m interval)
    label_rows = open(os.path.join(selected_tree, "keyframe_label.csv")).read().strip().split("\n")
    assert len(label_rows) == 5
    assert out.num_major_frames == 1
    for row in label_rows:
        assert row.endswith(",")  # trailing comma (saveLabels :654)
        vals = [float(v) for v in row.split(",") if v]
        assert vals and abs(sum(vals) - 1.0) < 1e-5


@pytest.mark.slow
def test_multi_bev_resume_skips_existing(selected_tree):
    from pctpu.pipelines.multi_bev import run_multi_bev

    out = run_multi_bev(selected_tree, "HDL_64E", batch_size=2, resume=True)
    assert out.num_clouds == 0  # everything already produced


def test_cloud_manip_e2e(tmp_path):
    from pctpu.io.pcd import write_pcd
    from pctpu.pipelines.cloud_manip import run_cloud_manip

    from . import ref_impl

    rng = np.random.default_rng(1)
    n = 400
    pts = {
        "x": rng.uniform(-90, 90, n).astype(np.float32),
        "y": rng.uniform(-90, 90, n).astype(np.float32),
        "z": rng.uniform(-2, 5, n).astype(np.float32),
        "intensity": rng.random(n).astype(np.float32),
        "row": np.zeros(n, np.uint16),
        "col": np.zeros(n, np.uint16),
        "t": np.zeros(n, np.uint32),
        "label": np.full(n, -2, np.int16),
    }
    pcd = str(tmp_path / "scan.pcd")
    write_pcd(pcd, pts)
    bevs = run_cloud_manip(pcd, 1.0, 2.0, 0.0, 30.0, output_dir=str(tmp_path))

    cloud_dicts = [
        {"x": float(pts["x"][i]), "y": float(pts["y"][i]), "z": float(pts["z"][i]), "label": -2}
        for i in range(n)
    ]
    ref_in = ref_impl.float_bev_ref(cloud_dicts, filter_ground=False)
    np.testing.assert_allclose(bevs["input"], ref_in, atol=0)

    # output BEV equals the oracle rasterization of the device-transformed
    # points (read back from the written pcd, avoiding f32 FMA-order
    # differences between host emulation and the device matmul)
    from pctpu.io.pcd import read_pcd

    out_data, _ = read_pcd(str(tmp_path / "scan.pcd_output.pcd"))
    tx = [
        {"x": float(out_data["x"][i]), "y": float(out_data["y"][i]),
         "z": float(out_data["z"][i]), "label": -2}
        for i in range(n)
    ]
    ref_out = ref_impl.float_bev_ref(tx, filter_ground=False)
    np.testing.assert_allclose(bevs["output"], ref_out, atol=0)

    # geometric sanity of the transform itself (loose tolerance)
    th = 30.0 / 180.0 * np.pi
    expect_x = np.cos(th) * pts["x"] - np.sin(th) * pts["y"] + 1.0
    np.testing.assert_allclose(out_data["x"], expect_x, atol=1e-3)

    for suffix in ("_input.csv", "_input.csv.png", "_output.csv", "_output.csv.png",
                   "_input.pcd", "_output.pcd"):
        assert os.path.exists(str(tmp_path / ("scan.pcd" + suffix)))


def test_pose_format_file_is_byte_exact(tmp_path):
    from pctpu.io.poses import write_pose_format_file

    p = str(tmp_path / "keyframe_pose_format.csv")
    write_pose_format_file(p)
    content = open(p).read()
    # exact line-spliced C++ literal incl. 13-space runs
    assert content == (
        "cloud_idx, x, y, z, roll, pitch, yaw, "
        "             rotation_matrix(0 0), rotation_matrix(0 1), rotation_matrix(0 2), "
        "             rotation_matrix(1 0), rotation_matrix(1 1), rotation_matrix(1 2), "
        "             rotation_matrix(2 0), rotation_matrix(2 1), rotation_matrix(2 2)\n"
    )


def test_batch_cloud_manip_pipeline_e2e(tmp_path, monkeypatch):
    """In-process run_batch_cloud_manip: every output artifact byte-equals
    the unbatched per-op composition (catches batch-stacking / writer /
    tail-padding plumbing), plus resume semantics keyed on the labeled pcd
    (/root/reference/BatchCloudManip.cpp:269-335).

    The sensor constant is shrunk for speed; the real hardcoded HDL-64E
    constant path is driven by test_parity_harness's subprocess CLI test."""
    import jax.numpy as jnp

    import pctpu.pipelines.batch_cloud_manip as bcm
    from pctpu.cloud import Cloud, make_cloud
    from pctpu.config import FloatBevConfig, GroundConfig, SensorParams
    from pctpu.io.csvfmt import write_csv
    from pctpu.io.pcd import save_cloud_pcd
    from pctpu.io.png import write_gray_png
    from pctpu.ops.bev import float_bev
    from pctpu.ops.ground import mark_ground
    from pctpu.ops.ordering import get_ordered_cloud
    from pctpu.runtime.loader import load_xyzirct_arrays

    small = SensorParams(n_scan=16, horizon_scan=64, ground_upper_scan=10,
                         height_res=0.5)
    monkeypatch.setattr(bcm, "HDL64E", small)

    root = tmp_path / "tree"
    in_dir = root / "keyframe_point_cloud"
    in_dir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    for i in range(3):  # 3 clouds at batch_size=2 exercises the padded tail
        n = 250
        xyz = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
        xyz[:, 2] = rng.uniform(-2.2, 3.0, n).astype(np.float32)
        c = make_cloud(
            xyz,
            intensity=rng.random(n).astype(np.float32),
            row=rng.integers(0, small.n_scan, n).astype(np.int32),
            col=rng.integers(0, small.horizon_scan, n).astype(np.int32),
            label=np.full(n, -2, np.int32),
        )
        save_cloud_pcd(str(in_dir / f"{i:06d}.pcd"), c)

    avg = bcm.run_batch_cloud_manip(str(root), batch_size=2)
    assert avg > 0.0

    from pctpu.io.pcd import read_pcd

    for i in range(3):
        short = f"{i:06d}"
        arrays = load_xyzirct_arrays(str(in_dir / (short + ".pcd")),
                                     small.grid_size)
        one = Cloud(
            xyz=jnp.asarray(arrays["xyz"]),
            intensity=jnp.asarray(arrays["intensity"]),
            row=jnp.asarray(arrays["row"]).astype(jnp.int32),
            col=jnp.asarray(arrays["col"]).astype(jnp.int32),
            t=jnp.asarray(arrays["t"]),
            label=jnp.asarray(arrays["label"]).astype(jnp.int32),
            count=jnp.asarray(arrays["count"]),
        )
        labeled, _ = mark_ground(get_ordered_cloud(one, small), small,
                                 GroundConfig())
        bev = np.asarray(float_bev(labeled, FloatBevConfig(filter_ground=True)))

        exp_csv = tmp_path / f"exp_{short}.csv"
        write_csv(str(exp_csv), bev)
        assert (root / "output_bvm" / (short + ".csv")).read_bytes() \
            == exp_csv.read_bytes()
        exp_png = tmp_path / f"exp_{short}.png"
        write_gray_png(str(exp_png), bev)
        assert (root / "output_bvm" / (short + ".png")).read_bytes() \
            == exp_png.read_bytes()

        data, meta = read_pcd(str(root / "non_ground_point_cloud" / (short + ".pcd")))
        assert meta["points"] == small.grid_size
        np.testing.assert_array_equal(
            data["label"], np.asarray(labeled.label).astype(np.int16))
        np.testing.assert_array_equal(data["x"], np.asarray(labeled.xyz)[:, 0])
        np.testing.assert_array_equal(
            data["intensity"], np.asarray(labeled.intensity))

    # resume: keyed on the last-written artifact (the labeled pcd) — only
    # the cloud whose pcd is missing re-runs, finished outputs stay untouched
    csv0 = root / "output_bvm" / "000000.csv"
    mtime0 = csv0.stat().st_mtime_ns
    (root / "non_ground_point_cloud" / "000002.pcd").unlink()
    bcm.run_batch_cloud_manip(str(root), batch_size=2, resume=True)
    assert (root / "non_ground_point_cloud" / "000002.pcd").exists()
    assert csv0.stat().st_mtime_ns == mtime0

    # without resume the existing output dirs are cleared and rebuilt
    bcm.run_batch_cloud_manip(str(root), batch_size=2)
    assert csv0.stat().st_mtime_ns > mtime0
