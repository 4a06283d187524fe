"""Headless viewer-snapshot rendering: projection, z-buffer, PNG, CLI."""


import numpy as np
import pytest

from pctpu.io.png import decode_rgb_png, encode_rgb_png
from pctpu.ops.render import Layer, render_snapshot, segment_points


def test_rgb_png_round_trip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    assert np.array_equal(decode_rgb_png(encode_rgb_png(img)), img)


def test_rgb_png_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    data = np.frombuffer(encode_rgb_png(img), np.uint8)
    decoded = cv2.imdecode(data, cv2.IMREAD_COLOR)  # BGR
    assert np.array_equal(decoded[:, :, ::-1], img)


def test_render_single_point_position():
    # one point at the center of a known extent lands mid-image
    img = render_snapshot(
        [Layer(np.array([[0.0, 0.0, 1.0]]), (255, 0, 0))],
        img_size=64, extent=(-10, 10, -10, 10), point_size=2,
        background=(0, 0, 0),
    )
    assert img.shape == (64, 64, 3)
    ys, xs = np.nonzero(img[:, :, 0])
    assert len(ys) == 4  # 2x2 splat
    assert abs(xs.mean() - 31.5) < 2 and abs(ys.mean() - 31.5) < 2


def test_render_v_axis_points_up():
    # +y in top view must appear in the UPPER half of the image (low rows)
    img = render_snapshot(
        [Layer(np.array([[0.0, 8.0, 0.0]]), (0, 255, 0))],
        img_size=64, extent=(-10, 10, -10, 10), background=(0, 0, 0),
    )
    ys, _ = np.nonzero(img[:, :, 1])
    assert ys.max() < 32


def test_render_depth_order_top_view():
    # same (x, y), different z: the higher point's layer must win
    low = Layer(np.array([[1.0, 1.0, 0.0]]), (255, 0, 0))
    high = Layer(np.array([[1.0, 1.0, 5.0]]), (0, 0, 255))
    img = render_snapshot([low, high], img_size=32, extent=(-5, 5, -5, 5),
                          background=(0, 0, 0))
    assert (img[:, :, 2] > 0).any() and not (img[:, :, 0] > 0).any()
    # and symmetrically with layers swapped
    img2 = render_snapshot([high, low], img_size=32, extent=(-5, 5, -5, 5),
                           background=(0, 0, 0))
    assert (img2[:, :, 2] > 0).any() and not (img2[:, :, 0] > 0).any()


def test_render_equal_depth_later_layer_wins():
    a = Layer(np.array([[0.0, 0.0, 1.0]]), (255, 0, 0))
    b = Layer(np.array([[0.0, 0.0, 1.0]]), (0, 255, 0))
    img = render_snapshot([a, b], img_size=32, extent=(-5, 5, -5, 5),
                          background=(0, 0, 0))
    assert (img[:, :, 1] > 0).any() and not (img[:, :, 0] > 0).any()


def test_render_front_view_uses_xz():
    # front view: u=x, v=z; point with big z should be near the top
    img = render_snapshot(
        [Layer(np.array([[0.0, 0.0, 9.0]]), (255, 255, 255))],
        img_size=64, view="front", extent=(-10, 10, -10, 10),
        background=(0, 0, 0),
    )
    ys, _ = np.nonzero(img[:, :, 0])
    assert ys.max() < 16


def test_render_masked_points_hidden():
    img = render_snapshot(
        [Layer(np.array([[0.0, 0.0, 0.0]]), (255, 0, 0),
               mask=np.array([False]))],
        img_size=32, extent=(-5, 5, -5, 5), background=(7, 9, 11),
    )
    assert np.array_equal(np.unique(img.reshape(-1, 3), axis=0),
                          [[7, 9, 11]])


def test_render_all_layers_empty_returns_background():
    img = render_snapshot(
        [Layer(np.zeros((0, 3), np.float32), (255, 0, 0))],
        img_size=16, background=(5, 6, 7),
    )
    assert np.array_equal(np.unique(img.reshape(-1, 3), axis=0), [[5, 6, 7]])


def test_render_out_of_extent_points_culled():
    # a far-away point must be culled, not clamped onto the border
    inside = Layer(np.array([[4.9, 0.0, 0.0]]), (0, 255, 0))
    outside = Layer(np.array([[100.0, 100.0, 50.0]]), (255, 0, 0))
    img = render_snapshot([inside, outside], img_size=32,
                          extent=(-5, 5, -5, 5), background=(0, 0, 0))
    assert not (img[:, :, 0] > 0).any()  # red never drawn
    assert (img[:, :, 1] > 0).any()


def test_segment_points_endpoints_and_density():
    pts = segment_points(np.array([[0.0, 0.0, 0.0]]),
                         np.array([[10.0, 0.0, 0.0]]))
    assert pts.shape[0] >= 2
    np.testing.assert_allclose(pts[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(pts[-1], [10, 0, 0], atol=1e-5)
    assert np.all(np.diff(pts[:, 0]) > 0)


def test_cloud_manip_snapshot_cli(tmp_path):
    from pctpu.cli.cloud_manip import main
    from pctpu.cloud import make_cloud
    from pctpu.io.pcd import save_cloud_pcd

    rng = np.random.default_rng(3)
    xyz = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
    pcd = tmp_path / "in.pcd"
    save_cloud_pcd(str(pcd), make_cloud(xyz))
    snap = tmp_path / "snap.png"
    rc = main([str(pcd), "5", "0", "0", "90",
               f"--output_dir={tmp_path}", f"--snapshot={snap}"])
    assert rc == 0 and snap.exists()
    img = decode_rgb_png(snap.read_bytes())
    # input red and output green both present, dark-gray background
    assert (np.all(img == (255, 0, 0), axis=-1)).any()
    assert (np.all(img == (0, 255, 0), axis=-1)).any()
    assert (np.all(img == (13, 13, 13), axis=-1)).any()


@pytest.mark.slow
def test_top_part_registration_snapshot_cli(tmp_path):
    from tests.test_registration_e2e import rigid, synth_scene

    from pctpu.cli.top_part_registration import main
    from pctpu.cloud import make_cloud
    from pctpu.io.pcd import save_cloud_pcd

    rng = np.random.default_rng(7)
    xyz, labels = synth_scene(rng)
    xyz2 = rigid(xyz, 15.0, [1.0, 0.0, 0.0])
    p1, p2 = tmp_path / "a.pcd", tmp_path / "b.pcd"
    save_cloud_pcd(str(p1), make_cloud(xyz, label=labels, capacity=4096))
    save_cloud_pcd(str(p2), make_cloud(xyz2, label=labels, capacity=4096))
    snap = tmp_path / "reg.png"
    rc = main([str(p1), str(p2), "15.0", "--flat_cap=4096",
               f"--snapshot={snap}"])
    assert rc == 0 and snap.exists()
    img = decode_rgb_png(snap.read_bytes())
    # red flat cloud + white normal whiskers on black
    assert (np.all(img == (255, 0, 0), axis=-1)).any()
    assert (np.all(img == (255, 255, 255), axis=-1)).any()
    assert (np.all(img == (0, 0, 0), axis=-1)).any()


def test_pca_test_snapshot_cli(tmp_path):
    from pctpu.cli.pointcloud_pca_test import main
    from pctpu.cloud import make_cloud
    from pctpu.io.pcd import save_cloud_pcd

    rng = np.random.default_rng(4)
    n = 400
    xyz = np.stack([rng.uniform(-20, 20, n), rng.uniform(-5, 5, n),
                    rng.uniform(0.5, 4.0, n)], 1).astype(np.float32)
    c = make_cloud(xyz, label=np.ones(n, np.int32))
    pcd = tmp_path / "in.pcd"
    save_cloud_pcd(str(pcd), c)
    snap = tmp_path / "pca.png"
    rc = main([str(pcd), f"--snapshot={snap}"])
    assert rc == 0 and snap.exists()
    img = decode_rgb_png(snap.read_bytes())
    # white background, red cloud, blue + green arrows visible
    assert (np.all(img == (255, 255, 255), axis=-1)).mean() > 0.5
    for color in [(255, 0, 0), (0, 0, 255), (0, 255, 0)]:
        assert (np.all(img == color, axis=-1)).any(), color
