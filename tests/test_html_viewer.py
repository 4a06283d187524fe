"""Interactive HTML viewer: embedded-data bit-exactness, session builders
mirroring the reference's three live PCLVisualizer scenes, CLI wiring."""

import base64
import json

import numpy as np
import pytest

from pctpu.io.html_viewer import (
    ViewLayer,
    ViewportSpec,
    axes_layers,
    read_back_layers,
    write_cloud_manip_html,
    write_html_viewer,
    write_pca_test_html,
    write_top_part_html,
)


def _read_scene(path):
    doc = open(path, encoding="utf-8").read()
    start = doc.index('<script id="scene" type="application/json">')
    start = doc.index(">", start) + 1
    end = doc.index("</script>", start)
    return json.loads(doc[start:end].replace("<\\/", "</")), doc


def test_embedded_points_bit_exact(tmp_path):
    rng = np.random.default_rng(7)
    pts = rng.uniform(-100, 100, (513, 3)).astype(np.float32)
    out = str(tmp_path / "v.html")
    write_html_viewer(out, [ViewLayer("cloud", pts, (255, 0, 0))])
    back = read_back_layers(out)
    assert back["cloud"].tobytes() == pts.astype("<f4").tobytes()


def test_mask_drops_points_and_line_pairs(tmp_path):
    pts = np.arange(18, dtype=np.float32).reshape(6, 3)
    mask = np.array([True, False, True, True, False, True])
    out = str(tmp_path / "v.html")
    write_html_viewer(
        out,
        [
            ViewLayer("p", pts, (1, 2, 3), mask=mask),
            # pairs (0,1) and (4,5) each have a masked endpoint -> dropped
            ViewLayer("l", pts, (4, 5, 6), lines=True, mask=mask),
        ],
    )
    back = read_back_layers(out)
    np.testing.assert_array_equal(back["p"], pts[mask])
    np.testing.assert_array_equal(back["l"], pts[2:4])


def test_odd_line_layer_rejected(tmp_path):
    with pytest.raises(ValueError):
        write_html_viewer(
            str(tmp_path / "v.html"),
            [ViewLayer("l", np.zeros((3, 3), np.float32), (0, 0, 0), lines=True)],
        )


def test_axes_and_viewports_in_scene(tmp_path):
    out = str(tmp_path / "v.html")
    write_html_viewer(
        out,
        [ViewLayer("c", np.zeros((1, 3), np.float32), (9, 9, 9))],
        [ViewportSpec(background=(0.05, 0.05, 0.05), axes_size=1.0)],
        title="Mip Viewer </script> safe & <escaped>",
    )
    scene, doc = _read_scene(out)
    assert scene["viewports"] == [
        {"rect": [0.0, 0.0, 1.0, 1.0], "background": [0.05, 0.05, 0.05]}
    ]
    by_name = {l["name"]: l for l in scene["layers"]}
    # addCoordinateSystem: x red, y green, z blue, length = axes_size
    assert by_name["axis_x"]["color"] == [255, 0, 0]
    assert by_name["axis_y"]["color"] == [0, 255, 0]
    assert by_name["axis_z"]["color"] == [0, 0, 255]
    ax = np.frombuffer(base64.b64decode(by_name["axis_z"]["data"]), "<f4")
    np.testing.assert_array_equal(ax, [0, 0, 0, 0, 0, 1])
    # the raw "</script>" in the title must not terminate any script block
    assert doc.count("</script>") == 2  # scene json + viewer script only
    # self-contained: no external fetches
    assert "http://" not in doc and "https://" not in doc


def test_cloud_manip_session_matches_reference_constants(tmp_path):
    # CloudManip.cpp:143-158: input red, output green, 0.05 bg, 1 m axes
    rng = np.random.default_rng(0)
    xin = rng.normal(size=(40, 3)).astype(np.float32)
    xout = xin + np.float32(1.5)
    m = np.ones(40, bool)
    m[::7] = False
    out = str(tmp_path / "m.html")
    write_cloud_manip_html(out, xin, m, xout, m)
    scene, _ = _read_scene(out)
    by_name = {l["name"]: l for l in scene["layers"]}
    assert by_name["cloud_input"]["color"] == [255, 0, 0]
    assert by_name["cloud_output"]["color"] == [0, 255, 0]
    assert by_name["cloud_input"]["point_size"] == 2.0
    assert scene["viewports"][0]["background"] == [0.05, 0.05, 0.05]
    assert "axis_x" in by_name  # addCoordinateSystem(1.0)
    np.testing.assert_array_equal(read_back_layers(out)["cloud_input"], xin[m])


def test_top_part_session_whisker_geometry(tmp_path):
    # TopPartRegistration.cpp:375: every 10th point, whisker length 2
    n = 53
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[20] = False  # masked point on an every-10th index
    n_ok = np.ones(n, bool)
    n_ok[30] = False  # failed normal on an every-10th index
    out = str(tmp_path / "t.html")
    write_top_part_html(out, pts, mask, normals, n_ok)
    scene, _ = _read_scene(out)
    by_name = {l["name"]: l for l in scene["layers"]}
    assert by_name["original_cloud"]["color"] == [255, 0, 0]
    assert by_name["normals"]["color"] == [255, 255, 255]
    assert by_name["normals"]["lines"] is True
    assert scene["viewports"][0]["background"] == [0.0, 0.0, 0.0]
    back = read_back_layers(out)
    sel = mask & n_ok & (np.arange(n) % 10 == 0)  # indices 0, 10, 40, 50
    assert sel.sum() == 4
    seg = back["normals"]
    np.testing.assert_array_equal(seg[0::2], pts[sel])
    np.testing.assert_array_equal(
        seg[1::2], pts[sel] + np.float32(2.0) * normals[sel]
    )


def test_pca_session_arrow_tips(tmp_path):
    # main.cpp:100-128: tips = centroid + 200 * eigvec col, colors b/g/r
    rng = np.random.default_rng(5)
    xyz = rng.normal(size=(30, 3)).astype(np.float32)
    keep = np.ones(30, bool)
    c = np.array([1.0, -2.0, 3.0], np.float32)
    v = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    out = str(tmp_path / "p.html")
    write_pca_test_html(out, xyz, keep, c, v)
    scene, _ = _read_scene(out)
    by_name = {l["name"]: l for l in scene["layers"]}
    assert by_name["arrow_z"]["color"] == [0, 0, 255]
    assert by_name["arrow_y"]["color"] == [0, 255, 0]
    assert by_name["arrow_x"]["color"] == [255, 0, 0]
    assert scene["viewports"][0]["background"] == [1.0, 1.0, 1.0]
    back = read_back_layers(out)
    for i, name in enumerate(["arrow_z", "arrow_y", "arrow_x"]):
        np.testing.assert_array_equal(back[name][0], c)
        np.testing.assert_array_equal(
            back[name][1], c + np.float32(200.0) * v[:, i]
        )
    # addCoordinateSystem(100)
    np.testing.assert_array_equal(back["axis_x"][1], [100, 0, 0])


def _write_scan_pcd(tmp_path, n=200, seed=1):
    from pctpu.io.pcd import write_pcd

    rng = np.random.default_rng(seed)
    pts = {
        "x": rng.uniform(-60, 60, n).astype(np.float32),
        "y": rng.uniform(-60, 60, n).astype(np.float32),
        "z": rng.uniform(-2, 5, n).astype(np.float32),
        "intensity": rng.random(n).astype(np.float32),
        "row": np.zeros(n, np.uint16),
        "col": np.zeros(n, np.uint16),
        "t": np.zeros(n, np.uint32),
        "label": np.full(n, -2, np.int16),
    }
    pcd = str(tmp_path / "scan.pcd")
    write_pcd(pcd, pts)
    return pcd, pts


def test_cloud_manip_cli_html(tmp_path):
    from pctpu.cli.cloud_manip import main

    pcd, pts = _write_scan_pcd(tmp_path)
    out = str(tmp_path / "scene.html")
    assert main([pcd, "1.0", "2.0", "0.0", "30.0",
                 f"--output-dir={tmp_path}", f"--html={out}"]) == 0
    back = read_back_layers(out)
    got = back["cloud_input"]
    want = np.stack([pts["x"], pts["y"], pts["z"]], axis=1)
    np.testing.assert_array_equal(got, want)
    assert back["cloud_output"].shape == want.shape


def test_top_part_cli_html(tmp_path):
    """--html-only invocation (no --snapshot): pins the scoping that moved
    the scene re-derivation under `if snapshot or html` (ADVICE r4)."""
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
    out = str(tmp_path / "reg.html")
    rc = main([str(p1), str(p2), "15.0", "--flat_cap=4096",
               f"--html={out}"])
    assert rc == 0
    back = read_back_layers(out)
    assert {"original_cloud", "normals"} <= set(back)
    assert back["original_cloud"].shape[1] == 3
    # whisker segments come in endpoint pairs
    assert back["normals"].shape[0] % 2 == 0 and back["normals"].shape[0] > 0


def _strip_js_literals(src: str) -> str:
    """Remove string/template literals and comments so delimiter counting
    sees only code structure (no JS engine exists in this image)."""
    out = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in "'\"`":
            q = c
            i += 1
            while i < n and src[i] != q:
                i += 2 if src[i] == "\\" else 1
            i += 1
        elif src.startswith("//", i):
            i = src.find("\n", i)
            i = n if i < 0 else i
        elif src.startswith("/*", i):
            j = src.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def test_inline_script_structurally_sound(tmp_path):
    # no browser/node in this environment: guard the viewer script against
    # template edits that unbalance delimiters or drop key definitions
    out = str(tmp_path / "v.html")
    write_html_viewer(out, [ViewLayer("c", np.zeros((2, 3), np.float32), (1, 1, 1))])
    doc = open(out, encoding="utf-8").read()
    start = doc.index("<script>") + len("<script>")
    raw = doc[doc.index('"use strict"', start):doc.rindex("</script>")]
    js = _strip_js_literals(raw)
    for o, c in ["{}", "()", "[]"]:
        assert js.count(o) == js.count(c), f"unbalanced {o}{c}"
    for name in ["decode", "draw", "resetCam", "lookAt", "persp", "mat4mul",
                 "frame"]:
        assert f"function {name}" in js
    # every viewer control documented in the HUD is wired (raw: literals)
    for key in ['"r"', '"+"', '"-"']:
        assert key in raw
    for ev in ["mousedown", "mousemove", "mouseup", "wheel", "keydown"]:
        assert ev in raw


def test_pca_test_cli_html(tmp_path):
    from pctpu.cli.pointcloud_pca_test import main

    pcd, _ = _write_scan_pcd(tmp_path, seed=2)
    out = str(tmp_path / "pca.html")
    assert main([pcd, f"--html={out}"]) == 0
    scene, _ = _read_scene(out)
    names = {l["name"] for l in scene["layers"]}
    assert {"cloud", "arrow_x", "arrow_y", "arrow_z"} <= names
