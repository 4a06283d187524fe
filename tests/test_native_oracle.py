"""Triple-agreement differential: the native C++ oracle
(native/ref_oracle.cpp) vs the Python plain-loop oracle (tests/ref_impl.py)
vs the vectorized pctpu ops, byte-for-byte.

The Python oracle emulates the reference's mixed f32/f64 arithmetic with
numpy scalar casts; the native oracle gets the identical semantics from C++
float arithmetic directly (-ffp-contract=off, no fast-math).  Agreement of
the two independent transcriptions validates the emulation, and agreement of
pctpu with both closes the loop on the bit-exactness claim without PCL
(VERDICT round-2 "Missing #2" substitute on this machine).
"""

import numpy as np
import pytest

from pctpu.config import FloatBevConfig, get_sensor_params
from pctpu.ops.bev import float_bev, fused_multi_single_bev
from pctpu.ops.ground import mark_ground
from pctpu.ops.ordering import get_ordered_cloud
from pctpu.ops.topflatten import extract_top_and_flatten

from . import native_oracle, ref_impl
from .test_fuzz_differential import REGIMES, _regime_points
from .test_ops_preprocess import SMALL, ordered_ref_arrays, to_cloud

pytestmark = pytest.mark.skipif(
    not native_oracle.available(), reason="native oracle build unavailable"
)


def _python_oracle(pts, params):
    ref_cloud, ref_xyz = ordered_ref_arrays(pts, params)
    ref_impl.mark_ground_ref(
        ref_cloud, params.n_scan, params.horizon_scan, params.ground_upper_scan
    )
    labels = np.array([p["label"] for p in ref_cloud], np.int32)
    multi = ref_impl.multi_bev_ref(ref_cloud, params.height_res)
    single = ref_impl.single_bev_ref(ref_cloud)
    return labels, multi, single, ref_xyz


@pytest.mark.parametrize("regime", range(len(REGIMES)))
def test_native_matches_python_oracle(regime):
    """The two independent transcriptions agree byte-for-byte (no jax)."""
    n, neg1, z_lo, z_hi, r_lo, r_hi = REGIMES[regime]
    for seed in range(3):
        rng = np.random.default_rng(1000 * regime + seed)
        pts = _regime_points(rng, n, neg1, z_lo, z_hi, r_lo, r_hi, SMALL)
        py = _python_oracle(pts, SMALL)
        nat = native_oracle.preprocess(pts, SMALL)
        for name, a, b in zip(("labels", "multi", "single", "ordered"), nat, py):
            np.testing.assert_array_equal(
                a, b, err_msg=f"{name} (regime {regime}, seed {seed})"
            )


@pytest.mark.parametrize("compat", ["bitexact", "tolerance"])
def test_pctpu_preprocess_matches_native(compat):
    """pctpu ordering+ground+fused BEV == the native C++ oracle, both compat
    modes (tolerance mode's documented divergence never flipped a label or a
    BEV byte across the fuzz suite — assert that here against C++ too)."""
    for regime in range(len(REGIMES)):
        n, neg1, z_lo, z_hi, r_lo, r_hi = REGIMES[regime]
        rng = np.random.default_rng(5000 + regime)
        pts = _regime_points(rng, n, neg1, z_lo, z_hi, r_lo, r_hi, SMALL)
        nat_labels, nat_multi, nat_single, nat_xyz = native_oracle.preprocess(
            pts, SMALL
        )
        ordered = get_ordered_cloud(to_cloud(pts), SMALL)
        labeled, _ = mark_ground(ordered, SMALL, compat=compat)
        fm, fs = fused_multi_single_bev(labeled, SMALL.height_res)
        np.testing.assert_array_equal(
            np.asarray(ordered.xyz), nat_xyz, err_msg=f"ordered (regime {regime})"
        )
        np.testing.assert_array_equal(
            np.asarray(labeled.label), nat_labels,
            err_msg=f"labels (regime {regime}, {compat})",
        )
        np.testing.assert_array_equal(
            np.asarray(fm), nat_multi, err_msg=f"multi (regime {regime}, {compat})"
        )
        np.testing.assert_array_equal(
            np.asarray(fs), nat_single,
            err_msg=f"single (regime {regime}, {compat})",
        )


def test_native_matches_python_oracle_sweep_to_row_zero():
    """ground_upper == n_scan drives the sweep to r == 0, where the Python
    list oracle wraps negative neighbor indices from the end — the C++
    oracle must mirror the wrap, not under-read (review finding)."""
    from pctpu.config import SensorParams

    params = SensorParams(
        n_scan=8, horizon_scan=16, ground_upper_scan=8, height_res=0.5
    )
    for seed in range(5):
        rng = np.random.default_rng(seed)
        pts = _regime_points(rng, 120, 0.3, -2.5, 4.0, 2.0, 60.0, params)
        py = _python_oracle(pts, params)
        nat = native_oracle.preprocess(pts, params)
        for name, a, b in zip(("labels", "multi", "single", "ordered"), nat, py):
            np.testing.assert_array_equal(a, b, err_msg=f"{name} (seed {seed})")


@pytest.mark.slow
def test_pctpu_matches_native_full_sensor_grid():
    """One full HDL-64E grid through all three implementations."""
    params = get_sensor_params("HDL_64E")
    rng = np.random.default_rng(7001)
    pts = _regime_points(rng, 600, 0.15, -2.5, 4.0, 2.0, 90.0, params)
    py = _python_oracle(pts, params)
    nat = native_oracle.preprocess(pts, params)
    for name, a, b in zip(("labels", "multi", "single", "ordered"), nat, py):
        np.testing.assert_array_equal(a, b, err_msg=f"{name} (native vs python)")
    ordered = get_ordered_cloud(to_cloud(pts), params)
    labeled, _ = mark_ground(ordered, params)
    fm, fs = fused_multi_single_bev(labeled, params.height_res)
    np.testing.assert_array_equal(np.asarray(labeled.label), nat[0])
    np.testing.assert_array_equal(np.asarray(fm), nat[1])
    np.testing.assert_array_equal(np.asarray(fs), nat[2])


@pytest.mark.slow
def test_multi_bev_pipeline_artifacts_match_native(tmp_path):
    """Full-pipeline artifact differential: the files run_multi_bev WRITES
    (multi-BEV .bin, single-BEV csv, non-ground PCD labels) equal the native
    C++ oracle run on the same input keyframes — the end-to-end composition
    (loader → device kernels → writers), not just the ops."""
    import os

    from pctpu.pipelines.multi_bev import run_multi_bev
    from pctpu.pipelines.selectors import run_kitti_select

    from .fixtures import make_kitti_tree

    root = str(tmp_path / "kitti")
    make_kitti_tree(root, num_frames=3, spacing=3.0)
    assert run_kitti_select(root, 2.0) == 3
    tree = os.path.join(root, "selected_keyframes_2.00m")
    out = run_multi_bev(tree, "HDL_64E", batch_size=2, write_pngs=False)
    assert out.num_clouds == 3

    report = native_oracle.compare_kitti_artifacts(
        tree, get_sensor_params("HDL_64E"), range(3)
    )
    assert len(report) == 9
    diffs = [line for line in report if not line.startswith("BYTES-OK")]
    assert not diffs, diffs


def test_float_bev_matches_native():
    from tests.test_ops_registration import scene_cloud
    from tests.test_ops_registration import to_cloud as reg_to_cloud

    for seed in range(3):
        rng = np.random.default_rng(300 + seed)
        cloud_pts = scene_cloud(rng)
        xyz = np.array(
            [[p["x"], p["y"], p["z"]] for p in cloud_pts], np.float32
        )
        lab = np.array([p["label"] for p in cloud_pts], np.int32)
        cloud = reg_to_cloud(cloud_pts)
        for fg in (True, False):
            nat = native_oracle.float_bev(xyz, lab, fg)
            got = float_bev(cloud, FloatBevConfig(filter_ground=fg))
            np.testing.assert_array_equal(
                np.asarray(got), nat, err_msg=f"seed {seed} filter={fg}"
            )


def test_top_flatten_matches_native_in_reference_order():
    from tests.test_ops_registration import scene_cloud
    from tests.test_ops_registration import to_cloud as reg_to_cloud

    for seed in range(3):
        rng = np.random.default_rng(400 + seed)
        cloud_pts = scene_cloud(rng)
        xyz = np.array(
            [[p["x"], p["y"], p["z"]] for p in cloud_pts], np.float32
        )
        lab = np.array([p["label"] for p in cloud_pts], np.int32)
        nat = native_oracle.top_flatten(xyz, lab)
        out, mask, cnt = extract_top_and_flatten(
            reg_to_cloud(cloud_pts, capacity=1024)
        )
        got = np.asarray(out)[np.asarray(mask)]
        assert int(cnt) == len(nat), seed
        np.testing.assert_array_equal(got, nat, err_msg=str(seed))
