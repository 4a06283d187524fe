"""Seed-sweep differential fuzz: the full fused preprocess (ordering →
ground marking → fused multi/single BEV) vs the plain-loop oracle, across
randomized point regimes — density, intensity==-1 fraction, z distribution,
coordinate extremes — that single-seed tests may never hit.

Kept cheap per case (small sensor grid, one jit compile reused across seeds);
the whole sweep runs in seconds on CPU jax."""

import numpy as np
import pytest


from pctpu.ops.bev import fused_multi_single_bev
from pctpu.ops.ground import mark_ground
from pctpu.ops.ordering import get_ordered_cloud

from . import ref_impl
from .test_ops_preprocess import SMALL, ordered_ref_arrays, to_cloud

REGIMES = [
    # (n_points, neg1_frac, z_lo, z_hi, r_lo, r_hi)
    (20, 0.0, -2.5, 4.0, 2.0, 60.0),      # sparse
    (400, 0.2, -2.5, 4.0, 2.0, 60.0),     # dense mixed
    (400, 1.0, -2.5, 4.0, 2.0, 60.0),     # KITTI quirk: all intensity -1
    (300, 0.05, -2.1, -1.7, 2.0, 60.0),   # nearly all ground-height
    (300, 0.05, 5.0, 60.0, 2.0, 60.0),    # all high (layer out of range)
    (300, 0.1, -2.5, 4.0, 70.0, 140.0),   # far points (grid/BEV boundary)
    (300, 0.1, -2.5, 4.0, 0.01, 3.0),     # all near origin (sector 37,25)
]


def _regime_points(rng, n, neg1, z_lo, z_hi, r_lo, r_hi, params):
    pts = []
    for _ in range(n):
        r = float(rng.uniform(r_lo, r_hi))
        az = float(rng.uniform(-np.pi, np.pi))
        pts.append(
            {
                "x": float(np.float32(r * np.cos(az))),
                "y": float(np.float32(r * np.sin(az))),
                "z": float(np.float32(rng.uniform(z_lo, z_hi))),
                "intensity": -1.0
                if rng.random() < neg1
                else float(np.float32(rng.random())),
                "row": int(rng.integers(-1, params.n_scan + 1)),
                "col": int(rng.integers(-1, params.horizon_scan + 1)),
                "t": int(rng.integers(0, 1000)),
                "label": -2,
            }
        )
    return pts


@pytest.mark.slow
@pytest.mark.parametrize("regime", range(len(REGIMES)))
def test_fuzz_preprocess_matches_oracle(regime):
    n, neg1, z_lo, z_hi, r_lo, r_hi = REGIMES[regime]
    for seed in range(8):
        rng = np.random.default_rng(1000 * regime + seed)
        pts = _regime_points(rng, n, neg1, z_lo, z_hi, r_lo, r_hi, SMALL)

        ref_cloud, _ = ordered_ref_arrays(pts, SMALL)
        ref_impl.mark_ground_ref(
            ref_cloud, SMALL.n_scan, SMALL.horizon_scan, SMALL.ground_upper_scan
        )
        ref_multi = ref_impl.multi_bev_ref(ref_cloud, SMALL.height_res)
        ref_single = ref_impl.single_bev_ref(ref_cloud)

        ordered = get_ordered_cloud(to_cloud(pts), SMALL)
        labeled, _ = mark_ground(ordered, SMALL)
        fm, fs = fused_multi_single_bev(labeled, SMALL.height_res)

        ref_labels = np.array([p["label"] for p in ref_cloud], np.int32)
        np.testing.assert_array_equal(
            np.asarray(labeled.label), ref_labels,
            err_msg=f"labels diverge (regime {regime}, seed {seed})",
        )
        np.testing.assert_array_equal(
            np.asarray(fm), ref_multi,
            err_msg=f"multi BEV diverges (regime {regime}, seed {seed})",
        )
        np.testing.assert_array_equal(
            np.asarray(fs), ref_single,
            err_msg=f"single BEV diverges (regime {regime}, seed {seed})",
        )


@pytest.mark.slow
def test_fuzz_all_sensor_presets_one_seed():
    """The oracle sweep once per real sensor geometry (full grid sizes)."""
    from pctpu.config import get_sensor_params

    for i, sensor in enumerate(("HDL_32E", "HDL_64E", "OS1_64")):
        params = get_sensor_params(sensor)
        rng = np.random.default_rng(7000 + i)  # deterministic repro
        pts = _regime_points(rng, 600, 0.15, -2.5, 4.0, 2.0, 90.0, params)
        ref_cloud, _ = ordered_ref_arrays(pts, params)
        ref_impl.mark_ground_ref(
            ref_cloud, params.n_scan, params.horizon_scan, params.ground_upper_scan
        )
        ordered = get_ordered_cloud(to_cloud(pts), params)
        labeled, _ = mark_ground(ordered, params)
        ref_labels = np.array([p["label"] for p in ref_cloud], np.int32)
        np.testing.assert_array_equal(
            np.asarray(labeled.label), ref_labels, err_msg=sensor
        )
        fm, fs = fused_multi_single_bev(labeled, params.height_res)
        np.testing.assert_array_equal(
            np.asarray(fm), ref_impl.multi_bev_ref(ref_cloud, params.height_res),
            err_msg=sensor,
        )
        np.testing.assert_array_equal(
            np.asarray(fs), ref_impl.single_bev_ref(ref_cloud), err_msg=sensor
        )


@pytest.mark.slow
def test_fuzz_voxel_topflatten_sweep():
    """Broader seed sweep for the registration prep ops vs their oracles."""
    from tests.test_ops_registration import scene_cloud, to_cloud

    from pctpu.ops.topflatten import extract_top_and_flatten
    from pctpu.ops.voxel import voxel_downsample

    for seed in range(8):
        rng = np.random.default_rng(300 + seed)
        pts = rng.uniform(-60, 60, (700, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-2, 10, 700).astype(np.float32)
        ref = ref_impl.voxel_ref(pts, 0.2)
        out, valid, count = voxel_downsample(pts, np.ones(700, bool), 0.2)
        assert int(count) == len(ref), seed
        np.testing.assert_allclose(np.asarray(out)[: int(count)], ref,
                                   atol=1e-5, err_msg=str(seed))

        cloud_pts = scene_cloud(rng)
        ref_flat = np.asarray(ref_impl.top_flatten_ref(cloud_pts),
                              np.float32).reshape(-1, 3)
        xyz, mask, cnt = extract_top_and_flatten(to_cloud(cloud_pts, capacity=1024))
        got = np.asarray(xyz)[np.asarray(mask)]
        assert int(cnt) == len(ref_flat), seed

        def lexsorted(a):
            return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

        np.testing.assert_array_equal(lexsorted(got), lexsorted(ref_flat),
                                      err_msg=str(seed))
