"""Differential + property tests for the registration ops (CPU jax)."""

import math

import numpy as np
import pytest

from pctpu.cloud import make_cloud
from pctpu.config import COARSE_ICP, FINE_ICP, IcpConfig
from pctpu.geom.se3 import yaw_rotation_4x4
from pctpu.ops.icp import icp_point_to_plane, icp_point_to_point
from pctpu.ops.knn import knn, nn_1
from pctpu.ops.normals2d import normals_2d, normals_2d_knn
from pctpu.ops.topflatten import extract_top_and_flatten
from pctpu.ops.voxel import voxel_downsample

from . import ref_impl


def scene_cloud(rng, n_clusters=6, pts_per_cluster=80, ground_frac=0.3):
    """Clustered 'building' points (label -2) + scattered ground (label 0)."""
    pts = []
    for _ in range(n_clusters):
        cx, cy = rng.uniform(-60, 60, 2)
        for _ in range(pts_per_cluster):
            pts.append(
                {
                    "x": float(np.float32(cx + rng.normal(0, 3))),
                    "y": float(np.float32(cy + rng.normal(0, 3))),
                    "z": float(np.float32(rng.uniform(0, 8))),
                    "label": -2,
                }
            )
    n_ground = int(len(pts) * ground_frac)
    for _ in range(n_ground):
        pts.append(
            {
                "x": float(np.float32(rng.uniform(-80, 80))),
                "y": float(np.float32(rng.uniform(-80, 80))),
                "z": float(np.float32(rng.uniform(-2.0, -1.8))),
                "label": 0,
            }
        )
    return pts


def to_cloud(points, capacity=None):
    n = len(points)
    xyz = np.array([[p["x"], p["y"], p["z"]] for p in points], np.float32)
    return make_cloud(
        xyz,
        label=np.array([p["label"] for p in points], np.int32),
        capacity=capacity,
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_top_flatten_matches_reference(seed):
    rng = np.random.default_rng(seed)
    pts = scene_cloud(rng)
    ref = np.asarray(ref_impl.top_flatten_ref(pts), np.float32).reshape(-1, 3)
    xyz, mask, count = extract_top_and_flatten(to_cloud(pts, capacity=1024))
    got = np.asarray(xyz)[np.asarray(mask)]
    assert int(count) == len(ref)
    # same point multiset (equal-z ties may permute inside a cell)
    def lexsorted(a):
        return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

    np.testing.assert_array_equal(lexsorted(got), lexsorted(ref))


def test_top_flatten_order_is_reference_order():
    rng = np.random.default_rng(3)
    pts = scene_cloud(rng)
    # make z strictly unique to eliminate tie ambiguity
    for i, p in enumerate(pts):
        p["z"] = float(np.float32(p["z"] + i * 1e-4))
    ref = np.asarray(ref_impl.top_flatten_ref(pts), np.float32).reshape(-1, 3)
    xyz, mask, count = extract_top_and_flatten(to_cloud(pts, capacity=1024))
    got = np.asarray(xyz)[: int(count)]
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("seed", [0, 1])
def test_voxel_matches_reference(seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    ref = ref_impl.voxel_ref(pts, 0.5)
    out, valid, count = voxel_downsample(pts, np.ones(500, bool), 0.5)
    got = np.asarray(out)[: int(count)]
    assert int(count) == len(ref)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_voxel_with_padding():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    padded = np.concatenate([pts, np.full((28, 3), 1e6, np.float32)])
    mask = np.concatenate([np.ones(100, bool), np.zeros(28, bool)])
    out_a, _, count_a = voxel_downsample(padded, mask, 0.5)
    ref = ref_impl.voxel_ref(pts, 0.5)
    np.testing.assert_allclose(np.asarray(out_a)[: int(count_a)], ref, atol=1e-5)


def test_nn1_and_knn_exact():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((77, 3)).astype(np.float32)
    t = rng.standard_normal((133, 3)).astype(np.float32)
    idx, d2 = nn_1(q, np.ones(77, bool), t, np.ones(133, bool), tile=32)
    full = ((q[:, None] - t[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), full.argmin(1))
    np.testing.assert_allclose(np.asarray(d2), full.min(1), rtol=1e-5, atol=1e-7)

    kidx, kd2 = knn(q, np.ones(77, bool), t, np.ones(133, bool), k=2)
    order = np.argsort(full, axis=1)[:, :2]
    np.testing.assert_array_equal(np.asarray(kidx), order)


def test_nn1_respects_masks():
    q = np.zeros((4, 3), np.float32)
    t = np.stack([np.zeros(3), np.ones(3) * 5], 0).astype(np.float32)
    idx, d2 = nn_1(
        q, np.array([True, True, False, True]), t, np.array([False, True])
    )
    assert np.all(np.asarray(idx) == 1)  # target 0 masked out
    assert np.isinf(np.asarray(d2)[2])  # masked query


@pytest.mark.parametrize("seed", [0, 1])
def test_normals_match_reference(seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-8, 8, (300, 2)).astype(np.float32)
    xyz = np.concatenate([pts, np.zeros((300, 1), np.float32)], axis=1)
    ref_n, ref_valid = ref_impl.normals2d_ref(xyz, radius=2.0)
    got_n, _, got_valid = normals_2d(xyz, np.ones(300, bool), radius=2.0, tile=64)
    got_n = np.asarray(got_n)[:, :2]
    np.testing.assert_array_equal(np.asarray(got_valid), ref_valid)
    # sign-canonicalized by the viewpoint flip already; allow tiny numeric slack
    dots = np.abs(np.sum(got_n[ref_valid] * ref_n[ref_valid], axis=1))
    assert dots.min() > 1 - 1e-4


def test_normals_accurate_far_from_origin():
    """A tight wall at (95, 40) m: uncentered f32 moments (Σx² ≈ 1e7, ulp
    ~1) used to lose ~10× normal accuracy to cancellation; the bbox-centered
    moments must stay within ~0.03° of the demeaned f64 oracle."""
    rng = np.random.default_rng(3)
    n = 600
    u = rng.uniform(-4.0, 4.0, n)
    pts = np.stack(
        [95.0 + rng.normal(0, 0.004, n), 40.0 + u], axis=1
    ).astype(np.float32)  # wall along y, normal along x
    xyz = np.concatenate([pts, np.zeros((n, 1), np.float32)], axis=1)
    ref_n, ref_valid = ref_impl.normals2d_ref(xyz, radius=2.0)
    got_n, _, got_valid = normals_2d(xyz, np.ones(n, bool), radius=2.0, tile=64)
    got_n = np.asarray(got_n)[:, :2]
    np.testing.assert_array_equal(np.asarray(got_valid), ref_valid)
    dots = np.abs(np.sum(got_n[ref_valid] * ref_n[ref_valid], axis=1))
    worst_deg = float(np.degrees(np.arccos(np.clip(dots.min(), -1, 1))))
    assert worst_deg < 0.03, worst_deg


def test_icp_point_to_point_recovers_transform():
    # a small perturbation (well under the inter-point spacing) so the first
    # NN assignment is already correct — ICP on a structureless random blob
    # with a large motion legitimately falls into local optima (PCL too)
    rng = np.random.default_rng(0)
    src = rng.uniform(-20, 20, (400, 3)).astype(np.float32)
    t_true = yaw_rotation_4x4(math.radians(3.0)).astype(np.float32)
    t_true[:3, 3] = [0.4, -0.3, 0.2]
    tgt = src @ t_true[:3, :3].T + t_true[:3, 3]
    cfg = IcpConfig(max_correspondence_distance=5.0, max_iterations=50,
                    transformation_epsilon=1e-8)
    res = icp_point_to_point(
        src, np.ones(400, bool), tgt.astype(np.float32), np.ones(400, bool),
        np.eye(4, dtype=np.float32), cfg, nn_tile=128,
    )
    assert bool(res.converged)
    assert float(res.fitness) < 1e-6
    np.testing.assert_allclose(np.asarray(res.transform), t_true, atol=1e-3)


def test_icp_point_to_plane_recovers_yaw():
    rng = np.random.default_rng(1)
    # an L-shaped wall footprint in 2D (flat cloud)
    a = np.stack([np.linspace(0, 30, 150), np.zeros(150)], 1)
    b = np.stack([np.zeros(150), np.linspace(0, 30, 150)], 1)
    pts2 = (np.concatenate([a, b]) + rng.normal(0, 0.02, (300, 2))).astype(np.float32)
    src = np.concatenate([pts2, np.zeros((300, 1), np.float32)], 1)
    t_true = yaw_rotation_4x4(math.radians(8.0)).astype(np.float32)
    t_true[:3, 3] = [0.5, -0.4, 0.0]
    tgt = (src @ t_true[:3, :3].T + t_true[:3, 3]).astype(np.float32)
    normals, _, n_ok = normals_2d(tgt, np.ones(300, bool), radius=2.0, tile=64)
    res = icp_point_to_plane(
        src, np.ones(300, bool), tgt, np.ones(300, bool),
        np.asarray(normals), np.asarray(n_ok),
        np.eye(4, dtype=np.float32), COARSE_ICP, nn_tile=128,
    )
    got = np.asarray(res.transform)
    yaw = math.degrees(math.atan2(got[1, 0], got[0, 0]))
    assert abs(yaw - 8.0) < 0.5


def test_icp_uses_initial_guess():
    rng = np.random.default_rng(2)
    src = rng.uniform(-20, 20, (300, 3)).astype(np.float32)
    t_true = yaw_rotation_4x4(math.radians(170.0)).astype(np.float32)
    tgt = (src @ t_true[:3, :3].T).astype(np.float32)
    # fine ICP (1 m corr distance) can't recover 170° from identity…
    res_id = icp_point_to_point(
        src, np.ones(300, bool), tgt, np.ones(300, bool),
        np.eye(4, dtype=np.float32), FINE_ICP, nn_tile=128,
    )
    # …but converges immediately from the true guess
    res_guess = icp_point_to_point(
        src, np.ones(300, bool), tgt, np.ones(300, bool),
        t_true, FINE_ICP, nn_tile=128,
    )
    assert float(res_guess.fitness) < 1e-6
    assert float(res_guess.fitness) < float(res_id.fitness)


def test_icp_too_few_correspondences_not_converged():
    src = np.array([[0, 0, 0], [100, 0, 0], [0, 100, 0]], np.float32)
    tgt = np.array([[500, 500, 500]], np.float32)
    cfg = IcpConfig(max_correspondence_distance=1.0, max_iterations=10)
    res = icp_point_to_point(
        src, np.ones(3, bool), tgt, np.ones(1, bool),
        np.eye(4, dtype=np.float32), cfg, nn_tile=128,
    )
    assert not bool(res.converged)


def test_knn_k_exceeds_target_count_clamps():
    """knn clamps k to the target count like pcl nearestKSearch."""
    rng = np.random.default_rng(0)
    q = rng.uniform(-5, 5, (4, 3)).astype(np.float32)
    t = rng.uniform(-5, 5, (3, 3)).astype(np.float32)
    idx, d2 = knn(q, np.ones(4, bool), t, np.ones(3, bool), k=10)
    assert idx.shape == (4, 3) and d2.shape == (4, 3)
    assert np.isfinite(np.asarray(d2)).all()


def test_knn_exact_distances_far_from_origin():
    """knn distances are re-derived exactly (the matmul expansion carries
    ~|p|^2 * 2^-24 absolute error and can go negative for self-matches)."""
    base = np.float32([300.0, -400.0, 20.0])
    t = np.stack([base, base + np.float32([0.05, 0, 0]),
                  base + np.float32([0, 2.0, 0])]).astype(np.float32)
    q = t[:1]
    idx, d2 = knn(q, np.ones(1, bool), t, np.ones(3, bool), k=3)
    d2 = np.asarray(d2)[0]
    assert (d2 >= 0).all()
    # the exact coordinate differences (t was built by f32 adds at |p|~500,
    # so 0.05 is itself rounded by ~1 ulp of 300)
    expect = ((t - t[0]) ** 2).sum(1)
    np.testing.assert_allclose(sorted(d2), sorted(expect), rtol=0, atol=0)


def test_valid_mask_batched():
    from pctpu.cloud import Cloud

    import jax.numpy as jnp

    c = Cloud(
        xyz=jnp.zeros((2, 5, 3)), intensity=jnp.zeros((2, 5)),
        row=jnp.zeros((2, 5), jnp.int32), col=jnp.zeros((2, 5), jnp.int32),
        t=jnp.zeros((2, 5), jnp.uint32), label=jnp.zeros((2, 5), jnp.int32),
        count=jnp.array([2, 4], jnp.int32),
    )
    m = np.asarray(c.valid_mask())
    assert m.shape == (2, 5)
    np.testing.assert_array_equal(m[0], [True, True, False, False, False])
    np.testing.assert_array_equal(m[1], [True, True, True, True, False])


def test_normals_near_coincident_pair_far_from_center():
    """A 2-point neighborhood 1 cm apart at ~140 m from the bbox center:
    the expanded-matmul d2 noise (~6e-4 absolute) used to let the neighbor
    win the 'self' argmin slot, collapsing the pair to 'coincident' and
    wrongly invalidating the normal.  The self column is now exact by index
    (Normal2dEstimation.cpp:235-247 computes a valid pair normal for any
    non-zero segment)."""
    pts = np.array(
        [
            [100.0, 100.0],
            [100.0, 100.01],       # 1 cm apart -> the 2-neighbor pair branch
            [-100.0, -100.0],      # pulls the bbox center to ~0
        ],
        np.float32,
    )
    xyz = np.concatenate([pts, np.zeros((3, 1), np.float32)], axis=1)
    ref_n, ref_valid = ref_impl.normals2d_ref(xyz, radius=2.0)
    got_n, _, got_valid = normals_2d(xyz, np.ones(3, bool), radius=2.0, tile=64)
    got_n = np.asarray(got_n)[:, :2]
    assert list(ref_valid) == [True, True, False]
    np.testing.assert_array_equal(np.asarray(got_valid), ref_valid)
    # pair normal = perpendicular of the (0, 0.01) segment -> +/-x
    dots = np.abs(np.sum(got_n[ref_valid] * ref_n[ref_valid], axis=1))
    assert dots.min() > 1 - 1e-4

    # knn mode: self slot is exact there too (idx[:, 0] must be self)
    got_n2, _, got_valid2 = normals_2d_knn(xyz, np.ones(3, bool), k=2, tile=64)
    ref_n2, ref_valid2 = ref_impl.normals2d_knn_ref(xyz, k=2)
    np.testing.assert_array_equal(np.asarray(got_valid2), ref_valid2)
    got_n2 = np.asarray(got_n2)[:, :2]
    dots2 = np.abs(np.sum(got_n2[ref_valid2] * ref_n2[ref_valid2], axis=1))
    assert dots2.min() > 1 - 1e-4
